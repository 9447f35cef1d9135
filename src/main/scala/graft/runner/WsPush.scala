package graft.runner

import java.io.OutputStream
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** Minimal RFC 6455 WebSocket push server — the reference dashboard's
  * `/ws` broadcast loop (reference: internal/dashboard/server.go:294-305),
  * which the JDK's built-in HTTP server cannot host (no connection
  * upgrade). This standalone listener implements exactly the slice the
  * dashboard needs:
  *
  *  - HTTP/1.1 Upgrade handshake (`Sec-WebSocket-Accept` =
  *    base64(SHA-1(key + RFC magic GUID)));
  *  - server→client unmasked TEXT frames (7-bit, 16-bit and 64-bit
  *    payload-length encodings);
  *  - client CLOSE frame (0x8) detection on a reader thread — the
  *    connection is torn down either by a close frame or by a failed
  *    write.
  *
  * No fragmentation, no compression extensions, no client-frame echo:
  * the channel is one-directional status push, same as the reference's.
  * Payloads come from a supplier so [[Dashboard]] can feed its status
  * JSON and tests can feed frames of any size.
  */
final class WsPush(payload: () => String, port: Int = 0,
                   pushIntervalMs: Long = 250L) {

  private val server = new ServerSocket(port, 16,
    java.net.InetAddress.getByName("127.0.0.1"))
  @volatile private var running = false

  def boundPort: Int = server.getLocalPort

  def start(): this.type = {
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "graft-ws-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          // any accept failure (closed server, fd exhaustion, …) must not
          // kill the acceptor while the dashboard still advertises the
          // port — back off briefly and retry until stop()
          case _: SocketException => () // server closed (stop()) or reset
          case _: Exception => if (running) Thread.sleep(100)
        }
      }
    }, "graft-ws-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    this
  }

  def stop(): Unit = { running = false; server.close() }

  private def serve(sock: Socket): Unit =
    try {
      val in = sock.getInputStream
      // read the request head byte-by-byte up to CRLFCRLF — a buffered
      // reader would read AHEAD into any frame pipelined right after the
      // upgrade request and the close-detector below would never see it
      val head = new StringBuilder
      var done = false
      var b = in.read()
      while (b >= 0 && !done) {
        head.append(b.toChar)
        done = head.endsWith("\r\n\r\n")
        // only read the next byte if the head is still open — reading past
        // the blank line would block on a client that (correctly) sends
        // nothing until it sees the 101
        if (!done) b = in.read()
      }
      val key: Option[String] = head.toString.split("\r\n").iterator
        .map(l => l -> l.indexOf(':'))
        .collectFirst { case (l, i)
            if i > 0 && l.take(i).trim.equalsIgnoreCase("Sec-WebSocket-Key") =>
          l.drop(i + 1).trim }
      val out = sock.getOutputStream
      key match {
        case None =>
          out.write(("HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n")
            .getBytes(StandardCharsets.US_ASCII))
          sock.close()
        case Some(k) =>
          out.write((s"HTTP/1.1 101 Switching Protocols\r\n" +
            "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
            s"Sec-WebSocket-Accept: ${accept(k)}\r\n\r\n")
            .getBytes(StandardCharsets.US_ASCII))
          out.flush()
          // reader side: parse client FRAMES (not raw bytes — mask and
          // payload bytes routinely have a 0x8 low nibble) and stop on the
          // CLOSE opcode; any IO error also ends the connection
          @volatile var open = true
          val closer = new Thread(() => {
            try {
              var opcode = readFrameOpcodeSkipPayload(in)
              while (open && opcode >= 0 && opcode != 0x8)
                opcode = readFrameOpcodeSkipPayload(in)
            } catch { case _: Exception => () }
            open = false
          }, "graft-ws-close")
          closer.setDaemon(true)
          closer.start()
          try {
            while (open && running) {
              writeTextFrame(out, payload())
              Thread.sleep(pushIntervalMs)
            }
          } catch { case _: Exception => () } // write failed: client gone
          finally { open = false; sock.close() }
      }
    } catch { case _: Exception => try sock.close() catch { case _: Exception => () } }

  /** Read one client frame header, skip its payload, return the opcode
    * (or -1 on EOF). Client frames are masked (4-byte key before the
    * payload); 126/127 length markers carry 16/64-bit extended lengths. */
  private def readFrameOpcodeSkipPayload(in: java.io.InputStream): Int = {
    val b0 = in.read()
    if (b0 < 0) return -1
    val b1 = in.read()
    if (b1 < 0) return -1
    val masked = (b1 & 0x80) != 0
    var len: Long = (b1 & 0x7f).toLong
    if (len == 126) {
      val h = in.read(); val l = in.read()
      if (l < 0) return -1
      len = ((h & 0xff) << 8 | (l & 0xff)).toLong
    } else if (len == 127) {
      len = 0L
      var i = 0
      while (i < 8) { val x = in.read(); if (x < 0) return -1; len = (len << 8) | (x & 0xff); i += 1 }
    }
    val skip = len + (if (masked) 4 else 0)
    var remaining = skip
    while (remaining > 0) {
      val n = in.skip(remaining)
      if (n <= 0) { if (in.read() < 0) return -1; remaining -= 1 }
      else remaining -= n
    }
    b0 & 0x0f
  }

  /** RFC 6455 §4.2.2 accept token. */
  private def accept(key: String): String =
    Base64.getEncoder.encodeToString(MessageDigest.getInstance("SHA-1")
      .digest((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
        .getBytes(StandardCharsets.US_ASCII)))

  /** One unmasked FIN TEXT frame (server frames MUST NOT be masked). */
  private def writeTextFrame(out: OutputStream, text: String): Unit = {
    val data = text.getBytes(StandardCharsets.UTF_8)
    out.write(0x81) // FIN + text opcode
    if (data.length <= 125) out.write(data.length)
    else if (data.length <= 0xffff) {
      out.write(126)
      out.write((data.length >> 8) & 0xff)
      out.write(data.length & 0xff)
    } else {
      out.write(127)
      var i = 56
      while (i >= 0) { out.write(((data.length.toLong >> i) & 0xff).toInt); i -= 8 }
    }
    out.write(data)
    out.flush()
  }
}
