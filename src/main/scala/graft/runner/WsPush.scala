package graft.runner

import java.io.{BufferedReader, InputStreamReader, OutputStream}
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
        } catch { case _: SocketException => () } // server closed
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
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.US_ASCII))
      // read request line + headers up to the blank line
      var key: Option[String] = None
      var line = reader.readLine()
      while (line != null && line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0 && line.take(i).trim.equalsIgnoreCase("Sec-WebSocket-Key"))
          key = Some(line.drop(i + 1).trim)
        line = reader.readLine()
      }
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
          // reader side: watch for the client CLOSE opcode (0x8); any IO
          // error also ends the connection
          @volatile var open = true
          val closer = new Thread(() => {
            try {
              var b = in.read()
              while (open && b >= 0 && (b & 0x0f) != 0x8) b = in.read()
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
