package graft.runner

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class DashboardSpec extends SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def get(port: Int, path: String): String =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()

  test("dashboard serves status, metrics and page from live listener data") {
    val sp = spark
    import sp.implicits._
    val metrics = new MetricsCollector().register(sp)
    val dash = new Dashboard(metrics).start()
    try {
      dash.setStatus("running")
      val in = MemoryStream[Int]
      val q = in.toDF().writeStream.format("memory").queryName("dash_q")
        .outputMode("append").start()
      try {
        in.addData(1 to 25: _*)
        q.processAllAvailable()
        val port = dash.boundPort
        val status = get(port, "/api/status")
        assert(status.contains("\"status\": \"running\""))
        assert(status.contains("\"total_input_rows\": 25"))
        val m = get(port, "/api/metrics")
        assert(m.contains("\"name\": \"dash_q\"") && m.contains("\"total_input_rows\": 25"))
        assert(get(port, "/api/errors") == "[]")
        val page = get(port, "/")
        assert(page.contains("graft pipeline dashboard") && page.contains("dash_q"))
        // report + diagram pages (server.go /report /diagram parity)
        val report = get(port, "/report")
        assert(report.contains("execution report") && report.contains("dash_q"))
        val diagram = get(port, "/diagram")
        assert(diagram.contains("pipeline topology") && diagram.contains("<svg"))
        assert(diagram.contains("dash_q"))
        val export = get(port, "/api/export")
        assert(export.contains("\"exported_at\"") && export.contains("\"dash_q\""))
        // SSE push channel: first broadcast frame arrives with live totals
        val conn = new java.net.URI(s"http://127.0.0.1:$port/api/stream")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setReadTimeout(5000)
        try {
          assert(conn.getHeaderField("Content-Type").startsWith("text/event-stream"))
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(conn.getInputStream))
          val first = reader.readLine()
          assert(first.startsWith("data: ") && first.contains("\"total_input_rows\": 25"))
        } finally conn.disconnect()
      } finally q.stop()
    } finally {
      dash.stop()
      metrics.unregister(sp)
    }
  }

  test("WebSocket push channel completes the RFC 6455 handshake and streams status frames") {
    val metrics = new MetricsCollector()
    val dash = new Dashboard(metrics, pushIntervalMs = 50L).start()
    try {
      dash.setStatus("ws-live")
      // /api/status advertises the WS port
      assert(get(dash.boundPort, "/api/status")
        .contains(s""""ws_port": ${dash.wsPort}"""))
      // drive it with the JDK's own RFC 6455 client — handshake + frame
      // decoding are exercised by a real implementation, not a mock
      val received = new java.util.concurrent.LinkedBlockingQueue[String]()
      val listener = new java.net.http.WebSocket.Listener {
        override def onText(ws: java.net.http.WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          received.add(data.toString)
          ws.request(1)
          null
        }
      }
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:${dash.wsPort}/ws"), listener)
        .get(5, java.util.concurrent.TimeUnit.SECONDS)
      try {
        val first = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        val second = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(first != null && second != null, "expected two pushed frames")
        for (frame <- Seq(first, second)) {
          assert(frame.contains("\"status\": \"ws-live\""))
          assert(frame.contains("\"ws_port\""))
        }
        // client application frames are MASKED — the close detector must
        // parse frames (mask/payload bytes routinely carry a 0x8 low
        // nibble) and keep the connection alive through them
        for (i <- 1 to 20) ws.sendText(s"client-ping-$i", true).join()
        val after = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(after != null && after.contains("\"status\": \"ws-live\""),
          "push must continue after masked client frames")
      } finally ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
    } finally dash.stop()
  }

  test("WsPush encodes 16-bit-length frames (payloads over 125 bytes)") {
    val big = "x" * 300
    val push = new WsPush(() => big, pushIntervalMs = 20L).start()
    try {
      val received = new java.util.concurrent.LinkedBlockingQueue[String]()
      val listener = new java.net.http.WebSocket.Listener {
        private val buf = new StringBuilder
        override def onText(ws: java.net.http.WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          buf.append(data)
          if (last) { received.add(buf.toString); buf.clear() }
          ws.request(1)
          null
        }
      }
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:${push.boundPort}/ws"), listener)
        .get(5, java.util.concurrent.TimeUnit.SECONDS)
      try {
        val frame = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
        assert(frame == big, "300-byte payload must round-trip intact")
      } finally ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
    } finally push.stop()
  }

  /** JDK WS client feeding complete text frames into a queue. */
  private def wsClient(port: Int, q: java.util.concurrent.LinkedBlockingQueue[String])
      : java.net.http.WebSocket = {
    val listener = new java.net.http.WebSocket.Listener {
      private val buf = new StringBuilder
      override def onText(ws: java.net.http.WebSocket, data: CharSequence,
                          last: Boolean): java.util.concurrent.CompletionStage[_] = {
        buf.append(data)
        if (last) { q.add(buf.toString); buf.clear() }
        ws.request(1)
        null
      }
    }
    HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:$port/ws"), listener)
      .get(5, java.util.concurrent.TimeUnit.SECONDS)
  }

  test("WsPush broadcasts to multiple concurrent clients") {
    val push = new WsPush(() => """{"beat": 1}""", pushIntervalMs = 20L).start()
    try {
      val q1 = new java.util.concurrent.LinkedBlockingQueue[String]()
      val q2 = new java.util.concurrent.LinkedBlockingQueue[String]()
      val ws1 = wsClient(push.boundPort, q1)
      val ws2 = wsClient(push.boundPort, q2)
      try {
        assert(q1.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null, "client 1 first frame")
        assert(q2.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null, "client 2 first frame")
        // both keep receiving — the loop is per-connection, not round-robin
        q1.clear(); q2.clear()
        assert(q1.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null, "client 1 steady state")
        assert(q2.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null, "client 2 steady state")
      } finally {
        ws1.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
        ws2.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
      }
    } finally push.stop()
  }

  test("a stalled client cannot wedge the push loop for healthy clients") {
    // 64 KiB frames every 10 ms: a client that never reads backs up its
    // kernel buffers within ~1 s and blocks ITS connection thread's write —
    // the design under test is that each connection pushes on its own
    // thread, so a healthy client keeps receiving fresh frames while the
    // stalled one is wedged.
    val pad = "x" * 65536
    val push = new WsPush(() => pad, pushIntervalMs = 10L).start()
    val slow = new java.net.Socket()
    try {
      slow.setReceiveBufferSize(4096) // fill fast
      slow.connect(new java.net.InetSocketAddress("127.0.0.1", push.boundPort), 5000)
      val sout = slow.getOutputStream
      sout.write(("GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n" +
        "Connection: Upgrade\r\nSec-WebSocket-Key: c2xvd2NsaWVudDEyMzQ=\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      sout.flush()
      // read just the 101 head, then never read again
      val sin = slow.getInputStream
      val head = new StringBuilder
      var done = false
      var b = sin.read()
      while (b >= 0 && !done) {
        head.append(b.toChar)
        done = head.endsWith("\r\n\r\n")
        if (!done) b = sin.read()
      }
      assert(head.toString.startsWith("HTTP/1.1 101"), "stalled client handshake")
      Thread.sleep(2000) // let writes to the stalled socket back up

      val q = new java.util.concurrent.LinkedBlockingQueue[String]()
      val ws = wsClient(push.boundPort, q)
      try {
        assert(q.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null,
          "healthy client starved while a peer is stalled")
        q.clear()
        assert(q.poll(5, java.util.concurrent.TimeUnit.SECONDS) != null,
          "push loop stopped delivering fresh frames")
      } finally ws.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
    } finally { push.stop(); slow.close() }
  }
}
