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
}
