package graft.runner

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Live metrics/status HTTP server (reference: internal/dashboard/
  * server.go:283-306 — REST routes /api/status, /api/metrics, /api/errors,
  * /api/export, a real-time push channel, and the three pages
  * /, /report, /diagram; metrics collector internal/dashboard/metrics.go).
  *
  * Served from the listener-fed [[MetricsCollector]] — no polling loops:
  * Structured Streaming pushes progress into the collector, and this
  * server renders whatever is current. Live push ships on BOTH channels:
  * Server-Sent Events (`/api/stream`, plain HTTP + EventSource client
  * API) and a real WebSocket ([[WsPush]], RFC 6455 text frames) on its
  * own port — jdk httpserver has no WS upgrade path, so the WS listener
  * runs beside it and `/api/status` advertises `ws_port`. Both carry the
  * reference's broadcast-loop payload (server.go:broadcastLoop).
  */
final class Dashboard(metrics: MetricsCollector, port: Int = 0,
                      pushIntervalMs: Long = 1000L) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var statusText = "idle"

  // the reference's /ws push channel (server.go:294-305): jdk httpserver
  // has no upgrade path, so the WebSocket listener runs beside it on its
  // own port (advertised in /api/status as ws_port), pushing the same
  // status payload the SSE stream carries
  private val ws = new WsPush(() => statusPayload, 0, pushIntervalMs)

  def setStatus(s: String): Unit = statusText = s

  /** Actual bound port (use port=0 to pick a free one). */
  def boundPort: Int = server.getAddress.getPort

  /** Bound port of the WebSocket push listener (ws://127.0.0.1:wsPort/ws). */
  def wsPort: Int = ws.boundPort

  private def statusPayload: String =
    s"""{"status": "${esc(statusText)}", "queries": ${metrics.snapshot.size}, "total_input_rows": ${metrics.totalInputRows}, "ws_port": ${ws.boundPort}}"""

  def start(): this.type = {
    ws.start()
    server.createContext("/api/status", json(_ => statusPayload))
    server.createContext("/api/metrics", json(_ => metricsJson))
    server.createContext("/api/errors", json { _ =>
      metrics.snapshot.flatMap(q => q.error.map(e =>
        s"""{"query": "${esc(q.name)}", "error": "${esc(e)}", "suggestion": "${esc(ErrorSuggester.suggest(e).getOrElse(""))}"}"""))
        .mkString("[", ",", "]")
    })
    // full JSON export (server.go /api/export): one document with status +
    // all query stats, suitable for archiving a run
    server.createContext("/api/export", json { _ =>
      s"""{"status": "${esc(statusText)}", "exported_at": ${System.currentTimeMillis()}, "queries": ${metricsJson}}"""
    })
    // real-time push channel: SSE broadcast of the same status payload the
    // reference's WebSocket loop sends. Runs on the shared pool; ends when
    // the client disconnects (write fails) or the thread is interrupted.
    server.createContext("/api/stream", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Content-Type", "text/event-stream; charset=utf-8")
      ex.getResponseHeaders.set("Cache-Control", "no-cache")
      ex.sendResponseHeaders(200, 0) // chunked
      val os = ex.getResponseBody
      try {
        var alive = true
        while (alive) {
          os.write(s"data: $statusPayload\n\n".getBytes(StandardCharsets.UTF_8))
          os.flush()
          Thread.sleep(pushIntervalMs)
          alive = !Thread.currentThread().isInterrupted
        }
      } catch { case _: Exception => () } // client went away — normal
      finally ex.close()
    })
    server.createContext("/report", html { _ =>
      val rows = metrics.snapshot.map(q =>
        s"<tr><td>${hesc(q.name)}</td><td>${q.totalInputRows}</td><td>${q.batches}</td>" +
          s"<td>${q.lastRowsPerSecond}</td><td>${q.lastBatchMs}</td>" +
          s"<td>${q.error.map(hesc).getOrElse("")}</td></tr>").mkString
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>graft report</title></head><body>
         |<h1>execution report</h1><p>status: ${hesc(statusText)}</p>
         |<table border="1" cellpadding="6"><tr><th>query</th><th>input rows</th><th>batches</th>
         |<th>rows/s</th><th>last batch ms</th><th>error</th></tr>$rows</table>
         |<p><a href="/">dashboard</a> · <a href="/diagram">diagram</a> ·
         |<a href="/api/export">export JSON</a></p></body></html>""".stripMargin
    })
    // topology page: source topic → standing queries → sink topic, the
    // reference's /diagram (rendered as inline SVG, no static assets)
    server.createContext("/diagram", html { _ =>
      val qNames = metrics.snapshot.map(_.name)
      val boxes = qNames.zipWithIndex.map { case (n, i) =>
        val y = 60 + i * 50
        s"""<rect x="230" y="$y" width="240" height="34" rx="6" fill="#eef" stroke="#336"/>
           |<text x="350" y="${y + 22}" text-anchor="middle" font-size="12">${hesc(n)}</text>
           |<line x1="160" y1="${y + 17}" x2="230" y2="${y + 17}" stroke="#336"/>
           |<line x1="470" y1="${y + 17}" x2="540" y2="${y + 17}" stroke="#336"/>""".stripMargin
      }.mkString
      val h = 120 + qNames.size * 50
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><title>graft diagram</title></head><body>
         |<h1>pipeline topology</h1>
         |<svg width="720" height="$h" xmlns="http://www.w3.org/2000/svg">
         |<rect x="20" y="60" width="140" height="34" rx="17" fill="#efe" stroke="#363"/>
         |<text x="90" y="82" text-anchor="middle" font-size="12">input topic</text>
         |<rect x="540" y="60" width="140" height="34" rx="17" fill="#fee" stroke="#633"/>
         |<text x="610" y="82" text-anchor="middle" font-size="12">output topic</text>
         |$boxes</svg>
         |<p><a href="/">dashboard</a> · <a href="/report">report</a></p></body></html>""".stripMargin
    })
    server.createContext("/", html { _ =>
      val rows = metrics.snapshot.map(q =>
        s"<tr><td>${hesc(q.name)}</td><td>${q.totalInputRows}</td><td>${q.batches}</td>" +
          s"<td>${if (q.terminated) "terminated" else "active"}</td></tr>").mkString
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><meta http-equiv="refresh" content="2">
         |<title>graft dashboard</title></head><body>
         |<h1>graft pipeline dashboard</h1><p>status: ${hesc(statusText)}</p>
         |<table border="1" cellpadding="6"><tr><th>query</th><th>input rows</th><th>batches</th><th>state</th></tr>
         |$rows</table>
         |<p><a href="/report">report</a> · <a href="/diagram">diagram</a></p></body></html>""".stripMargin
    })
    // SSE connections are long-lived: a fixed single-thread executor would
    // head-of-line-block every other route behind the first stream client
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-dashboard"); t.setDaemon(true); t
    }))
    server.start()
    this
  }

  private def metricsJson: String =
    metrics.snapshot.map { q =>
      s"""{"name": "${esc(q.name)}", "total_input_rows": ${q.totalInputRows}, "batches": ${q.batches}, "last_rows_per_second": ${q.lastRowsPerSecond}, "last_batch_ms": ${q.lastBatchMs}, "terminated": ${q.terminated}}"""
    }.mkString("[", ",", "]")

  def stop(): Unit = { ws.stop(); server.stop(0) }

  /** JSON string escaper — control characters (tabs/CRs in stack traces)
    * must not reach the output literally, strict parsers reject them. */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .flatMap(c => if (c < ' ') f"\\u${c.toInt}%04x" else c.toString)

  /** HTML escaper for the pages — esc() is for JSON and leaves markup
    * intact, so a query name containing '<script>' would inject. */
  private def hesc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def json(body: HttpExchange => String)(ex: HttpExchange): Unit =
    respond(ex, "application/json", body(ex))
  private def html(body: HttpExchange => String)(ex: HttpExchange): Unit =
    respond(ex, "text/html", body(ex))

  private def respond(ex: HttpExchange, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", s"$contentType; charset=utf-8")
    ex.sendResponseHeaders(200, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
