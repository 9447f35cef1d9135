package graft.runner

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Live metrics/status HTTP server (reference: internal/dashboard/
  * server.go:294-305 REST routes /api/status, /api/metrics, /api/errors
  * plus an HTML page; metrics collector internal/dashboard/metrics.go).
  *
  * Served from the listener-fed [[MetricsCollector]] — no polling loops:
  * Structured Streaming pushes progress into the collector, and this
  * server renders whatever is current. The WebSocket push channel of the
  * reference is dropped (plain refreshable JSON/HTML endpoints instead);
  * offline sandbox, java.net.httpserver only.
  */
final class Dashboard(metrics: MetricsCollector, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  @volatile private var statusText = "idle"

  def setStatus(s: String): Unit = statusText = s

  /** Actual bound port (use port=0 to pick a free one). */
  def boundPort: Int = server.getAddress.getPort

  def start(): this.type = {
    server.createContext("/api/status", json { _ =>
      s"""{"status": "${esc(statusText)}", "queries": ${metrics.snapshot.size}, "total_input_rows": ${metrics.totalInputRows}}"""
    })
    server.createContext("/api/metrics", json { _ =>
      metrics.snapshot.map { q =>
        s"""{"name": "${esc(q.name)}", "total_input_rows": ${q.totalInputRows}, "batches": ${q.batches}, "last_rows_per_second": ${q.lastRowsPerSecond}, "last_batch_ms": ${q.lastBatchMs}, "terminated": ${q.terminated}}"""
      }.mkString("[", ",", "]")
    })
    server.createContext("/api/errors", json { _ =>
      metrics.snapshot.flatMap(q => q.error.map(e =>
        s"""{"query": "${esc(q.name)}", "error": "${esc(e)}", "suggestion": "${esc(ErrorSuggester.suggest(e).getOrElse(""))}"}"""))
        .mkString("[", ",", "]")
    })
    server.createContext("/", html { _ =>
      val rows = metrics.snapshot.map(q =>
        s"<tr><td>${esc(q.name)}</td><td>${q.totalInputRows}</td><td>${q.batches}</td>" +
          s"<td>${if (q.terminated) "terminated" else "active"}</td></tr>").mkString
      s"""<!DOCTYPE html><html><head><meta charset="utf-8"><meta http-equiv="refresh" content="2">
         |<title>graft dashboard</title></head><body>
         |<h1>graft pipeline dashboard</h1><p>status: ${esc(statusText)}</p>
         |<table border="1" cellpadding="6"><tr><th>query</th><th>input rows</th><th>batches</th><th>state</th></tr>
         |$rows</table></body></html>""".stripMargin
    })
    server.setExecutor(null)
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ")

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
