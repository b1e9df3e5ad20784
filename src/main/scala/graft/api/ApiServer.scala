package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.ops.Metrics

/** Thin HTTP surface mirroring the reference's operational API
  * (`src/api/routes/` — `/health`, `/metrics`, `/dlq/stats`,
  * `/reconciliation/trigger`, GDPR delete). JDK built-in HttpServer, no
  * dependencies; every data answer is computed by the injected callbacks
  * (which run the Spark jobs / registries), the HTTP layer only routes —
  * the same split as the reference's FastAPI-over-services shape.
  */
final class ApiServer(
    registry: Metrics.Registry,
    health: () => Map[String, Boolean],
    dlqStatsJson: () => String,
    reconTrigger: String => Unit,
    gdprDelete: (String, String) => Either[String, Gdpr.DeleteResult],
    port: Int = 0,
    /** GET /dlq/records?limit=&offset= (dlq.py `GET /records`). */
    dlqRecordsJson: (Int, Int) => String = (_, _) => "[]",
    /** POST /dlq/replay?ids=a,b → replayed count (dlq.py `POST /replay`). */
    dlqReplay: Seq[String] => Long = _ => 0L,
    /** GET /reconciliation/jobs (reconciliation.py `GET /jobs`). */
    reconJobsJson: () => String = () => "[]",
    /** GET /reconciliation/mismatches (`GET /mismatches`). */
    mismatchesJson: () => String = () => "[]",
    /** POST /reconciliation/mismatches/{id}/resolve → found?
      * (`POST /mismatches/{id}/resolve`). */
    mismatchResolve: String => Boolean = _ => false,
    /** Per-client throttle (reference `src/middleware/rate_limit.py`):
      * None = unlimited (test default); Some = every route checks the
      * caller's bucket and answers 429 + Retry-After when drained.
      */
    rateLimiter: Option[RateLimiter] = None) {

  private var server: HttpServer = _

  private def respond(ex: HttpExchange, code: Int, body: String, ctype: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** Every route runs under this guard: an exception out of an injected
    * callback (a Spark failure, a bad pk cast) must surface as a 500 JSON
    * error, not a dropped connection — the JDK server otherwise swallows
    * the throwable and closes the exchange with no response.
    *
    * Request-id middleware (reference `src/middleware/request_id.py`):
    * every response carries `X-Request-ID`, echoing the caller's header
    * when present and minting a UUID otherwise, so API calls correlate
    * with the pipeline's trace_id in logs and the DLQ.
    */
  private def handler(ctx: String)(f: HttpExchange => Unit): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      val rid = Option(ex.getRequestHeaders.getFirst("X-Request-ID"))
        .filter(_.nonEmpty).getOrElse(java.util.UUID.randomUUID().toString)
      ex.getResponseHeaders.set("X-Request-ID", rid)
      try {
        val path = ex.getRequestURI.getPath
        // JDK HttpServer matches contexts by raw string prefix, so the
        // "/health" context also receives /healthfoo — reject anything
        // that isn't the context path or a true sub-path of it.
        if (path != ctx && !path.startsWith(ctx + "/"))
          respond(ex, 404, """{"error":"not found"}""", "application/json")
        else rateLimiter.map(_.tryAcquire(clientKey(ex))) match {
          case Some(Left(retryAfterSec)) =>
            ex.getResponseHeaders.set("Retry-After", retryAfterSec.toString)
            respond(ex, 429, """{"error":"rate limit exceeded"}""", "application/json")
          case _ => f(ex)
        }
      } catch {
        case e: Exception =>
          // redacted: driver exception text can echo the JDBC URL with
          // credentials (test_no_secrets_in_logs.py contract)
          try respond(ex, 500,
            s"""{"error":"${esc(graft.util.Redact.secrets(
              Option(e.getMessage).getOrElse(e.getClass.getName)))}"}""",
            "application/json")
          catch { case _: Exception => () } // response already committed
      }
    }

  private def clientKey(ex: HttpExchange): String =
    Option(ex.getRemoteAddress).flatMap(a => Option(a.getAddress))
      .map(_.getHostAddress).getOrElse("unknown")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }

  /** Binds and returns the actual port (0 = ephemeral, for tests). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    // GET /health — 200 healthy / 503 if any component down, with
    // per-component details (test_health_api.py:13-83 contract shape);
    // GET /health/{component} — that component alone (health.py).
    server.createContext("/health", handler("/health") { ex =>
      val comps = health()
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
      if (parts.length == 2) comps.get(parts(1)) match {
        case Some(ok) => respond(ex, if (ok) 200 else 503,
          s"""{"component":"${parts(1)}","status":"${if (ok) "healthy" else "unhealthy"}"}""",
          "application/json")
        case None => respond(ex, 404, """{"error":"unknown component"}""", "application/json")
      } else if (parts.length > 2) {
        // /health/db/extra must NOT fall through to the aggregate report:
        // a misconfigured probe would silently watch the wrong signal
        respond(ex, 404, """{"error":"GET /health or /health/{component}"}""",
          "application/json")
      } else {
        val healthy = comps.values.forall(identity)
        val body = comps.map { case (k, ok) =>
          s""""$k":{"status":"${if (ok) "healthy" else "unhealthy"}"}"""
        }.mkString(
          s"""{"status":"${if (healthy) "healthy" else "unhealthy"}","components":{""",
          ",", "}}")
        respond(ex, if (healthy) 200 else 503, body, "application/json")
      }
    })

    // GET /metrics — Prometheus exposition (test_metrics_api.py contract).
    server.createContext("/metrics", handler("/metrics") { ex =>
      respond(ex, 200, registry.render(), "text/plain; version=0.0.4") })

    // GET /dlq/stats — the DLQ stats endpoint (dlq_service.py:375-443).
    server.createContext("/dlq/stats", handler("/dlq/stats") { ex =>
      respond(ex, 200, dlqStatsJson(), "application/json") })

    def queryParams(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .collect { case kv if kv.contains("=") =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap

    // GET /dlq/records?limit=&offset= — ordered page (dlq.py GET /records).
    server.createContext("/dlq/records", handler("/dlq/records") { ex =>
      val q = queryParams(ex)
      respond(ex, 200, dlqRecordsJson(
        q.get("limit").flatMap(_.toIntOption).getOrElse(100),
        q.get("offset").flatMap(_.toIntOption).getOrElse(0)), "application/json")
    })

    // POST /dlq/replay?ids=a,b — re-produce selected events
    // (dlq.py POST /replay → dlq_service.py:222-243).
    server.createContext("/dlq/replay", handler("/dlq/replay") { ex =>
      if (ex.getRequestMethod != "POST")
        respond(ex, 400, """{"error":"POST /dlq/replay?ids=..."}""", "application/json")
      else {
        val ids = queryParams(ex).get("ids").toSeq
          .flatMap(_.split(",")).filter(_.nonEmpty)
        if (ids.isEmpty)
          respond(ex, 400, """{"error":"ids required"}""", "application/json")
        else respond(ex, 200,
          s"""{"replayed":${dlqReplay(ids)},"requested":${ids.length}}""",
          "application/json")
      }
    })

    // GET /reconciliation/jobs — job list (reconciliation.py GET /jobs).
    server.createContext("/reconciliation/jobs", handler("/reconciliation/jobs") { ex =>
      respond(ex, 200, reconJobsJson(), "application/json") })

    // GET /reconciliation/mismatches + POST .../mismatches/{id}/resolve.
    server.createContext("/reconciliation/mismatches", handler("/reconciliation/mismatches") { ex =>
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
      if (ex.getRequestMethod == "POST" && parts.length == 4 && parts(3) == "resolve") {
        if (mismatchResolve(parts(2)))
          respond(ex, 200, s"""{"mismatch_id":"${esc(parts(2))}","resolved":true}""",
            "application/json")
        else respond(ex, 404, """{"error":"mismatch not found"}""", "application/json")
      } else if (ex.getRequestMethod == "GET" && parts.length == 2)
        respond(ex, 200, mismatchesJson(), "application/json")
      else respond(ex, 400, """{"error":"bad mismatches request"}""", "application/json")
    })

    // POST /reconciliation/trigger?table=t — manual trigger
    // (reconciliation.py:73-119).
    server.createContext("/reconciliation/trigger", handler("/reconciliation/trigger") { ex =>
      // POST-only: the reference route is a POST and the trigger is a side
      // effect — a GET must not fire a reconciliation run.
      if (ex.getRequestMethod != "POST") {
        ex.getResponseHeaders.set("Allow", "POST")
        respond(ex, 405, """{"error":"method not allowed"}""", "application/json")
      } else {
        val table = queryParams(ex).get("table")
        table match {
          case Some(t) if Gdpr.validIdentifier(t) =>
            reconTrigger(t)
            respond(ex, 202, s"""{"status":"triggered","table":"$t"}""", "application/json")
          case _ =>
            respond(ex, 400, """{"error":"missing or invalid table"}""", "application/json")
        }
      }
    })

    // DELETE /gdpr/{table}/{pk} — dual-store erasure (gdpr.py:37-216).
    server.createContext("/gdpr", handler("/gdpr") { ex =>
      val parts = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
      if (ex.getRequestMethod != "DELETE" || parts.length != 3)
        respond(ex, 400, """{"error":"DELETE /gdpr/{table}/{pk}"}""", "application/json")
      else gdprDelete(parts(1), parts(2)) match {
        case Right(r) => respond(ex, 200,
          s"""{"primary_key":"${esc(r.primaryKey)}","deleted_from_source":${r.deletedFromSource},""" +
            s""""deleted_from_target":${r.deletedFromTarget},"audit_log_id":"${r.auditLogId}"}""",
          "application/json")
        case Left(err) =>
          // validation failures are the caller's fault (400), absence is
          // 404; only genuine execution failures surface as 500. Absence
          // is matched on OUR message prefix, not a bare "not found"
          // substring — JDBC execution failures ("Table X not found")
          // must stay 500, or a failed erasure reads as record-absent
          val code =
            if (err.startsWith("record ") && err.contains("not found")) 404
            else if (err.startsWith("invalid identifier")) 400
            else 500
          respond(ex, code,
            s"""{"error":"${esc(graft.util.Redact.secrets(err))}"}""", "application/json")
      }
    })

    // Small daemon pool: a long handler (GDPR delete runs Spark jobs)
    // must not block /health — a single dispatcher thread would freeze
    // the whole ops surface behind it and fail liveness probes.
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "api-server"); t.setDaemon(true); t
    }))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)
}
