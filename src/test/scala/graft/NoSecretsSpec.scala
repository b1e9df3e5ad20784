package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.api.ApiServer
import graft.ops.Metrics
import graft.util.Redact

/** Credential redaction (reference `tests/integration/test_no_secrets_in_
  * logs.py`): its password grep patterns must find zero real matches in
  * any emitted surface — exception text, API error bodies, audit lines.
  */
class NoSecretsSpec extends SparkSpecBase {

  /** The reference test's grep, transliterated: password-ish key/value
    * pairs, case-insensitive, with its benign-match allowlist.
    */
  private def passwordLeaks(text: String): Seq[String] = {
    val pat = "(?i)(?:password|pwd)['\"]?\\s*[:=]\\s*['\"]?([^'\"\\s,}]+)".r
    pat.findAllMatchIn(text).map(_.group(1)).toSeq
      .filterNot(m => Seq("null", "None", "****", "***", "xxxx", "REDACTED").contains(m))
      .filterNot(m => m.startsWith("$") || m.length <= 2)
  }

  test("Redact.secrets strips key=value and URL userinfo credentials") {
    val samples = Seq(
      "connect failed: jdbc:postgresql://db:5432/app?user=svc&password=hunter2",
      """config echo {"password": "hunter2", "host": "db"}""",
      "PWD=topsecret;user=svc",
      "No suitable driver found for jdbc:postgresql://svc:hunter2@db:5432/app",
      "token=abc123 secret: xyz")
    samples.foreach { s =>
      val r = Redact.secrets(s)
      assert(passwordLeaks(r).isEmpty, s"leak survived redaction: $r")
      assert(!r.contains("hunter2") && !r.contains("topsecret") &&
        !r.contains("abc123") && !r.contains("xyz"), s"secret visible in: $r")
    }
    // non-secret text is untouched
    assert(Redact.secrets("record 5 not found in source users")
      == "record 5 not found in source users")
  }

  test("Secrets seam: TTL cache, refresh, URL resolution, value-free errors") {
    var now = 0L
    var fetches = 0
    val backend = Map(
      "db/cdc" -> Map("user" -> "svc", "password" -> "hunter2-secret"))
    val s = new graft.util.Secrets(
      p => { fetches += 1; backend.get(p) }, clock = () => now)

    // cache serves until TTL; expiry re-fetches (23h default under 24h lease)
    assert(s.getCredentials("db/cdc") == Right(backend("db/cdc")))
    assert(s.getCredentials("db/cdc") == Right(backend("db/cdc")))
    assert(fetches == 1)
    now = s.DefaultTtlMs + 1
    assert(s.getCredentials("db/cdc").isRight && fetches == 2)
    // forced refresh always hits the backend
    assert(s.refresh("db/cdc").isRight && fetches == 3)

    // placeholder resolution: the URL carries no literal secret until here
    val url = "jdbc:postgresql://h/db?user=${secret:db/cdc#user}&password=${secret:db/cdc#password}"
    assert(s.resolveUrl(url) ==
      Right("jdbc:postgresql://h/db?user=svc&password=hunter2-secret"))

    // a missing path/key fails the WHOLE url with value-free text
    val bad = s.resolveUrl("x?p=${secret:db/cdc#nope}&q=${secret:gone#k}")
    assert(bad.isLeft)
    val err = bad.swap.getOrElse("")
    assert(err.contains("db/cdc#nope") && err.contains("gone#k"))
    assert(passwordLeaks(err).isEmpty && !err.contains("hunter2"))

    // a throwing backend: unhealthy, and the error names only the path
    val boom = new graft.util.Secrets(_ => throw new RuntimeException(
      "connect failed: vault://token=tok-123"))
    assert(!boom.healthCheck())
    val e2 = boom.getCredentials("db/cdc").swap.getOrElse("")
    assert(!e2.contains("tok-123") && e2.contains("db/cdc"))

    s.close()
  }

  test("a QUOTED secret containing spaces is redacted whole, not to the first space") {
    val r = Redact.secrets("""config echo {"password": "ab cd ef", "host": "db"}""")
    assert(!r.contains("ab") && !r.contains("cd") && !r.contains("ef"),
      s"quoted secret tail leaked: $r")
    assert(r.contains(""""host": "db""""), s"non-secret JSON must survive: $r")
    val r2 = Redact.secrets("secret: 'two words here' next=1")
    assert(!r2.contains("two") && !r2.contains("words") && r2.contains("next=1"), r2)
  }

  test("a secret containing a comma is redacted whole, not split at the comma") {
    val out = Redact.secrets("connect failed: password=ab,cd123 for host")
    assert(!out.contains("ab,cd123") && !out.contains("cd123"),
      s"comma-bearing secret leaked its tail: $out")
    assert(passwordLeaks(out).isEmpty)
  }

  test("credential rotation: stale auth refreshes once and retries, no restart") {
    // test_credential_rotation.py contract: after the backend rotates the
    // secret, the consumer hits one auth failure, re-reads, and continues
    var current = Map("password" -> "old-pass")
    val s = new graft.util.Secrets(_ => Some(current))
    assert(s.getCredentials("db/cdc").toOption.get("password") == "old-pass")
    current = Map("password" -> "new-pass") // rotation happens upstream
    var attempts = 0
    val r = s.withRotation("db/cdc") { creds =>
      attempts += 1
      if (creds("password") != "new-pass")
        throw new java.sql.SQLException("password authentication failed", "28P01")
      "connected"
    }
    assert(r == "connected" && attempts == 2, "exactly one refresh-and-retry")

    // a non-auth failure must NOT trigger a refresh loop
    var tries = 0
    val boom = intercept[RuntimeException] {
      s.withRotation("db/cdc") { _ => tries += 1; throw new RuntimeException("disk full") }
    }
    assert(boom.getMessage == "disk full" && tries == 1)
  }

  test("JDBC connect failure text carries no URL credentials") {
    val url = "jdbc:nodriver://svc:hunter2@db:5432/app?password=hunter2"
    val e = intercept[java.sql.SQLException] {
      graft.sink.JdbcLwwExecutor.connect(url)
    }
    val msg = Option(e.getMessage).getOrElse("")
    assert(passwordLeaks(msg).isEmpty, s"leaky connect error: $msg")
    assert(!msg.contains("hunter2"), s"credential visible in connect error: $msg")
  }

  test("API 500 body redacts credentials from callback exceptions") {
    val api = new ApiServer(
      registry = new Metrics.Registry,
      health = () => Map("spark" -> true),
      dlqStatsJson = () => sys.error(
        "target down: jdbc:postgresql://db/app?user=svc&password=hunter2"),
      reconTrigger = _ => (),
      gdprDelete = (_, _) => Left(
        "target delete failed: FATAL password=hunter2 rejected"))
    val port = api.start()
    val http = HttpClient.newHttpClient()
    def send(method: String, path: String): HttpResponse[String] =
      http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .method(method, HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val boom = send("GET", "/dlq/stats")
      assert(boom.statusCode() == 500)
      assert(passwordLeaks(boom.body()).isEmpty && !boom.body().contains("hunter2"),
        s"500 body leaks: ${boom.body()}")
      val gdpr = send("DELETE", "/gdpr/users/1")
      assert(gdpr.statusCode() == 500)
      assert(passwordLeaks(gdpr.body()).isEmpty && !gdpr.body().contains("hunter2"),
        s"gdpr error body leaks: ${gdpr.body()}")
    } finally api.stop()
  }
}
