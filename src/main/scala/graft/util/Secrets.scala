package graft.util

import scala.collection.concurrent.TrieMap

/** Credential-store seam — the engine-side equivalent of the reference's
  * Vault repository (`src/repositories/vault_repository.py:22-312`:
  * connect/health_check/get_credentials with a TTL cache sized under the
  * 24 h lease, refresh_credentials, close). The backend is an injected
  * fetch function: a static map or env lookup in tests, an actual
  * Vault/KMS client in production — the secrets SDK is infrastructure,
  * not engine semantics, so the engine depends only on this seam.
  *
  * Credentials resolve INTO connection URLs via `${secret:path#key}`
  * placeholders ([[resolveUrl]]), so configs, logs, and exception text
  * never carry a literal password (pairs with [[Redact]]; failure text
  * names the path and key, never a value).
  */
final class Secrets(
    fetch: String => Option[Map[String, String]],
    clock: () => Long = () => System.currentTimeMillis()) {

  /** Default cache TTL: 23 h under a 24 h lease, the reference's
    * `cache_ttl_hours: int = 23` (`vault_repository.py:108`).
    */
  val DefaultTtlMs: Long = 23L * 3600 * 1000

  private final case class Entry(creds: Map[String, String], expiresAt: Long)
  private val cache = TrieMap.empty[String, Entry]

  /** Fetch credentials at `path`, serving from cache while fresh
    * (`get_credentials`, `vault_repository.py:104-154`). Left = the
    * failure reason, value-free by construction.
    */
  def getCredentials(path: String, useCache: Boolean = true,
      ttlMs: Long = DefaultTtlMs): Either[String, Map[String, String]] = {
    if (useCache) cache.get(path).filter(_.expiresAt > clock()) match {
      case Some(e) => return Right(e.creds)
      case None    => ()
    }
    refresh(path, ttlMs)
  }

  /** Force a backend read and re-cache (`refresh_credentials`,
    * `vault_repository.py:191-214`).
    */
  def refresh(path: String, ttlMs: Long = DefaultTtlMs): Either[String, Map[String, String]] =
    try fetch(path) match {
      case Some(creds) =>
        cache.put(path, Entry(creds, clock() + ttlMs))
        Right(creds)
      case None => Left(s"secret path not found: $path")
    } catch {
      // the exception text could carry backend detail (URLs, tokens) —
      // surface only the path, like the reference's structured error log
      case _: Exception => Left(s"secret backend error reading: $path")
    }

  /** Liveness of the backend (`health_check`,
    * `vault_repository.py:63-96`): a probe read must not throw. The probe
    * path need not exist — reachability is the question, not presence.
    */
  def healthCheck(probePath: String = "sys/health"): Boolean =
    try { fetch(probePath); true } catch { case _: Exception => false }

  /** Resolve every `${secret:path#key}` placeholder in a connection URL.
    * All-or-nothing: one unresolvable placeholder fails the whole URL
    * (value-free error), because a half-resolved URL would travel into
    * driver logs looking valid.
    */
  def resolveUrl(template: String): Either[String, String] = {
    val Ph = """\$\{secret:([^#}]+)#([^}]+)\}""".r
    val failures = Seq.newBuilder[String]
    val out = Ph.replaceAllIn(template, m => {
      val (path, key) = (m.group(1), m.group(2))
      getCredentials(path) match {
        case Right(creds) => creds.get(key) match {
          case Some(v) => java.util.regex.Matcher.quoteReplacement(v)
          case None    => failures += s"$path#$key"; ""
        }
        case Left(_) => failures += s"$path#$key"; ""
      }
    })
    val missing = failures.result()
    if (missing.isEmpty) Right(out)
    else Left(s"unresolved secrets: ${missing.mkString(", ")}")
  }

  /** Run `use` with the path's credentials; on an auth-shaped failure,
    * refresh once and retry — the rotation contract
    * (`test_credential_rotation.py:15-110`: rotated secrets propagate
    * WITHOUT a restart; the consumer detects the stale credential at use
    * time, re-reads, and continues). `isAuthFailure` decides which
    * exceptions mean "credential stale" (default: SQLState 28xxx —
    * invalid-authorization class — or an auth-flavored message); anything
    * else propagates unchanged, so genuine outages still fail fast.
    */
  def withRotation[A](path: String)(use: Map[String, String] => A,
      isAuthFailure: Throwable => Boolean = Secrets.defaultAuthFailure): A = {
    val creds = getCredentials(path).fold(m => throw new IllegalStateException(m), identity)
    try use(creds)
    catch {
      case e: Exception if isAuthFailure(e) =>
        val fresh = refresh(path).fold(m => throw new IllegalStateException(m), identity)
        use(fresh)
    }
  }

  /** Drop every cached credential (`close`,
    * `vault_repository.py:98-102`).
    */
  def close(): Unit = cache.clear()
}

object Secrets {
  /** SQLState class 28 = invalid authorization (SQL standard); message
    * sniffing covers drivers that wrap auth failures untyped.
    */
  def defaultAuthFailure(e: Throwable): Boolean = e match {
    case s: java.sql.SQLException if Option(s.getSQLState).exists(_.startsWith("28")) => true
    case _ => Option(e.getMessage).map(_.toLowerCase).exists(m =>
      // contains, not a regex match: `.matches` needs a FULL-string match
      // and `.` stops at newlines — a multiline driver message ("FATAL:
      // password authentication failed\nDetail: ...") would slip through
      Seq("authentication", "authorization", "password", "credential")
        .exists(m.contains))
  }
}
