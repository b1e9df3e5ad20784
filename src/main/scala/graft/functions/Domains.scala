package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL → host → registrable-domain (eTLD+1) extraction — pure Column
  * composition over built-in codegen'd expressions (regexp, split,
  * element_at, IN over a literal set): no UDF, no custom Expression,
  * fully pushable and whole-stage-codegen'd.
  *
  * Why it exists: the curation reputation machinery
  * ([[graft.llm.Sampling.sourceReputationFilter]], the graph centrality
  * pack) keys on a `source` column; real crawl pipelines key on the
  * REGISTRABLE domain extracted from each document's URL (domain-level
  * quality gating per Penedo et al. 2024, FineWeb §3.1 — a page is
  * judged by the company its domain keeps). eTLD+1 grouping is what
  * makes `news.bbc.co.uk` and `www.bbc.co.uk` one reputation unit while
  * keeping `foo.co.uk` and `bar.co.uk` separate.
  *
  * Public-suffix handling is a DOCUMENTED APPROXIMATION: the full
  * Mozilla PSL is a ~10k-entry data file (conf-not-code, like the
  * reference's connector JSON); here the common two-label public
  * suffixes ship as a literal IN-set (codegen'd hash lookup), and
  * anything else falls back to the last two labels. Swapping in the
  * full PSL is a data change (broadcast the list, same expressions),
  * not a code change.
  *
  * Limitations (documented, deterministic): IPv6 bracket literals are
  * supported; IPv4 literals pass through whole; internationalized
  * domains are grouped by their punycode/raw form as crawled.
  */
object Domains {

  /** Two-label public suffixes (the high-traffic subset of the PSL):
    * `registrableDomain` keeps THREE labels for hosts ending in one of
    * these.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw", "com.my",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "co.za", "org.za", "web.za",
    "co.il", "org.il", "ac.il",
    "com.pl", "net.pl", "org.pl",
    "com.ru", "org.ru", "net.ru",
    "co.th", "in.th", "or.th",
    "com.ua", "co.id", "or.id", "web.id",
    "com.vn", "com.ph", "com.pk", "com.eg", "com.sa", "com.ng")

  /** The host of a URL: scheme (optional), userinfo, port, path, query
    * and fragment stripped; IPv6 bracket literals unwrapped; lowercased.
    * Empty string when nothing host-like is present (regexp_extract's
    * no-match value — never NULL, so group-bys stay total).
    */
  def host(url: Column): Column = {
    val prefix = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?"
    val bracketed = regexp_extract(url, prefix + "\\[([^\\]]+)\\]", 1)
    val plain = regexp_extract(url, prefix + "([^/:?#\\[]*)", 1)
    lower(when(bracketed =!= "", bracketed).otherwise(plain))
  }

  /** Registrable domain (eTLD+1) of a host: the last two labels, or the
    * last THREE when the host ends in a [[MultiLabelSuffixes]] entry;
    * hosts with ≤ 2 labels and IPv4 literals pass through whole.
    */
  def registrableDomain(h: Column): Column = {
    val parts = split(h, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    val isIpv4 = h.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    when(isIpv4 || size(parts) <= 2, h)
      .when(last2.isInCollection(MultiLabelSuffixes), last3)
      .otherwise(last2)
  }

  /** [[registrableDomain]] ∘ [[host]] — URL straight to eTLD+1. */
  def urlDomain(url: Column): Column = registrableDomain(host(url))

  /** Query parameters dropped by [[canonicalUrl]] — the tracking
    * decorations that make one page crawl as many URLs (the dominant
    * source of URL-level duplicates in web corpora).
    */
  val TrackingParamRe: String =
    "^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="

  /** Canonical URL for dedup keying: lowercased host with a leading
    * `www.` stripped, scheme/userinfo/port/fragment dropped, trailing
    * slashes on the path stripped, tracking parameters
    * ([[TrackingParamRe]]) removed and the surviving query parameters
    * SORTED (param order is presentation, not identity). Two crawls of
    * one page land on one key; distinct pages never merge. Pure Column
    * composition (regexp + split + HOF filter + array_sort) — codegen'd,
    * zero shuffle.
    */
  def canonicalUrl(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    // strip scheme + userinfo + host[:port] → path?query#fragment
    val rest = regexp_replace(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?[^/?#]*", "")
    val path = regexp_replace(regexp_extract(rest, "^([^?#]*)", 1), "/+$", "")
    val q = regexp_extract(rest, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(q, "&"),
      x => !x.rlike(TrackingParamRe) && x =!= "")), "&")
    concat(h, path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** The DuckDB rendering of [[canonicalUrl]] over a URL SQL
    * expression — identical regexes, list_filter/list_sort for the
    * parameter set (binary collation both engines).
    */
  def canonicalUrlSqlDuck(urlSql: String): String = {
    val h = s"regexp_replace(${hostSqlDuck(urlSql)}, '^www\\.', '')"
    val rest = s"regexp_replace($urlSql, " +
      "'^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?[^/?#]*', '')"
    val path = s"regexp_replace(regexp_extract($rest, '^([^?#]*)', 1), '/+$$', '')"
    val q = s"regexp_extract($rest, '\\?([^#]*)', 1)"
    val kept = s"array_to_string(list_sort(list_filter(string_split($q, '&'), " +
      s"x -> NOT regexp_matches(x, '$TrackingParamRe') AND x <> '')), '&')"
    s"($h || $path || (CASE WHEN $kept <> '' THEN '?' || $kept ELSE '' END))"
  }

  /** The DuckDB rendering of [[host]] over a URL SQL expression —
    * identical semantics (RE2 regexes match the Java ones used here).
    * Compose in a CTE chain: `SELECT …, ${hostSqlDuck("url")} AS h`.
    */
  def hostSqlDuck(urlSql: String): String = {
    val prefix = "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?"
    s"""lower(CASE WHEN regexp_extract($urlSql, '$prefix\\[([^\\]]+)\\]', 1) <> ''
       |  THEN regexp_extract($urlSql, '$prefix\\[([^\\]]+)\\]', 1)
       |  ELSE regexp_extract($urlSql, '$prefix([^/:?#\\[]*)', 1) END)"""
      .stripMargin.replace("\n", " ")
  }

  /** The DuckDB rendering of [[registrableDomain]] over a host column
    * reference (DuckDB list indexing is 1-based with negative wrap, as
    * is Spark's element_at) — next CTE stage after [[hostSqlDuck]].
    */
  def registrableDomainSqlDuck(hSql: String): String = {
    val inList = MultiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    def lastN(n: Int) = (n to 1 by -1)
      .map(i => s"string_split($hSql, '.')[-$i]").mkString(" || '.' || ")
    s"""CASE
       |  WHEN regexp_matches($hSql, '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$$')
       |    OR len(string_split($hSql, '.')) <= 2 THEN $hSql
       |  WHEN ${lastN(2)} IN ($inList) THEN ${lastN(3)}
       |  ELSE ${lastN(2)} END""".stripMargin.replace("\n", " ")
  }
}
