package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and scrubbing for training text: regex classes for the
  * machine-recognizable identifier shapes (emails, IPv4s, phone-ish
  * number runs, SSN-shaped triples), a per-doc hit report, and a
  * replace-with-placeholder scrub. This is the pattern tier of PII
  * removal — the published pipelines (C4, Dolma, FineWeb) run exactly
  * these classes at corpus scale and leave NER-grade detection to model
  * passes; the placeholder convention (`[EMAIL]` …) matches theirs.
  *
  * All patterns are RE2-safe (no lookarounds, no backrefs) so they run
  * under any engine's regex and stay linear-time on adversarial inputs —
  * a crawl corpus WILL contain pathological strings, and a backtracking
  * pattern is a denial-of-service on executor threads.
  *
  * Scale shape: pure per-row codegen'd expressions (`regexp_count` /
  * `regexp_replace`) — no shuffle, no state, scan-bound; the scrub
  * composes into any pipeline as a projection.
  */
object PiiScrub {

  /** Pattern per PII class, applied in this order (order matters: emails
    * are scrubbed before phone runs so a local-part digit run is not
    * half-eaten by the phone pattern).
    *
    * The phone class requires ≥10 digits (each pair separated by at most
    * two of `() .-`) — an 8-digit ISO date (`2026-08-13`) or a
    * thousands-grouped figure (`1 000 000`) is NOT a phone; matching
    * those would silently corrupt ordinary prose corpus-wide.
    */
  val Patterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "ipv4" -> """\b(?:\d{1,3}\.){3}\d{1,3}\b""",
    "ssn" -> """\b\d{3}-\d{2}-\d{4}\b""",
    "phone" -> """\+?\d(?:[() .-]{0,2}\d){9,}""")

  private def placeholder(name: String): String = s"[${name.toUpperCase}]"

  /** Per-doc PII hit counts: one `n_<class>` column per pattern plus the
    * total. Docs with zero hits are kept (count 0) — the report is the
    * audit artifact, and "how much of the corpus is clean" is its point.
    *
    * Counting is SEQUENTIAL in [[Patterns]] order (each class counts on
    * the text with earlier classes already replaced), so every occurrence
    * is attributed to exactly one class — an SSN is not also a phone —
    * and the counts agree with what [[scrub]] replaces.
    */
  def piiReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = Patterns.foldLeft(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"))) {
      case (acc, (name, pat)) =>
        acc.withColumn(s"n_$name", regexp_count(col("_text"), lit(pat)))
          .withColumn("_text", regexp_replace(col("_text"), pat, placeholder(name)))
    }
    counted
      .withColumn("n_pii", Patterns.map { case (n, _) => col(s"n_$n") }.reduce(_ + _))
      .drop("_text")
  }

  /** `textCol` with every PII match replaced by its class placeholder,
    * classes applied in [[Patterns]] order. Expression-only — usable as
    * a column in any projection.
    */
  def scrub(textCol: Column): Column =
    Patterns.foldLeft(textCol) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, placeholder(name))
    }

  /** The scrubbed corpus: all columns preserved, `textCol` replaced by
    * its scrubbed form.
    */
  def scrubbed(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, scrub(col(textCol)))
}
