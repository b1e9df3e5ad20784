package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-event transforms: validation split, DLQ classification, TTL expiry,
  * envelope unwrap, canonical checksums, and the declarative
  * transformation-rule compiler (MASK/REDACT/CAST/RENAME/COMPUTE).
  *
  * Reference: validation `src/utils/validators.py:44-83` +
  * `src/models/change_event.py:93-117`; TTL `src/services/type_mapper.py:
  * 136-168`; transformation rules `specs/001-cass-cdc-pg/data-model.md:
  * 411-421`; checksum `src/services/reconciliation_engine.py:410-421`.
  *
  * Everything here is a pure `Column` expression — no UDFs — so the whole
  * chain stays inside whole-stage codegen and filters remain pushable.
  */
object EventOps {

  /** Error taxonomy (reference `src/models/dlq_record.py:10-17`). */
  val ErrorTypes: Seq[String] = Seq(
    "SCHEMA_MISMATCH", "TYPE_CONVERSION_ERROR", "CONSTRAINT_VIOLATION",
    "NETWORK_TIMEOUT", "UNKNOWN")

  /** Classify an event row into an error type, null when valid.
    * Rules mirror `validators.py`: required fields present, value in a
    * sane range (the stand-in for the "timestamp not in the future"
    * skew bound), known operation/event type.
    */
  def errorType(eventType: Column, value: Column, userId: Column,
      validTypes: Seq[String], maxValue: Double): Column =
    errorTypeFor(eventType, Seq(userId), Some(value), validTypes, maxValue)

  /** Per-table generalization of [[errorType]] (the reference validates
    * each table's events against that table's pk + constraints,
    * `validators.py:44-83`): any-null pk → SCHEMA_MISMATCH; the optional
    * `value` column carries the fixture's null/range constraints — tables
    * without a constrained numeric column pass `None` and skip both.
    * Clause order is pinned (pk/op null, value null, unknown op, range)
    * so the single-table form's classification is byte-identical.
    */
  def errorTypeFor(eventType: Column, pkCols: Seq[Column], value: Option[Column],
      validTypes: Seq[String], maxValue: Double): Column = {
    val pkNull = pkCols.map(_.isNull).reduce(_ || _)
    val afterNulls = value match {
      case Some(v) => when(pkNull || eventType.isNull, lit("SCHEMA_MISMATCH"))
        .when(v.isNull, lit("TYPE_CONVERSION_ERROR"))
      case None => when(pkNull || eventType.isNull, lit("SCHEMA_MISMATCH"))
    }
    val afterKnown = afterNulls
      .when(!eventType.isin(validTypes.map(lit): _*), lit("SCHEMA_MISMATCH"))
    value.fold(afterKnown)(v =>
        afterKnown.when(v < 0 || v > maxValue, lit("CONSTRAINT_VIOLATION")))
      .otherwise(lit(null).cast("string"))
  }

  /** Validation split: (valid, dlqBound). One pass of the predicate each
    * way; Catalyst pushes both filters to the scan.
    */
  def validationSplit(df: DataFrame, err: Column): (DataFrame, DataFrame) = {
    val tagged = df.withColumn("error_type", err)
    (tagged.filter(col("error_type").isNull).drop("error_type"),
     tagged.filter(col("error_type").isNotNull))
  }

  /** TTL expiry micros: `event_ts + ttl_seconds`, null when no/zero TTL
    * (`type_mapper.py:136-168`). Kept in integer µs — exact, and
    * oracle-comparable without timestamp formatting.
    */
  def ttlExpiryMicros(tsUs: Column, ttlSeconds: Column): Column =
    when(ttlSeconds.isNotNull && ttlSeconds > 0,
      tsUs + ttlSeconds.cast("long") * lit(1000000L))
      .otherwise(lit(null).cast("long"))

  /** Rows still live at `nowUs` under TTL semantics (filter-on-read view;
    * replaces the reference's PLpgSQL expiry trigger `init-db.sql:198-213`).
    */
  def ttlLive(expiryUs: Column, nowUs: Long): Column =
    expiryUs.isNull || expiryUs > nowUs

  /** Canonical field encoding for checksums: `<len>:<value>`, or the
    * marker `N` for NULL. The length prefix makes the encoding
    * prefix-free, so values containing the field delimiter cannot collide
    * ((a,'b|c') vs (a|b,c)), and NULL is distinct from every value
    * ((a,NULL,b) vs (a,b,NULL)) — the ambiguities a bare
    * `concat_ws('|',...)` has, because it silently SKIPS nulls. The
    * reference avoids both by hashing sort_keys JSON
    * (`reconciliation_engine.py:420`); this form is the engine-portable
    * equivalent (see [[canonicalFieldSqlDuck]]).
    */
  def canonicalField(c: Column): Column = {
    val s = c.cast("string")
    coalesce(concat(length(s).cast("string"), lit(":"), s), lit("N"))
  }

  /** DuckDB mirror of [[canonicalField]] for oracle SQL generation
    * (`||` not `concat`: DuckDB's concat skips NULLs too).
    */
  def canonicalFieldSqlDuck(c: String): String =
    s"coalesce(CAST(length(CAST($c AS VARCHAR)) AS VARCHAR) || ':' || CAST($c AS VARCHAR), 'N')"

  /** Canonical row checksum: SHA-256 over '|'-joined [[canonicalField]]
    * encodings of the given columns, in the caller-fixed order. Callers
    * pass columns pre-cast to exact (int/string) types so the string
    * rendering is engine-identical.
    */
  def canonicalChecksum(cols: Seq[Column]): Column =
    sha2(concat_ws("|", cols.map(canonicalField).toIndexedSeq: _*), 256)

  /** DuckDB mirror of [[canonicalChecksum]]. */
  def checksumSqlDuck(cols: Seq[String]): String =
    s"sha256(concat_ws('|', ${cols.map(canonicalFieldSqlDuck).mkString(", ")}))"

  /** Exact cents from a 2-decimal double — `round` then cast, identical in
    * Spark and DuckDB (both round positive halves up/away).
    */
  def cents(value: Column): Column = round(value * 100, 0).cast("long")

  /** Declarative transformation rules (`data-model.md:411-421`): compile a
    * rule list onto a DataFrame. Expressions are Spark SQL strings, mirroring
    * the reference's SQL-ish rule expressions.
    */
  sealed trait TransformRule { def target: String }
  final case class Mask(target: String, keepLastVisible: Int = 4) extends TransformRule
  final case class Redact(target: String) extends TransformRule
  final case class CastTo(target: String, toType: String) extends TransformRule
  final case class Rename(target: String, from: String) extends TransformRule
  final case class Compute(target: String, sqlExpr: String) extends TransformRule

  def applyRules(df: DataFrame, rules: Seq[TransformRule]): DataFrame =
    rules.foldLeft(df) {
      case (d, Mask(c, keep)) =>
        // e.g. email masking à la data-model.md:418: keep the tail, mask the head
        d.withColumn(c, concat(lit("***"),
          substring(col(c), -keep, keep)))
      case (d, Redact(c))      => d.withColumn(c, lit("[REDACTED]"))
      case (d, CastTo(c, t))   => d.withColumn(c, col(c).cast(t))
      case (d, Rename(c, f))   => d.withColumnRenamed(f, c)
      case (d, Compute(c, e))  => d.withColumn(c, expr(e))
    }
}
