package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Line-oriented text ingest (JSONL / CSV) with corrupt-record ROUTING —
  * the raw-corpus front door: crawl dumps and vendor drops arrive as
  * compressed line files, a fraction of every real batch is malformed,
  * and a 100 TB ingest must quarantine those lines (count them, keep the
  * bytes) rather than silently drop them or kill the job.
  *
  * The parse is `from_json`/`from_csv` over `spark.read.text` lines —
  * NOT the DataFrameReader json/csv path — deliberately:
  *  - the SAME expression runs under `readStream.text` unchanged, so
  *    batch backfill and streaming tail share one parse (asserted in the
  *    spec's AvailableNow run);
  *  - corrupt routing needs no `columnNameOfCorruptRecord` cache
  *    workaround (filtering the reader-level corrupt column requires
  *    materialization since Spark 2.3; a null struct from `from_json`
  *    does not);
  *  - the parse is a codegen'd per-row projection — no driver-side
  *    sampling pass for schema inference, which at 100 TB is a full
  *    extra read (schemas here are DECLARED, the registry discipline).
  *
  * A malformed line yields a NULL struct (PERMISSIVE), so the split is
  * `parsed IS NULL` → DLQ row carrying the raw line for replay — the
  * same keep-the-original-payload quarantine contract as the CDC DLQ
  * (reference `src/models/dlq_record.py:37,53` retains
  * `original_event` verbatim for replay).
  */
object TextIngest {

  /** Parse JSONL lines (column `line`) against a declared schema.
    * Output: the input columns plus `rec` (nullable struct). */
  def parseJsonl(lines: DataFrame, schema: StructType): DataFrame =
    lines.withColumn("rec", from_json(col("line"), schema))

  /** Parse CSV lines (column `line`) against a declared schema. */
  def parseCsv(lines: DataFrame, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    lines.withColumn("rec",
      from_csv(col("line"), schema, options + ("mode" -> "PERMISSIVE")))

  /** Split a parsed frame into (valid, dlq): a record is valid iff the
    * struct parsed AND every `requiredFields` entry is non-null (a
    * partially-parsed PERMISSIVE row with a null key is quarantine
    * material, not data). DLQ rows keep the raw line for replay.
    */
  def split(parsed: DataFrame, requiredFields: Seq[String])
      : (DataFrame, DataFrame) = {
    val ok = requiredFields.foldLeft(col("rec").isNotNull) {
      (acc, f) => acc && col(s"rec.$f").isNotNull
    }
    val valid = parsed.filter(ok).select(col("rec.*"))
    val dlq = parsed.filter(!ok)
      .select(col("line"), lit("MALFORMED_LINE").as("error_class"))
    (valid, dlq)
  }
}
