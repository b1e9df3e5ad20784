package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.TextIngest

/** The raw-corpus ingest seam over REAL files: fixture docs serialized
  * to JSONL/CSV on disk with injected malformed lines, read back through
  * `spark.read.text` + the declared-schema parse, and — the seam's whole
  * point — the identical parse expression re-run under
  * `readStream.text` (AvailableNow) with identical results.
  */
class IngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema =
    StructType.fromDDL("doc_id BIGINT, text STRING, lang STRING, source STRING")

  private def writeJsonl(dir: String): (Long, Long) = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    docs.select(when(pmod(col("doc_id"), lit(7L)) === 3, lit("{broken"))
        .otherwise(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source")))).as("value"))
      .coalesce(1).write.mode("overwrite").text(dir)
    val corrupt = docs.filter(pmod(col("doc_id"), lit(7L)) === 3).count()
    (n, corrupt)
  }

  test("jsonl file round-trip: valid rows survive byte-exact, corrupt lines route to DLQ") {
    val dir = tmpDir("jsonl_ingest")
    val (n, corrupt) = writeJsonl(dir)
    val lines = spark.read.text(dir).withColumnRenamed("value", "line")
    val (valid, dlq) = TextIngest.split(
      TextIngest.parseJsonl(lines, schema), Seq("doc_id", "text"))
    assert(dlq.count() === corrupt)
    assert(dlq.select("error_class").distinct().as[String].collect()
      .toSeq === Seq("MALFORMED_LINE"))
    // surviving rows equal the original rows, column for column
    val orig = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(7L)) =!= 3)
      .select("doc_id", "text", "lang", "source")
    assert(valid.exceptAll(orig).isEmpty && orig.exceptAll(valid).isEmpty,
      "JSON round-trip must be lossless on valid rows")
    assert(valid.count() === n - corrupt)
  }

  test("csv parse: well-formed lines round-trip; missing required field routes") {
    // build csv lines by hand (text is [a-z ]* in the fixture — no
    // quoting needed); blank out doc_id on a deterministic subset
    val docs = Tables.documents(spark, sfDir)
    val lines = docs.select(when(pmod(col("doc_id"), lit(11L)) === 5,
        concat(lit(","), col("text"), lit(","), col("lang"), lit(","), col("source")))
      .otherwise(concat_ws(",", col("doc_id"), col("text"), col("lang"),
        col("source"))).as("line"))
    val (valid, dlq) = TextIngest.split(
      TextIngest.parseCsv(lines, schema), Seq("doc_id", "text"))
    val dropped = docs.filter(pmod(col("doc_id"), lit(11L)) === 5).count()
    assert(dlq.count() === dropped,
      "a parsed row with a null required key is quarantine material")
    val orig = docs.filter(pmod(col("doc_id"), lit(11L)) =!= 5)
      .select("doc_id", "text", "lang", "source")
    assert(valid.exceptAll(orig).isEmpty && orig.exceptAll(valid).isEmpty)
  }

  test("the same parse runs under readStream (AvailableNow) with identical results") {
    val dir = tmpDir("jsonl_stream")
    val (n, corrupt) = writeJsonl(dir)
    val lines = spark.readStream.text(dir).withColumnRenamed("value", "line")
    val (valid, _) = TextIngest.split(
      TextIngest.parseJsonl(lines, schema), Seq("doc_id", "text"))
    val out = tmpDir("jsonl_stream_out")
    val ckpt = tmpDir("jsonl_stream_ckpt")
    valid.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.count() === n - corrupt)
    val batch = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(7L)) =!= 3)
      .select("doc_id", "text", "lang", "source")
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "streaming and batch ingest must produce identical rows")
  }
}
