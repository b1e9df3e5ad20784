package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exact dedup across micro-batches / crawl snapshots: emit
  * only documents whose content hash has never been seen in ANY earlier
  * batch — the streaming form of [[Dedup.exactDuplicates]], the first
  * gate of a continuously-fed training corpus.
  *
  * Replay idempotence (the at-least-once foreachBatch contract, same
  * construction as the DLQ writer): the seen-hash state is PARTITIONED BY
  * BATCH ID, a batch's hashes overwrite only their own `_batch_id`
  * partition, and novelty for batch N is judged against partitions
  * `_batch_id < N` only. A replayed batch therefore ignores its own
  * earlier half-written hashes and re-emits exactly the same novel set —
  * without the exclusion, a replay would anti-join against itself and
  * silently emit nothing.
  *
  * Scale shape: one hash-keyed LEFT ANTI join per batch (batch side is
  * trigger-bounded; the state side scans only the hash column, pruned by
  * the partition filter) + within-batch first-wins compaction (min doc
  * id, the canonical-doc rule). At very large state, bucket the state
  * store by hash so the per-batch anti-join co-locates instead of
  * shuffling the state side — the same evolution path as
  * BucketedParquetStateStore.
  */
final class StreamingDedup(spark: SparkSession, stateDir: String,
    idCol: String, textCol: String) {

  // dynamic partition overwrite commits partitions WITHOUT a root
  // _SUCCESS marker — presence = any committed _batch_id= partition dir
  private def stateExists: Boolean = {
    val p = java.nio.file.Paths.get(stateDir)
    java.nio.file.Files.isDirectory(p) && {
      val s = java.nio.file.Files.list(p)
      try s.anyMatch(f => f.getFileName.toString.startsWith("_batch_id="))
      finally s.close()
    }
  }

  /** Filter `batch` to never-before-seen documents and record their
    * hashes under this batch's partition. Within the batch, the minimum
    * doc id per hash wins (deterministic canonical copy). Returns the
    * novel rows.
    */
  def filterNew(batch: DataFrame, batchId: Long): DataFrame = {
    // md5(NULL) is NULL, and NULL never equi-joins against seen-state:
    // a null-text row would re-emit as "novel" every single batch. A null
    // doc is not a document — drop it before hashing (the quality gates
    // upstream discard it anyway).
    val hashed = batch.filter(col(textCol).isNotNull)
      .withColumn("_h", md5(col(textCol)))
    // within-batch compaction: EXACTLY one candidate row per hash, min
    // doc id. A min-id aggregate re-joined against the batch would leak
    // duplicates when the same (id, text) row arrives twice in one batch
    // (at-least-once sources do this) — rank-1 emits one row always, and
    // the rank<=1 filter compiles to WindowGroupLimit (map-side limited).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_h").orderBy(col(idCol))
    val candidates = hashed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
    val novel =
      if (!stateExists) candidates
      else {
        val prior = spark.read.parquet(stateDir)
          .filter(col("_batch_id") < batchId) // replay: never self-exclude
          .select("_h")
        candidates.join(prior, Seq("_h"), "left_anti")
      }
    // materialize BEFORE the state write: the state append must not race
    // the novelty read of the same directory on lazy re-execution
    val out = graft.util.Materialize.barrier(novel)
    out.select(col("_h"), lit(batchId).as("_batch_id"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(stateDir)
    out.drop("_h")
  }
}
