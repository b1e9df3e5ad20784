package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Incremental corpus curation: the batch [[Curation]] recipe applied
  * per micro-batch to a continuously-fed document stream — PII scrub →
  * quality filter → cross-batch novelty dedup ([[StreamingDedup]]'s
  * replay-idempotent seen-state). The stateless stages run entirely
  * inside the batch plan; the only state is the dedup hash store, so the
  * pipeline inherits StreamingDedup's exactly-once-effective contract
  * under foreachBatch's at-least-once replay — including at the sink:
  * [[writeBatch]] lands rows under a `_batch_id=` partition with dynamic
  * overwrite (the DLQ/state-store convention), so a replayed batch
  * overwrites its own half-written output instead of appending
  * duplicates.
  *
  * Decontamination and budget mixing are deliberately NOT per-batch
  * stages: both are corpus-global decisions (a batch-local rate would
  * drift with arrival order), so the streaming tier feeds a staging
  * table and the global stages run as periodic batch compactions — the
  * same split the reference draws between its always-on replication path
  * and its scheduled reconciliation. The LM-fluency gate is the
  * exception that CAN run per batch: its model is trained once on a
  * STATIC reference ([[TextAnalysis.lmModel]] — pass it pre-built, the
  * count tables are materialized and reused every batch), so per-batch
  * scoring is order-independent by construction.
  */
final class StreamingCuration(dedup: StreamingDedup, idCol: String,
    textCol: String, minTokens: Long, maxTokens: Long,
    minUniqPermille: Long, maxTopTokPermille: Long,
    fluencyModel: Option[TextAnalysis.LmStats] = None,
    minFluencyPermille: Long = 0L, normalizeText: Boolean = false) {

  /** One micro-batch: scrub PII in place, drop quality rejects (and,
    * when a [[fluencyModel]] is configured, docs scoring under the
    * fluency floor), emit only never-seen documents (post-scrub text is
    * what is hashed, so two docs differing only in scrubbed identifiers
    * dedup together). The batch is first compacted on (id, text): an
    * at-least-once source redelivering the same row in ONE batch would
    * otherwise double every token count inside the quality aggregation
    * and flip its verdict. Safe to call from foreachBatch; replays
    * re-emit the same rows.
    */
  def processBatch(batch: DataFrame, batchId: Long): DataFrame = {
    val once = batch.dropDuplicates(idCol :: textCol :: Nil)
    // scrub before normalize — the batch pipeline's ordering rationale
    // (normalization strips the structure the PII patterns match on)
    val scrubbed0 = PiiScrub.scrubbed(once, textCol)
    val scrubbed =
      if (normalizeText)
        scrubbed0.withColumn(textCol, TextAnalysis.normalize(col(textCol)))
      else scrubbed0
    val keptIds = TextAnalysis.qualityFilter(scrubbed, idCol, textCol,
      minTokens, maxTokens, minUniqPermille, maxTopTokPermille)
      .filter(col("keep")).select(col("doc_id").as(idCol))
    val kept0 = scrubbed.join(keptIds, Seq(idCol))
    val kept = fluencyModel match {
      case Some(m) if minFluencyPermille > 0 =>
        kept0.join(
          TextAnalysis.scoreFluency(kept0, m, idCol, textCol)
            .filter(col("score_permille") >= minFluencyPermille)
            .select(col("doc_id").as(idCol)),
          Seq(idCol))
      case _ => kept0
    }
    dedup.filterNew(kept, batchId)
  }

  /** [[processBatch]] + the idempotent sink write: curated rows land in
    * `outDir` partitioned by `_batch_id` with dynamic partition
    * overwrite, so an at-least-once replay of a batch REPLACES that
    * batch's partition (a plain append would duplicate every replayed
    * row — the very defect the pipeline removes). Readers
    * `spark.read.parquet(outDir)` and drop `_batch_id` if unwanted.
    */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String): Unit =
    processBatch(batch, batchId)
      .withColumn("_batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(outDir)

  /** Wire the pipeline into a streaming writer: curated rows under
    * `outDir`, state + progress under the caller's checkpoint
    * discipline.
    */
  def writer(stream: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outDir)
      }

  def start(stream: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    writer(stream, outDir, checkpointDir).start()
}
