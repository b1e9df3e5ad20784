package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Incremental corpus curation: the batch [[Curation]] recipe applied
  * per micro-batch to a continuously-fed document stream — PII scrub →
  * quality filter → cross-batch novelty dedup ([[StreamingDedup]]'s
  * replay-idempotent seen-state). The stateless stages run entirely
  * inside the batch plan; the only state is the dedup hash store, so the
  * pipeline inherits StreamingDedup's exactly-once-effective contract
  * under foreachBatch's at-least-once replay.
  *
  * Decontamination and budget mixing are deliberately NOT per-batch
  * stages: both are corpus-global decisions (a batch-local rate would
  * drift with arrival order), so the streaming tier feeds a staging
  * table and the global stages run as periodic batch compactions — the
  * same split the reference draws between its always-on replication path
  * and its scheduled reconciliation.
  */
final class StreamingCuration(dedup: StreamingDedup, idCol: String,
    textCol: String, minTokens: Long, maxTokens: Long,
    minUniqPermille: Long, maxTopTokPermille: Long) {

  /** One micro-batch: scrub PII in place, drop quality rejects, emit
    * only never-seen documents (post-scrub text is what is hashed, so
    * two docs differing only in scrubbed identifiers dedup together).
    * Safe to call from foreachBatch; replays re-emit the same rows.
    */
  def processBatch(batch: DataFrame, batchId: Long): DataFrame = {
    val scrubbed = PiiScrub.scrubbed(batch, textCol)
    val keptIds = TextAnalysis.qualityFilter(scrubbed, idCol, textCol,
      minTokens, maxTokens, minUniqPermille, maxTopTokPermille)
      .filter(col("keep")).select(col("doc_id").as(idCol))
    dedup.filterNew(scrubbed.join(keptIds, Seq(idCol)), batchId)
  }

  /** Wire the pipeline into a streaming writer: curated rows append to
    * `outDir` as parquet, state + progress under the caller's checkpoint
    * discipline.
    */
  def writer(stream: DataFrame, outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
          .write.mode("append").parquet(outDir)
        ()
      }

  def start(stream: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    writer(stream, outDir, checkpointDir).start()
}
