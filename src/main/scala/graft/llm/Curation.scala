package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation pipeline — the published pretraining
  * recipe (C4/Gopher/Dolma order) as one composition of this package's
  * operators: quality filter → exact dedup (canonical doc survives) →
  * train/eval decontamination → per-source token-budget downsampling.
  * Plus the per-source health report a curation run is judged by.
  *
  * Everything stays declarative: each stage is the already-audited plan
  * shape of its operator; the only driver-side data is the per-source
  * rate table (bounded by the number of sources, not corpus size).
  */
object Curation {

  /** Per-source corpus health: doc/token totals, docs passing the
    * quality filter, and exact-duplicate (non-canonical) copies.
    * Output: (source, n_docs, n_tokens, n_kept, n_dup).
    *
    * Scale shape: the quality profile's two keyed exchanges, one
    * md5-groupBy for canonicals (the [[Dedup]] exact-dup key), and one
    * per-source partial agg — all map-side combined; the hash join back
    * to docs is on the dup key with bounded fan-out (group size = copy
    * count).
    */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, minTokens: Long, maxTokens: Long,
      minUniqPermille: Long, maxTopTokPermille: Long): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(groupCol).as("source"), md5(col(textCol)).as("_hash"))
    val canon = base.groupBy("_hash").agg(min("doc_id").as("_canonical"))
    val qf = TextAnalysis.qualityFilter(docs, idCol, textCol,
      minTokens, maxTokens, minUniqPermille, maxTopTokPermille)
      .select(col("doc_id"), col("n_tokens"), col("keep"))
    base.join(canon, Seq("_hash"))
      .withColumn("_is_dup", col("doc_id") =!= col("_canonical"))
      .join(qf, Seq("doc_id"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum(col("keep").cast("long")).as("n_kept"),
        sum(col("_is_dup").cast("long")).as("n_dup"))
  }

  /** The curated corpus: quality-kept, exact-deduplicated (smallest id
    * per text survives), decontaminated against `evalSet` at
    * `minHitPermille` 3-gram containment, then downsampled so no source
    * exceeds `tokenBudgetPerSource` tokens (rates from [[Sampling
    * .mixWeights]], applied content-hash-deterministically). All input
    * columns preserved.
    */
  def curate(docs: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, groupCol: String, minTokens: Long, maxTokens: Long,
      minUniqPermille: Long, maxTopTokPermille: Long, decontamN: Int,
      minHitPermille: Int, tokenBudgetPerSource: Long): DataFrame = {
    val keptIds = TextAnalysis.qualityFilter(docs, idCol, textCol,
      minTokens, maxTokens, minUniqPermille, maxTopTokPermille)
      .filter(col("keep")).select(col("doc_id").as(idCol))
    val kept = docs.join(keptIds, Seq(idCol))
    val canonIds = kept
      .select(col(idCol), md5(col(textCol)).as("_hash"))
      .groupBy("_hash").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = kept.join(canonIds, Seq(idCol))
    val clean = Decontam.decontaminate(deduped, evalSet, idCol, textCol,
      decontamN, minHitPermille)
    // bounded control data: one rate row per source
    val rates = Sampling.mixWeights(clean, groupCol,
      TextAnalysis.tokenCount(col(textCol)), tokenBudgetPerSource)
      .select(col(groupCol), col("rate_permille"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    Sampling.stratifiedSample(clean, idCol, groupCol, rates,
      defaultPermille = 1000)
  }
}
