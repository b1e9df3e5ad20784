package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins
  * (context windows) by a greedy sequential first-fit — the standard
  * "pack short documents together so a training batch wastes no pad
  * tokens" step. Within each group (source, shard, …) docs are taken in
  * id order; a doc goes into the current bin while it fits, otherwise it
  * opens the next bin. A doc longer than the budget gets a bin of its own
  * (truncation/splitting is [[TextAnalysis.chunkTokens]]'s job upstream).
  *
  * Why this shape at 100 TB: packing is inherently sequential *within* a
  * group (bin state is a running fold), but embarrassingly parallel
  * *across* groups. So the operator shuffles once on the group key,
  * sorts within partitions (Spark's sort-merge machinery, spill-safe —
  * no group is ever collected in memory), and folds each partition in a
  * single forward pass. Group granularity is the parallelism knob:
  * callers with one giant group pre-shard it by a deterministic hash of
  * the id (a composite group key), which keeps every task bounded.
  *
  * Determinism: the fold depends only on (group, id) order, so the
  * output is invariant to input partitioning — same property the
  * sampler family guarantees, and what makes the operator gateable
  * against a sequential SQL oracle.
  */
object Packing {

  /** Pack `docs` into per-group bins of at most `tokenBudget` tokens.
    * Output: (grp, doc_id, n_tokens, bin_idx) — `bin_idx` counts from 0
    * within each group.
    *
    * `idCol` must be long-castable and unique within a group; `weight`
    * is the doc's token count (int-castable).
    */
  def packGreedy(docs: DataFrame, idCol: String, groupCol: String,
      weight: Column, tokenBudget: Long): DataFrame =
    packInOrder(docs, idCol, groupCol, weight, tokenBudget, decreasing = false)

  /** [[packGreedy]] over a LENGTH-DESCENDING order within each group
    * (next-fit-decreasing): long sequences claim bins first and short
    * ones fill the tails, the classic utilization improver over
    * arrival-order packing — still one group-keyed shuffle + one
    * partition-local fold, only the sort key changes. Deterministic:
    * ties in length break by doc id.
    */
  def packGreedyDecreasing(docs: DataFrame, idCol: String, groupCol: String,
      weight: Column, tokenBudget: Long): DataFrame =
    packInOrder(docs, idCol, groupCol, weight, tokenBudget, decreasing = true)

  private def packInOrder(docs: DataFrame, idCol: String, groupCol: String,
      weight: Column, tokenBudget: Long, decreasing: Boolean): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val spark = docs.sparkSession
    import spark.implicits._
    val order =
      if (decreasing) Seq(col("grp"), col("n_tokens").desc, col("doc_id"))
      else Seq(col("grp"), col("doc_id"))
    docs
      .select(
        col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("doc_id"),
        weight.cast("int").as("n_tokens"))
      .repartition(col("grp"))
      .sortWithinPartitions(order: _*)
      .as[(String, Long, Int)]
      .mapPartitions { it =>
        // groups are contiguous after the partition-local sort; the fold
        // carries (bin, fill) and resets at each group boundary. The
        // explicit first-row flag matters: a NULL group key would satisfy
        // `g == cur` against the initial sentinel and skip the reset.
        var started = false
        var cur: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (g, id, n) =>
          if (!started || g != cur) { started = true; cur = g; bin = 0L; fill = n.toLong }
          else if (fill + n <= tokenBudget) { fill += n }
          else { bin += 1L; fill = n.toLong }
          (g, id, n, bin)
        }
      }
      .toDF("grp", "doc_id", "n_tokens", "bin_idx")
  }

  /** Bin-level summary of a packed frame: per (group, bin) the doc count,
    * token fill, and pad waste against the budget — the utilization
    * numbers a packing run is judged by. One partial-agg shuffle on the
    * (group, bin) key.
    */
  def binStats(packed: DataFrame, tokenBudget: Long): DataFrame =
    packed.groupBy("grp", "bin_idx")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill_tokens"))
      .withColumn("pad_tokens",
        greatest(lit(0L), lit(tokenBudget) - col("fill_tokens")))

  /** The power-of-two bucket rule as generated SQL — a pure-integer
    * CASE ladder (floating log2 is NOT exact at the bucket edges: Java's
    * log(8)/log(2) need not be 3.0, and the engines may round
    * differently), rendered from the same loop for Spark and DuckDB.
    * Buckets cap at 2^[[MaxBucketLog2]] (everything longer lands in the
    * top bucket).
    */
  val MaxBucketLog2 = 20
  def bucketSql(n: String): String = {
    val cases = (0 to MaxBucketLog2).map(e =>
      s"WHEN $n <= ${1L << e} THEN CAST(${1L << e} AS BIGINT)").mkString(" ")
    s"CASE $cases ELSE CAST(${1L << MaxBucketLog2} AS BIGINT) END"
  }

  /** Token-length histogram in power-of-two buckets — the sizing input
    * for choosing a packing budget (what fraction of docs and of token
    * MASS lands beyond a candidate context length). `bucket` = the
    * smallest power of two ≥ the doc's token count (1 for empty/1-token
    * docs). One map-side-combined aggregation; no shuffle beyond it.
    * Output: (bucket, n_docs, n_tokens).
    */
  def lengthHistogram(docs: DataFrame, idCol: String,
      weight: Column): DataFrame =
    docs.select(col(idCol), weight.cast("long").as("_n"))
      .withColumn("bucket", expr(bucketSql("_n")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("_n").as("n_tokens"))
}
