package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk audits over structured training data:
  * k-anonymity equivalence classes, l-diversity, and the generalization
  * ladder that shows how coarsening the quasi-identifiers trades
  * utility for risk (Sweeney 2002, "k-anonymity: a model for protecting
  * privacy"; Machanavajjhala et al. 2006, "l-diversity"). This is the
  * STRUCTURED-column counterpart of [[PiiScrub]]'s free-text tier: a
  * training corpus that joins user tables (the reference replicates
  * exactly such tables, cf. reference `config/tables.yaml`) must know,
  * before release, how many rows a quasi-identifier combination pins to
  * fewer than k candidates.
  *
  * Scale shape: one partial-aggregated `groupBy` on the quasi-identifier
  * tuple per audit level (count + count-distinct, both map-side
  * combinable — Spark plans the distinct as a two-phase expand, still
  * fully distributed); the risk summary is a single 1-row global
  * aggregate over the class table. Nothing joins, nothing collects: a
  * 100 TB user table costs one shuffle per ladder level, and the class
  * table it shuffles is bounded by the number of DISTINCT
  * quasi-identifier tuples, not the row count.
  */
object Privacy {

  /** Equivalence classes under the given quasi-identifier columns:
    * one row per distinct QI tuple with `class_size` (rows sharing the
    * tuple) and `l_distinct` (distinct sensitive values within it — the
    * l-diversity statistic; a class with l = 1 is vulnerable to the
    * homogeneity attack even when k is satisfied).
    */
  def equivalenceClasses(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column): DataFrame =
    df.groupBy(quasi.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))

  /** Per-class audit rows: [[equivalenceClasses]] plus the integer
    * `at_risk` flag (1 when the class pins its members to fewer than
    * `k` candidates). The release gate a curation pipeline applies is
    * "suppress or generalize every at_risk = 1 class".
    */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, k: Long): DataFrame = {
    require(k >= 2, s"k-anonymity below 2 is vacuous, got $k")
    equivalenceClasses(df, quasi, sensitive)
      .withColumn("at_risk",
        when(col("class_size") < k, lit(1L)).otherwise(lit(0L)))
  }

  /** One-row risk summary of a class table: total rows, class count,
    * smallest class (the k the data actually achieves), rows/classes
    * below the target k, and classes below the l-diversity floor.
    */
  def riskSummary(classes: DataFrame, k: Long, lMin: Long): DataFrame = {
    require(k >= 2, s"k-anonymity below 2 is vacuous, got $k")
    require(lMin >= 1, s"l-diversity floor must be >= 1, got $lMin")
    classes.agg(
      sum("class_size").as("total_rows"),
      count(lit(1)).as("n_classes"),
      min("class_size").as("min_class_size"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
        .as("at_risk_rows"),
      sum(when(col("class_size") < k, lit(1L)).otherwise(lit(0L)))
        .as("at_risk_classes"),
      sum(when(col("l_distinct") < lMin, lit(1L)).otherwise(lit(0L)))
        .as("low_l_classes"))
  }

  /** The generalization ladder: one [[riskSummary]] row per
    * (level-name, quasi-identifier set), unioned with the level as the
    * leading column. Coarsening the QI set can only merge equivalence
    * classes, so `at_risk_rows` is monotonically non-increasing down a
    * ladder where each level's classes are unions of the previous
    * level's (spec-pinned) — the curve an auditor reads to pick the
    * cheapest generalization that reaches the k target.
    */
  def generalizationLadder(df: DataFrame,
      levels: Seq[(String, Seq[(String, Column)])], sensitive: Column,
      k: Long, lMin: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one ladder level")
    levels.map { case (name, quasi) =>
      riskSummary(equivalenceClasses(df, quasi, sensitive), k, lMin)
        .select(lit(name).as("level"), col("*"))
    }.reduce(_ unionByName _)
  }
}
