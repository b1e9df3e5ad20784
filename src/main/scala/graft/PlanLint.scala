package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan,
  TakeOrderedAndProjectExec, BaseLimitExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Whole-surface STATIC plan lint — the scale-envelope rules ScaleAudit
  * samples on its hand-picked heavy list, asserted over EVERY gate plan
  * so a new query cannot regress silently (round-14 verdict #2):
  *
  *   - `cartesian`      — a CartesianProduct is never acceptable;
  *   - `bnl-join`       — a BroadcastNestedLoopJoin is acceptable only
  *                        when its broadcast side is bounded BY
  *                        CONSTRUCTION (a limit / TakeOrdered / local
  *                        relation / one-row aggregate) or the query
  *                        documents the bound in [[allow]];
  *   - `single-exchange`— a shuffle to ONE partition is acceptable only
  *                        when its input is register-sized by construction
  *                        (a partial aggregate, per-partition limit, or
  *                        group-limit upstream) — otherwise it is a
  *                        corpus-sized single-task gather;
  *   - `global-window`  — an UNPARTITIONED window is acceptable only over
  *                        a register-bounded input (an aggregate upstream
  *                        — the `maxDistinctScores`-enforced calibration
  *                        walks) or with a documented per-query bound.
  *
  * The walk runs on `queryExecution.sparkPlan` (the planned physical tree
  * BEFORE adaptive wrapping and codegen collapse), so it is cheap — no
  * execution — and deterministic. Wired into [[Verify]] (every dump also
  * lints, `plan_lint.json` lands next to the parquet) and hard-gated by
  * `PlanLintSpec`; the standalone main writes the round artifact.
  */
object PlanLint {

  final case class Hit(query: String, rule: String, node: String,
    allowed: Boolean, reason: String)

  /** Documented per-query exceptions: (query, rule) → why the flagged
    * shape is bounded at scale. Every entry must name the bound.
    */
  val allow: Map[(String, String), String] = {
    // shared justifications — one string per FAMILY so the reader audits
    // the argument once; the query list below pins where each applies
    val anchors = "broadcast side is the ABSOLUTELY-bounded query/anchor " +
      "set (vec_id < 50 at every SF; brute-force forms additionally " +
      "enforce MaxBruteForceAnchors eagerly before submitting the scan)"
    val evalSet = "broadcast side is the eval/benchmark table — MBs by " +
      "contract (decontamination broadcasts the eval side, never the corpus)"
    val registers = "broadcast side is a register-sized derived table " +
      "(grouped to a declared-bounded key set before broadcasting)"
    val seeds = "broadcast side is a fixed-size seed/codebook sample " +
      "(orderBy md5 + LIMIT — constant rows at any corpus size)"
    Map(
      // --- bnl-join: bounded anchor/query sets (the ANN family) ---
      ("ann_cosine_topk", "bnl-join") -> anchors,
      ("ann_hard_negatives", "bnl-join") -> anchors,
      ("ann_contrastive_triples", "bnl-join") -> anchors,
      ("ann_matryoshka_topk", "bnl-join") -> anchors,
      ("ann_matryoshka_recall", "bnl-join") -> anchors,
      ("ann_recall_audit", "bnl-join") -> anchors,
      ("ann_hamming_topk", "bnl-join") -> anchors,
      ("ann_sq8_topk", "bnl-join") -> anchors,
      ("ann_sq8_recall", "bnl-join") -> anchors,
      ("dedup_embedding_cosine", "bnl-join") -> anchors,
      // --- bnl-join: eval-side broadcasts (decontamination contract) ---
      ("decontam_embedding", "bnl-join") -> evalSet,
      ("decontam_embedding_clean", "bnl-join") -> evalSet,
      // --- bnl-join: register-sized derived tables ---
      ("rag_context_pack", "bnl-join") -> registers,
      ("quality_calibration", "bnl-join") -> registers,
      // --- bnl-join: Materialize.stable() hides the bound ---
      // these broadcast a stable()'d FIXED-SIZE table (centroid /
      // codebook samples: orderBy md5 + LIMIT numCentroids; or a
      // register-sized rank/distribution table) — the default local-
      // checkpoint materialization truncates lineage, so the bounding
      // TakeOrdered/limit/aggregate upstream is structurally invisible
      // to the walk and the bound is documented here instead
      ("ann_ivf_topk", "bnl-join") -> seeds,
      ("ann_ivf_recall", "bnl-join") -> seeds,
      ("ann_ivf_recall_curve", "bnl-join") -> seeds,
      ("ann_ivf_incremental", "bnl-join") -> seeds,
      ("ann_ivfpq_topk", "bnl-join") -> seeds,
      ("ann_ivfpq_residual_topk", "bnl-join") -> seeds,
      ("ann_pq_recall", "bnl-join") -> seeds,
      ("ann_hamming_recall", "bnl-join") -> seeds,
      ("ann_cell_balance", "bnl-join") -> seeds,
      ("ann_hard_negatives_ivf", "bnl-join") -> seeds,
      ("ann_contrastive_triples_ivf", "bnl-join") -> seeds,
      ("events_value_drift", "bnl-join") -> registers,
      ("privacy_t_closeness", "bnl-join") -> registers,
      ("privacy_t_closeness_stream", "bnl-join") -> registers,
      ("hybrid_rrf_topk", "bnl-join") -> registers,
      ("rerank_cross_topk", "bnl-join") -> registers
    )
  }

  /** True when `p`'s subtree contains a node that bounds its output to a
    * register-sized row count regardless of input size: any aggregate
    * (partial or final — grouped aggs feed lint-approved walks only via
    * the declared-bounded-key contract), a per-partition or global
    * limit, a TakeOrdered, a group-limit, or a literal local relation.
    */
  private def boundedSubtree(p: SparkPlan): Boolean =
    p.collectFirst {
      case _: BaseAggregateExec => true
      case _: BaseLimitExec => true
      case _: TakeOrderedAndProjectExec => true
      case _: WindowGroupLimitExec => true
      case _: LocalTableScanExec => true
    }.isDefined

  /** Like [[boundedSubtree]] but stops at the first downstream exchange:
    * the bound must hold for the rows ENTERING this exchange, and a
    * bounding node on the far side of another shuffle says nothing about
    * this one's input volume.
    */
  private def boundedAboveExchange(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec | _: BaseLimitExec |
         _: TakeOrderedAndProjectExec | _: WindowGroupLimitExec |
         _: LocalTableScanExec => true
    case _: Exchange => false
    case other => other.children.exists(boundedAboveExchange)
  }

  def lintPlan(query: String, plan: SparkPlan): Seq[Hit] = {
    def mk(rule: String, node: SparkPlan, autoOk: Boolean): Hit =
      allow.get((query, rule)) match {
        case Some(reason) => Hit(query, rule, node.nodeName, allowed = true, reason)
        case None if autoOk =>
          Hit(query, rule, node.nodeName, allowed = true,
            "bounded by construction (limit/aggregate/local upstream)")
        case None => Hit(query, rule, node.nodeName, allowed = false, "")
      }
    plan.collect {
      case c: CartesianProductExec =>
        mk("cartesian", c, autoOk = false)
      case j: BroadcastNestedLoopJoinExec =>
        // the broadcast side is the build side; bounded-by-construction
        // broadcast (seed samples, one-row stats) auto-allows
        val bcast = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        mk("bnl-join", j, autoOk = boundedSubtree(bcast))
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        mk("single-exchange", e, autoOk = boundedAboveExchange(e.child))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        mk("global-window", w, autoOk = boundedSubtree(w.child))
    }
  }

  /** Lint every (or the named) gate plans; returns hits. Builds each
    * frame exactly as Verify does but never executes it.
    */
  def run(spark: SparkSession, sfDir: String,
      only: Set[String] = Set.empty): Seq[Hit] = {
    val hits = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .flatMap { case (name, fn) =>
        try lintPlan(name, fn(spark, sfDir).queryExecution.sparkPlan)
        finally { graft.util.Materialize.releaseTracked(spark); () }
      }
    hits
  }

  def toJson(sfDir: String, nQueries: Int, hits: Seq[Hit]): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val hs = hits.map(h =>
      s"""{"query":${q(h.query)},"rule":${q(h.rule)},"node":${q(h.node)},""" +
        s""""allowed":${h.allowed},"reason":${q(h.reason)}}""").mkString("[", ",", "]")
    s"""{"sf":${q(sfDir)},"n_queries":$nQueries,""" +
      s""""n_hits":${hits.size},"n_unexplained":${hits.count(!_.allowed)},""" +
      s""""hits":$hs}"""
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outFile) = args.toList match {
      case s :: o :: Nil => (s, o)
      case _ => sys.error("usage: PlanLint <sfDir> <outJson>")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hits = run(spark, sfDir)
    val bad = hits.filterNot(_.allowed)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      toJson(sfDir, SparkEntry.queries.size, hits))
    println(toJson(sfDir, SparkEntry.queries.size, hits))
    spark.stop()
    if (bad.nonEmpty) {
      bad.foreach(h => System.err.println(s"UNEXPLAINED ${h.rule} in ${h.query} (${h.node})"))
      sys.exit(1)
    }
  }
}
