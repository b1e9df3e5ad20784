package graft.recon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the constraint checking a warehouse
  * cannot delegate to the engine at 100 TB (no distributed FK
  * enforcement exists; the audit IS the constraint): for each declared
  * child→parent relation, the child rows whose key has no parent.
  * Orphans appear whenever CDC replication applies deletes/retention to
  * a parent table while children lag (the reference's reconciliation
  * concern, lifted from row checksums to cross-TABLE shape).
  *
  * Scale shape per relation: ONE pass over the child — a LEFT equi-join
  * against the parent's distinct key set (dimension-sized parents
  * broadcast; fact-sized parents shuffle on the key) folded straight
  * into a partial-agg count, never a materialized orphan list. A NULL
  * child key never matches (SQL join semantics on both engines) and is
  * counted as an orphan — the audit's job is to surface it, not excuse
  * it.
  */
object Integrity {

  /** One summary row per relation: (relation, n_child, n_orphans,
    * orphan_permille). `relations` = (name, child, childKeys, parent,
    * parentKeys) with positionally-matched key lists.
    */
  def orphanAudit(relations: Seq[(String, DataFrame, Seq[String],
      DataFrame, Seq[String])]): DataFrame = {
    require(relations.nonEmpty, "need at least one relation to audit")
    relations.map { case (name, child, ck, parent, pk) =>
      require(ck.nonEmpty && ck.size == pk.size,
        s"$name: child/parent key lists must align, got $ck vs $pk")
      val p = parent
        .select(pk.zip(ck).map { case (pc, cc) => col(pc).as(cc) }: _*)
        .distinct()
        .withColumn("_hit", lit(1))
      child.select(ck.map(col): _*)
        .join(p, ck, "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("_hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          expr("(1000 * n_orphans) div n_child").as("orphan_permille"))
    }.reduce(_.unionByName(_))
  }
}
