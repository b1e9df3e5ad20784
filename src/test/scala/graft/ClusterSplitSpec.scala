package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Sampling}

class ClusterSplitSpec extends SparkSpecBase {
  import spark.implicits._

  test("every cluster lands wholly in one split") {
    val labels = (0L until 400L).map(i => (i, i % 37)).toDF("doc_id", "cluster_id")
    val out = Sampling.clusterSplit(labels, "doc_id", "cluster_id", 800, 100)
    val perCluster = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter($"n" > 1)
    assert(perCluster.count() === 0)
    // all three splits materialize over 37 clusters with these thresholds
    assert(out.select("split").distinct().count() === 3)
  }

  test("split is deterministic and invariant to partitioning") {
    val labels = (0L until 200L).map(i => (i, i / 3)).toDF("doc_id", "cluster_id")
    val a = Sampling.clusterSplit(labels.repartition(1), "doc_id", "cluster_id", 700, 200)
      .orderBy("doc_id").collect().toSeq
    val b = Sampling.clusterSplit(labels.repartition(8), "doc_id", "cluster_id", 700, 200)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("near-dup pair never straddles the held-out boundary end to end") {
    // two exact near-dup families in a small corpus: the LSH graph links
    // them; both members of each family must share a split
    val docs = Seq(
      (0L, "spark scan filter join agg window sort"),
      (1L, "spark scan filter join agg window sort"), // dup of 0
      (2L, "batch stream key value row column part"),
      (3L, "batch stream key value row column part"), // dup of 2
      (4L, "totally different text with other words here")
    ).toDF("doc_id", "text")
    val labels = docs.select("doc_id")
      .join(Dedup.connectedComponents(
        Dedup.lshCandidatePairs(docs, "doc_id", "text"), "doc_a", "doc_b"),
        Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("cluster_id"))
    val out = Sampling.clusterSplit(labels, "doc_id", "cluster_id", 800, 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out(0L) === out(1L))
    assert(out(2L) === out(3L))
  }

  test("threshold validation rejects a non-partition") {
    val labels = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    intercept[IllegalArgumentException] {
      Sampling.clusterSplit(labels, "doc_id", "cluster_id", 900, 200)
    }
  }
}
