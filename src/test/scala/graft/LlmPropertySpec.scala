package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Packing, Retrieval, Shuffling}

/** Seeded-random property tests: the distributed operators must agree
  * with independent plain-Scala reference implementations on arbitrary
  * inputs (the CC-property style) — catching divergence the
  * hand-written fixtures can't.
  */
class LlmPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab = Array("a", "b", "c", "d", "e")

  test("packGreedy property: random corpora match the sequential fold") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val budget = 5L + rnd.nextInt(20)
      val rows = (1L to (20 + rnd.nextInt(60))).map { i =>
        (s"g${rnd.nextInt(4)}", i, 1 + rnd.nextInt(budget.toInt * 2))
      }
      val got = Packing.packGreedy(
        rows.toDF("src", "id", "n").repartition(1 + rnd.nextInt(6)),
        "id", "src", col("n"), budget)
        .select("grp", "doc_id", "bin_idx")
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, docs) =>
        var bin = 0L; var fill = 0L; var first = true
        docs.sortBy(_._2).map { case (_, id, n) =>
          if (first) { first = false; fill = n }
          else if (fill + n <= budget) fill += n
          else { bin += 1; fill = n }
          (g, id, bin)
        }
      }.sortBy(r => (r._1, r._2))
      assert(got.toSeq === want, s"seed=$seed budget=$budget")
    }
  }

  test("windowDupProfile property: random corpora match brute force") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(3)
      val docs = (1L to (8 + rnd.nextInt(10))).map { i =>
        (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val got = Dedup.windowDupProfile(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
        .as[(Long, Long, Long, Option[Int], Option[Int], Long)]
        .collect().sortBy(_._1)

      // brute force
      val wins = docs.map { case (id, t) =>
        val toks = t.split(" ").toSeq
        id -> (if (toks.size >= n)
          toks.sliding(n).zipWithIndex
            .map { case (w, i) => (i + 1, w.mkString(" ")) }.toSeq
        else Seq.empty)
      }.toMap
      val crossDoc = wins.toSeq
        .flatMap { case (id, ws) => ws.map(_._2).distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).toSet.size >= 2).keySet
      val want = wins.toSeq.filter(_._2.nonEmpty).map { case (id, ws) =>
        val dup = ws.filter(w => crossDoc(w._2))
        (id, ws.size.toLong, dup.size.toLong,
          dup.map(_._1).minOption, dup.map(_._1).maxOption,
          dup.size.toLong * 1000 / ws.size)
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed=$seed n=$n")
    }
  }

  test("trimDupSpans property: random corpora match the brute-force cut") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(3)
      val docs = (1L to (8 + rnd.nextInt(10))).map { i =>
        (i, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val got = Dedup.trimDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
        .as[(Long, String)].collect().sortBy(_._1)

      val wins = docs.map { case (id, t) =>
        val toks = t.split(" ").toSeq
        (id, toks, if (toks.size >= n)
          toks.sliding(n).zipWithIndex.map { case (w, i) => (i + 1, w.mkString(" ")) }.toSeq
        else Seq.empty)
      }
      val crossDoc = wins.flatMap { case (id, _, ws) => ws.map(_._2).distinct.map(_ -> id) }
        .groupBy(_._1).filter(_._2.map(_._2).toSet.size >= 2).keySet
      val want = wins.flatMap { case (id, toks, ws) =>
        val dupStarts = ws.filter(w => crossDoc(w._2)).map(_._1)
        if (dupStarts.isEmpty) Some(id -> toks.mkString(" "))
        else {
          val (first, last) = (dupStarts.min, dupStarts.max)
          val trimmed = (toks.take(first - 1) ++ toks.drop(last + n - 1)).mkString(" ")
          if (trimmed.nonEmpty) Some(id -> trimmed) else None
        }
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed=$seed n=$n")
    }
  }

  test("tfidfTopK property: random corpora match brute-force integer scoring") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val mk = () => Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val corpus = (1L to (5 + rnd.nextInt(10))).map(i => (i, mk()))
      val queries = (100L to (100L + rnd.nextInt(3))).map(i => (i, mk()))
      val k = 1 + rnd.nextInt(4)
      val got = Retrieval.tfidfTopK(corpus.toDF("doc_id", "text"),
        queries.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))

      val tf = corpus.map { case (id, t) =>
        id -> t.split(" ").groupBy(identity).view.mapValues(_.length.toLong).toMap
      }.toMap
      val dfm = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nCorp = tf.size.toLong
      val want = queries.flatMap { case (qid, qt) =>
        val scores = tf.toSeq.map { case (did, m) =>
          val s = qt.split(" ").distinct.collect {
            case t if m.contains(t) => m(t) * (nCorp * 1000L / dfm(t))
          }.sum
          (did, s)
        }.filter(_._2 > 0).sortBy { case (did, s) => (-s, did) }.take(k)
        scores.zipWithIndex.map { case ((did, s), i) => (qid, did, s, i + 1) }
      }.sortBy(r => (r._1, r._4))
      assert(got.toSeq === want, s"seed=$seed k=$k")
    }
  }

  test("deterministicShuffle property: dense permutation at any size/partitioning") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val ids = (1L to (10 + rnd.nextInt(200))).map(_ * (1 + rnd.nextInt(7)))
        .distinct
      val shards = 1 + rnd.nextInt(9)
      val out = Shuffling.deterministicShuffle(
        ids.toDF("doc_id").repartition(1 + rnd.nextInt(5)),
        "doc_id", shards, partitions = 1 + rnd.nextInt(8))
        .as[(Long, Long, Long)].collect()
      assert(out.map(_._2).sorted.toSeq === (0L until ids.length),
        s"seed=$seed not a dense permutation")
      val want = ids.map(i => (i, BigInt(
        java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16).toLong))
        .sortBy(t => (t._2, t._1)).map(_._1).zipWithIndex
        .map { case (id, pos) => (id, pos.toLong, pos.toLong % shards) }
        .sortBy(_._1)
      assert(out.sortBy(_._1).toSeq === want, s"seed=$seed order diverged")
    }
  }

  test("importanceWeights property: target == corpus makes every per-feature weight exactly 10^6") {
    import graft.llm.Sampling
    // when q_b == p_b for every bucket, (q+1)*1e6 div (p+1) == 1e6
    // exactly — any deviation means the two feature passes diverged
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to (10 + rnd.nextInt(20))).map { i =>
        (i, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val w = Sampling.importanceWeights(docs, docs, "doc_id", "text",
        numBuckets = 32).select("weight_per_feat").as[Long].collect()
      assert(w.nonEmpty && w.forall(_ === 1000000L), s"seed=$seed: ${w.toSeq.distinct}")
    }
  }

  test("normalize property: idempotent and always within [a-z0-9 ]") {
    import graft.llm.TextAnalysis
    val rnd = new scala.util.Random(7)
    val chars = "aB9 !@#$%^&*()_+-=[]{};':\",./<>?\\|`~é世"
    val docs = (1L to 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(40))(chars(rnd.nextInt(chars.length))).mkString)
    }.toDF("doc_id", "text")
    val once = TextAnalysis.normalized(docs, "doc_id", "text")
      .select(col("doc_id"), col("norm_text").as("text"))
    val onceRows = once.as[(Long, String)].collect().sortBy(_._1)
    val twice = TextAnalysis.normalized(once, "doc_id", "text")
      .select("doc_id", "norm_text").as[(Long, String)].collect().sortBy(_._1)
    assert(onceRows.map(_._2).toSeq === twice.map(_._2).toSeq, "not idempotent")
    assert(onceRows.forall(_._2.forall(c => c.isDigit || (c >= 'a' && c <= 'z') || c == ' ')))
    assert(onceRows.forall(r => !r._2.startsWith(" ") && !r._2.endsWith(" ")
      && !r._2.contains("  ")))
  }

  test("semanticDedup property: brute-force parity on random separated corpora") {
    import graft.llm.Similarity
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nClusters = 2 + rnd.nextInt(3)
      // orthogonal-axis clusters with small jitter: cross-cluster cosine
      // stays ~0, so within-cell pruning at 0.9 IS the exact global rule
      val rows = (0 until 20 + rnd.nextInt(20)).map { i =>
        val c = rnd.nextInt(nClusters)
        val base = Array.fill(Similarity.Dim)(0.001f)
        base(c * 8) = 1f
        base(c * 8 + 1 + rnd.nextInt(4)) = 0.01f * rnd.nextInt(3)
        (i.toLong, base)
      }
      val emb = rows.toDF("vec_id", "embedding").repartition(1 + rnd.nextInt(5))
      val got = Similarity.semanticDedup(emb, numCentroids = nClusters,
        iters = 2, threshold = 0.9)
        .filter(col("is_dup")).select("vec_id").as[Long].collect().toSet
      val v = emb.select(col("vec_id").as("vid"),
          Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("nv", Similarity.dotQ("qv", "qv"))
      val want = v.as("a").join(v.as("b"), col("a.vid") < col("b.vid"))
        .withColumn("c", Similarity.cosineFromInts(
          Similarity.dotQ("a.qv", "b.qv"), col("a.nv"), col("b.nv")))
        .filter(col("c") >= 0.9)
        .select(col("b.vid")).as[Long].collect().toSet
      assert(got === want, s"seed=$seed k=$nClusters")
    }
  }

  test("pqEncode property: codes are partitioning-invariant") {
    import graft.llm.Similarity
    val rnd = new scala.util.Random(11)
    val rows = (0 until 30).map { i =>
      (i.toLong, Array.fill(Similarity.Dim)(rnd.nextFloat() - 0.5f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(emb, m = 8, kCent = 8)
    def codes(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, cb, m = 8)
        .as[(Long, Int, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(codes(emb) === codes(emb.repartition(7)))
  }

  test("rrfFuse property: fusing a ranking with itself preserves its order") {
    import graft.llm.Retrieval
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val ranking = (1 to 3).flatMap { q =>
        rnd.shuffle((1L to 10L).toList).zipWithIndex.map { case (d, i) =>
          (q.toLong, d, i + 1)
        }
      }.toDF("query_id", "doc_id", "rnk")
      val fused = Retrieval.rrfFuse(Seq(ranking, ranking), k = 10)
        .select("query_id", "doc_id", "rnk").as[(Long, Long, Int)].collect()
      val want = ranking.as[(Long, Long, Int)].collect()
      assert(fused.sortBy(t => (t._1, t._3)).toSeq ===
        want.sortBy(t => (t._1, t._3)).toSeq, s"seed=$seed")
    }
  }
}
