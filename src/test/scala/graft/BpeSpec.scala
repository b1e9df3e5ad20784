package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("greedy merge application is left-to-right non-overlapping") {
    // "aaaa" with merge (a,a) must become (aa)(aa), not (aa)(a)(a) or a
    // re-scan artifact — the paren encoding guarantees adjacent matches
    // never share a delimiter
    val (merges, forms) = Bpe.learnMerges(corpus("aaaa aaaa b"), "text", 1)
    val m = merges.collect().head
    assert((m.getAs[String]("lhs"), m.getAs[String]("rhs")) === ("a", "a"))
    assert(m.getAs[Long]("cnt") === 6) // 3 occurrences/word x 2 words
    val f = forms.filter($"word" === "aaaa").select("form").as[String].head()
    assert(f === "(aa)(aa)")
  }

  test("merge learning order and tie-break on a hand corpus") {
    // freq: "toto" x3, "tix" x2 -> pairs: (t,o)x6 (o,t)x3 (t,i)x2 (i,x)x2
    // round 1 merges (t,o); round 2: (to,to)x3 wins over (t,i)x2
    val (merges, forms) =
      Bpe.learnMerges(corpus("toto toto tix", "toto tix"), "text", 2)
    val ms = merges.orderBy("round").collect()
    assert(ms.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
      .toSeq === Seq(("t", "o"), ("to", "to")))
    assert(ms.map(_.getAs[Long]("cnt")).toSeq === Seq(6L, 3L))
    val f = forms.filter($"word" === "toto").select("form").as[String].head()
    assert(f === "(toto)")
  }

  test("rounds past pair exhaustion are no-ops, forms survive") {
    // vocab of single chars: zero pairs from round 1; k=3 must not wipe
    // the forms table (left join, not cross join, against the empty top-1)
    val (merges, forms) = Bpe.learnMerges(corpus("a b a c"), "text", 3)
    assert(merges.count() === 0)
    assert(forms.orderBy("word").select("form").as[String].collect()
      .toSeq === Seq("(a)", "(b)", "(c)"))
  }

  test("non-alpha tokens are excluded from the dict") {
    val wf = Bpe.wordFreqs(corpus("ab 123 ab-x AB ab"), "text")
    // lower() admits "ab" (x2 + lowercased "AB") only
    assert(wf.collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq === Seq(("ab", 3L)))
  }

  test("segmented token counts match the form") {
    val (_, forms) = Bpe.learnMerges(corpus("abc abc ab"), "text", 1)
    val seg = Bpe.segmented(forms)
    val byWord = seg.collect().map(r =>
      r.getAs[String]("word") -> r.getAs[Long]("n_tokens")).toMap
    // merge (a,b): "abc" -> (ab)(c) = 2 tokens, "ab" -> (ab) = 1
    assert(byWord === Map("abc" -> 2L, "ab" -> 1L))
  }

  test("encodeCorpus counts BPE tokens per doc under the learned merges") {
    // corpus: "abab abab ab" ×2 docs; k=2 learns (a,b) then (ab,ab):
    // "abab" → 1 token, "ab" → 1 token
    val docs = corpus("abab abab ab", "abab ab")
    val enc = Bpe.encodeCorpus(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc === Seq((0L, 3L, 3L), (1L, 2L, 2L)))
    // with k=1 (only (a,b) learned): "abab" → (ab)(ab) = 2 tokens
    val enc1 = Bpe.encodeCorpus(docs, "doc_id", "text", 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(enc1 === Seq((0L, 5L), (1L, 3L)))
  }

  test("corpus token count is monotonically non-increasing in merge rounds") {
    // every merge can only contract occurrences — the invariant a
    // tokenizer-training run sanity-checks per round
    val docs = Tables.documents(spark, sfDir)
    val totals = Seq(1, 3, 6).map { k =>
      Bpe.encodeCorpus(docs, "doc_id", "text", k)
        .agg(sum("n_bpe_tokens")).head().getLong(0)
    }
    assert(totals.sliding(2).forall { case Seq(a, b) => b <= a },
      s"token totals must not grow with k: $totals")
  }

  test("mergeCurve: one training run yields the whole non-increasing curve") {
    val docs = Tables.documents(spark, sfDir)
    val curve = Bpe.mergeCurve(docs, "text", 4)
      .orderBy("round").collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    assert(curve.map(_._1).toSeq === (0 to 4))
    val totals = curve.map(_._2).toSeq
    assert(totals.sliding(2).forall { case Seq(a, b) => b <= a },
      s"curve must be non-increasing: $totals")
    // round 0 = character count of the training vocab occurrences;
    // round k agrees with the separately-encoded corpus total over
    // dictionary words
    val enc = Bpe.encodeCorpus(docs, "doc_id", "text", 4)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(totals.last === enc, "curve tail must equal the encode total")
  }

  test("merge result is invariant to input partitioning") {
    val docs = corpus("spark scan scan batch", "spark spark batch scan")
    val a = Bpe.learnMerges(docs.repartition(1), "text", 4)._1
      .orderBy("round").collect().toSeq
    val b = Bpe.learnMerges(docs.repartition(7), "text", 4)._1
      .orderBy("round").collect().toSeq
    assert(a === b)
  }
}
