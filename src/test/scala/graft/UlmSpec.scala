package graft

import org.apache.spark.sql.functions._

import graft.llm.Ulm

class UlmSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "ababab ababab ababab cdcd"),
    (2L, "ababab cdcd cdcd xyz"),
    (3L, "q")
  ).toDF("doc_id", "text")

  test("train: vocabulary covers every single char; costs are nonneg " +
    "fixed-point NLL; frequent pieces cost less than rare ones") {
    val m = Ulm.train(docs, "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // all single chars of the dict words present
    "abcdxyzq".foreach(c =>
      assert(m.contains(c.toString), s"single char $c missing from vocab"))
    assert(m.values.forall(_._3 >= 0L), "NLL costs are nonnegative")
    // 'ab' occurs far more often than 'xy' → higher count, lower cost
    assert(m("ab")._2 > m("xy")._2)
    assert(m("ab")._3 < m("xy")._3)
  }

  test("segment: pieces concatenate back to the word, all pieces are " +
    "vocab members within MaxPieceLen, cost = sum of piece costs, and " +
    "the repeated bigram word segments into multi-char pieces") {
    val vocab = Ulm.train(docs, "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val seg = Ulm.segment(docs, "text")
      .as[(String, Long, String, Long, Long)].collect()
    assert(seg.map(_._1).toSet ===
      Set("ababab", "cdcd", "xyz", "q"), "every dict word segments")
    seg.foreach { case (word, _, pieces, n, cost) =>
      val ps = pieces.split("\\|")
      assert(ps.mkString("") === word, s"pieces must respell $word")
      assert(ps.length.toLong === n)
      assert(ps.forall(p => p.nonEmpty && p.length <= Ulm.MaxPieceLen))
      assert(ps.forall(vocab.contains), s"non-vocab piece in $pieces")
      assert(cost === ps.map(vocab).sum,
        s"$word: path cost must be the sum of its piece costs")
    }
    // the dominant repeated bigram: 'ababab' must NOT fall back to
    // single chars (6 pieces) — the whole point of the unigram LM
    val abab = seg.find(_._1 == "ababab").get
    assert(abab._4 < 6, s"ababab segmented char-by-char: ${abab._3}")
  }

  test("DP optimality property: on a random-words corpus, every " +
    "segmentation's cost is minimal — never beaten by char-split or by " +
    "greedy longest-match under the same costs") {
    val rnd = new scala.util.Random(15)
    val vocabChars = "abcde"
    val words = (1 to 30).map(_ =>
      (1 to (1 + rnd.nextInt(Ulm.MaxWordLen)))
        .map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString)
    val d = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val costs = Ulm.train(d, "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val seg = Ulm.segment(d, "text")
      .as[(String, Long, String, Long, Long)].collect()
    seg.foreach { case (word, _, _, _, got) =>
      val charCost = word.map(c => costs(c.toString)).sum
      assert(got <= charCost, s"$word: DP $got beaten by chars $charCost")
      // greedy longest-match under the same cost table
      var i = 0; var greedy = 0L; var ok = true
      while (i < word.length && ok) {
        val l = (math.min(Ulm.MaxPieceLen, word.length - i) to 1 by -1)
          .find(n => costs.contains(word.substring(i, i + n)))
        l match {
          case Some(n) => greedy += costs(word.substring(i, i + n)); i += n
          case None => ok = false
        }
      }
      if (ok) assert(got <= greedy,
        s"$word: DP $got beaten by greedy $greedy")
    }
  }

  test("trainPruned: never-used multi-char pieces drop, all single " +
    "chars survive, and the refined counts re-estimate under the " +
    "pruned vocabulary") {
    val full = Ulm.train(docs, "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val pruned = Ulm.trainPruned(docs, "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val dropped = full.keySet -- pruned.keySet
    assert(dropped.nonEmpty, "the random-salad vocab must have unused pieces")
    assert(dropped.forall(p => p.length >= 2 && full(p) == 1L),
      s"only smoothing-count multi-char pieces may drop: $dropped")
    "abcdxyzq".foreach(c =>
      assert(pruned.contains(c.toString), s"single char $c must survive"))
    // the workhorse piece keeps a real (re-estimated) count
    assert(pruned("ab") > 1L)
  }

  test("determinism: two independent trainings produce identical " +
    "segmentations (the DP tie-break is total)") {
    val a = Ulm.segment(docs, "text").orderBy("word")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val b = Ulm.segment(docs, "text").orderBy("word")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("encodeCorpus: per-doc token count = Σ dict n_pieces over the " +
    "doc's dict words; non-dict words never count") {
    val np = Ulm.segment(docs, "text")
      .as[(String, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    val enc = Ulm.encodeCorpus(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc(1L) === ((4L, 3 * np("ababab") + np("cdcd"))),
      s"doc 1 = 3×ababab + cdcd: $enc vs $np")
    assert(enc(2L) === ((4L, np("ababab") + 2 * np("cdcd") + np("xyz"))))
    assert(enc(3L) === ((1L, np("q"))))
  }

  test("words over MaxWordLen are excluded from dict and segmentation") {
    val longWord = "a" * (Ulm.MaxWordLen + 1)
    val d2 = Seq((1L, s"$longWord short")).toDF("doc_id", "text")
    val words = Ulm.segment(d2, "text").select("word").as[String].collect()
    assert(words.toSet === Set("short"))
  }
}
