package graft

import graft.ops.Bpe

/** BPE trainer guarantees beyond the DuckDB oracle: equivalence with an
  * independent plain-Scala reference implementation on controlled
  * corpora (incl. the overlap rule the doubled-separator trick must get
  * right), and the apply-side round trip.
  */
class BpeSpec extends SparkSuite {

  /** Reference BPE (Sennrich et al.'s algorithm, direct transcription):
    * word-frequency dict, argmax pair by (count, pair) with the same
    * tie-break, greedy left-to-right merge over symbol lists.
    */
  private def referenceBpe(words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var dict: Map[Vector[String], Long] = words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "_") -> c
    }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- dict; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) return out.result()
      val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      out += ((l, r, c))
      dict = dict.map { case (syms, n) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            merged += l + r; i += 2 // greedy left-to-right: consume both
          } else { merged += syms(i); i += 1 }
        }
        merged.result() -> n
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.result()
  }

  private def corpusDf(text: String) = {
    val sess = spark
    import sess.implicits._
    Seq(text).toDF("text")
  }

  private def trained(text: String, rounds: Int): Seq[(String, String, Long)] =
    Bpe.train(spark, corpusDf(text), "text", rounds = rounds)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq

  private def wordCounts(text: String): Map[String, Long] =
    "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      .filter(w => w.length >= 2 && w.length <= 20)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("matches the reference implementation on the classic corpus") {
    // Sennrich's running example shape: shared suffixes drive merges
    val text = "low low low low low lower lower newest newest newest " +
      "newest newest newest widest widest widest"
    for (rounds <- Seq(1, 4, 8)) {
      assert(trained(text, rounds) === referenceBpe(wordCounts(text), rounds),
        s"divergence at rounds=$rounds")
    }
  }

  test("overlap rule: 'aaaa' merges twice, 'aaa' once (greedy left-to-right)") {
    // After merging (a,a): "a a a a _" -> "aa aa _", "a a a _" -> "aa a _".
    // A naive single-space replace under-merges runs; the count of the
    // SECOND round exposes it: pairs of round 2 depend on round 1's
    // exact application.
    val text = "aaaa aaaa aaaa aaa aaa zz"
    for (rounds <- Seq(1, 2, 3, 4))
      assert(trained(text, rounds) === referenceBpe(wordCounts(text), rounds),
        s"divergence at rounds=$rounds")
  }

  test("merged symbols participate in later rounds and counts are corpus-weighted") {
    val text = ("the cat " * 10) + ("then " * 3)
    val got = trained(text, 6)
    assert(got === referenceBpe(wordCounts(text), 6))
    // (h,e) wins round 1 on the tie-break (13 each for t-h and h-e;
    // 'h' < 't'), and 'the' descends from the merged 'he' symbol —
    // proving merged symbols re-enter later rounds
    val merges = got.map { case (l, r, _) => l + r }
    assert(merges.contains("he"))
    assert(got.exists { case (l, r, _) => l == "t" && r == "he" })
  }

  test("tokenizeWords round trip: applying the learned merges reproduces words") {
    val text = "low low lower lowest newest newest new"
    val merges = trained(text, 5).map { case (l, r, _) => (l, r) }
    val toks = Bpe.tokenizeWords(spark, corpusDf(text), "text", merges)
      .collect().map(r => r.getString(0) ->
        r.getSeq[String](r.fieldIndex("tokens"))).toMap
    // concatenating a word's tokens restores the word + end marker
    toks.foreach { case (w, ts) =>
      assert(ts.mkString === w + "_", s"word $w -> $ts")
      assert(ts.forall(_.nonEmpty))
    }
    // something actually merged (not all single chars)
    assert(toks.values.exists(_.exists(_.length > 1)))
  }

  test("degenerate corpus that fully merges terminates early, like the reference") {
    // one 2-char word: merges 'a'+'b' then 'ab'+'_', then NO pairs remain —
    // train must stop gracefully with 2 merges, not throw on round 3
    val got = trained("ab ab ab", rounds = 6)
    val want = referenceBpe(wordCounts("ab ab ab"), rounds = 6)
    assert(got == want)
    assert(got.size == 2)
  }
}
