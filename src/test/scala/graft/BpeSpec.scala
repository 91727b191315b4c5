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
  private def referenceBpe(words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] =
    referenceMerges(words.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "_") -> c
    }, rounds)

  /** Independent byte-level reference: the SAME pre-token pattern under
    * plain Java regex, UTF-8 bytes spelled as uppercase hex symbols, no
    * end-of-word marker — then the shared merge loop.
    */
  private def referenceByteBpe(texts: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
    val pat = Bpe.PreTokenPattern.r
    val toks = texts.flatMap(t => pat.findAllIn(t).toSeq)
      .filter(t => t.nonEmpty && t.length <= 20)
    referenceMerges(
      toks.groupBy(identity).map { case (t, g) =>
        t.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X") -> g.size.toLong
      }, rounds)
  }

  private def referenceMerges(dict0: Map[Vector[String], Long],
                              rounds: Int): Seq[(String, String, Long)] = {
    var dict = dict0
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

  test("fertility rolls up vocab3's per-doc accounting exactly, per source") {
    import org.apache.spark.sql.functions.col
    val perDoc = Bpe.queries("vocab3_bpe_encode")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val srcOf = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = perDoc.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, xs) =>
        val w = xs.map(_._2._1).sum; val t = xs.map(_._2._2).sum
        (src, (xs.length.toLong, w, t, t.toDouble / w))
      }
    val got = Bpe.queries("vocab5_fertility")(spark, sf).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    assert(got.values.forall { case (_, w, t, f) => t >= w && f >= 1.0 },
      "BPE can never emit fewer tokens than words (every word is >= 1 piece)")
  }

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

  private def trainedBytes(texts: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
    val sess = spark
    import sess.implicits._
    Bpe.trainBytes(spark, texts.toDF("text"), "text", rounds = rounds)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
  }

  test("byte-level BPE matches the reference on multi-byte UTF-8 and contractions") {
    // é/ö/ï are two UTF-8 bytes, œ is two, the contraction pre-splits as
    // (can)('t), digits and punctuation split into their own runs
    val texts = Seq(
      "héllo wörld héllo wörld can't won't 123 456! naïve œuf",
      "héllo can't 123 héllo... wörld",
      "the œuf, naïve héllo wörld 123")
    for (rounds <- Seq(1, 4, 8))
      assert(trainedBytes(texts, rounds) === referenceByteBpe(texts, rounds),
        s"divergence at rounds=$rounds")
    // multi-byte characters merge as byte pairs: a corpus dominated by é
    // (C3 A9) must pick that pair first
    val accent = Seq("ééé ééé éé", "ééé é")
    val first = trainedBytes(accent, 1)
    assert(first === referenceByteBpe(accent, 1))
    assert(first.head._1 == "C3" && first.head._2 == "A9", first.head)
  }

  test("byte-level pre-tokens carry their leading space (GPT-2 convention)") {
    val texts = Seq("aa bb aa bb aa bb", "aa bb")
    // the regex attaches the single space to the following token: " bb"
    // appears as a space-prefixed pre-token whose first byte is 0x20
    val pretoks = Bpe.PreTokenPattern.r.findAllIn(texts.head).toSeq
    assert(pretoks.contains(" bb") && pretoks.contains(" aa"))
    assert(!pretoks.contains("bb"), "mid-text tokens must keep their space")
    val got = trainedBytes(texts, 4)
    assert(got === referenceByteBpe(texts, 4))
    // a learned merge starts with the space byte — whitespace-prefix
    // tokens are first-class merge material, not stripped
    assert(got.exists { case (l, r, _) => (l + r).startsWith("20") },
      got.mkString(", "))
    // multi-space runs become whitespace tokens (the documented
    // lookahead-free divergence): "a  b" yields "a", "  ", "b"-ish split
    val ws = Bpe.PreTokenPattern.r.findAllIn("aa   bb").toSeq
    assert(ws === Seq("aa", "   ", "bb"))
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
