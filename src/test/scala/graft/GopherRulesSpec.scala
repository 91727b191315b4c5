package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Boundary pins for the Gopher/MassiveText quality rules (t19): the DuckDB
  * oracle replays the same integer cross-multiplications, so a shared
  * off-by-one on a threshold would pass both — these fix each rule's edge
  * against the PUBLISHED thresholds (Rae et al. 2021, App. A) by hand.
  */
class GopherRulesSpec extends SparkSuite {

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }

  private def flags(texts: Seq[(Long, String)]): Map[Long, Row] = {
    val sess = spark
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](
        texts.map(t => Row(t._1, t._2, "en", "synth", t._2.length.toLong)).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    val dir = tmpDir("graft_gopher_docs")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    graft.ops.Quality.queries("t19_gopher_rules")(sess, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  private def get(r: Row, name: String): Boolean =
    r.getBoolean(r.fieldIndex(name))

  test("word-count rule: 49 words fail, 50 pass (inclusive lower bound)") {
    val w49 = (1 to 49).map(_ => "the").mkString(" ")
    val w50 = (1 to 50).map(_ => "the").mkString(" ")
    val out = flags(Seq(0L -> w49, 1L -> w50))
    assert(!get(out(0L), "ok_words") && get(out(1L), "ok_words"))
  }

  test("mean word length: exactly 3 and exactly 10 are inclusive; 2 and 11 fail") {
    val out = flags(Seq(
      0L -> (1 to 50).map(_ => "the").mkString(" "),        // mean 3
      1L -> (1 to 50).map(_ => "abcdefghij").mkString(" "), // mean 10
      2L -> (1 to 50).map(_ => "ab").mkString(" "),         // mean 2
      3L -> (1 to 50).map(_ => "abcdefghijk").mkString(" "))) // mean 11
    assert(get(out(0L), "ok_mean_len") && get(out(1L), "ok_mean_len"))
    assert(!get(out(2L), "ok_mean_len") && !get(out(3L), "ok_mean_len"))
  }

  test("alpha rule: exactly 80% alphabetic words passes, below fails") {
    val eighty = (Seq.fill(8)("word") ++ Seq.fill(2)("1234")).mkString(" ")
    val seventy = (Seq.fill(7)("word") ++ Seq.fill(3)("1234")).mkString(" ")
    val out = flags(Seq(0L -> eighty, 1L -> seventy))
    assert(get(out(0L), "ok_alpha") && !get(out(1L), "ok_alpha"))
  }

  test("symbol rule is PER SYMBOL (paper semantics): 1 '#' + 1 '...' in 10 words passes") {
    // Rae et al. apply the 0.1 threshold to each symbol's own ratio —
    // a combined sum would wrongly reject this document (2/10 > 0.1).
    val ok = (Seq("#", "a...b") ++ Seq.fill(8)("word")).mkString(" ")
    val badHash = (Seq("#", "#") ++ Seq.fill(8)("word")).mkString(" ")     // 2 '#'/10
    val badDots = (Seq("a...b", "c...d") ++ Seq.fill(8)("word")).mkString(" ")
    val out = flags(Seq(0L -> ok, 1L -> badHash, 2L -> badDots))
    assert(get(out(0L), "ok_symbols"))
    assert(!get(out(1L), "ok_symbols") && !get(out(2L), "ok_symbols"))
  }

  test("stop-word rule needs two DISTINCT stop words; keep is the conjunction") {
    val one = (Seq.fill(25)("the") ++ Seq.fill(25)("xyz")).mkString(" ")
    val two = (Seq("the", "with") ++ Seq.fill(48)("xyz")).mkString(" ")
    val out = flags(Seq(0L -> one, 1L -> two))
    assert(!get(out(0L), "ok_stops") && get(out(1L), "ok_stops"))
    assert(!get(out(0L), "keep") && get(out(1L), "keep"))
  }

  // ---- t20: the classifier's training math, pinned by hand ----------------

  /** Hand corpus: Gopher-keep text G = "the and"×25 + " zebra" (51 words,
    * label TRUE), Gopher-fail shorts (label FALSE). Train = even ids:
    * six good (0..10) carrying {the, and, zebra}, six bad (12..22)
    * carrying {qq, zebra} (two of them add "rare" — below the 5-doc
    * support floor). Hand-derived Laplace weights in ppm:
    * the/and (pos 6, neg 0) → 7e6/8  = 875000;
    * qq      (pos 0, neg 6) → 1e6/8  = 125000;
    * zebra   (pos 6, neg 6) → 7e6/14 = 500000;
    * rare (support 2 < 5) and any unseen word → the 500000 prior.
    */
  private val goodText = (Seq.fill(25)("the and").mkString(" ")) + " zebra"

  private def t20(texts: Seq[(Long, String)]): Map[Long, Row] = {
    val sess = spark
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](
        texts.map(t => Row(t._1, t._2, "en", "synth", t._2.length.toLong)).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    val dir = tmpDir("graft_t20_docs")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    graft.ops.Quality.queries("t20_quality_classifier")(sess, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("t20: weights, support floor, prior, and held-out scoring by hand") {
    val docs =
      (0L to 10L by 2).map(_ -> goodText) ++
      Seq(12L -> "qq zebra rare", 14L -> "qq zebra rare") ++
      (16L to 22L by 2).map(_ -> "qq zebra") ++
      Seq(1L -> goodText,          // held-out good: (875000·2 + 500000)/3
          3L -> "qq zebra novel",  // held-out bad: (125000 + 500000·2)/3
          5L -> "rare zebra qq")   // floored word scores as the prior
    val out = t20(docs)
    def row(id: Long): (Boolean, Boolean, Long, Long, Long, Boolean) = {
      val r = out(id)
      (r.getBoolean(r.fieldIndex("label")), r.getBoolean(r.fieldIndex("is_train")),
        r.getLong(r.fieldIndex("n_feats")), r.getLong(r.fieldIndex("score_sum")),
        r.getLong(r.fieldIndex("score_ppm")), r.getBoolean(r.fieldIndex("pred_keep")))
    }
    assert(row(1L) === ((true, false, 3L, 2250000L, 750000L, true)))
    assert(row(3L) === ((false, false, 3L, 1125000L, 375000L, false)))
    assert(row(5L) === ((false, false, 3L, 1125000L, 375000L, false)))
    // a train doc scores through the same weights (no train/test leak path)
    assert(row(0L) === ((true, true, 3L, 2250000L, 750000L, true)))
    // every even id is marked train, every odd held-out
    out.foreach { case (id, r) =>
      assert(r.getBoolean(r.fieldIndex("is_train")) === (id % 2 == 0))
    }
    // the bootstrap generalizes: held-out predictions match held-out labels
    Seq(1L, 3L, 5L).foreach { id =>
      val r = out(id)
      assert(r.getBoolean(r.fieldIndex("pred_keep")) ===
        r.getBoolean(r.fieldIndex("label")), s"held-out doc $id misclassified")
    }
  }

  // ---- t21: PII redaction pinned by hand -----------------------------------

  private def t21(texts: Seq[(Long, String)]): Map[Long, Row] = {
    val sess = spark
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](
        texts.map(t => Row(t._1, t._2, "en", "synth", t._2.length.toLong)).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    val dir = tmpDir("graft_t21_docs")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    graft.ops.Quality.queries("t21_pii_redact")(sess, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("t21: injection formulas, detector counts, replace-all, order by hand") {
    val out = t21(Seq(
      0L -> "alpha beta",          // %7 = %11 = %13 = 0: all three injected
      1L -> "x ab@cd.ef y",        // organic email, no injection
      2L -> "two a@b.cc and c@d.ee here", // replace-ALL, not replace-first
      3L -> "plain words only",
      7L -> "gamma"))              // email injection only
    def row(id: Long): (Long, Long, Long, String, Boolean) = {
      val r = out(id)
      (r.getLong(r.fieldIndex("n_emails")), r.getLong(r.fieldIndex("n_phones")),
        r.getLong(r.fieldIndex("n_ips")), r.getString(r.fieldIndex("clean_text")),
        r.getBoolean(r.fieldIndex("has_pii")))
    }
    assert(row(0L) === ((1L, 1L, 1L,
      "alpha beta contact <EMAIL> now call <PHONE> ok from <IP> logged", true)))
    assert(row(1L) === ((1L, 0L, 0L, "x <EMAIL> y", true)))
    assert(row(2L) === ((2L, 0L, 0L, "two <EMAIL> and <EMAIL> here", true)))
    assert(row(3L) === ((0L, 0L, 0L, "plain words only", false)))
    assert(row(7L) === ((1L, 0L, 0L, "gamma contact <EMAIL> now", true)))
  }
}
