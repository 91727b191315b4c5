package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Closed-form checks for the bigram-LM perplexity operator: the DuckDB
  * oracle mirrors the same counting logic, so a shared misunderstanding
  * would pass both — these pin the MATH against hand computation.
  */
class QualityLmSpec extends SparkSuite {

  private def scored(texts: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    val sess = spark
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](texts.map(t => Row(t._1, t._2, "en", "synth", 0L)).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    val dir = tmpDir("graft_lm_docs")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    graft.ops.Quality.queries("t16_lm_perplexity")(sess, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }

  test("textrank: star-graph hub outranks tied leaves; mass sums to 1") {
    // "hub a hub b hub c": adjacency links hub to each of a/b/c and
    // nothing else — the word graph is a 3-leaf star, so the hub must
    // hold the top rank, the leaves must tie, and total mass stays 1
    // (sink-free symmetric graph conserves it exactly).
    val sess = spark
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](
        Seq(Row(1L, "hub a hub b hub c", "en", "synth", 17L)).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    val dir = tmpDir("graft_tr_docs")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val ranks = graft.ops.Quality.queries("t22_textrank_keywords")(sess, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.keySet === Set("hub", "a", "b", "c"))
    assert(ranks("a") === ranks("b") && ranks("b") === ranks("c"), "leaves must tie")
    assert(ranks("hub") > ranks("a"), "hub must outrank leaves")
    assert(math.abs(ranks.values.sum - 1.0) < 1e-5, s"mass drifted: ${ranks.values.sum}")
  }

  test("blocklist filter counts word-boundary phrase hits, not substrings") {
    val sess = spark
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](Seq(
        // two boundary hits of "slow merge"
        Row(1L, "a slow merge b slow merge c", "en", "synth", 27L),
        // clean: words appear but never as the adjacent pair
        Row(2L, "slow fast merge slow table merge", "en", "synth", 32L),
        // one hit of a different listed phrase
        Row(3L, "x big query y", "en", "synth", 13L)).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    val dir = tmpDir("graft_bl_docs")
    df.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = graft.ops.Quality.queries("t23_blocklist_filter")(sess, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === Map(1L -> ((2L, false)), 2L -> ((0L, true)), 3L -> ((1L, false))))
  }

  test("ccnet terciles partition each language; perplexity is monotone across tiers") {
    val rows = graft.ops.Quality.queries("ccnet1_ppl_buckets")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    val perLang = rows.groupBy(_._1)
    val nDocs = graft.tables.Tables.table(spark, sf, "documents")
      .groupBy(org.apache.spark.sql.functions.col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, tiers) <- perLang) {
      assert(tiers.map(_._2).sorted.toSeq === Seq(1, 2, 3), s"$lang missing a tier")
      assert(tiers.map(_._3).sum === nDocs(lang), s"$lang tiers must partition the docs")
      val byBucket = tiers.sortBy(_._2)
      // ascending-ppl ntile: an earlier bucket's max never exceeds a later
      // bucket's min (equality only at ties split by the id tiebreak)
      for (w <- byBucket.sliding(2); if w.length == 2) {
        val (a, b) = (w(0), w(1))
        assert(a._5 <= b._4 + 1e-9, s"$lang: bucket ${a._2} max ${a._5} > bucket ${b._2} min ${b._4}")
      }
    }
    assert(perLang.nonEmpty)
  }

  test("hand-computed perplexity on a two-token model") {
    // train doc 0: "a b a b" -> contexts: c1(a)=2, c1(b)=1;
    // bigrams: c2(a,b)=2, c2(b,a)=1; vocab V={a,b} -> 2
    // doc 1 (odd, scored only): "a b" -> one bigram (a,b):
    //   p = (2+1)/(2+2) = 0.75 ; ppl = exp(-ln 0.75) = 4/3
    val out = scored(Seq(0L -> "a b a b", 1L -> "a b"))
    assert(out(1L) === ((1L, 0L, 1.33)))
    // the train doc scores too: bigrams (a,b) (b,a) (a,b)
    //   p(ab)=3/4 (twice), p(ba)=(1+1)/(1+2)=2/3
    //   ppl = exp(-(2*ln .75 + ln(2/3))/3) = (0.75^2 * 2/3)^(-1/3)
    val expected0 = math.rint(math.pow(0.75 * 0.75 * (2.0 / 3.0), -1.0 / 3.0) * 100) / 100
    assert(out(0L)._3 === expected0 && out(0L)._1 === 3L && out(0L)._2 === 0L)
  }

  test("unseen bigrams raise perplexity and count as OOV") {
    // doc 3's bigrams never occur in training -> all OOV, each
    // p = 1/(c1+V) or 1/V-ish; its ppl must exceed the in-domain doc 1
    val out = scored(Seq(
      0L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      1L -> "the cat sat",
      3L -> "zap quux blorp"))
    assert(out(3L)._2 === 2L)           // both bigrams OOV
    assert(out(1L)._2 === 0L)
    assert(out(3L)._3 > out(1L)._3)     // noise scores worse than in-domain
  }
}
