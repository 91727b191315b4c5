package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.ops.{Quality, Relational}

/** Guarantees for the Bloom runtime-filter and corpus-quality operators
  * that the DuckDB oracle can't express (soundness, pruning effectiveness).
  */
class BloomQualitySpec extends SparkSuite {

  test("Bloom filter has no false negatives and usable selectivity") {
    val keys = spark.range(0, 5000).select((col("id") * 7919L).as("k"))
    val bf = Bloom.build(keys, "k")
    // Soundness: every inserted key must test positive.
    val misses = keys.filter(!bf.col(col("k"))).count()
    assert(misses === 0L)
    // Effectiveness: disjoint probe keys should almost all test negative
    // (2^20 bits / 5k keys → fpp far below 1%; assert a loose 5% bound).
    val probes = spark.range(0, 5000).select((col("id") * 7919L + 1L).as("k"))
    val falsePos = probes.filter(bf.col(col("k"))).count()
    assert(falsePos < 250L, s"false-positive count $falsePos out of 5000")
  }

  test("bloom-filtered join returns exactly the plain join result") {
    val plain = {
      val dim = graft.tables.Tables.table(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.tables.Tables.table(spark, sf, "lineitem")
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("revenue"))
    }
    val bloomed = Relational.queries("j13_bloom_join")(spark, sf)
    assert(bloomed.collect().toSet === plain.collect().toSet)
    assert(bloomed.count() > 0)
  }

  test("repetition signals match a hand-computed document") {
    val sess = spark
    import sess.implicits._
    val docs = Seq((1L, "a a a a b"), (2L, "x y z w")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("t10_docs")
    // Inline the operator's formula against a tiny frame via the same code
    // path: explode → (doc, word) counts → per-doc signals.
    val words = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
    val wc = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val out = wc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"), max(col("c")).as("top_c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((5L, 2L, 4L))) // "a"×4 + "b" → 5 words, 2 distinct, top 4
    assert(out(2L) === ((4L, 4L, 1L)))
    // And the registered operator runs end-to-end on the testdata.
    val full = Quality.queries("t10_repetition")(spark, sf)
    assert(full.count() > 0)
    assert(full.columns.toSeq ===
      Seq("doc_id", "n_words", "dup_word_frac", "top_word_frac", "repetitive"))
  }

  test("Bloom soundness holds across key distributions (property)") {
    // No-false-negative must hold for ANY key set — probe adversarial
    // distributions: dense sequential, bit-sparse powers, large-magnitude,
    // negative, and pseudo-random keys.
    val sess = spark
    import sess.implicits._
    val keySets: Seq[(String, Seq[Long])] = Seq(
      "sequential" -> (0L until 2000L),
      "powers" -> (0 until 62).map(1L << _),
      "negatives" -> (0L until 1000L).map(i => -i * 31L - 7L),
      "large" -> (0L until 1000L).map(i => Long.MaxValue - i * 1009L),
      "lcg" -> Iterator.iterate(88172645463325252L)(x => x * 6364136223846793005L + 1442695040888963407L)
        .take(1500).toSeq)
    keySets.foreach { case (label, keys) =>
      val df = keys.toDF("k")
      val bf = Bloom.build(df, "k")
      val misses = df.filter(!bf.col(col("k"))).count()
      assert(misses === 0L, s"false negatives in distribution '$label'")
    }
  }

  test("gap-fill invariants: dense grid, fill equals last observation (property)") {
    import graft.ops.TimeWindows
    val out = TimeWindows.queries("ts4_gap_fill")(spark, sf)
      .select(col("user_id"), col("day"), col("filled_value"), col("gap"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val days = rows.map(_._2).sortBy(_.toEpochDay)
      // Invariant 1: the grid is dense — every day between min and max present.
      assert(days.last.toEpochDay - days.head.toEpochDay + 1 === days.length.toLong)
      // Invariant 2: filled_value is carried from the most recent non-gap day.
      var lastObserved = Double.NaN
      rows.sortBy(_._2.toEpochDay).foreach { case (_, _, v, gap) =>
        if (!gap) lastObserved = v
        else assert(v === lastObserved, "gap row must carry the last observed value")
      }
      // Invariant 3: span endpoints are observations, never gaps.
      val byDay = rows.map(r => r._2 -> r._4).toMap
      assert(!byDay(days.head) && !byDay(days.last))
    }
  }

  test("bigram counts: zip_with/slice construction matches a manual bigram") {
    val sess = spark
    import sess.implicits._
    val one = Seq("the quick brown fox the quick").toDF("text")
    val words = split(lower(col("text")), " ")
    val bigrams = zip_with(
      slice(words, lit(1), size(words) - 1),
      slice(words, lit(2), size(words) - 1),
      (a, b) => concat(a, lit(" "), b))
    val got = one.select(explode(bigrams).as("b")).as[String].collect().toSeq
    assert(got === Seq("the quick", "quick brown", "brown fox", "fox the", "the quick"))
    // Single-word documents produce no bigrams (slice length 0 edge).
    val none = Seq("hello").toDF("text").select(explode(bigrams).as("b")).count()
    assert(none === 0L)
    assert(Quality.queries("t11_bigrams")(spark, sf).count() <= 20)
  }
}
