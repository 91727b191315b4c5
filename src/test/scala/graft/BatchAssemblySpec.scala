package graft

import org.apache.spark.sql.functions._
import graft.ops.{Packing, Profiling, Relational}

/** Structural properties of the batch-assembly / linkage / profiling ops
  * beyond what the DuckDB oracle pins (determinism, coverage, bounds).
  */
class BatchAssemblySpec extends SparkSuite {

  private def docs = graft.tables.Tables.table(spark, sf, "documents")

  test("split1: deterministic, complete, and near the 80/10/10 design") {
    val q = Packing.queries("split1_train_split")
    val a = q(spark, sf).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = q(spark, sf).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(a === b, "split assignment must be run-deterministic")
    assert(a.size === docs.count(), "every document gets a split")
    val n = a.size.toDouble
    val shares = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    // 500 docs → binomial noise; ±6 absolute points around 0.8/0.1/0.1
    assert(math.abs(shares("train") - 0.8) < 0.06, s"train share ${shares("train")}")
    assert(math.abs(shares.getOrElse("val", 0.0) - 0.1) < 0.06)
    assert(math.abs(shares.getOrElse("test", 0.0) - 0.1) < 0.06)
  }

  test("chunk1: chunks tile each document with the designed stride and overlap") {
    val rows = Packing.queries("chunk1_overlap_chunks")(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === lens.keySet, "every document chunks")
    rows.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1)) // chunk_idx
      val len = lens(id)
      // indices are dense from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong)
        assert(r.getLong(2) === i * 150L)
      }
      // full coverage: last chunk reaches the end of the text
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) === len,
        s"doc $id: last chunk ends at ${last.getLong(2) + last.getLong(3)}, text len $len")
      // every chunk but the last is full-width
      sorted.init.foreach(r => assert(r.getLong(3) === 200L))
      // expected chunk count for the (len, 200, 150) geometry
      val expected = 1L + math.max(0L, (len - 200 + 149) / 150)
      assert(sorted.length.toLong === expected)
    }
  }

  test("shuf1: dense positions per shard, bounded shards, deterministic") {
    val q = Packing.queries("shuf1_shard_shuffle")
    val rows = q(spark, sf).collect()
    assert(rows.length === docs.count().toInt)
    val byShard = rows.groupBy(_.getLong(1))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (_, rs) =>
      val positions = rs.map(_.getLong(2)).sorted
      assert(positions.toSeq === (1L to rs.length).toSeq, "positions must be dense 1..n")
    }
    val again = q(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again === rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "shuffle order must be run-deterministic")
  }

  test("j14: thresholded levenshtein matches the unthresholded distance") {
    val rows = Relational.queries("j14_fuzzy_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    val names = graft.tables.Tables.table(spark, sf, "part")
      .select(col("p_partkey"), col("p_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    rows.foreach { r =>
      val (ka, kb, dist) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ka < kb, "pairs must be id-ordered")
      assert(dist >= 0 && dist <= 2)
      assert(lev(names(ka), names(kb)).toLong === dist,
        s"threshold path diverged for ($ka, $kb)")
    }
  }

  test("hist1: buckets cover 0..9 and counts sum to the table size") {
    val rows = Profiling.queries("hist1_price_histogram")(spark, sf).collect()
    val total = graft.tables.Tables.table(spark, sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(rows.map(_.getLong(0)).forall(b => b >= 0 && b <= 9))
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
  }

  test("hist1: a single-valued column pins to bucket 0, never NaN") {
    // hi == lo makes the equi-width bucket expression 0/0; the guard must
    // route every row to bucket 0 (the oracle-matching choice) instead of
    // NaN-casting. Staged as a real lineitem.parquet so the REGISTERED
    // query lambda is what's exercised, not a re-derivation.
    val dir = java.nio.file.Files.createTempDirectory("graft_hist_degen").toString
    spark.range(100).select(lit(42.5).as("l_extendedprice"))
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = Profiling.queries("hist1_price_histogram")(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 0L)
    assert(rows.head.getLong(1) === 100L)
  }

  test("f21: NULL text round-trips as true under null-safe equality") {
    // aes_decrypt(aes_encrypt(NULL)) is NULL; a plain === would grade the
    // round trip NULL (dropped by the oracle's boolean compare), so the
    // query uses <=> — NULL <=> NULL must surface as TRUE.
    val dir = java.nio.file.Files.createTempDirectory("graft_f21_null").toString
    val s = spark
    import s.implicits._
    Seq((1L, "hello"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.ops.Fns.queries("f21_crypto_fns")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rows(1L) === true)
    assert(rows(2L) === true, "NULL text must round-trip true via <=>")
  }

  test("pack3: bins respect capacity (except oversize singletons) and are dense") {
    import org.apache.spark.sql.functions._
    val cap = graft.ops.Packing.PackLen
    val out = graft.ops.Packing.queries("pack3_bin_packing")(spark, sf)
    val bins = out.groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("n_docs"))
    // a bin over capacity must be a single oversize document
    assert(bins.filter(col("fill") > cap && col("n_docs") > 1).count() === 0L)
    // bin ids are dense 0..max within each shard
    val dense = bins.groupBy(col("shard"))
      .agg(countDistinct(col("bin")).as("n_bins"), max(col("bin")).as("max_bin"))
      .filter(col("n_bins") =!= col("max_bin") + 1).count()
    assert(dense === 0L)
    // every document is packed exactly once
    assert(out.count() === spark.read.parquet(s"$sf/documents.parquet").count())
    // next-fit must never open a new bin the previous bin could absorb:
    // with decreasing order, consecutive bins can't BOTH be <= half-full
    // unless they hold oversize docs — cheap sanity that packing packs
    assert(bins.filter(col("fill") <= cap / 4).count() <
      bins.count(), "some bins must be meaningfully filled")
  }

  test("mix7: copy counts bracket the planned epochs and indices are dense") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Packing.queries("mix7_apply_mixture")(spark, sf)
    val plan = graft.ops.Packing.queries("mix6_epoch_plan")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val perDoc = out.groupBy(col("doc_id"), col("source"))
      .agg(max(col("n_copies")).as("n_copies"),
        countDistinct(col("copy_idx")).as("n_idx"),
        max(col("copy_idx")).as("max_idx"))
      .collect()
    perDoc.foreach { r =>
      val (src, n) = (r.getString(1), r.getLong(2))
      val e = plan(src)
      // exactly floor(epochs) or floor(epochs)+1 copies per doc
      assert(n === e / 1000000 || n === e / 1000000 + 1, s"$src: $n vs $e")
      // copy indices dense 0..n-1
      assert(r.getLong(3) === n && r.getLong(4) === n - 1)
    }
    // the fractional mechanism actually discriminates: at least one
    // fractional-plan source realizes BOTH bracket values (some docs get
    // the extra copy, some don't)
    val fracSrcs = plan.filter(_._2 % 1000000 != 0).keySet
    val byCount = perDoc.groupBy(r => (r.getString(1), r.getLong(2))).keySet
    assert(fracSrcs.exists(s => byCount.count(_._1 == s) == 2),
      s"no fractional source realized both copy counts: $byCount")
  }

  test("split2: every near-dup cluster lands wholly inside one split") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Dedup.queries("split2_cluster_split")(spark, sf)
    // the leakage-safety contract: no cluster straddles two splits
    val straddlers = out.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddlers === 0L)
    // complete: one row per document, every row labeled
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() === docs)
    assert(out.filter(col("split").isin("train", "val", "test")).count() === docs)
    // and it must actually group near-dups: at least one multi-doc cluster
    assert(out.groupBy(col("cluster")).count().filter(col("count") > 1).count() > 0L)
  }
}
