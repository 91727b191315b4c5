package graft

import org.apache.spark.sql.functions._
import graft.ingest.Snapshots
import graft.query.RuntimePrune

/** Runtime file pruning for joins: files are actually skipped, every
  * accepted join type matches the plain join bit-for-bit, unsupported
  * types are refused, and degenerate dims (empty, all-null, over-cap key
  * counts) stay correct.
  */
class RuntimePruneSpec extends SparkSuite {

  /** A fact table clustered on `k`: ids 0..199 range-partitioned into ~8
    * files, so each file owns a narrow contiguous k-range and stats
    * pruning has something to bite on.
    */
  private lazy val factBase: String = {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_rtp_fact")
    val df = (0L until 200L).map(i => (i, s"v$i", i * 10)).toDF("k", "s", "amt")
      .repartitionByRange(8, col("k"))
    Snapshots.commit(spark, df, base)
    base
  }

  private def dimOf(keys: Seq[java.lang.Long]) = {
    val sess = spark
    import sess.implicits._
    keys.map(k => (k, s"d$k")).toDF("dk", "dname")
  }

  test("a narrow dim prunes most fact files and the join matches the plain join") {
    val dim = dimOf(Seq(3L, 5L, 7L))
    val (kept, total) = RuntimePrune.candidateFiles(spark, factBase, "k", dim, "dk")
    assert(total >= 6, s"fixture should split into several files, got $total")
    assert(kept.size < total, s"no file was pruned (kept ${kept.size}/$total)")
    assert(kept.size <= 2, s"3 adjacent keys should live in at most 2 range files, kept ${kept.size}")
    val pruned = RuntimePrune.join(spark, factBase, "k", dim, "dk")
    val plain = Snapshots.read(spark, factBase)
    val expect = plain.join(dim, plain.col("k") === dim.col("dk"))
    assert(pruned.columns.toSeq === expect.columns.toSeq)
    assert(pruned.collect().map(_.toString).sorted.toSeq ===
      expect.collect().map(_.toString).sorted.toSeq)
  }

  test("left_semi and right_outer prune safely; unmatched dim rows survive") {
    val dim = dimOf(Seq(10L, 11L, 9999L)) // 9999 matches nothing
    val semi = RuntimePrune.join(spark, factBase, "k", dim, "dk", "left_semi")
    assert(semi.columns.toSeq === Seq("k", "s", "amt"))
    assert(semi.select("k").collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L))
    val ro = RuntimePrune.join(spark, factBase, "k", dim, "dk", "right_outer")
    // all three dim rows present; the unmatched one carries a null fact side
    assert(ro.count() === 3)
    assert(ro.filter(col("k").isNull).select("dk").collect().map(_.getLong(0)).toSeq === Seq(9999L))
  }

  test("fact-discarding join types are refused") {
    val dim = dimOf(Seq(1L))
    val e = intercept[IllegalArgumentException] {
      RuntimePrune.join(spark, factBase, "k", dim, "dk", "left_outer")
    }
    assert(e.getMessage.contains("prune"))
  }

  test("empty and all-null dims prune everything and still join correctly") {
    val empty = dimOf(Nil)
    assert(RuntimePrune.candidateFiles(spark, factBase, "k", empty, "dk")._1.isEmpty)
    assert(RuntimePrune.join(spark, factBase, "k", empty, "dk").count() === 0)
    val allNull = dimOf(Seq(null, null))
    assert(RuntimePrune.candidateFiles(spark, factBase, "k", allNull, "dk")._1.isEmpty)
    assert(RuntimePrune.join(spark, factBase, "k", allNull, "dk").count() === 0)
    // right_outer against a no-key dim: dim rows survive with a null fact side
    val ro = RuntimePrune.join(spark, factBase, "k", allNull, "dk", "right_outer")
    assert(ro.count() === 2)
    assert(ro.filter(col("k").isNotNull).count() === 0)
  }

  test("over-cap key counts fall back to range-only pruning, still correct") {
    val sess = spark
    import sess.implicits._
    // 50 keys in [20, 69] with maxInKeys=10: range filter alone must prune
    // the files outside [20, 69] and the join must stay exact.
    val dim = (20L until 70L).map(k => (k, s"d$k")).toDF("dk", "dname")
    val (kept, total) = RuntimePrune.candidateFiles(spark, factBase, "k", dim, "dk",
      maxInKeys = 10)
    assert(kept.size < total, "range-only pruning should still drop out-of-range files")
    val got = RuntimePrune.join(spark, factBase, "k", dim, "dk", maxInKeys = 10)
    assert(got.count() === 50)
    assert(got.agg(sum(col("amt"))).head().getLong(0) === (20L until 70L).map(_ * 10).sum)
  }

  test("time travel pins the pruned scan to the requested version") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_rtp_tt")
    val v1 = Snapshots.commit(spark,
      (0L until 10L).map(i => (i, "a")).toDF("k", "s").repartitionByRange(2, col("k")), base)
    Snapshots.commit(spark,
      (10L until 20L).map(i => (i, "b")).toDF("k", "s").repartitionByRange(2, col("k")), base)
    val dim = dimOf(Seq(5L, 15L))
    assert(RuntimePrune.join(spark, base, "k", dim, "dk").count() === 2)
    val pinned = RuntimePrune.join(spark, base, "k", dim, "dk", asOf = Some(v1))
    assert(pinned.select("k").collect().map(_.getLong(0)).toSeq === Seq(5L))
    // and the v2-only file never survives the pinned prune
    val (kept, _) = RuntimePrune.candidateFiles(spark, base, "k", dim, "dk", asOf = Some(v1))
    assert(kept.forall(Snapshots.liveFiles(base, v1).contains))
  }
}
