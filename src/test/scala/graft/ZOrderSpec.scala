package graft

import org.apache.spark.sql.functions._
import graft.ingest.ZOrder
import graft.tables.Tables

/** Z-order layout quality: for a 2-dimensional box query, fewer files'
  * (min,max) boxes intersect the query than under a single-key sort —
  * i.e. footer-stats skipping works on BOTH dimensions.
  */
class ZOrderSpec extends SparkSuite {

  private def intersectingFiles(base: String,
                                 uLo: Long, uHi: Long, tLo: Long, tHi: Long): Long = {
    spark.read.parquet(base)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
        min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
      .filter(!(col("u0") > uHi || col("u1") < uLo || col("t0") > tHi || col("t1") < tLo))
      .count()
  }

  test("z-order clusters both dims: fewer candidate files for box queries") {
    val events = Tables.events(spark, "/root/testdata/sf0.01").drop("ts", "ts_t")
    val byTime = tmpDir("graft_zorder_bytime")
    val byZ = tmpDir("graft_zorder_z")
    // Baseline: time-sorted layout (the reference's one-dimensional layout)
    events.repartitionByRange(64, col("ts_us")).sortWithinPartitions(col("ts_us"))
      .write.mode("overwrite").option("maxRecordsPerFile", 256).parquet(byTime)
    ZOrder.writeZOrdered(events, byZ, "user_id", "ts_us",
      numFiles = 64, maxRecordsPerFile = 256)

    // same total rows either way
    assert(spark.read.parquet(byZ).count() === events.count())

    val b = events.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val (tMin, tMax) = (b.getLong(0), b.getLong(1))
    val third = (tMax - tMin) / 3
    // box: 4 of 150 users × middle third of time
    val (uLo, uHi, tLo, tHi) = (30L, 60L, tMin + third, tMin + 2 * third)

    val filesTime = intersectingFiles(byTime, uLo, uHi, tLo, tHi)
    val filesZ = intersectingFiles(byZ, uLo, uHi, tLo, tHi)
    assert(filesZ < filesTime,
      s"z-order should prune more: z=$filesZ vs time-sorted=$filesTime")

    // and the query itself returns identical rows on both layouts
    def rows(base: String) = spark.read.parquet(base)
      .filter(col("user_id").between(uLo, uHi) && col("ts_us").between(tLo, tHi))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows(byZ) === rows(byTime))
  }

  test("3-D z-order beats 1-D sort AND 2-D Morton on 3-D box candidate files") {
    // Third dimension is `value` — event_id is useless here because the
    // generator assigns ids in time order (corr ≈ 0.99998 with ts_us), so
    // an event_id box is implicitly a time box; value is uncorrelated.
    val events = Tables.events(spark, "/root/testdata/sf0.01").drop("ts", "ts_t")
    val byTime = tmpDir("graft_zorder3_time")
    val byZ2 = tmpDir("graft_zorder3_z2")
    val byZ3 = tmpDir("graft_zorder3_z3")
    // 256 files: 8 shared z-bits of file granularity, so the 3-D split
    // still keeps ~3 bits per dimension (64 files would leave 2 — too
    // coarse for the box to show the third dimension's pruning)
    events.repartitionByRange(256, col("ts_us")).sortWithinPartitions(col("ts_us"))
      .write.mode("overwrite").option("maxRecordsPerFile", 64).parquet(byTime)
    ZOrder.layout(events, "user_id", "ts_us", 256)
      .write.mode("overwrite").option("maxRecordsPerFile", 64).parquet(byZ2)
    ZOrder.layoutN(events, Seq("user_id", "ts_us", "value"), 256)
      .write.mode("overwrite").option("maxRecordsPerFile", 64).parquet(byZ3)
    assert(spark.read.parquet(byZ3).count() === events.count())

    val b = events.agg(min(col("ts_us")), max(col("ts_us")),
      min(col("value")), max(col("value"))).head()
    val (tMin, tMax) = (b.getLong(0), b.getLong(1))
    val (vMin, vMax) = (b.getDouble(2), b.getDouble(3))
    // box constraining ALL THREE dims: a user band × middle third of time
    // × the UPPER HALF of value ("high-value events"). Value is skewed
    // (75% of rows sit in the bottom ~15% of the range), so a low-value
    // box is file-granularity-invisible under linear normalization; the
    // upper half aligns with the top normalized bit and prunes hard.
    val (uLo, uHi) = (30L, 60L)
    val (tLo, tHi) = (tMin + (tMax - tMin) / 3, tMin + 2 * ((tMax - tMin) / 3))
    val (vLo, vHi) = (vMin + (vMax - vMin) / 2, vMax)

    def candidates(base: String): Long = spark.read.parquet(base)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
        min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"),
        min(col("value")).as("v0"), max(col("value")).as("v1"))
      .filter(!(col("u0") > uHi || col("u1") < uLo ||
        col("t0") > tHi || col("t1") < tLo ||
        col("v0") > vHi || col("v1") < vLo))
      .count()

    val (cTime, cZ2, cZ3) = (candidates(byTime), candidates(byZ2), candidates(byZ3))
    assert(cZ3 < cTime,
      s"3-D z-order should beat the 1-D sort: z3=$cZ3 vs time=$cTime")
    assert(cZ3 < cZ2,
      s"3-D z-order should beat 2-D Morton on a 3-D box: z3=$cZ3 vs z2=$cZ2")

    // identical rows on every layout
    def rows(base: String) = spark.read.parquet(base)
      .filter(col("user_id").between(uLo, uHi) && col("ts_us").between(tLo, tHi) &&
        col("value").between(vLo, vHi))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows(byZ3) === rows(byTime) && rows(byZ2) === rows(byTime))
  }

  test("3-D/4-D magic-mask spreads are bit-exact; arity beyond 4 refuses") {
    val sess = spark
    import sess.implicits._
    def refInterleave(ks: Seq[Long], n: Int, bits: Int): Long = {
      var out = 0L
      for (d <- 0 until n; i <- 0 until bits)
        out |= (((ks(d) >> i) & 1L) << (i * n + d))
      out
    }
    val rnd = new scala.util.Random(42)
    val tuples = Seq.fill(200)((rnd.nextLong() & 0x7FFFL, rnd.nextLong() & 0x7FFFL,
      rnd.nextLong() & 0x7FFFL, rnd.nextLong() & 0x7FFFL))
    val df = tuples.toDF("a", "b", "c", "d")
    val got4 = df.select(ZOrder.zValueN(
      Seq(col("a"), col("b"), col("c"), col("d"))).as("z")).as[Long].collect().toSeq
    assert(got4 === tuples.map { case (a, b, c, d) =>
      refInterleave(Seq(a, b, c, d), 4, 15) })
    val got3 = df.select(ZOrder.zValueN(
      Seq(col("a"), col("b"), col("c"))).as("z")).as[Long].collect().toSeq
    assert(got3 === tuples.map { case (a, b, c, _) =>
      refInterleave(Seq(a, b, c), 3, 21) })
    intercept[IllegalArgumentException] {
      ZOrder.zValueN(Seq(col("a"), col("b"), col("c"), col("d"), col("a")))
    }
  }

  test("hilbert curve: adjacency property holds; layout prunes like morton or better") {
    // The defining property: consecutive Hilbert indices are ALWAYS
    // Manhattan-adjacent cells — Morton has quadrant jumps. Full sweep of
    // a 32x32 grid pins both directions of the transform.
    val order = 5
    for (d <- 0L until (1L << (2 * order)) - 1) {
      val (x1, y1) = ZOrder.hilbertCell(order, d)
      val (x2, y2) = ZOrder.hilbertCell(order, d + 1)
      assert((x1 - x2).abs + (y1 - y2).abs === 1L,
        s"cells $d and ${d + 1} must be adjacent: ($x1,$y1) vs ($x2,$y2)")
      assert(ZOrder.hilbertIndex(order, x1, y1) === d, "xy2d must invert d2xy")
    }

    // Layout quality: summed over several box shapes, Hilbert candidate
    // files never exceed Morton's (its locality guarantee), and both beat
    // the 1-D sort.
    val events = Tables.events(spark, "/root/testdata/sf0.01").drop("ts", "ts_t")
    val byTime = tmpDir("graft_hilbert_time")
    val byM = tmpDir("graft_hilbert_m")
    val byH = tmpDir("graft_hilbert_h")
    events.repartitionByRange(64, col("ts_us")).sortWithinPartitions(col("ts_us"))
      .write.mode("overwrite").option("maxRecordsPerFile", 256).parquet(byTime)
    ZOrder.layout(events, "user_id", "ts_us", 64)
      .write.mode("overwrite").option("maxRecordsPerFile", 256).parquet(byM)
    ZOrder.layoutHilbert(events, "user_id", "ts_us", 64)
      .write.mode("overwrite").option("maxRecordsPerFile", 256).parquet(byH)
    assert(spark.read.parquet(byH).count() === events.count())

    val b = events.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val (tMin, tMax) = (b.getLong(0), b.getLong(1))
    val span = tMax - tMin
    val boxes = Seq(
      (30L, 60L, tMin + span / 3, tMin + 2 * (span / 3)),
      (0L, 30L, tMin, tMin + span / 4),
      (100L, 140L, tMin + span / 2, tMax),
      (60L, 90L, tMin + span / 8, tMin + 3 * (span / 8)))
    def total(base: String): Long =
      boxes.map { case (uLo, uHi, tLo, tHi) =>
        intersectingFiles(base, uLo, uHi, tLo, tHi)
      }.sum
    val (cTime, cM, cH) = (total(byTime), total(byM), total(byH))
    assert(cH < cTime, s"hilbert should beat the 1-D sort: $cH vs $cTime")
    assert(cH <= cM, s"hilbert should not lose to morton: $cH vs $cM")

    // identical rows on every layout for every box
    boxes.foreach { case (uLo, uHi, tLo, tHi) =>
      def rows(base: String) = spark.read.parquet(base)
        .filter(col("user_id").between(uLo, uHi) && col("ts_us").between(tLo, tHi))
        .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(rows(byH) === rows(byTime) && rows(byM) === rows(byTime))
    }
  }
}
