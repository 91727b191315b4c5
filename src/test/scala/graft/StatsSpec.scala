package graft

/** Error envelopes for the sketch aggregates whose internals no SQL oracle
  * can reproduce (a3's HLL envelope lives in DedupSimSpec).
  */
class StatsSpec extends SparkSuite {

  test("count-min sketch: never undercounts, overcount bounded, heavy hitters superset") {
    import org.apache.spark.sql.functions._
    val e = graft.tables.Tables.events(spark, sf)
    val exact = e.groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val sketch = graft.functions.Sketches.countMin(e, "user_id", eps = 0.01)
    exact.foreach { case (k, trueCount) =>
      val est = sketch.estimateCount(Long.box(k))
      assert(est >= trueCount, s"CMS undercounted key $k: $est < $trueCount")
      assert(est <= trueCount + math.ceil(0.01 * n).toLong,
        s"CMS overcount beyond eps*N for $k: $est vs $trueCount (N=$n)")
    }
    // heavy hitters at a threshold every user clears → all keys survive;
    // at an impossible threshold → none.
    val all = graft.functions.Sketches.heavyHitters(sketch, exact.keys.toSeq, 1L)
    assert(all.map(_._1).toSet === exact.keySet)
    assert(graft.functions.Sketches.heavyHitters(sketch, exact.keys.toSeq, n + 1).isEmpty)
  }

  test("a7: approx_percentile lands within 1% of the exact median per group") {
    val rows = graft.ops.Stats.queries("a7_approx_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Double]("approx_median")
      val exact = r.getAs[Double]("exact_median")
      assert(math.abs(approx - exact) / exact <= 0.01,
        s"approx median $approx vs exact $exact")
    }
  }
}
