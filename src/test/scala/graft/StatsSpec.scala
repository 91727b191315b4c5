package graft

/** Error envelopes for the sketch aggregates whose internals no SQL oracle
  * can reproduce (a3's HLL envelope lives in DedupSimSpec).
  */
class StatsSpec extends SparkSuite {

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
