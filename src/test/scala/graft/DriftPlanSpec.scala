package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed pins for the drift monitor (drift1) and the epoch
  * allocator (mix6) — the DuckDB oracle replays the same integer
  * arithmetic, so these fix the SEMANTICS (midpoint split side, ppm
  * flooring, TVD attribution) against by-hand numbers.
  */
class DriftPlanSpec extends SparkSuite {

  test("drift1: midpoint split, ppm shares, and per-bucket shift by hand") {
    val sess = spark
    import sess.implicits._
    // ts 0..7s: ref half = ts*2 <= 0+7s, i.e. ts <= 3.5s -> ts 0..3.
    // ref types: A A A B ; cur types: A B B B.
    // value constant -> vhi == vlo -> all rows pin to decile 0.
    val dir = tmpDir("graft_drift_events")
    (0 to 7).map(i => (i.toLong, i.toLong * 1000000L, 1L,
        if ((i < 4 && i != 3) || i == 4) "A" else "B", 5.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(dir + "/events.parquet")
    val out = graft.ops.Profiling.queries("drift1_dist_shift")(sess, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val a = out(("event_type", "A"))
    // A: ref 3/4 = 750000 ppm, cur 1/4 = 250000 ppm, shift 500000.
    assert(a.getLong(2) === 3L && a.getLong(3) === 1L)
    assert(a.getLong(4) === 750000L && a.getLong(5) === 250000L)
    assert(a.getLong(6) === 500000L)
    val b = out(("event_type", "B"))
    assert(b.getLong(4) === 250000L && b.getLong(5) === 750000L)
    // constant value -> single decile bucket, zero shift (both halves 1e6)
    val d0 = out(("value_decile", "0"))
    assert(d0.getLong(4) === 1000000L && d0.getLong(6) === 0L)
    // TVD per dim = sum(shift)/2: event_type dim drifted by 0.5
    val tvd = out.collect { case (("event_type", _), r) => r.getLong(6) }.sum / 2
    assert(tvd === 500000L)
  }

  test("mix6: uniform budget split and floored epochs_ppm by hand") {
    val sess = spark
    import sess.implicits._
    val dir = tmpDir("graft_mix6_docs")
    // two sources: s0 has 3+4=7 tokens, s1 has 3 tokens. Budget 10M,
    // uniform -> 5M each: epochs s0 = 5M*1e6 DIV 7, s1 = 5M*1e6 DIV 3.
    Seq((0L, "a b c", "en", "s0", 5L), (1L, "a b c d", "en", "s0", 7L),
        (2L, "x y z", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val out = graft.ops.Packing.queries("mix6_epoch_plan")(sess, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s0").getLong(1) === 7L && out("s1").getLong(1) === 3L)
    assert(out("s0").getLong(2) === 5000000L)
    assert(out("s0").getLong(3) === 5000000L * 1000000L / 7L)
    assert(out("s1").getLong(3) === 5000000L * 1000000L / 3L)
    assert(out("s0").getBoolean(4) && out("s1").getBoolean(4))
  }
}
