package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Stream-STREAM joins — the last Structured Streaming operator family the
  * library lacked: two live feeds meet on a key under an EVENT-TIME
  * interval constraint, with watermarks bounding both sides' join state.
  *
  * Shape: purchases attribute to the same user's clicks in the preceding
  * `windowSec` seconds (the ad-attribution join every event pipeline
  * runs). Spark keeps each side's unmatched rows in state only while the
  * other side's watermark can still produce a match — the time-interval
  * predicate plus the two watermarks is what makes the state BOUNDED
  * (without them a stream-stream join buffers forever); at 100 TB/day the
  * state footprint is (events within the attribution window) per side,
  * hash-partitioned on user like every other keyed stage.
  *
  * The reference has no joins at all (its query surface is a key-range
  * scan, filesystemStorageAdapter.go:96-163) — north-star extension
  * surface like the rest of §2.2. StreamingSpec pins stream ≡ the batch
  * interval join on the same rows (the d13/NearDupStream discipline:
  * streaming semantics certified against a relational replay), plus the
  * left-outer variant emitting never-attributed purchases once their
  * match window is provably closed.
  */
object StreamJoin {

  case class Click(user_id: Long, click_us: Long, page: String)
  case class Buy(user_id: Long, buy_us: Long, cents: Long)

  /** Inner attribution join: every (purchase, click) pair of the same
    * user with `buy_ts - windowSec <= click_ts <= buy_ts`. Works on both
    * streaming and batch Datasets — the SAME plan builder is the spec's
    * batch replay, so the equivalence check exercises the identical
    * expressions.
    */
  def attributedPurchases(clicks: Dataset[Click], buys: Dataset[Buy],
                          delay: String = "10 minutes",
                          windowSec: Long = 300L,
                          joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"),
        timestamp_micros(col("click_us")).as("click_ts"), col("page"))
      .withWatermark("click_ts", delay)
    val b = buys
      .select(col("user_id").as("b_user"),
        timestamp_micros(col("buy_us")).as("buy_ts"), col("cents"))
      .withWatermark("buy_ts", delay)
    b.join(c,
      expr(s"""c_user = b_user AND
               click_ts >= buy_ts - INTERVAL $windowSec SECONDS AND
               click_ts <= buy_ts"""),
      joinType)
      .select(col("b_user").as("user_id"), col("buy_ts"), col("cents"),
        col("click_ts"), col("page"))
  }
}
