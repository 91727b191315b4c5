package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Window-function catalog: ranking, running aggregates, lag/lead, frames.
  * Absent from the reference (SURVEY.md §2.2) — stock Catalyst `Window`.
  *
  * Scale: every window here partitions by a high-cardinality key
  * (customer / supplier), so the single shuffle it costs spreads evenly;
  * no global (unpartitioned) ordering anywhere. When a running aggregate
  * is needed over a LOW-cardinality key (few huge groups), don't window
  * it directly — use the blocked two-pass prefix sum Packing's pack1
  * demonstrates (block-local windows + a tiny carried base).
  * All orderings carry a unique tie-break column so results are
  * deterministic for the oracle hash-compare.
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_rank_topn" -> { (s, d) =>
      // Top-3 orders per customer — the distributed top-k-per-group idiom
      // (row_number over partition, filter) instead of any global sort.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.table(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },
    "w2_running_sum" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.table(s, d, "orders")
        .withColumn("run_total", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
    },
    "w3_lag_delta" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.table(s, d, "orders")
        .withColumn("delta", round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("delta"))
    },
    "w4_moving_avg" -> { (s, d) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-2, Window.currentRow)
      Tables.table(s, d, "lineitem")
        .withColumn("mov_avg_qty", round(avg(col("l_quantity")).over(w), 4))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("mov_avg_qty"))
    },
    "w6_ntile_firstlast" -> { (s, d) =>
      // ntile deciles + frame-bounded first/last values per supplier.
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.table(s, d, "supplier")
        .withColumn("decile", ntile(10).over(w))
        .withColumn("top_bal", round(first(col("s_acctbal")).over(wf), 2))
        .withColumn("bottom_bal", round(last(col("s_acctbal")).over(wf), 2))
        .withColumn("prank", round(percent_rank().over(w), 4))
        .select(col("s_nationkey"), col("s_suppkey"), col("decile"),
          col("top_bal"), col("bottom_bal"), col("prank"))
    },
    "w5_dense_pct" -> { (s, d) =>
      // dense_rank + cumulative distribution over acctbal within nation.
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.table(s, d, "customer")
        .withColumn("drank", dense_rank().over(w))
        .withColumn("cdist", round(cume_dist().over(w), 4))
        .select(col("c_nationkey"), col("c_custkey"), col("drank"), col("cdist"))
    },
    "w7_range_frame" -> { (s, d) =>
      // Value-range frame (trailing hour of events per user) + lead +
      // nth_value — the analytic-frame family the row-based windows above
      // don't cover. The range frame orders on the raw µs key so frame
      // bounds are numeric, exactly like the reference's key ranges.
      val wr = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0)
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(wr).as("n_last_hour"),
        lead(col("event_id"), 1).over(wo).as("next_event"),
        nth_value(col("event_id"), 2)
          .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("second_event"))
    },
    "w8_time_range_frame" -> { (s, d) =>
      // Time-INTERVAL range frame (trailing 24h sum per user ordered by the
      // timestamp itself) through the SQL frontend — the calendar-typed
      // sibling of w7's numeric range frame. Same single-shuffle window
      // shape; the interval frame makes Spark maintain the sliding bound
      // by timestamp arithmetic rather than a numeric offset.
      Tables.events(s, d).createOrReplaceTempView("events_w8")
      s.sql(
        """SELECT user_id, event_id,
          |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_t
          |    RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW), 2) AS day_sum
          |FROM events_w8""".stripMargin)
    },
    "dim1_scd2" -> { (s, d) =>
      // Slowly-changing-dimension type 2 build: each change event for a
      // key becomes a validity interval [valid_from, valid_to) with the
      // open (current) row flagged — the lead() idiom every warehouse
      // uses to reconstruct dimension history from a change log (here:
      // each customer's orders as the change stream, the order's price as
      // the tracked attribute). One shuffle, keyed by the dimension key;
      // interval stitching is a per-key sorted pass — exactly a window.
      // (o_orderdate, o_orderkey) ordering is a deterministic total order
      // per customer, so same-day changes stitch reproducibly.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("custkey")).orderBy(col("valid_from"), col("ok"))
      Tables.table(s, d, "orders")
        .select(col("o_custkey").as("custkey"), col("o_orderkey").as("ok"),
          col("o_orderdate").as("valid_from"), col("o_totalprice").as("price"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
    }
  )

  val oracleSql: Map[String, String] = Map(
    "w1_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3""".stripMargin,
    "w2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
        |FROM orders""".stripMargin,
    "w3_lag_delta" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
        |FROM orders""".stripMargin,
    "w4_moving_avg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg_qty
        |FROM lineitem""".stripMargin,
    "w6_ntile_firstlast" ->
      """SELECT s_nationkey, s_suppkey,
        |  ntile(10) OVER w AS decile,
        |  round(first_value(s_acctbal) OVER wf, 2) AS top_bal,
        |  round(last_value(s_acctbal) OVER wf, 2) AS bottom_bal,
        |  round(percent_rank() OVER w, 4) AS prank
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey),
        |       wf AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    "w5_dense_pct" ->
      """SELECT c_nationkey, c_custkey,
        |  dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drank,
        |  round(cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey), 4) AS cdist
        |FROM customer""".stripMargin,
    "w7_range_frame" ->
      """SELECT user_id, event_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour,
        |  lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_event,
        |  nth_value(event_id, 2) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_event
        |FROM events""".stripMargin,
    "w8_time_range_frame" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW), 2) AS day_sum
        |FROM events""".stripMargin,
    // price passes through unmodified (no arithmetic), dates are exact —
    // the whole row is engine-stable without rounding.
    "dim1_scd2" ->
      """SELECT o_custkey AS custkey, o_orderkey AS ok,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  o_totalprice AS price,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders""".stripMargin
  )
}
