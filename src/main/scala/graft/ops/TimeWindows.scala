package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Event-time windowed aggregation: tumbling, sliding, session windows.
  * The reference flushes by processing time only (SURVEY.md §2.2 — no
  * event-time semantics); these are the Structured Streaming window
  * primitives, run here in batch mode (identical semantics, same
  * `window()`/`session_window()` operators as the streaming path in
  * graft.streaming).
  *
  * Scale: each is a single shuffle on (window, key); sliding windows fan
  * each row out `size/slide`× before the shuffle — keep the ratio small.
  */
object TimeWindows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts1_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts_t"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").cast("date").as("day"), col("event_type"), col("n"), col("sum_value"))
    },
    "ts2_sliding_window" -> { (s, d) =>
      // 2-day window sliding by 1 day: every event lands in exactly 2 windows.
      Tables.events(s, d)
        .groupBy(window(col("ts_t"), "2 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
        .select(col("w.start").cast("date").as("win_start"), col("n"), col("avg_value"))
    },
    "ts3_session_window" -> { (s, d) =>
      // Per-user sessions closed by a 30-minute silence gap.
      Tables.events(s, d)
        .groupBy(session_window(col("ts_t"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n_events"), col("session_value"))
    },
    "ts4_gap_fill" -> { (s, d) =>
      // Time-series regularization: a dense per-user daily grid over each
      // user's active span, missing days forward-filled from the last
      // observed value. Grid generation is sequence()+explode (no join
      // against a calendar table), the fill is one per-user window pass —
      // at scale the grid is |users|×span rows and the single shuffle is
      // on user_id, so skew follows user activity, not data volume.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts_t")).as("day"))
        .agg(round(sum(col("value")), 2).as("day_value"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day").cast("date").as("day"),
          last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"),
          col("day_value").isNull.as("gap"))
    },
    "ts7_interpolate" -> { (s, d) =>
      // ts4's dense grid with LINEAR interpolation instead of forward
      // fill — the regularization a numeric sensor/metric series wants
      // (ffill is right for state, interpolation for rates). Every gap
      // day has both neighbors by construction (the grid spans [first,
      // last] observed day per user), so interp = prev + (next − prev) ·
      // dd/dt with the identical operation ORDER on both engines: the
      // inputs are round(2) doubles and exact integer day counts, so the
      // unrounded result is bit-equal (the ts5 stance — round only when
      // the arithmetic can't be made identical). Same scale shape as
      // ts4: sequence+explode grid, one user-keyed window pass.
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts_t")).as("day"))
        .agg(round(sum(col("value")), 2).as("day_value"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      val wP = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wN = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(0, Window.unboundedFollowing)
      val obsDay = when(col("day_value").isNotNull, col("day"))
      val prevV = last(col("day_value"), ignoreNulls = true).over(wP)
      val prevD = last(obsDay, ignoreNulls = true).over(wP)
      val nextV = first(col("day_value"), ignoreNulls = true).over(wN)
      val nextD = first(obsDay, ignoreNulls = true).over(wN)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day").cast("date").as("day"),
          col("day_value").isNull.as("interpolated"),
          when(col("day_value").isNotNull, col("day_value"))
            .otherwise(prevV + (nextV - prevV) *
              (datediff(col("day"), prevD).cast("double") /
                datediff(nextD, prevD).cast("double")))
            .as("day_value"))
    },
    "ts6_ohlc_bars" -> { (s, d) =>
      // OHLC bar resampling (the finance/telemetry downsample): per
      // (user, day), the first/last values by event time plus the high/
      // low and tick count. open/close via min_by/max_by on a composite
      // (ts, event_id) key widened to DECIMAL(38,0) — the 10^12
      // multiplier provably dominates any event_id (ids are row-count-
      // sized; 10^12 rows is past any sf here), so event-time order is
      // preserved exactly and ties break by id, with ~10^26 µs of
      // headroom before the decimal saturates (the earlier BIGINT key
      // overflowed ~3 years past the epoch base and let a large id
      // outrank an earlier timestamp once ids crossed 10^5). DuckDB
      // replays the same integer as a HUGEINT — both engines compare the
      // identical exact value. One shuffle on (user, day); values are
      // picked, never arithmetically combined, so doubles stay exact.
      val keyBase = 1704067200000000L // 2024-01-01T00:00:00Z, epoch micros
      val key = (col("ts_us") - keyBase).cast("decimal(38,0)") *
        lit(1000000000000L) + col("event_id")
      Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts_t")).as("day"))
        .agg(min_by(col("value"), key).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), key).as("close"),
          count(lit(1)).as("n_ticks"))
    },
    "ts5_ewma" -> { (s, d) =>
      // Exponentially weighted moving average per user (α = 0.5, seeded
      // with the first observation) — the classic sequential recurrence
      // windows can't express (each output needs the PREVIOUS output).
      // Implemented with the SECONDARY-SORT pattern: hash-repartition by
      // user, sort (user, ts, event_id) within partitions, then one
      // sequential pass carrying O(1) state per user — every user's
      // stream is contiguous and ordered inside its partition, so the
      // pass is a single corpus scan with no window buffer. α = 0.5
      // keeps every multiply exact-dyadic, so the DuckDB recursive-CTE
      // oracle reproduces the values bit-for-bit — emitted UNROUNDED
      // (round() itself diverges across engines near decimal ties;
      // identical doubles don't).
      import s.implicits._
      Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
        .repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
        .mapPartitions { it =>
          var curUser = Long.MinValue
          var y = 0.0
          it.map { case (user, _, eventId, x) =>
            y = if (user != curUser) x else 0.5 * x + 0.5 * y
            curUser = user
            (user, eventId, y)
          }
        }
        .toDF("user_id", "event_id", "ewma")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "ts6_ohlc_bars" ->
      """SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  arg_min(value, CAST(epoch_us(ts) - 1704067200000000 AS HUGEINT)
        |    * 1000000000000 + event_id) AS open,
        |  max(value) AS high, min(value) AS low,
        |  arg_max(value, CAST(epoch_us(ts) - 1704067200000000 AS HUGEINT)
        |    * 1000000000000 + event_id) AS close,
        |  count(*) AS n_ticks
        |FROM events GROUP BY 1, 2""".stripMargin,
    // ts5: the same recurrence as a recursive CTE stepping row_number
    // r → r+1 per user — identical IEEE ops (0.5·x + 0.5·y) in the same
    // order, so values match exactly.
    "ts5_ewma" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r
        |  FROM events),
        |ew AS (
        |  WITH RECURSIVE rec(user_id, event_id, r, y) AS (
        |    SELECT user_id, event_id, r, value AS y FROM ev WHERE r = 1
        |    UNION ALL
        |    SELECT ev.user_id, ev.event_id, ev.r, 0.5 * ev.value + 0.5 * rec.y
        |    FROM rec JOIN ev ON ev.user_id = rec.user_id AND ev.r = rec.r + 1
        |  ) SELECT * FROM rec)
        |SELECT user_id, event_id, y AS ewma FROM ew""".stripMargin,
    "ts1_tumbling_window" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ts2_sliding_window" ->
      """SELECT win_start, count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM (
        |  SELECT CAST(unnest([date_trunc('day', ts),
        |                      date_trunc('day', ts) - INTERVAL 1 DAY]) AS DATE) AS win_start,
        |         value
        |  FROM events)
        |GROUP BY win_start""".stripMargin,
    "ts3_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id, min(ts) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM sessions GROUP BY user_id, session_id""".stripMargin,
    "ts4_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    round(sum(value), 2) AS day_value
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT user_id, min(day) AS lo, max(day) AS hi
        |        FROM daily GROUP BY user_id))
        |SELECT g.user_id, CAST(g.day AS DATE) AS day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
        |  d.day_value IS NULL AS gap
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,
    // ts7: the same grid with prev/next observed neighbors and the
    // identical-order linear interpolation arithmetic.
    "ts7_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    round(sum(value), 2) AS day_value
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
        |  FROM (SELECT user_id, min(day) AS lo, max(day) AS hi
        |        FROM daily GROUP BY user_id)),
        |g AS (
        |  SELECT grid.user_id, grid.day, d.day_value
        |  FROM grid LEFT JOIN daily d
        |    ON grid.user_id = d.user_id AND grid.day = d.day),
        |f AS (
        |  SELECT user_id, day, day_value,
        |    last_value(day_value IGNORE NULLS) OVER wp AS prev_v,
        |    last_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wp AS prev_d,
        |    first_value(day_value IGNORE NULLS) OVER wn AS next_v,
        |    first_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wn AS next_d
        |  FROM g
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, CAST(day AS DATE) AS day,
        |  day_value IS NULL AS interpolated,
        |  CASE WHEN day_value IS NOT NULL THEN day_value
        |       ELSE prev_v + (next_v - prev_v) *
        |         (CAST(datediff('day', prev_d, day) AS DOUBLE) /
        |          CAST(datediff('day', prev_d, next_d) AS DOUBLE)) END AS day_value
        |FROM f""".stripMargin
  )
}
