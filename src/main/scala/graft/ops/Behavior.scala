package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Behavioral event analytics over the (user, ts) event stream: ordered
  * funnels and cohort retention — the query family the reference's
  * (entity, time) storage layout exists to serve but provides no operators
  * for (SURVEY.md §2.2; its only query is a raw key-range scan).
  *
  * Scale shape: both operators reduce the event stream to per-user
  * aggregates FIRST (one shuffle on user_id, partial aggregation absorbs
  * the event volume map-side), then reason over the tiny per-user rows —
  * never a self-join of raw events against raw events.
  */
object Behavior {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e7_attribution_join" -> { (s, d) =>
      // The stream-stream attribution join's plan builder run BATCH over
      // the events table (StreamJoin.attributedPurchases — one code
      // path for both execution modes, the d13 discipline): every
      // purchase pairs with the same user's clicks in the preceding
      // 300 s. The DuckDB oracle replays the inclusive interval
      // predicate on epoch micros, so the streaming operator's join
      // semantics is hash-checked even though a live stream can't be.
      // Money rides as integer cents; ids/timestamps are exact longs.
      import s.implicits._
      import graft.streaming.StreamJoin
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_us"),
          col("event_id").cast("string").as("page"))
        .as[StreamJoin.Click]
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("buy_us"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[StreamJoin.Buy]
      StreamJoin.attributedPurchases(clicks, buys)
        .select(col("user_id"), unix_micros(col("buy_ts")).as("buy_us"),
          col("cents"), unix_micros(col("click_ts")).as("click_us"),
          col("page").cast("long").as("click_id"))
    },
    "seq1_user_sequences" -> { (s, d) =>
      // Training-SEQUENCE construction for a behavioral/next-action model:
      // per user, the time-ordered action stream truncated to the model's
      // context length — the events-table analogue of pack1's token
      // packing, and the preprocessing a sequential recommender trains
      // on. Plan shape: the rank window and the grouped collect share the
      // user hash partitioning, so ONE user-keyed shuffle feeds both
      // (Spark reuses the window's partitioning for the aggregate);
      // per-group state is capped at seqCap rows by the rank filter
      // BEFORE the collect — a hot user buffers 64 structs, never their
      // whole history. n_events counts the full (untruncated) history via
      // the window's count for the ratio a curriculum would cut on;
      // array_sort on (ts, id, type) structs makes the array order total.
      // The sequence ships as a '|'-joined STRING, not array<string>:
      // the certification comparator sorts result columns pandas-side and
      // cannot sort array cells (r14's seq1 failed exactly there), and a
      // downstream trainer tokenizes a delimited action string just as
      // well. Event types are closed-vocabulary identifiers, so '|' can
      // never appear inside an element.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_events", count(lit(1)).over(wAll))
        .filter(col("rn") <= seqCap)
        .groupBy(col("user_id"))
        .agg(
          max(col("n_events")).as("n_events"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts_us"), col("event_id"),
                col("event_type")))),
              x => x.getField("event_type")), "|").as("seq"))
    },
    "sft1_conversation_build" -> { (s, d) =>
      // SFT CONVERSATION assembly — the chat-data preprocessing step of an
      // instruction-tuning pipeline: sessionize each user's event stream
      // by a 30-minute inactivity gap, render each event as a role-tagged
      // turn ("type:payload"), flatten the session into one '|'-joined
      // transcript (the seq1 scalar discipline — array cells are
      // comparator-unsortable), and keep conversations with 2..sftTurnCap
      // turns (single-turn and overlong sessions are dropped, the
      // published SFT filter shape).
      //
      // Plan shape: ONE user-keyed shuffle feeds everything — the lag
      // window (gap detection), the running-sum session id, the
      // (user, sess) turn count, and the grouped collect all share the
      // user hash partitioning. The n_turns <= cap filter runs BEFORE the
      // collect, so per-group collect state is bounded at sftTurnCap
      // structs even for a gap-free hot user; n_turns is the window's
      // count, so the kept value is the exact session length.
      val gapUs = 1800L * 1000000
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          concat(col("event_type"), lit(":"),
            coalesce(get_json_object(col("props"), "$.k").cast("int").cast("string"),
              lit(""))).as("turn"))
        .withColumn("new_s",
          when(coalesce(col("ts_us") - lag(col("ts_us"), 1).over(w),
            lit(gapUs + 1)) > gapUs, 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_s")).over(wRun))
        .withColumn("n_turns", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id"), col("sess"))))
        .filter(col("n_turns").between(2, sftTurnCap))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("ts_us")).as("sess_start_us"),
          max(col("n_turns")).as("n_turns"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts_us"), col("event_id"),
                col("turn")))),
              x => x.getField("turn")), "|").as("convo"))
        .select(col("user_id"), col("sess_start_us"), col("n_turns"), col("convo"))
    },
    "e1_funnel" -> { (s, d) =>
      // Ordered funnel view → click → purchase: a user converts at step k
      // if the earliest timestamps respect the order. min-per-type is one
      // conditional aggregation; the step logic is pure projection after.
      val e = Tables.events(s, d)
      val perUser = e.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts_us"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("t_purchase"))
      val s1 = col("t_view").isNotNull
      val s2 = s1 && col("t_click").isNotNull && col("t_click") > col("t_view")
      val s3 = s2 && col("t_purchase").isNotNull && col("t_purchase") > col("t_click")
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(s1.cast("long")).as("reached_view"),
        sum(s2.cast("long")).as("reached_click"),
        sum(s3.cast("long")).as("converted"))
    },
    "e4_market_basket" -> { (s, d) =>
      // Item co-occurrence (market-basket / item2item): pairs of distinct
      // items the same user clicked, counted across users — the
      // co-engagement signal behind "users who X also Y". Items come from
      // the event payload (props.k), so this also exercises JSON
      // extraction in an analytic join.
      //
      // Scale shape: reduce to the DISTINCT (user, item) grain first (one
      // shuffle absorbs event volume), then pair WITHIN user. Per-user
      // pair fan-out is quadratic in that user's distinct items, so a
      // heavy-user cap (> 64 distinct items drops the user, loudly
      // countable via the support floor's complement) bounds the
      // explosion the same way d2 caps hot shingles — exact and
      // engine-replayable, unlike sampling. Support floor 5 keeps the
      // result head-sized; deterministic (count DESC, pair) top-20.
      val items = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("item"))
        .filter(col("item").isNotNull)
        .distinct()
      val eligible = items
        .withColumn("n_items", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
        .filter(col("n_items") <= 64)
      eligible.alias("a").join(eligible.alias("b"),
          col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("n_users"))
        .filter(col("n_users") >= 5)
        .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
        .limit(20)
    },
    "e3_attribution" -> { (s, d) =>
      // Last-touch conversion attribution: a purchase attributes to the
      // user's clicks within the preceding 24 h (the conversion-window
      // semantics every ads pipeline computes; the as-of-join family's
      // business form). Monetary sums ride as exact integer CENTS —
      // summing raw doubles would make the result depend on engine
      // aggregation order.
      //
      // Scale shape: the purchase–click join is per-user AND window-
      // bounded, so candidate pairs are (per-user purchase density ×
      // window clicks), never events²; both aggregates shuffle on
      // (user, purchase) then user.
      val win = 24L * 3600 * 1000000 // 24 h in micros
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"), col("ts_us").as("pts"),
          round(col("value") * 100).cast("long").as("cents"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("cid"),
          col("ts_us").as("cts"))
      p.join(c, col("user_id") === col("cu") &&
          col("cts") <= col("pts") && col("cts") > col("pts") - win, "left")
        .groupBy(col("user_id"), col("pid"), col("cents"))
        .agg(count(col("cid")).as("n_clicks"))
        .groupBy(col("user_id")).agg(
          count(lit(1)).as("n_purchases"),
          sum((col("n_clicks") > 0).cast("long")).as("n_attributed"),
          sum(when(col("n_clicks") > 0, col("cents")).otherwise(0L)).as("attributed_cents"),
          sum(col("cents")).as("total_cents"))
    },
    "e2_retention" -> { (s, d) =>
      // Cohort retention: users cohorted by first-activity day; retained(n)
      // = active on cohort_day + n. Day grain from the distinct
      // (user, day) activity set — events collapse map-side before any
      // join; the cohort join is broadcast (|users| rows).
      val days = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts_t")).as("day"))
        .distinct()
      val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      days.join(broadcast(cohort), Seq("user_id"))
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_n"))
        .filter(col("day_n").isin(0, 1, 7))
        .groupBy(col("cohort_day").cast("date").as("cohort_day"))
        .agg(
          countDistinct(when(col("day_n") === 0, col("user_id"))).as("cohort_size"),
          countDistinct(when(col("day_n") === 1, col("user_id"))).as("d1_retained"),
          countDistinct(when(col("day_n") === 7, col("user_id"))).as("d7_retained"))
    },
    "e6_rfm_segments" -> { (s, d) =>
      // RFM segmentation — the classic behavioral scoring: per user,
      // Recency (last purchase timestamp), Frequency (purchase count),
      // Monetary (integer cents, so no double-sum-order dependence), each
      // cut into quintiles by ntile over a TOTALLY ordered ranking
      // (metric, then user_id — ties would otherwise make ntile
      // engine-dependent). One user-keyed aggregate, three user-count
      // windows; segment = 100·r + 10·f + m, the standard RFM cell code.
      // SCALE SHAPE: the three ntile windows are GLOBAL (no partitionBy)
      // — exact quintiles are inherently a total order, so the per-user
      // aggregate (already events-collapsed, |users| rows) funnels
      // through one task per window. That is the deliberate exact
      // contract at this grain; the 100 TB tier swaps ntile for
      // approx_percentile cut points (broadcast 4-row boundary table,
      // map-side bucketing) when |users| itself outgrows a task.
      val per = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("ts_us")).as("last_us"),
          count(lit(1)).as("n_purchases"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      def quintile(metric: String) = ntile(5).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col(metric), col("user_id")))
      per
        .withColumn("r_score", quintile("last_us"))
        .withColumn("f_score", quintile("n_purchases"))
        .withColumn("m_score", quintile("cents"))
        .select(col("user_id"), col("n_purchases"), col("cents"),
          col("r_score"), col("f_score"), col("m_score"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .as("segment"))
    },
    "e5_transition_matrix" -> { (s, d) =>
      // First-order Markov transition matrix over event types — the
      // preprocessing a next-event model trains on, and the summary a
      // behavioral drift monitor compares release-over-release. lead()
      // inside the (user, time) window derives consecutive pairs with ONE
      // user-keyed shuffle (no self-join of raw events); transition
      // probabilities are integer ppm (count·1e6 DIV row-total), so the
      // matrix is bit-identical across engines.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("event_type"))
        .agg(sum(col("n")).as("row_total"))
      pairs.join(broadcast(totals), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          expr("n * 1000000 DIV row_total").as("p_ppm"))
    }
  )

  val seqCap = 64 // model context length in actions — the truncation grain
  val sftTurnCap = 64 // max turns per kept conversation (sft1's drop filter)

  val oracleSql: Map[String, String] = Map(
    // e7: the interval predicate replayed on epoch micros — BETWEEN is
    // inclusive on both ends, exactly the builder's >= / <= pair.
    "e7_attribution_join" ->
      """SELECT b.user_id, epoch_us(b.ts) AS buy_us,
        |  CAST(round(b.value * 100) AS BIGINT) AS cents,
        |  epoch_us(c.ts) AS click_us, c.event_id AS click_id
        |FROM events b JOIN events c ON c.user_id = b.user_id
        |  AND c.event_type = 'click'
        |  AND epoch_us(c.ts) BETWEEN epoch_us(b.ts) - 300000000
        |                         AND epoch_us(b.ts)
        |WHERE b.event_type = 'purchase'""".stripMargin,
    // seq1: list(... ORDER BY ts, id) with a 1-based slice replays the
    // window-rank truncation exactly; event_id uniqueness makes the
    // order total on both engines, and array_to_string serializes it to
    // the same '|'-joined scalar the Spark side emits (array-typed
    // columns are unsortable in the pandas comparator).
    "seq1_user_sequences" ->
      s"""SELECT user_id,
         |  count(*) AS n_events,
         |  array_to_string(
         |    (list(event_type ORDER BY epoch_us(ts), event_id))[1:$seqCap],
         |    '|') AS seq
         |FROM events GROUP BY user_id""".stripMargin,
    // sft1: the identical sessionize/render/flatten geometry — the same
    // coalesce(gap+1) lag idiom, a running-sum session id, HAVING-style
    // turn-count filter, and list(ORDER BY us, event_id) serialized with
    // '|' (event_id uniqueness makes the order total on both engines).
    "sft1_conversation_build" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    event_type || ':' ||
         |      coalesce(CAST(CAST(json_extract(props, '$$.k') AS INT) AS VARCHAR), '')
         |      AS turn
         |  FROM events),
         |g AS (
         |  SELECT *, CASE WHEN coalesce(
         |      us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
         |      1800000001) > 1800000000 THEN 1 ELSE 0 END AS new_s
         |  FROM e),
         |sx AS (
         |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                             ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM g)
         |SELECT user_id, min(us) AS sess_start_us,
         |  CAST(count(*) AS BIGINT) AS n_turns,
         |  array_to_string(list(turn ORDER BY us, event_id), '|') AS convo
         |FROM sx GROUP BY user_id, sess
         |HAVING count(*) BETWEEN 2 AND $sftTurnCap""".stripMargin,
    "e1_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
        |                 AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
        |  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
        |                 AND t_click > t_view AND t_purchase IS NOT NULL
        |                 AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |FROM per_user""".stripMargin,
    "e4_market_basket" ->
      """WITH items AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract(props, '$.k') AS INT) AS item
        |  FROM events
        |  WHERE event_type = 'click'
        |    AND json_extract(props, '$.k') IS NOT NULL),
        |eligible AS (
        |  SELECT user_id, item,
        |    count(*) OVER (PARTITION BY user_id) AS n_items
        |  FROM items),
        |capped AS (SELECT user_id, item FROM eligible WHERE n_items <= 64)
        |SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
        |FROM capped a JOIN capped b
        |  ON a.user_id = b.user_id AND a.item < b.item
        |GROUP BY 1, 2
        |HAVING count(*) >= 5
        |ORDER BY n_users DESC, item_a, item_b
        |LIMIT 20""".stripMargin,
    "e3_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS pid, epoch_us(ts) AS pts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS cu, event_id AS cid, epoch_us(ts) AS cts
        |  FROM events WHERE event_type = 'click'),
        |per_purchase AS (
        |  SELECT p.user_id, p.pid, p.cents, count(c.cid) AS n_clicks
        |  FROM p LEFT JOIN c ON p.user_id = c.cu
        |    AND c.cts <= p.pts AND c.cts > p.pts - 86400000000
        |  GROUP BY p.user_id, p.pid, p.cents)
        |SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CASE WHEN n_clicks > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
        |  CAST(sum(CASE WHEN n_clicks > 0 THEN cents ELSE 0 END) AS BIGINT) AS attributed_cents,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM per_purchase GROUP BY user_id""".stripMargin,
    "e2_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
        |SELECT CAST(cohort_day AS DATE) AS cohort_day,
        |  count(DISTINCT CASE WHEN datediff('day', cohort_day, day) = 0 THEN user_id END) AS cohort_size,
        |  count(DISTINCT CASE WHEN datediff('day', cohort_day, day) = 1 THEN user_id END) AS d1_retained,
        |  count(DISTINCT CASE WHEN datediff('day', cohort_day, day) = 7 THEN user_id END) AS d7_retained
        |FROM days JOIN cohort USING (user_id)
        |WHERE datediff('day', cohort_day, day) IN (0, 1, 7)
        |GROUP BY 1""".stripMargin,
    "e6_rfm_segments" ->
      """WITH per AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |    CAST(count(*) AS BIGINT) AS n_purchases,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |sc AS (
        |  SELECT user_id, n_purchases, cents,
        |    ntile(5) OVER (ORDER BY last_us, user_id) AS r_score,
        |    ntile(5) OVER (ORDER BY n_purchases, user_id) AS f_score,
        |    ntile(5) OVER (ORDER BY cents, user_id) AS m_score
        |  FROM per)
        |SELECT user_id, n_purchases, cents, r_score, f_score, m_score,
        |  r_score * 100 + f_score * 10 + m_score AS segment
        |FROM sc""".stripMargin,
    "e5_transition_matrix" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events),
        |pairs AS (
        |  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM pairs GROUP BY 1)
        |SELECT p.event_type, p.next_type, p.n,
        |  p.n * 1000000 // t.row_total AS p_ppm
        |FROM pairs p JOIN tot t USING (event_type)""".stripMargin
  )
}
