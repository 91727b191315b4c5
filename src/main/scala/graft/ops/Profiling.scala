package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Table profiling and data-quality expectation checks — the ANALYZE /
  * expectations surface of an engine (absent from the reference, which
  * stores rows without ever inspecting them; SURVEY.md §2.2).
  *
  * Scale shape: profiling is ONE full scan computing every per-column
  * metric as a partial+final aggregate (the n_distinct terms are the only
  * key-carrying shuffles); expectations are conditional aggregates over the
  * same single pass plus one anti-join for referential integrity. Neither
  * collects row-level data to the driver.
  */
object Profiling {

  private val profCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prof1_column_stats" -> { (s, d) =>
      // Long-format numeric column profile: min / max / null count /
      // exact distinct count per column, computed in one aggregation pass
      // and exploded to (column, metrics) rows.
      val aggs = profCols.flatMap { c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
          countDistinct(col(c)).as(s"nd_$c"))
      }
      val one = Tables.table(s, d, "lineitem").agg(aggs.head, aggs.tail: _*)
      val entries = profCols.map { c =>
        struct(lit(c).as("column"), col(s"min_$c").as("min_v"),
          col(s"max_$c").as("max_v"), col(s"nulls_$c").as("n_nulls"),
          col(s"nd_$c").as("n_distinct"))
      }
      one.select(explode(array(entries: _*)).as("p"))
        .select(col("p.column"), col("p.min_v"), col("p.max_v"),
          col("p.n_nulls"), col("p.n_distinct"))
    },
    "hist1_price_histogram" -> { (s, d) =>
      // Equi-width histogram of l_extendedprice in 10 buckets between the
      // table min/max — the numeric-distribution half of profiling
      // (prof1 is the scalar half). The bounds ride a broadcast one-row
      // aggregate (no separate driver action), bucketing is a pure
      // double-arithmetic projection, so the whole histogram is one scan
      // plus a 10-row shuffle. All arithmetic in DOUBLE with the same
      // expression shape as the oracle so bucket edges bit-match.
      val li = Tables.table(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("x"))
      val bounds = li.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      // hi == lo (single-valued column) would make the width 0/0 = NaN;
      // Spark's NaN-to-long cast and DuckDB's CAST(floor(NaN)) disagree, so
      // the degenerate case is pinned to bucket 0 on BOTH sides.
      li.crossJoin(broadcast(bounds))
        .select(when(col("hi") === col("lo"), 0L)
          .otherwise(least(lit(9L),
            floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / 10.0))
              .cast("long"))).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
    },
    "out1_zscore_outliers" -> { (s, d) =>
      // Z-score outlier profile: per-group mean/stddev ride a broadcast
      // group-level aggregate back onto the rows (one scan + one tiny
      // shuffle), and each group reports its |z| > 3 population — the
      // anomaly-count half of data-quality monitoring. The 3.0 cut sits
      // far from any data knife-edge, so the count is engine-stable even
      // though stddev merge order differs across engines.
      val li = Tables.table(s, d, "lineitem")
        .select(col("l_linestatus"), col("l_extendedprice").cast("double").as("x"))
      val stats = li.groupBy(col("l_linestatus"))
        .agg(avg(col("x")).as("mu"), stddev_samp(col("x")).as("sd"))
      li.join(broadcast(stats), Seq("l_linestatus"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(abs(col("x") - col("mu")) > lit(3.0) * col("sd"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_pct",
          round(col("n_outliers").cast("double") / col("n_rows"), 6))
    },
    "out2_mad_outliers" -> { (s, d) =>
      // Robust (MAD-based) outlier profile — the median/MAD counterpart
      // of out1's mean/stddev z-score: immune to the outliers it hunts
      // (one wild value shifts a mean, not a median). Modified z
      // (Iglewicz–Hoaglin): 0.6745·(x − med)/MAD, flag |z| > 3.5.
      // Shape: two median aggregates over the same scan grain with the
      // group-level results broadcast back — groups are nations (25), so
      // the expensive order-statistic state stays bounded per group; at
      // unbounded cardinality swap median → approx_percentile like a7.
      val c = Tables.table(s, d, "customer")
        .select(col("c_nationkey").as("nk"), col("c_acctbal").cast("double").as("x"))
      val med = c.groupBy(col("nk")).agg(median(col("x")).as("med"))
      val dev = c.join(broadcast(med), Seq("nk"))
      val mad = dev.select(col("nk"), abs(col("x") - col("med")).as("adev"))
        .groupBy(col("nk")).agg(median(col("adev")).as("mad"))
      dev.join(broadcast(mad), Seq("nk"))
        .groupBy(col("nk"))
        .agg(
          // UNROUNDED: the median/MAD doubles are bit-identical across
          // engines (same multiset, same two-middle interpolation), and
          // round(·, 2) itself diverges on decimal ties (3463.445 case)
          // — the verify-skill rule: round only when the raw arithmetic
          // can't be made identical.
          first(col("med")).as("med_bal"),
          first(col("mad")).as("mad_bal"),
          sum(when(col("mad") > 0 &&
              abs(lit(0.6745) * (col("x") - col("med")) / col("mad")) > lit(3.5), 1L)
            .otherwise(0L)).as("n_outliers"))
    },
    "dq2_k_anonymity" -> { (s, d) =>
      // k-anonymity audit (privacy governance): group rows by their
      // quasi-identifier tuple (nation, market segment — the columns an
      // attacker could link on); equivalence classes smaller than k are
      // re-identification risks. Emits the per-k risk profile a privacy
      // review actually reads: class count, risky classes, and rows at
      // risk, for k in {2, 5, 10}. One groupBy over the table, then
      // class-sized arithmetic — the k sweep costs nothing extra.
      val classes = Tables.table(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      classes.select(explode(array(lit(2), lit(5), lit(10))).as("k"), col("n"))
        .groupBy(col("k")).agg(
          count(lit(1)).as("n_classes"),
          sum(when(col("n") < col("k"), 1L).otherwise(0L)).as("risky_classes"),
          sum(when(col("n") < col("k"), col("n")).otherwise(0L)).as("rows_at_risk"))
    },
    "dq1_expectations" -> { (s, d) =>
      // Expectation suite: each row is (check, violations). Single-table
      // checks fold into one conditional-aggregate pass over lineitem; the
      // referential check is a broadcast anti join (orders → customer).
      val li = Tables.table(s, d, "lineitem").agg(
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_key"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("nonpos_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L))
          .as("bad_discount"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("null_shipdate"))
      val orphans = Tables.table(s, d, "orders")
        .join(broadcast(Tables.table(s, d, "customer")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v"))
        .select(lit("orphan_orders").as("check"), col("v").as("violations"))
      li.select(explode(array(
          struct(lit("null_key").as("check"), col("null_key").as("violations")),
          struct(lit("nonpos_qty").as("check"), col("nonpos_qty").as("violations")),
          struct(lit("bad_discount").as("check"), col("bad_discount").as("violations")),
          struct(lit("null_shipdate").as("check"), col("null_shipdate").as("violations"))))
          .as("e"))
        .select(col("e.check"), col("e.violations"))
        .union(orphans)
    },
    "prof2_dataset_card" -> { (s, d) =>
      // The dataset-card stat block every published corpus ships: doc /
      // token / source / language counts and the token-length envelope,
      // in ONE aggregation pass over the corpus (countDistinct terms are
      // the only key-carrying shuffles; everything else folds map-side).
      // avg rides round(2) so summation-order ulps can't flip the hash.
      val n = size(split(col("text"), " ")).cast("long")
      Tables.table(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"), n.as("n_tokens"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          round(avg(col("n_tokens")), 2).as("avg_tokens"))
    },
    "drift1_dist_shift" -> { (s, d) =>
      // Distribution-drift monitor between the two TIME HALVES of the
      // event stream (split at the midpoint of [min ts, max ts] — integer
      // epoch-micros arithmetic, engine-stable): per event_type bucket
      // and per value decile, the reference-vs-current share in ppm and
      // the absolute shift. Sum(shift_ppm)/2 per dim is the total
      // variation distance — the drift statistic monitoring systems
      // alarm on — kept per-bucket here so the drifted buckets are
      // attributable. All shares are integer DIV ppm: no doubles cross
      // the engine boundary except the decile edges, which reuse hist1's
      // bit-matched expression shape. Scale shape: TWO scans — the
      // bounds aggregate (broadcast one-row, hist1's pattern) and one
      // fan-out pass emitting both (dim, bucket) rows per event from a
      // single projection (an exploded 2-struct array, NOT a unionAll of
      // two branches, which would re-scan the source per branch); the
      // shuffle carries ~15 (dim, bucket) partial counts regardless of
      // corpus size.
      val ev = Tables.events(s, d).select(col("event_type"), col("value"), col("ts_us"))
      val bounds = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"),
        min(col("value")).as("vlo"), max(col("value")).as("vhi"))
      val vbucket = when(col("vhi") === col("vlo"), 0L)
        .otherwise(least(lit(9L),
          floor((col("value") - col("vlo")) / ((col("vhi") - col("vlo")) / 10.0))
            .cast("long")))
      val g = ev.crossJoin(broadcast(bounds))
        .select((col("ts_us") * 2 <= col("lo") + col("hi")).as("is_ref"),
          explode(array(
            struct(lit("event_type").as("dim"), col("event_type").as("bucket")),
            struct(lit("value_decile").as("dim"),
              vbucket.cast("string").as("bucket")))).as("db"))
        .select(col("db.dim").as("dim"), col("db.bucket").as("bucket"), col("is_ref"))
        .groupBy(col("dim"), col("bucket"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("cur_cnt"))
      val totals = g.groupBy(col("dim"))
        .agg(sum(col("ref_cnt")).as("ref_n"), sum(col("cur_cnt")).as("cur_n"))
      g.join(broadcast(totals), "dim")
        .select(col("dim"), col("bucket"), col("ref_cnt"), col("cur_cnt"),
          expr("ref_cnt * 1000000 DIV ref_n").as("ref_ppm"),
          expr("cur_cnt * 1000000 DIV cur_n").as("cur_ppm"),
          abs(expr("ref_cnt * 1000000 DIV ref_n") -
            expr("cur_cnt * 1000000 DIV cur_n")).as("shift_ppm"))
    }
  )

  private val profOracle = profCols.map { c =>
    s"""SELECT '$c' AS "column", min($c) AS min_v, max($c) AS max_v,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct
       |FROM lineitem""".stripMargin
  }.mkString("\nUNION ALL\n")

  val oracleSql: Map[String, String] = Map(
    "prof1_column_stats" -> profOracle,
    "dq2_k_anonymity" ->
      """WITH classes AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT k.k, count(*) AS n_classes,
        |  CAST(sum(CASE WHEN n < k.k THEN 1 ELSE 0 END) AS BIGINT) AS risky_classes,
        |  CAST(sum(CASE WHEN n < k.k THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk
        |FROM classes, (SELECT unnest([2, 5, 10]) AS k) k
        |GROUP BY k.k""".stripMargin,
    "hist1_price_histogram" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
        |b AS (SELECT min(x) AS lo, max(x) AS hi FROM v)
        |SELECT CASE WHEN hi = lo THEN 0
        |    ELSE least(9, CAST(floor((x - lo) / ((hi - lo) / 10.0)) AS BIGINT))
        |    END AS bucket,
        |  count(*) AS n
        |FROM v, b
        |GROUP BY 1""".stripMargin,
    "out1_zscore_outliers" ->
      """WITH v AS (SELECT l_linestatus, CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem),
        |st AS (SELECT l_linestatus, avg(x) AS mu, stddev_samp(x) AS sd
        |  FROM v GROUP BY l_linestatus)
        |SELECT v.l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN abs(x - mu) > 3.0 * sd THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(CAST(sum(CASE WHEN abs(x - mu) > 3.0 * sd THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS outlier_pct
        |FROM v JOIN st USING (l_linestatus)
        |GROUP BY v.l_linestatus""".stripMargin,
    // Same expression order as the Spark side (0.6745·(x−med)/mad) so the
    // modified-z doubles are bit-identical; med/mad emitted UNROUNDED
    // (bit-identical across engines; round(·,2) diverges on .445 ties).
    "out2_mad_outliers" ->
      """WITH v AS (SELECT c_nationkey AS nk, CAST(c_acctbal AS DOUBLE) AS x
        |  FROM customer),
        |m AS (SELECT nk, median(x) AS med FROM v GROUP BY nk),
        |md AS (SELECT nk, median(abs(x - med)) AS mad
        |  FROM v JOIN m USING (nk) GROUP BY nk)
        |SELECT nk,
        |  any_value(med) AS med_bal,
        |  any_value(mad) AS mad_bal,
        |  CAST(sum(CASE WHEN mad > 0 AND abs(0.6745 * (x - med) / mad) > 3.5
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM v JOIN m USING (nk) JOIN md USING (nk)
        |GROUP BY nk""".stripMargin,
    "dq1_expectations" ->
      """SELECT 'null_key' AS "check",
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'nonpos_qty',
        |  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'bad_discount',
        |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'null_shipdate',
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
        |UNION ALL
        |SELECT 'orphan_orders', count(*) FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""".stripMargin,
    "prof2_dataset_card" ->
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT lang) AS n_langs,
        |  min(n_tokens) AS min_tokens,
        |  max(n_tokens) AS max_tokens,
        |  round(avg(n_tokens), 2) AS avg_tokens
        |FROM t""".stripMargin,
    "drift1_dist_shift" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
        |b AS (SELECT min(us) AS lo, max(us) AS hi,
        |             min(value) AS vlo, max(value) AS vhi FROM e),
        |base AS (
        |  SELECT (2 * us <= lo + hi) AS is_ref, event_type,
        |    CASE WHEN vhi = vlo THEN 0
        |         ELSE least(9, CAST(floor((value - vlo) / ((vhi - vlo) / 10.0))
        |                          AS BIGINT)) END AS vbucket
        |  FROM e CROSS JOIN b),
        |u AS (
        |  SELECT 'event_type' AS dim, event_type AS bucket, is_ref FROM base
        |  UNION ALL
        |  SELECT 'value_decile', CAST(vbucket AS VARCHAR), is_ref FROM base),
        |g AS (SELECT dim, bucket,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_cnt,
        |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cur_cnt
        |  FROM u GROUP BY 1, 2),
        |t AS (SELECT dim, CAST(sum(ref_cnt) AS BIGINT) AS ref_n,
        |             CAST(sum(cur_cnt) AS BIGINT) AS cur_n FROM g GROUP BY 1)
        |SELECT g.dim, g.bucket, ref_cnt, cur_cnt,
        |  ref_cnt * 1000000 // ref_n AS ref_ppm,
        |  cur_cnt * 1000000 // cur_n AS cur_ppm,
        |  abs(ref_cnt * 1000000 // ref_n - cur_cnt * 1000000 // cur_n) AS shift_ppm
        |FROM g JOIN t USING (dim)""".stripMargin
  )
}
