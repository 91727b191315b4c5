package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Statistical aggregates, percentiles, sketches, grouping sets, and the
  * UDAF extension surface. Absent from the reference (SURVEY.md §2.2 — its
  * only aggregates are per-block min/max/count).
  *
  * Scale notes: all are single-shuffle partial+final aggregations;
  * approx_count_distinct is the HLL sketch path whose merge cost is O(sketch)
  * not O(distinct), the only way count-distinct survives 100 TB;
  * exact percentiles hold per-group value buffers — fine for bounded groups,
  * use approx_percentile when groups are unbounded.
  */
object Stats {

  /** Typed UDAF example (the user-extension surface): geometric mean via
    * log-sum — a numerically stable streaming aggregate with a tiny
    * (Double, Long) buffer, partial+final mergeable so Spark map-side
    * combines it like any built-in.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a10_bitmap_distinct" -> { (s, d) =>
      // EXACT distinct counting that scales like a sketch: keys bucket into
      // fixed 32k-bit bitmaps (bitmap_bucket_number/bit_position), each
      // (group, bucket) OR-aggregates map-side into one bitmap, and the
      // final count is a sum of per-bucket popcounts. Unlike
      // count(DISTINCT) — whose dedup shuffle carries every distinct key —
      // the shuffle here carries one bounded bitmap per (group, bucket):
      // mergeable partial state, exact answer. The q3 count-distinct and
      // a3 HLL queries bracket this from the exact-expensive and
      // approx-cheap sides.
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"), expr("bitmap_bucket_number(l_partkey)").as("buck"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("distinct_parts"))
    },
    "a11_median_mode" -> { (s, d) =>
      // Exact median (interpolating percentile) and modal value per group.
      // Median is the one intrinsically expensive order statistic — Spark
      // plans a full-sort-free percentile aggregate whose state is the
      // per-group value multiset; at 100 TB prefer a7_approx_quantile's
      // bounded-state KLL path and keep exact median for bounded-cardinality
      // groups like these three flags. Mode's state is a value→count map,
      // bounded by the column's distinct count (2 here).
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(median(col("l_quantity")), 2).as("med_qty"),
          round(median(col("l_extendedprice")), 2).as("med_price"),
          mode(col("l_linestatus")).as("mode_status"))
    },
    "a9_regression" -> { (s, d) =>
      // Bivariate regression/association aggregates (price ~ quantity per
      // returnflag): slope, intercept, r², correlation, sample covariance.
      // Each is a partial+final mergeable moment aggregate — one shuffle of
      // per-partition moment tuples, the same shape at any scale. Rounded
      // at 4 decimals on both sides: the moments are sums, so engine
      // summation order perturbs only trailing ulps.
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 4).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 4).as("covar_pq"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
    },
    "a1_stats_agg" -> { (s, d) =>
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_extendedprice")), 2).as("var_price"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          (round(covar_samp(col("l_discount"), col("l_tax")), 6) + lit(0.0)).as("cov_disc_tax"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"))
    },
    "a2_percentiles" -> { (s, d) =>
      // Scalar quartile columns (not an array) so the driver's pandas-side
      // sort/hash — which cannot order array cells — can compare them.
      val qs = Tables.table(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qq"),
          round(expr("percentile(l_extendedprice, 0.5D)"), 4).as("median_price"))
      qs.select(col("l_linestatus"),
        round(col("qq")(0), 4).as("qty_p25"),
        round(col("qq")(1), 4).as("qty_p50"),
        round(col("qq")(2), 4).as("qty_p75"),
        col("median_price"))
    },
    "a3_hll_sketch" -> { (s, d) =>
      // HLL++ sketch count-distinct (rsd 1%) next to the exact count —
      // no oracle (sketch internals are engine-specific); the driver
      // records rows-only, StatsSpec asserts the 1% envelope.
      Tables.table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          approx_count_distinct(col("o_custkey"), 0.01).as("approx_custs"),
          countDistinct(col("o_custkey")).as("exact_custs"))
    },
    "a13_sketch_gate" -> { (s, d) =>
      // The Apache DataSketches HLL function family (hll_sketch_agg /
      // hll_union_agg / hll_sketch_estimate — Spark 3.5+'s MERGEABLE
      // cardinality surface, the same machinery the NDV sidecars and the
      // distinct-MV use): per-priority sketches BUILT in one pass, then
      // UNIONED into a global estimate — proving estimate(union(parts))
      // stays inside the error envelope, the re-aggregation property
      // plain approx_count_distinct (a3) cannot offer. Gate shape (the
      // a3b pattern): exact distinct counts beside 5%-envelope booleans
      // (lgK=12 → rse ≈ 1.6%, so 5% is a ≥3σ margin) — all engine-
      // independent.
      val o = Tables.table(s, d, "orders")
      val perGroup = o.groupBy(col("o_orderpriority"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
          countDistinct(col("o_custkey")).as("exact_custs"))
      perGroup
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("union_est"),
          sum(when(
            abs(hll_sketch_estimate(col("sk")) - col("exact_custs")).cast("double") /
              col("exact_custs") <= 0.05, 1L).otherwise(0L)).as("groups_within"),
          count(lit(1)).as("n_groups"))
        .crossJoin(broadcast(o.agg(countDistinct(col("o_custkey")).as("global_exact"))))
        .select(col("n_groups"), col("global_exact"),
          (col("groups_within") === col("n_groups")).as("groups_ok"),
          (abs(col("union_est") - col("global_exact")).cast("double") /
            col("global_exact") <= 0.05).as("union_ok"))
    },
    "a3b_hll_gate" -> { (s, d) =>
      // Oracle-checkable gate for a3: the sketch estimate itself is
      // engine-specific, but "within 5% of exact" is a deterministic
      // boolean DuckDB can predict (rsd is 1%, so the margin is wide).
      // COMPOSES the registered a3 query so the gate always validates the
      // production shape, whatever its parameters become.
      queries("a3_hll_sketch")(s, d)
        .select(col("o_orderpriority"), col("exact_custs"),
          (abs(col("approx_custs") - col("exact_custs")).cast("double") /
            col("exact_custs") <= 0.05).as("hll_ok"))
    },
    "a12_cms_gate" -> { (s, d) =>
      // Count-Min sketch heavy hitters — the frequency sketch beside the
      // cardinality (a3 HLL) and quantile (a7) ones. The sketch binary is
      // engine-specific, so the oracle surface is the established gate
      // shape: exact counts for the top-20 tokens (engine-independent)
      // plus two error-envelope booleans the CMS guarantees make
      // deterministic under a fixed seed — estimates never undercount,
      // and overcount by at most eps·N (w=⌈e/eps⌉ counters) with the
      // seed fixed the outcome is a constant the oracle predicts as true.
      // Scale shape: one explode scan feeds BOTH the exact top-k (hash
      // agg + TakeOrdered) and the one-row sketch aggregate; the 20-row
      // probe side broadcasts, the sketch deserializes once per task.
      val toks = Tables.table(s, d, "documents")
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) >= 1)
      val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("tok")).limit(20)
      val sk = toks.agg(
        expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("total"))
      val est = udf { (bytes: Array[Byte], t: String) =>
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(t)
      }
      top.crossJoin(broadcast(sk))
        .select(col("tok"), col("exact_n"),
          (est(col("sk"), col("tok")) >= col("exact_n")).as("cms_lower_ok"),
          (est(col("sk"), col("tok")) <=
            col("exact_n") + ceil(lit(0.001) * col("total"))).as("cms_upper_ok"))
    },
    "a4_grouping_sets" -> { (s, d) =>
      // SQL frontend: GROUPING SETS through spark.sql over a temp view.
      Tables.table(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          |  round(sum(l_extendedprice), 2) AS sum_price
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },
    "a8_grouping_id" -> { (s, d) =>
      // grouping()/grouping_id() markers distinguish "NULL because
      // aggregated away" from data NULLs in cube output.
      Tables.table(s, d, "lineitem").createOrReplaceTempView("lineitem_a8")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
          |  CAST(grouping(l_linestatus) AS INT) AS g_status,
          |  count(*) AS n
          |FROM lineitem_a8
          |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin)
    },
    "a7_approx_quantile" -> { (s, d) =>
      // Approximate percentile (Greenwald-Khanna / t-digest family) beside
      // the exact one — the quantile analogue of a3's HLL: the only way
      // percentiles survive unbounded groups at 100 TB is a mergeable
      // sketch. No oracle (sketch internals are engine-specific);
      // StatsSpec pins the error envelope against the exact value.
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("approx_percentile(l_extendedprice, 0.5D, 10000)"), 2).as("approx_median"),
          round(expr("percentile(l_extendedprice, 0.5D)"), 2).as("exact_median"))
    },
    "a7b_quantile_gate" -> { (s, d) =>
      // Oracle-checkable gate for a7: with accuracy 10000 over sf-scale
      // groups the GK sketch is exact-to-rounding, so "within 0.5% of the
      // exact percentile" is a deterministic boolean. COMPOSES the
      // registered a7 query (gating the production shape, not a copy);
      // group row counts join in as engine-independent payload.
      val counts = Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_rows"))
      queries("a7_approx_quantile")(s, d)
        .join(broadcast(counts), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"),
          (abs(col("approx_median") - col("exact_median")) /
            col("exact_median") <= 0.005).as("gk_ok"))
    },
    "a5_argminmax" -> { (s, d) =>
      // min_by/max_by with a struct tiebreak (price, then key) so the
      // winner is deterministic even under duplicate prices — the oracle
      // reproduces it with a row_number window.
      Tables.table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("biggest_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("smallest_order"),
          round(max(col("o_totalprice")), 2).as("max_price"))
    },
    "a6_filtered_agg" -> { (s, d) =>
      // Conditional/boolean aggregates: count_if + bool_and/bool_or, the
      // FILTER-clause family.
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          count_if(col("l_quantity") >= 30).as("n_bulk"),
          bool_and(col("l_quantity") > 0).as("all_positive_qty"),
          bool_or(col("l_tax") > 0.07).as("any_high_tax"),
          round(sum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0)), 2).as("returned_value"))
    },
    "u1_udaf_geomean" -> { (s, d) =>
      val geomean = udaf(GeoMean)
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(geomean(col("l_extendedprice")), 2).as("geomean_price"))
    },
    "u4_sql_udf" -> { (s, d) =>
      // Declarative SQL UDF (Spark 4's CREATE FUNCTION ... RETURN expr):
      // unlike u2's black-box Scala UDF, the body INLINES into the plan —
      // Catalyst sees the expression, so codegen, pushdown and constant
      // folding all still apply. The right user-extension tier for
      // anything expressible as SQL; u2's JVM closure remains only for
      // logic SQL can't state.
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(" +
        "p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1.0 - d)")
      Tables.table(s, d, "lineitem").createOrReplaceTempView("u4_lineitem")
      s.sql("""SELECT l_returnflag, count(*) AS n,
              |  round(sum(graft_disc_price(l_extendedprice, l_discount)), 2) AS revenue
              |FROM u4_lineitem GROUP BY l_returnflag""".stripMargin)
    },
    "u2_scalar_udf" -> { (s, d) =>
      // Scalar UDF surface. Deliberately trivial: UDFs are an escape hatch
      // (opaque to Catalyst — no pushdown through them, no codegen), so
      // anything expressible as built-ins shouldn't be one; this registers
      // the mechanism. Compare fnv64 (t5) for the right way to extend hot
      // paths.
      val vowels = udf((text: String) =>
        if (text == null) 0 else text.count("aeiou".contains(_)))
      Tables.table(s, d, "documents")
        .select(col("doc_id"), vowels(col("text")).as("n_vowels"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // a3b/a7b: the sketch VALUES are engine-specific (hence a3/a7 stay
    // rows-only), but the error-envelope booleans are deterministic — the
    // oracle predicts them alongside exact, engine-independent columns.
    "u4_sql_udf" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a12_cms_gate" ->
      """WITH t AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |e AS (SELECT tok, count(*) AS exact_n FROM t
        |      WHERE len(tok) >= 1 GROUP BY tok)
        |SELECT tok, exact_n, true AS cms_lower_ok, true AS cms_upper_ok
        |FROM e ORDER BY exact_n DESC, tok LIMIT 20""".stripMargin,
    "a3b_hll_gate" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        |  true AS hll_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "a13_sketch_gate" ->
      """SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_groups,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS global_exact,
        |  true AS groups_ok, true AS union_ok
        |FROM orders""".stripMargin,
    "a7b_quantile_gate" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  true AS gk_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // The bitmap plumbing is Spark-internal, but the RESULT is exact —
    // the oracle is plain count(DISTINCT).
    "a10_bitmap_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a11_median_mode" ->
      """SELECT l_returnflag,
        |  round(median(l_quantity), 2) AS med_qty,
        |  round(median(l_extendedprice), 2) AS med_price,
        |  mode(l_linestatus) AS mode_status
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a9_regression" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_pq,
        |  regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a1_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_extendedprice), 2) AS var_price,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |  round(covar_samp(l_discount, l_tax), 6) + 0.0 AS cov_disc_tax,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a2_percentiles" ->
      """SELECT l_linestatus,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS qty_p75,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "a4_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    // arg_max with a composite tiebreak isn't in DuckDB 1.0 — reproduce the
    // struct ordering with row_number windows instead.
    "a5_argminmax" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM ranked GROUP BY o_orderpriority""".stripMargin,
    "a8_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "a6_filtered_agg" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  count(*) FILTER (WHERE l_quantity >= 30) AS n_bulk,
        |  bool_and(l_quantity > 0) AS all_positive_qty,
        |  bool_or(l_tax > 0.07) AS any_high_tax,
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END), 2) AS returned_value
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "u2_scalar_udf" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels
        |FROM documents""".stripMargin,
    "u1_udaf_geomean" ->
      """SELECT l_returnflag,
        |  round(exp(avg(ln(l_extendedprice))), 2) AS geomean_price
        |FROM lineitem WHERE l_extendedprice > 0 GROUP BY l_returnflag""".stripMargin
  )
}
