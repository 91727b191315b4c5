package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Remaining relational shapes: outer joins, cross join, pivot,
  * explode/posexplode (the generator/UDTF surface), union-all.
  * All absent from the reference (SURVEY.md §2.2).
  */
object Shapes {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j8_outer_join" -> { (s, d) =>
      // Full outer customer↔high-value orders: preserves customers with no
      // big order AND (synthetic) orders with no matching customer.
      val c = Tables.table(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.table(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"), col("o_totalprice"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .groupBy(coalesce(col("c_mktsegment"), lit("<none>")).as("segment"))
        .agg(count(col("o_custkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"))
    },
    "j9_cross_join" -> { (s, d) =>
      // Explicit cartesian of two tiny dims — the only sane cross join.
      Tables.table(s, d, "region").crossJoin(Tables.table(s, d, "nation"))
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") === col("n_regionkey")).cast("int").as("is_member"))
    },
    "p1_pivot" -> { (s, d) =>
      // Pivot order status → columns, per priority. Values enumerated
      // explicitly so the plan is a single pass (no distinct-collect job).
      Tables.table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .select(col("o_orderpriority"), col("O").as("total_o"),
          col("F").as("total_f"), col("P").as("total_p"))
    },
    "x1_wordcount" -> { (s, d) =>
      // The generator surface: explode each doc into words, global counts.
      Tables.table(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
    },
    "x2_posexplode" -> { (s, d) =>
      Tables.table(s, d, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("pos") < 5)
    },
    "x6_explode_map" -> { (s, d) =>
      // Generator over MapType (the map sibling of x1/x2's array explode):
      // each row's metric map unrolls to (key, value) rows — the shape a
      // metrics long-format export takes. Pure map-side row expansion.
      Tables.table(s, d, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          explode(map(
            lit("qty"), col("l_quantity"),
            lit("price"), col("l_extendedprice"))).as(Seq("metric", "value")))
    },
    "x3_collect_list" -> { (s, d) =>
      // Array-building aggregation: per nation, the sorted set of market
      // segments its customers belong to. Serialized to a joined string so
      // the driver's pandas-side sort/hash (which cannot order array cells)
      // can compare it.
      Tables.table(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          count(lit(1)).as("n_cust"))
    },
    "set4_union_all" -> { (s, d) =>
      val o = Tables.table(s, d, "orders")
      o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"), lit(1997).as("yr"))
        .unionAll(o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"), lit(1998).as("yr")))
    },
    "x4_unpivot" -> { (s, d) =>
      // Wide→long reshaping via the native unpivot (melt) operator —
      // map-side only, no shuffle; the oracle is the equivalent UNION ALL.
      Tables.table(s, d, "part")
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"),
            col("p_retailprice").as("p_retailprice")),
          "metric", "value")
    },
    "s5_exact_sample" -> { (s, d) =>
      // EXACT-size deterministic sample (the reservoir-sampling use case,
      // RNG-free): order docs by content hash, keep the first 100 - the
      // same 100 on every engine, every run, any partitioning. Plans as
      // TakeOrderedAndProject (bounded per-partition heaps + one k-sized
      // merge), never a global sort - the only shape exact-n sampling
      // survives at corpus scale.
      Tables.table(s, d, "documents")
        .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
        .orderBy(col("h"), col("doc_id"))
        .limit(100)
    },
    "s2_hash_sample" -> { (s, d) =>
      // Deterministic content-hash sampling (~1/8 of docs): the reproducible
      // sampling primitive for pipeline experiments — same rows on every
      // engine and every run, no RNG state; fully pushdown-friendly.
      Tables.table(s, d, "documents")
        .filter(substring(md5(col("text")), 1, 1).isin("0", "1"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
    },
    "j12_nullsafe_join" -> { (s, d) =>
      // Null-safe equality (<=>): NULL keys match each other instead of
      // silently vanishing from the join — the semantics dimension tables
      // with "unknown" buckets need.
      val c = Tables.table(s, d, "customer")
      val a = c.select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_n"),
        col("c_custkey"))
      val b = c.select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_b"))
        .distinct()
      a.join(b, col("seg_n") <=> col("seg_b"))
        .groupBy(coalesce(col("seg_b"), lit("<null>")).as("segment"))
        .agg(count(lit(1)).as("n"))
    },
    "x5_explode_outer" -> { (s, d) =>
      // Null-preserving generator: docs whose array is empty still emit a
      // row (with NULL), where plain explode would drop them.
      val thes = filter(split(col("text"), " "), w => w === "the")
      Tables.table(s, d, "documents")
        .select(col("doc_id"), explode_outer(thes).as("w"))
        .groupBy(col("doc_id"))
        .agg(count(col("w")).as("n_the"), count(lit(1)).as("n_rows"))
    },
    "s3_stratified_sample" -> { (s, d) =>
      // Stratified deterministic sample: top-20 docs per language stratum
      // ordered by content hash — one shuffle on the stratum key, heap-k
      // per group via row_number.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("text")), col("doc_id"))
      Tables.table(s, d, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"), col("rn"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "j8_outer_join" ->
      """SELECT coalesce(c_mktsegment, '<none>') AS segment,
        |  count(o_custkey) AS n_big_orders, count(*) AS n_rows
        |FROM (SELECT c_custkey, c_mktsegment FROM customer) c
        |FULL JOIN (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "j9_cross_join" ->
      """SELECT r_name, n_name, CAST(r_regionkey = n_regionkey AS INT) AS is_member
        |FROM region CROSS JOIN nation""".stripMargin,
    "p1_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "x1_wordcount" ->
      """SELECT w AS word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w""".stripMargin,
    "x2_posexplode" ->
      """SELECT doc_id, u.pos AS pos, u.word AS word
        |FROM (SELECT doc_id,
        |        unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
        |          i -> {'pos': i - 1, 'word': string_split(text, ' ')[i]})) AS u
        |      FROM documents)
        |WHERE u.pos < 5""".stripMargin,
    "x3_collect_list" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
        |  count(*) AS n_cust
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "set4_union_all" ->
      """SELECT o_custkey, 1997 AS yr FROM orders WHERE year(o_orderdate) = 1997
        |UNION ALL
        |SELECT o_custkey, 1998 AS yr FROM orders WHERE year(o_orderdate) = 1998""".stripMargin,
    "x6_explode_map" ->
      """SELECT l_orderkey, 'qty' AS metric, l_quantity AS value
        |FROM lineitem WHERE l_linenumber = 1
        |UNION ALL
        |SELECT l_orderkey, 'price', l_extendedprice
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,
    "x4_unpivot" ->
      """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part""".stripMargin,
    "s2_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substring(md5(text), 1, 1) IN ('0', '1')""".stripMargin,
    "s5_exact_sample" ->
      """SELECT doc_id, lang, md5(text) AS h FROM documents
        |ORDER BY h, doc_id LIMIT 100""".stripMargin,
    "j12_nullsafe_join" ->
      """SELECT coalesce(b.seg_b, '<null>') AS segment, count(*) AS n
        |FROM (SELECT nullif(c_mktsegment, 'BUILDING') AS seg_n, c_custkey FROM customer) a
        |JOIN (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg_b FROM customer) b
        |  ON a.seg_n IS NOT DISTINCT FROM b.seg_b
        |GROUP BY 1""".stripMargin,
    "x5_explode_outer" ->
      """SELECT doc_id, count(t.w) AS n_the, count(*) AS n_rows
        |FROM documents
        |LEFT JOIN LATERAL (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x = 'the')) AS w
        |) t ON true
        |GROUP BY doc_id""".stripMargin,
    "s3_stratified_sample" ->
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20""".stripMargin
  )
}
