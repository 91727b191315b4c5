package graft

import org.apache.spark.sql.functions._

import graft.ops.Formats
import graft.tables.Tables

/** The registry-level format roundtrips (fmt1/fmt2/fmt3): each stages a
  * CSV / JSONL / ORC copy of a parquet table and aggregates the read-back;
  * here the same aggregate is recomputed straight from parquet and the two
  * rows must be value-identical — the in-engine mirror of the DuckDB
  * oracle. A quoting, escaping, or timestamp-encoding loss in the trip
  * shows up as a differing aggregate.
  */
class FormatsSpec extends SparkSuite {

  private def row(name: String) =
    Formats.queries(name)(spark, sf).head()

  test("fmt1: CSV roundtrip aggregates equal the parquet originals") {
    val got = row("fmt1_csv_roundtrip")
    val want = Tables.events(spark, sf).agg(
      count(lit(1)), countDistinct(col("user_id")),
      countDistinct(col("event_type")), round(sum(col("value")), 2),
      min(col("ts_us")), max(col("ts_us")),
      sum(length(col("props")))).head()
    assert(got === want)
  }

  test("fmt2: JSONL roundtrip preserves document text byte counts") {
    val got = row("fmt2_jsonl_roundtrip")
    val want = Tables.table(spark, sf, "documents").agg(
      count(lit(1)), countDistinct(col("lang")),
      countDistinct(col("source")), sum(col("n_chars")),
      sum(length(col("text")))).head()
    assert(got === want)
  }

  test("ORC scans push filters and prune columns like parquet") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft_orc_push") + "/out"
    val df = spark.range(1000).selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s")
    graft.sources.TextSources.writeOrc(df, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType), StructField("s", StringType)))
    val q = graft.sources.TextSources.readOrc(spark, dir, schema)
      .filter(col("id") > 500).select(col("v"))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,500)]"),
      s"ORC scan must carry the pushed predicate:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:bigint,v:bigint>"),
      s"ORC scan must prune the unused string column:\n$scan")
  }

  test("fmt3: ORC roundtrip preserves microsecond timestamps") {
    val got = row("fmt3_orc_roundtrip")
    val want = Tables.events(spark, sf).agg(
      count(lit(1)), countDistinct(col("user_id")),
      min(col("ts_us")), max(col("ts_us")),
      round(sum(col("value")), 2)).head()
    assert(got === want)
  }
}
