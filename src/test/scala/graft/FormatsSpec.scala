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

  test("fmt3: ORC roundtrip preserves microsecond timestamps") {
    val got = row("fmt3_orc_roundtrip")
    val want = Tables.events(spark, sf).agg(
      count(lit(1)), countDistinct(col("user_id")),
      min(col("ts_us")), max(col("ts_us")),
      round(sum(col("value")), 2)).head()
    assert(got === want)
  }
}
