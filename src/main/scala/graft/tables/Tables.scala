package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md §2).
  *
  * All reads are plain parquet scans so Catalyst pushes filters and column
  * pruning into the scan (the Spark analogue of the reference's
  * filename-zone-map pruning, /root/reference/block.go:143-199 — see
  * SURVEY.md §4).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet timestamp[ns]. Depending on reader config Spark
    * surfaces it as a nanos LongType (spark.sql.legacy.parquet.nanosAsLong)
    * or as a timestamp. Normalize to:
    *   - `ts_us`: epoch microseconds (LongType) — matches DuckDB's
    *     `epoch_us(ts)` bit-for-bit, used for all key-range math;
    *   - `ts_t`: TimestampType (microsecond) for window/date functions.
    * The events table is the Spark analogue of the reference's Location
    * stream: PartitionColumn=user_id, KeyColumn=ts
    * (/root/reference/blockManager.go:14-15).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    val tsUs = raw.schema("ts").dataType match {
      case LongType          => expr("ts div 1000")
      case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
      case _                 => unix_micros(col("ts"))
    }
    raw
      .withColumn("ts_us", tsUs)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  }
}
