package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.BlockWriter
import graft.tables.Tables

/** Driver-facing queries for the reference's own operator surface:
  * the partition-key + key-range query (storageAdapter.go:4), run both
  * directly against the raw events table (pushdown path) and through a
  * full ingest→store→query round trip (BlockWriter layout).
  */
object RefParity {

  // user 13 exists at every sf (user ids are 0..15/150/1500); events span
  // 2024-01-01..2024-01-30, so this window is non-empty at every sf.
  private val PK = 13L
  private val LO = 1704412800000000L // 2024-01-05T00:00:00Z, epoch µs
  private val HI = 1705708800000000L // 2024-01-20T00:00:00Z

  private def outCols(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))

  /** Deterministic per-sf cache dir so the expensive ingest runs once.
    * LayoutVersion is part of the key — bump it whenever BlockWriter's
    * layout changes so a stale cache from older code can't be read.
    */
  private val LayoutVersion = "v2"
  private def ingestDir(sfDir: String): String =
    s"/tmp/graft_ingest/$LayoutVersion/" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  def ingestedEvents(spark: SparkSession, sfDir: String): String = {
    val base = ingestDir(sfDir)
    if (!new java.io.File(base, "_SUCCESS").exists()) {
      BlockWriter.write(Tables.events(spark, sfDir).drop("ts", "ts_t"),
        base, partitionCol = "user_id", keyCol = "ts_us")
    }
    base
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Direct range query on the raw table: predicate must fully push into
    // the parquet scan (the reference's residual filter, block.go:117-141).
    "ref_range_query" -> { (s, d) =>
      outCols(Tables.events(s, d)
        .filter(col("user_id") === PK && col("ts_us").between(LO, HI)))
    },
    // Full reference lifecycle: ingest (bucketed, key-clustered block
    // files) → range query with partition pruning + footer-stats skipping.
    "ref_ingest_query" -> { (s, d) =>
      val base = ingestedEvents(s, d)
      outCols(RangeQuery.query(s, base, "user_id", "ts_us", lit(PK), lit(LO), lit(HI)))
    }
  )

  private val oracle =
    s"""SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
       |FROM events
       |WHERE user_id = $PK AND epoch_us(ts) BETWEEN $LO AND $HI""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ref_range_query"  -> oracle,
    "ref_ingest_query" -> oracle
  )
}
