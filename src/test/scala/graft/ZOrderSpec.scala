package graft

import org.apache.spark.sql.functions._
import graft.ingest.ZOrder
import graft.tables.Tables

/** Z-order layout quality: for a 2-dimensional box query, fewer files'
  * (min,max) boxes intersect the query than under a single-key sort —
  * i.e. footer-stats skipping works on BOTH dimensions.
  */
class ZOrderSpec extends SparkSuite {

  private def intersectingFiles(base: String,
                                 uLo: Long, uHi: Long, tLo: Long, tHi: Long): Long = {
    spark.read.parquet(base)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
        min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
      .filter(!(col("u0") > uHi || col("u1") < uLo || col("t0") > tHi || col("t1") < tLo))
      .count()
  }

  test("z-order clusters both dims: fewer candidate files for box queries") {
    val events = Tables.events(spark, "/root/testdata/sf0.01").drop("ts", "ts_t")
    val byTime = tmpDir("graft_zorder_bytime")
    val byZ = tmpDir("graft_zorder_z")
    // Baseline: time-sorted layout (the reference's one-dimensional layout)
    events.repartitionByRange(64, col("ts_us")).sortWithinPartitions(col("ts_us"))
      .write.mode("overwrite").option("maxRecordsPerFile", 256).parquet(byTime)
    ZOrder.writeZOrdered(events, byZ, "user_id", "ts_us",
      numFiles = 64, maxRecordsPerFile = 256)

    // same total rows either way
    assert(spark.read.parquet(byZ).count() === events.count())

    val b = events.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val (tMin, tMax) = (b.getLong(0), b.getLong(1))
    val third = (tMax - tMin) / 3
    // box: 4 of 150 users × middle third of time
    val (uLo, uHi, tLo, tHi) = (30L, 60L, tMin + third, tMin + 2 * third)

    val filesTime = intersectingFiles(byTime, uLo, uHi, tLo, tHi)
    val filesZ = intersectingFiles(byZ, uLo, uHi, tLo, tHi)
    assert(filesZ < filesTime,
      s"z-order should prune more: z=$filesZ vs time-sorted=$filesTime")

    // and the query itself returns identical rows on both layouts
    def rows(base: String) = spark.read.parquet(base)
      .filter(col("user_id").between(uLo, uHi) && col("ts_us").between(tLo, tHi))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rows(byZ) === rows(byTime))
  }
}
