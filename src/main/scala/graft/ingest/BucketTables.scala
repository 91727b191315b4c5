package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native Spark bucketing: pre-shuffle a table ONCE at write time so every
  * subsequent equi-join / aggregation on the bucket key runs shuffle-free.
  *
  * This is the catalog-table complement of [[BlockWriter]]'s directory
  * bucketing: BlockWriter buckets for *pruning* (point lookups skip
  * (buckets-1)/buckets of the data), while `bucketBy` buckets for
  * *co-location* (two tables bucketed the same way join with zero
  * exchanges). At 100 TB the fact-fact join is the single most expensive
  * shuffle in the pipeline; paying it once at ingest and never again is
  * the highest-leverage layout decision there is.
  *
  * The reference's hash-grouping of rows by partition key
  * (/root/reference/blockManager.go:56-63) is the same idea one level
  * down — its "partitions" are our buckets.
  */
object BucketTables {

  /** Write `df` as a bucketed, sorted catalog table. Sorting within
    * buckets additionally enables sort-merge joins without a sort step.
    */
  def save(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planned with no
    * ShuffleExchange on either side (assert via PlanSpec-style checks).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, leftKey: String,
                    rightTable: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
