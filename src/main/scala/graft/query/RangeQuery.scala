package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.ingest.BlockWriter

/** The reference's one query operator: `Query(partitionKey, startKey,
  * endKey)` — all rows of one entity whose key column falls in the
  * inclusive range (/root/reference/storageAdapter.go:4,
  * filesystemStorageAdapter.go:128-163, block.go:117-141).
  *
  * In Spark this is a single declarative plan: partition pruning removes
  * all but the entity's bucket directory, Parquet footer min/max stats skip
  * files outside the key range (the filename-zone-map of block.go:143-199),
  * and the residual row filter is pushed into the scan. Both range ends are
  * inclusive, matching block.go:127-129; `between` is inclusive.
  */
object RangeQuery {

  /** Query a layout produced by [[BlockWriter.write]].
    *
    * `tolerateForeignFiles` reproduces the reference's lenient listing
    * (block.go:149-174: filenames that don't parse are skipped, so foreign
    * files dropped into a partition dir are ignored, not errors). Default
    * is Spark's fail-fast — at 100 TB a corrupt file silently skipped can
    * mask data loss, so leniency is opt-in parity, not the default.
    */
  def query(spark: SparkSession, base: String, partitionCol: String, keyCol: String,
            partitionKey: Column, startKey: Column, endKey: Column,
            numBuckets: Int = BlockWriter.DefaultBuckets,
            tolerateForeignFiles: Boolean = false): DataFrame = {
    val reader =
      if (tolerateForeignFiles) spark.read.option("ignoreCorruptFiles", "true")
      else spark.read
    reader.parquet(base)
      .filter(col("bucket") === pmod(xxhash64(partitionKey), lit(numBuckets)).cast("int") &&
        col(partitionCol) === partitionKey &&
        col(keyCol).between(startKey, endKey))
  }

  /** [[query]] over a layout whose batches carry evolved (additive)
    * schemas — `mergeSchema` unions the per-file Parquet schemas, so rows
    * written before a column existed surface it as NULL. Merge is a
    * footer-only operation (no data read) but does touch every footer at
    * planning time; production layouts snapshot the merged schema in a
    * catalog rather than re-deriving it per query.
    */
  def queryEvolved(spark: SparkSession, base: String, partitionCol: String, keyCol: String,
                   partitionKey: Column, startKey: Column, endKey: Column,
                   numBuckets: Int = BlockWriter.DefaultBuckets): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(base)
      .filter(col("bucket") === pmod(xxhash64(partitionKey), lit(numBuckets)).cast("int") &&
        col(partitionCol) === partitionKey &&
        col(keyCol).between(startKey, endKey))

  /** Query a [[BlockWriter.writeByKey]] (reference-faithful) layout. */
  def queryByKey(spark: SparkSession, base: String, partitionCol: String, keyCol: String,
                 partitionKey: Column, startKey: Column, endKey: Column): DataFrame =
    spark.read.parquet(base)
      .filter(col(partitionCol) === partitionKey && col(keyCol).between(startKey, endKey))

  /** Plan introspection for tests: (partitionFilters, pushedFilters) of the
    * first parquet scan — asserts the two reference optimizations
    * (SURVEY.md §4) actually fire.
    */
  def scanFilters(df: DataFrame): (Seq[String], Seq[String]) = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    val partFilters = scans.flatMap(_.partitionFilters).map(_.toString)
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).filter(_ != "[]")
    (partFilters, pushed)
  }
}
