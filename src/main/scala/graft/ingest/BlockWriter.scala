package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingestion with the reference's storage semantics, re-expressed for
  * Spark + Parquet (SURVEY.md §1.2, §2.1 #4-#11).
  *
  * Reference behavior (/root/reference/blockManager.go:29-72,
  * filesystemStorageAdapter.go:30-61): rows are hash-grouped by a string
  * PartitionColumn into per-partition block files of ≤ MaxSize rows; each
  * block file's name carries the KeyColumn min/max so queries can skip
  * blocks without opening them (block.go:109-115, 143-199).
  *
  * Spark mapping:
  *  - partition dirs  ← `partitionBy(bucket)` (Hive-style layout);
  *  - block size cap  ← `maxRecordsPerFile`;
  *  - filename zone-map ← Parquet footer min/max stats (automatic), made
  *    *effective* by sorting rows within each partition on
  *    (partitionCol, keyCol) so every file covers a narrow key range;
  *  - content-hash idempotency ← Spark's file commit protocol.
  *
  * Scale note: the reference partitions by the raw entity key — one
  * directory per user. At 100 TB / millions of users that is a small-files
  * catastrophe, so we partition by a *bucket* of the key
  * (`pmod(xxhash64(key), numBuckets)`) and cluster by (key, time) inside
  * each bucket: partition pruning still eliminates (buckets-1)/buckets of
  * the data for a point lookup, and footer stats prune within the bucket.
  * `bucketFor` is deterministic, so readers compute the same bucket.
  *
  * Storage seam: `base` is a Hadoop-filesystem URI, not a local path —
  * `file:///...` here, `abfss://container@account.dfs.core.windows.net/...`
  * on Azure (the reference's other adapter, azureStorageAdapter.go:34-227).
  * The swap needs only hadoop-azure on the classpath (unavailable in this
  * offline build): the ABFS connector then provides what the reference
  * hand-rolls — staged 4 MB block uploads with a final block-list commit
  * (azureStorageAdapter.go:34-65) and prefix-scoped paginated listing
  * (:119-147). SourcesSpec pins the URI-agnostic contract via file://.
  */
object BlockWriter {

  val DefaultBuckets = 64
  val DefaultMaxRecordsPerFile = 8192L // reference MaxSize, blockManager_test.go:19

  def bucketCol(partitionCol: String, numBuckets: Int) =
    pmod(xxhash64(col(partitionCol)), lit(numBuckets)).cast("int")

  /** Write `df` as a partitioned, key-clustered Parquet layout under `base`. */
  def write(df: DataFrame, base: String, partitionCol: String, keyCol: String,
            numBuckets: Int = DefaultBuckets,
            maxRecordsPerFile: Long = DefaultMaxRecordsPerFile): Unit = {
    df.withColumn("bucket", bucketCol(partitionCol, numBuckets))
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col(partitionCol), col(keyCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(base)
  }

  /** Append a new batch to an existing [[write]] layout. The batch may
    * carry an EVOLVED schema (added nullable columns): Parquet stores each
    * file's own schema, and [[graft.query.RangeQuery.queryEvolved]] merges
    * footers at read time — the additive schema-evolution path the
    * reference's fixed-Avro-codec design rules out (SURVEY.md §1.3 "no
    * evolution"). Column renames/drops/retypes are NOT supported this way;
    * those need a rewrite (compact with a projection).
    */
  def append(df: DataFrame, base: String, partitionCol: String, keyCol: String,
             numBuckets: Int = DefaultBuckets,
             maxRecordsPerFile: Long = DefaultMaxRecordsPerFile): Unit = {
    df.withColumn("bucket", bucketCol(partitionCol, numBuckets))
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col(partitionCol), col(keyCol))
      .write
      .mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(base)
  }

  /** Small-files compaction: re-read a [[write]] layout and rewrite it with
    * a larger per-file cap, preserving the bucket dirs and re-clustering on
    * (partitionCol, keyCol) so footer-stats pruning stays tight.
    *
    * This is the Spark form of the reference's committed-block re-ingestion
    * path (/root/reference/fileStreamAdapter_test.go:13-17 reads a stored
    * block back through the stream source — SURVEY.md §3.3 flags that as
    * the compaction enabler). Streaming ingest under a short MaxAge
    * produces many small blocks (8192-row cap, 1 s flush); at 100 TB the
    * periodic compactor is what keeps file counts — and therefore listing
    * and task-scheduling overhead — bounded.
    *
    * Writes to `dstBase` (an in-place rewrite would read and clobber the
    * same files); callers swap directories after success.
    */
  def compact(spark: SparkSession, srcBase: String, dstBase: String,
              partitionCol: String, keyCol: String,
              maxRecordsPerFile: Long = 4 * 1024 * 1024): Unit = {
    spark.read.parquet(srcBase)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(partitionCol), col(keyCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .parquet(dstBase)
  }

  /** Reference-faithful layout: one directory per raw partition-key value
    * (`<base>/<pk>/...`, filesystemStorageAdapter.go:26-28). Only sane for
    * low-cardinality keys; kept for parity tests.
    */
  def writeByKey(df: DataFrame, base: String, partitionCol: String, keyCol: String,
                 maxRecordsPerFile: Long = DefaultMaxRecordsPerFile): Unit = {
    df.sortWithinPartitions(col(partitionCol), col(keyCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(base)
  }
}
