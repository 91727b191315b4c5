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
  *  - content-hash idempotency ← Spark's file commit protocol for
  *    in-flight atomicity, plus [[contentAddress]] for the reference's
  *    literal block.go:94-115 semantics: blocks named by their bytes'
  *    md5, so re-ingesting identical content is a storage-level no-op.
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

  /** Content-addressed block naming — the reference's storage-level
    * idempotency REPRODUCED, not just replaced (block.go:94-115: a block's
    * object name is the hash of its serialized bytes, so a retried upload
    * of the same block lands on the same object and duplicates cannot
    * exist). Renames every `part-*.parquet` under `base` to
    * `block-<md5-of-file-bytes>.parquet`; when the target name already
    * exists the file's content is byte-identical to a block already
    * stored, and the newcomer is DELETED — re-ingesting an identical
    * batch is a storage-level no-op, exactly the reference's
    * retry-requeue recovery semantics (filesystemStorageAdapter.go:63-81).
    *
    * Scale shape: hashing runs as a Spark job (one task per file — the
    * bytes never touch the driver); the driver handles only the
    * file-count-sized (src → digest) list and issues metadata-only
    * renames/deletes through the base URI's own FileSystem (seam-safe:
    * works on file://, graftfs://, viewfs://, abfss://). Parquet footers,
    * sidecar stats and pruning are name-agnostic, so call this between
    * the write and any sidecar collection.
    */
  def contentAddress(spark: SparkSession, base: String): Unit = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(base)
    val fs = root.getFileSystem(conf)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (n.startsWith("part-") && n.endsWith(".parquet"))
        parts += st.getPath.toString
    }
    if (parts.isEmpty) return
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val digests = parts.toSeq.toDS().repartition(math.min(parts.size, 64))
      .map { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val in = path.getFileSystem(serConf.value).open(path)
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](1 << 16)
        try {
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        (p, md.digest().map(b => java.lang.String.format("%02x", Byte.box(b))).mkString)
      }.collect()
    // Collisions must distinguish WHO owns the name: a block stored by an
    // EARLIER pass means this file is a re-delivered duplicate — delete it
    // (the reference's retried-upload no-op). A name claimed by THIS pass
    // means the batch legitimately contains two byte-identical blocks (a
    // table with >= 2·maxRecordsPerFile identical rows splits into
    // identical files) — suffix an ordinal instead of silently dropping
    // rows. Processing in sorted-src order keeps the suffix assignment —
    // and hence the name set — deterministic for identical content.
    val claimedThisPass = scala.collection.mutable.Set.empty[String]
    digests.sortBy(_._1).foreach { case (src, hex) =>
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val dir = srcPath.getParent
      def target(k: Int): org.apache.hadoop.fs.Path =
        new org.apache.hadoop.fs.Path(dir,
          if (k == 0) s"block-$hex.parquet" else s"block-$hex-$k.parquet")
      var k = 0
      var done = false
      while (!done) {
        val dst = target(k)
        val key = dst.toString
        if (claimedThisPass(key)) k += 1 // same-batch twin: next ordinal
        else if (fs.exists(dst)) {       // stored by an earlier pass: no-op
          fs.delete(srcPath, false)
          done = true
        } else if (fs.rename(srcPath, dst)) {
          claimedThisPass += key
          done = true
        } else throw new java.io.IOException(
          s"content-address rename failed: $src -> $dst")
      }
    }
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
