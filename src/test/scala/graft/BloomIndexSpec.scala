package graft

import org.apache.spark.sql.functions._
import graft.ingest.{BlockWriter, BloomIndex}
import graft.tables.Tables

/** Per-file Bloom data skipping: the sidecar must prune files for point
  * lookups on non-key columns while returning EXACTLY the full-scan
  * answer (false positives cost a read, never a row).
  */
class BloomIndexSpec extends SparkSuite {

  private lazy val base: String = {
    val dir = tmpDir("graft_bloom")
    // Small caps → many files, so pruning is observable: 1000 events
    // across 8 buckets at ≤128 rows/file ≈ 8+ files.
    BlockWriter.write(Tables.events(spark, sf).drop("ts", "ts_t"),
      dir, partitionCol = "user_id", keyCol = "ts_us",
      numBuckets = 8, maxRecordsPerFile = 128)
    BloomIndex.build(spark, dir, "event_id")
    dir
  }

  test("point lookup equals the full-scan filter and prunes files") {
    val viaIndex = BloomIndex.lookup(spark, base, "event_id", lit(777L))
      .select("event_id", "user_id", "ts_us").collect().toSet
    val direct = spark.read.parquet(base).filter(col("event_id") === 777L)
      .select("event_id", "user_id", "ts_us").collect().toSet
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty, "event 777 exists at sf0.001")
    val (files, total) = BloomIndex.candidateFiles(spark, base, "event_id", lit(777L))
    assert(total > 4, s"layout must have several files, got $total")
    assert(files.nonEmpty && files.size < total,
      s"index must prune: ${files.size} of $total files survive")
  }

  test("absent key returns an empty, schema-correct result") {
    val out = BloomIndex.lookup(spark, base, "event_id", lit(10000000L))
    assert(out.columns.contains("event_id") && out.columns.contains("bucket"))
    assert(out.isEmpty)
    // With 16 bits/key the absent id should survive in no file at all —
    // the lookup then never touches a data file.
    val (files, _) = BloomIndex.candidateFiles(spark, base, "event_id", lit(10000000L))
    assert(files.isEmpty, s"expected full prune, got ${files.size} fp files")
  }

  test("incremental update indexes only appended files and keeps old entries verbatim") {
    val dir = tmpDir("graft_bloom_upd")
    val ev = Tables.events(spark, sf).drop("ts", "ts_t")
    BlockWriter.write(ev.filter(col("event_id") < 500), dir,
      partitionCol = "user_id", keyCol = "ts_us", numBuckets = 4, maxRecordsPerFile = 128)
    BloomIndex.build(spark, dir, "event_id")
    val before = spark.read.parquet(BloomIndex.sidecar(dir, "event_id"))
      .collect().map(r => r.getString(0)).toSet
    // append the other half, then update incrementally
    BlockWriter.append(ev.filter(col("event_id") >= 500), dir,
      partitionCol = "user_id", keyCol = "ts_us", numBuckets = 4, maxRecordsPerFile = 128)
    BloomIndex.update(spark, dir, "event_id")
    val after = spark.read.parquet(BloomIndex.sidecar(dir, "event_id"))
      .collect().map(r => r.getString(0)).toSet
    assert(before.subsetOf(after), "existing entries must carry verbatim")
    assert(after.size > before.size, "appended files must gain entries")
    // a key only in the appended half is found through the updated index
    val viaIndex = BloomIndex.lookup(spark, dir, "event_id", lit(700L))
      .select("event_id", "user_id", "ts_us").collect().toSet
    val direct = spark.read.parquet(dir).filter(col("event_id") === 700L)
      .select("event_id", "user_id", "ts_us").collect().toSet
    assert(viaIndex === direct && viaIndex.nonEmpty)
    // no-op update (nothing new) leaves the sidecar unchanged
    BloomIndex.update(spark, dir, "event_id")
    val again = spark.read.parquet(BloomIndex.sidecar(dir, "event_id"))
      .collect().map(r => r.getString(0)).toSet
    assert(again === after)
  }

  test("build, incremental update, and lookup run on a non-file scheme (graftfs://)") {
    // The sidecar swap (retire → publish renames) and _SUCCESS probe go
    // through the Hadoop FileSystem of the base's scheme — pinned here on
    // a registry-resolved non-file FS, the abfss:// stand-in.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val dir = "graftfs://" + tmpDir("graft_bloom_scheme") + "/blocks"
    val ev = Tables.events(spark, sf).drop("ts", "ts_t")
    BlockWriter.write(ev.filter(col("event_id") < 500), dir,
      partitionCol = "user_id", keyCol = "ts_us", numBuckets = 4, maxRecordsPerFile = 128)
    BloomIndex.build(spark, dir, "event_id")
    BlockWriter.append(ev.filter(col("event_id") >= 500), dir,
      partitionCol = "user_id", keyCol = "ts_us", numBuckets = 4, maxRecordsPerFile = 128)
    BloomIndex.update(spark, dir, "event_id")
    val viaIndex = BloomIndex.lookup(spark, dir, "event_id", lit(700L))
      .select("event_id", "user_id", "ts_us").collect().toSet
    val direct = spark.read.parquet(dir).filter(col("event_id") === 700L)
      .select("event_id", "user_id", "ts_us").collect().toSet
    assert(viaIndex === direct && viaIndex.nonEmpty)
    val (files, total) = BloomIndex.candidateFiles(spark, dir, "event_id", lit(700L))
    assert(files.nonEmpty && files.size < total,
      s"index must prune on graftfs: ${files.size} of $total files survive")
  }

  test("string column round-trips through the typed probe cast") {
    // The probe literal is cast to the layout column's type before
    // hashing — a string column indexed and probed with a string literal
    // must behave identically to the long path.
    BloomIndex.build(spark, base, "event_type")
    val et = spark.read.parquet(base).select("event_type").head.getString(0)
    val viaIndex = BloomIndex.lookup(spark, base, "event_type", lit(et))
      .agg(count(lit(1))).head.getLong(0)
    val direct = spark.read.parquet(base)
      .filter(col("event_type") === et).count()
    assert(viaIndex === direct && direct > 0)
  }
}
