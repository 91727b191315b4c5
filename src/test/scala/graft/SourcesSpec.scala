package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TextSources

/** Round-trip contracts for the schema'd text sources and the binary-file
  * source (the multimodal on-disk entry point).
  */
class SourcesSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  test("CSV round trip under an explicit schema (no inference)") {
    val dir = tmpDir("graft_csv_spec") + "/out"
    val df = spark.range(100).select(
      col("id"), concat(lit("n"), col("id")).as("name"),
      (col("id") * 1.5).as("score"))
    df.coalesce(1).write.option("header", "true").csv(dir)
    val back = TextSources.readCsv(spark, dir, schema)
    assert(back.count() === 100)
    // file sources force nullable=true; names and types must match exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.agg(sum(col("score"))).head.getDouble(0) === 99 * 100 / 2 * 1.5)
  }

  test("JSON-lines round trip; malformed rows are nulls, not job failures") {
    val dir = tmpDir("graft_json_spec")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.json"),
      """{"id": 1, "name": "a", "score": 2.5}
        |{"id": 2, "name": "b", "score": 3.5}
        |this line is not json
        |{"id": 4, "name": null, "score": null}
        |""".stripMargin)
    val back = TextSources.readJsonLines(spark, dir, schema)
    assert(back.count() === 4) // corrupt line becomes an all-null row
    assert(back.filter(col("id").isNotNull).count() === 3)
  }

  test("ORC round trip under an explicit schema, file size bounded") {
    val dir = tmpDir("graft_orc_spec") + "/out"
    val df = spark.range(100).select(
      col("id"), concat(lit("n"), col("id")).as("name"),
      (col("id") * 1.5).as("score"))
    TextSources.writeOrc(df, dir, maxRecordsPerFile = 40)
    val back = TextSources.readOrc(spark, dir, schema)
    assert(back.count() === 100)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.agg(sum(col("score"))).head.getDouble(0) === 99 * 100 / 2 * 1.5)
    // maxRecordsPerFile must bound the files like BlockWriter's MaxSize
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".orc"))
    assert(files >= 3, s"expected >=3 bounded files, got $files")
  }

  test("text source reads raw lines with file provenance") {
    val dir = tmpDir("graft_text_spec")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard0.txt"), "alpha\nbeta\ngamma\n")
    val back = TextSources.readTextLines(spark, dir)
    assert(back.count() === 3)
    assert(back.columns.toSeq === Seq("value", "src_file"))
    assert(back.select(col("value")).collect().map(_.getString(0)).sorted.toSeq ===
      Seq("alpha", "beta", "gamma"))
    assert(back.select(col("src_file")).head.getString(0).endsWith("shard0.txt"))
  }

  test("BlockWriter layout is URI-agnostic: explicit file:// base round-trips") {
    // The object-store seam (reference azureStorageAdapter.go:34-227): the
    // writer/reader take a Hadoop-filesystem URI, never a java.io path, so
    // the Azure deployment is the SAME code with an abfss://container@acct
    // base once hadoop-azure is on the classpath — the ABFS connector then
    // owns what the reference hand-rolls (4 MB staged block uploads,
    // prefix-scoped paginated listing). No jar is available offline, so
    // this pins the contract through the file:// scheme: if any path in
    // the write→prune→read chain assumed local-FS semantics, an explicit
    // URI base would break it.
    import graft.ingest.BlockWriter
    val sess = spark
    import sess.implicits._
    val base = "file://" + tmpDir("graft_uri_seam") + "/blocks"
    val df = (0L until 512L).map(i => (i % 16, i, s"p$i")).toDF("user_id", "ts_us", "payload")
    BlockWriter.write(df, base, partitionCol = "user_id", keyCol = "ts_us")
    val back = graft.query.RangeQuery.query(spark, base, "user_id", "ts_us",
      lit(7L), lit(100L), lit(400L))
    val expected = df.filter(col("user_id") === 7L && col("ts_us").between(100L, 400L))
    assert(back.select(col("ts_us")).collect().map(_.getLong(0)).sorted.toSeq ===
      expected.select(col("ts_us")).collect().map(_.getLong(0)).sorted.toSeq)
    assert(back.count() > 0)
  }

  test("BlockWriter resolves a NON-file scheme from the Hadoop registry (graftfs://)") {
    // Completes the object-store seam proof: the file:// case above shows
    // URI handling, but file:// is also the default FS — it cannot show
    // that the chain LOOKS UP the filesystem by scheme. graftfs:// is a
    // local-disk FS registered only through fs.graftfs.impl, the same
    // registry entry an abfss:// deployment uses for the ABFS connector;
    // any hardcoded default-FS or java.io assumption fails this test.
    import graft.ingest.BlockWriter
    val sess = spark
    import sess.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val base = "graftfs://" + tmpDir("graft_scheme_seam") + "/blocks"
    val df = (0L until 512L).map(i => (i % 16, i, s"p$i")).toDF("user_id", "ts_us", "payload")
    BlockWriter.write(df, base, partitionCol = "user_id", keyCol = "ts_us")
    val back = graft.query.RangeQuery.query(spark, base, "user_id", "ts_us",
      lit(7L), lit(100L), lit(400L))
    val expected = df.filter(col("user_id") === 7L && col("ts_us").between(100L, 400L))
    assert(back.select(col("ts_us")).collect().map(_.getLong(0)).sorted.toSeq ===
      expected.select(col("ts_us")).collect().map(_.getLong(0)).sorted.toSeq)
    assert(back.count() > 0)
  }

  test("the ingest chain runs on a SECOND Hadoop-shipped FileSystem (viewfs://)") {
    // r14: broadens the §2.1 #11 seam evidence beyond the in-repo
    // graftfs subclass. ViewFileSystem is a real second implementation
    // SHIPPED with Hadoop — client-side mount-table path resolution and
    // stricter rename semantics (cross-mount renames refuse outright) —
    // so the write→prune→read chain passing here shows the seam binds by
    // scheme to an independently-written FileSystem, not just to our own
    // RawLocal subclass.
    import graft.ingest.BlockWriter
    val sess = spark
    import sess.implicits._
    val local = tmpDir("graft_viewfs_seam")
    spark.sparkContext.hadoopConfiguration
      .set("fs.viewfs.mounttable.graftcluster.link./data", "file:" + local)
    val base = "viewfs://graftcluster/data/blocks"
    val df = (0L until 512L).map(i => (i % 16, i, s"p$i")).toDF("user_id", "ts_us", "payload")
    BlockWriter.write(df, base, partitionCol = "user_id", keyCol = "ts_us")
    val back = graft.query.RangeQuery.query(spark, base, "user_id", "ts_us",
      lit(7L), lit(100L), lit(400L))
    val expected = df.filter(col("user_id") === 7L && col("ts_us").between(100L, 400L))
    assert(back.select(col("ts_us")).collect().map(_.getLong(0)).sorted.toSeq ===
      expected.select(col("ts_us")).collect().map(_.getLong(0)).sorted.toSeq)
    assert(back.count() > 0)
  }

  test("binaryFile source reads payload bytes with path metadata, glob-filtered") {
    val dir = tmpDir("graft_bin_spec")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.jpg"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "b.jpg"), Array[Byte](9, 8))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "notes.txt"), "not media")
    val media = TextSources.readBinaryDir(spark, dir, glob = "*.jpg")
    val rows = media.select(col("path"), col("length"), col("content")).collect()
    assert(rows.length === 2, "glob must exclude the .txt file")
    val byName = rows.map(r => (r.getString(0).split('/').last,
      r.getAs[Array[Byte]]("content"))).toMap
    assert(byName("a.jpg").toSeq === Seq[Byte](1, 2, 3, 4))
    assert(byName("b.jpg").toSeq === Seq[Byte](9, 8))
  }
}
