package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink on avro-core — the reference's
  * native block format (streamAdapter.go:15-42 writes OCF blocks;
  * filesystemStorageAdapter.go:50-60 reads them), previously substituted
  * with parquet because the spark-avro CONNECTOR is absent offline; the
  * avro runtime itself ships with Spark, so the format reads and writes
  * natively here:
  *
  *  - **schema**: one driver-side header read maps the Avro record schema
  *    to a Spark StructType; `union[null, T]` fields unwrap to nullable
  *    columns — the reference's union-unwrap projection (§2.1 #3) exactly;
  *  - **read**: the OCF files list through Spark's `binaryFile` source
  *    (distributed, one task per file) and decode per-partition with
  *    `DataFileStream` — each file decodes under its OWN embedded writer
  *    schema, then aligns to the table schema BY NAME (missing fields
  *    null-fill), so mixed-schema directories read like the reference's
  *    lenient block listing. Per-FILE parallelism is the granularity:
  *    OCF splits only at sync markers, and the reference's blocks are
  *    flush-bounded (8192 rows) — many small files, not one huge one;
  *  - **write**: one OCF file per partition via `foreachPartition`,
  *    task-unique names so speculative/retried tasks never collide, every
  *    field wrapped `union[null, T]` like the reference's writer.
  *
  * Flat records of primitive types only — the reference's data model
  * (SURVEY §1); nested shapes refuse loudly rather than half-work.
  */
object AvroOcf {

  // ----- schema mapping

  private def unwrap(s: Schema): (Schema, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes
      import scala.jdk.CollectionConverters._
      val nonNull = branches.asScala.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only union-with-null unwraps; got $s")
      (nonNull.head, nonNull.size < branches.size)
    case _ => (s, false)
  }

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.ENUM    => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.FIXED   => BinaryType
    case other => throw new UnsupportedOperationException(
      s"avro type $other is outside the flat-record model this source supports")
  }

  /** Avro record schema → Spark schema (union-with-null → nullable). */
  def toStruct(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD, s"not a record schema: $record")
    import scala.jdk.CollectionConverters._
    StructType(record.getFields.asScala.toSeq.map { f =>
      val (inner, nullable) = unwrap(f.schema)
      StructField(f.name, sparkType(inner), nullable)
    })
  }

  /** Spark schema → Avro record schema, every field `union[null, T]` —
    * the reference writer's convention, and what makes re-reading unwrap
    * to the same nullable columns.
    */
  def toAvro(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new UnsupportedOperationException(
          s"column ${f.name}: $other is outside the flat-record model")
      }
      val union = Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      fields.add(new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, null, "graft", false, fields)
  }

  // ----- read

  private def decodeValue(v: Any, t: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: String => s
    case e: GenericData.EnumSymbol => e.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: GenericData.Fixed => f.bytes().clone()
    case other => other // primitives pass through
  }

  /** Read every `.avro` OCF under `dir` (non-recursive) as a DataFrame.
    * The table schema is the NAME-UNION of every file's header fields
    * (newest-first field order — deterministic under mtime ties, unlike a
    * newest-header-wins pick), with a type conflict across eras refusing
    * loudly at planning time; files with fewer fields null-fill by NAME
    * at decode time. Header reads are one per file, driver-side —
    * listing-sized metadata IO, the same class as the snapshot layer's
    * manifest reads.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".avro"))
      .sortBy(f => (f.getModificationTime, f.getPath.getName))
    require(files.nonEmpty, s"no .avro files under $dir")
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    files.reverse.foreach { f =>
      val in = fs.open(f.getPath)
      try {
        val header = new DataFileStream(in,
          new GenericDatumReader[GenericRecord]()).getSchema
        toStruct(header).fields.foreach { sf =>
          fields.get(sf.name) match {
            case None => fields += sf.name -> sf.copy(nullable = true)
            case Some(prev) => require(prev.dataType == sf.dataType,
              s"column ${sf.name} has conflicting types across OCF eras: " +
                s"${prev.dataType} vs ${sf.dataType} (${f.getPath.getName})")
          }
        }
      } finally in.close()
    }
    val schema = StructType(fields.values.toSeq)
    val fieldNames = schema.fieldNames.toSeq
    val fieldTypes = schema.fields.map(_.dataType).toSeq
    val rows = spark.read.format("binaryFile")
      .load(files.map(_.getPath.toString): _*)
      .select(col("content")).rdd.flatMap { r =>
        // The raw byte[] is resident per task (binaryFile's granularity),
        // but decoding streams LAZILY: buffering every decoded Row before
        // returning would hold file-bytes AND all rows at once, so one
        // large container file could OOM a task even though the format is
        // stream-decodable. The iterator closes the stream on exhaustion;
        // an abandoned iterator leaks nothing beyond the heap bytes the
        // task already holds (ByteArrayInputStream has no OS resources).
        val bytes = r.getAs[Array[Byte]](0)
        val stream = new DataFileStream(
          new java.io.ByteArrayInputStream(bytes),
          new GenericDatumReader[GenericRecord]()) // per-file writer schema
        new Iterator[Row] {
          private var open = true
          def hasNext: Boolean = open && {
            if (stream.hasNext) true
            else { stream.close(); open = false; false }
          }
          def next(): Row = {
            if (!hasNext) throw new NoSuchElementException("exhausted OCF stream")
            val rec = stream.next()
            val recSchema = rec.getSchema
            Row.fromSeq(fieldNames.zip(fieldTypes).map { case (n, t) =>
              if (recSchema.getField(n) == null) null // absent in this era
              else decodeValue(rec.get(n), t)
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  // ----- write

  private def encodeValue(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }

  /** Write `df` as one OCF file per partition under `dir`, with a
    * write-then-rename commit per task: the final `part-<pid>.avro` name
    * is claimed by a RENAME that fails when the destination exists, so a
    * retried or speculative attempt can never leave a second readable
    * copy of a partition (the loser deletes its staging file) — unique
    * temp names alone would prevent collision but not duplication. The
    * session's Hadoop conf travels to the tasks as properties (a bare
    * executor-side Configuration would drop spark.hadoop.* credentials).
    * An empty frame still commits one schema-only file, so the round
    * trip preserves schema.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = toAvro(df.schema).toString
    val names = df.schema.fieldNames.toSeq
    val dirStr = dir
    // One driver-side id per write() call, captured into the task
    // closure: retried attempts of the same job share it (so the rename
    // dedups them), while a LATER write() to the same directory appends
    // under fresh names instead of colliding with committed files.
    val jobId = java.util.UUID.randomUUID().toString.take(8)
    val confProps: Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      df.sparkSession.sessionState.newHadoopConf().iterator().asScala
        .map(e => e.getKey -> e.getValue).toSeq
    }
    def taskConf(): Configuration = {
      val c = new Configuration(false)
      confProps.foreach { case (k, v) => c.set(k, v) }
      c
    }
    def writeOne(conf: Configuration, rows: Iterator[Row], pid: Int): Unit = {
      val schema = new Schema.Parser().parse(schemaJson)
      val target = new Path(dirStr, s"part-$jobId-$pid.avro")
      val tmp = new Path(dirStr,
        s".tmp-$jobId-$pid-${java.util.UUID.randomUUID().toString.take(8)}.avro")
      val fs = target.getFileSystem(conf)
      fs.mkdirs(target.getParent)
      val out = fs.create(tmp, false)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      try {
        writer.create(schema, out)
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          names.zipWithIndex.foreach { case (n, i) =>
            rec.put(n, encodeValue(r.get(i)))
          }
          writer.append(rec)
          ()
        }
      } finally writer.close() // closes the stream
      // Claim the final name. rename-fails-on-existing is the commit
      // primitive on HDFS/ABFS, but RawLocalFileSystem (and some
      // object-store adapters) OVERWRITE on rename — so check the target
      // first and stand down if a sibling attempt already committed. The
      // check-then-rename window is not zero on such stores; a racer
      // landing inside it overwrites with ROW-IDENTICAL content (same
      // rows, same schema, same jobId — only the random OCF sync marker
      // differs), so the residual failure mode is idempotent overwrite,
      // never a duplicate readable copy.
      if (fs.exists(target) || !fs.rename(tmp, target))
        fs.delete(tmp, false) // lost to a sibling attempt
      ()
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = Option(org.apache.spark.TaskContext.get())
          .map(_.partitionId()).getOrElse(0)
        writeOne(taskConf(), rows, pid)
      }
    }
    // all partitions empty: commit the schema alone from the driver
    val fs = new Path(dirStr).getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dirStr)) ||
        !fs.listStatus(new Path(dirStr)).exists(_.getPath.getName.endsWith(".avro")))
      writeOne(df.sparkSession.sessionState.newHadoopConf(),
        Iterator.empty, pid = 0)
  }
}
