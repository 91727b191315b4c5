package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.AvroOcf

/** The Avro OCF source/sink on avro-core: exact round trips, the
  * reference's union-with-null unwrap, per-file writer schemas aligning
  * by name, and loud refusal outside the flat-record model.
  */
class AvroOcfSpec extends SparkSuite {

  test("round trip preserves every supported type exactly, nulls included") {
    val sess = spark
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, 2, 3.5, 4.5f, true, "x", Array[Byte](1, 2)),
      Row(null, null, null, null, null, null, null),
      Row(-9L, 0, Double.MinPositiveValue, -0.0f, false, "", Array[Byte]()))
    val df = sess.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
    val dir = tmpDir("graft_avro_rt")
    AvroOcf.write(df.repartition(2), dir)
    val back = AvroOcf.read(sess, dir)
    // union[null, T] unwraps to nullable columns of the same types
    assert(back.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType, true)).toSeq)
    val got = back.collect().map(r => r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }).sortBy(_.toString())
    val want = rows.map(_.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }).sortBy(_.toString())
    assert(got === want)
  }

  test("mixed-era directories align by name; old files null-fill new columns") {
    val sess = spark
    import sess.implicits._
    val dir = tmpDir("graft_avro_era")
    AvroOcf.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    // no mtime gap needed: the table schema is the field-set UNION over
    // every header, not a newest-header-wins pick
    AvroOcf.write(Seq((3L, "c", 30.0)).toDF("id", "v", "score"), dir)
    val back = AvroOcf.read(sess, dir)
    assert(back.columns.toSeq === Seq("id", "v", "score"))
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(got === Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(30.0))))
  }

  test("agg over an OCF written from the events table matches parquet") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val dir = tmpDir("graft_avro_events")
    AvroOcf.write(events, dir)
    val a = AvroOcf.read(spark, dir)
      .agg(count(lit(1)), sum(col("value")), countDistinct(col("user_id")))
      .collect().head
    val b = events
      .agg(count(lit(1)), sum(col("value")), countDistinct(col("user_id")))
      .collect().head
    assert(a.getLong(0) === b.getLong(0) && a.getLong(2) === b.getLong(2))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  test("empty frames round-trip schema-only; era type conflicts refuse") {
    val sess = spark
    import sess.implicits._
    val dir = tmpDir("graft_avro_empty")
    AvroOcf.write(spark.range(0).select(col("id"), lit("x").as("v")), dir)
    val back = AvroOcf.read(sess, dir)
    assert(back.columns.toSeq === Seq("id", "v") && back.count() === 0)
    // same column name, different type across eras -> loud planning error
    val dir2 = tmpDir("graft_avro_conflict")
    AvroOcf.write(Seq((1L, 1)).toDF("id", "v"), dir2)
    AvroOcf.write(Seq((2L, 2L)).toDF("id", "v"), dir2)
    val e = intercept[IllegalArgumentException] { AvroOcf.read(sess, dir2) }
    assert(e.getMessage.contains("conflicting types"))
  }

  test("nested shapes refuse loudly") {
    val sess = spark
    import sess.implicits._
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    intercept[UnsupportedOperationException] {
      AvroOcf.write(nested, tmpDir("graft_avro_bad"))
    }
  }
}
