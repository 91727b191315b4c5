package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal-column pipeline: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched partition-local calls. Absent from the reference (SURVEY.md
  * §2.2 — north-star extension surface).
  *
  * The real decode libraries aren't in this container, so `decodeBatch` is
  * a clearly-marked DETERMINISTIC STUB (hashes standing in for pixel
  * features); everything Spark-side — the schema, the binary payload
  * column, the Dataset encoders, the batched mapPartitions shape (the
  * Scala analogue of mapInPandas' Arrow batches), the flatMap frame
  * sampler — is real and oracle-tested.
  *
  * Scale notes: payloads are processed partition-locally with zero
  * shuffles; batches bound peak memory to BatchSize payloads regardless of
  * partition size; a production deployment sets
  * spark.sql.files.maxPartitionBytes low for media tables so one task
  * never holds too many blobs.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the storage schema). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String,
                         width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, content_sha: String,
                           width: Int, height: Int)
  case class Frame(doc_id: Long, frame_idx: Int, frame_hash: String)

  val BatchSize = 16

  private def sha256Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** STUB decode: a real implementation hands the batch to an image/audio
    * codec (libjpeg/ffmpeg/...) and returns pixel/spectrogram features.
    * Here: content hash + size, deterministic so the oracle can check the
    * plumbing. The batch signature (Seq in → Seq out) is the contract a
    * native decoder would implement.
    */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      MediaFeatures(r.doc_id, r.payload.length, sha256Hex(r.payload), r.width, r.height)
    }

  /** STUB frame sampler: emits ceil(bytes/256) (≤4) "frames" per payload,
    * each hashed with its index — the row-explosion shape of real video
    * frame sampling.
    */
  private def sampleFrames(r: MediaRecord): Seq[Frame] = {
    val n = math.min(r.payload.length / 256 + 1, 4)
    (0 until n).map { i =>
      Frame(r.doc_id, i, md5Hex(r.payload ++ s"#$i".getBytes("UTF-8")))
    }
  }

  /** documents.text re-materialized as a binary media table — stands in for
    * a real `binary` source column (TESTDATA has no media table).
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.table(s, d, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("fake/jpeg").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaRecord]
  }

  case class Thumb(doc_id: Long, new_w: Int, new_h: Int, thumb_hash: String)

  val ThumbMaxDim = 64

  /** STUB resize: computes the aspect-preserving target geometry exactly as
    * a real resizer would, then hashes a payload prefix in place of actual
    * pixel resampling. Geometry math is the real contract (it decides
    * storage and downstream model input shapes); only the pixel kernel is
    * faked.
    */
  private def thumbnail(r: MediaRecord): Thumb = {
    val maxDim = math.max(math.max(r.width, r.height), 1)
    val newW = r.width * ThumbMaxDim / maxDim
    val newH = r.height * ThumbMaxDim / maxDim
    Thumb(r.doc_id, newW, newH, md5Hex(r.payload.take(256)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_features" -> { (s, d) =>
      import s.implicits._
      mediaTable(s, d)
        .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeBatch(g.toSeq)))
        .toDF()
    },
    "m2_frame_sample" -> { (s, d) =>
      import s.implicits._
      mediaTable(s, d).flatMap(sampleFrames _).toDF()
    },
    "m3_thumbnail" -> { (s, d) =>
      import s.implicits._
      mediaTable(s, d).map(thumbnail _).toDF()
    }
  )

  val oracleSql: Map[String, String] = Map(
    // text is ASCII so chars == bytes and DuckDB's string hashes equal the
    // stub's byte hashes.
    "m1_media_features" ->
      """SELECT doc_id, length(text) AS n_bytes, sha256(text) AS content_sha,
        |  CAST(n_chars % 640 AS INT) AS width, CAST(n_chars % 480 AS INT) AS height
        |FROM documents""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  md5(text || '#' || CAST(i AS VARCHAR)) AS frame_hash
        |FROM documents, unnest(range(0, least(length(text) // 256 + 1, 4))) AS t(i)""".stripMargin,
    // integer division replicates the JVM's truncating int arithmetic
    "m3_thumbnail" ->
      """SELECT doc_id,
        |  CAST((n_chars % 640) * 64 // greatest(greatest(n_chars % 640, n_chars % 480), 1) AS INT) AS new_w,
        |  CAST((n_chars % 480) * 64 // greatest(greatest(n_chars % 640, n_chars % 480), 1) AS INT) AS new_h,
        |  md5(substring(text, 1, 256)) AS thumb_hash
        |FROM documents""".stripMargin
  )
}
