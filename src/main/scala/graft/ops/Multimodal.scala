package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Multimodal-column pipeline: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded and feature-extracted in
  * batched partition-local calls. Absent from the reference (SURVEY.md
  * §2.2 — north-star extension surface).
  *
  * The decode path is REAL: payloads are genuine PNG images (written and
  * read through the JDK's `javax.imageio.ImageIO` — no external codec
  * jar) and genuine 16-bit PCM WAV files (`javax.sound.sampled`). The
  * "video" payload is a minimal length-prefixed container of PNG frames,
  * so frame sampling demuxes a binary container and codec-decodes the
  * sampled frames, exactly the mapInPandas-with-ffmpeg shape at full
  * fidelity minus only the exotic codecs.
  *
  * Oracle strategy: TESTDATA has no media table, so payloads are
  * synthesized deterministically from `documents` (pixel (x, y) of frame
  * f is an explicit integer formula of (doc_id, x, y, f)). PNG and WAV
  * are lossless, so the features the Spark side computes from DECODED
  * pixels/samples must equal what DuckDB computes from the generating
  * formula — a wrong decode (channel swap, row-order bug, off-by-one
  * demux) breaks the hash match. All emitted features are exact-integer
  * (or single-division / sqrt doubles, which IEEE 754 rounds identically
  * on both engines).
  *
  * Scale notes: payloads are processed partition-locally with zero
  * shuffles; m1 batches bound peak decoded memory to BatchSize images
  * regardless of partition size; a production deployment sets
  * spark.sql.files.maxPartitionBytes low for media tables so one task
  * never holds too many blobs.
  */
object Multimodal {

  /** A media row: opaque container payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String,
                         width: Int, height: Int, n_frames: Int)
  /** Image features from the decoded poster frame — width/height come from
    * the DECODED image, not the stored metadata.
    */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, n_pixels: Long,
                           sum_r: Long, sum_g: Long, sum_b: Long, mean_r: Double)
  case class Frame(doc_id: Long, frame_idx: Int, n_pixels: Long,
                   sum_r: Long, sum_g: Long, sum_b: Long)
  case class Thumb(doc_id: Long, new_w: Int, new_h: Int,
                   t_sum_r: Long, t_sum_g: Long, t_sum_b: Long)
  case class AudioRecord(doc_id: Long, payload: Array[Byte], format: String,
                         sample_rate: Int, n_samples: Int)
  case class AudioFeatures(doc_id: Long, n_samples: Int, sum_abs: Long,
                           max_abs: Int, rms: Double)
  case class AudioWindow(doc_id: Long, win_idx: Int, n: Int,
                         sum_abs: Long, peak: Int, silent: Boolean)

  val BatchSize = 16
  /** Thumbnail bounding box; images are ≥ 8 px per side (below), so the
    * box downsample is always a true downsample (every target cell maps
    * to ≥ 1 source pixel).
    */
  val ThumbDim = 8
  /** Every-other-frame sampling stride (m2). */
  val FrameStride = 2
  val SampleRate = 8000

  // ---- deterministic synthesis (the stand-in for a real media column) ----

  private def widthOf(docId: Long): Int = (8 + docId % 17).toInt   // 8..24
  private def heightOf(docId: Long): Int = (8 + docId % 13).toInt  // 8..20
  private def framesOf(docId: Long): Int = (1 + docId % 4).toInt   // 1..4
  private def samplesOf(docId: Long): Int = (256 + (docId % 32) * 16).toInt

  /** Pixel formula for frame `f` — the ground truth the oracle recomputes. */
  private def rgbAt(docId: Long, x: Int, y: Int, f: Int): Int = {
    val r = ((docId + x + 11L * f) % 256).toInt
    val g = ((2 * docId + y + 23L * f) % 256).toInt
    val b = ((3 * x + 7 * y + 31 * f) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def encodePng(docId: Long, f: Int): Array[Byte] = {
    val w = widthOf(docId); val h = heightOf(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // bulk setRGB: one array store per image, not a sync'd call per pixel
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = rgbAt(docId, x, y, f); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Length-prefixed PNG frame container: [int32 n][int32 len | png]*n. */
  private def buildContainer(docId: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    val n = framesOf(docId)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val png = encodePng(docId, f)
      dos.writeInt(png.length); dos.write(png)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  /** 16-bit little-endian mono PCM WAV; sample i is an explicit formula. */
  private[graft] def buildWav(docId: Long): Array[Byte] = {
    val n = samplesOf(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((docId * 131 + i * 17L) % 65536 - 32768).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // ---- real decode ----

  /** Demux the frame container into raw PNG byte slices. */
  private[graft] def demux(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val dis = new DataInputStream(new ByteArrayInputStream(payload))
    val n = dis.readInt()
    require(n >= 0 && n <= 65536, s"implausible frame count $n — corrupt container")
    (0 until n).map { _ =>
      val len = dis.readInt()
      require(len > 0 && len <= payload.length, s"implausible frame length $len")
      val b = new Array[Byte](len)
      dis.readFully(b)
      b
    }
  }

  private[graft] def decodeImage(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    img
  }

  /** (n_pixels, sum_r, sum_g, sum_b) over every decoded pixel. */
  private[graft] def pixelSums(img: BufferedImage): (Long, Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk read, one call
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      i += 1
    }
    (w.toLong * h, sr, sg, sb)
  }

  /** Real decode, batched: the batch signature (Seq in → Seq out) is the
    * contract a vectorized decoder implements; BatchSize bounds how many
    * decoded images are simultaneously live per task.
    */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val img = decodeImage(r.payload)
      val (n, sr, sg, sb) = pixelSums(img)
      MediaFeatures(r.doc_id, img.getWidth, img.getHeight, n, sr, sg, sb,
        sr.toDouble / n)
    }

  /** Frame sampling: demux the container, decode every FrameStride-th
    * frame, emit per-frame pixel statistics — the row-explosion shape of
    * real video frame sampling, with a real codec in the loop.
    */
  private def frameStats(r: MediaRecord, stride: Int): Seq[Frame] = {
    val frames = demux(r.payload)
    (frames.indices by stride).map { f =>
      val (n, sr, sg, sb) = pixelSums(decodeImage(frames(f)))
      Frame(r.doc_id, f, n, sr, sg, sb)
    }
  }

  private def sampleFrames(r: MediaRecord): Seq[Frame] =
    frameStats(r, FrameStride)

  /** Every frame's stats — the scene-cut detector needs CONSECUTIVE
    * frames, not a sample.
    */
  private def allFrames(r: MediaRecord): Seq[Frame] = frameStats(r, 1)

  /** Aspect-preserving box-average downsample of the decoded poster frame
    * into a ThumbDim-bounded thumbnail: source pixel (x, y) belongs to
    * target cell (x·newW/w, y·newH/h); each thumbnail pixel is the floor
    * mean of its cell — an exact-integer resampling kernel over REAL
    * decoded pixels, so the thumbnail's channel sums are oracle-checkable
    * (interpolating kernels are implementation-defined; this one is math).
    * The thumbnail is materialized as a real BufferedImage (re-encodable
    * to PNG — MultimodalSpec round-trips it); the emitted features are its
    * per-channel sums.
    */
  private[graft] def boxThumbnail(img: BufferedImage): (BufferedImage, Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val maxDim = math.max(w, h)
    val newW = w * ThumbDim / maxDim
    val newH = h * ThumbDim / maxDim
    val cells = newW * newH
    val sr = new Array[Long](cells); val sg = new Array[Long](cells)
    val sb = new Array[Long](cells); val cnt = new Array[Long](cells)
    val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk read, one call
    var y = 0
    while (y < h) {
      val ty = y * newH / h
      var x = 0
      while (x < w) {
        val c = ty * newW + (x * newW / w)
        val rgb = px(y * w + x)
        sr(c) += (rgb >> 16) & 0xff; sg(c) += (rgb >> 8) & 0xff; sb(c) += rgb & 0xff
        cnt(c) += 1
        x += 1
      }
      y += 1
    }
    val thumb = new BufferedImage(newW, newH, BufferedImage.TYPE_INT_RGB)
    val tpx = new Array[Int](cells)
    var tr = 0L; var tg = 0L; var tb = 0L
    var c = 0
    while (c < cells) {
      val r = (sr(c) / cnt(c)).toInt; val g = (sg(c) / cnt(c)).toInt
      val b = (sb(c) / cnt(c)).toInt
      tpx(c) = (r << 16) | (g << 8) | b
      tr += r; tg += g; tb += b
      c += 1
    }
    thumb.setRGB(0, 0, newW, newH, tpx, 0, newW)
    (thumb, tr, tg, tb)
  }

  private def thumbnail(r: MediaRecord): Thumb = {
    val (thumb, tr, tg, tb) = boxThumbnail(decodeImage(r.payload))
    Thumb(r.doc_id, thumb.getWidth, thumb.getHeight, tr, tg, tb)
  }

  /** Real WAV decode through `AudioSystem`: header parse, format check,
    * PCM frame extraction, per-sample statistics.
    */
  private[graft] def audioFeatures(docId: Long, wav: Array[Byte]): AudioFeatures = {
    val bytes = decodePcm(wav)
    val n = bytes.length / 2
    var sumAbs = 0L; var maxAbs = 0; var sumSq = 0L
    var i = 0
    while (i < n) {
      val v = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      sumSq += v.toLong * v
      i += 1
    }
    AudioFeatures(docId, n, sumAbs, maxAbs, math.sqrt(sumSq.toDouble / n))
  }

  /** Decode + validate the PCM payload both audio operators consume:
    * 16-bit little-endian mono, raw sample bytes out — the ONE place the
    * accepted-format contract lives (m4 and m6 must never disagree on
    * which payloads they reject).
    */
  private def decodePcm(wav: Array[Byte]): Array[Byte] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected audio format $fmt")
    ais.readAllBytes()
  }

  /** Windowed energy for voice-activity detection (m6): the decoded PCM
    * stream cut into `winLen`-sample windows, each reduced to abs-sum and
    * peak; `silent` fires when mean |amplitude| is under a quarter of
    * full scale (integer cross-multiplication, no division). The last
    * window is partial when n isn't a multiple of winLen — reported with
    * its true `n`, never padded.
    */
  private[graft] def vadWindows(docId: Long, wav: Array[Byte],
                                winLen: Int): Seq[AudioWindow] = {
    val bytes = decodePcm(wav)
    val n = bytes.length / 2
    (0 until n by winLen).map { start =>
      val end = math.min(start + winLen, n)
      var sumAbs = 0L; var peak = 0
      var i = start
      while (i < end) {
        val v = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
        i += 1
      }
      val w = end - start
      AudioWindow(docId, start / winLen, w, sumAbs, peak,
        silent = sumAbs < 8192L * w)
    }
  }

  // ---- media tables (documents re-materialized as binary columns) ----

  /** Per-doc PNG-frame container table — the `binary` video column. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.table(s, d, "documents").select(col("doc_id")).as[Long]
      .map { id =>
        MediaRecord(id, buildContainer(id), "video/x-graft-png-seq",
          widthOf(id), heightOf(id), framesOf(id))
      }
  }

  /** Per-doc still-image table (the poster frame as a raw PNG payload) —
    * the `binary` image column. m1/m3 consume this: decoding an image
    * column should not pay a video container's full frame-set synthesis
    * (frame 0's pixels are identical either way, so the oracles are
    * unchanged).
    */
  def imageTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.table(s, d, "documents").select(col("doc_id")).as[Long]
      .map(id => MediaRecord(id, encodePng(id, 0), "image/png",
        widthOf(id), heightOf(id), 1))
  }

  /** Per-doc WAV table — the `binary` audio column. */
  def audioTable(s: SparkSession, d: String): Dataset[AudioRecord] = {
    import s.implicits._
    Tables.table(s, d, "documents").select(col("doc_id")).as[Long]
      .map(id => AudioRecord(id, buildWav(id), "audio/wav", SampleRate, samplesOf(id)))
  }

  /** The media tables staged as PARQUET fixtures once per (sf,
    * documents-fingerprint) — so the registered queries read a REAL
    * stored `binary` column (the production shape: media lands in the
    * lake once; every pipeline pass decodes from storage), and their
    * timings measure demux + codec decode, not fixture synthesis.
    */
  def mediaDir(s: SparkSession, d: String): String = {
    import graft.query.RefParity.{cacheBase, stagedTree}
    stagedTree(cacheBase("graft_media", d, "documents")) { tmp =>
      mediaTable(s, d).write.parquet(tmp + "/video")
      imageTable(s, d).write.parquet(tmp + "/image")
      audioTable(s, d).write.parquet(tmp + "/audio")
    }
  }

  private def staged[T: org.apache.spark.sql.Encoder](
      s: SparkSession, d: String, leaf: String): Dataset[T] =
    s.read.parquet(mediaDir(s, d) + "/" + leaf).as[T]

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_features" -> { (s, d) =>
      import s.implicits._
      staged[MediaRecord](s, d, "image")
        .mapPartitions(_.grouped(BatchSize).flatMap(g => decodeBatch(g.toSeq)))
        .toDF()
    },
    "m2_frame_sample" -> { (s, d) =>
      import s.implicits._
      staged[MediaRecord](s, d, "video").flatMap(sampleFrames _).toDF()
    },
    "m3_thumbnail" -> { (s, d) =>
      import s.implicits._
      staged[MediaRecord](s, d, "image").map(thumbnail _).toDF()
    },
    "m4_audio_features" -> { (s, d) =>
      import s.implicits._
      staged[AudioRecord](s, d, "audio")
        .map(r => audioFeatures(r.doc_id, r.payload)).toDF()
    },
    "m5_scene_cuts" -> { (s, d) =>
      // Shot-boundary detection — the video-curation primitive that
      // decides where a training clip starts: decode EVERY frame (m2
      // samples; boundaries live between consecutive frames) and reduce
      // each to per-channel pixel sums per RECORD — one clip's frames
      // are the peak decoded set per row, bounded by clip length rather
      // than m1's BatchSize (images batch; clips are already the batch).
      // One doc-keyed lag window then compares neighbors; a cut fires
      // when the summed absolute channel delta exceeds 65 per pixel —
      // the synthetic drift's no-wrap baseline, so boundaries are the
      // wrap-heavy transitions (~15% at sf0.01) — as an integer
      // cross-multiplication, no division. Frame rows per doc are tiny
      // (n_frames), so the window partition is clip-bounded, never
      // corpus-sized; decode is partition-local, the comparison pure plan.
      import s.implicits._
      val fr = staged[MediaRecord](s, d, "video").flatMap(allFrames _).toDF()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      fr.select(col("doc_id"), col("frame_idx"), col("n_pixels"),
          (col("sum_r") - lag(col("sum_r"), 1).over(w)).as("dr"),
          (col("sum_g") - lag(col("sum_g"), 1).over(w)).as("dg"),
          (col("sum_b") - lag(col("sum_b"), 1).over(w)).as("db"))
        .filter(col("dr").isNotNull)
        .select(col("*"),
          ((abs(col("dr")) + abs(col("dg")) + abs(col("db"))) >
            lit(65L) * col("n_pixels")).as("is_cut"))
    },
    "m6_audio_vad" -> { (s, d) =>
      // Voice-activity windows — the silence-trimming primitive of audio
      // data curation: each stored WAV decodes once (partition-local, no
      // shuffle at all — the per-window reduction happens inside the
      // decode pass, so the operator output is already window-grain) and
      // flags windows whose mean |amplitude| sits under a quarter of full
      // scale. 64-sample windows; the synthetic sawtooth localizes each
      // window's amplitude, so sf0.01 yields a real silent/active mix.
      import s.implicits._
      staged[AudioRecord](s, d, "audio")
        .flatMap(r => vadWindows(r.doc_id, r.payload, 64)).toDF()
    }
  )

  /** The oracle replays the generating pixel/sample formulas with lateral
    * `range()` grids — equal results prove the decode (PNG/WAV are
    * lossless, so decoded values ≡ generated values iff the codec plumbing
    * is right).
    */
  val oracleSql: Map[String, String] = Map(
    "m1_media_features" ->
      """SELECT d.doc_id,
        |  CAST(8 + d.doc_id % 17 AS INT) AS width,
        |  CAST(8 + d.doc_id % 13 AS INT) AS height,
        |  count(*) AS n_pixels,
        |  CAST(sum((d.doc_id + x.x) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*d.doc_id + y.y) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((3*x.x + 7*y.y) % 256) AS BIGINT) AS sum_b,
        |  CAST(sum((d.doc_id + x.x) % 256) AS DOUBLE) / count(*) AS mean_r
        |FROM documents d,
        |     unnest(range(0, 8 + d.doc_id % 17)) AS x(x),
        |     unnest(range(0, 8 + d.doc_id % 13)) AS y(y)
        |GROUP BY d.doc_id""".stripMargin,
    "m2_frame_sample" ->
      """SELECT d.doc_id, CAST(f.f AS INT) AS frame_idx, count(*) AS n_pixels,
        |  CAST(sum((d.doc_id + x.x + 11*f.f) % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((2*d.doc_id + y.y + 23*f.f) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((3*x.x + 7*y.y + 31*f.f) % 256) AS BIGINT) AS sum_b
        |FROM documents d,
        |     unnest(range(0, 1 + d.doc_id % 4, 2)) AS f(f),
        |     unnest(range(0, 8 + d.doc_id % 17)) AS x(x),
        |     unnest(range(0, 8 + d.doc_id % 13)) AS y(y)
        |GROUP BY d.doc_id, f.f""".stripMargin,
    "m3_thumbnail" ->
      """WITH px AS (
        |  SELECT d.doc_id, 8 + d.doc_id % 17 AS w, 8 + d.doc_id % 13 AS h,
        |         x.x AS x, y.y AS y,
        |         (d.doc_id + x.x) % 256 AS r, (2*d.doc_id + y.y) % 256 AS g,
        |         (3*x.x + 7*y.y) % 256 AS b
        |  FROM documents d,
        |       unnest(range(0, 8 + d.doc_id % 17)) AS x(x),
        |       unnest(range(0, 8 + d.doc_id % 13)) AS y(y)
        |), cells AS (
        |  SELECT doc_id,
        |         w * 8 // greatest(w, h) AS new_w, h * 8 // greatest(w, h) AS new_h,
        |         x * (w * 8 // greatest(w, h)) // w AS tx,
        |         y * (h * 8 // greatest(w, h)) // h AS ty,
        |         sum(r) // count(*) AS cr, sum(g) // count(*) AS cg,
        |         sum(b) // count(*) AS cb
        |  FROM px GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT doc_id, CAST(new_w AS INT) AS new_w, CAST(new_h AS INT) AS new_h,
        |       CAST(sum(cr) AS BIGINT) AS t_sum_r, CAST(sum(cg) AS BIGINT) AS t_sum_g,
        |       CAST(sum(cb) AS BIGINT) AS t_sum_b
        |FROM cells GROUP BY 1, 2, 3""".stripMargin,
    "m4_audio_features" ->
      """SELECT d.doc_id,
        |  CAST(256 + (d.doc_id % 32) * 16 AS INT) AS n_samples,
        |  CAST(sum(abs((d.doc_id * 131 + i.i * 17) % 65536 - 32768)) AS BIGINT) AS sum_abs,
        |  CAST(max(abs((d.doc_id * 131 + i.i * 17) % 65536 - 32768)) AS INT) AS max_abs,
        |  sqrt(CAST(sum(((d.doc_id * 131 + i.i * 17) % 65536 - 32768)
        |                * ((d.doc_id * 131 + i.i * 17) % 65536 - 32768)) AS DOUBLE)
        |       / count(*)) AS rms
        |FROM documents d, unnest(range(0, 256 + (d.doc_id % 32) * 16)) AS i(i)
        |GROUP BY d.doc_id""".stripMargin,
    // m5: every frame's channel sums from the generating formula, then
    // the same lag-window delta + per-pixel threshold.
    "m5_scene_cuts" ->
      """WITH fr AS (
        |  SELECT d.doc_id, CAST(f.f AS INT) AS frame_idx, count(*) AS n_pixels,
        |    CAST(sum((d.doc_id + x.x + 11*f.f) % 256) AS BIGINT) AS sum_r,
        |    CAST(sum((2*d.doc_id + y.y + 23*f.f) % 256) AS BIGINT) AS sum_g,
        |    CAST(sum((3*x.x + 7*y.y + 31*f.f) % 256) AS BIGINT) AS sum_b
        |  FROM documents d,
        |       unnest(range(0, 1 + d.doc_id % 4)) AS f(f),
        |       unnest(range(0, 8 + d.doc_id % 17)) AS x(x),
        |       unnest(range(0, 8 + d.doc_id % 13)) AS y(y)
        |  GROUP BY d.doc_id, f.f),
        |dl AS (
        |  SELECT doc_id, frame_idx, n_pixels,
        |    sum_r - lag(sum_r) OVER w AS dr,
        |    sum_g - lag(sum_g) OVER w AS dg,
        |    sum_b - lag(sum_b) OVER w AS db
        |  FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
        |SELECT doc_id, frame_idx, n_pixels, dr, dg, db,
        |  (abs(dr) + abs(dg) + abs(db)) > 65 * n_pixels AS is_cut
        |FROM dl WHERE dr IS NOT NULL""".stripMargin,
    // m6: the generating sample formula grouped into the same 64-sample
    // windows, abs-sum + peak + the quarter-scale silence test.
    "m6_audio_vad" ->
      """WITH s AS (
        |  SELECT d.doc_id, CAST(i.i // 64 AS INT) AS win_idx,
        |    abs((d.doc_id * 131 + i.i * 17) % 65536 - 32768) AS a
        |  FROM documents d,
        |       unnest(range(0, 256 + (d.doc_id % 32) * 16)) AS i(i))
        |SELECT doc_id, win_idx, CAST(count(*) AS INT) AS n,
        |  CAST(sum(a) AS BIGINT) AS sum_abs,
        |  CAST(max(a) AS INT) AS peak,
        |  CAST(sum(a) AS BIGINT) < 8192 * count(*) AS silent
        |FROM s GROUP BY doc_id, win_idx""".stripMargin
  )
}
