package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.ops.Multimodal

/** Real-decode guarantees for the multimodal pillar: PNG pixel round
  * trips through ImageIO, container demux, exact box-downsample values,
  * WAV decode — all against hand-computed or independently recomputed
  * expectations (the oracle covers the corpus-scale identity; these pin
  * the kernels on known inputs).
  */
class MultimodalSpec extends SparkSuite {

  private def png(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length; val w = pixels(0).length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("PNG encode→decode round-trips every pixel exactly (lossless codec)") {
    val pixels = Array(
      Array(0xff0000, 0x00ff00),
      Array(0x0000ff, 0x123456))
    val img = Multimodal.decodeImage(png(pixels))
    assert(img.getWidth == 2 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 2)
      assert((img.getRGB(x, y) & 0xffffff) == pixels(y)(x),
        s"pixel ($x,$y) corrupted in round trip")
  }

  test("pixelSums computes known channel sums from a decoded image") {
    // r: 255 + 0 + 0 + 0x12; g: 0 + 255 + 0 + 0x34; b: 0 + 0 + 255 + 0x56
    val pixels = Array(
      Array(0xff0000, 0x00ff00),
      Array(0x0000ff, 0x123456))
    val (n, sr, sg, sb) = Multimodal.pixelSums(Multimodal.decodeImage(png(pixels)))
    assert(n == 4)
    assert(sr == 255 + 0x12)
    assert(sg == 255 + 0x34)
    assert(sb == 255 + 0x56)
  }

  test("box thumbnail: 4x4 → exact floor cell means, re-encodable as PNG") {
    // 4x4 grayscale ramp 0,10,...,150 row-major; ThumbDim=8 but maxDim=4 <
    // 8 would upscale — so build a 16x16 image instead (maxDim 16 → 8x8
    // thumb, 2x2 cells). Value at (x, y) = y*16 + x (fits a channel).
    val pixels = Array.tabulate(16, 16) { (y, x) =>
      val v = (y * 16 + x) & 0xff; (v << 16) | (v << 8) | v
    }
    val (thumb, tr, tg, tb) = Multimodal.boxThumbnail(Multimodal.decodeImage(png(pixels)))
    assert(thumb.getWidth == 8 && thumb.getHeight == 8)
    // Cell (tx, ty) covers source {2tx, 2tx+1}x{2ty, 2ty+1}; mean of the
    // four values (16*2ty + 2tx) + {0, 1, 16, 17} is 16*2ty + 2tx + 8 —
    // wait: (0+1+16+17)/4 = 8.5 → floor 8. Recompute independently:
    var expect = 0L
    for (ty <- 0 until 8; tx <- 0 until 8) {
      val vals = for (dy <- 0 to 1; dx <- 0 to 1)
        yield ((2 * ty + dy) * 16 + (2 * tx + dx)) & 0xff
      expect += vals.sum / 4
    }
    assert(tr == expect && tg == expect && tb == expect)
    // thumbnail pixel (0,0): floor((0+1+16+17)/4) = 8
    assert((thumb.getRGB(0, 0) & 0xff) == 8)
    // the thumbnail is a real image: PNG re-encode → decode preserves it
    val out = new ByteArrayOutputStream()
    ImageIO.write(thumb, "png", out)
    val back = Multimodal.decodeImage(out.toByteArray)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(back.getRGB(x, y) == thumb.getRGB(x, y))
  }

  test("container demux + frame decode match the generating formula") {
    val rec = Multimodal.mediaTable(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 5L).head()
    assert(rec.n_frames == 2) // 1 + 5 % 4
    val frames = Multimodal.demux(rec.payload)
    assert(frames.size == 2)
    val img0 = Multimodal.decodeImage(frames(0))
    assert(img0.getWidth == 13 && img0.getHeight == 13) // 8 + 5%17, 8 + 5%13
    // frame 0 pixel (0, 0): r = 5, g = 10, b = 0
    assert((img0.getRGB(0, 0) & 0xffffff) == ((5 << 16) | (10 << 8)))
    // frame 1 pixel (2, 3): r = (5+2+11)%256, g = (10+3+23)%256, b = (6+21+31)%256
    val img1 = Multimodal.decodeImage(frames(1))
    assert((img1.getRGB(2, 3) & 0xffffff) == ((18 << 16) | (36 << 8) | 58))
  }

  test("corrupt container fails loudly, not with garbage features") {
    intercept[Exception] { Multimodal.demux(Array[Byte](1, 2, 3)) }
    val bogus = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bogus)
    dos.writeInt(1); dos.writeInt(4); dos.write(Array[Byte](9, 9, 9, 9))
    intercept[Exception] { Multimodal.decodeImage(Multimodal.demux(bogus.toByteArray).head) }
  }

  test("box thumbnail: exact fiber means across the full size sweep") {
    // every (w, h) geometry the synthesis can produce (8..24 x 8..20):
    // thumbnail sums must equal an independent fiber recompute
    for (w <- 8 to 24; h <- 8 to 20 by 3) {
      val pixels = Array.tabulate(h, w) { (y, x) =>
        val v = (x * 7 + y * 13) & 0xff; (v << 16) | (v << 8) | v
      }
      val (thumb, tr, _, _) = Multimodal.boxThumbnail(Multimodal.decodeImage(png(pixels)))
      val maxDim = math.max(w, h)
      val (newW, newH) = (w * 8 / maxDim, h * 8 / maxDim)
      assert(thumb.getWidth == newW && thumb.getHeight == newH, s"geometry $w x $h")
      val sums = Array.fill(newW * newH)(0L)
      val cnts = Array.fill(newW * newH)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val c = (y * newH / h) * newW + (x * newW / w)
        sums(c) += (x * 7 + y * 13) & 0xff; cnts(c) += 1
      }
      assert(cnts.forall(_ > 0), s"empty fiber at $w x $h")
      val expect = sums.indices.map(i => sums(i) / cnts(i)).sum
      assert(tr == expect, s"sum mismatch at $w x $h")
    }
  }

  test("WAV decode recovers every 16-bit sample (incl. -32768 endpoint)") {
    val docId = 0L // sample 0 is -32768, the asymmetric short endpoint
    val feats = Multimodal.audioFeatures(docId, Multimodal.buildWav(docId))
    // independent recompute from the generating formula
    val n = 256
    val vals = (0 until n).map(i => ((docId * 131 + i * 17L) % 65536 - 32768).toInt)
    assert(feats.n_samples == n)
    assert(feats.max_abs == 32768)
    assert(feats.sum_abs == vals.map(v => math.abs(v).toLong).sum)
    val sumSq = vals.map(v => v.toLong * v).sum
    assert(feats.rms == math.sqrt(sumSq.toDouble / n))
  }

  test("m5: scene cuts cover every consecutive frame pair and fire on a real mix") {
    import org.apache.spark.sql.functions._
    val out = graft.ops.Multimodal.queries("m5_scene_cuts")(spark, sf)
    val rows = out.collect()
    // one transition row per consecutive frame pair: docs have
    // 1 + doc_id % 4 frames, so doc_id % 4 transitions each
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = docs.map(_ % 4).sum
    assert(rows.length.toLong === expected)
    // the threshold discriminates: cuts exist and non-cuts exist
    val cuts = rows.count(_.getBoolean(rows.head.fieldIndex("is_cut")))
    assert(cuts > 0 && cuts < rows.length)
  }

  test("m7: aHash64 matches a hand-computed signature on an 8x8 two-tone image") {
    // left half dark (luma 0), right half bright (luma 255*(299+587+114) =
    // 255000): cells 0-3 of each row are 0, cells 4-7 are 255000; the grid
    // mean is 127500·64/64, so exactly the bright cells exceed it — the
    // signature is the 0xF0 column mask repeated over 8 rows.
    val pixels = Array.tabulate(8, 8)((_, x) => if (x < 4) 0x000000 else 0xffffff)
    val sig = Multimodal.aHash64(Multimodal.decodeImage(png(pixels)))
    val expect = (0 until 64).filter(c => c % 8 >= 4).map(1L << _).reduce(_ | _)
    assert(sig === expect)
  }

  test("m7: aHash is invariant to a uniform brightness shift (mean-threshold)") {
    val base = Array.tabulate(12, 16)((y, x) => ((x * 37 + y * 91) % 200) * 0x010101)
    val shifted = base.map(_.map { p =>
      val d = 40
      (((p >> 16 & 0xff) + d) << 16) | (((p >> 8 & 0xff) + d) << 8) | ((p & 0xff) + d)
    })
    assert(Multimodal.aHash64(Multimodal.decodeImage(png(base))) ===
      Multimodal.aHash64(Multimodal.decodeImage(png(shifted))))
  }

  test("m7: posterize quantizes every channel to floor multiples of 4") {
    val img = Multimodal.posterize(Multimodal.decodeImage(png(Array(
      Array(0x070503, 0xfffefc)))))
    assert((img.getRGB(0, 0) & 0xffffff) === 0x040400)
    assert((img.getRGB(1, 0) & 0xffffff) === 0xfcfcfc)
  }

  test("m7: nnResize samples source (x*w/w2, y*h/h2) and clamps at 8 px") {
    // 16x12 -> 12x9: target (x, y) reads source (x*16/12, y*12/9)
    val pixels = Array.tabulate(12, 16)((y, x) => (x << 16) | (y << 8))
    val img = Multimodal.nnResize(Multimodal.decodeImage(png(pixels)))
    assert(img.getWidth === 12 && img.getHeight === 9)
    for (y <- 0 until 9; x <- 0 until 12)
      assert((img.getRGB(x, y) & 0xffffff) === (((x * 16 / 12) << 16) | ((y * 12 / 9) << 8)))
    // 8x8 -> would be 6x6 at 3/4 — clamped to the aHash minimum, so identity
    val tiny = Multimodal.nnResize(Multimodal.decodeImage(png(
      Array.tabulate(8, 8)((y, x) => (x * 31 + y * 7) % 256 * 0x010101))))
    assert(tiny.getWidth === 8 && tiny.getHeight === 8)
  }

  test("m7: pigeonhole banding == brute-force hamming over the image fixture") {
    val sess = spark
    import sess.implicits._
    val sigs = sess.read.parquet(Multimodal.imgDupDir(sess, sf) + "/image")
      .as[Multimodal.ImgRecord]
      .map(r => (r.img_id, Multimodal.aHash64(Multimodal.decodeImage(r.payload))))
      .toDF("doc_id", "sh64")
    val banded = graft.ops.Dedup.hammingBandPairs(sigs, 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must yield at least one near-dup pair")
    // the planted perturbations are actually found: some posterize pair
    // (base id + shift) and some resize pair (+ 2·shift) survive distance
    // 3 — doc_ids are dense 0..n-1, so shift = max+1 = n
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(brute.exists { case (a, b) => b == a + n }, "no posterize pair found")
    assert(brute.exists { case (a, b) => b == a + 2 * n }, "no resize pair found")
  }

  test("m8: audioHash64 matches a hand-computed envelope signature") {
    // 128 samples: first half amplitude 10, second half 1000 — cells 0-31
    // mean 10, cells 32-63 mean 1000; grid mean 505, so exactly the loud
    // half's bits fire.
    val samples = Array.tabulate(128)(i => if (i < 64) 10 else 1000)
    val sig = Multimodal.audioHash64(samples)
    val expect = (32 until 64).map(1L << _).reduce(_ | _)
    assert(sig === expect)
    // |sample| is what the envelope measures: negating preserves the hash
    assert(Multimodal.audioHash64(samples.map(-_)) === sig)
  }

  test("m8: envelope hash is invariant to uniform loudness scaling") {
    val s1 = Array.tabulate(256)(i => ((i * 37) % 173 - 86) * (1 + 3 * ((i / 64) % 2)))
    val s2 = s1.map(_ * 4)
    assert(Multimodal.audioHash64(s1) === Multimodal.audioHash64(s2))
  }

  test("m8: resampleHalf keeps every 2nd sample; crop16 drops the head") {
    val s = Array.tabulate(101)(identity)
    assert(Multimodal.resampleHalf(s).toSeq === (0 to 100 by 2))
    assert(Multimodal.crop16(s).toSeq === (16 to 100))
  }

  test("m8: WAV round-trips the block-amplitude samples through the codec") {
    // decode(encodePcm(x)) == x is what makes the oracle's formula replay
    // prove the decode; exercise via the staged fixture's base payload
    val sess = spark
    import sess.implicits._
    val rec = sess.read.parquet(Multimodal.audDupDir(sess, sf) + "/audio")
      .as[Multimodal.ImgRecord].filter(_.img_id == 7L).head()
    val got = Multimodal.decodeSamples(rec.payload)
    val n = (256 + (7 % 32) * 16)
    assert(got.length === n)
    (0 until n).foreach { i =>
      assert(got(i) === Multimodal.ampSampleAt(7L, i, n), s"sample $i")
    }
  }

  test("m8: pigeonhole banding == brute-force hamming over the audio fixture") {
    val sess = spark
    import sess.implicits._
    val sigs = sess.read.parquet(Multimodal.audDupDir(sess, sf) + "/audio")
      .as[Multimodal.ImgRecord]
      .map(r => (r.img_id, Multimodal.audioHash64(Multimodal.decodeSamples(r.payload))))
      .toDF("doc_id", "sh64")
    val banded = graft.ops.Dedup.hammingBandPairs(sigs, 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(banded === brute)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(brute.exists { case (a, b) => b == a + n }, "no resample pair found")
  }

  test("m9: fused labels equal an in-memory union-find over both edge sets") {
    val sess = spark
    val out = graft.ops.Multimodal.queries("m9_crossmodal_clusters")(sess, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent reference: union-find over the SAME two pair generators
    import sess.implicits._
    val docs = sess.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id")).as[Long].collect()
    val baseIds = docs.toSet
    val sigs = sess.read.parquet(Multimodal.imgDupDir(sess, sf) + "/image")
      .as[Multimodal.ImgRecord].collect()
      .filter(r => baseIds(r.img_id))
      .map(r => r.img_id -> Multimodal.aHash64(Multimodal.decodeImage(r.payload)))
    val imgPairs = for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)
    val textPairs = graft.ops.Dedup.minhashLshPairs(sess, sf, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    (imgPairs ++ textPairs).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to canonical min labels, then compare
    docs.foreach { d =>
      val expect = find(d)
      val got = out(d).getLong(out(d).fieldIndex("cluster"))
      assert(got === expect, s"doc $d clustered $got, union-find says $expect")
    }
    // per-modality degrees match the raw pair multisets
    val textDeg = (textPairs.map(_._1) ++ textPairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val imgDeg = (imgPairs.map(_._1) ++ imgPairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    docs.foreach { d =>
      val r = out(d)
      assert(r.getLong(r.fieldIndex("n_text_edges")) === textDeg.getOrElse(d, 0L))
      assert(r.getLong(r.fieldIndex("n_image_edges")) === imgDeg.getOrElse(d, 0L))
    }
  }

  test("m10: containment pairs equal a brute-force frame-set sweep; variants at 1e6") {
    val sess = spark
    import sess.implicits._
    val frameSets = sess.read.parquet(Multimodal.vidDupDir(sess, sf) + "/video")
      .as[Multimodal.ImgRecord].collect()
      .map(r => r.img_id ->
        Multimodal.demux(r.payload)
          .map(f => Multimodal.aHash64(Multimodal.decodeImage(f))).toSet)
      .toMap
    val brute = (for {
      (ia, sa) <- frameSets; (ib, sb) <- frameSets
      if ia < ib
      common = (sa & sb).size
      if common > 0 && common.toLong * 1000000 / math.min(sa.size, sb.size) >= 500000
    } yield (ia, ib) -> (common.toLong * 1000000 / math.min(sa.size, sb.size))).toMap
    val got = graft.ops.Multimodal.queries("m10_video_neardup")(sess, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getLong(r.fieldIndex("containment_ppm"))).toMap
    assert(got === brute)
    // planted remuxes preserve the frame set modulo the trimmed head:
    // both variant kinds score a full 10^6 containment
    val n = sess.read.parquet(s"$sf/documents.parquet").count()
    val trimmed = got.filter { case ((a, b), _) => b == a + n }
    val reversed = got.filter { case ((a, b), _) => b == a + 2 * n }
    assert(trimmed.nonEmpty && trimmed.values.forall(_ == 1000000L))
    assert(reversed.nonEmpty && reversed.values.forall(_ == 1000000L))
  }

  test("m6: VAD windows tile every sample, partial tail kept, silent mix real") {
    val out = graft.ops.Multimodal.queries("m6_audio_vad")(spark, sf).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (docId, ws) =>
      val n = (256 + (docId % 32) * 16).toInt
      // windows cover exactly the sample count, in dense window order
      assert(ws.map(_.getInt(2)).sum === n)
      assert(ws.map(_.getInt(1)).sorted.toSeq === (0 until (n + 63) / 64))
      // partial tail: n is never a multiple of 64 except when %64==0
      if (n % 64 != 0) assert(ws.map(_.getInt(2)).min === n % 64)
    }
    val silent = out.count(_.getBoolean(out.head.fieldIndex("silent")))
    assert(silent > 0 && silent < out.length)
  }
}
