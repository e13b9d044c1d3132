package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: typed schema, partition-wise stub decode, frame
  * sampling — the Spark-side shape a real codec would plug into. */
class MultimodalSpec extends SparkSpec {

  test("media corpus: typed payload + metadata for every document") {
    val files = Multimodal.mediaFiles(spark, sfDir).collect()
    assert(files.nonEmpty)
    assert(files.forall(f => Set("image", "audio", "video").contains(f.mediaType)))
    assert(files.forall(f => f.payload.nonEmpty))
    assert(files.forall(f => f.meta.widthPx >= 1 && f.meta.heightPx >= 1 &&
      f.meta.nFrames >= 1))
  }

  /** In-memory image fixture: solid-color w×h encoded with the given
    * ImageIO format (png/bmp/gif — JDK built-ins). */
  private def imageBytes(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  private def media(id: Long, payload: Array[Byte]): MediaFile =
    MediaFile(id, "image", payload, MediaMeta(0, 0, 0, 1))

  test("decode: real pixel dimensions and channel means from actual PNG/BMP images") {
    import spark.implicits._
    val red = 0xFF0000
    val teal = 0x008080
    val files = Seq(
      media(1L, imageBytes(8, 5, red, "png")),
      media(2L, imageBytes(16, 9, teal, "bmp")),
      media(3L, "not an image at all".getBytes("UTF-8"))).toDS()
    val got = Multimodal.decodeFeatures(files)
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    // metadata said 0×0 — the DECODER reports the true pixel geometry
    assert(got(1L) == Seq(8.0, 5.0, 1.0, 0.0, 0.0), s"png: ${got(1L)}")
    assert(got(2L).take(2) == Seq(16.0, 9.0))
    assert(math.abs(got(2L)(2) - 0.0) < 1e-9 &&
      math.abs(got(2L)(3) - 0x80 / 255.0) < 1e-9 &&
      math.abs(got(2L)(4) - 0x80 / 255.0) < 1e-9, s"bmp means: ${got(2L)}")
    // undecodable payloads fall back to deterministic byte moments
    assert(got(3L).length == 5 && got(3L).forall(v => v >= 0.0 && v < 1.0))
    // a TRUNCATED image (valid magic, corrupt body) makes ImageIO's
    // reader throw mid-decode — must fall back, not fail the task
    val corrupt = imageBytes(8, 5, red, "png").take(24)
    val c = Multimodal.decodeFeatures(Seq(media(9L, corrupt)).toDS()).head()
    assert(c.features.length == 5)
    val cr = Multimodal.resizeImage(Seq(media(9L, corrupt)).toDS(), 4, 3).head()
    assert(cr.payload.length == 12 && cr.meta.widthPx == 4)
    val again = Multimodal.decodeFeatures(files)
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(again == got, "decode must be deterministic")
  }

  test("decode over the synthetic corpus: total, deterministic, declared batch shape") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaFiles(spark, sfDir))
      .collect()
    assert(feats.forall(_.features.length == 5))
    // text payloads are undecodable -> byte-moment fallback in [0,1)
    assert(feats.forall(_.features.forall(v => v >= 0.0 && v < 1.0)))
    val again = Multimodal.decodeFeatures(Multimodal.mediaFiles(spark, sfDir))
      .collect().map(f => f.mediaId -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.mediaId) == f.features.toSeq))
  }

  test("frame sampling: chunk count follows payload size and stride") {
    val sampled = Multimodal.sampleFrames(Multimodal.mediaFiles(spark, sfDir),
      frameBytes = 16, stride = 4).collect()
    val sizes = Multimodal.mediaFiles(spark, sfDir).collect()
      .map(f => f.mediaId -> f.payload.length).toMap
    sampled.foreach { r =>
      val expected = (sizes(r.getLong(0)) - 1) / 64 + 1
      assert(r.getInt(2) == expected)
    }
  }

  test("resize: real resample — output decodes to the target geometry with preserved color") {
    import spark.implicits._
    val blue = 0x0000FF
    val files = Seq(media(1L, imageBytes(12, 8, blue, "png"))).toDS()
    val r = Multimodal.resizeImage(files, w = 4, h = 3).head()
    assert(r.meta.widthPx == 4 && r.meta.heightPx == 3)
    // the payload is a REAL re-encoded image: decode it back and check
    // pixels — a solid color survives bilinear resampling exactly
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
    assert(img != null, "resized payload must be a decodable image")
    assert(img.getWidth == 4 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xFFFFFF) == blue, f"pixel ($x,$y): ${img.getRGB(x, y)}%06x")
  }

  test("resize: undecodable payloads keep the deterministic byte fallback and metadata rewrite") {
    import spark.implicits._
    val raw = "not an image at all".getBytes("UTF-8")
    val r = Multimodal.resizeImage(Seq(media(7L, raw)).toDS(), w = 4, h = 3).head()
    assert(r.meta.widthPx == 4 && r.meta.heightPx == 3)
    assert(r.payload.length == 12)
    assert(r.payload.toSeq == raw.take(12).toSeq)
  }

  test("resize stays partition-wise: no shuffle in the plan") {
    val resized = Multimodal.resizeImage(Multimodal.mediaFiles(spark, sfDir), 4, 3)
    assert(!Layout.hasShuffle(resized.toDF()), "resize must not shuffle")
  }

  test("audio decode: real WAV round-trip — rate, frame count, and RMS from the PCM stream") {
    import spark.implicits._
    // hand-built fixture: 1 kHz of ±2000 square wave at 8 kHz — the
    // decoder must report the CONTAINER's truth, not the metadata's
    val samples = Array.tabulate(800)(i => (if (i % 2 == 0) 2000 else -2000).toShort)
    val wav = Multimodal.encodeWavPcm16(samples, 8000)
    val files = Seq(
      MediaFile(1L, "audio", wav, MediaMeta(0, 0, 999, 1)), // lying metadata
      MediaFile(2L, "audio", "definitely not audio".getBytes("UTF-8"),
        MediaMeta(0, 0, 0, 1))).toDS()
    val got = Multimodal.decodeAudioFeatures(files)
      .collect().map(f => f.mediaId -> f).toMap
    assert(got(1L).decoded && got(1L).sampleRateHz == 8000 &&
      got(1L).nSamples == 800L, s"decoded: ${got(1L)}")
    assert(got(1L).rms == 2000.0, s"square-wave RMS must be exactly A: ${got(1L).rms}")
    // undecodable payload: total operator, deterministic fallback
    assert(!got(2L).decoded && got(2L).nSamples == -1L &&
      got(2L).rms >= 0.0 && got(2L).rms < 1.0)
    // asymmetric samples exercise the full sqrt(mean-square) path
    val asym = Array[Short](300, -400, 1200, 0)
    val a = Multimodal.decodeAudioFeatures(
      Seq(MediaFile(3L, "audio", Multimodal.encodeWavPcm16(asym, 16000),
        MediaMeta(0, 0, 0, 1))).toDS()).head()
    val expected = math.sqrt(asym.map(s => s.toDouble * s).sum / 4)
    assert(a.decoded && a.sampleRateHz == 16000 && a.nSamples == 4L &&
      math.abs(a.rms - expected) < 1e-9)
  }

  test("audio corpus decodes completely: every synthesized WAV parses with exact counts") {
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.audioFiles(spark, sfDir)).collect()
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(feats.length == n)
    assert(feats.forall(_.decoded), "every synthesized container must decode")
    // decoded frame counts and rates match the generation arithmetic
    feats.foreach { f =>
      assert(f.nSamples == 400 + f.mediaId % 200, s"${f.mediaId}: ${f.nSamples}")
      assert(Set(8000, 12000, 16000).contains(f.sampleRateHz))
      assert(f.rms == (1000 + (f.mediaId % 20) * 500).toDouble,
        s"${f.mediaId}: rms ${f.rms}")
    }
  }

  test("audio decode stays partition-wise: no shuffle before the rollup") {
    val decoded = Multimodal.decodeAudioFeatures(Multimodal.audioFiles(spark, sfDir))
    assert(!Layout.hasShuffle(decoded.toDF().filter(col("decoded"))),
      "decode must not shuffle")
  }

  test("video decode: every frame of the packed container is individually decoded") {
    import spark.implicits._
    // two solid frames with known colors: the luminance sum only comes
    // out right if BOTH frames decode and their pixels are read
    val f1 = imageBytes(8, 6, 0x102030, "png") // means 16, 32, 48
    val f2 = imageBytes(4, 4, 0x405060, "png") // means 64, 80, 96
    val packed = Multimodal.encodeFramePacked(Seq(f1, f2))
    val got = Multimodal.decodeVideoFeatures(
      Seq(MediaFile(1L, "video", packed, MediaMeta(8, 6, 0, 2))).toDS()).head()
    assert(got.decoded && got.nFrames == 2, s"$got")
    assert(got.lumSum == (16 + 32 + 48) + (64 + 80 + 96), s"lum: ${got.lumSum}")
    // a TRUNCATED container (mid-frame cut) and plain garbage both take
    // the sentinel path instead of failing the task
    val torn = java.util.Arrays.copyOf(packed, packed.length - 7)
    val t = Multimodal.decodeVideoFeatures(
      Seq(MediaFile(2L, "video", torn, MediaMeta(0, 0, 0, 0))).toDS()).head()
    assert(!t.decoded && t.nFrames == -1)
    val g = Multimodal.decodeVideoFeatures(
      Seq(MediaFile(3L, "video", "not a container".getBytes("UTF-8"),
        MediaMeta(0, 0, 0, 0))).toDS()).head()
    assert(!g.decoded)
  }

  test("video thumbnails: stride skips DECODE (corrupt unsampled frames don't matter), resize reads real pixels") {
    import spark.implicits._
    val solid = imageBytes(8, 6, 0x102030, "png") // means 16, 32, 48
    val garbage = Array.fill[Byte](37)(0x5A)      // valid framing, undecodable
    // frames 1 and 3 are garbage — the FULL decoder must fail, the
    // stride-2 sampler must never look at them
    val packed = Multimodal.encodeFramePacked(
      Seq(solid, garbage, solid, garbage, solid))
    val full = Multimodal.decodeVideoFeatures(
      Seq(MediaFile(1L, "video", packed, MediaMeta(8, 6, 0, 5))).toDS()).head()
    assert(!full.decoded, "full decode must hit the corrupt frames")
    val th = Multimodal.decodeVideoThumbnails(
      Seq(MediaFile(1L, "video", packed, MediaMeta(8, 6, 0, 5))).toDS()).head()
    assert(th.decoded && th.nFrames == 5 && th.nSampled == 3, s"$th")
    // solid source → solid thumbnail at any interpolation: exact means
    assert(th.thumbLum == 3 * (16 + 32 + 48), s"lum: ${th.thumbLum}")
    // resize reality: a half-black / half-white frame must average in
    // the thumbnail raster — a decoder that read the source raster
    // without resizing, or resized to the wrong geometry, lands on a
    // pure extreme instead of a mixture
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(java.awt.Color.BLACK); gfx.fillRect(0, 0, 4, 6)
    gfx.setColor(java.awt.Color.WHITE); gfx.fillRect(4, 0, 4, 6)
    gfx.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val two = Multimodal.decodeVideoThumbnails(
      Seq(MediaFile(2L, "video", Multimodal.encodeFramePacked(Seq(baos.toByteArray)),
        MediaMeta(8, 6, 0, 1))).toDS(), thumbW = 2, thumbH = 1).head()
    assert(two.decoded && two.nSampled == 1)
    // 2x1 thumbnail of a half/half frame: one dark-side mean + one
    // light-side mean per channel — strictly between the extremes
    assert(two.thumbLum > 0 && two.thumbLum < 3 * 255, s"lum: ${two.thumbLum}")
  }

  test("video thumbnail corpus: closed-form sums over the SAMPLED indices only") {
    val feats = Multimodal.decodeVideoThumbnails(
      Multimodal.videoFiles(spark, sfDir)).collect()
    assert(feats.forall(_.decoded))
    feats.foreach { f =>
      val id = f.mediaId
      val n = 2 + (id % 5).toInt
      assert(f.nFrames == n && f.nSampled == (n + 1) / 2, s"$id: $f")
      val expected = (0 until n).filter(_ % 2 == 0).map(i =>
        (id * 3 + i * 11) % 256 + (id * 5 + i * 23) % 256 +
          (id * 7 + i * 37) % 256).sum
      assert(f.thumbLum == expected, s"$id: ${f.thumbLum} vs $expected")
    }
  }

  test("video corpus decodes completely with the closed-form frame sums") {
    val feats = Multimodal.decodeVideoFeatures(
      Multimodal.videoFiles(spark, sfDir)).collect()
    assert(feats.length == graft.Tables.documents(spark, sfDir).count())
    assert(feats.forall(_.decoded), "every synthesized container must decode")
    feats.foreach { f =>
      val id = f.mediaId
      val n = 2 + (id % 5).toInt
      assert(f.nFrames == n, s"$id: ${f.nFrames}")
      val expected = (0 until n).map(i =>
        (id * 3 + i * 11) % 256 + (id * 5 + i * 23) % 256 +
          (id * 7 + i * 37) % 256).sum
      assert(f.lumSum == expected, s"$id: ${f.lumSum} vs $expected")
    }
  }

  test("WAV property: encode/decode round-trips arbitrary samples and rates exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val samplesGen = Gen.nonEmptyListOf(
      Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    val rateGen = Gen.choose(4000, 96000)
    // round-trip through the container + decoder must be lossless:
    // 16-bit PCM has no re-quantization step to hide behind
    val p = Prop.forAll(samplesGen, rateGen) { (samples, rate) =>
      import spark.implicits._
      val wav = Multimodal.encodeWavPcm16(samples.toArray, rate)
      val got = Multimodal.decodeAudioFeatures(
        Seq(MediaFile(1L, "audio", wav, MediaMeta(0, 0, 0, 1))).toDS()).head()
      val expRms = math.sqrt(samples.map(s => s.toDouble * s).sum / samples.size)
      got.decoded && got.sampleRateHz == rate &&
        got.nSamples == samples.size.toLong && math.abs(got.rms - expRms) < 1e-9
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), p).passed)
  }

  test("q97 image signatures: the REAL decode path reproduces the closed form exactly") {
    // every signature the engine extracts from decoded PNG pixels must
    // equal a driver-side replay of the generation arithmetic — a
    // mismatch means the decode round-trip (encode → PNG → ImageIO →
    // gray) is not lossless or the hash arithmetic diverged
    val got = Multimodal.imageSignatures(
      Multimodal.imageCorpus(spark, sfDir)).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def local(id: Long, variant: Boolean) = {
      val v = Array.tabulate(64)(p => Multimodal.pixelValue(id, p, variant))
      val (hi, lo) = Multimodal.aHashHalves(v)
      (hi, lo, Multimodal.dHash56(v))
    }
    val want = ids.map(id => id -> local(id, variant = false)).toMap ++
      ids.filter(_ % 17 == 0)
        .map(id => (id + Multimodal.TwinOffset) -> local(id, variant = false)) ++
      ids.filter(_ % 13 == 0)
        .map(id => (id + Multimodal.VariantOffset) -> local(id, variant = true))
    assert(got == want)
  }

  test("q97 recall: every constructed twin collapses exactly, every variant pair survives the bands") {
    val rows = Multimodal.q97ImageDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    // exact face: one size-2 group per constructed twin, nothing else
    // byte-collides (distinct ids yield distinct images by design)
    val exact = rows.filter(_._1 == "exact")
    assert(exact.find(_._2 == 2L).map(e => (e._3, e._4))
      .contains((ids.count(_ % 17 == 0).toLong, ids.count(_ % 17 == 0).toLong)))
    // near face RECALL: a one-pixel edit moves at most 2 dHash bits, so
    // with 4×14-bit bands every constructed variant pair MUST surface —
    // sum of n_variant across distances equals the variant count
    val near = rows.filter(_._1 == "near")
    assert(near.map(_._4).sum == ids.count(_ % 13 == 0).toLong,
      s"variant pairs lost: $near")
    assert(near.forall(r => r._2 >= 0 && r._2 <= 3))
  }

  test("q97 banding is pigeonhole-exact: any 56-bit pair within Hamming 3 shares a band") {
    // deterministic sweep, not sampling: for every base hash in a
    // derived set and EVERY way to flip ≤3 of its 56 bits spread over
    // up to 3 different bands... 3 flips can touch at most 3 of the 4
    // bands, so one band always survives — verify the arithmetic the
    // engine's join relies on, including band extraction
    def bands(h: Long): Seq[Long] =
      (0 until 4).map(b => (h >> (14 * b)) & 0x3FFFL)
    val bases = (0 until 20).map(i =>
      Multimodal.dHash56(Array.tabulate(64)(p => Multimodal.pixelValue(i.toLong, p, false))))
    val rnd = new scala.util.Random(97)
    for (h <- bases; _ <- 1 to 200) {
      val k = 1 + rnd.nextInt(3)
      val flips = Seq.fill(k)(rnd.nextInt(56))
      val h2 = flips.foldLeft(h)((acc, q) => acc ^ (1L << q))
      assert(bands(h).zip(bands(h2)).exists { case (a, b) => a == b },
        s"pair at d<=${k} shares no band: $h vs $h2")
    }
  }

  test("q98 audio signatures: the REAL decode path reproduces the closed form exactly") {
    // the engine's fingerprint comes from decoded 32-sample |amplitude|
    // sums; the replay derives it from per-segment amplitudes directly —
    // equality proves the WAV round-trip is lossless AND that positive
    // scaling (32× here, 2× for the gain variant) moves no bit
    val got = Multimodal.audioSignatures(
      Multimodal.audioDedupCorpus(spark, sfDir)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def local(id: Long, gain: Boolean): Long = {
      val a = Array.tabulate(16)(s => Multimodal.segmentAmp(id, s, gain).toLong)
      val total = a.sum
      (0 until 15).foldLeft(0L)((f, s) => if (a(s + 1) > a(s)) f | 1L << s else f) |
        (0 until 16).foldLeft(0L)((f, s) =>
          if (16L * a(s) > total) f | 1L << (15 + s) else f)
    }
    val want = ids.map(id => id -> local(id, gain = false)).toMap ++
      ids.filter(_ % 17 == 0)
        .map(id => (id + Multimodal.TwinOffset) -> local(id, gain = false)) ++
      ids.filter(_ % 13 == 0)
        .map(id => (id + Multimodal.VariantOffset) -> local(id, gain = true))
    assert(got == want)
  }

  test("q98 recall: twins byte-collapse, every gain variant lands in its base's fingerprint group") {
    val sig = Multimodal.audioSignatures(
      Multimodal.audioDedupCorpus(spark, sfDir)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    // structural, per constructed pair — no reliance on group counts
    ids.filter(_ % 17 == 0).foreach { id =>
      assert(sig(id + Multimodal.TwinOffset)._1 == sig(id)._1,
        s"twin of $id not byte-identical")
    }
    ids.filter(_ % 13 == 0).foreach { id =>
      val (bd, bf) = sig(id); val (vd, vf) = sig(id + Multimodal.VariantOffset)
      assert(vd != bd, s"gain variant of $id byte-collided")
      assert(vf == bf, s"gain variant of $id moved a fingerprint bit")
    }
    // and the report's exact face sees exactly the twins as size-2 groups
    val exact = Multimodal.q98AudioDedup(spark, sfDir).collect()
      .filter(_.getString(0) == "exact")
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(exact.get(2L).map(_._2).contains(ids.count(_ % 17 == 0).toLong))
  }

  test("q99 frame signatures: real per-frame decode reproduces the closed-form keys") {
    val got = Multimodal.videoFrameSignatures(
      Multimodal.videoDedupCorpus(spark, sfDir)).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(2)).toSet).toMap
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    def keys(id: Long, drop: Int): Set[Long] =
      (drop until 2 + (id % 5).toInt).map(i =>
        Multimodal.dedupFrameColor(id, i, 0).toLong * 65536L +
          Multimodal.dedupFrameColor(id, i, 131).toLong * 256L +
          Multimodal.dedupFrameColor(id, i, 257).toLong).toSet
    val want = ids.map(id => id -> keys(id, 0)).toMap ++
      ids.filter(_ % 17 == 0)
        .map(id => (id + Multimodal.TwinOffset) -> keys(id, 0)) ++
      ids.filter(_ % 13 == 0)
        .map(id => (id + Multimodal.VariantOffset) -> keys(id, 1))
    assert(got == want)
  }

  test("q99 recall: every trimmed variant surfaces as a containment pair") {
    val rows = Multimodal.q99VideoDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    // exact face: one size-2 group per constructed twin (cubic colors
    // make unrelated byte-collisions vanishingly unlikely at test SF)
    val exact = rows.filter(_._1 == "exact")
    assert(exact.find(_._2 == 2L).map(_._4)
      .contains(ids.count(_ % 17 == 0).toLong))
    // near face RECALL is structural: a trimmed variant shares ALL its
    // n−1 keys with its base, so shared = min(n1, n2) must hold for
    // every constructed pair — n_variant sums to the variant count
    val near = rows.filter(_._1 == "near")
    assert(near.map(_._4).sum == ids.count(_ % 13 == 0).toLong,
      s"variant containment pairs lost: $near")
  }

  test("q33 rollup covers all media types with plausible stats") {
    val rows = Multimodal.q33MultimodalStats(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.documents(spark, sfDir).count())
    assert(rows.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }
}
