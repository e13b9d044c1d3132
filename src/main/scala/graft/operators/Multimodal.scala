package graft.operators

import graft.Tables
import graft.functions.TextFunctions.P
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media file: an opaque binary payload plus typed metadata — the
  * multimodal column model (image/audio/video as `binary` with a
  * metadata struct). */
case class MediaMeta(widthPx: Int, heightPx: Int, sampleRateHz: Int, nFrames: Int)
case class MediaFile(mediaId: Long, mediaType: String, payload: Array[Byte], meta: MediaMeta)
case class MediaFeatures(mediaId: Long, mediaType: String, nBytes: Int, features: Array[Double])

/** Multimodal-column plumbing for a training-data pipeline: opaque
  * binary payloads with typed metadata, a partition-wise decode/
  * feature-extract stage, a real image resize, frame sampling, and an
  * oracle-checked rollup.
  *
  * The image path is REAL: `javax.imageio` (JDK built-in — PNG/JPEG/
  * BMP/GIF, no external jars) decodes payloads to pixels for feature
  * extraction and `BufferedImage` resamples for resize. Payloads no
  * installed codec accepts (audio/video containers in this corpus)
  * take a deterministic byte-derived fallback, so both operators are
  * total; a production build plugs its codecs into the same
  * `mapPartitions` seam.
  *
  * Scale posture: payloads never leave their partition (no shuffle
  * before feature extraction); the decode stage is embarrassingly
  * parallel; the rollup is a partial-aggregated groupBy on media_type.
  */
object Multimodal {

  /** Deterministic media corpus over the documents table: the UTF-8
    * bytes of `text` act as the opaque payload; media type and metadata
    * derive from doc_id/n_chars (synthetic but typed and stable). */
  def mediaFiles(spark: SparkSession, dir: String): Dataset[MediaFile] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir))
      .select(
        col("doc_id").as("mediaId"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        col("text").cast("binary").as("payload"),
        struct(
          (col("n_chars") % 640 + 1).cast("int").as("widthPx"),
          (col("n_chars") % 480 + 1).cast("int").as("heightPx"),
          (lit(8000) + col("n_chars") % 40000).cast("int").as("sampleRateHz"),
          (col("n_chars") % 240 + 1).cast("int").as("nFrames")).as("meta"))
      .as[MediaFile]
  }

  /** Deterministic byte-moment pseudo-features — the decode fallback
    * for payloads no installed codec accepts (opaque audio/video
    * containers here; a production build registers codecs for those
    * too). Derived from the byte-sum so tests can pin exact values. */
  private def byteMomentFeatures(payload: Array[Byte], k: Int): Array[Double] = {
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xFF))
    Array.tabulate(k)(i => ((sum * (i + 1)) % P).toDouble / P.toDouble)
  }

  /** REAL decoder — JDK-only codecs, no external jars: `javax.imageio`
    * reads PNG/JPEG/BMP/GIF from the binary payload. Partition-wise
    * batch shape: decoder configuration happens once per partition
    * (disk-cache off — ImageIO otherwise spools every stream through a
    * temp file), rows stream through it, payloads never shuffle.
    *
    * Features for a decodable image: `[width, height, meanR, meanG,
    * meanB]` with channel means normalized to [0,1] — real pixel
    * statistics, asserted against hand-built images in MultimodalSpec.
    * Undecodable payloads (this corpus's synthetic audio/video bytes)
    * fall back to [[byteMomentFeatures]], so the operator is total and
    * deterministic either way. */
  def decodeFeatures(files: Dataset[MediaFile], k: Int = 5): Dataset[MediaFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition decoder setup
      rows.map { f =>
        val feats = tryDecode(f.payload) match {
          case None => byteMomentFeatures(f.payload, k)
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var (r, g, b) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h * 255).toDouble
            // padTo + take: features are ALWAYS length k, decodable or
            // not — mixed-length vectors in one Dataset break downstream
            // consumers that assume a fixed dimension
            Array[Double](w, h, r / n, g / n, b / n).padTo(k, 0.0).take(k)
        }
        MediaFeatures(f.mediaId, f.mediaType, f.payload.length, feats)
      }
    }
  }

  /** Decode one payload, or None when no reader claims it OR a claimed
    * decode fails mid-stream (truncated / bit-rotted body behind a
    * valid magic — the normal corruption mode in a harvested corpus;
    * ImageIO.read THROWS there rather than returning null, and an
    * uncaught throw would fail the whole task instead of taking the
    * documented fallback). */
  private def tryDecode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** REAL resize — decode via `javax.imageio`, resample with a
    * `BufferedImage`/`Graphics2D` bilinear draw, re-encode as PNG, and
    * rewrite the metadata the downstream stages trust. Per-row map with
    * NO shuffle: resize is embarrassingly parallel and stays inside the
    * scan stage (verified in MultimodalSpec via Layout.hasShuffle).
    * Payloads no codec accepts keep the deterministic truncate/pad
    * fallback on the raw bytes, so the operator is total and the
    * metadata contract holds for every row. */
  def resizeImage(files: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { f =>
        val payload = tryDecode(f.payload) match {
          case None => java.util.Arrays.copyOf(f.payload, w * h)
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val gfx = out.createGraphics()
            gfx.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            gfx.drawImage(img, 0, 0, w, h, null)
            gfx.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            baos.toByteArray
        }
        MediaFile(f.mediaId, f.mediaType, payload,
          MediaMeta(w, h, f.meta.sampleRateHz, f.meta.nFrames))
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size chunk of the payload —
    * the video-frame-subsample pattern as pure column expressions (the
    * chunks stay binary/opaque). */
  def sampleFrames(files: Dataset[MediaFile], frameBytes: Int, stride: Int): DataFrame =
    files.toDF()
      .withColumn("frames",
        transform(
          sequence(lit(0), greatest(lit(0),
            ((length(col("payload")) - 1) / (frameBytes * stride)).cast("int"))),
          i => substring(col("payload"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes))))
      .select(col("mediaId"), col("mediaType"), size(col("frames")).as("n_frames_sampled"))

  /** Oracle-checked rollup: per media type, file count, payload bytes,
    * total synthetic frames, and a payload-digest-derived feature mean
    * (the column-expression twin of the stub decoder's determinism —
    * md5 over the payload is engine-portable). */
  def q33MultimodalStats(spark: SparkSession, dir: String): DataFrame =
    mediaFiles(spark, dir).toDF()
      .select(col("mediaType").as("media_type"),
        length(col("payload")).as("n_bytes"),
        col("meta.nFrames").as("n_frames"),
        (conv(substring(md5(col("payload")), 1, 15), 16, 10).cast("long") % P)
          .cast("double").divide(P).as("f0"))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n_files"),
        round(avg(col("n_bytes")), 2).as("avg_bytes"),
        sum(col("n_frames")).as("total_frames"),
        round(avg(col("f0")), 4).as("avg_f0"))
      .orderBy(col("media_type"))

  /** DuckDB twin of [[q33MultimodalStats]]: the payload is the UTF-8
    * text bytes, so md5(payload) == md5(text) and octet_length matches
    * (the corpus is ASCII). */
  val oracleSql: String =
    """WITH m AS (
      |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    octet_length(CAST(text AS BLOB)) AS n_bytes,
      |    CAST(n_chars % 240 + 1 AS INT) AS n_frames,
      |    CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 2147483647 AS DOUBLE) / 2147483647 AS f0
      |  FROM documents)
      |SELECT media_type, count(*) AS n_files,
      |  round(avg(n_bytes), 2) AS avg_bytes,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  round(avg(f0), 4) AS avg_f0
      |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin
}
