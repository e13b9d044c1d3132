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
  * feature-extract stage, frame sampling, and an oracle-checked rollup.
  *
  * The decode step is a STUB: this container has no image/audio codecs,
  * so `decodeFeaturesStub` derives deterministic pseudo-features from
  * the payload bytes (documented below). Everything around it — the
  * `Dataset[MediaFile]` schema, the `mapPartitions` batch shape (one
  * decoder instantiation per partition, streaming over rows), the
  * feature-vector output schema, and the partitioning — is real and is
  * what a production decoder would plug into.
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

  /** STUB decoder — partition-wise feature extraction with the real
    * batch shape: one "decoder" per partition, rows streamed through
    * it. A production build replaces `fakeDecode` with a codec call;
    * the fake derives k pseudo-features deterministically from the
    * payload bytes (byte-sum / length moments), so tests can pin exact
    * values. */
  def decodeFeaturesStub(files: Dataset[MediaFile], k: Int = 4): Dataset[MediaFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      // per-partition decoder setup would happen here (codec handles,
      // model weights, ...) — the stub needs none.
      def fakeDecode(payload: Array[Byte]): Array[Double] = {
        val n = payload.length.max(1)
        val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xFF))
        Array.tabulate(k)(i => ((sum * (i + 1)) % P).toDouble / P.toDouble)
      }
      rows.map(f => MediaFeatures(f.mediaId, f.mediaType, f.payload.length,
        fakeDecode(f.payload)))
    }
  }

  /** Resize: re-dimension each image payload to `w × h`. The pixel
    * kernel is a STUB (no codecs in this container): the "resampled"
    * payload is the byte buffer truncated/zero-padded to the target
    * size — deterministic, so tests pin exact bytes. What's real and
    * load-bearing: the metadata rewrite (downstream stages trust
    * `meta.widthPx/heightPx`), the binary-in/binary-out column shape,
    * and the per-row map with NO shuffle — resize is embarrassingly
    * parallel and must stay inside the scan stage's codegen pipeline
    * (verified: pure Project over the scan). A production build swaps
    * the `substring`/pad for a codec call in `mapInPandas`/
    * `mapPartitions` with the identical schema contract. */
  def resizeStub(files: Dataset[MediaFile], w: Int, h: Int): Dataset[MediaFile] = {
    import files.sparkSession.implicits._
    val target = w * h
    files.toDF()
      .withColumn("payload",
        expr(s"rpad(substring(payload, 1, $target), $target, x'00')"))
      .withColumn("meta", struct(
        lit(w).as("widthPx"), lit(h).as("heightPx"),
        col("meta.sampleRateHz").as("sampleRateHz"),
        col("meta.nFrames").as("nFrames")))
      .as[MediaFile]
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
