package graft.streaming

import graft.operators.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming face of the q101/q103 product-quantization family — PQ
  * ENCODE at ingest: each arriving vector compresses to its 4 codeword
  * indexes (plus the encode-time quantization error) through the SAME
  * map-side fold as the batch encoder
  * ([[graft.operators.Pipeline.pqCodes]] — one derivation, two faces),
  * against a codebook FROZEN at index-build time, so a vector encodes
  * identically whether it was in the build corpus or arrived at the
  * gate afterwards — exactly the invariant
  * [[graft.operators.Pipeline.pqIndexAppend]]'s batch append relies
  * on, now available per micro-batch.
  *
  * STATELESS by design (the [[Tokenize]]/[[Resolve]] contract): the
  * codebook is a bounded plan literal (≤16 stored seed rows), the fold
  * is map-side, every emitted row is final — append mode, no state
  * beyond source offsets. The emitted `qerr_micro` is the same
  * staleness signal the batch drift report aggregates: a sink watching
  * its running average sees codebook drift AS IT ARRIVES rather than
  * at the next batch report. */
object Quantize {

  /** Encode a vector stream `(vec_id, e)` with a codebook read from a
    * persisted PQ index (append mode): `(vec_id, codes, qerr_micro)`. */
  def encodeWithStoredCodebook(spark: SparkSession, indexName: String,
      vectors: DataFrame): DataFrame =
    encode(vectors, Pipeline.storedPqSeeds(spark, indexName))

  /** Encode a vector stream against an explicit codebook (the
    * [[graft.operators.Pipeline.pqSeeds]] collected form). */
  def encode(vectors: DataFrame,
      seeds: Seq[(Long, Seq[Double])]): DataFrame =
    Pipeline.pqCodes(
      vectors.select(col("vec_id"), col("e").cast("array<double>").as("e")),
      seeds)

  /** Windowed codebook-drift monitor — the streaming face of
    * [[graft.operators.Pipeline.pqIndexDriftReport]]: per event-time
    * window, the arriving vectors' average quantization error against
    * the frozen codebook, flagged when it degrades past 2× the
    * BUILD-time average (read once from the index's stats sidecar, a
    * one-row bounded snapshot). The batch report answers "has the
    * corpus drifted since build" at maintenance time; this answers it
    * PER WINDOW as data arrives, so a drifting upstream trips the
    * rebuild signal within one watermark delay instead of at the next
    * append.
    *
    * State is one running (count, sum) per open window — the standard
    * watermarked windowed aggregate; append mode, each window emits
    * once when the watermark passes its close. */
  def driftByWindow(spark: SparkSession, indexName: String,
      vectors: DataFrame, windowDur: String = "1 hour",
      watermark: String = "0 seconds"): DataFrame = {
    // bind by NAME, not ordinal — a column reorder in writePqIndex /
    // pqIndexAppend's replaceStats projection must not silently swap
    // build vs running sums (the batch twin pqIndexDriftReport already
    // reads this table by name)
    val st = spark.table(indexName + "_stats").collect()(0)
    val buildAvgMicro =
      st.getAs[Long]("build_sum_qerr_micro").toDouble / st.getAs[Long]("build_n")
    val (_, qerr) = Pipeline.pqCodeColumns(
      Pipeline.storedPqSeeds(spark, indexName))
    vectors
      .select(col("ts"),
        col("e").cast("array<double>").as("e"))
      .select(col("ts"), qerr.as("qerr_micro"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_vectors"),
        avg(col("qerr_micro")).as("avg_micro"))
      .select(col("window.start").as("window_start"),
        col("n_vectors"),
        round(col("avg_micro") / 1.0e6, 6).as("avg_qerr"),
        round(lit(buildAvgMicro) / 1.0e6, 6).as("build_avg_qerr"),
        (col("avg_micro") > buildAvgMicro * 2.0).as("needs_rebuild"))
  }

  /** Windowed CENTROID-drift monitor — the near-line face of the batch
    * embedding-drift report (q117): per event-time window and label,
    * the cosine between the window's mean vector and a STATIC baseline
    * centroid snapshot (the `(label, cvec)` relation a nightly
    * `labelCentroids` run persists — bounded, collected into plan
    * literals). The batch report compares two full corpus versions at
    * maintenance time; this answers "is the arriving distribution still
    * where the index thinks it is" per window, one watermark delay
    * after the data lands — the coarse-index analog of
    * [[driftByWindow]]'s codebook signal.
    *
    * ONE stateful operator: a watermarked windowed aggregate holding
    * `dims+1` doubles per open (window, label) — the per-dimension
    * running sums and the count; the mean, the baseline lookup (a map
    * literal), and the fold cosine are all map-side on the final
    * projection. Append mode: each (window, label) row emits once. */
  def centroidDriftByWindow(vectors: DataFrame, eventTimeCol: String,
      windowDur: String, watermark: String,
      baseline: DataFrame): DataFrame = {
    val cents = baseline
      .select(col("label").cast("long"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    require(cents.nonEmpty, "empty baseline centroid relation")
    val dims = cents.head._2.length
    val sums = (0 until dims).map(i =>
      sum(element_at(col("e"), i + 1)).as(s"s$i"))
    val mean = array((0 until dims).map(i =>
      round(col(s"s$i") / col("n"), 6)): _*)
    vectors
      .select(col("label").cast("long").as("label"),
        col("e").cast("array<double>").as("e"), col(eventTimeCol))
      .withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), windowDur), col("label"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("label"), col("n"),
        round(graft.functions.TextFunctions.cosine(mean,
          element_at(typedlit(cents), col("label"))), 6).as("centroid_cos"))
  }
}
