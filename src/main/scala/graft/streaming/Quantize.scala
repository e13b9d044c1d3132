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
}
