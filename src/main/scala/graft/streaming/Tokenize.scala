package graft.streaming

import graft.operators.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of q100's BPE merge learning — tokenizer APPLY at
  * ingest: each arriving document is whitespace-tokenized and the
  * learned merge table replays in learned order through the SAME
  * greedy fold as the batch learner
  * ([[graft.operators.Pipeline.bpeMergePass]] — one derivation, two
  * faces), so a document tokenizes identically whether it arrived in
  * the training corpus or at the gate afterwards.
  *
  * STATELESS by design (the [[Resolve]] contract): the merge table is
  * a bounded plan literal (the learner's one-row-per-round snapshot),
  * the fold is map-side, and every emitted row is final — append mode,
  * no state beyond source offsets.
  *
  * Scale posture (r18): the merge table rides as reference objects
  * inside ONE codegen'd expression
  * ([[graft.expressions.BpeApplyAll]]) — a 30k-merge production
  * vocabulary is three arrays and one compiled loop, not 30k chained
  * expressions; per-document cost is O(merges · tokens) with zero
  * per-token allocation, and the spec pins the semantics against the
  * reference HOF fold. */
object Tokenize {

  /** Tokenize a document stream with a learned merge table (append
    * mode): docs.* + `toks` (merged token list) + `n_toks`. Since r18
    * the apply is the native codegen'd expression
    * ([[graft.operators.Pipeline.bpeApplyMerges]] →
    * `graft.expressions.BpeApplyAll`) — same greedy semantics,
    * compiled, vocabulary as reference objects. */
  def applyMerges(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.withColumn("toks",
        Pipeline.bpeApplyMerges(split(col(textCol), " "), merges))
      .withColumn("n_toks", size(col("toks")))

  /** [[applyMerges]] bound to the BANKED merge table of `dir`
    * ([[graft.operators.Pipeline.ensureBpeMerges]] — train-once,
    * fingerprint-guarded): the table is read ONCE at composition time
    * and rides the plan as literals, so micro-batches pay zero lookups
    * — the same static-side snapshot contract as the decontamination
    * gate's eval set; a retrained vocabulary means re-composing the
    * query. */
  def applyBankedMerges(docs: DataFrame, textCol: String,
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    applyMerges(docs, textCol,
      graft.operators.Layout.readMerges(spark,
        Pipeline.ensureBpeMerges(spark, dir)).map(m => (m._2, m._3)))
}
