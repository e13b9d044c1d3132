package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming face of q87's blocked fuzzy join — entity resolution at
  * ingest: each arriving record matches the STATIC clean vocabulary
  * within edit distance 1 through the exact dual-token blocking shared
  * with the batch form ([[graft.operators.Pipeline.fuzzyMatchDual]] —
  * one derivation, two faces), so a record the batch job would have
  * resolved resolves identically at the gate.
  *
  * STATELESS by design (the [[Similarity]] contract): the vocabulary
  * broadcasts per micro-batch, the levenshtein verify is map-side, and
  * every emitted match is final — append mode, nothing to retract, no
  * state to checkpoint beyond source offsets. Records matching several
  * candidates emit one row per (record, cand, d) pair; downstream
  * picks its winner (min d, then cand — the deterministic rule the
  * spec pins) rather than this gate holding per-record state to do it.
  *
  * Scale posture: the broadcast is the DISTINCT name vocabulary
  * (bounded by the name universe, not the stream), and per micro-batch
  * the plan is scan → map-side join → filter — no exchange at all on
  * the streaming side. */
object Resolve {

  /** The stream of fuzzy matches (append mode): records.* + cand + d. */
  def fuzzyMatches(records: DataFrame, recordCol: String,
      vocab: DataFrame, vocabCol: String): DataFrame =
    graft.operators.Pipeline.fuzzyMatchDual(records, recordCol,
      vocab, vocabCol)
}
