package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming hybrid retrieval — the ONLINE face of q133's two-leg
  * RRF serving stack: a stream of queries (id, text, embedding)
  * served against the static corpus, each micro-batch ranked and
  * fused exactly as the batch operator ranks it.
  *
  * WHY `foreachBatch` and not a continuous transform: retrieval
  * serving is request/response — per-query top-k ranking (the
  * `row_number` cut inside each leg and the fused cut) is a
  * PER-REQUEST computation over a bounded candidate set, not a
  * continuous aggregation over the stream's history. A micro-batch
  * is precisely a bounded query set; serving it with the shared
  * batch derivation gives stream/batch parity BY CONSTRUCTION (one
  * definition, asserted in RetrieveSpec) and zero cross-batch state
  * (no store, no watermark, nothing to recover — a restarted serving
  * job re-serves only unanswered requests). The stateful-streaming
  * machinery is for facts that ACCUMULATE (dedup digests, manifests,
  * windows); a query's answer depends only on the query and the
  * corpus version, so state would be pure liability.
  *
  * Scale posture (100 TB): the corpus sides are the batch legs' own —
  * at rest, the sparse leg's vocabulary restriction is q86's
  * inverted-index postings filter and the dense leg swaps in
  * q118/q130's IVF serve (same (query_id, doc_id, rank) interface);
  * per micro-batch the stream side contributes only ≤|batch| rows to
  * every join and the ranking windows partition by query_id — bounded
  * work per request, independent of corpus size beyond the legs' own
  * serve costs. */
object Retrieve {

  /** Serve ONE micro-batch of queries `(query_id, text, qe)` against
    * the `dir` corpus — bind partially and pass to `foreachBatch`:
    * `.foreachBatch { (b, id) => sink(Retrieve.hybridServe(dir)(b, id)) }`.
    * Output: `(query_id, rk, doc_id, rrf_micro, sparse_rank,
    * dense_rank)`, q133's exact schema and semantics (integer RRF at
    * k = 60, leg depth 20, fused depth 10, self-matches excluded by
    * id). `ws`/`wd` are the serve-time FUSION WEIGHTS — the knob
    * q136's grid measures (defaults = plain RRF); a deployment reads
    * the grid, fixes its weights, and serves them here without
    * touching either leg. */
  def hybridServe(dir: String, ws: Int = 1, wd: Int = 1)
      (batch: DataFrame, batchId: Long): DataFrame =
    graft.operators.Pipeline.hybridRrfServe(batch.sparkSession, dir, batch,
      ws, wd)

  /** The AT-REST serving face (q138's entry point per request batch):
    * both legs from the banked indexes — postings filtered on the
    * bucketed term key, dense candidates from the stored IVF routing
    * at `probeRadius` — so a micro-batch pays INDEX LOOKUPS, never a
    * corpus tokenization or scan. External query vectors route
    * through the index's stored centroid/mask decisions
    * (`routeThroughIndex`, the lookup/append assignment), landing
    * exactly where the build would have put them; a corpus document
    * re-queried under a novel id finds itself at dense rank 1. This
    * is the form a long-running serving job binds: `hybridServe`
    * re-derives the legs from raw tables (right for ad-hoc or
    * index-less corpora); this one assumes the nightly build. */
  def hybridServeAtRest(dir: String, ws: Int = 1, wd: Int = 1,
      probeRadius: Int = 1, maxScorePrune: Boolean = false)
      (batch: DataFrame, batchId: Long): DataFrame =
    graft.operators.Pipeline.hybridServeAtRest(batch.sparkSession, dir,
      batch, ws, wd, probeRadius, maxScorePrune = maxScorePrune)

  /** The PURE-DENSE composed-ANN serving face — q145's banked IVF-PQ
    * serve per request batch: a micro-batch of `(query_id, qe)`
    * vectors assigns through the banked routing sidecar and ADC-ranks
    * the banked 4-int codes (the FAISS-shaped production ANN request
    * path; the hybrid face above is for corpora with a text leg).
    * Output: `(qid, rk, vec_id, adc_micro, in_exact_top5)`, q145's
    * exact schema. Same foreachBatch rationale as [[hybridServe]]:
    * request/response, zero cross-batch state; per batch the serve
    * pays memoized ensures + a ≤64-row routing collect + the bounded
    * candidate ADC — never a corpus scan or re-encode. A corpus
    * vector re-queried under a novel id scores the global-minimum
    * ADC against itself (its codes are its own per-subspace argmins
    * — RetrieveSpec pins it). `probeRadius` is the serve-time nprobe
    * knob (q148's certified configuration at radius 1): each query
    * additionally ADC-ranks every sub-bucket within that Hamming
    * radius of its routed home — the recall q118/q120 priced, bought
    * per request batch without touching the banked index, candidates
    * staying O(occupancy × probes). */
  def ivfPqServeAtRest(dir: String, probeRadius: Int = 0)(batch: DataFrame,
      batchId: Long): DataFrame =
    graft.operators.Pipeline.ivfPqRoutedServe(batch.sparkSession, dir,
      batch, probeRadius)
}
