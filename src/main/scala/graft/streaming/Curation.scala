package graft.streaming

import graft.operators.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the STATELESS half of the pipeline
  * family run over unbounded document streams. Quality gating and PII
  * scrubbing are pure map-side column logic, so the batch definitions
  * apply to a streaming DataFrame verbatim: one rule definition, two
  * execution modes, no semantic drift between the nightly batch job and
  * the near-line ingest path (batch/stream row-for-row agreement is
  * asserted in DedupSpec).
  *
  * Scale posture: no state, no shuffle — every micro-batch is a
  * narrow map over the source partitions, and the operators compose
  * before [[Dedup]]'s stateful stage (gate → scrub → dedup is the
  * canonical ingest order: cheap verdicts shrink the stream before
  * state is paid). The one stateful member, [[trendingTerms]], bounds
  * its per-window state by construction (Misra–Gries buffer, ≤ m
  * counters). */
object Curation {

  /** Quality verdict per document ([[Pipeline.qualityVerdict]]): the
    * row survives with a `verdict` column; route on it downstream
    * (keep / dead-letter by rule). */
  def withQualityVerdict(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("verdict", Pipeline.qualityVerdict(col(textCol)))

  /** Keep only documents passing the gate. */
  def qualityGate(docs: DataFrame, textCol: String): DataFrame =
    withQualityVerdict(docs, textCol)
      .filter(col("verdict") === "keep").drop("verdict")

  /** Redact emails/URLs in place and count what was removed per row —
    * the ONE shared definition with batch q48
    * ([[Pipeline.piiRedact]]/[[Pipeline.piiCount]]), map-side,
    * stream-safe. A null text row counts 0 and stays null. */
  /** Trending terms per event-time window — the streaming face of
    * q64's bounded-memory heavy hitters: tokens explode map-side, the
    * Misra–Gries aggregator ([[graft.functions.HeavyHitters]]) runs
    * INSIDE a watermarked tumbling-window aggregation, and each
    * window's state is one ≤ m-counter buffer — bounded regardless of
    * how many distinct tokens the window saw (a full `groupBy(window,
    * token)` would hold the whole per-window vocabulary in the state
    * store). Candidates carry the N/(m+1) survival guarantee per
    * window; a consumer needing exact counts recounts the candidates
    * downstream, exactly like the batch twin. Append mode: a window's
    * candidate set finalizes when the watermark passes its end. */
  def trendingTerms(docs: DataFrame, textCol: String, eventTimeCol: String,
      windowLen: String, horizon: String, m: Int = 1024): DataFrame =
    docs
      .withColumn("token", explode(split(col(textCol), " ")))
      .withWatermark(eventTimeCol, horizon)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(graft.functions.HeavyHitters.candidates(m, col("token")).as("candidates"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("candidates"))

  def piiScrub(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_pii",
        coalesce(Pipeline.piiCount(col(textCol)), lit(0)))
      .withColumn(textCol, Pipeline.piiRedact(col(textCol)))

  /** Score arriving documents against a STATIC bigram-LM snapshot —
    * the near-line face of q70: the LM (`(bg, logp)`, the artifact
    * [[Pipeline.bigramLm]] derives and a nightly batch job would
    * persist) joins the stream's exploded bigram instances as a
    * stream-static equi-join. The planner is left free to pick the
    * join: a broadcast when the snapshot fits (routing-table case), a
    * per-micro-batch shuffled join when a web-scale vocabulary
    * doesn't — either way NO streaming state is involved in the
    * scoring itself. Bigrams unseen by the LM take `oovLogp` (the
    * caller passes the batch model's unseen-pair floor, e.g.
    * `ln(1/V)`). The per-document mean then aggregates on the
    * stream's own doc key — update output mode, one state row per
    * in-flight document, the [[Similarity.nearestQuery]] contract.
    * Output: `(docIdCol, n_bigrams, avg_logprob)` rounded to 6 like
    * every cross-engine log in the batch family. */
  def scoreBigramsAgainstLm(docs: DataFrame, textCol: String,
      docIdCol: String, lm: DataFrame, oovLogp: Double): DataFrame =
    docs
      .select(col(docIdCol), explode(graft.functions.TextFunctions
        .wordShingleMultiset(split(col(textCol), " "), 2)).as("bg"))
      .join(lm.select(col("bg"), col("logp")), Seq("bg"), "left")
      .withColumn("logp", coalesce(col("logp"), lit(oovLogp)))
      .groupBy(col(docIdCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("avg_logprob"))

  /** Repetition verdict per document — the streaming face of q68's
    * Gopher duplicated-3-gram rule, from the ONE shared definition
    * ([[Pipeline.repetitionColumns]]): adds `rep_frac` (duplicated
    * 3-gram occurrence fraction; 0 for sub-3-token or null docs) and
    * `rep_flagged` (the integer-exact ≥ 0.15 cut). Stateless map-side
    * column math like the quality gate — composes BEFORE the stateful
    * dedup stages (boilerplate-heavy docs are dropped before they cost
    * state). Batch/stream row-for-row agreement asserted in DedupSpec. */
  def withRepetitionVerdict(docs: DataFrame, textCol: String): DataFrame = {
    val (g, dup, flag) = Pipeline.repetitionColumns(col(textCol))
    docs
      .withColumn("rep_frac",
        when(g > 0L, dup.cast("double") / g).otherwise(lit(0.0)))
      .withColumn("rep_flagged", coalesce(flag, lit(false)))
  }
}
