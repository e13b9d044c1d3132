package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory heavy-hitter CANDIDATE generation (Misra–Gries,
  * mergeable-summaries form) — the 100 TB path for "top terms of a
  * corpus whose vocabulary doesn't fit a shuffle". A full
  * `groupBy(token)` (q47's shape) exchanges one row per DISTINCT
  * token; web-scale corpora have billions of distinct tokens, so the
  * exchange and the final aggregation state grow with the vocabulary.
  * Misra–Gries instead keeps AT MOST `m` counters per partial buffer,
  * merges associatively, and guarantees every item with true count
  * `> N/(m+1)` survives to the merged summary (decrement mass is
  * bounded: each overflow removes ≥ m+1 total mass, so all decrements
  * sum to ≤ N/(m+1) — the classic bound, and it is preserved under
  * weighted buffer merges, Agarwal et al., "Mergeable Summaries").
  *
  * The summary alone over-counts; the exact recipe is TWO passes:
  * candidates from this aggregator, then an exact recount restricted
  * to the (≤ m) candidates via broadcast semi-join — see
  * `Pipeline.q64HeavyHitters`. Exactness condition: the k-th true
  * count must exceed `N/(m+1)`; pick m ≫ k/(expected k-th frequency).
  *
  * Cost: misses on a full buffer pay an O(m) decrement sweep, but each
  * sweep removes ≥ m mass and total inserted mass is N, so the total
  * sweep work is O(N) — amortized O(1) per token.
  */
class MisraGriesAggregator(m: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
  require(m >= 1, "m must be >= 1")

  private def offer(buf: mutable.HashMap[String, Long], tok: String, w: Long): Unit =
    buf.get(tok) match {
      case Some(c) => buf(tok) = c + w
      case None if buf.size < m => buf(tok) = w
      case None =>
        // decrement-all by d = min(w, smallest counter); drop zeros.
        // Removes >= (m+1)*d total mass (m counters + d of the new
        // token), which is what bounds the total sweep work and the
        // per-item undercount.
        val d = math.min(w, buf.values.min)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { k =>
          val c = buf(k) - d
          if (c <= 0) dead += k else buf(k) = c
        }
        dead.foreach(buf.remove)
        val rem = w - d
        if (rem > 0 && buf.size < m) buf(tok) = rem
    }

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
      tok: String): mutable.HashMap[String, Long] = {
    // skip nulls: HashMap would admit a null key, and finish's sort
    // would NPE on it — a nullable token column must not crash the
    // aggregate (null carries no heavy-hitter information anyway)
    if (tok != null) offer(buf, tok, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // weighted offers preserve the N/(m+1) survival bound across
    // merges (mass conservation: decrements still remove >= m+1 each)
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.foreach { case (t, w) => offer(into, t, w) }
    into
  }

  /** Candidates only — the counts are UNDERCOUNTS by up to N/(m+1) and
    * must never be reported; the exact pass recounts. Sorted for
    * deterministic downstream plans. */
  override def finish(buf: mutable.HashMap[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {
  /** Column form: `df.agg(HeavyHitters.candidates(4096, col("token")))`
    * → one array<string> of at most m candidate heavy hitters. */
  def candidates(m: Int, token: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new MisraGriesAggregator(m), Encoders.STRING)
      .apply(token)
      .as("candidates")
  }
}
