package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One ranked candidate: identity + score. */
case class Scored(id: Long, score: Double)

/** Bounded min-heap buffer for the top-k aggregator. Kept as a plain
  * array (product-encodable); the heap property is maintained lazily —
  * the buffer holds at most k elements, worst ejected first. */
case class TopKBuf(items: Seq[Scored])

/** Bounded top-k as a typed `Aggregator` — the 100 TB shape for
  * "k best candidates per group" (SURVEY.md §4.4): each input
  * partition reduces to a k-element buffer map-side, buffers merge
  * associatively, and only `#partitions × k` rows ever reach the
  * shuffle. No window, no per-group sort of the full candidate list —
  * the cost the salted two-level `row_number` form (q25) pays in two
  * shuffle+sort stages collapses into one partial-aggregatable pass.
  *
  * Ordering: score DESC, id ASC on ties — identical to the ranking
  * windows in q25/q31, so results are deterministic and exactly
  * interchangeable (asserted in TopKSpec).
  *
  * The buffer is a plain sorted Seq, not a binary heap: k is small
  * (top-5/top-100), and the dominant cost is the "does it beat the
  * worst kept element" check, which is O(1) on a sorted buffer. Insert
  * is O(k) — fine for k ≪ input, which is the whole premise of top-k.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
  require(k >= 1, "k must be >= 1")

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Buffer stays sorted (best first). The common path — a candidate
    * that doesn't beat the current worst of a full buffer — is O(1);
    * a real insertion splices at its ordered position without a
    * re-sort. */
  private def insert(items: Seq[Scored], s: Scored): Seq[Scored] =
    if (items.size >= k && !better(s, items.last)) items
    else {
      val (ahead, behind) = items.span(better(_, s))
      ((ahead :+ s) ++ behind).take(k)
    }

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(buf: TopKBuf, in: Scored): TopKBuf =
    TopKBuf(insert(buf.items, in))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sortWith(better).take(k))

  override def finish(buf: TopKBuf): Seq[Scored] = buf.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Column form: aggregate `struct(id, score)` inputs to the k best,
    * ordered (score desc, id asc). Use after `groupBy(groupCols)`:
    * `df.groupBy(...).agg(TopK.topK(5, col("id"), col("score")))` then
    * `posexplode` the result for ranked rows. */
  def topK(k: Int, id: Column, score: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    // the product encoder flattens Scored to two input columns
    udaf(new TopKAggregator(k), Encoders.product[Scored])
      .apply(id, score)
      .as("topk")
  }
}
