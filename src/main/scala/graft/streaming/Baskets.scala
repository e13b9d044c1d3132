package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One basket item: q83's (order, supplier) line reduced to its pair
  * of keys. */
case class BasketItem(orderKey: Long, supplier: Long)

/** Per-basket state: the distinct suppliers seen so far, ascending.
  * Bounded by BASKET WIDTH (7 line items per order in this schema;
  * never the stream length) — the q83 in-row-expansion bound carried
  * over to the stream. */
case class BasketState(suppliers: Seq[Long])

/** One co-occurrence increment: suppliers `s1 < s2` first appeared
  * TOGETHER in `orderKey`. Emitted exactly once per (order, pair) —
  * when the second endpoint arrives — so a downstream `count(*)` per
  * (s1, s2) equals batch q83's `n_orders` pair for pair. */
case class PairIncrement(s1: Long, s2: Long, orderKey: Long)

/** Streaming face of q83's market-basket co-occurrence
  * ([[graft.operators.Relational.q83CoOccurrence]]): per-order state
  * accumulating the distinct supplier set, emitting a (s1, s2, order)
  * increment the moment a pair first co-exists in the basket. The
  * [[Cohort]] increment discipline: the ranked table lives in the
  * downstream store (or a plain `groupBy(s1, s2).count` over the
  * collected output), keeping the query a single stateful operator.
  *
  * Unlike the funnel and cohort twins this one needs NO delivery-order
  * contract at all: a basket is a SET, pair emission triggers on the
  * second endpoint's arrival whatever the arrival order, and each pair
  * can trigger only once because both endpoints are in state
  * afterwards. Batch parity is therefore exact under arbitrary
  * cross-batch interleaving (BasketsSpec replays lineitem sorted by
  * SUPPLIER — maximally scattering each order across installments —
  * and still matches cell for cell).
  *
  * Scale posture: state per key is one ≤ basket-width long array; the
  * per-batch exchange is the `groupByKey(orderKey)` hash — the same
  * single order partitioning as batch q83's basket rollup; emitted
  * increments per order are ≤ C(width, 2), the in-row expansion bound. */
object Baskets {

  private def fold(idleTimeout: Option[String])(orderKey: Long,
      items: Iterator[BasketItem],
      state: GroupState[BasketState]): Iterator[PairIncrement] = {
    if (state.hasTimedOut) {
      // the order went idle past the horizon: it is complete — drop
      // its state (the key-count bound; see pairIncrements)
      state.remove()
      Iterator.empty
    } else {
      var seen = state.getOption.getOrElse(BasketState(Seq.empty)).suppliers
      val out = Seq.newBuilder[PairIncrement]
      // intra-batch determinism only (ascending suppliers); correctness
      // holds under any order, see the object doc
      items.map(_.supplier).toSeq.distinct.sorted.foreach { s =>
        if (!seen.contains(s)) {
          seen.foreach { t =>
            out += (if (s < t) PairIncrement(s, t, orderKey)
                    else PairIncrement(t, s, orderKey))
          }
          seen = (seen :+ s).sorted
        }
      }
      state.update(BasketState(seen))
      idleTimeout.foreach(state.setTimeoutDuration)
      out.result().iterator
    }
  }

  /** The stream of first-co-occurrence increments (update mode).
    *
    * Per-order VALUE state is basket-width-bounded, but the KEY count
    * grows with the stream — unlike the per-user twins (population-
    * bounded keys), completed orders accumulate forever. `idleTimeout`
    * is the bound: an order idle past the horizon is complete and its
    * state drops (the `Dedup` watermark-horizon discipline). The
    * horizon is also the exactness boundary — items of an order that
    * straddle an eviction re-open empty state, so cross-eviction pairs
    * are missed and pairs wholly within the late remnant can re-emit;
    * pick the horizon above the order-completion SLA exactly as the
    * dedup horizon sits above the re-crawl window. `None` (the test /
    * bounded-replay setting) keeps every order's state for the life of
    * the query. With a horizon set the query runs timeout-check
    * batches continuously — normal for ProcessingTimeTimeout, but
    * `processAllAvailable` never settles under it (poll the sink in
    * tests; production queries use a trigger interval). */
  def pairIncrements(items: Dataset[BasketItem],
      idleTimeout: Option[String] = None): Dataset[PairIncrement] = {
    implicit val stEnc = Encoders.product[BasketState]
    implicit val enc = Encoders.product[PairIncrement]
    items.groupByKey(_.orderKey)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fold(idleTimeout))
  }
}
