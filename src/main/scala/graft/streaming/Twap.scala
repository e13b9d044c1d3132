package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One event in the streaming TWAP: q92's (user, event id, value,
  * event-time-ms) tuple — the event id is part of the ordering key,
  * exactly as batch q92 orders `(tsm, event_id)`. */
case class TwapEvent(userId: Long, eventId: Long, value: Double, tsm: Long)

/** Per-user TWAP accumulator: the running trapezoid area, the span
  * endpoints, the count, and the tail (last value at last timestamp)
  * the next interval continues from — six numbers of state per user
  * at any stream length. */
case class TwapState(firstTsm: Long, lastTsm: Long, lastValue: Double,
    area: Double, nEvents: Long)

/** The continuously maintained per-user TWAP row (update mode): the
  * latest row per user IS the answer, matching batch q92's
  * (user_id, n_events, twap) for every user whose span is positive.
  * `twap` is None until the user's observed span is > 0 (batch q92
  * EXCLUDES those users; the stream surfaces them as
  * not-yet-determined instead — same information, streaming shape). */
case class TwapRow(userId: Long, nEvents: Long, twap: Option[Double])

/** Streaming face of q92's time-weighted average
  * ([[graft.operators.Relational.q92Twap]]): a per-user fold over
  * `mapGroupsWithState` maintaining the trapezoid integral
  * incrementally — each arriving event closes one interval
  * ((v_prev + v) / 2 · Δt) against the held tail, so the state is
  * O(1) by construction where the batch form holds the user's lag
  * pairs inside a window.
  *
  * Same in-order-per-user delivery contract as [[Funnel.stageTimes]];
  * WITHIN a micro-batch events sort by `(tsm, eventId)` — batch q92's
  * ordering — so intra-trigger jumbling costs nothing and
  * zero-width ties contribute zero area in the same order. The
  * emitted `twap` is `area / (lastTsm − firstTsm)`, rounded like the
  * batch query only at comparison time (the spec rounds; the stream
  * emits full precision so downstream consumers choose).
  *
  * Scale posture: six numbers of state per key (RocksDB-ready), one
  * `groupByKey(userId)` exchange per micro-batch — the same user
  * partitioning as batch q92's window. */
object Twap {

  private def asRow(userId: Long, st: TwapState): TwapRow = {
    val span = st.lastTsm - st.firstTsm
    TwapRow(userId, st.nEvents,
      if (span > 0L) Some(st.area / span) else None)
  }

  private def fold(idleTimeout: Option[String])(userId: Long,
      events: Iterator[TwapEvent], state: GroupState[TwapState]): TwapRow = {
    if (state.hasTimedOut) {
      // idle past the horizon: re-emit the settled row (idempotent for
      // the downstream per-user upsert) and drop the accumulator
      val last = state.get
      state.remove()
      asRow(userId, last)
    } else {
      var st = state.getOption.orNull
      events.toSeq.sortBy(e => (e.tsm, e.eventId)).foreach { e =>
        st =
          if (st == null) TwapState(e.tsm, e.tsm, e.value, 0.0, 1L)
          else TwapState(st.firstTsm, e.tsm, e.value,
            st.area + (st.lastValue + e.value) / 2.0 * (e.tsm - st.lastTsm),
            st.nEvents + 1)
      }
      state.update(st)
      idleTimeout.foreach(state.setTimeoutDuration)
      asRow(userId, st)
    }
  }

  /** Continuously maintained per-user TWAP (update mode).
    *
    * `idleTimeout` (the [[Baskets.pairIncrements]] knob) bounds the key
    * population — with a STRONGER trade than the transitions tail, stated
    * honestly: the state here is the user's whole lifetime integral, so
    * eviction doesn't lose one increment, it RESTARTS the average — a user
    * returning after the horizon begins a fresh span, turning lifetime
    * TWAP into per-active-span TWAP (each span's settled row was emitted
    * at eviction, so nothing is silently lost — the spans are all in the
    * sink, they are just no longer merged). Use it only where an idle gap
    * legitimately ends the averaging window (session VWAP, device uptime
    * epochs); leave `None` (the default and the parity-test setting) for
    * true lifetime semantics, accepting the unbounded key population.
    * Same polling caveat as Baskets: `processAllAvailable` never settles
    * under ProcessingTimeTimeout. */
  def running(events: Dataset[TwapEvent],
      idleTimeout: Option[String] = None): Dataset[TwapRow] = {
    implicit val stEnc = Encoders.product[TwapState]
    implicit val enc = Encoders.product[TwapRow]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .mapGroupsWithState(
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fold(idleTimeout))
  }
}
