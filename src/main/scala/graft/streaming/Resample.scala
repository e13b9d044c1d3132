package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One valued event for the streaming lerp resampler: q84's
  * (user, event-id, event-time-ms, value) row. */
case class ResampleEvent(userId: Long, eventId: Long, tsm: Long, value: Double)

/** Per-user resampler state: the latest event timestamp and the value
  * of the LAST event at that timestamp (ties by event id resolve to
  * the largest, batch q84's `last over (ts, is_grid, id)` choice) —
  * one long + one double per user at any stream length. */
case class ResampleState(tsLast: Long, vLast: Double)

/** One interpolated grid emission: `userId`'s signal resampled at the
  * 6-hour-aligned instant `gridMs`. */
case class GridPoint(userId: Long, gridMs: Long, value: Double)

/** Streaming face of q84's first-order (lerp) resample
  * ([[graft.operators.Reference.q84LerpResample]]): per-user state of
  * ONE (timestamp, value) pair, emitting every 6-hour grid instant the
  * moment its surrounding event pair completes — grid points strictly
  * between two events interpolate `v0 + (v1 - v0)·(t - t0)/(t1 - t0)`
  * with v1 = the FIRST event at the next timestamp, and a grid point
  * ON an event timestamp emits that timestamp's LAST value, both
  * exactly batch q84's window tie-break (asserted cell-for-cell in
  * ResampleSpec, identical double arithmetic and HALF_UP round-6).
  *
  * Emit-on-supersede is the one honest divergence from batch: a grid
  * instant landing exactly on a user's CURRENT newest timestamp is not
  * yet determined (a later same-timestamp event would change its
  * value), so it emits when the user's history next advances. Batch,
  * which sees the closed history, emits it immediately; the parity
  * test carves out exactly that final-aligned-instant row. A stream
  * that ends leaves only that point unemitted per user — the same
  * tail-truncation behavior every watermark-bounded emission has.
  *
  * Same in-order-per-user delivery contract as [[Funnel.stageTimes]]
  * (by (tsm, eventId); intra-batch jumble is sorted away). Scale
  * posture: state is two numbers per user, emissions per event are
  * bounded by the gap/cell ratio, and the per-batch exchange is the
  * `groupByKey(userId)` hash — batch q84's single user partitioning. */
object Resample {

  /** Grid cell shared with batch q84 — 6 hours in ms. */
  val CellMs: Long = 21600000L

  /** Spark `round(_, 6)` exactly (the [[ResampleSpec]] parity needs
    * bit-identical rounding, not tolerance). */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def fold(idleTimeout: Option[String])(userId: Long,
      events: Iterator[ResampleEvent],
      state: GroupState[ResampleState]): Iterator[GridPoint] = {
    if (state.hasTimedOut) {
      // idle past the horizon: drop the held endpoint (see gridEmissions)
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (e.tsm, e.eventId))
    var st = state.getOption
    val out = Seq.newBuilder[GridPoint]
    sorted.foreach { e =>
      st match {
        case None =>
          st = Some(ResampleState(e.tsm, e.value))
        case Some(ResampleState(t0, _)) if e.tsm == t0 =>
          // same instant: the last arrival owns the timestamp's value
          st = Some(ResampleState(t0, e.value))
        case Some(ResampleState(t0, v0)) =>
          // t0 is now superseded: every aligned instant in [t0, e.tsm)
          // is determined — ON t0 the last value there, strictly
          // between a lerp toward this FIRST event at the new instant
          var t = Math.floorDiv(t0 + CellMs - 1, CellMs) * CellMs // ceil
          while (t < e.tsm) {
            val v =
              if (t == t0) v0
              else v0 + (e.value - v0) *
                ((t - t0).toDouble / (e.tsm - t0).toDouble)
            out += GridPoint(userId, t, round6(v))
            t += CellMs
          }
          st = Some(ResampleState(e.tsm, e.value))
      }
    }
    st.foreach { s =>
      state.update(s)
      idleTimeout.foreach(state.setTimeoutDuration)
    }
    out.result().iterator
  }

  /** The stream of determined grid emissions (update mode).
    *
    * The held (timestamp, value) endpoint only guards gap CONTINUITY, so
    * `idleTimeout` (the [[Baskets.pairIncrements]] knob) bounds the key
    * population with a bounded, documented trade: a user idle past the
    * horizon loses the endpoint, their first post-return event re-seeds
    * it, and the grid instants inside that ONE straddling gap — at most
    * ceil(gap / cell) points, including the emit-on-supersede point the
    * evicted endpoint was holding — are never emitted; every gap after
    * re-seeding interpolates normally. Pick the horizon above the
    * longest gap a lerp should legitimately bridge (past it, a
    * fabricated days-long interpolation is usually the wrong answer
    * anyway — absence of data, not a line segment). `None` (the default
    * and the parity-test setting) holds every user's endpoint for the
    * life of the query. Same polling caveat as Baskets:
    * `processAllAvailable` never settles under ProcessingTimeTimeout. */
  def gridEmissions(events: Dataset[ResampleEvent],
      idleTimeout: Option[String] = None): Dataset[GridPoint] = {
    implicit val stEnc = Encoders.product[ResampleState]
    implicit val enc = Encoders.product[GridPoint]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fold(idleTimeout))
  }
}
