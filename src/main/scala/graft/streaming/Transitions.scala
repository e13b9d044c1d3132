package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in the streaming transition counter: q90's (user, event
  * id, type, event-time-ms) tuple — the event id is part of the
  * ordering key, exactly as batch q90 orders `(tsm, event_id)`. */
case class TransitionEvent(userId: Long, eventId: Long,
    eventType: String, tsm: Long)

/** Per-user tail of the sequence: the last folded event — ONE event of
  * state per user at any stream length (the [[FunnelProgress]] O(1)
  * discipline; transitions need the predecessor, nothing older). */
case class TailEvent(tsm: Long, eventId: Long, eventType: String)

/** One transition increment: `userId` moved `src` → `dst` at the event
  * `dstEventId`. Every event produces EXACTLY ONE incoming transition
  * (its predecessor → itself), so `(userId, dstEventId)` is a natural
  * idempotency key: a downstream upsert on it makes trigger replays
  * harmless, and a plain `count(*)` per (src, dst) over the deduped
  * stream equals batch q90's `n` cell for cell. */
case class TransitionIncrement(src: String, dst: String,
    userId: Long, dstEventId: Long)

/** Streaming face of q90's Markov transition matrix
  * ([[graft.operators.Relational.q90TransitionMatrix]]): a per-user
  * fold over `flatMapGroupsWithState` emitting one (src → dst)
  * increment per consecutive event pair in the user's timeline.
  *
  * Same in-order-per-user delivery contract as [[Funnel.stageTimes]]
  * (per-device/per-shard ordering across micro-batches); WITHIN a
  * micro-batch the group's events are sorted by `(tsm, eventId)` —
  * batch q90's exact ordering key — before folding, so intra-trigger
  * jumbling costs nothing and timestamp ties fold identically to the
  * batch window. The normalized probability row is deliberately NOT
  * maintained here: increments keep the query a single stateful
  * operator (the [[Cohort.retentionIncrements]] rationale) and the
  * ≤|types|² count relation downstream normalizes in one bounded
  * aggregate whenever it is read.
  *
  * Scale posture: state per key is one (long, long, string) tail, the
  * only exchange per micro-batch is the `groupByKey(userId)` hash —
  * the same single user partitioning as batch q90's window. */
object Transitions {

  private def fold(idleTimeout: Option[String])(userId: Long,
      events: Iterator[TransitionEvent],
      state: GroupState[TailEvent]): Iterator[TransitionIncrement] = {
    if (state.hasTimedOut) {
      // idle past the horizon: drop the tail (see transitionIncrements)
      state.remove()
      Iterator.empty
    } else {
      val sorted = events.toSeq.sortBy(e => (e.tsm, e.eventId))
      if (sorted.isEmpty) Iterator.empty
      else {
        var tail = state.getOption
        val out = Seq.newBuilder[TransitionIncrement]
        sorted.foreach { e =>
          tail.foreach(t =>
            out += TransitionIncrement(t.eventType, e.eventType, userId, e.eventId))
          tail = Some(TailEvent(e.tsm, e.eventId, e.eventType))
        }
        state.update(tail.get)
        idleTimeout.foreach(state.setTimeoutDuration)
        out.result().iterator
      }
    }
  }

  /** The stream of transition increments (update mode).
    *
    * The tail only guards recent-event CONTINUITY, so `idleTimeout` (the
    * [[Baskets.pairIncrements]] knob) bounds the key population with a
    * precisely at-most-one-missed-increment trade: a user idle past the
    * horizon loses their tail, their first post-return event folds with
    * no predecessor and its (prev → this) increment is skipped — every
    * increment after that is unaffected, because the fold re-seeds on
    * that same event. Pick the horizon above the longest inter-event gap
    * that should still count as a transition (often the sessionization
    * gap, where a cross-gap "transition" is semantically void anyway).
    * `None` (the default and the parity-test setting) keeps every user's
    * tail for the life of the query. Same polling caveat as Baskets:
    * `processAllAvailable` never settles under ProcessingTimeTimeout. */
  def transitionIncrements(events: Dataset[TransitionEvent],
      idleTimeout: Option[String] = None): Dataset[TransitionIncrement] = {
    implicit val stEnc = Encoders.product[TailEvent]
    implicit val enc = Encoders.product[TransitionIncrement]
    events.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update(),
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fold(idleTimeout))
  }
}
