package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of q21's gap sessionization — the one windowing
  * primitive the twin matrix lacked: Spark's NATIVE `session_window`
  * merges events into per-user episodes whose gap exceeds none of the
  * configured idle bound, with watermark-driven state eviction and
  * append-mode emission — a session emits exactly once, when the
  * watermark passes its close, and its state leaves the store.
  *
  * Alignment with the batch form ([[graft.operators.Reference
  * .q21Sessionize]], lag + running sum): `session_window`'s `end` is
  * `last event + gap`, so the emitted `end_ms` subtracts the gap back
  * to the last event's timestamp — identical columns, identical
  * values for every CLOSED session (SessionsSpec pins the parity; the
  * boundary convention differs only at a gap of EXACTLY the bound —
  * batch keeps extending, the native window closes — documented, not
  * observable on millisecond data).
  *
  * Scale posture: state is one (start, end, count) triple per OPEN
  * session per user — closed sessions leave the store with their
  * emission, so state size tracks concurrently-active users, not
  * history; the aggregation partial-merges map-side like any streaming
  * groupBy. */
object Sessions {

  /** Per-user session aggregates from an event stream with an
    * event-time `ts` column (append mode): `(user_id, session_start_ms,
    * end_ms, n_events, duration_ms)` per closed session. */
  def sessionize(events: DataFrame, gapMs: Long = 14400000L,
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMs milliseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        (unix_millis(col("session_window.end")) - gapMs).as("end_ms"),
        col("n_events"),
        (unix_millis(col("session_window.end")) - gapMs -
          unix_millis(col("session_window.start"))).as("duration_ms"))
}
