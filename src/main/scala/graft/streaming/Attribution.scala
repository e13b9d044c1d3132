package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STREAM join — the attribution primitive, and the one join
  * shape the twin matrix lacked: every other streaming face joins a
  * stream to a STATIC relation ([[Similarity]], [[Resolve]]), but
  * click/impression attribution joins two live streams, and Spark's
  * watermarked stream-stream inner join is the engine-native answer.
  *
  * Each conversion matches the same user's impressions inside the
  * attribution horizon — `imp_ts < conv_ts ≤ imp_ts + horizon` — the
  * q38 range-join semantics, live. Both sides carry event-time
  * watermarks; with the range condition they bound BOTH state stores:
  * an impression can only ever match conversions up to `horizon`
  * later, so once the conversion watermark passes that bound the
  * impression's state row is evicted (AttributionSpec pins eviction
  * from the progress metrics). Inner-join rows emit as soon as both
  * sides have arrived — append mode, each matched pair exactly once.
  *
  * Scale posture: state is the watermark-bounded tail of each stream
  * keyed by user — horizon × arrival rate rows, independent of stream
  * history; the join itself shuffles on `user_id` like its batch twin,
  * with nothing resident beyond the horizon window. */
object Attribution {

  /** Matched pairs (append mode): `(user_id, imp_id, conv_id, lag_ms)`
    * for conversions within `horizonMs` after an impression. Both
    * inputs need `(user_id, event_id, ts)`. */
  def attribute(impressions: DataFrame, conversions: DataFrame,
      horizonMs: Long = 14400000L,
      watermark: String = "0 seconds"): DataFrame = {
    val imp = impressions
      .select(col("user_id").as("imp_user"), col("event_id").as("imp_id"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val conv = conversions
      .select(col("user_id").as("conv_user"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
      .withWatermark("conv_ts", watermark)
    conv.join(imp,
        col("conv_user") === col("imp_user") &&
          col("conv_ts") > col("imp_ts") &&
          col("conv_ts") <= col("imp_ts") + expr(s"INTERVAL $horizonMs MILLISECONDS"))
      .select(col("conv_user").as("user_id"), col("imp_id"), col("conv_id"),
        (unix_millis(col("conv_ts")) - unix_millis(col("imp_ts"))).as("lag_ms"))
  }
}
