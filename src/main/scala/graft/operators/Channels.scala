package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic reinterpretation of the driver's `events` table as the
  * reference's three input streams (FIXTURES.md §B mapping):
  * frames (PPM samples), commands (override requests), acks (send-status
  * callbacks). All derivations are pure column arithmetic with an exact
  * DuckDB twin (floor-based double→int, non-negative modulo only), so
  * every downstream query stays oracle-checkable.
  *
  * Stream model (reference): 8 targets (`src/transmitter/main.cpp:42-51`),
  * channel domain 1000–2000 (`:205-210`), `-1` skip sentinel (`:201-204`),
  * ms durations (`:160`).
  */
object Channels {
  val NumTargets = 8

  /** Event-time in epoch ms (Spark `unix_millis` = DuckDB `epoch_ms`). */
  private def tsm = unix_millis(col("ts")).as("tsm")

  private def targetId = (col("user_id") % NumTargets).cast("int").as("target_id")

  /** Frame stream (S1/S3): `view`/`click` events as PPM channel samples;
    * value ∈ [0.01, 490] → channel ∈ [1000, 2000]. */
  def frames(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), tsm, targetId,
        (col("event_id") % NumTargets).cast("int").as("ci"),
        (lit(1000) + floor(col("value") * 10).cast("int") % 1001).as("ch"))

  /** Command stream (S2): `purchase` events as override_channels commands
    * with a value payload and a TTL duration in ms. */
  def commands(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), tsm, targetId,
        (lit(1000) + floor(col("value") * 7).cast("int") % 1001).as("ovr"),
        (lit(1000) + (col("event_id") % 7200) * 1000).as("duration_ms"))

  /** Command stream with the `-1` skip sentinel and a channel index, for
    * the ST2 per-element merge (`src/transmitter/main.cpp:199-212`). */
  def sentinelCommands(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), tsm, targetId,
        (col("event_id") % NumTargets).cast("int").as("ci"),
        when(col("event_id") % 5 === 0, lit(-1))
          .otherwise(lit(1000) + floor(col("value") * 7).cast("int") % 1001).as("ovr"))

  /** Ack stream (A2): `signup` = send success, `error` = send failure
    * (`src/transmitter/main.cpp:55-75`). */
  def acks(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "error"))
      .select(col("event_id"), tsm, targetId,
        (col("event_type") === "signup").cast("int").as("success"))

  /** DuckDB SQL fragments for the same derivations — kept adjacent to the
    * Scala so the two sides never drift. */
  object Sql {
    val tsm = "epoch_ms(ts)"
    val targetId = s"CAST(user_id % $NumTargets AS INT)"
    val frameCh = "1000 + CAST(floor(value * 10) AS INT) % 1001"
    val cmdOvr = "1000 + CAST(floor(value * 7) AS INT) % 1001"
    val cmdDuration = "1000 + (event_id % 7200) * 1000"
    val sentinelOvr =
      s"CASE WHEN event_id % 5 = 0 THEN -1 ELSE $cmdOvr END"
    val frames =
      s"SELECT event_id, $tsm AS tsm, $targetId AS target_id, " +
        s"CAST(event_id % $NumTargets AS INT) AS ci, $frameCh AS ch " +
        "FROM events WHERE event_type IN ('view', 'click')"
    val commands =
      s"SELECT event_id, $tsm AS tsm, $targetId AS target_id, $cmdOvr AS ovr, " +
        s"$cmdDuration AS duration_ms FROM events WHERE event_type = 'purchase'"
    val sentinelCommands =
      s"SELECT event_id, $tsm AS tsm, $targetId AS target_id, " +
        s"CAST(event_id % $NumTargets AS INT) AS ci, $sentinelOvr AS ovr " +
        "FROM events WHERE event_type = 'purchase'"
    val acks =
      s"SELECT event_id, $tsm AS tsm, $targetId AS target_id, " +
        "CAST(event_type = 'signup' AS INT) AS success " +
        "FROM events WHERE event_type IN ('signup', 'error')"
  }
}
