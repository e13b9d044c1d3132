package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2 — streaming-native input adapters for the engine.
  *
  * The engine consumes any `Dataset[EngineEvent]`; these adapters
  * produce that envelope from live sources:
  *  - [[syntheticFrames]]: a rate-source PPM generator (the S1 sensor
  *    scan's streaming twin — deterministic channel values derived
  *    from the row counter, `src/transmitter/main.cpp:89-95`);
  *  - [[commandsFromJsonLines]]: line-framed JSON commands from any
  *    string stream (socket/file/MemoryStream) with the reference's
  *    framing semantics — trim, drop empties
  *    (`src/transmitter/main.cpp:301-313`) — and a dead-letter split
  *    for unparseable lines (the `parse_json` error path, `:229-240`).
  *
  * Everything is per-row projection — no state, no shuffle; the keyed
  * work happens downstream in [[Engine.effectiveStates]].
  */
object Sources {

  /** S1 streaming twin: synthetic 8-channel frames at `rowsPerSecond`,
    * cycling over `numTargets`. Channel values sweep 1000–2000
    * deterministically from the rate counter. */
  def syntheticFrames(spark: SparkSession, numTargets: Int,
      rowsPerSecond: Int): Dataset[EngineEvent] = {
    import spark.implicits._
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong).load()
      .select(
        pmod(col("value"), lit(numTargets)).cast("int").as("targetId"),
        lit("frame").as("kind"),
        col("value").as("seq"),
        unix_millis(col("timestamp")).as("tsm"),
        array_repeat((lit(1000) + pmod(col("value") * 37, lit(1001))).cast("int"),
          Engine.ChannelCount).as("channels"),
        lit(0L).as("durationMs"))
      .as[EngineEvent]
  }

  /** S2 streaming twin: parse a stream of raw serial lines into
    * command events plus a dead-letter relation.
    *
    * @param lines  one column `value: String` (socket/text-file/memory
    *               stream shape)
    * @param nowMs  event-time assignment for arriving commands
    *               (defaults to wall clock; tests pin a literal)
    * @return (commands as engine events, dead-letter lines)
    */
  def commandsFromJsonLines(lines: DataFrame,
      nowMs: Column = unix_millis(current_timestamp())): (Dataset[EngineEvent], DataFrame) = {
    import lines.sparkSession.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "command STRING, target_id INT, channels ARRAY<INT>, duration LONG, _corrupt_record STRING")
    val parsed = lines
      .filter(length(trim(col("value"))) > 0) // empty-line drop (:308)
      .withColumn("p", from_json(trim(col("value")), schema,
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("ok",
        col("p").isNotNull && col("p._corrupt_record").isNull &&
          col("p.command") === "override_channels" &&
          col("p.target_id").isNotNull && col("p.channels").isNotNull &&
          col("p.duration").isNotNull)
    val commands = parsed.filter(col("ok"))
      .select(
        col("p.target_id").as("targetId"),
        lit("command").as("kind"),
        monotonically_increasing_id().as("seq"),
        nowMs.as("tsm"),
        col("p.channels").as("channels"),
        col("p.duration").as("durationMs"))
      .as[EngineEvent]
    val deadLetter = parsed.filter(!col("ok")).select(col("value"))
    (commands, deadLetter)
  }
}
