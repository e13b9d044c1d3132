package graft.streaming

import graft.functions.ChannelFunctions.sbusRescale
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

/** S4/S6 — output sinks: the ESP-NOW per-target fan-out and the SBUS
  * re-emission, as `foreachBatch` writers over the engine's snapshot
  * stream. Both delivery paths accept kind "snapshot" AND "timeout":
  * on a quiet input the engine's hold timer re-emits held state as
  * "timeout" rows, and those must reach the wire — that re-emission IS
  * the reference's sample-and-hold output (30 Hz SBUS from a 2 Hz
  * input, `src/receiver/main.cpp:62-74`).
  *
  * The transport is pluggable (`send` callbacks) — production would
  * bind a radio/UART driver; tests bind recorders. Delivery iterates
  * partitions distributed-side: the snapshot relation is bounded by
  * the target count (keyed state emits one row per target), so no
  * collect, no driver bottleneck, at any input scale.
  */
object Sinks {

  /** 16-byte packed channel frame: 8 × uint16 little-endian — the
    * exact wire layout of the reference's `ChannelData` memcpy
    * (`src/transmitter/main.cpp:104`, `sizeof(ChannelData)` = 16). */
  def packFrame(channels: Seq[Int]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    channels.padTo(8, 0).take(8).foreach(v => buf.putShort((v & 0xFFFF).toShort))
    buf.array()
  }

  /** One fan-out delivery pass over a snapshot micro-batch: send each
    * target's packed effective frame to its MAC
    * (`src/transmitter/main.cpp:100-106`). Exposed separately so batch
    * tests and the streaming writer share the exact code path. */
  def deliverFanOut(batch: DataFrame, macForId: Int => String,
      send: (String, Array[Byte]) => Unit): Unit =
    batch.filter(col("kind").isin("snapshot", "timeout"))
      .select(col("targetId"), col("effective"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          send(macForId(r.getInt(0)), packFrame(r.getSeq[Int](1)))
        }
      }

  /** Replay guard for `foreachBatch` side effects: Structured
    * Streaming re-runs a micro-batch after a failure/restart with the
    * SAME batchId; a delivery that already COMPLETED for that id is
    * skipped on replay. The marker is a committed file per batchId
    * next to the checkpoint (written atomically via rename, AFTER the
    * delivery pass returns) — the streaming analog of a transactional
    * sink's (queryId, batchId) dedup key.
    *
    * Semantics, precisely: fully-delivered batches are never replayed
    * (their marker exists), but a crash MID-delivery leaves no marker,
    * so the restart re-runs the whole pass — rows sent before the
    * crash duplicate. That window is at-least-once; true exactly-once
    * needs a transactional target (or per-row idempotence downstream).
    * Markers older than [[MarkerRetention]] batches are pruned on each
    * successful delivery — only the latest batch is replayable, so a
    * deep history serves nothing and would otherwise grow one file per
    * batch forever. */
  val MarkerRetention = 8

  def deliverOnce(markerDir: String, batchId: Long)(deliver: => Unit): Boolean = {
    val dir = java.nio.file.Paths.get(markerDir)
    java.nio.file.Files.createDirectories(dir)
    val marker = dir.resolve(s"batch-$batchId.done")
    if (java.nio.file.Files.exists(marker)) false
    else {
      deliver
      val tmp = dir.resolve(s".batch-$batchId.tmp")
      java.nio.file.Files.write(tmp, Array.emptyByteArray)
      java.nio.file.Files.move(tmp, marker,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val horizon = batchId - MarkerRetention
      if (horizon >= 0) {
        val stream = java.nio.file.Files.list(dir)
        try stream.forEach { p =>
          val n = p.getFileName.toString
          if (n.startsWith("batch-") && n.endsWith(".done")) {
            val id = n.stripPrefix("batch-").stripSuffix(".done")
            if (id.forall(_.isDigit) && id.toLong < horizon)
              java.nio.file.Files.deleteIfExists(p)
          }
        } finally stream.close()
      }
      true
    }
  }

  /** S4: the 2 Hz ESP-NOW fan-out writer (`RADIO_SEND_FREQ_HZ = 2`,
    * `src/transmitter/main.cpp:23-25`). Replays of FULLY-delivered
    * micro-batches are skipped via [[deliverOnce]]; a crash mid-pass
    * re-delivers that one batch on restart (see the deliverOnce
    * contract) — acceptable for the radio, whose receiver is
    * last-write-wins (`src/receiver/main.cpp:36`). */
  def fanOutWriter(out: Dataset[EngineOutput], checkpointDir: String,
      macForId: Int => String,
      send: (String, Array[Byte]) => Unit): DataStreamWriter[EngineOutput] =
    out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[EngineOutput], batchId: Long) =>
        deliverOnce(s"$checkpointDir/delivered", batchId) {
          deliverFanOut(batch.toDF(), macForId, send)
        }
        ()
      }

  /** One SBUS emission pass: rescale each effective channel with the
    * exact truncating-integer map 1000–2000 → 172–1811 and hand the
    * frame to the UART callback (`src/receiver/main.cpp:62-74`). The
    * rescale runs as a column expression (codegen) before the sink. */
  def deliverSbus(batch: DataFrame, send: (Int, Seq[Int]) => Unit): Unit =
    batch.filter(col("kind").isin("snapshot", "timeout"))
      .select(col("targetId"),
        transform(col("effective"), c => sbusRescale(c)).as("sbus"))
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach(r => send(r.getInt(0), r.getSeq[Int](1)))
      }

  /** S5/P4 streaming — the 2 Hz `targets_update` telemetry: per
    * trigger, the micro-batch's freshest state per target (snapshot or
    * hold re-emission) joins the registry dimension and becomes ONE
    * envelope document, exactly like the reference's per-tick
    * `send_targets_update` (`src/transmitter/main.cpp:282-296`).
    *
    * @param registry columns `id, name, mac, connection_state,
    *                 last_successful_send` — identity from the
    *                 bootstrap (R2), ack columns owned by the
    *                 transport layer (the radio callback updates them
    *                 in the reference, `:55-75`; here the fan-out
    *                 `send` callback's results feed them)
    *
    * The latest-per-target reduction and registry join run
    * distributed; only the finished one-row document crosses to the
    * driver — the envelope is inherently a single serial line per
    * tick, so that row IS the output. Emission goes through
    * [[deliverOnce]]: a replayed, fully-emitted batch never re-prints
    * its document (crash between emit and marker → one reprint). */
  def telemetryWriter(out: Dataset[EngineOutput], checkpointDir: String,
      registry: DataFrame, emit: String => Unit): DataStreamWriter[EngineOutput] =
    out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[EngineOutput], batchId: Long) =>
        if (!batch.isEmpty) {
          deliverOnce(s"$checkpointDir/telemetry-delivered", batchId) {
            val latest = batch.toDF()
              .filter(col("kind").isin("snapshot", "timeout"))
              .groupBy(col("targetId"))
              .agg(max_by(
                struct(col("effective"), col("isOverridden"), col("remainingMs")),
                struct(col("tsm"), col("seq"))).as("s"))
              .select(col("targetId").as("id"),
                col("s.effective").as("channels"),
                col("s.isOverridden").as("is_channels_overridden"),
                col("s.remainingMs").as("override_timeout_remaining"))
            val snap = latest.join(broadcast(registry), "id")
            graft.operators.Telemetry.targetsUpdateJson(snap)
              .collect().foreach(r => emit(r.getString(0)))
          }
          ()
        }
      }

  /** Update-mode streaming aggregation → keyed upsert sink: running
    * per-target event counts emitted as CHANGED ROWS each micro-batch
    * (`OutputMode.Update` — the complement of the append-mode windowed
    * aggregations, which only emit watermark-finalized rows) and
    * upserted by key into a serving store via `foreachBatch`. The
    * pattern for maintaining a live lookup table from a stream: the
    * store always holds the latest count per target, and replayed
    * batches re-upsert the same values (idempotent by construction —
    * upserts of identical (key, value) pairs converge). */
  def upsertCountsWriter(events: Dataset[EngineEvent], checkpointDir: String,
      upsert: (Int, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    // the aggregation key IS the upsert key: update mode ships only
    // changed rows, so any sink-side re-aggregation across a finer
    // grouping would see partial state
    events.toDF()
      .groupBy(col("targetId"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          rows.foreach(r => upsert(r.getInt(0), r.getLong(1)))
        }
      }

  /** S6: the 30 Hz SBUS writer (`SBUS_SEND_HZ = 30`,
    * `src/receiver/main.cpp:20-22` — 33 ms period). */
  def sbusWriter(out: Dataset[EngineOutput], checkpointDir: String,
      send: (Int, Seq[Int]) => Unit): DataStreamWriter[EngineOutput] =
    out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("33 milliseconds"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[EngineOutput], _: Long) =>
        deliverSbus(batch.toDF(), send)
      }
}
