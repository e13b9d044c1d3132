package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

object SessionsSpec {
  /** Recorder for the restart test — a companion-object queue so the
    * foreachBatch closure survives serialization. */
  val restartSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
}

class SessionsSpec extends SparkSpec {

  test("native session windows equal batch q21 sessions, emit once, evict state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("timestamp"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(events.nonEmpty)
    val cut = events.map(_._2.getTime).sorted.apply(events.length / 2)
    val sentinel = (999999999L,
      new java.sql.Timestamp(events.map(_._2.getTime).max + 365L * 86400000L))
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val query = Sessions.sessionize(in.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sessions_mem")
      .outputMode("append").start()
    try {
      // two time-ordered installments (watermark advances between
      // batches, so no event arrives behind it), then a far-future
      // sentinel that closes every real session
      in.addData(events.filter(_._2.getTime <= cut).toSeq)
      query.processAllAvailable()
      val early = spark.table("sessions_mem").count()
      in.addData(events.filter(_._2.getTime > cut).toSeq)
      query.processAllAvailable()
      in.addData(Seq(sentinel))
      query.processAllAvailable()
      val streamed = spark.table("sessions_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // exactly once: no session row repeats across installments
      assert(streamed.length == streamed.distinct.length,
        "a session emitted twice")
      // mid-stream emission happened (sessions closed by installment 2's
      // watermark), yet nothing straddling the cut emitted early
      assert(early < streamed.length.toLong)
      // batch truth: q21's lag + running-sum sessionization
      val batch = graft.operators.Reference.q21Sessionize(spark, sfDir)
        .select("user_id", "start_ms", "end_ms", "n_events", "duration_ms")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val streamedReal = streamed.filter(_._1 != sentinel._1).toSet
      assert(streamedReal == batch.toSet,
        s"closed sessions diverge: stream ${streamedReal.size} vs batch ${batch.length}")
      // the sentinel's own session is still OPEN — never emitted
      assert(!streamed.exists(_._1 == sentinel._1))
      // state eviction: after everything closed, only the sentinel's
      // open session remains in the store
      val rowsInState = query.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(rowsInState <= 1,
        s"closed-session state must evict, found $rowsInState rows")
    } finally query.stop()
  }

  test("session state survives a checkpoint restart on RocksDB, no re-emission") {
    val root = java.nio.file.Files.createTempDirectory("graft-sessions-restart")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = root.resolve("ckpt").toString
    val t0 = 1600000000000L
    def addFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def startQuery() = StateStores.withRocksDB(spark) {
      val parts = split(col("value"), "\\|")
      val events = spark.readStream.text(inDir.toString)
        .select(parts.getItem(0).cast("long").as("user_id"),
          timestamp_millis(parts.getItem(1).cast("long")).as("ts"))
      Sessions.sessionize(events)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("user_id", "start_ms", "n_events").collect().foreach(r =>
            SessionsSpec.restartSink.add((r.getLong(0), r.getLong(1), r.getLong(2))))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what " +
        s"(sink: ${SessionsSpec.restartSink.asScala.toSeq})")
    }
    SessionsSpec.restartSink.clear()
    // phase 1: user 1 opens a 2-event session; a far sentinel closes it
    val q1 = startQuery()
    try {
      addFile("f1.txt", Seq(s"1|$t0", s"1|${t0 + 60000}"))
      addFile("f2.txt", Seq(s"99|${t0 + 36000000L}"))
      await(SessionsSpec.restartSink.asScala.exists(_._1 == 1L), "phase-1 close")
      assert(SessionsSpec.restartSink.asScala.toSet ==
        Set((1L, t0, 2L)), "phase-1 emitted exactly user 1's session")
      // quiesce BEFORE stopping (the SparkSpec helper's contract):
      // foreachBatch runs pre-commit, so an immediate stop could kill
      // the emission batch mid-commit and replay it after recovery
      awaitCheckpointQuiesced(ckpt)
    } finally q1.stop()
    // phase 2: restart — the sentinel's OPEN session must have been
    // recovered (an event inside its gap merges instead of starting
    // fresh), and user 1's closed session must NOT re-emit
    val q2 = startQuery()
    try {
      addFile("f3.txt", Seq(s"99|${t0 + 36000000L + 60000}"))
      addFile("f4.txt", Seq(s"98|${t0 + 200000000L}"))
      await(SessionsSpec.restartSink.asScala.exists(_._1 == 99L), "phase-2 close")
      val seen = SessionsSpec.restartSink.asScala.toSeq
      // the recovered open session MERGED the new event: 2 events from
      // the pre-restart start — state really came back
      assert(seen.contains((99L, t0 + 36000000L, 2L)),
        s"sentinel session lost its pre-restart event: $seen")
      // and nothing emitted twice
      assert(seen.size == seen.toSet.size && seen.count(_._1 == 1L) == 1,
        s"re-emission after restart: $seen")
    } finally q2.stop()
  }
}
