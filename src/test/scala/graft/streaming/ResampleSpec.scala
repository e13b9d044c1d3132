package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object ResampleSpec {
  /** Cross-restart sink for the checkpoint-recovery test. */
  val restartSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]
}

class ResampleSpec extends SparkSpec {

  test("streaming lerp emissions match batch q84 on every determined grid instant") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the real events table, replayed per-user-in-order across two
    // installments split mid-history
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tsm"), col("value"))
      .collect()
      .map(r => ResampleEvent(r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(e => (e.userId, e.tsm, e.eventId))
    val in = MemoryStream[ResampleEvent]
    val query = Resample.gridEmissions(in.toDS())
      .writeStream.format("memory").queryName("resample_mem")
      .outputMode("update").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      in.addData(first.toSeq)
      query.processAllAvailable()
      in.addData(second.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("resample_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val batch = graft.operators.Reference.q84LerpResample(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // the one documented divergence: a grid instant exactly on a
      // user's final (= newest) timestamp is undetermined until the
      // history advances, so the stream holds it back
      val maxTs = events.groupBy(_.userId).view.mapValues(_.map(_.tsm).max).toMap
      val (deferred, determined) =
        batch.partition { case ((u, t), _) => t == maxTs(u) }
      assert(streamed.keySet == determined.keySet,
        s"determined-instant mismatch: stream-only ${streamed.keySet.diff(determined.keySet).take(3)}, " +
          s"batch-only ${determined.keySet.diff(streamed.keySet).take(3)}")
      // bit-identical values — same double arithmetic, same HALF_UP
      // round-6 on both sides
      determined.foreach { case (k, v) =>
        assert(streamed(k) == v, s"grid $k: stream ${streamed(k)} vs batch $v")
      }
      // the carve-out is exactly the aligned-final-instant rows
      deferred.keys.foreach { case (u, t) =>
        assert(t % Resample.CellMs == 0 && t == maxTs(u))
      }
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("lerp tie semantics: grid on an event instant takes the LAST value there, interpolation targets the FIRST") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val c = Resample.CellMs
    val in = MemoryStream[ResampleEvent]
    val query = Resample.gridEmissions(in.toDS())
      .writeStream.format("memory").queryName("resample_tie_mem")
      .outputMode("update").start()
    try {
      // two events at t=0 (ids 1, 2), two at t=2c (ids 3, 4), and a
      // closer at t=3c so every earlier instant is determined:
      //   grid 0   -> last value at 0    = 20 (id 2)
      //   grid c   -> lerp 20 -> 30 (id 3 FIRST at 2c) at frac 1/2 = 25
      //   grid 2c  -> last value at 2c   = 40 (id 4)
      in.addData(
        ResampleEvent(9L, 1L, 0L, 10.0), ResampleEvent(9L, 2L, 0L, 20.0),
        ResampleEvent(9L, 3L, 2 * c, 30.0), ResampleEvent(9L, 4L, 2 * c, 40.0),
        ResampleEvent(9L, 5L, 3 * c, 99.0))
      query.processAllAvailable()
      val got = spark.table("resample_tie_mem").collect()
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
      assert(got == Map(0L -> 20.0, c -> 25.0, 2 * c -> 40.0), s"got $got")
    } finally query.stop()
  }

  test("grid emissions survive a checkpoint restart without re-emitting") {
    // the increment-trio's third restart proof (cohort, baskets,
    // resample): a restarted query must lerp from the RECOVERED last
    // event, and never re-emit instants the first incarnation covered
    import scala.jdk.CollectionConverters._
    val c = Resample.CellMs
    val root = java.nio.file.Files.createTempDirectory("graft-resample-restart")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def startQuery() = StateStores.withRocksDB(spark) {
      val parts = split(col("value"), "\\|")
      val events = spark.readStream.text(inDir.toString)
        .select(parts.getItem(0).cast("long").as("userId"),
          parts.getItem(1).cast("long").as("eventId"),
          parts.getItem(2).cast("long").as("tsm"),
          parts.getItem(3).cast("double").as("value"))
        .as[ResampleEvent](org.apache.spark.sql.Encoders.product[ResampleEvent])
      Resample.gridEmissions(events)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[GridPoint], _: Long) =>
          batch.collect().foreach(g => ResampleSpec.restartSink
            .add((g.userId, g.gridMs, g.value)))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what " +
        s"(sink: ${ResampleSpec.restartSink.asScala.toSeq})")
    }
    ResampleSpec.restartSink.clear()
    // phase 1: events at 0 (v=10) and 2c (v=30) → grid 0 (10.0) and
    // grid c (lerp midpoint = 20.0); grid 2c stays undetermined
    val q1 = startQuery()
    try {
      addFile("f1.txt", Seq("5|1|0|10.0", s"5|2|${2 * c}|30.0"))
      await(ResampleSpec.restartSink.size() == 2, "phase-1 grid points")
      awaitCheckpointQuiesced(ckpt)
    } finally q1.stop()
    // phase 2: restart — an event at 4c (v=50) must lerp FROM THE
    // RECOVERED (2c, 30) state: grid 2c emits its held value 30, grid
    // 3c lerps 30→50 midpoint = 40; nothing before 2c re-emits
    val q2 = startQuery()
    try {
      addFile("f2.txt", Seq(s"5|3|${4 * c}|50.0"))
      await(ResampleSpec.restartSink.size() >= 4, "phase-2 grid points")
      Thread.sleep(500)
      val got = ResampleSpec.restartSink.asScala.toSeq
      assert(got.size == got.distinct.size,
        s"a grid point re-emitted across the restart: $got")
      assert(got.toSet == Set((5L, 0L, 10.0), (5L, c, 20.0),
        (5L, 2 * c, 30.0), (5L, 3 * c, 40.0)), s"got $got")
    } finally q2.stop()
  }

  test("idle timeout evicts the endpoint: only the straddling gap\'s grid points are lost") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val c = Resample.CellMs
    val in = MemoryStream[ResampleEvent]
    // 1 ms horizon; polls the sink (processAllAvailable never settles
    // under ProcessingTimeTimeout) — the BasketsSpec eviction shape
    val query = Resample.gridEmissions(in.toDS(),
        idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("resample_evict_mem")
      .outputMode("update").start()
    def pollUntil(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
      assert(cond, "condition not reached within 30 s")
    }
    try {
      in.addData(ResampleEvent(1L, 1L, 0L, 0.0))
      pollUntil(query.recentProgress.map(_.numInputRows).sum >= 1L)
      Thread.sleep(2000) // horizon passes; the held endpoint drops
      // post-eviction the 2-cell event re-seeds (grid 0 and cell 1 from
      // the straddling gap are the documented loss); the 3-cell event in
      // the SAME batch supersedes it, so its own instant emits normally
      in.addData(ResampleEvent(1L, 2L, 2 * c, 100.0),
        ResampleEvent(1L, 3L, 3 * c, 200.0))
      pollUntil(spark.table("resample_evict_mem").count() >= 1L)
      Thread.sleep(500)
      val pts = spark.table("resample_evict_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // without eviction: (1, 0, 0.0) and (1, c, 50.0) would emit too
      assert(pts.toSeq == Seq((1L, 2 * c, 100.0)), s"got ${pts.toSeq}")
    } finally query.stop()
  }

}
