package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

object AttributionSpec {
  /** Recorder for the restart test (companion queue — the foreachBatch
    * closure must survive serialization). */
  val restartSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
}

class AttributionSpec extends SparkSpec {

  test("stream-stream attribution equals the batch range join, emits once, evicts state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val horizonMs = 14400000L
    val events = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        col("ts").cast("timestamp"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getTimestamp(3)))
    val imps = events.filter(_._1 == "view").map(e => (e._2, e._3, e._4))
    val convs = events.filter(_._1 == "purchase").map(e => (e._2, e._3, e._4))
    assert(imps.nonEmpty && convs.nonEmpty)
    val cut = events.map(_._4.getTime).sorted.apply(events.length / 2)
    val farFuture = new java.sql.Timestamp(
      events.map(_._4.getTime).max + 365L * 86400000L)
    val impIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val convIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val query = Attribution.attribute(
        impIn.toDF().toDF("user_id", "event_id", "ts"),
        convIn.toDF().toDF("user_id", "event_id", "ts"), horizonMs)
      .writeStream.format("memory").queryName("attribution_mem")
      .outputMode("append").start()
    try {
      // two time-ordered installments per side, then far-future
      // sentinels that push both watermarks past every real event
      impIn.addData(imps.filter(_._3.getTime <= cut).toSeq)
      convIn.addData(convs.filter(_._3.getTime <= cut).toSeq)
      query.processAllAvailable()
      impIn.addData(imps.filter(_._3.getTime > cut).toSeq)
      convIn.addData(convs.filter(_._3.getTime > cut).toSeq)
      query.processAllAvailable()
      impIn.addData(Seq((888888888L, 888888888L, farFuture)))
      convIn.addData(Seq((999999999L, 999999999L, farFuture)))
      query.processAllAvailable()
      val streamed = spark.table("attribution_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // exactly once per matched pair
      assert(streamed.length == streamed.distinct.length, "pair emitted twice")
      // batch truth: the identical range join over static frames
      val batch = Attribution.attribute(
          imps.toSeq.toDF("user_id", "event_id", "ts"),
          convs.toSeq.toDF("user_id", "event_id", "ts"), horizonMs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(streamed.toSet == batch.toSet,
        s"stream ${streamed.length} pairs vs batch ${batch.length}")
      assert(batch.nonEmpty, "fixture produced no attributable pairs")
      // every lag inside the horizon, strictly positive
      streamed.foreach { case (_, _, _, lag) =>
        assert(lag > 0 && lag <= horizonMs)
      }
      // state eviction: after the sentinels advanced both watermarks,
      // only the horizon tail (the two sentinels) may remain resident
      val resident = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(resident <= 2,
        s"watermark must evict matched-out state, found $resident rows")
    } finally query.stop()
  }

  test("impression state survives a checkpoint restart; matched pairs never re-emit") {
    val root = java.nio.file.Files.createTempDirectory("graft-attr-restart")
    val impDir = root.resolve("imp"); java.nio.file.Files.createDirectories(impDir)
    val convDir = root.resolve("conv"); java.nio.file.Files.createDirectories(convDir)
    val ckpt = root.resolve("ckpt").toString
    val t0 = 1600000000000L
    def addFile(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def side(dir: java.nio.file.Path) = {
      val parts = split(col("value"), "\\|")
      spark.readStream.text(dir.toString)
        .select(parts.getItem(0).cast("long").as("user_id"),
          parts.getItem(1).cast("long").as("event_id"),
          timestamp_millis(parts.getItem(2).cast("long")).as("ts"))
    }
    def startQuery() = StateStores.withRocksDB(spark) {
      Attribution.attribute(side(impDir), side(convDir))
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("imp_id", "conv_id").collect().foreach(r =>
            AttributionSpec.restartSink.add((r.getLong(0), r.getLong(1))))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what " +
        s"(sink: ${AttributionSpec.restartSink.asScala.toSeq})")
    }
    AttributionSpec.restartSink.clear()
    // phase 1: impression 10 matches conversion 20 (1 h later)
    val q1 = startQuery()
    try {
      addFile(impDir, "i1.txt", Seq(s"7|10|$t0"))
      addFile(convDir, "c1.txt", Seq(s"7|20|${t0 + 3600000L}"))
      await(AttributionSpec.restartSink.asScala.toSet == Set((10L, 20L)),
        "phase-1 match")
      // quiesce BEFORE stopping: foreachBatch runs pre-commit, so an
      // immediate stop can kill batch 1 mid-commit and the recovered
      // incarnation would replay it (the SparkSpec helper's contract)
      awaitCheckpointQuiesced(ckpt)
    } finally q1.stop()
    // phase 2: restart — a second conversion inside impression 10's
    // horizon must STILL match it (recovered join state), and the
    // phase-1 pair must not re-emit
    val q2 = startQuery()
    try {
      addFile(convDir, "c2.txt", Seq(s"7|21|${t0 + 7200000L}"))
      await(AttributionSpec.restartSink.asScala.toSet.contains((10L, 21L)),
        "phase-2 match against recovered impression state")
      val seen = AttributionSpec.restartSink.asScala.toSeq
      assert(seen.count(_ == ((10L, 20L))) == 1,
        s"phase-1 pair re-emitted after restart: $seen")
    } finally q2.stop()
  }
}
