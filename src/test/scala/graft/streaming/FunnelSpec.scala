package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object FunnelSpec {
  /** Cross-restart sink for the cohort checkpoint-recovery test —
    * static so both query incarnations land in one collection. */
  val cohortRestartSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]
}

class FunnelSpec extends SparkSpec {

  test("streaming funnel agrees with batch q77's per-user stage times on the events table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the real events table, replayed per-user-in-order (the delivery
    // contract) across two installments split mid-history
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("tsm"))
      .collect().map(r => FunnelEvent(r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e.userId, e.tsm))
    // batch truth: the q77 cascade replayed locally per user
    val expected = events.groupBy(_.userId).map { case (u, es) =>
      val v = es.filter(_.eventType == "view").map(_.tsm).minOption
      val c = v.flatMap(vm => es.filter(e =>
        e.eventType == "click" && e.tsm >= vm).map(_.tsm).minOption)
      val p = c.flatMap(cm => es.filter(e =>
        e.eventType == "purchase" && e.tsm >= cm).map(_.tsm).minOption)
      u -> FunnelProgress(u, v, c, p)
    }
    val in = MemoryStream[FunnelEvent]
    val query = Funnel.stageTimes(in.toDS())
      .writeStream.format("memory").queryName("funnel_mem")
      .outputMode("update").start()
    try {
      val (first, second) = events.splitAt(events.length / 2)
      in.addData(first.toSeq)
      query.processAllAvailable()
      in.addData(second.toSeq)
      query.processAllAvailable()
      // update mode: the LAST upsert per user is the answer
      val got = spark.table("funnel_mem").collect()
        .map(r => FunnelProgress(r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .groupBy(_.userId).map { case (u, rows) => u -> rows.last }
      assert(got.keySet == expected.keySet)
      expected.foreach { case (u, want) =>
        assert(got(u) == want, s"user $u: stream ${got(u)} vs batch $want")
      }
      // stage counts line up with the q77 report itself
      val report = graft.operators.Relational.q77Funnel(spark, sfDir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(report("1_view") == expected.values.count(_.viewMs.isDefined))
      assert(report("2_click") == expected.values.count(_.clickMs.isDefined))
      assert(report("3_purchase") == expected.values.count(_.purchaseMs.isDefined))
      // the state machine is genuinely stateful
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("streaming funnel order semantics: pre-view clicks never count, intra-batch jumble is sorted") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[FunnelEvent]
    val query = Funnel.stageTimes(in.toDS())
      .writeStream.format("memory").queryName("funnel_order_mem")
      .outputMode("update").start()
    try {
      // one batch, deliberately jumbled within the trigger: the
      // intra-batch event-time sort must recover view(10) before
      // click(20) before purchase(30); the click at 5 precedes the
      // first view in EVENT time and must never count
      in.addData(
        FunnelEvent(1L, "purchase", 30L), FunnelEvent(1L, "click", 5L),
        FunnelEvent(1L, "click", 20L), FunnelEvent(1L, "view", 10L),
        // user 2: click with no view ever — stays at stage 0
        FunnelEvent(2L, "click", 7L))
      query.processAllAvailable()
      val got = spark.table("funnel_order_mem").collect()
        .map(r => r.getLong(0) -> ((
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
      assert(got(1L) == ((Some(10L), Some(20L), Some(30L))), s"user 1: ${got(1L)}")
      assert(got(2L) == ((None, None, None)), s"user 2: ${got(2L)}")
    } finally query.stop()
  }

  test("streaming cohort increments aggregate to batch q78's retention triangle") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the real events table, replayed per-user-in-order across two
    // installments split mid-history (the stageTimes pattern) — the
    // second installment re-activates users the first already counted,
    // so at-most-once increment emission is actually exercised
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("tsm"))
      .collect().map(r => FunnelEvent(r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e.userId, e.tsm))
    val in = MemoryStream[FunnelEvent]
    // RocksDB-backed: the per-user cohort state is exactly the
    // working set that outgrows heap at the 100 TB user population —
    // parity must hold through the disk-backed provider too
    val query = StateStores.withRocksDB(spark) {
      Cohort.retentionIncrements(in.toDS())
        .writeStream.format("memory").queryName("cohort_mem")
        .outputMode("update").start()
    }
    try {
      val (first, second) = events.splitAt(events.length / 2)
      in.addData(first.toSeq)
      query.processAllAvailable()
      in.addData(second.toSeq)
      query.processAllAvailable()
      val incs = spark.table("cohort_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // at-most-once per (user, offset): the contract that makes a
      // plain count() a countDistinct
      assert(incs.distinct.length == incs.length,
        "an increment was emitted twice")
      val streamed = incs.groupBy(i => (i._1, i._2))
        .view.mapValues(_.length.toLong).toMap
      // batch truth: the q78 triangle's (cohort_week, week_offset,
      // n_active) cells — row-identical, cell for cell
      val batch = graft.operators.Relational.q78CohortRetention(spark, sfDir)
        .select(col("cohort_week"), col("week_offset"), col("n_active"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"triangle mismatch: stream-only ${streamed.toSet.diff(batch.toSet).take(3)}, " +
          s"batch-only ${batch.toSet.diff(streamed.toSet).take(3)}")
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("cohort increments survive a checkpoint restart without re-emitting") {
    // THE property the increment pattern stands on: a downstream
    // counts store adds every emitted row, so a restart that re-emits
    // (state lost) or replays (offsets lost) DOUBLE-COUNTS. Two query
    // incarnations over one checkpoint + RocksDB state.
    import scala.jdk.CollectionConverters._
    val w = Cohort.WeekMs
    val root = java.nio.file.Files.createTempDirectory("graft-cohort-restart")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def startQuery() = StateStores.withRocksDB(spark) {
      val parts = split(col("value"), "\\|")
      val events = spark.readStream.text(inDir.toString)
        .select(parts.getItem(0).cast("long").as("userId"),
          parts.getItem(1).as("eventType"),
          parts.getItem(2).cast("long").as("tsm"))
        .as[FunnelEvent](org.apache.spark.sql.Encoders.product[FunnelEvent])
      Cohort.retentionIncrements(events)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[CohortIncrement], _: Long) =>
          batch.collect().foreach(i => FunnelSpec.cohortRestartSink
            .add((i.cohortWeek, i.weekOffset, i.userId)))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what " +
        s"(sink: ${FunnelSpec.cohortRestartSink.asScala.toSeq})")
    }
    FunnelSpec.cohortRestartSink.clear()
    // phase 1: user 1 active in weeks 10 and 11 → offsets 0, 1
    val q1 = startQuery()
    try {
      addFile("f1.txt", Seq(s"1|view|${10 * w + 100}", s"1|click|${11 * w + 5}"))
      await(FunnelSpec.cohortRestartSink.size() == 2, "phase-1 increments")
      awaitCheckpointQuiesced(ckpt)
    } finally q1.stop()
    // phase 2: restart — week 11 again (already counted: recovered
    // state must suppress), week 12 (new offset), and a new user
    val q2 = startQuery()
    try {
      addFile("f2.txt", Seq(s"1|view|${11 * w + 900}",
        s"1|view|${12 * w + 1}", s"2|view|${12 * w + 2}"))
      await(FunnelSpec.cohortRestartSink.size() >= 4, "phase-2 increments")
      Thread.sleep(500)
      val got = FunnelSpec.cohortRestartSink.asScala.toSeq
      assert(got.size == got.distinct.size,
        s"an increment was emitted twice across the restart: $got")
      assert(got.toSet == Set((10L, 0L, 1L), (10L, 1L, 1L),
        (10L, 2L, 1L), (12L, 0L, 2L)), s"got $got")
    } finally q2.stop()
  }
}
