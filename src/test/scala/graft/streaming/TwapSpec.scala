package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TwapSpec extends SparkSpec {

  test("streaming twap: final rows match batch q92 on the events table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the real events table, per-user-in-order across two installments,
    // jumbled within each — the intra-batch (tsm, eventId) sort must
    // recover batch q92's ordering
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("tsm"))
      .collect().map(r =>
        TwapEvent(r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(e => (e.userId, e.tsm, e.eventId))
    val cut = events.map(_.tsm).sorted.apply(events.length / 2)
    val (first, second) = events.partition(_.tsm < cut)
    val rnd = new scala.util.Random(11)
    val in = MemoryStream[TwapEvent]
    val query = Twap.running(in.toDS())
      .writeStream.format("memory").queryName("twap_mem")
      .outputMode("update").start()
    try {
      in.addData(rnd.shuffle(first.toSeq))
      query.processAllAvailable()
      in.addData(rnd.shuffle(second.toSeq))
      query.processAllAvailable()
      // update mode: the LAST upsert per user is the answer
      val got = spark.table("twap_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .groupBy(_._1).map { case (u, rows) => u -> rows.last }
      val batch = graft.operators.Relational.q92Twap(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // every batch row (span > 0) must match count and 6-decimal twap
      batch.foreach { case (u, (n, twap)) =>
        val (_, gn, gtwap) = got(u)
        assert(gn == n, s"user $u: stream count $gn vs batch $n")
        val rounded = BigDecimal(gtwap.get)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(rounded - twap) < 1e-9,
          s"user $u: stream $rounded vs batch $twap")
      }
      // users the batch EXCLUDES (zero span) surface as undetermined
      got.collect { case (u, (_, _, None)) => u }
        .foreach(u => assert(!batch.contains(u)))
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("streaming twap holds O(1) tail state: intervals accumulate incrementally") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TwapEvent]
    val query = Twap.running(in.toDS())
      .writeStream.format("memory").queryName("twap_tail_mem")
      .outputMode("update").start()
    try {
      // value 10 held for 100ms, then 20 for 100ms:
      // area = (10+20)/2*100 + (20+40)/2*100 = 1500 + 3000; span 200
      in.addData(TwapEvent(1L, 1L, 10.0, 0L), TwapEvent(1L, 2L, 20.0, 100L))
      query.processAllAvailable()
      in.addData(TwapEvent(1L, 3L, 40.0, 200L))
      query.processAllAvailable()
      val last = spark.table("twap_tail_mem").collect()
        .filter(_.getLong(0) == 1L).last
      assert(last.getLong(1) == 3L)
      assert(math.abs(last.getDouble(2) - 4500.0 / 200.0) < 1e-12)
      // single-event user stays undetermined
      in.addData(TwapEvent(2L, 4L, 5.0, 50L))
      query.processAllAvailable()
      val u2 = spark.table("twap_tail_mem").collect()
        .filter(_.getLong(0) == 2L).last
      assert(u2.isNullAt(2))
    } finally query.stop()
  }

  test("idle timeout evicts the accumulator: a returning user restarts as a fresh span") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TwapEvent]
    // 1 ms horizon; polls the sink (processAllAvailable never settles
    // under ProcessingTimeTimeout) — the BasketsSpec eviction shape
    val query = Twap.running(in.toDS(), idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("twap_evict_mem")
      .outputMode("update").start()
    def pollUntil(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
      assert(cond, "condition not reached within 30 s")
    }
    try {
      in.addData(TwapEvent(1L, 1L, 10.0, 0L))
      pollUntil(spark.table("twap_evict_mem").count() >= 1L)
      Thread.sleep(2000) // horizon passes; the accumulator drops
      in.addData(TwapEvent(1L, 2L, 20.0, 10000L))
      pollUntil(query.recentProgress.map(_.numInputRows).sum >= 2L)
      Thread.sleep(500)
      val rows = spark.table("twap_evict_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), !r.isNullAt(2)))
      // the documented trade: the lifetime fold would now read
      // (1, nEvents=2, twap=15.0); the evicted fold restarts — every
      // emitted row (including the eviction re-emission) is a 1-event,
      // zero-span row with twap still undetermined
      assert(rows.nonEmpty && rows.forall(r => r._2 == 1L && !r._3),
        s"got ${rows.toSeq}")
    } finally query.stop()
  }

}
