package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TransitionsSpec extends SparkSpec {

  test("streaming transitions aggregate to batch q90's counts on the events table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the real events table, per-user-in-order (the delivery contract)
    // across two installments split mid-history; WITHIN each
    // installment the rows are jumbled — the intra-batch sort must
    // recover batch q90's (tsm, event_id) order
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tsm"))
      .collect().map(r =>
        TransitionEvent(r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(e => (e.userId, e.tsm, e.eventId))
    val cut = events.map(_.tsm).sorted.apply(events.length / 2)
    // ties at tsm == cut route as a WHOLE per user (even users first
    // installment, odd users second) so each user's delivered sequence
    // stays a (tsm, eventId)-ordered prefix — splitting ties by
    // eventId parity could deliver a later-ordered even id before an
    // earlier odd one, violating the per-user in-order contract the
    // fold assumes
    val (first, second) = events.partition(e => e.tsm < cut ||
      (e.tsm == cut && e.userId % 2 == 0))
    val rnd = new scala.util.Random(7)
    val in = MemoryStream[TransitionEvent]
    val query = Transitions.transitionIncrements(in.toDS())
      .writeStream.format("memory").queryName("transitions_mem")
      .outputMode("update").start()
    try {
      in.addData(rnd.shuffle(first.toSeq))
      query.processAllAvailable()
      in.addData(rnd.shuffle(second.toSeq))
      query.processAllAvailable()
      val emitted = spark.table("transitions_mem").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // (userId, dstEventId) is the advertised idempotency key — the
      // stream must not emit it twice
      val keys = emitted.map(e => (e._3, e._4))
      assert(keys.length == keys.distinct.length, "duplicate increment keys")
      // aggregated increments == batch q90's n per (src, dst)
      val got = emitted.groupBy(e => (e._1, e._2)).view
        .mapValues(_.length.toLong).toMap
      val want = graft.operators.Relational.q90TransitionMatrix(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got == want, s"stream $got\nbatch $want")
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("transition state holds exactly the tail: a later installment pairs with it, not with history") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TransitionEvent]
    val query = Transitions.transitionIncrements(in.toDS())
      .writeStream.format("memory").queryName("transitions_tail_mem")
      .outputMode("update").start()
    try {
      in.addData(TransitionEvent(1L, 10L, "view", 100L),
        TransitionEvent(1L, 11L, "click", 200L))
      query.processAllAvailable()
      // the cross-batch pair must be click(200) -> purchase(300):
      // exactly one increment, sourced at the held tail
      in.addData(TransitionEvent(1L, 12L, "purchase", 300L))
      query.processAllAvailable()
      val got = spark.table("transitions_tail_mem").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
      assert(got == Set(("view", "click", 11L), ("click", "purchase", 12L)))
    } finally query.stop()
  }

  test("idle timeout evicts the tail: exactly the one straddling increment is missed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TransitionEvent]
    // 1 ms horizon so the tail evicts between installments; NOTE
    // processAllAvailable hangs under ProcessingTimeTimeout (continuous
    // timeout-check batches), so this test polls the sink instead — the
    // BasketsSpec eviction shape
    val query = Transitions.transitionIncrements(in.toDS(),
        idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("transitions_evict_mem")
      .outputMode("update").start()
    def pollUntil(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
      assert(cond, "condition not reached within 30 s")
    }
    try {
      in.addData(TransitionEvent(1L, 1L, "view", 1000L))
      pollUntil(query.recentProgress.map(_.numInputRows).sum >= 1L)
      Thread.sleep(2000) // horizon passes; a timeout batch drops the tail
      // the click arrives post-eviction: its (view -> click) increment is
      // the documented at-most-one loss; the purchase in the SAME batch
      // pairs with the click normally — everything after re-seeding holds
      in.addData(TransitionEvent(1L, 2L, "click", 2000L),
        TransitionEvent(1L, 3L, "purchase", 3000L))
      pollUntil(spark.table("transitions_evict_mem").count() >= 1L)
      Thread.sleep(500)
      val incs = spark.table("transitions_evict_mem").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // without eviction this would also hold ("view", "click", 1, 2)
      assert(incs.toSeq == Seq(("click", "purchase", 1L, 3L)), s"got ${incs.toSeq}")
    } finally query.stop()
  }

}
