package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

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
}
