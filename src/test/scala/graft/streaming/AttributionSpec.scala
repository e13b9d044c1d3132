package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

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
}
