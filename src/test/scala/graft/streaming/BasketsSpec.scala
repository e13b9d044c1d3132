package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class BasketsSpec extends SparkSpec {

  test("streaming co-occurrence increments aggregate to batch q83's pair counts under scattered delivery") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the real lineitem table — sorted by SUPPLIER, not order, so
    // almost every order's items are scattered across the two
    // installments: the hardest legal delivery for per-order state
    val items = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .collect().map(r => BasketItem(r.getLong(0), r.getLong(1)))
      .sortBy(i => (i.supplier, i.orderKey))
    val in = MemoryStream[BasketItem]
    val query = Baskets.pairIncrements(in.toDS())
      .writeStream.format("memory").queryName("baskets_mem")
      .outputMode("update").start()
    try {
      val (first, second) = items.splitAt(items.length / 2)
      in.addData(first.toSeq)
      query.processAllAvailable()
      in.addData(second.toSeq)
      query.processAllAvailable()
      val incs = spark.table("baskets_mem").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // exactly-once per (order, pair): what makes count() = n_orders
      assert(incs.distinct.length == incs.length, "a pair increment repeated")
      val streamed = incs.groupBy(i => (i._1, i._2))
        .view.mapValues(_.length.toLong).toMap
      // local batch truth: per-order distinct supplier sets → pairs
      val expected = items.groupBy(_.orderKey).toSeq
        .flatMap { case (_, is) =>
          val ss = is.map(_.supplier).distinct.sorted
          for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
        }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(streamed == expected,
        s"pair counts diverged: stream-only ${streamed.toSet.diff(expected.toSet).take(3)}, " +
          s"batch-only ${expected.toSet.diff(streamed.toSet).take(3)}")
      // and the registered q83 top-20 is the same ranking of the same
      // counts (n desc, s1, s2 — a deterministic total order)
      val top = streamed.toSeq
        .sortBy { case ((s1, s2), n) => (-n, s1, s2) }.take(20)
        .map { case ((s1, s2), n) => (s1, s2, n) }
      val q83 = graft.operators.Relational.q83CoOccurrence(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(top == q83, "top-20 ranking diverged from batch q83")
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }
}
