package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object BasketsSpec {
  /** Cross-restart sink for the checkpoint-recovery test. */
  val restartSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]
}

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
    // knob OFF here: processAllAvailable cannot settle under
    // ProcessingTimeTimeout's continuous timeout-check batches — the
    // eviction path has its own polling test below
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

  test("idle timeout evicts completed orders: post-eviction items pair with nothing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[BasketItem]
    // a 1-millisecond horizon so the order is evicted between installments;
    // NOTE processAllAvailable hangs under ProcessingTimeTimeout
    // (timeout-check batches run continuously), so this test polls the
    // sink instead
    val query = Baskets.pairIncrements(in.toDS(), idleTimeout = Some("1 millisecond"))
      .writeStream.format("memory").queryName("baskets_evict_mem")
      .outputMode("update").start()
    def rowsIn(table: String): Long = spark.table(table).count()
    def pollUntil(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(100)
      assert(cond, "condition not reached within 30 s")
    }
    try {
      in.addData(BasketItem(1L, 10L), BasketItem(1L, 20L))
      pollUntil(rowsIn("baskets_evict_mem") == 1L) // the (10, 20) pair
      // let the horizon pass and the timeout batch drop the state
      Thread.sleep(2000)
      in.addData(BasketItem(1L, 30L))
      // wait until that item is processed (input rows reach 3 total)
      pollUntil(query.recentProgress.map(_.numInputRows).sum >= 3L)
      Thread.sleep(500)
      // evicted state = empty basket: supplier 30 pairs with NOTHING;
      // without eviction this would be 3 rows ((10,30), (20,30) added)
      assert(rowsIn("baskets_evict_mem") == 1L,
        "post-eviction item must not pair with pre-eviction state")
    } finally query.stop()
  }

  test("pair increments survive a checkpoint restart without re-emitting") {
    // same counts-critical property as the cohort restart proof, for
    // the order-keyed shape: recovered state must suppress pairs the
    // first incarnation already emitted
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-baskets-restart")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def startQuery() = StateStores.withRocksDB(spark) {
      val parts = split(col("value"), "\\|")
      val items = spark.readStream.text(inDir.toString)
        .select(parts.getItem(0).cast("long").as("orderKey"),
          parts.getItem(1).cast("long").as("supplier"))
        .as[BasketItem](org.apache.spark.sql.Encoders.product[BasketItem])
      Baskets.pairIncrements(items)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[PairIncrement], _: Long) =>
          batch.collect().foreach(i => BasketsSpec.restartSink
            .add((i.s1, i.s2, i.orderKey)))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what " +
        s"(sink: ${BasketsSpec.restartSink.asScala.toSeq})")
    }
    BasketsSpec.restartSink.clear()
    // phase 1: order 7 holds suppliers 10, 20 → pair (10, 20)
    val q1 = startQuery()
    try {
      addFile("f1.txt", Seq("7|10", "7|20"))
      await(BasketsSpec.restartSink.size() == 1, "phase-1 pair")
      awaitCheckpointQuiesced(ckpt)
    } finally q1.stop()
    // phase 2: restart — supplier 20 again (in recovered state: no
    // re-emission), supplier 30 (pairs with BOTH recovered members)
    val q2 = startQuery()
    try {
      addFile("f2.txt", Seq("7|20", "7|30"))
      await(BasketsSpec.restartSink.size() >= 3, "phase-2 pairs")
      Thread.sleep(500)
      val got = BasketsSpec.restartSink.asScala.toSeq
      assert(got.size == got.distinct.size,
        s"a pair re-emitted across the restart: $got")
      assert(got.toSet == Set((10L, 20L, 7L), (10L, 30L, 7L), (20L, 30L, 7L)),
        s"got $got")
    } finally q2.stop()
  }
}
