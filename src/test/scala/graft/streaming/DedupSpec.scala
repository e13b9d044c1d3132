package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

object DedupSpec {
  /** Recorder for the restart test — a companion-object queue so the
    * foreachBatch closure survives serialization (EngineSpec idiom). */
  val restartSink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
}

/** Streaming dedup through the state store: keep-first semantics,
  * watermark-bounded state, and exactly-once across a checkpoint
  * restart on the RocksDB provider. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: first occurrence kept, in-horizon dups dropped, horizon evicts state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)] // (doc_id, text, epoch sec)
    val docs = in.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    val query = Dedup.dedupExact(docs, "text", "ts", "10 seconds")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    def ids = spark.table("dedup_mem").as[Long].collect().sorted.toSeq
    try {
      // same content under three ids in one batch: only the first passes
      in.addData((1L, "alpha beta", 1L), (2L, "alpha beta", 2L), (3L, "gamma delta", 3L))
      query.processAllAvailable()
      assert(ids == Seq(1L, 3L), s"got $ids")
      // a duplicate in a later batch, still inside the horizon: dropped
      in.addData((4L, "alpha beta", 5L))
      query.processAllAvailable()
      assert(ids == Seq(1L, 3L), s"got $ids")
      // push the watermark far past first-seen + horizon, then re-send:
      // state was evicted, so the re-arrival is re-admitted — the
      // documented horizon contract (bounded state on an infinite
      // stream), not a bug
      in.addData((5L, "unrelated text", 100L))
      query.processAllAvailable()
      in.addData((6L, "alpha beta", 95L))
      query.processAllAvailable()
      assert(ids == Seq(1L, 3L, 5L, 6L), s"got $ids")
    } finally query.stop()
  }

  test("simhash near-dup dedup: token-level near-copies collapse, distinct docs pass") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF().toDF("doc_id", "text", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    val query = Dedup.dedupSimhash(docs, "text", "ts", "1 hour")
      .select("doc_id")
      .writeStream.format("memory").queryName("dedup_sim_mem")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again " * 4
      // a near-copy duplicating one token keeps the same weighted bit
      // votes' signs; an unrelated doc flips them
      in.addData((1L, base, 1L), (2L, base + " the", 2L),
        (3L, "completely different content with other words entirely", 3L))
      query.processAllAvailable()
      val ids = spark.table("dedup_sim_mem").as[Long].collect().sorted.toSeq
      assert(ids.contains(1L) && ids.contains(3L), s"got $ids")
      assert(!ids.contains(2L), s"near-copy must collapse onto doc 1's signature: $ids")
    } finally query.stop()
  }

  test("streaming curation agrees with batch row-for-row (one definition, two modes)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "short doc"), // too_short
      (2L, Seq.tabulate(40)(i => s"tok$i").mkString(" ")), // keep
      (3L, ("the same pair " * 30).trim), // repetitive/low_diversity
      (4L, "mail me at someone@mail.example or see http://site.example/x " +
        Seq.tabulate(30)(i => s"w$i").mkString(" ")),
      (5L, null)) // malformed record: must gate out, not pass as keep
    // batch verdicts + scrub over a plain DataFrame
    val batchDF = rows.toDF("doc_id", "text")
    val expVerdicts = Curation.withQualityVerdict(batchDF, "text")
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expScrub = Curation.piiScrub(batchDF, "text")
      .select("doc_id", "text", "n_pii").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    // the SAME operators over a stream
    val in = MemoryStream[(Long, String)]
    val streamed = Curation.piiScrub(
      Curation.withQualityVerdict(in.toDF().toDF("doc_id", "text"), "text"), "text")
    val query = streamed.writeStream.format("memory").queryName("curation_mem")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("curation_mem").collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[String]("verdict"), r.getAs[String]("text"), r.getAs[Int]("n_pii"))))
        .toMap
      assert(got.keySet == expVerdicts.keySet)
      got.foreach { case (id, (v, t, n)) =>
        assert(v == expVerdicts(id), s"doc $id verdict: $v vs ${expVerdicts(id)}")
        assert((t, n) == expScrub(id), s"doc $id scrub mismatch")
      }
      assert(got(1L)._1 == "too_short" && got(2L)._1 == "keep")
      assert(got(4L)._3 == 2 && got(4L)._2.contains("<EMAIL>") && got(4L)._2.contains("<URL>"))
      // null text: gated out (NOT keep), zero PII, text stays null
      assert(got(5L)._1 == "too_short" && got(5L)._2 == null && got(5L)._3 == 0)
    } finally query.stop()
  }

  test("dedup state survives a restart on RocksDB (exactly-once across checkpoint recovery)") {
    // memory sinks don't replay from checkpoints — record through
    // foreachBatch into a shared queue (EngineSpec restart idiom);
    // RocksDB provider pinned at query start via StateStores.
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-restart")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def startQuery() = StateStores.withRocksDB(spark) {
      val parts = split(col("value"), "\\|")
      val docs = spark.readStream.text(inDir.toString)
        .select(parts.getItem(0).cast("long").as("doc_id"),
          parts.getItem(1).as("text"),
          parts.getItem(2).cast("long").cast("timestamp").as("ts"))
      Dedup.dedupExact(docs, "text", "ts", "1 hour")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("doc_id", "text").collect()
            .foreach(r => DedupSpec.restartSink.add(r.getLong(0) -> r.getString(1)))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what " +
        s"(sink: ${DedupSpec.restartSink.asScala.toSeq})")
    }
    DedupSpec.restartSink.clear()
    // phase 1: "alpha" passes, its in-batch duplicate is dropped
    val q1 = startQuery()
    try {
      addFile("f1.txt", Seq("1|alpha content|1", "2|alpha content|2", "3|beta content|3"))
      await(DedupSpec.restartSink.asScala.map(_._1).toSet == Set(1L, 3L), "phase-1 rows")
      // genuinely on RocksDB: provider-specific metrics in the progress.
      // POLLED: foreachBatch hands rows over before the batch's progress
      // event is published, so the metric can lag the sink — the first
      // await returning does not mean lastProgress is populated yet.
      def rocksdbSeen = q1.recentProgress
        .flatMap(_.stateOperators.flatMap(_.customMetrics.keySet.asScala))
        .exists(_.toLowerCase.contains("rocksdb"))
      await(rocksdbSeen, "rocksdb state metrics in query progress")
    } finally q1.stop()
    // phase 2: restart from the checkpoint — a duplicate of phase 1's
    // content must STILL be dropped (recovered state), a new doc passes
    val q2 = startQuery()
    try {
      addFile("f2.txt", Seq("4|alpha content|5", "5|delta content|6"))
      await(DedupSpec.restartSink.asScala.map(_._1).toSet.contains(5L), "phase-2 row")
      val seen = DedupSpec.restartSink.asScala.map(_._1).toSet
      assert(!seen.contains(4L),
        s"duplicate re-emitted after restart — state lost: $seen")
      assert(!seen.contains(2L), s"phase-1 duplicate resurfaced: $seen")
    } finally q2.stop()
  }
}
