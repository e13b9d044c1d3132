package graft.streaming

import java.nio.file.{Files, Path, StandardOpenOption}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

object ShardStreamSpec {
  /** Driver-side telemetry capture for the E2E test (foreachBatch
    * callbacks run on the driver; companion-object queue survives
    * closure serialization — EngineSpec idiom). */
  val docs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val restartRows =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
}

/** The Kinesis-analog DataSourceV2 source: exactly-once delivery across
  * triggers, record atomicity, admission control, resharding, restart
  * recovery from the checkpoint, and the full ingestion E2E. */
class ShardStreamSpec extends SparkSpec {
  import spark.implicits._

  private def newStreamDir(): Path =
    Files.createTempDirectory("graft-shardstream")

  private def append(dir: Path, shard: String, lines: String*): Unit =
    Files.write(dir.resolve(s"$shard.shard"),
      lines.map(_ + "\n").mkString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** Raw bytes append — for the partial-record test. */
  private def appendRaw(dir: Path, shard: String, text: String): Unit =
    Files.write(dir.resolve(s"$shard.shard"), text.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  private def readStream(dir: Path, options: (String, String)*) = {
    val r = spark.readStream.format(ShardStream.ShortName)
    options.foreach { case (k, v) => r.option(k, v) }
    r.load(dir.toString)
  }

  test("records are delivered exactly once across triggers and new shards are discovered") {
    val dir = newStreamDir()
    append(dir, "shard-0", "r0", "r1", "r2")
    val q = readStream(dir).writeStream.format("memory")
      .queryName("shard_basic").outputMode("append").start()
    def got = spark.table("shard_basic").as[(String, Long, String)]
      .collect().sorted.toSeq
    try {
      q.processAllAvailable()
      assert(got == Seq(("shard-0", 0L, "r0"), ("shard-0", 1L, "r1"),
        ("shard-0", 2L, "r2")))
      // appends to an existing shard and a newly created shard arrive
      // in later batches, already-consumed records never re-deliver
      append(dir, "shard-0", "r3")
      append(dir, "shard-1", "s0")
      q.processAllAvailable()
      assert(got == Seq(("shard-0", 0L, "r0"), ("shard-0", 1L, "r1"),
        ("shard-0", 2L, "r2"), ("shard-0", 3L, "r3"), ("shard-1", 0L, "s0")))
    } finally q.stop()
  }

  test("a partially appended record is invisible until its newline lands") {
    val dir = newStreamDir()
    append(dir, "shard-0", "complete")
    appendRaw(dir, "shard-0", """{"half": """) // no terminator yet
    val q = readStream(dir).writeStream.format("memory")
      .queryName("shard_partial").outputMode("append").start()
    def values = spark.table("shard_partial").select("value")
      .as[String].collect().sorted.toSeq
    try {
      q.processAllAvailable()
      assert(values == Seq("complete"), "torn record must not be admitted")
      appendRaw(dir, "shard-0", "1}\n") // record completes
      q.processAllAvailable()
      assert(values == Seq("complete", """{"half": 1}"""),
        "completed record arrives exactly once, intact")
    } finally q.stop()
  }

  test("maxRecordsPerTrigger caps each micro-batch without loss or duplication") {
    val dir = newStreamDir()
    append(dir, "shard-0", (0 until 7).map(i => s"a$i"): _*)
    append(dir, "shard-1", (0 until 5).map(i => s"b$i"): _*)
    val q = readStream(dir, "maxRecordsPerTrigger" -> "3")
      .writeStream.format("memory")
      .queryName("shard_capped").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("shard_capped").as[(String, Long, String)].collect()
      assert(rows.length == 12, s"all 12 records must land, got ${rows.length}")
      assert(rows.distinct.length == 12, "no duplicates under admission control")
      // the cap was honoured: draining 12 records needed >= 4 batches
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.forall(_.numInputRows <= 3),
        s"a batch exceeded the cap: ${batches.map(_.numInputRows).toSeq}")
      assert(batches.length >= 4)
    } finally q.stop()
  }

  test("admission control is fair: a hot early shard cannot starve late-sorted shards") {
    // shard-a always has more pending than the whole per-trigger budget
    // — a first-listed-wins drain would hand it every batch and shard-z
    // would never advance (unbounded staleness). Fair split: shard-z's
    // records must land within the first few batches.
    val dir = newStreamDir()
    append(dir, "shard-a", (0 until 40).map(i => s"hot$i"): _*)
    append(dir, "shard-z", "cold0", "cold1")
    val q = readStream(dir, "maxRecordsPerTrigger" -> "3")
      .writeStream.format("memory")
      .queryName("shard_fair").outputMode("append").start()
    try {
      // drive exactly 3 triggers' worth: 9 records admitted
      val deadline = System.currentTimeMillis() + 60000
      def admitted = spark.table("shard_fair").count()
      while (admitted < 9 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val snap = spark.table("shard_fair").as[(String, Long, String)].collect()
      assert(snap.count(_._1 == "shard-z") >= 1,
        s"shard-z starved across ${snap.length} admitted records: ${snap.toSeq}")
      // and the cap still drains everything exactly once
      q.processAllAvailable()
      val all = spark.table("shard_fair").as[(String, Long, String)].collect()
      assert(all.length == 42 && all.distinct.length == 42,
        s"fairness must not break exactly-once: ${all.length}")
      val byShard = all.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
      assert(byShard("shard-z") == Seq("cold0", "cold1"))
      assert(byShard("shard-a") == (0 until 40).map(i => s"hot$i"))
    } finally q.stop()
  }

  test("admission fairness below shard count: rotation reaches every shard across triggers") {
    // budget 1 < 3 shards: within any single trigger only one shard can
    // advance, so fairness rests entirely on the rotated scan start —
    // without it, the lexicographically first hot shard wins every
    // trigger and the other two never move.
    val dir = newStreamDir()
    append(dir, "shard-a", (0 until 30).map(i => s"a$i"): _*)
    append(dir, "shard-m", "m0", "m1")
    append(dir, "shard-z", "z0", "z1")
    val q = readStream(dir, "maxRecordsPerTrigger" -> "1")
      .writeStream.format("memory")
      .queryName("shard_rotate").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def shardsSeen = spark.table("shard_rotate").as[(String, Long, String)]
        .collect().map(_._1).toSet
      while (shardsSeen.size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(shardsSeen == Set("shard-a", "shard-m", "shard-z"),
        s"rotation must reach every shard, saw only $shardsSeen")
      q.processAllAvailable()
      val all = spark.table("shard_rotate").as[(String, Long, String)].collect()
      assert(all.length == 34 && all.distinct.length == 34)
    } finally q.stop()
  }

  test("resharding: a split shard's tail and its children deliver with no loss or duplication") {
    val dir = newStreamDir()
    append(dir, "shard-0", (0 until 5).map(i => s"p$i"): _*)
    val q = readStream(dir).writeStream.format("memory")
      .queryName("shard_split").outputMode("append").start()
    def values = spark.table("shard_split").select("value")
      .as[String].collect().toSeq
    try {
      q.processAllAvailable()
      assert(values.sorted == (0 until 5).map(i => s"p$i"))
      // SPLIT shard-0 → {shard-0a, shard-0b}: the parent takes two more
      // records (its unread tail at split time), is sealed, and all
      // subsequent records land in the children — the Kinesis split
      // contract. Offsets are keyed by shard id, so the parent's tail
      // and the children's fresh records coexist in the next batches.
      append(dir, "shard-0", "p5", "p6")
      Files.write(dir.resolve("shard-0.shard.closed"), Array.emptyByteArray)
      append(dir, "shard-0a", "c0", "c1")
      append(dir, "shard-0b", "d0", "d1", "d2")
      q.processAllAvailable()
      val all = spark.table("shard_split").as[(String, Long, String)].collect()
      assert(all.length == 12 && all.distinct.length == 12,
        s"split must lose/duplicate nothing: $all")
      assert(values.sorted ==
        ((0 until 7).map(i => s"p$i") ++ Seq("c0", "c1", "d0", "d1", "d2")).sorted)
      // per-shard order survived: seqs are dense and values arrive in
      // append order within every shard lineage member
      val byShard = all.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq)
      assert(byShard("shard-0") == (0 until 7).map(i => s"p$i"))
      assert(byShard("shard-0a") == Seq("c0", "c1"))
      assert(byShard("shard-0b") == Seq("d0", "d1", "d2"))
    } finally q.stop()
  }

  test("restart recovery: a fresh source instance resumes from the checkpointed offset") {
    // memory sink can't recover a checkpoint — record via foreachBatch
    // (the production sink shape), companion queue for closure survival
    val dir = newStreamDir()
    val ckpt = Files.createTempDirectory("graft-shardstream-ckpt").toString
    append(dir, "shard-0", "one", "two", "three")
    def start() = readStream(dir).writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => ShardStreamSpec.restartRows.add(
          (r.getString(0), r.getLong(1), r.getString(2))))
      }.start()
    ShardStreamSpec.restartRows.clear()
    val first = start()
    try {
      first.processAllAvailable()
      assert(ShardStreamSpec.restartRows.size == 3)
    } finally first.stop()
    ShardStreamSpec.restartRows.clear()
    // records appended while the query is DOWN...
    append(dir, "shard-0", "four")
    append(dir, "shard-1", "five")
    // ...are exactly the ones a restarted query delivers: the new
    // instance's scan cursor is empty, but the checkpointed per-shard
    // offsets own correctness (ShardStream scaladoc)
    val second = start()
    try {
      second.processAllAvailable()
      val resumed = ShardStreamSpec.restartRows.asScala.toSeq.sorted
      assert(resumed == Seq(("shard-0", 3L, "four"), ("shard-1", 0L, "five")),
        s"restart must deliver only unconsumed records, got $resumed")
    } finally second.stop()
  }

  test("startingPosition=latest skips records that precede query start") {
    val dir = newStreamDir()
    append(dir, "shard-0", "old0", "old1")
    val q = readStream(dir, "startingPosition" -> "latest")
      .writeStream.format("memory")
      .queryName("shard_latest").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("shard_latest").isEmpty)
      append(dir, "shard-0", "new0")
      q.processAllAvailable()
      assert(spark.table("shard_latest").select("value").as[String]
        .collect().toSeq == Seq("new0"))
    } finally q.stop()
  }

  test("training-data ingest E2E: shards -> quality gate -> PII scrub -> streaming dedup") {
    // The LLM-pipeline composition over the connector: documents arrive
    // on shards, flow through the curation gate and PII scrub, and the
    // exact-dedup state drops in-horizon recopies — one declarative
    // streaming plan, no glue code. Asserts each stage did its job on
    // one pass through real shard files.
    val dir = newStreamDir()
    val longDoc = Seq.tabulate(40)(i => s"tok$i").mkString(" ")
    val piiDoc = "mail me at someone@mail.example " +
      Seq.tabulate(30)(i => s"w$i").mkString(" ")
    val q = Sources.linesFromShards(spark, dir.toString)
      .transform { lines =>
        val parts = split(col("value"), "\\|")
        val docs = lines.select(
          parts.getItem(0).cast("long").as("doc_id"),
          parts.getItem(1).as("text"),
          parts.getItem(2).cast("long").cast("timestamp").as("ts"))
        val gated = Curation.piiScrub(
          Curation.withQualityVerdict(docs, "text"), "text")
          .filter(col("verdict") === "keep")
        Dedup.dedupExact(gated, "text", "ts", "1 hour")
      }
      .select("doc_id", "text", "n_pii")
      .writeStream.format("memory").queryName("ingest_e2e")
      .outputMode("append").start()
    try {
      append(dir, "shard-0",
        s"1|$longDoc|1",
        s"2|short doc|2",          // quality gate: too_short
        s"3|$longDoc|3",           // exact recopy of 1: dedup drops
        s"4|$piiDoc|4")            // keep, but scrubbed
      q.processAllAvailable()
      val rows = spark.table("ingest_e2e")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      assert(rows.map(_._1).toSet == Set(1L, 4L),
        s"gate+dedup must leave exactly docs 1 and 4: ${rows.toSeq}")
      val scrubbed = rows.find(_._1 == 4L).get
      assert(scrubbed._3 == 1 && scrubbed._2.contains("<EMAIL>"),
        s"PII must be scrubbed in-flight: $scrubbed")
    } finally q.stop()
  }

  test("ingestion E2E: shard record -> commands -> keyed engine state -> telemetry envelope") {
    // The connector-backed form of the file-directory E2E: a command
    // record lands in a shard (the reference's packet receive callback,
    // src/receiver/main.cpp:27-44), flows through the JSON command
    // parser and the keyed TTL engine, and emits the exact
    // targets_update wire document.
    val dir = newStreamDir()
    val ckpt = Files.createTempDirectory("graft-shardstream-e2e").toString
    val registry = Seq((1, "Drone_2", "AA:BB:CC:00:00:02", true, 5000L))
      .toDF("id", "name", "mac", "connection_state", "last_successful_send")
    ShardStreamSpec.docs.clear()
    val lines = Sources.linesFromShards(spark, dir.toString)
    val cmds = Sources.commandsFromJsonLines(lines, nowMs = lit(1000L)).commands
    val query = Sinks.telemetryWriter(Engine.effectiveStates(cmds), ckpt,
      registry, doc => ShardStreamSpec.docs.add(doc)).start()
    try {
      append(dir, "shard-0",
        """{"command": "override_channels", "target_id": 1, "channels": [1800], "duration": 5000}""")
      val deadline = System.currentTimeMillis() + 60000
      while (ShardStreamSpec.docs.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(!ShardStreamSpec.docs.isEmpty,
        "timed out waiting for a telemetry document")
      assert(ShardStreamSpec.docs.peek() ==
        """{"type":"targets_update","targets":[{"id":1,"name":"Drone_2",""" +
        """"mac":"AA:BB:CC:00:00:02","channels":[1800,0,0,0,0,0,0,0],""" +
        """"connection_state":true,"last_successful_send":5000,""" +
        """"is_channels_overridden":true,"override_timeout_remaining":5000}]}""")
    } finally query.stop()
  }
}
