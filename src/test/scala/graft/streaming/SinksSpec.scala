package graft.streaming

import graft.SparkSpec
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** S4/S6 sink semantics: exact wire layout and the delivery path shared
  * by the streaming writers. */
object SinksSpec {
  // recorders live in a companion object so executor-side closures in
  // local mode append to the same JVM-wide queues
  val radio = new ConcurrentLinkedQueue[(String, Seq[Byte])]()
  val sbus = new ConcurrentLinkedQueue[(Int, Seq[Int])]()
  val serial = new ConcurrentLinkedQueue[String]()
  val store = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("packFrame: 8 x uint16 little-endian, 16 bytes, short frames zero-padded") {
    val b = Sinks.packFrame(Seq(1500, 1000, 2000))
    assert(b.length == 16)
    // 1500 = 0x05DC -> DC 05 little-endian
    assert((b(0) & 0xFF, b(1) & 0xFF) == (0xDC, 0x05))
    assert((b(2) & 0xFF, b(3) & 0xFF) == (0xE8, 0x03)) // 1000
    assert((b(4) & 0xFF, b(5) & 0xFF) == (0xD0, 0x07)) // 2000
    assert(b.drop(6).forall(_ == 0))
  }

  private def snapshotBatch = Seq(
    EngineOutput(1, "snapshot", 1, 1000L, Seq.fill(8)(1500), Seq.fill(8)(1500),
      Seq.fill(8)(-1), isOverridden = false, 0L, 0L, "", ""),
    EngineOutput(2, "snapshot", 2, 1000L, Seq.fill(8)(2000), Seq.fill(8)(2000),
      Seq.fill(8)(-1), isOverridden = false, 0L, 0L, "", ""),
    EngineOutput(1, "response", 3, 1000L, Nil, Nil, Nil, isOverridden = false,
      0L, 0L, "success", "ok"),
  ).toDF()

  test("fan-out delivers one packed frame per target MAC, responses excluded") {
    SinksSpec.radio.clear()
    Sinks.deliverFanOut(snapshotBatch, id => s"MAC_$id",
      (mac, bytes) => SinksSpec.radio.add((mac, bytes.toSeq)))
    val got = SinksSpec.radio.asScala.toMap
    assert(got.keySet == Set("MAC_1", "MAC_2"))
    assert(got("MAC_1") == Sinks.packFrame(Seq.fill(8)(1500)).toSeq)
    assert(got("MAC_2") == Sinks.packFrame(Seq.fill(8)(2000)).toSeq)
  }

  test("SBUS delivery rescales 1000-2000 to 172-1811 exactly") {
    SinksSpec.sbus.clear()
    Sinks.deliverSbus(snapshotBatch, (id, f) => SinksSpec.sbus.add((id, f)))
    val got = SinksSpec.sbus.asScala.toMap
    assert(got(1) == Seq.fill(8)(991)) // map(1500) = 991
    assert(got(2) == Seq.fill(8)(1811))
  }

  test("hold re-emissions (kind timeout) reach the wire, not just snapshots") {
    // the reference's sample-and-hold output IS the timeout re-emission:
    // a quiet stream must still drive the radio/SBUS at the hold rate
    val holdBatch = Seq(
      EngineOutput(4, "timeout", -1, 2000L, Seq.fill(8)(1600), Seq.fill(8)(1600),
        Seq.fill(8)(-1), isOverridden = false, 0L, 0L, "", "")).toDF()
    SinksSpec.radio.clear(); SinksSpec.sbus.clear()
    Sinks.deliverFanOut(holdBatch, id => s"MAC_$id",
      (mac, bytes) => SinksSpec.radio.add((mac, bytes.toSeq)))
    Sinks.deliverSbus(holdBatch, (id, f) => SinksSpec.sbus.add((id, f)))
    assert(SinksSpec.radio.asScala.toMap.apply("MAC_4") ==
      Sinks.packFrame(Seq.fill(8)(1600)).toSeq)
    assert(SinksSpec.sbus.asScala.toMap.apply(4) == Seq.fill(8)(1155)) // map(1600)
  }

  test("hold mode composes with the fan-out writer: quiet stream keeps the radio fed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    SinksSpec.radio.clear()
    val input = MemoryStream[EngineEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hold-fanout").toString
    val query = Sinks.fanOutWriter(
      Engine.effectiveStates(input.toDS(), holdEmitMs = Some(200L)), ckpt,
      id => s"MAC_$id", (mac, bytes) => SinksSpec.radio.add((mac, bytes.toSeq)))
      .start()
    try {
      input.addData(EngineEvent(5, "frame", 1, 1000L, Seq.fill(8)(1700), 0L))
      // one input frame, then silence: the hold timer must keep the
      // radio fed — expect >= 3 deliveries (1 snapshot + >= 2 holds)
      val deadline = System.currentTimeMillis() + 60000
      while (SinksSpec.radio.size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val got = SinksSpec.radio.asScala.toSeq
      assert(got.size >= 3, "quiet stream stopped feeding the radio")
      assert(got.forall { case (mac, bytes) =>
        mac == "MAC_5" && bytes == Sinks.packFrame(Seq.fill(8)(1700)).toSeq })
    } finally query.stop()
  }

  test("deliverOnce: a replayed batchId is skipped, new ids deliver") {
    val dir = java.nio.file.Files.createTempDirectory("graft-once").toString
    var sends = 0
    assert(Sinks.deliverOnce(dir, 7L) { sends += 1 })
    assert(!Sinks.deliverOnce(dir, 7L) { sends += 1 }, "replay must be skipped")
    assert(Sinks.deliverOnce(dir, 8L) { sends += 1 })
    assert(sends == 2)
  }

  test("deliverOnce: markers older than the retention horizon are pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-once-prune").toString
    (0L to 20L).foreach(id => Sinks.deliverOnce(dir, id) {})
    def markers = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".done")).toSeq.sorted
      finally s.close()
    }
    // only the last MarkerRetention+1 ids remain; the newest survives
    assert(markers.size == Sinks.MarkerRetention + 1, markers.mkString(","))
    assert(markers.contains("batch-20.done") && !markers.contains("batch-0.done"))
    // the retained horizon still dedups
    assert(!Sinks.deliverOnce(dir, 20L) { fail("must skip") })
  }

  test("deliverOnce: a failed delivery leaves no marker, so the retry runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-once-fail").toString
    var sends = 0
    intercept[RuntimeException] {
      Sinks.deliverOnce(dir, 1L) { throw new RuntimeException("radio down") }
    }
    assert(Sinks.deliverOnce(dir, 1L) { sends += 1 }, "retry after failure must deliver")
    assert(sends == 1)
  }

  test("telemetry writer emits one exact targets_update document per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    SinksSpec.serial.clear()
    val registry = Seq((6, "Drone_7", "AA:BB:CC:00:00:07", true, 5000L))
      .toDF("id", "name", "mac", "connection_state", "last_successful_send")
    val input = MemoryStream[EngineEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-telemetry").toString
    val query = Sinks.telemetryWriter(
      Engine.effectiveStates(input.toDS()), ckpt, registry,
      doc => SinksSpec.serial.add(doc))
      .start()
    try {
      input.addData(EngineEvent(6, "frame", 1, 1000L, Seq.fill(8)(1500), 0L))
      val deadline = System.currentTimeMillis() + 60000
      while (SinksSpec.serial.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val doc = SinksSpec.serial.asScala.head
      assert(doc ==
        """{"type":"targets_update","targets":[{"id":6,"name":"Drone_7",""" +
        """"mac":"AA:BB:CC:00:00:07","channels":[1500,1500,1500,1500,1500,1500,1500,1500],""" +
        """"connection_state":true,"last_successful_send":5000,""" +
        """"is_channels_overridden":false,"override_timeout_remaining":0}]}""")
    } finally query.stop()
  }

  test("update-mode upsert sink: the store converges to the latest counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    SinksSpec.store.clear()
    val input = MemoryStream[EngineEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val query = Sinks.upsertCountsWriter(input.toDS(), ckpt,
      (id, n) => SinksSpec.store.put(id, n)).start()
    def await(id: Int, n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (SinksSpec.store.getOrDefault(id, -1L) != n &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(SinksSpec.store.get(id) == n, s"store($id) = ${SinksSpec.store.get(id)}, want $n")
    }
    try {
      input.addData(
        EngineEvent(1, "frame", 1, 1000L, Seq.fill(8)(1500), 0L),
        EngineEvent(1, "frame", 2, 1100L, Seq.fill(8)(1500), 0L),
        EngineEvent(2, "frame", 3, 1200L, Seq.fill(8)(1500), 0L))
      query.processAllAvailable()
      await(1, 2L); await(2, 1L)
      // a later batch updates ONLY target 1 — target 2 must keep its count
      input.addData(EngineEvent(1, "frame", 4, 2000L, Seq.fill(8)(1500), 0L))
      query.processAllAvailable()
      await(1, 3L); await(2, 1L)
    } finally query.stop()
  }

  test("fan-out writer: engine-to-radio end-to-end over a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    SinksSpec.radio.clear()
    val input = MemoryStream[EngineEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    val query = Sinks.fanOutWriter(
      Engine.effectiveStates(input.toDS()), ckpt,
      id => s"MAC_$id", (mac, bytes) => SinksSpec.radio.add((mac, bytes.toSeq)))
      .start()
    try {
      input.addData(EngineEvent(3, "frame", 1, 1000L, Seq.fill(8)(1700), 0L))
      val deadline = System.currentTimeMillis() + 60000
      while (SinksSpec.radio.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val got = SinksSpec.radio.asScala.toMap
      assert(got.contains("MAC_3"))
      assert(got("MAC_3") == Sinks.packFrame(Seq.fill(8)(1700)).toSeq)
    } finally query.stop()
  }
}
