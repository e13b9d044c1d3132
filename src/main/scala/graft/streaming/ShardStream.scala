package graft.streaming

import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Kinesis-shaped DataSourceV2 micro-batch source over local shard
  * files — the engine's named ingestion path (the streaming-native form
  * of the reference's packet-receive callback,
  * `/root/reference/src/receiver/main.cpp:27-44`, which drains an
  * ordered per-link packet stream into the state loop).
  *
  * Stream layout: a directory of append-only record files, one per
  * shard (`<shardId>.shard`), each record one `\n`-terminated line.
  * Exactly the Kinesis data model, re-expressed over files:
  *
  *  - a RECORD is addressed by `(shardId, sequenceNumber)`; sequence
  *    numbers are dense per shard (0-based line ordinals) and strictly
  *    ordered WITHIN a shard — the Kinesis per-shard ordering
  *    guarantee. No cross-shard order is promised (Kinesis doesn't
  *    either); downstream consumers order by event time + seq
  *    ([[Engine.processGroup]] sorts inside the micro-batch).
  *  - an OFFSET is a per-shard high-water mark `{shard -> (seq, pos)}`:
  *    `seq` = records consumed, `pos` = the byte after the last
  *    consumed record's terminator. `pos` is carried so a restart (and
  *    every reader task) SEEKS instead of re-scanning — the analog of
  *    resuming from a stored Kinesis sequence number via
  *    `AFTER_SEQUENCE_NUMBER` iterators, and what keeps per-trigger
  *    driver work O(new bytes), never O(stream length).
  *  - only COMPLETE lines are admitted: a concurrently appended partial
  *    record is invisible until its `\n` lands (Kinesis record
  *    atomicity — a record is either fully in the stream or absent).
  *  - RESHARDING: new `.shard` files are discovered at every
  *    `latestOffset` and start from seq 0; a sealed (split/merged-away)
  *    parent simply stops growing, and its drained tail plus the
  *    children's fresh records flow in the same batches — no record is
  *    lost or duplicated because offsets are keyed by shard id, never
  *    positional. A `<shardId>.shard.closed` marker is the operator's
  *    seal annotation (advisory — correctness never depends on it).
  *  - ADMISSION CONTROL: `maxRecordsPerTrigger` caps records admitted
  *    per micro-batch via [[SupportsAdmissionControl]] (the
  *    `maxFetchRecordsPerShard`-style backpressure every production
  *    Kinesis reader has); the scanner stops AT the capped record
  *    boundary, so capped offsets still carry exact byte positions.
  *    The budget splits FAIRLY across shards (equal shares in rounds,
  *    rotated start) — per-shard caps are the Kinesis semantics, and a
  *    first-listed-wins drain would let one hot shard starve the rest.
  *  - `startingPosition` = `trim_horizon` (default: everything
  *    retained) | `latest` (only records after query start) — the two
  *    Kinesis starting positions.
  *
  * Scale posture: the driver tracks one `(seq, pos)` cursor per shard
  * and scans only bytes appended since the previous trigger; executors
  * read exactly their `[startPos, endPos)` slice. One input partition
  * per shard per batch — the shard IS the Kinesis unit of read
  * parallelism (one consumer lease per shard), so shard count scales
  * the read exactly as a resharded Kinesis stream would. State,
  * offsets, and replay all live in the standard Structured Streaming
  * checkpoint — restart recovery is the engine's, not the source's.
  */
object ShardStream {
  val ShortName = "shard-stream"
  val ShardSuffix = ".shard"

  val Schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** One shard's consumed high-water mark: `seq` records, ending at
    * byte `pos` (position AFTER the seq-th record's `\n`). */
  case class ShardPosition(seq: Long, pos: Long)

  case class ShardOffset(shards: Map[String, ShardPosition]) extends Offset {
    // deterministic key order so equal offsets serialize identically
    override def json(): String = {
      implicit val fmt: org.json4s.Formats =
        org.json4s.DefaultFormats
      org.json4s.jackson.Serialization.write(
        scala.collection.immutable.SortedMap.from(
          shards.view.mapValues(p => Map("seq" -> p.seq, "pos" -> p.pos))))
    }
  }

  object ShardOffset {
    def fromJson(json: String): ShardOffset = {
      implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
      ShardOffset(org.json4s.jackson.JsonMethods.parse(json)
        .extract[Map[String, Map[String, Long]]]
        .map { case (k, v) => k -> ShardPosition(v("seq"), v("pos")) })
    }
  }
}

/** `spark.readStream.format("shard-stream").load(dir)` (registered via
  * META-INF/services) or `.format(classOf[ShardStreamProvider].getName)`. */
class ShardStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = ShardStream.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardStream.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShardStreamTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "shard-stream requires a path: .load(<shard directory>)")))
}

class ShardStreamTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"shard-stream($dir)"
  override def schema(): StructType = ShardStream.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val starting = options.getOrDefault("startingPosition", "trim_horizon")
      .toLowerCase(java.util.Locale.ROOT)
    require(starting == "trim_horizon" || starting == "latest",
      s"startingPosition must be trim_horizon or latest, got $starting")
    val maxRows = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    maxRows.foreach(n => require(n > 0, "maxRecordsPerTrigger must be > 0"))
    new ScanBuilder {
      override def build(): Scan = new ShardStreamScan(dir, starting, maxRows)
    }
  }
}

class ShardStreamScan(dir: String, starting: String, maxRows: Option[Long])
    extends Scan {
  override def readSchema(): StructType = ShardStream.Schema
  override def description(): String = s"shard-stream($dir)"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ShardMicroBatchStream(dir, starting, maxRows)
}

class ShardMicroBatchStream(dir: String, starting: String, maxRows: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {
  import ShardStream._

  /** Driver-side scan cursor: the furthest complete-line boundary each
    * shard has been scanned to. Purely an efficiency device — offsets
    * own correctness — so a restart (fresh, empty cursor) just pays one
    * re-count up to the checkpointed offset and is consistent again. */
  private val cursor = mutable.Map.empty[String, ShardPosition]

  private def shardFiles(): Seq[(String, Path)] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(ShardSuffix))
        .map(p => p.getFileName.toString.stripSuffix(ShardSuffix) -> p)
        .toSeq.sortBy(_._1)
      finally s.close()
    }
  }

  /** Advance this shard's cursor over newly appended bytes, counting
    * complete lines, stopping at `seqCap`. O(new bytes), exact `pos`
    * at every stop point (including a mid-file admission-control cap). */
  private def scanShard(name: String, file: Path, seqCap: Long): ShardPosition = {
    val known = cursor.getOrElse(name, ShardPosition(0L, 0L))
    if (known.seq > seqCap)
      throw new IllegalStateException(
        s"shard $name: read limit decreased mid-run (cursor ${known.seq} > cap $seqCap)")
    val len = Files.size(file)
    if (len < known.pos)
      throw new IllegalStateException(
        s"shard $name truncated: length $len < consumed position ${known.pos} — " +
          "shard files are append-only")
    if (len == known.pos || known.seq == seqCap) return known
    var seq = known.seq
    var pos = known.pos
    var scanned = known.pos
    val ch = FileChannel.open(file, StandardOpenOption.READ)
    try {
      ch.position(known.pos)
      val buf = ByteBuffer.allocate(1 << 16)
      var eof = false
      while (!eof && scanned < len && seq < seqCap) {
        buf.clear()
        if (len - scanned < buf.capacity()) buf.limit((len - scanned).toInt)
        val n = ch.read(buf)
        if (n < 0) eof = true
        else {
          var i = 0
          while (i < n && seq < seqCap) {
            scanned += 1
            if (buf.get(i) == '\n') { seq += 1; pos = scanned }
            i += 1
          }
          // bytes past a cap hit inside this chunk stay unscanned; the
          // cursor below records only the capped boundary
          if (seq == seqCap) scanned = pos
        }
      }
    } finally ch.close()
    val at = ShardPosition(seq, pos)
    cursor(name) = at
    at
  }

  /** Rotates the capped scan's starting shard across triggers so that
    * when the budget is smaller than the hot-shard count, no shard is
    * permanently first in line. Driver-memory only: a restart resets it
    * to 0, which costs nothing but one batch of positional bias —
    * offsets own correctness, fairness is a liveness property. */
  private var scanRotation = 0

  private def scanAll(start: Map[String, ShardPosition], budget: Long): ShardOffset = {
    val listed = shardFiles()
    val pos = mutable.Map.empty[String, ShardPosition]
    listed.foreach { case (name, _) =>
      pos(name) = start.getOrElse(name, ShardPosition(0L, 0L))
    }
    if (budget == Long.MaxValue) {
      listed.foreach { case (name, file) =>
        pos(name) = scanShard(name, file, Long.MaxValue)
      }
    } else if (listed.nonEmpty) {
      // FAIR admission: Kinesis backpressure is per-shard
      // (maxFetchRecordsPerShard), never first-listed-wins — draining
      // shards in a fixed order would hand one hot early shard the
      // whole budget every trigger and leave later shards unboundedly
      // stale. The budget instead splits across shards in rounds:
      // every shard gets an equal share (>= 1), a shard that drains
      // below its share drops out and returns the remainder to the
      // next round, and the round order rotates per trigger so a
      // budget below the shard count still reaches everyone
      // eventually. Terminates: each round either spends budget on
      // every surviving shard or shrinks the shard set.
      val r = math.floorMod(scanRotation, listed.size)
      scanRotation += 1 // Int wrap after ~2^31 triggers: floorMod keeps r valid
      var pending = listed.drop(r) ++ listed.take(r)
      var left = budget
      while (left > 0 && pending.nonEmpty) {
        val share = math.max(1L, left / pending.size)
        pending = pending.filter { case (name, file) =>
          if (left <= 0) false
          else {
            val from = pos(name)
            val take = math.min(share, left)
            val end = scanShard(name, file, from.seq + take)
            left -= end.seq - from.seq
            pos(name) = end
            end.seq == from.seq + take // hit its cap → may hold more
          }
        }
      }
    }
    // a shard present in the start offset but gone from the directory
    // (retention expiry analog): carry its mark forward unchanged so
    // offsets stay monotone and nothing is re-planned
    val names = listed.map(_._1).toSet
    val out = Map.newBuilder[String, ShardPosition]
    out ++= pos
    start.foreach { case (k, v) => if (!names.contains(k)) out += k -> v }
    ShardOffset(out.result())
  }

  override def initialOffset(): Offset =
    if (starting == "latest") scanAll(Map.empty, Long.MaxValue)
    else ShardOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit =
    maxRows.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val budget = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => Long.MaxValue
    }
    scanAll(start.asInstanceOf[ShardOffset].shards, budget)
  }

  override def deserializeOffset(json: String): Offset = ShardOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffset].shards
    end.asInstanceOf[ShardOffset].shards.toSeq.sortBy(_._1).flatMap {
      case (name, e) =>
        val b = s.getOrElse(name, ShardPosition(0L, 0L))
        if (e.seq > b.seq)
          Some(ShardSlice(Paths.get(dir).resolve(name + ShardSuffix).toString,
            name, b.seq, b.pos, e.seq, e.pos): InputPartition)
        else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ShardSliceReaderFactory

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** One shard's record range for one micro-batch: bytes
  * `[startPos, endPos)` of `path`, records `startSeq until endSeq`. */
case class ShardSlice(path: String, shard: String, startSeq: Long,
    startPos: Long, endSeq: Long, endPos: Long) extends InputPartition

object ShardSliceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShardSliceReader(partition.asInstanceOf[ShardSlice])
}

/** Executor-side slice reader: seek to `startPos`, frame `\n`-terminated
  * records, stop exactly at `endPos`. The slice was planned at complete
  * record boundaries, so running out of bytes mid-record means the file
  * was mutated non-append — fail loudly rather than emit a torn record. */
class ShardSliceReader(slice: ShardSlice) extends PartitionReader[InternalRow] {
  private val ch = FileChannel.open(Paths.get(slice.path), StandardOpenOption.READ)
  ch.position(slice.startPos)
  private val in = new java.io.BufferedInputStream(
    java.nio.channels.Channels.newInputStream(ch), 1 << 16)
  private var bytesLeft = slice.endPos - slice.startPos
  private var seq = slice.startSeq
  private var row: InternalRow = _
  private val shardUtf8 = UTF8String.fromString(slice.shard)

  override def next(): Boolean = {
    if (bytesLeft <= 0) return false
    val line = new java.io.ByteArrayOutputStream(128)
    var done = false
    while (!done && bytesLeft > 0) {
      val b = in.read()
      if (b < 0)
        throw new IllegalStateException(
          s"shard ${slice.shard}: EOF inside planned slice — file shrank after planning")
      bytesLeft -= 1
      if (b == '\n') done = true else line.write(b)
    }
    if (!done)
      throw new IllegalStateException(
        s"shard ${slice.shard}: slice did not end on a record boundary")
    val bytes = line.toByteArray
    // tolerate CRLF producers: the framing newline is \n, a trailing \r
    // is stripped from the record body
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    row = InternalRow(shardUtf8, seq, UTF8String.fromBytes(bytes, 0, n))
    seq += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit = in.close()
}
