package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object ExportSpec {
  /** foreachBatch recorder for the restart test (companion-object
    * queue so the closure survives serialization — DedupSpec idiom). */
  val manifestSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long)]()

  /** foreachBatch recorder for the verified-path E2E: (doc_id, shard,
    * n_toks) per kept document. */
  val verifiedShardSink =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, Long)]()
}

/** Streaming shard router: ingest-time routing parity with the batch
  * export and the order-independent running manifest. */
class ExportSpec extends SparkSpec {

  /** A shard's part files in REPLAY order — from the `_waves` sidecar
    * (ADVICE r18: append order is recorded at rest; mtime is ambiguous
    * for sub-second appends, so these tests no longer sleep between
    * waves to make it observable). */
  private def filesInReplayOrder(path: String,
      shard: Int): Seq[java.io.File] = {
    val order = graft.operators.Layout.readWaves(spark, path)
      .map(_._2).zipWithIndex.toMap
    new java.io.File(s"$path/shard=$shard").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(f => order(f.getName)).toSeq
  }

  test("streaming shard router: running manifest converges to the batch export's membership") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val P = 2147483647L
    val docRows = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // local truth, independently derived (MessageDigest, BigInt fold)
    val want = docRows.map { case (id, text) =>
      val sk = h60("shard:" + id)
      ((sk % 8).toInt, text.split(" ", -1).length.toLong, sk % P)
    }.groupBy(_._1).map { case (s, ds) =>
      s -> ((ds.length.toLong, ds.map(_._2).sum,
        (ds.map(d => BigInt(d._3)).sum % P).toLong))
    }
    val in = MemoryStream[(Long, String)]
    val query = Export.runningShardManifest(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("shard_mem")
      .outputMode("update").start()
    try {
      // two installments: the commutative digest must converge to the
      // batch value regardless of arrival grouping
      val (a, b) = docRows.splitAt(docRows.length / 2)
      in.addData(a.toSeq); query.processAllAvailable()
      in.addData(b.toSeq); query.processAllAvailable()
      val got = spark.table("shard_mem").collect()
        .groupBy(_.getInt(0)).map { case (s, rows) =>
          val r = rows.maxBy(_.getLong(1)) // n_docs grows monotonically
          s -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
        }
      assert(got == want, s"stream $got vs local $want")
      // routing parity with the batch export: per-shard doc and token
      // totals equal q122's manifest columns on the same corpus
      val batch = graft.operators.Pipeline.q122ShardManifest(spark, sfDir)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got.view.mapValues(v => (v._1, v._2)).toMap == batch)
      // exactly one stateful operator, numShards rows of state
      val ops = query.lastProgress.stateOperators
      assert(ops.length == 1 && ops.head.numRowsTotal == want.size)
    } finally query.stop()
  }

  test("ingest-to-shards: page stream in, shard-routed training docs out, one stateful op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val good = Seq.tabulate(30)(i => s"tok$i").mkString(" ")
    val other = Seq.tabulate(30)(i => s"word$i").mkString(" ")
    val zzText = Seq.tabulate(30)(i => s"zz$i").mkString(" ")
    val in = MemoryStream[(Long, String, String, Long)]
    val pages = in.toDF().toDF("doc_id", "lang", "html", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    // lang zz is mixed out entirely; en is absent from the map → kept
    val out = Curation.ingestToShards(pages, "html", "ts", "10 minutes",
      mixRates = Some(Map("zz" -> 0L)))
    val query = out.writeStream.format("memory").queryName("i2s_mem")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "en", s"<p>$good</p>", 1L),            // survives
        (2L, "en", s"<p>${good.toUpperCase}</p>", 2L), // dedup-dropped
        (3L, "en", "<p>tiny text</p>", 3L),         // quality-dropped
        (5L, "zz", s"<p>$zzText</p>", 4L),          // mix-dropped
        (6L, "en", s"<p>$other</p>", 5L))           // survives
      query.processAllAvailable()
      val got = spark.table("i2s_mem").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(got.keySet == Set(1L, 6L), s"got ${got.keySet}")
      got.foreach { case (id, r) =>
        val sk = h60("shard:" + id)
        assert(r.getAs[Long]("sk") == sk && r.getAs[Int]("shard") == (sk % 8).toInt)
        assert(r.getAs[Long]("n_toks") == 30L)
      }
      assert(got(1L).getAs[String]("text") == good)
      // mix and route added ZERO state: still only the dedup digests
      assert(query.lastProgress.stateOperators.length == 1)
    } finally query.stop()
  }

  test("ingest-to-shards with the near-dup stage: edited re-crawl never reaches a shard, two state ops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    // the DedupSpec fixture: the pos-12 'edit0' variant collapses onto
    // base's 16-bit canonical signature (fixture-sanity asserted there)
    val base = Seq.tabulate(30)(i => s"tok$i").mkString(" ")
    val edited = Seq.tabulate(30)(i => if (i == 12) "edit0" else s"tok$i")
      .mkString(" ")
    val distinct = Seq.tabulate(30)(i => s"zzz$i").mkString(" ")
    val in = MemoryStream[(Long, String, String, Long)]
    val pages = in.toDF().toDF("doc_id", "lang", "html", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    val out = Curation.ingestToShards(pages, "html", "ts", "10 minutes",
      nearDup = true)
    val query = out.writeStream.format("memory").queryName("i2s_near_mem")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "en", s"<p>$base</p>", 1L),     // survives, shard-routed
        (2L, "en", s"<p>$edited</p>", 2L),   // near stage drops it
        (3L, "en", s"<p>$distinct</p>", 3L)) // survives
      query.processAllAvailable()
      val got = spark.table("i2s_near_mem").collect()
        .map(r => r.getAs[Long]("doc_id")).toSet
      assert(got == Set(1L, 3L), s"got $got")
      // the whole page→shard chain holds exactly one state op per
      // enabled dedup stage — the documented bound, end to end
      assert(query.lastProgress.stateOperators.length == 2)
    } finally query.stop()
  }

  test("running manifest survives a RocksDB restart: recovered counts converge to the full-corpus truth") {
    import scala.jdk.CollectionConverters._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val P = 2147483647L
    val root = java.nio.file.Files.createTempDirectory("graft-manifest-restart")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = root.resolve("ckpt").toString
    def addFile(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(inDir.resolve(name),
        (rows.map { case (id, t) => s"$id|$t" }.mkString("\n") + "\n").getBytes("UTF-8"))
    def startQuery() = StateStores.withRocksDB(spark) {
      val parts = split(col("value"), "\\|")
      val docs = spark.readStream.text(inDir.toString)
        .select(parts.getItem(0).cast("long").as("doc_id"),
          parts.getItem(1).as("text"))
      Export.runningShardManifest(docs, "doc_id", "text")
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => ExportSpec.manifestSink.add(
            (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))))
        }
        .start()
    }
    def await(cond: => Boolean, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    ExportSpec.manifestSink.clear()
    val a = Seq(1L -> "a b c", 2L -> "d e", 9L -> "x y z w")
    val b = Seq(3L -> "p q", 17L -> "r s t")
    val q1 = startQuery()
    try {
      addFile("f1.txt", a)
      await(ExportSpec.manifestSink.asScala.map(_._2).sum >= a.length,
        "phase-1 rows")
    } finally q1.stop()
    val q2 = startQuery()
    try {
      addFile("f2.txt", b)
      // converged = every doc counted exactly once across both phases
      await({
        val last = ExportSpec.manifestSink.asScala.toSeq
          .groupBy(_._1).view.mapValues(_.last).toMap
        last.values.map(_._2).sum == (a ++ b).length
      }, "phase-2 convergence")
      val last = ExportSpec.manifestSink.asScala.toSeq
        .groupBy(_._1).view.mapValues(_.last).toMap
      // truth over the FULL corpus — phase-1 counts must have been
      // RECOVERED from the checkpoint, not restarted from zero
      val want = (a ++ b).map { case (id, t) =>
        val sk = h60("shard:" + id)
        ((sk % 8).toInt, t.split(" ", -1).length.toLong, sk % P)
      }.groupBy(_._1).map { case (s, ds) =>
        s -> ((ds.length.toLong, ds.map(_._2).sum,
          (ds.map(d => BigInt(d._3)).sum % P).toLong))
      }
      assert(last.view.mapValues(v => (v._2, v._3, v._4)).toMap == want,
        s"recovered manifest ${last} vs truth $want")
    } finally {
      q2.stop()
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("shards at rest: read-back order recomputes q122's manifest checksum bit-for-bit") {
    val P = 2147483647L
    val out = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      graft.operators.Layout.writeShards(
        graft.Tables.documents(spark, sfDir).select("doc_id", "text"),
        "doc_id", out)
      val manifest = graft.operators.Pipeline.q122ShardManifest(spark, sfDir)
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
      manifest.foreach { case (shard, (nDocs, checksum, headId)) =>
        val dir = new java.io.File(s"$out/shard=$shard")
        val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $shard: ${files.length} files")
        // one file = one split: parquet read preserves row order
        val rows = spark.read.parquet(files.head.getAbsolutePath)
          .select("doc_id", "sk").collect()
        assert(rows.length == nDocs)
        assert(rows.head.getLong(0) == headId, s"shard $shard head")
        // positions from FILE ORDER, the manifest's checksum formula
        val ck = rows.zipWithIndex.map { case (r, i) =>
          BigInt(i + 1) * (r.getLong(1) % P) % P }.sum % P
        assert(ck.toLong == checksum, s"shard $shard checksum from file order")
        // the at-rest order is exactly the (sk, id) sort
        assert(rows.map(r => (r.getLong(1), r.getLong(0))).toSeq ==
          rows.map(r => (r.getLong(1), r.getLong(0))).sortBy(identity).toSeq)
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("curriculum shards at rest: file order is tier-ascending and recomputes q137's checksum") {
    import org.apache.spark.sql.functions.{col, expr, least, lit, size, split}
    val P = 2147483647L
    val out = java.nio.file.Files.createTempDirectory("graft_curr_").toString
    try {
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        .withColumn("tier", least(lit(9L),
          expr("size(split(text, ' ')) DIV 64")).cast("int"))
      graft.operators.Layout.writeShardsOrdered(
        d, "doc_id", out, 8, Seq(col("tier")))
      val manifest = graft.operators.Pipeline
        .q137CurriculumManifest(spark, sfDir).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(6)))).toMap
      manifest.foreach { case (shard, (nDocs, checksum)) =>
        val dir = new java.io.File(s"$out/shard=$shard")
        val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $shard: ${files.length} files")
        val rows = spark.read.parquet(files.head.getAbsolutePath)
          .select("doc_id", "sk", "tier").collect()
        assert(rows.length == nDocs)
        // the bytes at rest ARE the curriculum: tiers never decrease
        rows.map(_.getInt(2)).sliding(2).foreach {
          case Array(a, b) => assert(a <= b, s"shard $shard tier order broke")
          case _ =>
        }
        // and the manifest's order-sensitive checksum certifies it
        val ck = rows.zipWithIndex.map { case (r, i) =>
          BigInt(i + 1) * (r.getLong(1) % P) % P }.sum % P
        assert(ck.toLong == checksum, s"shard $shard curriculum checksum")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("appendShards: half-then-half equals full membership, manifests reconcile, untouched shards keep checksums") {
    import org.apache.spark.sql.functions.col
    val P = 2147483647L
    val out = java.nio.file.Files.createTempDirectory("graft_appx_").toString
    try {
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      val first = d.filter(col("doc_id") % 2 === 0)
      val second = d.filter(col("doc_id") % 2 === 1)
      graft.operators.Layout.writeShards(first, "doc_id", out,
        manifestTextCol = Some("text"))
      val before = spark.read.parquet(out + "/_manifest").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      graft.operators.Layout.appendShards(second, "doc_id", "text", out)
      // 1. membership: the appended export holds exactly the full
      // export's per-shard document sets (hash membership is
      // append-invariant)
      val gotMembers = spark.read.parquet(out)
        .select("shard", "doc_id").collect()
        .groupBy(_.getInt(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val wantMembers = graft.operators.Pipeline
        .shardManifestOf(d, "doc_id", "text", 8) // membership truth via
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val fullAssign = d.select(col("doc_id"),
          org.apache.spark.sql.functions.pmod(
            graft.operators.Pipeline.shardKey(col("doc_id")), org.apache.spark.sql.functions.lit(8L))
            .cast("int").as("shard")).collect()
        .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
      assert(gotMembers == fullAssign, "membership differs from a full export")
      assert(wantMembers.forall { case (s, n) => gotMembers(s).size.toLong == n })
      // 2. manifests reconcile: the MERGED sidecar equals a manifest
      // recomputed from the bytes at rest, positions taken from file
      // replay order (resident file first, appended file second)
      val after = spark.read.parquet(out + "/_manifest").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      // the merged sidecar IS q141's appended manifest: the oracle
      // query computes the same even-then-odd wave arithmetic, so the
      // implementation is tied to the cross-engine-certified algebra
      val q141 = graft.operators.Pipeline.q141AppendManifest(spark, sfDir)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(5)))).toMap
      assert(after == q141, s"sidecar $after vs q141 $q141")
      after.foreach { case (shard, (nDocs, nToks, checksum, headId)) =>
        val files = filesInReplayOrder(out, shard)
        val rows = files.flatMap(f =>
          spark.read.parquet(f.getAbsolutePath)
            .select("doc_id", "sk", "text").collect())
        assert(rows.length.toLong == nDocs, s"shard $shard count")
        assert(rows.head.getLong(0) == headId, s"shard $shard head")
        assert(rows.map(_.getString(2).split(" ", -1).length.toLong).sum
          == nToks, s"shard $shard tokens")
        val ck = rows.zipWithIndex.map { case (r, i) =>
          BigInt(i + 1) * (r.getLong(1) % P) % P }.sum % P
        assert(ck.toLong == checksum, s"shard $shard merged checksum")
      }
      // 3. an append touching a strict subset of shards preserves the
      // untouched shards' manifest rows byte-for-byte (epoch-0 case)
      val spare = d.filter(col("doc_id") % 2 === 0).limit(200)
        .withColumn("shard", org.apache.spark.sql.functions.pmod(
          graft.operators.Pipeline.shardKey(
            col("doc_id") + org.apache.spark.sql.functions.lit(5000000L)),
          org.apache.spark.sql.functions.lit(8L)).cast("int"))
        .collect()
      val oneShard = spare.filter(_.getInt(2) == spare.head.getInt(2))
        .map(r => (r.getLong(0) + 5000000L, r.getString(1)))
      import spark.implicits._
      val touched = spare.head.getInt(2)
      graft.operators.Layout.appendShards(
        oneShard.toSeq.toDF("doc_id", "text"), "doc_id", "text", out)
      val third = spark.read.parquet(out + "/_manifest").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      third.foreach { case (shard, row) =>
        if (shard != touched)
          assert(row == after(shard), s"untouched shard $shard row moved")
        else assert(row._1 == after(shard)._1 + oneShard.length,
          s"touched shard $shard count")
      }
      assert(before.nonEmpty && before.keySet == after.keySet)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("appendShardsWriter: a streamed export equals the batch append sequence of the same waves") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_sexp_")
    val out = s"$root/export"; val outBatch = s"$root/export_batch"
    val ckpt = s"$root/ckpt"
    try {
      import spark.implicits._
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val (w0, w1) = d.partition(_._1 % 2 == 0)
      val in = MemoryStream[(Long, String)]
      val query = Export.appendShardsWriter(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", out, ckpt).start()
      try {
        in.addData(w0.toSeq: _*); query.processAllAvailable()
        in.addData(w1.toSeq: _*); query.processAllAvailable()
      } finally query.stop()
      // the batch form of the same two waves
      import spark.implicits._
      graft.operators.Layout.appendShards(
        w0.toSeq.toDF("doc_id", "text"), "doc_id", "text", outBatch)
      graft.operators.Layout.appendShards(
        w1.toSeq.toDF("doc_id", "text"), "doc_id", "text", outBatch)
      def manifest(p: String) = spark.read.parquet(p + "/_manifest").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      assert(manifest(out) == manifest(outBatch),
        "streamed sidecar != batch append sequence's")
      // and the sidecar reconciles against the streamed BYTES at rest
      val P = 2147483647L
      manifest(out).foreach { case (shard, (nDocs, _, checksum, headId)) =>
        val files = filesInReplayOrder(out, shard)
        val rows = files.flatMap(f =>
          spark.read.parquet(f.getAbsolutePath).select("doc_id", "sk").collect())
        assert(rows.length.toLong == nDocs && rows.head.getLong(0) == headId)
        val ck = rows.zipWithIndex.map { case (r, i) =>
          BigInt(i + 1) * (r.getLong(1) % P) % P }.sum % P
        assert(ck.toLong == checksum, s"shard $shard streamed checksum")
      }
      // delivered-batch markers exist: the replay-skip contract
      assert(new java.io.File(s"$ckpt/delivered").listFiles()
        .exists(_.getName.endsWith(".done")))
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("appendShards guards: sidecar-less resident data and a mismatched modulus both fail loudly") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_guard_")
    try {
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        .filter(col("doc_id") < 500)
      // a manifest-less export (the pre-r18 writeShards form): blind
      // appending would found a delta-only manifest ignoring every
      // resident row — must refuse
      val bare = s"$root/bare"
      graft.operators.Layout.writeShards(d, "doc_id", bare)
      val e1 = intercept[IllegalArgumentException](
        graft.operators.Layout.appendShards(d, "doc_id", "text", bare))
      assert(e1.getMessage.contains("no _manifest sidecar"))
      // a manifested export appended with the wrong modulus would
      // route docs to shards a full export never places them in
      val good = s"$root/good"
      graft.operators.Layout.writeShards(d, "doc_id", good,
        manifestTextCol = Some("text"))
      val e2 = intercept[IllegalArgumentException](
        graft.operators.Layout.appendShards(d, "doc_id", "text", good,
          numShards = 16))
      assert(e2.getMessage.contains("was written with 8 shards"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(root.toFile).deleteRecursively()
    }
  }

  test("compactShards: dedupes a double-append, resets order to canonical, one file per shard") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_").toString + "/exp"
    try {
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        .filter(col("doc_id") < 2000)
      graft.operators.Layout.appendShards(d, "doc_id", "text", out)
      // simulate the documented replay window: the same wave appends twice
      graft.operators.Layout.appendShards(d, "doc_id", "text", out)
      val doubled = spark.read.parquet(out).count()
      assert(doubled == 2 * d.count(), "fixture: double-append expected")
      // the standing reconcile audit sees exactly window (b)'s shape:
      // bytes and manifest CONSISTENT (the replay wrote both), so counts
      // and checksums reconcile cleanly — only the duplicate-aware
      // distinct-id column catches it (ADVICE r18)
      val audit = graft.operators.Layout
        .reconcileShards(spark, out, "doc_id", "text").collect()
      audit.foreach { r =>
        assert(r.getAs[Boolean]("counts_equal") &&
          r.getAs[Boolean]("checksum_equal"),
          s"window (b) must reconcile cleanly: $r")
        assert(!r.getAs[Boolean]("ids_unique"),
          s"duplicate ids must flag: $r")
      }
      graft.operators.Layout.compactShards(spark, out, "doc_id", "text")
      // compaction clears every flag
      val clean = graft.operators.Layout
        .reconcileShards(spark, out, "doc_id", "text").collect()
      clean.foreach { r =>
        assert(r.getAs[Boolean]("counts_equal") &&
          r.getAs[Boolean]("checksum_equal") &&
          r.getAs[Boolean]("ids_unique"), s"post-compaction flag: $r")
      }
      // membership repaired to distinct ids
      val got = spark.read.parquet(out).select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      val want = d.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, "compaction must dedup to the distinct corpus")
      // manifest reset to the canonical full-export form (q122's
      // (key, id) order over the distinct corpus), one file per shard
      val fresh = graft.operators.Pipeline
        .shardManifestOf(d, "doc_id", "text", 8).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      val sidecar = spark.read.parquet(out + "/_manifest").collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))).toMap
      assert(sidecar == fresh, "compacted sidecar must be the canonical manifest")
      sidecar.keys.foreach { shard =>
        val files = new java.io.File(s"$out/shard=$shard")
          .listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $shard: ${files.length} files after compaction")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("reconcileShards: a legacy export (no _waves sidecar) reconciles clean despite duplicate part-file basenames") {
    // review r20: the legacy mtime fallback assigns each (shard dir,
    // file) occurrence its own wave index, and one partitionBy task
    // writes the SAME basename under every shard dir it touches — as
    // a join side those (name, wave) pairs must collapse to one row
    // per name or every row of such a file multiplies N-fold and the
    // audit flags a perfectly healthy export
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_leg_").toString + "/exp"
    try {
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        .filter(col("doc_id") < 2000)
      graft.operators.Layout.writeShards(d, "doc_id", out,
        manifestTextCol = Some("text"))
      // fixture check: the partitionBy write really does repeat
      // basenames across shard dirs (the fan-out trigger)
      val names = graft.operators.Layout.listShardFiles(spark, out)
      assert(names.length > names.distinct.length,
        "fixture: expected duplicate part-file basenames across shards")
      // make it a LEGACY export: no _waves sidecar
      val wp = new org.apache.hadoop.fs.Path(out + "/_waves")
      wp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(wp, true)
      val audit = graft.operators.Layout
        .reconcileShards(spark, out, "doc_id", "text").collect()
      assert(audit.nonEmpty)
      audit.foreach { r =>
        assert(r.getAs[Boolean]("counts_equal") &&
          r.getAs[Boolean]("checksum_equal") &&
          r.getAs[Boolean]("ids_unique"),
          s"legacy export must reconcile clean: $r")
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("reconcileShards: a bytes-only replay (window a) flags counts and checksum on exactly the touched shard") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_rca_").toString + "/exp"
    try {
      val d = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
        .filter(col("doc_id") < 500)
      graft.operators.Layout.writeShards(d, "doc_id", out,
        manifestTextCol = Some("text"))
      // clean export: every flag true
      graft.operators.Layout.reconcileShards(spark, out, "doc_id", "text")
        .collect().foreach { r =>
          assert(r.getAs[Boolean]("counts_equal") &&
            r.getAs[Boolean]("checksum_equal") &&
            r.getAs[Boolean]("ids_unique"), s"clean export flagged: $r")
        }
      // plant window (a): a batch whose parquet committed but whose
      // manifest never wrote — bytes the sidecar doesn't count
      // (simulated by duplicating a part file under a fresh name the
      // _waves sidecar has never seen)
      val shardDir = new java.io.File(s"$out/shard=0")
      val part = shardDir.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(shardDir,
          "part-99999-replayed.snappy.parquet").toPath)
      val audit = graft.operators.Layout
        .reconcileShards(spark, out, "doc_id", "text").collect()
        .map(r => r.getInt(0) -> r).toMap
      assert(!audit(0).getAs[Boolean]("counts_equal") &&
        !audit(0).getAs[Boolean]("ids_unique"),
        s"window (a) must flag shard 0: ${audit(0)}")
      audit.filter { case (k, _) => k != 0 }.values.foreach { r =>
        assert(r.getAs[Boolean]("counts_equal") &&
          r.getAs[Boolean]("checksum_equal") &&
          r.getAs[Boolean]("ids_unique"),
          s"untouched shard flagged: $r")
      }
      // the repair clears it
      graft.operators.Layout.compactShards(spark, out, "doc_id", "text")
      graft.operators.Layout.reconcileShards(spark, out, "doc_id", "text")
        .collect().foreach { r =>
          assert(r.getAs[Boolean]("counts_equal") &&
            r.getAs[Boolean]("checksum_equal") &&
            r.getAs[Boolean]("ids_unique"), s"post-repair flag: $r")
        }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("shardAssign is stateless and key-identical to the batch derivation") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val in = MemoryStream[(Long, String)]
    val query = Export.shardAssign(in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("assign_mem")
      .outputMode("append").start()
    try {
      in.addData((7L, "a b c"), (11L, "x y"), (1000042L, "one two three four"))
      query.processAllAvailable()
      val rows = spark.table("assign_mem")
        .select("doc_id", "sk", "shard", "n_toks").collect()
      rows.foreach { r =>
        val sk = h60("shard:" + r.getLong(0))
        assert(r.getLong(1) == sk && r.getInt(2) == (sk % 8).toInt)
      }
      assert(rows.map(r => r.getLong(0) -> r.getLong(3)).toMap ==
        Map(7L -> 3L, 11L -> 2L, 1000042L -> 4L))
      // stateless: no state store operator in the executed plan
      assert(query.lastProgress.stateOperators.isEmpty)
    } finally query.stop()
  }

  test("ingest E2E through the VERIFIED path: pages to kept shards via verifiedKeeps") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    // the bootstrap test's deterministic fixture discipline: the
    // edited re-crawl page is CHOSEN (independent key re-derivation)
    // to land in its original's band bucket, so the verified drop is
    // the deterministic branch, not a ~J^4 coin flip
    val base = Seq.tabulate(30)(i => s"tok$i").mkString(" ")
    val baseHs = DedupSpec.hsOf(base)
    val edited = (0 until 30).iterator.map { k =>
      Seq.tabulate(30)(i => if (i == k) s"new$k" else s"tok$i")
        .mkString(" ")
    }.find { t =>
      val ths = DedupSpec.hsOf(t)
      DedupSpec.bucketOf(ths) == DedupSpec.bucketOf(baseHs) &&
        3L * DedupSpec.interOf(baseHs, ths) >= baseHs.length + ths.length
    }.getOrElse(fail("no same-bucket >= 1/2-Jaccard edit in 30 tries"))
    val distinct = Seq.tabulate(30)(i => s"zzz$i").mkString(" ")
    val fixture = Map(1L -> base, 2L -> edited, 3L -> distinct)
    val in = MemoryStream[(Long, String, Long)]
    val pages = in.toDF().toDF("doc_id", "html", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
    val verdicts = Curation.ingestGateVerified(pages, "html", "ts",
      horizonMs = 600000L)
    ExportSpec.verifiedShardSink.clear()
    // the packaged consumer shape: per micro-batch, reduce verdicts
    // with verifiedKeeps, join kept ids back to the source-of-record,
    // shard-assign — pages in, kept training-shard rows out
    val query = verdicts.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val s2 = b.sparkSession
        import s2.implicits._
        val record = fixture.toSeq.toDF("doc_id", "text")
        val kept = Dedup.verifiedKeeps(b).filter(col("kept"))
          .select("doc_id").join(record, "doc_id")
        Export.shardAssign(kept, "doc_id", "text", 8).collect()
          .foreach(r => ExportSpec.verifiedShardSink.add((
            r.getAs[Long]("doc_id"), r.getAs[Int]("shard"),
            r.getAs[Long]("n_toks"))))
        ()
      }.start()
    try {
      in.addData((1L, s"<p>$base</p>", 1L), (4L, "<p>tiny text</p>", 2L))
      query.processAllAvailable()
      in.addData((2L, s"<p>$edited</p>", 3L), (3L, s"<p>$distinct</p>", 4L))
      query.processAllAvailable()
      val got = ExportSpec.verifiedShardSink.toArray(
        Array.empty[(Long, Int, Long)]).toSeq.sortBy(_._1)
      // 1 and 3 reach shards; 2 is a VERIFIED drop against keeper 1;
      // 4 dies at the quality gate and never produces a verdict
      assert(got.map(_._1) == Seq(1L, 3L), s"got $got")
      got.foreach { case (id, shard, nToks) =>
        assert(shard == (h60("shard:" + id) % 8).toInt && nToks == 30L,
          s"doc $id routed to $shard with $nToks tokens")
      }
    } finally query.stop()
  }
}
