package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming shard router: ingest-time routing parity with the batch
  * export and the order-independent running manifest. */
class ExportSpec extends SparkSpec {

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
}
