package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class RetrieveSpec extends SparkSpec {

  test("weighted serve: positive scaling preserves the ranking, a pure weight serves its leg") {
    import org.apache.spark.sql.functions.col
    val queries = graft.Tables.spread(graft.Tables.documents(spark, sfDir))
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(graft.Tables.spread(graft.Tables.embeddings(spark, sfDir))
        .selectExpr("vec_id as query_id",
          "transform(embedding, x -> cast(x as double)) as qe"),
        "query_id")
    def serve(ws: Int, wd: Int) =
      graft.operators.Pipeline.hybridRrfServe(spark, sfDir, queries, ws, wd)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5)))
    val plain = serve(1, 1)
    val scaled = serve(2, 2)
    // (2,2) is a positive scaling: identical rows, doubled scores
    assert(plain.map(t => (t._1, t._2, t._3, t._5, t._6)).toSeq ==
      scaled.map(t => (t._1, t._2, t._3, t._5, t._6)).toSeq)
    assert(plain.map(_._4 * 2).toSeq == scaled.map(_._4).toSeq)
    // (0,4) serves the dense leg: the fused rank IS the dense rank
    serve(0, 4).foreach { case (q, rk, doc, _, _, drk) =>
      assert(drk == rk, s"query $q doc $doc: fused rank $rk != dense rank $drk")
    }
  }

  test("at-rest serve: novel-id queries route through the stored index and find themselves") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // corpus documents re-queried under NOVEL ids (+5M): the index has
    // never seen these ids, only the content
    val queries = graft.Tables.spread(graft.Tables.documents(spark, sfDir))
      .filter(col("doc_id") < 6)
      .select(col("doc_id"), col("text"))
      .join(graft.Tables.spread(graft.Tables.embeddings(spark, sfDir))
        .selectExpr("vec_id as doc_id",
          "transform(embedding, x -> cast(x as double)) as qe"), "doc_id")
      .collect()
      .map(r => (r.getLong(0) + 5000000L, r.getString(1), r.getSeq[Double](2)))
    val in = MemoryStream[(Long, String, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Int, Int)]
    val query = in.toDF().toDF("query_id", "text", "qe")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got ++= Retrieve.hybridServeAtRest(sfDir)(b, id).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getInt(4), r.getInt(5)))
        ()
      }
      .start()
    try {
      in.addData(queries.take(3)); query.processAllAvailable()
      in.addData(queries.drop(3)); query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty, "serving must hold no state")
      val byQ = got.groupBy(_._1)
      assert(byQ.size == queries.length)
      queries.foreach { case (qid, _, _) =>
        // the stored routing lands the identical vector in its own home
        // cluster, so the original document is a candidate and its
        // cosine 1.0 tops the dense leg
        val self = byQ(qid).find(_._3 == qid - 5000000L)
        assert(self.nonEmpty, s"query $qid: original doc not retrieved")
        assert(self.get._5 == 1, s"query $qid: original doc dense rank ${self.get._5}")
        // and an identical-text query surfaces it on the sparse leg too
        assert(self.get._4 > 0, s"query $qid: original doc missing from sparse leg")
      }
    } finally query.stop()
  }

  test("composed-ANN serve at rest: novel-id queries find themselves at the global-minimum ADC, stateless") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // corpus vectors re-queried under NOVEL ids (+5M): the banked
    // composed index has never seen these ids, only the content
    val queries = graft.Tables.spread(graft.Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") < 6)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as qe")
      .collect()
      .map(r => (r.getLong(0) + 5000000L, r.getSeq[Double](1)))
    val in = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Long)]
    val query = in.toDF().toDF("query_id", "qe")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        got ++= Retrieve.ivfPqServeAtRest(sfDir)(b, id).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        ()
      }
      .start()
    try {
      in.addData(queries.take(3)); query.processAllAvailable()
      in.addData(queries.drop(3)); query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty,
        "ANN serving must hold no state")
      val byQ = got.groupBy(_._1)
      assert(byQ.size == queries.length)
      queries.foreach { case (qid, _) =>
        val rows = byQ(qid)
        // the stored routing lands the identical vector in its own
        // home cluster, and a query's PQ codes are its per-subspace
        // argmin codewords — so the original is retrieved AND carries
        // the group's minimum ADC (rank-1 ties only with
        // code-identical vectors)
        val self = rows.find(_._3 == qid - 5000000L)
        assert(self.nonEmpty, s"query $qid: original vector not retrieved")
        assert(self.get._4 == rows.map(_._4).min,
          s"query $qid: original ADC ${self.get._4} above min ${rows.map(_._4).min}")
      }
      // batch parity: the same queries through the batch serve yield
      // the identical answer set (one shared derivation)
      val batch = graft.operators.Pipeline.ivfPqRoutedServe(spark, sfDir,
          queries.toSeq.toDF("query_id", "qe")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.toSet == batch,
        s"stream/batch diverged: ${got.toSet.diff(batch)}")
    } finally query.stop()
  }

  test("multi-probe serve at rest: radius-1 external requests equal q120; novel ids still find themselves") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // member-id queries through the streaming face at radius 1: the
    // routed assignment equals the build's (cluster AND mask), so the
    // output must be row-identical to q120's member-query serve — the
    // q148 contract, here asserted at the spec SF through foreachBatch
    val memberQs = graft.Tables.spread(graft.Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") < 10)
      .selectExpr("vec_id as query_id",
        "transform(embedding, x -> cast(x as double)) as qe")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val in = MemoryStream[(Long, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Long, Boolean)]
    val query = in.toDF().toDF("query_id", "qe")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        got ++= Retrieve.ivfPqServeAtRest(sfDir, probeRadius = 1)(b, id)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
            r.getBoolean(4)))
        ()
      }
      .start()
    try {
      in.addData(memberQs.take(4)); query.processAllAvailable()
      in.addData(memberQs.drop(4)); query.processAllAvailable()
      assert(query.lastProgress.stateOperators.isEmpty)
      val q120 = graft.operators.Pipeline
        .q120MultiProbeIvfPq(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSet
      assert(got.toSet == q120,
        s"radius-1 routed serve diverged from q120: ${got.toSet.diff(q120)}")
    } finally query.stop()
    // novel-id find-yourself survives the probe expansion (probes only
    // ADD candidates; the original still carries the minimum ADC)
    val novel = memberQs.take(3).map { case (id, qe) => (id + 7000000L, qe) }
    val in2 = MemoryStream[(Long, Seq[Double])]
    val got2 = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    val q2 = in2.toDF().toDF("query_id", "qe")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        got2 ++= Retrieve.ivfPqServeAtRest(sfDir, probeRadius = 1)(b, id)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        ()
      }
      .start()
    try {
      in2.addData(novel.toIndexedSeq); q2.processAllAvailable()
      val byQ = got2.groupBy(_._1)
      novel.foreach { case (qid, _) =>
        val rows = byQ(qid)
        val self = rows.find(_._2 == qid - 7000000L)
        assert(self.nonEmpty, s"query $qid: original not retrieved")
        assert(self.get._3 == rows.map(_._3).min,
          s"query $qid: original ADC not the minimum")
      }
      // probes only ADD candidates: radius 1's rank-1 equals radius
      // 0's (the original carries the global-minimum ADC at both
      // radii, so widening the candidate set cannot displace it)
      val r0 = novel.toSeq.toDF("query_id", "qe")
      val top0 = graft.operators.Pipeline
        .ivfPqRoutedServe(spark, sfDir, r0).collect()
        .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
      val top1 = got2.groupBy(_._1).view.mapValues(rs =>
        rs.minBy(_._3)._2).toMap
      assert(top0 == top1.toMap, s"rank-1 moved: $top0 vs $top1")
    } finally q2.stop()
  }

  test("streaming hybrid serve equals q133 across split installments, stateless") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // the q133 query set streamed as EXTERNAL requests: same ids, so
    // the self-exclusion makes stream output == the batch oracle query
    val queries = graft.Tables.spread(graft.Tables.documents(spark, sfDir))
      .filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("text"))
      .join(graft.Tables.spread(graft.Tables.embeddings(spark, sfDir))
        .selectExpr("vec_id as query_id",
          "transform(embedding, x -> cast(x as double)) as qe"),
        "query_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Double](2)))
      .sortBy(_._1)
    assert(queries.length == 10)
    val in = MemoryStream[(Long, String, Seq[Double])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Long, Int, Int)]
    val query = in.toDF().toDF("query_id", "text", "qe")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        got ++= Retrieve.hybridServe(sfDir)(b, id).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
            r.getInt(4), r.getInt(5)))
        ()
      }
      .start()
    try {
      // two installments: answers must not depend on batch boundaries
      in.addData(queries.take(4)); query.processAllAvailable()
      in.addData(queries.drop(4)); query.processAllAvailable()
      val batch = graft.operators.Pipeline.q133HybridRrf(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getInt(4), r.getInt(5))).toSet
      assert(got.toSet == batch,
        s"stream/batch diverged: ${got.toSet.diff(batch)} vs ${batch.diff(got.toSet)}")
      assert(got.size == batch.size, "duplicate answers across installments")
      // retrieval serving holds NO state — nothing to recover, nothing
      // to evict; a restarted job re-serves only unanswered requests
      assert(query.lastProgress.stateOperators.isEmpty,
        "hybrid serving must not hold state")
    } finally query.stop()
  }
}
