package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming similarity: stream-static broadcast scoring — threshold
  * matching and nearest-query routing, with batch agreement. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val queries = Seq(
    (10L, Seq(1.0, 0.0, 0.0, 0.0)),
    (20L, Seq(0.0, 1.0, 0.0, 0.0)),
    (30L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("qid", "qvec")

  test("streamingMatch: arriving embeddings emit exactly the above-threshold pairs, no state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val stream = in.toDF().toDF("vec_id", "embedding")
    val query = Similarity.streamingMatch(stream, "embedding",
        queries, "qid", "qvec", threshold = 0.9)
      .select("vec_id", "query_id", "cosine")
      .writeStream.format("memory").queryName("sim_match_mem")
      .outputMode("append").start()
    def got = spark.table("sim_match_mem").as[(Long, Long, Double)]
      .collect().sorted.toSeq
    try {
      in.addData(
        (1L, Seq(0.99, 0.01, 0.0, 0.0)),  // ~q10
        (2L, Seq(0.0, 5.0, 0.1, 0.0)),    // ~q20 (scale-invariant)
        (3L, Seq(0.5, 0.5, 0.5, 0.5)))    // cosine 0.5 to each: below
      query.processAllAvailable()
      assert(got.map(r => (r._1, r._2)) == Seq((1L, 10L), (2L, 20L)), s"got $got")
      assert(got.forall(_._3 >= 0.9))
      // later batches score independently — zero state between batches
      in.addData((4L, Seq(0.0, 0.0, 1.0, 0.0)))
      query.processAllAvailable()
      assert(got.map(r => (r._1, r._2)) == Seq((1L, 10L), (2L, 20L), (4L, 30L)))
      // no stateful operator in the executed plan
      assert(query.lastProgress == null ||
        query.lastProgress.stateOperators.isEmpty,
        "threshold matching must be stateless")
    } finally query.stop()
  }

  test("nearestQuery agrees with the batch argmax tie-break") {
    // batch-mode check of the routing form (the expression tree is
    // identical either way; the streaming test below runs the same op
    // in update mode)
    val rows = Seq(
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),
      (2L, Seq(0.1, 0.9, 0.05, 0.0)),
      // equidistant from q10 and q20: the argmax key cos6*1e12 + id
      // breaks the tie to the LARGER id, as in the batch assignment
      (3L, Seq(0.7, 0.7, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.nearestQuery(rows, "vec_id", "embedding",
        queries, "qid", "qvec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 20L), s"got $got")
  }

  test("nearestQuery streams in update mode and matches the batch argmax") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val stream = in.toDF().toDF("vec_id", "embedding")
    val query = Similarity.nearestQuery(stream, "vec_id", "embedding",
        queries, "qid", "qvec")
      .writeStream.format("memory").queryName("sim_route_mem")
      .outputMode("update").start()
    def got = spark.table("sim_route_mem").as[(Long, Long, Double)]
      .collect().toSeq
    try {
      val batch1 = Seq(
        (1L, Seq(0.9, 0.1, 0.0, 0.0)),   // -> q10
        (3L, Seq(0.7, 0.7, 0.0, 0.0)))   // tie -> larger id q20
      in.addData(batch1: _*)
      query.processAllAvailable()
      assert(got.map(r => (r._1, r._2)).sorted == Seq((1L, 10L), (3L, 20L)),
        s"got $got")
      // a recurring key with a better match UPSERTS (update-mode
      // re-emission) — the routing verdict follows the new maximum
      in.addData((1L, Seq(0.0, 0.0, 1.0, 0.0)))   // now nearest q30
      query.processAllAvailable()
      val latest = got.groupBy(_._1).map { case (k, rows) => k -> rows.last._2 }
      assert(latest == Map(1L -> 30L, 3L -> 20L), s"got $got")
      // the aggregation is stateful by design: one state row per key
      assert(query.lastProgress.stateOperators.nonEmpty,
        "nearestQuery's routing aggregate must appear as a state operator")
      // streaming verdicts agree with the batch form on the same rows
      val batch = Similarity.nearestQuery(batch1.toDF("vec_id", "embedding"),
          "vec_id", "embedding", queries, "qid", "qvec")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch == Map(1L -> 10L, 3L -> 20L))
    } finally query.stop()
  }
}
