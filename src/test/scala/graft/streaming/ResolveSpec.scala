package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ResolveSpec extends SparkSpec {

  test("streaming fuzzy matches equal the batch matcher on the same records, stateless") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val vocab = graft.Tables.part(spark, sfDir)
    // the q87 corruption shapes, plus a cross-first-token edit the
    // single-key blocking era would have lost
    val records = Seq(
      (1L, "cold widget"),   // exact
      (2L, "cold widge"),    // last char dropped
      (3L, "large boltx"),   // trailing x
      (4L, "old rod"),       // one edit from "cold rod" AND exact if in vocab
      (5L, "zzz qqq"))       // matches nothing
    val in = MemoryStream[(Long, String)]
    val query = Resolve.fuzzyMatches(
        in.toDF().toDF("rec_id", "dirty"), "dirty", vocab, "p_name")
      .select("rec_id", "cand", "d")
      .writeStream.format("memory").queryName("resolve_mem")
      .outputMode("append").start()
    try {
      in.addData(records)
      query.processAllAvailable()
      val streamed = spark.table("resolve_mem").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      // batch truth: the SAME shared matcher over a static frame
      val batch = graft.operators.Pipeline.fuzzyMatchDual(
          records.toDF("rec_id", "dirty"), "dirty", vocab, "p_name")
        .select("rec_id", "cand", "d").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(streamed == batch, s"stream $streamed\nbatch $batch")
      // the corrupted shapes really resolved, the garbage did not
      assert(streamed.exists(m => m._1 == 2L && m._2 == "cold widget" && m._3 == 1))
      assert(!streamed.exists(_._1 == 5L))
      // deterministic winner rule downstream: min d, then cand
      val winners = streamed.groupBy(_._1).view.mapValues(ms =>
        ms.toSeq.sortBy(m => (m._3, m._2)).head._2).toMap
      assert(winners(1L) == "cold widget" && winners(2L) == "cold widget")
      // stateless: no state operator in the progress at all
      assert(query.lastProgress.stateOperators.isEmpty,
        "the resolution gate must not hold state")
    } finally query.stop()
  }
}
