package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  test("streaming PQ encode equals the batch fold against the stored codebook, stateless") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // a persisted index to read the frozen codebook from
    val idx = Pipeline.pqIndexTable(sfDir)
    if (!spark.catalog.tableExists(idx))
      Pipeline.q103IndexedPqAnn(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .limit(64).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val in = MemoryStream[(Long, Seq[Double])]
    val query = Quantize.encodeWithStoredCodebook(spark, idx,
        in.toDF().toDF("vec_id", "e"))
      .writeStream.format("memory").queryName("quantize_mem")
      .outputMode("append").start()
    try {
      in.addData(vecs.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("quantize_mem").collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
      // batch truth 1: the shared fold over a static frame
      val seeds = Pipeline.storedPqSeeds(spark, idx)
      val batch = Quantize.encode(vecs.toSeq.toDF("vec_id", "e"), seeds)
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
      assert(streamed == batch, "stream/batch encode diverged")
      // batch truth 2: vectors that are IN the index must stream-encode
      // to their at-rest codes — the gate emits exactly what the build
      // wrote
      val stored = spark.table(idx)
        .filter(col("vec_id").isin(vecs.map(_._1): _*))
        .collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
      assert(streamed == stored, "gate diverged from the index at rest")
      // stateless: no state operator in the progress at all
      assert(query.lastProgress.stateOperators.isEmpty,
        "the quantize gate must not hold state")
    } finally query.stop()
  }
}
