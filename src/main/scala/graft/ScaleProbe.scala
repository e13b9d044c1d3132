package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scaling probe (VERDICT r12 §next-7): the testdata tops out
  * at sf0.1, so the 100 TB posture is argued from plans — this main
  * MEASURES it. It materializes a ~10× corpus (default `/tmp/graft_sf1`)
  * as a union of re-keyed copies of sf0.1, then single-samples the most
  * expensive queries at BOTH scales in fresh sessions and prints one
  * JSON line per query with the wall-time ratio. A data-linear operator
  * on a fixed-core box should land near ratio ≈ 10 (≈ copies); clearly
  * super-linear ratios flag the next plan audit.
  *
  * Re-keying preserves referential integrity (each copy is a closed
  * world: order/customer/supplier/part keys shift together; dimension
  * tables stay fixed, as TPC-H scaling does). Content DECORRELATES
  * between copies — without it every row would have exactly `copies`
  * duplicates and the dedup family would measure a degenerate corpus,
  * not scale:
  *  - documents: every 4th word gets a per-copy suffix, so any 8-gram
  *    window crosses ≥ 2 edited words and shingle/passage/minhash keys
  *    diverge between copies (ids also shift);
  *  - embeddings: each component takes a deterministic ±0.5 hash
  *    perturbation per copy, so copies don't collapse into the same
  *    ANN/cluster neighborhoods.
  * NOT part of the library or the driver contract; never run by Verify
  * or Bench. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_PROBE_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "/tmp/graft_sf1")
    val copies = sys.env.get("SPARK_GRAFT_PROBE_COPIES")
      .flatMap(_.toIntOption).getOrElse(10)
    val queries = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq(
        // the ten most expensive by the r12/r13 driver medians
        "q81_pagerank", "q61_derived_semantic_dedup", "q40_ngram_jaccard",
        "q50_dedup_clusters", "q88_triangles", "q49_contamination",
        "q51_semantic_dedup", "q31_ivf_ann", "q24_near_dup_minhash",
        "q76_duplicate_spans"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)

    def mkSession(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ui.retainedExecutions", "4")
        .config("spark.sql.debug.maxToStringFields", "2000")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def gen(spark: SparkSession): Unit = {
      val marker = new java.io.File(out, "_PROBE_DONE")
      if (marker.exists()) return
      def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
      def write(df: DataFrame, t: String): Unit =
        df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      // dimensions stay fixed, exactly as TPC-H scaling keeps them
      write(read("region"), "region")
      write(read("nation"), "nation")
      def scaled(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
        val base = read(t)
        write((0 until copies).map(c => f(base, c)).reduce(_ unionByName _)
          .repartition(64), t)
      }
      val K = 1000000L // entity-key stride per copy
      val M = 10000000L // order/event-key stride per copy
      scaled("customer")((df, c) =>
        df.withColumn("c_custkey", col("c_custkey") + lit(c * K)))
      scaled("supplier")((df, c) =>
        df.withColumn("s_suppkey", col("s_suppkey") + lit(c * K)))
      scaled("part")((df, c) =>
        df.withColumn("p_partkey", col("p_partkey") + lit(c * K)))
      scaled("orders")((df, c) =>
        df.withColumn("o_orderkey", col("o_orderkey") + lit(c * M))
          .withColumn("o_custkey", col("o_custkey") + lit(c * K)))
      scaled("lineitem")((df, c) =>
        df.withColumn("l_orderkey", col("l_orderkey") + lit(c * M))
          .withColumn("l_suppkey", col("l_suppkey") + lit(c * K))
          .withColumn("l_partkey", col("l_partkey") + lit(c * K)))
      // events go through the normalizing loader so the copy always
      // carries a plain TIMESTAMP regardless of the source's physical type
      val ev = Tables.events(spark, src)
      write((0 until copies).map(c => ev
        .withColumn("event_id", col("event_id") + lit(c * M))
        .withColumn("user_id", col("user_id") + lit(c * K)))
        .reduce(_ unionByName _).repartition(64), "events")
      scaled("documents")((df, c) =>
        if (c == 0) df
        else {
          val t = concat_ws(" ", transform(split(col("text"), " "),
            (w, i) => when(i % 4 === 0, concat(w, lit("~" + c))).otherwise(w)))
          df.withColumn("doc_id", col("doc_id") + lit(c * 100000L))
            .withColumn("text", t)
            .withColumn("n_chars", length(t).cast("long"))
        })
      scaled("embeddings")((df, c) =>
        if (c == 0) df
        else df.withColumn("vec_id", col("vec_id") + lit(c * 100000L))
          .withColumn("embedding", transform(col("embedding"), (x, i) =>
            (x + pmod(hash(col("vec_id"), i, lit(c)), lit(1000))
              .cast("float") / lit(1000.0f) - lit(0.5f)).cast("float"))))
      marker.createNewFile()
    }

    val genSession = mkSession()
    try gen(genSession) finally genSession.stop()

    def fmt(v: Double): String =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
    val results = queries.map { name =>
      val s = mkSession()
      try {
        def run(dir: String): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(s, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        def settle(): Unit = { s.catalog.clearCache(); System.gc(); Thread.sleep(150) }
        // untimed codegen/footer warmup on the tiny SF, then one cold
        // sample per scale in the same fresh session
        try run("/root/testdata/sf0.001") catch { case _: Throwable => () }
        settle()
        val t01 = run(src); settle()
        val t1 = run(out); settle()
        val line = s"""{"q":"$name","t_sf01":${fmt(t01)},"t_sf1":${fmt(t1)},"ratio":${fmt(t1 / t01)}}"""
        println(line)
        line
      } catch {
        case e: Throwable =>
          val line = s"""{"q":"$name","error":"${Option(e.getMessage).getOrElse(e.getClass.getName).replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160)}"}"""
          println(line)
          line
      } finally s.stop()
    }
    println("[probe] " + results.size + " queries done, corpus at " + out)
  }
}
