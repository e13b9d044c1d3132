package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what [[graft.operators.Layout.writeBucketed]] buys a
  * repeated fact-⋈-fact workload: q03 (lineitem ⋈ orders on orderkey)
  * against plain parquet vs against tables bucketed on the join key.
  *
  * Bucketing moves the orderkey exchange from query time to ingest
  * time — the 100 TB posture for any join key that appears in every
  * query. Run: `sbt "runMain graft.LayoutDemo [sfDir]"`; results are
  * recorded in PLANS.md §bucketed-layout.
  */
object LayoutDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors.toString
    val warehouse = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      // At sf0.1 the date-filtered orders side fits a broadcast, which
      // at 100 TB it would not — forcing the sort-merge path reproduces
      // the at-scale plan shape this demo is about (fact ⋈ fact where
      // neither side broadcasts).
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q03(l: DataFrame, o: DataFrame): DataFrame =
      l.join(o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
          l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def joinExchanges(df: DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(l => l.contains("Exchange hashpartitioning") &&
          (l.contains("orderkey") || l.contains("_orderkey")))

    val lp = Tables.lineitem(spark, sfDir)
    val op = Tables.orders(spark, sfDir)
    // warmup (codegen + parquet footers), untimed
    q03(lp, op).write.format("noop").mode("overwrite").save()

    val plain = q03(lp, op)
    val (_, tPlain) = time(plain.write.format("noop").mode("overwrite").save())

    // ingest-time cost, paid once per dataset, amortized over every
    // subsequent orderkey join/aggregation
    val (_, tIngest) = time {
      operators.Layout.writeBucketed(lp, "lineitem_b", "l_orderkey", 32)
      operators.Layout.writeBucketed(op, "orders_b", "o_orderkey", 32)
    }
    val lb = spark.table("lineitem_b")
    val ob = spark.table("orders_b")
    q03(lb, ob).write.format("noop").mode("overwrite").save() // warmup
    val bucketed = q03(lb, ob)
    val (_, tBucketed) = time(bucketed.write.format("noop").mode("overwrite").save())

    println(s"[layout] plain:    ${f"$tPlain%.2f"}s  orderkey-exchanges=${joinExchanges(plain)}")
    println(s"[layout] bucketed: ${f"$tBucketed%.2f"}s  orderkey-exchanges=${joinExchanges(bucketed)}  (ingest ${f"$tIngest%.2f"}s, paid once)")
    println("[layout] ---- plain join plan (excerpt) ----")
    println(planExcerpt(plain))
    println("[layout] ---- bucketed join plan (excerpt) ----")
    println(planExcerpt(bucketed))
    spark.stop()
  }

  /** The SMJ/exchange spine of the executed plan — enough lines to see
    * whether an Exchange feeds the join. */
  private def planExcerpt(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("Exchange") ||
        l.contains("Scan parquet") || l.contains("Sort ") ||
        l.contains("FileScan"))
      .map(_.replaceAll(" Batched.*| PushedFilters.*", "").take(120))
      .mkString("\n")
}
