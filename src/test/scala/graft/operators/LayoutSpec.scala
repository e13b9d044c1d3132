package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing eliminates the join shuffle — the pay-once-at-ingest
  * layout for repeated fact-fact joins. */
class LayoutSpec extends SparkSpec {

  test("bucketed lineitem-orders join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
        "li_bucketed", "l_orderkey", 8)
      Layout.writeBucketed(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
        "ord_bucketed", "o_orderkey", 8)
      val plain = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      assert(Layout.hasShuffle(plain), "unbucketed join must shuffle")
      assert(!Layout.hasShuffle(bucketed), "bucketed join must not shuffle")
      // same row count either way
      assert(plain.count() == bucketed.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("partitioned layout: event_type predicates prune whole directories") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    Layout.writePartitioned(
      graft.Tables.events(spark, sfDir).drop("ts"), // nanos ts not needed
      out, Seq("event_type"))
    // one directory per event_type on disk
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("event_type=")).sorted
    assert(dirs.length >= 3, s"expected hive partition dirs, got ${dirs.toSeq}")
    // the filter must surface as a PartitionFilter, not a data filter
    val scan = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val pf = Layout.partitionFilters(scan)
    assert(pf.contains("event_type"), s"predicate not pruned: '$pf'")
    // and the pruned scan reads only the matching partition's rows
    val expected = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(scan.count() == expected)
  }
}
