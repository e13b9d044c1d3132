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
}
