package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout utilities for repeated-join workloads: bucketing
  * co-locates both sides of an equi-join on the join key at WRITE
  * time, so every subsequent join/aggregation on that key runs with
  * ZERO shuffle — the 100 TB answer to "lineitem ⋈ orders on every
  * query": pay the orderkey exchange once, at ingest, not per query.
  *
  * (Bucketed tables go through the session catalog — Spark's bucketing
  * metadata lives in the table definition, not the files.)
  */
object Layout {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** True when the executed plan of `df` contains any shuffle exchange
    * — the property bucketing is meant to eliminate. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
