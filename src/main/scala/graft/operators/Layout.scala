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

  /** Write `df` hive-partitioned by `partitionCols`: predicates on
    * those columns become PARTITION PRUNING — whole directories never
    * enter the scan, the coarse-grained skip that makes "one day out
    * of three years" queries read 0.1% of a 100 TB table. Pair with a
    * time/tenant column of bounded cardinality; never partition by a
    * high-cardinality key (millions of directories kill the metastore
    * and the filesystem before the first byte is read).
    *
    * `maxRecordsPerFile` bounds file size so a skewed partition splits
    * instead of producing one giant file; the `repartition` on the
    * partition columns maps each output directory to one task,
    * avoiding the small-files explosion (every task otherwise writes a
    * file into every partition it touches). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** The partition filters the scan of `df` actually prunes with —
    * empty means every predicate arrives too late (post-scan) and the
    * full directory tree is listed and read. */
  def partitionFilters(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("").trim
  }
}
