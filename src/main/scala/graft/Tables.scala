package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver testdata layout
  * (`/root/testdata/sf*&#47;<table>.parquet`, see TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` scans so Catalyst gets full
  * predicate-pushdown / column-pruning freedom; callers must NOT cache or
  * collect these — at 100 TB each table is a partitioned columnar scan and
  * the plan must stay declarative end-to-end.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` normalized to session-zoned TIMESTAMP regardless of the
    * physical parquet type — the driver has shipped this column as
    * TIMESTAMP(NANOS) (which Spark 4 reads only as long, via the
    * `nanosAsLong` flag) and as TIMESTAMP(MICROS) without timezone
    * (which arrives as TIMESTAMP_NTZ). Downstream code keys everything
    * off `unix_millis(ts)`, so each physical shape converts with exact
    * integer arithmetic: nanos-as-long divides by 1000 (`div`, no
    * doubles — ns values exceed 2^53); NTZ casts under the session's
    * UTC zone, the same instant DuckDB's `epoch_ms` computes.
    *
    * The `nanosAsLong` flag is session-wide and deliberately set here (a
    * documented side effect): the driver calls `SparkEntry.entry` with a
    * session we don't build, so the loader is the only place guaranteed
    * to run before the read. The flag only affects TIMESTAMP(NANOS)
    * columns, which exist in no other testdata table. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ (micros, no zone): same instant under UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Round-robin spread before compute-heavy per-row work (hashing,
    * shingling, JSON parsing): the synthetic testdata ships one small
    * parquet file per table, which arrives as ONE scan partition and
    * would serialize minutes of map-side work onto a single core. The
    * repartition ships each raw row once (cheap) and unlocks full
    * parallelism. At production scale the scan itself has many splits —
    * the spread then simply rebalances skewed files. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
