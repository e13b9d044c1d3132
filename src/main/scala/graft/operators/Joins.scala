package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized temporal joins — the reusable form of the reference's
  * "latest state at time T" lookup (ST1's as-of semantics,
  * `src/transmitter/main.cpp:78-97`), exposed as a library operator.
  */
object Joins {

  /** As-of join: for every left row, attach the most recent right row
    * with `rightTs <= leftTs` within the same key (backward as-of,
    * inclusive).
    *
    * Implementation is the union-and-forward-fill pattern, NOT a range
    * join: both sides are tagged and unioned, then each right payload
    * column is forward-filled with `last(_, ignoreNulls)` over a
    * per-key (ts, side) window and the left rows keep the fill. One
    * shuffle on the key, no per-row range probe, no equality-join
    * explosion — the scalable shape when key cardinality grows with
    * the data.
    *
    * Right rows order before left rows at equal timestamps, so a right
    * row AT `leftTs` is visible (inclusive as-of).
    *
    * @param rightCols     right payload columns to attach (renamed
    *                      as-is; must not collide with left column names)
    * @param rightTieBreak unique right column ordering ties when two
    *                      right rows share (key, rightTs) — the HIGHER
    *                      value wins. Without it, equal-timestamp right
    *                      rows are picked nondeterministically.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .select((Seq("__ts", "__side", "__tie", key).distinct.map(col) ++
        leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", rightTieBreak.map(col).getOrElse(lit(null).cast(tieType)))
      .select((Seq("__ts", "__side", "__tie", key).distinct.map(col) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col)): _*)
    // __tie only discriminates within the right side (__side = 0, where
    // it is never null); ordering among equal-ts left rows is
    // irrelevant to the fill each receives.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select((Seq(key).map(col) ++ leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(col)): _*)
  }

  /** As-of join demo over the reference streams, oracle-checked: every
    * frame is annotated with the latest command at or before it; per
    * target, count how many frames ran under an unexpired override
    * (the batch generalization of the ST1 loop's per-tick check).
    * Uses the BUCKETED variant — the stream has only 8 target keys, so
    * the plain per-key window would funnel everything into 8 tasks. */
  def q37AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val frames = Channels.frames(spark, dir)
      .select(col("target_id"), col("tsm"), col("event_id"), col("ch"))
    val commands = Channels.commands(spark, dir)
      .select(col("target_id"), col("tsm").as("cmd_tsm"), col("ovr"),
        col("duration_ms"), col("event_id").as("cmd_eid"))
    val joined = asofJoinBucketed(frames, commands, "target_id", "tsm", "cmd_tsm",
      Seq("cmd_tsm", "ovr", "duration_ms"), rightTieBreak = "cmd_eid",
      bucketMs = 3600000L)
    joined
      .groupBy(col("target_id"))
      .agg(count(lit(1)).as("n_frames"),
        count(col("cmd_tsm")).as("n_with_cmd"),
        sum(when(col("cmd_tsm") + col("duration_ms") > col("tsm"), 1L)
          .otherwise(0L)).as("n_overridden"),
        max(when(col("cmd_tsm") + col("duration_ms") > col("tsm"),
          col("ovr"))).as("max_active_ovr"))
      .orderBy(col("target_id"))
  }

  /** Scale-out as-of join for LOW-cardinality keys: [[asofJoin]]'s
    * single per-key window serializes each key's whole history through
    * one task — fine when key cardinality grows with the data, a
    * funnel when it doesn't (e.g. 8 drone targets at 100 TB). This
    * variant buckets time and fills in three stages, so parallelism is
    * keys × buckets instead of keys:
    *
    *  1. per (key, bucket): the last right row — a partial-aggregatable
    *     `max_by` (map-side combine, no sort);
    *  2. carry-in per bucket: a window over the per-bucket summaries
    *     ONLY (rows = #nonempty buckets per key — tiny regardless of
    *     input size);
    *  3. per (key, bucket) window over the raw rows, seeded with the
    *     carry-in — each bucket's fill is independent and parallel.
    *
    * Exact same semantics as [[asofJoin]] (backward-inclusive, right
    * before left at ties, `rightTieBreak` for equal right timestamps) —
    * asserted equal in JoinsSpec. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      rightTieBreak: String, bucketMs: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)
    val rightOrd = struct(col(rightTs), col(rightTieBreak))
    // stage 1: last right payload per (key, bucket)
    val bucketLast = right
      .withColumn("__bucket", col(rightTs) / lit(bucketMs))
      .withColumn("__bucket", floor(col("__bucket")).cast("long"))
      .groupBy(col(key), col("__bucket"))
      .agg(max_by(payload, rightOrd).as("__last"))
    // stage 2: carry-in = last right payload of any PRIOR bucket. Left
    // rows need the carry of their bucket even when the bucket has no
    // right rows, so the carry window runs over the union of left and
    // right bucket ids joined to the per-bucket summaries — a relation
    // with one row per (key, nonempty-or-probed bucket), tiny regardless
    // of input size.
    val leftBuckets = left
      .withColumn("__bucket", floor(col(leftTs) / lit(bucketMs)).cast("long"))
    val allBuckets = leftBuckets.select(col(key), col("__bucket")).distinct()
      .unionByName(bucketLast.select(col(key), col("__bucket")))
      .distinct()
    val seedW = Window.partitionBy(col(key)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = allBuckets
      .join(bucketLast.select(col(key), col("__bucket"), col("__last")),
        Seq(key, "__bucket"), "left")
      .withColumn("__seed", last(col("__last"), ignoreNulls = true).over(seedW))
      .select(col(key), col("__bucket"), col("__seed"))
    // stage 3: within-bucket fill over raw rows, seeded
    val l = leftBuckets
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(rightCols.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
      .select((Seq(key, "__bucket", "__ts", "__side", "__tie", "__p").map(col) ++
        leftCols.filterNot(_ == key).map(col)): _*)
    val r = right
      .withColumn("__bucket", floor(col(rightTs) / lit(bucketMs)).cast("long"))
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(rightTieBreak))
      .withColumn("__p", payload)
      .select((Seq(key, "__bucket", "__ts", "__side", "__tie", "__p").map(col) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val fillW = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__fill", last(col("__p"), ignoreNulls = true).over(fillW))
      .filter(col("__side") === 1)
      .join(seeds, Seq(key, "__bucket"), "left")
      .withColumn("__eff", coalesce(col("__fill"), col("__seed")))
    filled.select((Seq(key).map(col) ++ leftCols.filterNot(_ == key).map(col) ++
      rightCols.map(c => col(s"__eff.$c").as(c))): _*)
  }

  /** Skew-salted equi-join for fact-fact joins where a few hot keys
    * overwhelm their shuffle partition: each left row gets a
    * deterministic salt in `[0, salts)` derived from `saltFrom` (any
    * left column with spread — an event id, a timestamp), the right
    * side replicates ×`salts` via a literal-range explode, and the
    * join runs on `(key, salt)` — a hot key's rows spread over `salts`
    * tasks at the cost of replicating right-side rows.
    *
    * Posture: AQE's skew-join already splits oversized partitions at
    * runtime and should be the first answer; explicit salting is the
    * library form for EXTREME single-key skew (one key larger than a
    * task can sort/spill) or for engines/stages where AQE cannot
    * re-plan (e.g. a skewed stream-static join). Row-identical to the
    * plain join — asserted in JoinsSpec under a constructed 90%-one-key
    * skew. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFrom: Column, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val l = left.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join: orders banded by price via a broadcast
    * non-equi join against a small interval dimension — the pattern
    * for dimension lookups keyed by a range instead of a point. The
    * band table is tiny at any scale, so the join is a broadcast
    * nested-loop over 5 rows, never a shuffle. */
  def q38RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = Seq(
      ("nano", 0.0, 50000.0),
      ("small", 50000.0, 150000.0),
      ("mid", 150000.0, 300000.0),
      ("large", 300000.0, 450000.0),
      ("jumbo", 450000.0, 1000000000.0))
    import spark.implicits._
    val dim = bands.toDF("band", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(dim),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("band"))
  }

  val q38Sql: String =
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('nano', 0.0, 50000.0), ('small', 50000.0, 150000.0),
      |  ('mid', 150000.0, 300000.0), ('large', 300000.0, 450000.0),
      |  ('jumbo', 450000.0, 1000000000.0))
      |SELECT band, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  /** DuckDB twin of [[q37AsofJoin]] — same union-and-fill construction
    * (DuckDB's ASOF JOIN exists but pins different tie semantics; the
    * explicit window keeps both engines on identical rules). */
  val q37Sql: String = {
    val Ch = Channels.Sql
    s"""WITH fr AS (${Ch.frames}),
       |cm AS (${Ch.commands}),
       |u AS (
       |  SELECT target_id, tsm AS uts, 1 AS side, NULL::BIGINT AS tie, event_id, ch,
       |    NULL::BIGINT AS cmd_tsm, NULL::INT AS ovr, NULL::BIGINT AS duration_ms
       |  FROM fr
       |  UNION ALL
       |  SELECT target_id, tsm AS uts, 0 AS side, event_id AS tie, NULL, NULL,
       |    tsm, ovr, duration_ms
       |  FROM cm),
       |filled AS (
       |  SELECT *,
       |    last_value(cmd_tsm IGNORE NULLS) OVER w AS f_cmd_tsm,
       |    last_value(ovr IGNORE NULLS) OVER w AS f_ovr,
       |    last_value(duration_ms IGNORE NULLS) OVER w AS f_duration
       |  FROM u
       |  WINDOW w AS (PARTITION BY target_id ORDER BY uts, side, tie
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT target_id, count(*) AS n_frames,
       |  count(f_cmd_tsm) AS n_with_cmd,
       |  CAST(sum(CASE WHEN f_cmd_tsm + f_duration > uts THEN 1 ELSE 0 END) AS BIGINT) AS n_overridden,
       |  max(CASE WHEN f_cmd_tsm + f_duration > uts THEN f_ovr END) AS max_active_ovr
       |FROM filled WHERE side = 1
       |GROUP BY target_id
       |ORDER BY target_id""".stripMargin
  }
}
