package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General relational operator inventory (SURVEY.md §2.2) over the
  * TPC-H-ish testdata: hash aggregation, broadcast + shuffle joins,
  * semi/anti joins, window functions, top-k, set ops, rollup.
  *
  * Scale posture (100 TB): dimension tables (`region`, `nation`,
  * `supplier`, small `customer` slices) are explicitly `broadcast()`; the
  * fact-fact `lineitem ⋈ orders` join is left to Catalyst/AQE which picks
  * sort-merge on the shuffled orderkey — the natural co-partitioning key.
  * Filters are expressed directly on scan columns so they push into the
  * parquet reader (verified via `.explain("formatted")` — see
  * PLANS.md). Every query ends in a deterministic ORDER BY so results are
  * stable under any partitioning.
  *
  * The reference's join surface is point-lookup equi-joins
  * (`lib/TargetManager/TargetManager.h:66-135`) — generalized here to the
  * full relational join family per SURVEY.md §2.2.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: partial+final hash aggregation with
    * map-side combine (free from Catalyst). Mirrors reference A1 count
    * aggregate generalized (`lib/TargetManager/TargetManager.h:138`). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Customer ⋈ nation ⋈ region with broadcast dimensions (J1-style keyed
    * lookup at scale: dims are tiny, so broadcast-hash everywhere). */
  def q02RegionRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Fact-fact join lineitem ⋈ orders: shuffled sort-merge on orderkey
    * (AQE may switch to shuffled-hash; both scale-correct — co-partitioned
    * on the join key, no broadcast of a 100 TB side). */
  def q03RevenueByPriority(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-semi join (EXISTS): orders having a discounted lineitem.
    * Mirrors the reference's target-exists check
    * (`src/transmitter/main.cpp:163-169`) as a set-level operation. */
  def q04SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val disc = Tables.lineitem(spark, dir)
      .filter(col("l_discount") > lit(0.05))
      .select(col("l_orderkey"))
    o.join(disc, o("o_orderkey") === disc("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Left-anti join (NOT EXISTS): customers with no large order — the
    * missing-target error path (`src/transmitter/main.cpp:164-169`) as a
    * relational anti-join. */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(400000.0))
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q6-style selective scan: all predicates sit directly on scan
    * columns → pushed into the parquet reader (PushedFilters). */
  def q06FilterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < lit(24))
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Top-k per group via row_number window — the scalable per-key top-k
    * (single shuffle on the partition key, no global sort). */
  def q07TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Running (prefix) aggregate per key — generalizes the reference's
    * cumulative state view; rowsBetween unbounded-preceding frame. */
  def q08RunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Global top-k: aggregate then orderBy+limit — the final sort is on an
    * already-reduced (one row per customer) relation, so a total order is
    * affordable at any scale. */
  def q09TopCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)

  /** Set operation: EXCEPT (distinct) — customers holding orders minus the
    * BUILDING segment. Mirrors snapshot-diff semantics (targets in tick A
    * but not B, SURVEY.md §2.2 set-ops row). */
  def q10SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val withOrders = c.join(
      Tables.orders(spark, dir).select(col("o_custkey")),
      c("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
    val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    withOrders.except(building)
      .agg(count(lit(1)).as("n_customers"),
        min(col("c_custkey")).as("min_key"),
        max(col("c_custkey")).as("max_key"))
  }

  /** ROLLUP hierarchical aggregate with GROUPING markers (telemetry
    * rollups per SURVEY.md §2.2 aggregation row). */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_lines"),
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** Exact distinct aggregation (expand + two-phase agg under the hood);
    * the approximate HLL twin is [[q36ApproxDistinct]]. */
  def q12DistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("event_type"))

  /** CUBE aggregation — all grouping-set combinations with GROUPING
    * markers (completes the grouping-sets family next to q11's
    * ROLLUP). */
  def q39Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n_lines"),
        grouping(col("l_returnflag")).as("g_flag"),
        grouping(col("l_linestatus")).as("g_status"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** Approximate distinct via HyperLogLog++ — the 100 TB path for q12:
    * constant-size sketches with map-side partial merge instead of the
    * exact distinct's expand+re-shuffle. HLL sketch VALUES are
    * engine-specific (DuckDB's estimator differs), so the hashable
    * output carries the sketch's verifiable CONTRACT instead of its
    * raw estimate: `approx_within_5pct` asserts the HLL estimate
    * (rsd = 2%) lands within 5% of the exact per-group count, and the
    * oracle pins that to TRUE alongside the exact counts — turning the
    * accuracy bound itself into the oracle-checked row. The raw
    * estimate is additionally bound-tested in RelationalSpec. */
  def q36ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_approx"),
        countDistinct(col("user_id")).as("n_users_exact"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_users_exact"), col("n_events"),
        (abs(col("n_approx") - col("n_users_exact")) <=
          col("n_users_exact") * 0.05).as("approx_within_5pct"))
      .orderBy(col("event_type"))

  /** Exact continuous percentiles per group (the quantile operator
    * family): median/p90/p99 of extended price per return flag. Exact
    * `percentile` shuffles the group's values once and interpolates —
    * matched by DuckDB `quantile_cont`; at 100 TB the same query runs
    * with `approx_percentile` (t-digest-style sketch, constant-size
    * partial merge) — the approximate twin is engine-specific (no hash
    * oracle), so the exact form carries the correctness row and the
    * approximate path is bound-tested in RelationalSpec. */
  def q42Percentiles(spark: SparkSession, dir: String): DataFrame = {
    // Interpolation arithmetic is EXPLICIT and engine-shared: built-in
    // `percentile` vs `quantile_cont` use the same definition but
    // ulp-different formulas (a + (b−a)·f vs (1−f)·a + f·b), and a
    // value landing on a half-cent rounding boundary then rounds to
    // different cents (bit sf0.001's p50). Here BOTH engines evaluate
    // the IDENTICAL expression tree — h = (n−1)·f, integer-cent
    // neighbours from the sorted array, a + (b−a)·(h−⌊h⌋) — over
    // identical inputs, so every intermediate double is bit-equal and
    // the final rounding agrees by construction. One sorted value
    // buffer per group serves all three quantiles (the built-in array
    // form had the same single-buffer property; the exact operator
    // inherently holds the group's multiset — approx_percentile is the
    // 100 TB sketch path, bound-tested in RelationalSpec).
    def q(f: Double): Column = {
      val h = (col("n_lines") - 1).cast("double") * f
      val lo = floor(h)
      val a = element_at(col("vs"), lo.cast("int") + 1)
      val b = element_at(col("vs"),
        least(lo.cast("int") + 2, col("n_lines").cast("int")))
      round((a + (b - a) * (h - lo)) / 100, 2)
    }
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sort_array(collect_list(round(col("l_extendedprice") * 100))).as("vs"))
      .select(col("l_returnflag"), col("n_lines"),
        q(0.5).as("p50"), q(0.9).as("p90"), q(0.99).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  /** The 100 TB quantile path — q42's approximate twin: per-group
    * `approx_percentile` (Greenwald–Khanna sketch; constant-size state,
    * map-side partial merge — no per-group value buffer, unlike q42's
    * exact `collect_list`, the suite's one remaining unbounded-state
    * aggregate). Sketch OUTPUTS are engine-specific (DuckDB's
    * `approx_quantile` is a different sketch), so — exactly like q36's
    * HLL row — the hashable output carries the sketch's verifiable
    * CONTRACT, not its raw estimate: GK with accuracy `a` returns an
    * actual data element whose rank is within `n/a` of the target
    * rank, so each `p*_in_bound` column asserts the estimate's rank
    * interval intersects `target ± (⌈n/a⌉ + 1)` and the oracle pins
    * TRUE.
    *
    * The rank CHECK is itself constant-state: the 3-row sketch
    * relation broadcasts back onto the fact table and a second hash
    * aggregation counts values strictly below / at-most each estimate
    * (`estimate ≥ vs[lo] ⟺ atmost ≥ lo`; `estimate ≤ vs[hi] ⟺
    * below + 1 ≤ hi` — the identical bound, without materializing the
    * per-group sorted buffer an order-statistics lookup would need).
    * Two scans, one broadcast, map-side partials throughout — nothing
    * in the plan holds more than the sketch per group at 100 TB. */
  def q60ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val acc = 10000 // rank error <= n/10000, ~2 ranks per group at sf0.01
    // The sketch feeds BOTH the broadcast rank check and the final join
    // with DIFFERENT projections, which defeats subtree reuse —
    // re-derived, each consumer re-runs the full sketch scan and the
    // query pays three lineitem passes instead of two. It is collected
    // into a LOCAL relation rather than persisted: the aggregate is one
    // row per l_returnflag (3 at any corpus size — bounded by the
    // domain, not the data), and a persisted copy referenced by the
    // returned plan can never be released before the caller executes
    // (ADVICE r10: each bench repeat leaked the cached sketch + its
    // lineage for the session's lifetime). A 3-row driver collect is
    // the same bounded-snapshot discipline as the telemetry registry.
    val sketchAgg = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(acc)).as("ap"))
    val sketch = spark.createDataFrame(
      java.util.Arrays.asList(sketchAgg.collect(): _*), sketchAgg.schema)
    def cmp(i: Int, strict: Boolean): Column = {
      val est = element_at(col("ap"), i)
      val hit = if (strict) col("l_extendedprice") < est
                else col("l_extendedprice") <= est
      sum(when(hit, 1L).otherwise(0L))
    }
    val counts = Tables.lineitem(spark, dir)
      .join(broadcast(sketch.select(col("l_returnflag"), col("ap"))),
        "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(cmp(1, strict = true).as("below_1"), cmp(1, strict = false).as("atmost_1"),
        cmp(2, strict = true).as("below_2"), cmp(2, strict = false).as("atmost_2"),
        cmp(3, strict = true).as("below_3"), cmp(3, strict = false).as("atmost_3"))
    def inBound(i: Int, f: Double): Column = {
      val n = col("n_lines").cast("double")
      val target = ceil(n * f)
      val margin = ceil(n / acc) + 1 // +1: half-open target-rank slack
      val loRank = greatest(lit(1.0), target - margin)
      val hiRank = least(n, target + margin)
      (col(s"atmost_$i") >= loRank) && (col(s"below_$i") + 1 <= hiRank)
    }
    sketch.join(counts, "l_returnflag")
      .select(col("l_returnflag"), col("n_lines"),
        inBound(1, 0.5).as("p50_in_bound"),
        inBound(2, 0.9).as("p90_in_bound"),
        inBound(3, 0.99).as("p99_in_bound"))
      .orderBy(col("l_returnflag"))
  }

  /** Statistical moment aggregates — the correlation/variance family
    * the rest of the suite doesn't touch: Pearson corr, sample stddev,
    * and sample covariance per group. All three are single-pass
    * co-moment aggregations (Welford/M2-style partial + merge) in both
    * engines, so they partial-aggregate map-side and hold O(1) state
    * per group at any scale; the rounding (6 for the scale-free corr,
    * 2 for the dimensioned moments) absorbs the cross-engine ulp drift
    * of the differing merge orders. */
  def q65StatsMoments(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qty_price_covar"))
      .orderBy(col("l_returnflag"))

  /** Linear-regression aggregates — ordinary least squares per group
    * (`regr_slope`/`regr_intercept`/`regr_r2`), closing out the
    * moment-aggregate family with q65: same single-pass co-moment
    * machinery (slope = covar/var), O(1) state per group, map-side
    * partials. The r² is scale-free (rounded 6); the dimensioned
    * slope/intercept round to 2. */
  def q67Regression(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  /** PIVOT — long-to-wide reshaping with an explicit value list (the
    * unbounded-cardinality form is an anti-pattern at scale: Spark
    * would first scan to discover values, then build a column per
    * value; pinning the five event types keeps the plan a single
    * conditional aggregation). Oracle: the relational expansion
    * (one `sum(CASE WHEN ...)` per pivoted column) — what the pivot
    * operator compiles to. */
  def q44Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_bucket"))

  /** UNPIVOT — wide-to-long reshaping (the inverse of q44): per-part
    * size/retail columns melt into (measure, value) rows. Compiles to
    * an Expand node (one output row per measure per input row) — pure
    * map-side, no shuffle until the rollup. Oracle: the UNION ALL
    * expansion unpivot is sugar for. */
  def q45Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").cast("double").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("value")), 2).as("avg_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy(col("measure"))

  /** Ordered event-sequence funnel — view → click → purchase with
    * strict temporal order per user (a click only counts AFTER the
    * user's first view, a purchase only after that click): the
    * conversion analysis every event warehouse runs, and a sequence
    * constraint plain per-type counts cannot express. Each stage is a
    * min-timestamp aggregation of the previous stage's survivors, so
    * the per-stage relations shrink monotonically; the report is one
    * row per stage with users reached, conversion vs the funnel head,
    * and mean dwell from the previous stage.
    *
    * Scale posture (100 TB): ONE events scan, ONE `user_id`
    * partitioning. The naive form — a filtered aggregate per stage
    * with join-backs — scans the corpus three times and re-exchanges
    * each stage (measured: 10 exchanges); instead the three stage
    * timestamps resolve as cascaded whole-partition window minima over
    * the single user partition (each stage's predicate reads the
    * previous stage's column — no ORDER BY, no event sort, and the
    * per-user buffering is the accepted q21/q43 bound: a user's own
    * activity, not the corpus). One groupBy on the same partitioning
    * (zero extra exchange) reduces to a user row, one global rollup
    * derives every stage count and dwell in a single pass, and the
    * 3-row report explodes from that one row — 3 exchanges total. */
  def q77Funnel(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val staged = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("tsm"))
      .withColumn("view_ms", min(when(col("event_type") === "view",
        col("tsm"))).over(byUser))
      .withColumn("click_ms", min(when(col("event_type") === "click" &&
        col("tsm") >= col("view_ms"), col("tsm"))).over(byUser))
      .withColumn("purchase_ms", min(when(col("event_type") === "purchase" &&
        col("tsm") >= col("click_ms"), col("tsm"))).over(byUser))
    val perUser = staged.groupBy(col("user_id"))
      .agg(min(col("view_ms")).as("view_ms"),
        min(col("click_ms")).as("click_ms"),
        min(col("purchase_ms")).as("purchase_ms"))
    // one row: every stage count and dwell (count/avg skip nulls, so
    // each column naturally ranges over that stage's survivors)
    val rollup = perUser.agg(
      count(col("view_ms")).as("n_view"),
      count(col("click_ms")).as("n_click"),
      count(col("purchase_ms")).as("n_purchase"),
      round(avg(col("click_ms") - col("view_ms")), 2).as("click_dwell"),
      round(avg(col("purchase_ms") - col("click_ms")), 2).as("purchase_dwell"))
    rollup
      .select(explode(array(
        struct(lit("1_view").as("stage"), col("n_view").as("n_users"),
          lit(null).cast("double").as("avg_ms_from_prev")),
        struct(lit("2_click").as("stage"), col("n_click").as("n_users"),
          col("click_dwell").as("avg_ms_from_prev")),
        struct(lit("3_purchase").as("stage"), col("n_purchase").as("n_users"),
          col("purchase_dwell").as("avg_ms_from_prev")))).as("s"),
        col("n_view").as("head_users"))
      .select(col("s.stage").as("stage"), col("s.n_users").as("n_users"),
        round(col("s.n_users").cast("double") / col("head_users"), 6)
          .as("conv_pct"),
        col("s.avg_ms_from_prev").as("avg_ms_from_prev"))
      .orderBy(col("stage"))
  }

  /** Cohort retention — users grouped by the epoch-week of their FIRST
    * event, tracked by how many return in each subsequent week: the
    * standard retention triangle. Weeks are integer epoch-week indices
    * (`tsm div 604800000` — exact int64 arithmetic, no calendar or
    * timezone dependence between engines).
    *
    * Scale posture (100 TB): ONE events scan. The cohort assignment
    * resolves as a whole-partition window min over the single
    * `user_id` partitioning (the q77 discipline — a join-back against
    * a separately-aggregated first-event relation would scan the
    * corpus twice); the distinct-user count per (cohort, offset) then
    * exchanges on the triangle key. Cohort sizes come from the
    * triangle itself — every user is active in their own first week,
    * so the offset-0 row IS the cohort size, read back by a window
    * over the ≤ |weeks|²/2-row result (bounded by the time span, not
    * the data) instead of a second corpus aggregation. */
  def q78CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekMs = 604800000L
    // integer `div`, not `/`: long `/` is double division in Spark and
    // a last-ulp rounding at an exact week boundary would shift the
    // cohort index vs DuckDB's integer `//`
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("tsm"))
      .select(col("user_id"), expr(s"tsm div $weekMs").as("week"))
    val triangle = e
      .withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy(col("user_id"))))
      .select(col("user_id"), col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    triangle
      .withColumn("cohort_size", max(when(col("week_offset") === 0,
        col("n_active"))).over(Window.partitionBy(col("cohort_week"))))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention_pct"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Equi-width histogram — numeric binning of extended price into
    * $10,000 buckets with per-bucket share: the profiling/skew-
    * diagnosis primitive (and the building block BI range filters
    * compile to). Bucket assignment is integer-exact: prices carry two
    * decimals, so `round(price·100)` is an exact integer of cents
    * (the q42 convention) and the bucket is one int64 floor-division —
    * no float boundary can flip a row between engines.
    *
    * Scale posture (100 TB): one scan, map-side partial counts into
    * ≤ range/width buckets (the aggregate's key space is bounded by
    * the VALUE RANGE, not the data — the histogram never grows);
    * the share denominator comes from a global window over the
    * ≤ dozen-row bucket relation (the q59/q78 bounded-relation
    * acceptance), not a second scan. */
  def q82Histogram(spark: SparkSession, dir: String): DataFrame = {
    val widthCents = 1000000L // $10,000 buckets
    val buckets = Tables.lineitem(spark, dir)
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .select(expr(s"cents div $widthCents").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_lines"))
    buckets
      .withColumn("total", sum(col("n_lines")).over(
        Window.partitionBy(lit(1))))
      .select(col("bucket"),
        (col("bucket") * 10000).as("lo_dollars"),
        ((col("bucket") + 1) * 10000).as("hi_dollars"),
        col("n_lines"),
        round(col("n_lines").cast("double") / col("total"), 6).as("pct"))
      .orderBy(col("bucket"))
  }

  /** Co-occurrence mining — the market-basket primitive: which
    * supplier PAIRS appear together inside the same order, ranked by
    * order count. The naive form is a self-join of line items on the
    * order key — a row-blowup hazard with no bound; here each order
    * reduces to its sorted distinct supplier set first (one exchange,
    * map-side partial `collect_set`), and the pair expansion happens
    * INSIDE the row as an array transform — bounded by the order's own
    * width (≤ 7 line items in TPC-H-shaped data, ≤ k²/2 pairs), never
    * by the corpus.
    *
    * Scale posture (100 TB): one exchange on the order key, one on the
    * pair key (partial-aggregated counts), and a TakeOrdered top-20 —
    * no join at all. A pathologically wide basket bounds its own cost
    * (pairs grow with basket width squared, not with data volume), and
    * the pair-count relation is capped by the supplier-pair universe,
    * not the order count. */
  def q83CoOccurrence(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    // r22 (guide §4): the nested-HOF pair expansion evaluated
    // interpreted and sliced a fresh suffix copy per element; the
    // native ordered_pairs pass emits identical pair structs compiled
    val pairs = sets.select(explode(
      graft.expressions.PairFunctions.orderedPairs(col("ss"))).as("p"))
    pairs.groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("s1"), col("s2"))
      .limit(20)
  }

  /** Single-scan data profiling — the validation pass every ingest
    * runs before trusting 100 TB of new data (the deequ/data-quality
    * primitive): per column, null count, exact distinct count, and
    * numeric min/max, ALL from one pass over the table. The metrics
    * compute in one aggregate (Catalyst plans the multi-distinct via
    * one expand — the scan is read once, the expansion is in-memory
    * row replication, never extra I/O) and unpivot to one row per
    * column via `stack`. Non-numeric columns carry NULL min/max
    * (lexicographic string extremes are formatting-dependent across
    * engines and profile consumers read them as ranges, not
    * orderings); integral columns surface exactly as doubles (< 2^53).
    *
    * Scale shape: the expand multiplies rows ×|columns| between scan
    * and partial aggregation — map-side, bounded by the column count —
    * and the exchanges carry only partial-aggregate states. */
  def q94Profile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("tsm"), col("props")))

  /** The general profiling API behind q94: profile ANY relation in one
    * scan. Numeric columns (integral within 2^53, floating) surface
    * exact min/max as doubles; everything else carries NULL extremes.
    * Columns whose type supports no equality comparison (maps, and
    * anything nested containing one) carry a NULL distinct count —
    * `count_distinct` over a MapType fails at ANALYSIS time, so the
    * capability is decided from the schema up front instead of letting
    * the whole profile throw on one column. One multi-distinct
    * aggregate → stack unpivot; see [[q94Profile]] for the plan
    * shape. */
  def profile(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    // metric aliases and the stack() expression embed column names —
    // fail loudly on names that would need quoting rather than emit a
    // broken expression
    df.schema.fieldNames.foreach(n => require(
      n.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"profile: column name '$n' needs quoting — rename before profiling"))
    def distinctable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => distinctable(et)
      case StructType(fs) => fs.forall(f => distinctable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.map { f =>
      (f.name,
        f.dataType match { case _: NumericType => true; case _ => false },
        distinctable(f.dataType))
    }.toSeq
    def m(c: String, numeric: Boolean, dist: Boolean) = Seq(
      count(col(c)).as(s"nn_$c"),
      (if (dist) count_distinct(col(c))
       else lit(null).cast("long")).as(s"nd_$c")) ++ (
      if (numeric) Seq(min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
      else Seq(lit(null).cast("double").as(s"min_$c"),
        lit(null).cast("double").as(s"max_$c")))
    val metrics = count(lit(1)).as("n") +:
      cols.flatMap { case (c, num, dist) => m(c, num, dist) }
    val a = df.agg(metrics.head, metrics.tail: _*)
    val stackArgs = cols.map { case (c, _, _) =>
      s"'$c', n, n - nn_$c, nd_$c, min_$c, max_$c"
    }.mkString(", ")
    a.select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"))
      .orderBy(col("col_name"))
  }

  /** Rank-distribution window functions — the family q07/q08/q43's
    * rank/rows/range frames don't cover: every event positioned within
    * its type's value distribution by `percent_rank` (rank share),
    * `cume_dist` (CDF), and `ntile(10)` (decile by row order). The
    * window orders by `(value, event_id)` so tie placement — and with
    * it every ntile boundary — is deterministic and engine-identical.
    *
    * Scale shape: ONE exchange (the per-type window partitioning —
    * parallelism grows with the type cardinality; within a partition
    * the three functions share one sort) + the result sort. Rank
    * shares round to 6 decimals so both engines cut identically. */
  def q96RankDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdf"),
        ntile(10).over(w).as("decile"))
      .orderBy(col("event_type"), col("value"), col("event_id"))
  }

  /** Exponentially weighted moving average per user — the time-series
    * smoothing primitive with genuinely SEQUENTIAL semantics: s_i =
    * α·v_i + (1−α)·s_{i−1} is a left fold over the ordered series,
    * which no plain window aggregate expresses (the closed-form
    * power-weight rewrite is numerically explosive on long series).
    * Implemented as an in-row `aggregate` fold over each user's
    * time-ordered values, seeded with the first observation.
    *
    * Scale shape: one user-key exchange into a per-user array — the
    * q42 per-group multiset acceptance: a user's own history bounds
    * the row, parallelism grows with the user population, and the
    * fold is an in-row scan, not a second exchange. Both engines fold
    * the IDENTICAL ordered doubles with the identical α expression
    * (α = 0.25 exactly representable; DuckDB's bare decimal literals
    * must cast to DOUBLE — the q42/q89 lesson — or the fold runs in
    * truncating decimal arithmetic), so every intermediate is
    * bit-equal and the 6-decimal rounding agrees by construction. */
  def q95Ewma(spark: SparkSession, dir: String): DataFrame = {
    val alpha = 0.25
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("tsm"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(
          struct(col("tsm"), col("event_id"), col("value")))).as("es"))
      .select(col("user_id"), col("n_events"),
        round(aggregate(
          expr("slice(es, 2, size(es) - 1)"),
          col("es").getItem(0).getField("value"),
          (acc, e) => lit(alpha) * e.getField("value") +
            lit(1 - alpha) * acc), 6).as("ewma"))
      .orderBy(col("user_id"))
  }

  /** Association-rule mining over the q83 baskets — the step after
    * co-occurrence counting in the market-basket family: each supplier
    * pair is scored with support (joint order share), directional
    * confidence (P(s2|s1), P(s1|s2)) and lift (observed joint vs
    * independence), and the top 20 rules by lift survive. Lift needs
    * three count relations (pairs, singles, the order total); all
    * three derive from ONE pass over the distinct (order, supplier)
    * relation.
    *
    * Scale posture (100 TB): the pair relation is the q83 in-row
    * expansion (bounded by basket width, never a self-join); the
    * single-item counts are ≤|supplier| rows and BROADCAST into the
    * pair relation twice; the order total is a broadcast one-row
    * relation. No exchange in the plan carries more than the
    * supplier-pair universe, and the top-20 is TakeOrdered — no
    * global sort. Scores are 6-decimal-rounded so both engines rank
    * and cut identically (lift ties break on the pair key). */
  def q93AssociationRules(spark: SparkSession, dir: String): DataFrame = {
    val os = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val total = os.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).cast("double").as("n_orders"))
    val singles = os.groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
    val sets = os.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
    // r22: the native ordered_pairs pass (see q83) — identical pairs
    val pairs = sets.select(explode(
      graft.expressions.PairFunctions.orderedPairs(col("ss"))).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(singles.select(col("l_suppkey").as("s1"), col("c").as("c1"))), "s1")
      .join(broadcast(singles.select(col("l_suppkey").as("s2"), col("c").as("c2"))), "s2")
      .crossJoin(broadcast(total))
      .select(col("s1"), col("s2"), col("n").as("n_joint"),
        round(col("n") / col("n_orders"), 6).as("support"),
        round(col("n") / col("c1"), 6).as("conf_s1_s2"),
        round(col("n") / col("c2"), 6).as("conf_s2_s1"),
        round(col("n") * col("n_orders") / (col("c1") * col("c2")), 6).as("lift"))
      .orderBy(col("lift").desc, col("s1"), col("s2"))
      .limit(20)
  }

  /** Time-range window frame: 30-day trailing spend per customer —
    * `rangeBetween` over the order timestamp (in seconds), a frame the
    * row-count family (q08) can't express. Partitioned by customer, so
    * window parallelism grows with the data. */
  def q43RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val secs = unix_timestamp(col("o_orderdate"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(secs)
      .rangeBetween(-30L * 86400 + 1, Window.currentRow)
    // both window aggregates in ONE select: an intermediate projection
    // between two .withColumn windows blocks CollapseWindow and the
    // plan pays two Sort+Window passes for one frame
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        round(sum(col("o_totalprice")).over(w), 2).as("trailing_30d_spend"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Robust outlier detection — median/MAD z-scores per event type
    * (the Iglewicz–Hoaglin robust alternative to mean/stddev flagging,
    * which a single extreme value corrupts): a value is an outlier when
    * |x − median| exceeds 3·1.4826·MAD (1.4826 scales MAD to σ under
    * normality). Median and MAD are EXACT interpolated medians,
    * inherently two-pass: the per-type median must exist before
    * deviations can be ranked — no single-aggregate form computes
    * both.
    *
    * Scale shape: two aggregates over the events scan plus one final
    * count — three passes, each a map-side-partial hash aggregate into
    * a ≤|event_type| key space; the per-type medians and MADs travel as
    * BROADCAST one-row-per-type relations, so no pass shuffles event
    * rows by anything but the scan's own partitioning. The cut
    * compares 6-decimal-rounded deviation against 6-decimal-rounded
    * threshold so both engines flag the identical rows. */
  def q89RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    // median via the q42 discipline: EXPLICIT engine-shared
    // interpolation (a + (b−a)·(h−⌊h⌋) over the sorted list) — the
    // built-in `percentile` and DuckDB's `quantile_cont` differ by an
    // ulp on even-count groups and a 6-decimal rounding boundary can
    // then flip a flag. Exact medians inherently hold the group's
    // multiset (q42's acceptance); approx_percentile is the 100 TB
    // sketch path, already bound-tested for q60.
    def medianOfSorted(vs: Column, n: Column): Column = {
      val h = (n - 1).cast("double") * 0.5
      val lo = floor(h)
      val a = element_at(vs, lo.cast("int") + 1)
      val b = element_at(vs, least(lo.cast("int") + 2, n.cast("int")))
      a + (b - a) * (h - lo)
    }
    val e = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("value"))).as("vs"))
      .select(col("event_type"), col("n_events"),
        medianOfSorted(col("vs"), col("n_events")).as("med"))
    val dev = e.join(broadcast(med), "event_type")
    val mad = dev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_mad"),
        sort_array(collect_list(abs(col("value") - col("med")))).as("vs"))
      .select(col("event_type"),
        medianOfSorted(col("vs"), col("n_mad")).as("mad"))
    // 4.4478 = 3 · 1.4826 written as ONE decimal literal: both engines
    // parse it to the identical double, where 3.0 * 1.4826 evaluated in
    // DuckDB's decimal arithmetic could differ from Scala's binary
    // product by an ulp (the q42 cast-the-fraction lesson)
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n_events")).as("n_events"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        sum(when(round(abs(col("value") - col("med")), 6) >
          round(lit(4.4478) * col("mad"), 6), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences — the sequence-mining primitive behind session-flow and
    * next-action models: every consecutive (src → dst) event-type pair
    * in a user's timeline is counted, and each source row is
    * normalized to a transition probability.
    *
    * Scale shape: ONE exchange (the per-user window sort, partitioned
    * by user so parallelism grows with the user population), one
    * map-side-partial count into the ≤|types|² key space, and a window
    * over that bounded relation for the normalizer (the q82
    * bounded-relation acceptance). Ties in a user's timeline order by
    * the unique event id, so both engines fold the identical
    * sequence. */
  def q90TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsm"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tsm"))
      .select(col("event_type").as("dst"),
        lag(col("event_type"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
    val counts = pairs.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))), 6))
      .orderBy(col("src"), col("dst"))
  }

  /** Time-weighted average (TWAP) per user — the irregular-series
    * aggregate where plain `avg` is wrong by construction: events
    * arrive unevenly, so each value must be weighted by how long it
    * held. Trapezoidal integration between consecutive events
    * (the continuous counterpart of q84's lerp: the integral of the
    * piecewise-linear interpolant), divided by the user's observed
    * span. Users with a single event (or an all-ties span of zero)
    * carry no interval and are excluded — stated, not defaulted.
    *
    * Scale shape: one per-user window exchange for the lag pair, then
    * a per-user aggregate on the SAME key — Catalyst reuses the
    * partitioning, so the plan pays one shuffle total. Zero-width
    * intervals (timestamp ties) contribute zero area and are ordered
    * deterministically by event id. */
  def q92Twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsm"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("tsm"))
      .select(col("user_id"), col("value"), col("tsm"),
        lag(col("value"), 1).over(w).as("pv"),
        lag(col("tsm"), 1).over(w).as("pt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("pt").isNotNull,
          (col("value") + col("pv")) / 2.0 * (col("tsm") - col("pt")))
          .otherwise(0.0)).as("area"),
        (max(col("tsm")) - min(col("tsm"))).as("span"))
      .filter(col("span") > 0L)
      .select(col("user_id"), col("n_events"),
        round(col("area") / col("span"), 6).as("twap"))
      .orderBy(col("user_id"))
  }
  /** §2.2 — autocorrelation diagnostics: per event-type Pearson
    * autocorrelation of the time-ordered value series at lags 1–3, the
    * serial-dependence view the pointwise moment family (q65 corr,
    * q67 OLS, q95 EWMA) cannot give — "is this metric momentum or
    * noise" is an ACF question. The series order is the deterministic
    * (tsm, event_id) total order used everywhere; Pearson r is
    * scale-free, so the sample/population variance convention cancels
    * and both engines agree through round-6.
    *
    * Scale posture (100 TB): ONE per-type window sort yields all three
    * lag columns; the correlations are partial-aggregated co-moments
    * (count/sum/product sums — O(1) state per (type, lag)); result is
    * 3·|types| rows. The stack unpivot is in-row. */
  def q105Autocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("tsm"), col("event_id"))
    val lagged = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        unix_millis(col("ts")).as("tsm"), col("event_id"))
      .select(col("event_type"), col("value"),
        lag(col("value"), 1).over(w).as("l1"),
        lag(col("value"), 2).over(w).as("l2"),
        lag(col("value"), 3).over(w).as("l3"))
    lagged.groupBy(col("event_type")).agg(
        count(col("l1")).as("n1"), round(corr(col("value"), col("l1")), 6).as("a1"),
        count(col("l2")).as("n2"), round(corr(col("value"), col("l2")), 6).as("a2"),
        count(col("l3")).as("n3"), round(corr(col("value"), col("l3")), 6).as("a3"))
      .select(col("event_type"), expr(
        "stack(3, 1, n1, a1, 2, n2, a2, 3, n3, a3) as (lag, n_pairs, acf)"))
      .select(col("event_type"), col("lag").cast("int").as("lag"),
        col("n_pairs"), col("acf"))
      .orderBy(col("event_type"), col("lag"))
  }
  /** §2.2 — multi-touch attribution credit: the batch rollup over the
    * SAME pair relation [[graft.streaming.Attribution]] emits live.
    * For every purchase, the same user's views in the preceding 4 h
    * share the conversion's credit three ways at once: first-touch and
    * last-touch flags, and linear shares in integer MICRO-units
    * (`10^6 div n`, remainder to the first touch) so each conversion's
    * shares sum to EXACTLY 10^6 — no float credit ever drifts.
    *
    * Scale posture (100 TB): the join is EQUI on `user_id` with the
    * range condition as a post-filter — a plain shuffled hash/SMJ on
    * the user key, never a cross product; the credit windows partition
    * by `conv_id` over each conversion's own O(horizon) pair group.
    * AttributionSpec ties the live join to this relation; the credit
    * arithmetic is integer-exact both engines. */
  def q108AttributionCredit(spark: SparkSession, dir: String): DataFrame = {
    val horizonMs = 14400000L
    val e = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("tsm"))
    val imp = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("imp_id"),
        col("tsm").as("imp_ts"))
    val conv = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("tsm").as("conv_ts"))
    val byConv = Window.partitionBy(col("conv_id"))
    imp.join(conv, Seq("user_id"))
      .filter(col("conv_ts") > col("imp_ts") &&
        col("conv_ts") <= col("imp_ts") + horizonMs)
      .withColumn("n_imps", count(lit(1)).over(byConv))
      .withColumn("rk", row_number().over(
        byConv.orderBy(col("imp_ts"), col("imp_id"))))
      .select(col("conv_id"), col("imp_id"), col("n_imps"),
        (col("rk") === 1).as("is_first"),
        (col("rk") === col("n_imps")).as("is_last"),
        (expr("1000000 div n_imps") +
          when(col("rk") === 1, expr("1000000 % n_imps")).otherwise(0L))
          .cast("long").as("credit_e6"))
      .orderBy(col("conv_id"), col("imp_id"))
  }
}
