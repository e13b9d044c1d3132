package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relational-inventory invariants not covered by the DuckDB hash gate. */
class RelationalSpec extends SparkSpec {

  test("q36 approx distinct stays within 5% of the exact count per group") {
    // the raw HLL estimate, bound-checked directly (q36's hashable
    // output carries the boolean contract, not the estimate)
    val exact = Relational.q12DistinctUsers(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e")
    }
    // and the query's own contract column agrees
    val rows = Relational.q36ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)}: approx_within_5pct false")
      assert(r.getLong(1) == exact(r.getString(0)))
    }
  }

  test("q60 approx percentiles: GK rank contract holds, estimates near exact") {
    // the query's own contract columns (what the oracle pins TRUE)
    val rows = Relational.q60ApproxPercentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (2 to 4).foreach(i => assert(r.getBoolean(i),
        s"${r.getString(0)}: in_bound column $i false"))
    }
    // cross-check the sketch against q42's exact interpolated
    // percentiles: a GK estimate (an actual element at rank error
    // <= n/acc) must land within 1% of the exact p50 on this data
    val exact = Relational.q42Percentiles(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val approx = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)) / exact(k) <= 0.01,
        s"$k: sketch p50 $a vs exact ${exact(k)}")
    }
  }

  test("q65 stats moments: corr in [-1,1], stddev consistent with covar identity") {
    val rows = Relational.q65StatsMoments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (corr, sd, cov) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
      assert(sd > 0.0, "price variance must be positive on this data")
      // corr = covar / (sd_q * sd_p): recompute sd_q and cross-check
      val sdQ = graft.Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === r.getString(0))
        .agg(stddev_samp(col("l_quantity"))).head().getDouble(0)
      assert(math.abs(corr - cov / (sdQ * sd)) < 1e-2,
        s"${r.getString(0)}: corr $corr vs identity ${cov / (sdQ * sd)}")
    }
  }

  test("q67 regression: OLS identities hold against the moment aggregates") {
    val moments = Relational.q65StatsMoments(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val rows = Relational.q67Regression(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (flag, slope, r2) = (r.getString(0), r.getDouble(2), r.getDouble(4))
      val (corr, _, cov) = moments(flag)
      assert(r2 >= 0.0 && r2 <= 1.0)
      // r2 = corr^2 for simple OLS
      assert(math.abs(r2 - corr * corr) < 1e-4, s"$flag: r2 $r2 vs corr² ${corr * corr}")
      // slope = covar / var(x): recompute var(x) and cross-check
      val varQ = graft.Tables.lineitem(spark, sfDir)
        .filter(col("l_returnflag") === flag)
        .agg(var_samp(col("l_quantity"))).head().getDouble(0)
      assert(math.abs(slope - cov / varQ) < 1e-1, s"$flag: slope $slope vs ${cov / varQ}")
    }
  }

  test("q09 top customers: exactly 10, strictly ordered by revenue") {
    val rows = Relational.q09TopCustomers(spark, sfDir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q35 set ops: union >= intersect, except <= base") {
    val m = Reference.q35SetOps(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("union") >= m("intersect"))
    assert(m("union") >= m("except"))
  }

  test("q42 percentiles are ordered and the approximate (sketch) path stays within 1%") {
    val exact = Relational.q42Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    exact.values.foreach { case (p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
    }
    // the 100 TB path: approx_percentile's constant-size sketch must
    // track the exact interpolated quantiles closely at this accuracy
    val approx = graft.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (flag, (p50, p90, p99)) =>
      val ap = approx(flag)
      Seq(p50, p90, p99).zip(ap).foreach { case (e, a) =>
        assert(math.abs(a - e) / e < 0.01, s"$flag: exact $e vs approx $a")
      }
    }
  }

  test("q43 trailing window: spend includes the current order and only looks back") {
    val rows = Relational.q43RollingWindow(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per customer, the first order's trailing spend equals its own price
    val first = rows.groupBy(_.getLong(0)).values.map(_.head)
    first.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getLong(4) >= 1L)
    }
    // trailing count never exceeds the customer's total order count
    val counts = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    rows.foreach(r => assert(r.getLong(4) <= counts(r.getLong(0))))
  }
}
