package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relational-inventory invariants not covered by the DuckDB hash gate. */
class RelationalSpec extends SparkSpec {

  test("native ordered_pairs matches the HOF pair expansion (q83/q88/q93 parity)") {
    import spark.implicits._
    // the r22 swap: one compiled pass must emit the identical pair
    // multiset as the nested transform/slice chain it replaced,
    // including empty and singleton baskets
    val sets = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
      .unionByName(Seq(
        (-1L, Seq.empty[Long]), (-2L, Seq(7L)), (-3L, Seq(1L, 2L, 3L)))
        .toDF("l_orderkey", "ss"))
    def counted(pairs: org.apache.spark.sql.DataFrame) = pairs
      .groupBy(col("p.s1"), col("p.s2")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ref = counted(sets.select(explode(flatten(transform(col("ss"),
      (x, i) => transform(slice(col("ss"), i + 2, size(col("ss"))),
        y => struct(x.as("s1"), y.as("s2")))))).as("p")))
    val native = counted(sets.select(explode(
      graft.expressions.PairFunctions.orderedPairs(col("ss"))).as("p")))
    assert(native == ref)
    assert(native.nonEmpty && native(((1L, 2L))) >= 1L)
  }

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

  test("q77 funnel: stage counts and dwell agree with a per-user local replay") {
    val rows = Relational.q77Funnel(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1_view", "2_click", "3_purchase"))
    // local replay: per user, first view, first click at/after it,
    // first purchase at/after that
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("tsm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val funnels = byUser.values.flatMap { es =>
      val v = es.filter(_._2 == "view").map(_._3).minOption
      v.map { vm =>
        val c = es.filter(e => e._2 == "click" && e._3 >= vm).map(_._3).minOption
        val p = c.flatMap(cm =>
          es.filter(e => e._2 == "purchase" && e._3 >= cm).map(_._3).minOption)
        (vm, c, p)
      }
    }.toSeq
    val (nV, nC, nP) =
      (funnels.size.toLong, funnels.count(_._2.isDefined).toLong,
        funnels.count(_._3.isDefined).toLong)
    assert(rows(0).getLong(1) == nV && rows(1).getLong(1) == nC &&
      rows(2).getLong(1) == nP,
      s"stage users ${rows.map(_.getLong(1)).toSeq} vs local ($nV, $nC, $nP)")
    // strict order makes the funnel monotone
    assert(nV >= nC && nC >= nP && nP > 0)
    assert(rows(0).isNullAt(3), "stage 1 has no previous stage")
    val dwell = funnels.flatMap { case (vm, c, _) => c.map(_ - vm) }
    val wantAvg = math.rint(dwell.sum.toDouble / dwell.size * 100) / 100
    assert(math.abs(rows(1).getDouble(3) - wantAvg) < 1e-9,
      s"click dwell ${rows(1).getDouble(3)} vs local $wantAvg")
    assert(math.abs(rows(0).getDouble(2) - 1.0) < 1e-9, "head converts to itself")
  }

  test("q78 cohort retention: offset zero is total, triangle agrees with a local replay") {
    val rows = Relational.q78CohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("tsm"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 604800000L))
    val cohort = events.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val triangle = events.map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.length == triangle.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == triangle(key), s"$key n_active")
      assert(r.getLong(3) == sizes(r.getLong(0)), s"$key cohort_size")
      assert(r.getLong(2) <= r.getLong(3))
    }
    // every user is active in their own cohort week by construction
    rows.filter(_.getLong(1) == 0L).foreach(r =>
      assert(math.abs(r.getDouble(4) - 1.0) < 1e-9, s"cohort ${r.getLong(0)} offset 0"))
  }

  test("q82 histogram: buckets partition the data exactly, bounds are consistent") {
    val rows = Relational.q82Histogram(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val prices = graft.Tables.lineitem(spark, sfDir)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    // exact partition: bucket counts sum to the row count and match a
    // local integer-cents binning
    val local = prices.map(p => math.rint(p * 100).toLong / 1000000L)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getLong(3)).sum == prices.length.toLong)
    assert(rows.length == local.size)
    rows.foreach { r =>
      assert(r.getLong(3) == local(r.getLong(0)), s"bucket ${r.getLong(0)}")
      assert(r.getLong(1) == r.getLong(0) * 10000 &&
        r.getLong(2) == r.getLong(1) + 10000)
    }
    // shares sum to ~1
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
  }

  test("q83 co-occurrence: in-row pair expansion equals a local self-join, counts once per order") {
    val rows = Relational.q83CoOccurrence(spark, sfDir).collect()
    assert(rows.length == 20)
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = li.groupBy(_._1).values.flatMap { ls =>
      val ss = ls.map(_._2).sorted
      for (i <- ss.indices; j <- i + 1 until ss.length) yield (ss(i), ss(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
      .map { case ((a, b), n) => (a, b, n) }
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got\nwant $want")
    // pairs are canonical (s1 < s2) and counted per order, not per line
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
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

  test("q94 profile: per-column metrics match a local replay, one row per column") {
    val rows = Relational.q94Profile(spark, sfDir).collect()
    val e = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("tsm"), col("props"))
      .collect()
    val n = e.length.toLong
    def colVals(i: Int): Seq[Any] =
      e.toSeq.map(r => if (r.isNullAt(i)) null else r.get(i))
    val idx = Map("event_id" -> 0, "user_id" -> 1, "event_type" -> 2,
      "value" -> 3, "tsm" -> 4, "props" -> 5)
    assert(rows.map(_.getString(0)).toSeq == idx.keys.toSeq.sorted)
    rows.foreach { r =>
      val vs = colVals(idx(r.getString(0)))
      val nonNull = vs.filter(_ != null)
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == vs.count(_ == null))
      assert(r.getLong(3) == nonNull.distinct.size,
        s"${r.getString(0)}: distinct")
      if (!r.isNullAt(4)) {
        val nums = nonNull.map {
          case d: Double => d
          case l: Long => l.toDouble
          case i: Int => i.toDouble
        }
        assert(r.getDouble(4) == nums.min && r.getDouble(5) == nums.max)
      }
    }
  }

  test("profile() generalizes to any relation: part table, schema-driven numeric detection") {
    val rows = Relational.profile(graft.Tables.part(spark, sfDir)).collect()
    val part = graft.Tables.part(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      graft.Tables.part(spark, sfDir).schema.fieldNames.sorted.toSeq)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // numeric column: exact extremes
    val keys = part.map(_.getLong(0))
    assert(byName("p_partkey").getDouble(4) == keys.min.toDouble)
    assert(byName("p_partkey").getDouble(5) == keys.max.toDouble)
    // string column: NULL extremes, exact distinct count
    assert(byName("p_name").isNullAt(4))
    assert(byName("p_name").getLong(3) ==
      part.map(_.getString(1)).distinct.length)
    rows.foreach(r => assert(r.getLong(1) == part.length))
  }

  test("profile() on a map column: null distinct count instead of an analysis error") {
    // count_distinct over MapType fails at ANALYSIS time (maps have no
    // equality) — ADVICE r12: 'profile ANY relation' must degrade that
    // one metric, not throw on the whole relation
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 1), "x"), (2L, Map("b" -> 2), "x"),
      (3L, Map.empty[String, Int], null.asInstanceOf[String]))
      .toDF("id", "m", "s")
    val rows = Relational.profile(df).collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("m").getLong(1) == 3 && byName("m").getLong(2) == 0)
    assert(byName("m").isNullAt(3), "map distinct count must be NULL")
    // orderable columns keep their exact metrics alongside
    assert(byName("id").getLong(3) == 3 && byName("id").getDouble(4) == 1.0)
    assert(byName("s").getLong(3) == 1 && byName("s").getLong(2) == 1)
  }

  test("q93 association rules: scores match a local replay, identities hold") {
    val rows = Relational.q93AssociationRules(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val os = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = os.map(_._1).distinct.length.toDouble
    val singles = os.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = os.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.size) yield (ss(i), ss(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      val (s1, s2, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(pairCounts((s1, s2)) == n)
      assert(math.abs(r.getDouble(3) - n / nOrders) < 1e-6)
      assert(math.abs(r.getDouble(4) - n.toDouble / singles(s1)) < 1e-6)
      assert(math.abs(r.getDouble(5) - n.toDouble / singles(s2)) < 1e-6)
      assert(math.abs(r.getDouble(6) -
        n * nOrders / (singles(s1).toDouble * singles(s2))) < 1e-6)
      // structural identities: confidence and support bounded, lift
      // consistent with the independence baseline
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(4) <= 1 && r.getDouble(5) <= 1)
    }
    // the cut really is the top 20 by rounded lift over ALL pairs
    val allLifts = pairCounts.map { case ((a, b), n) =>
      BigDecimal(n * nOrders / (singles(a).toDouble * singles(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq.sorted(Ordering[Double].reverse)
    val floor = allLifts.take(20).last
    rows.foreach(r => assert(r.getDouble(6) >= floor))
  }

  test("q96 rank distribution: percent_rank/cdf/ntile match a local replay on the unique tie order") {
    val rows = Relational.q96RankDistribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (_, g) =>
      val n = g.length
      // rows arrive ordered by (value, event_id) — the window's own
      // total order, so position i is the unique rank
      g.zipWithIndex.foreach { case (r, i) =>
        assert(r.getDouble(3) == (if (n == 1) 0.0
          else BigDecimal(i.toDouble / (n - 1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        assert(r.getDouble(4) == BigDecimal((i + 1).toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        // ntile: first n%10 buckets hold one extra row
        val base = n / 10; val rem = n % 10
        val want = if (i < rem * (base + 1)) i / (base + 1) + 1
          else rem + (i - rem * (base + 1)) / base + 1
        assert(r.getInt(5) == want, s"row $i of $n: ntile")
      }
    }
  }

  test("q95 ewma: the fold matches a local sequential replay exactly") {
    val rows = Relational.q95Ewma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("tsm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._3).toSeq).toMap
    assert(rows.map(_.getLong(0)).toSet == byUser.keySet)
    rows.foreach { r =>
      val vs = byUser(r.getLong(0))
      assert(r.getLong(1) == vs.size)
      // the identical left fold, identical doubles — exact through
      // rounding (not a tolerance comparison)
      val local = vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc)
      assert(r.getDouble(2) == BigDecimal(local)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"user ${r.getLong(0)}: engine ${r.getDouble(2)} vs local $local")
    }
  }

  /** The engines' shared interpolated median, replayed locally. */
  private def localMedian(xs: Seq[Double]): Double = {
    val v = xs.sorted
    val h = (v.size - 1).toDouble * 0.5
    val lo = math.floor(h).toInt
    val a = v(lo)
    val b = v(math.min(lo + 1, v.size - 1))
    a + (b - a) * (h - lo)
  }

  private def round6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("q89 robust outliers: flags match a local median/MAD replay") {
    val rows = Relational.q89RobustOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(rows.map(_.getString(0)).toSet == byType.keySet)
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      val m = localMedian(xs)
      val devs = xs.map(x => math.abs(x - m))
      val ma = localMedian(devs)
      assert(r.getLong(1) == xs.size)
      assert(math.abs(r.getDouble(2) - m) < 1e-6)
      assert(math.abs(r.getDouble(3) - ma) < 1e-6)
      val thr = round6(4.4478 * ma)
      val n = devs.count(d => round6(d) > thr)
      assert(r.getLong(4) == n,
        s"${r.getString(0)}: engine ${r.getLong(4)} outliers vs local $n")
    }
  }

  test("q90 transition matrix: counts match a per-user sequence replay, rows normalize") {
    val rows = Relational.q90TransitionMatrix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val seqs = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("tsm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).map(_._3).toSeq).toMap
    val local = seqs.values.flatMap(s => s.zip(s.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == local, s"engine $got\nlocal $local")
    // each source row's probabilities sum to 1 (within rounding slack)
    rows.groupBy(_.getString(0)).values.foreach { g =>
      val s = g.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"p-sum $s")
    }
  }

  test("q92 twap: per-user trapezoid replay agrees, excluded users have no span") {
    val rows = Relational.q92Twap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_millis(col("ts")).as("tsm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).toSeq).toMap
    val got = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    byUser.foreach { case (u, es) =>
      val span = es.last._4 - es.head._4
      if (span == 0L) assert(!got.contains(u), s"user $u with zero span emitted")
      else {
        val area = es.zip(es.drop(1)).map { case (a, b) =>
          (a._3 + b._3) / 2.0 * (b._4 - a._4)
        }.sum
        val (n, twap) = got(u)
        assert(n == es.size)
        assert(math.abs(twap - area / span) < 1e-6,
          s"user $u: engine $twap vs local ${area / span}")
      }
    }
    assert(got.keySet.subsetOf(byUser.keySet))
  }
  test("q105: ACF replays locally, bounds hold, lag structure complete") {
    val rows = Relational.q105Autocorrelation(spark, sfDir).collect()
    val types = rows.map(_.getString(0)).distinct
    // 3 lags per type, Pearson bounded
    assert(rows.length == types.length * 3)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9, r.toString)
      assert(r.getLong(2) > 0, r.toString)
    }
    // local replay for every type at lag 1: Pearson over the
    // (tsm, event_id)-ordered series, rounded like the engine
    val series = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        unix_millis(col("ts")).as("tsm"), col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for (t <- types) {
      val v = series(t).sortBy(x => (x._3, x._4)).map(_._2)
      val (xs, ys) = (v.dropRight(1), v.drop(1))
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val r = cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
      val got = rows.find(x => x.getString(0) == t && x.getInt(1) == 1).get
      assert(got.getLong(2) == xs.length.toLong)
      assert(math.abs(got.getDouble(3) - r) < 1e-6,
        s"$t lag1: engine ${got.getDouble(3)} vs replay $r")
    }
  }
  test("q108: credits sum to exactly 1e6 per conversion, pairs equal the live join") {
    val rows = Relational.q108AttributionCredit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for ((c, rs) <- rows.groupBy(_.getLong(0))) {
      // linear shares are integer-exact: no conversion ever over- or
      // under-credits
      assert(rs.map(_.getLong(5)).sum == 1000000L, s"conv $c credit drift")
      assert(rs.count(_.getBoolean(3)) == 1, s"conv $c first-touch count")
      assert(rs.count(_.getBoolean(4)) == 1, s"conv $c last-touch count")
      assert(rs.forall(_.getLong(2) == rs.length.toLong), s"conv $c n_imps")
    }
    // the pair relation IS the stream-stream join's, batch-evaluated
    val e = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"))
    val live = graft.streaming.Attribution.attribute(
        e.filter(col("event_type") === "view")
          .select("user_id", "event_id", "ts"),
        e.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts"))
      .collect().map(r => (r.getLong(2), r.getLong(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == live,
      "batch credit pairs diverge from the attribution join")
  }
}
