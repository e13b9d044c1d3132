package graft.expressions

import graft.SparkSpec
import graft.expressions.VectorFunctions._
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Native codegen'd vector expressions: bit-exact parity with the
  * interpreted HOF forms (whose DuckDB parity carries the oracle), and
  * behavior on both the codegen and interpreted eval paths. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches known values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(vecDot(col("a"), col("b"))).head().getDouble(0) == 32.0)
    assert(df.select(vecNorm(col("a"))).head().getDouble(0) ==
      math.sqrt(14.0))
  }

  test("vec_dot is bit-identical to the HOF form (seeded random vectors)") {
    val rnd = new scala.util.Random(20260812L)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 20 - 10),
      Seq.fill(64)(rnd.nextDouble() * 20 - 10)))
    val got = rows.toDF("a", "b").select(
      vecDot(col("a"), col("b")).as("native"),
      TextFunctions.dotProduct(col("a"), col("b")).as("hof"),
      vecCosine(col("a"), col("b")).as("nc"),
      TextFunctions.cosine(col("a"), col("b")).as("hc")).collect()
    got.foreach { row =>
      // bit-exact: same sequential accumulation order, double precision
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(row.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(3)))
    }
  }

  test("vec_dot coerces float arrays like the HOF cast form") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val row = df.select(
      vecDot(col("a"), col("b")).as("native"),
      TextFunctions.dotProduct(col("a"), col("b")).as("hof")).head()
    assert(row.getDouble(0) == 13.0 && row.getDouble(1) == 13.0)
  }

  test("length mismatch yields NULL, empty arrays yield 0") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    assert(df.select(vecDot(col("a"), col("b"))).head().isNullAt(0))
    val empty = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    assert(empty.select(vecDot(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("null input yields NULL") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(vecDot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("interpreted eval path (inside a HOF lambda) agrees with codegen") {
    // embedding the native expression inside transform() forces the
    // interpreted eval path — results must match the projected form
    val df = Seq((Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(0.5, 0.25))).toDF("vs", "q")
    val got = df.select(transform(col("vs"), v => vecDot(v, col("q"))).as("d"))
      .head().getSeq[Double](0)
    assert(got == Seq(1.0, 2.5))
  }

  test("sorted_intersect_size equals size(array_intersect) on random sorted sets") {
    val rnd = new scala.util.Random(7L)
    val rows = Seq.fill(300)((
      rnd.shuffle((0L to 200L).toList).take(rnd.nextInt(50) + 1).distinct.sorted,
      rnd.shuffle((0L to 200L).toList).take(rnd.nextInt(50) + 1).distinct.sorted))
    val got = rows.toDF("a", "b").select(
      sortedIntersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // edges: disjoint, identical, empty
    val edges = Seq(
      (Seq(1L, 2L), Seq(3L, 4L), 0),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3),
      (Seq.empty[Long], Seq(1L), 0))
    edges.foreach { case (a, b, expect) =>
      assert(Seq((a, b)).toDF("a", "b")
        .select(sortedIntersectSize(col("a"), col("b"))).head().getInt(0) == expect)
    }
  }

  test("any_sorted_set_member agrees with arrays_overlap on random sets, both eval paths") {
    val rnd = new scala.util.Random(11L)
    val set = (0L to 500L).filter(_ => rnd.nextBoolean()).toArray.sorted
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(40))(rnd.nextLong(600L)))
    val df = rows.toDF("a")
    val got = df.select(
      anySortedSetMember(col("a"), set).as("native"),
      arrays_overlap(col("a"), lit(set)).as("builtin")).collect()
    got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    // interpreted path (inside a HOF lambda) agrees
    val hof = df.select(element_at(
      transform(array(col("a")), x => anySortedSetMember(x, set)), 1))
      .collect().map(_.getBoolean(0))
    assert(hof.toSeq == got.map(_.getBoolean(0)).toSeq)
    // edges: empty array → false, null array → null, null element skipped
    assert(!Seq(Seq.empty[Long]).toDF("a")
      .select(anySortedSetMember(col("a"), set)).head().getBoolean(0))
    assert(Seq(Tuple1(null.asInstanceOf[Seq[Long]])).toDF("a")
      .select(anySortedSetMember(col("a"), set)).head().isNullAt(0))
    val withNull = Seq(Tuple1(Seq[java.lang.Long](null, java.lang.Long.valueOf(set.head))))
      .toDF("a")
    assert(withNull.select(anySortedSetMember(col("a"), set)).head().getBoolean(0))
  }

  test("centroid_argmax matches the crossJoin + max_by derivation on random vectors") {
    // the Column form whose DuckDB parity carries the q51/q61 oracle:
    // max_by(label, round(cos, 6)*1e12 + label) over a broadcast
    // centroid relation — the native expression must agree row-for-row
    val rnd = new scala.util.Random(20260813L)
    val cents = (0 until 64).map(k =>
      ((k * 37 + 5).toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val vecs = (0 until 500).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    // include exact centroid copies so some cosines hit 1.0 exactly
    val rows = vecs ++ cents.take(8).zipWithIndex.map { case ((_, v), i) =>
      (1000L + i, v)
    }
    val e = rows.toDF("vec_id", "e")
    val c = cents.toDF("label", "cvec")
    val viaJoin = e.crossJoin(broadcast(c))
      .withColumn("cos6", round(vecCosine(col("e"), col("cvec")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("label"),
        col("cos6") * 1000000000000.0 + col("label")).as("cluster"))
    val viaNative = e.select(col("vec_id"),
      centroidArgmax(col("e"), cents).as("cluster"))
    val j = viaJoin.withColumnRenamed("cluster", "jc")
      .join(viaNative, "vec_id").collect()
    assert(j.length == rows.length)
    j.foreach(r => assert(r.getAs[Long]("jc") == r.getAs[Long]("cluster"),
      s"vec ${r.getAs[Long]("vec_id")}: join says ${r.getAs[Long]("jc")}, " +
        s"native says ${r.getAs[Long]("cluster")}"))
  }

  test("centroid_argmax: dimension mismatch is NULL, interpreted path agrees") {
    val cents = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
    val df = Seq((Seq(3.0, 1.0), Seq(1.0, 2.0, 3.0))).toDF("ok", "bad")
    assert(df.select(centroidArgmax(col("ok"), cents)).head().getLong(0) == 1L)
    assert(df.select(centroidArgmax(col("bad"), cents)).head().isNullAt(0))
    // inside a HOF lambda → interpreted eval path
    val hof = Seq(Seq(Seq(3.0, 1.0), Seq(1.0, 4.0))).toDF("vs")
      .select(transform(col("vs"), v => centroidArgmax(v, cents)).as("c"))
      .head().getSeq[Long](0)
    assert(hof == Seq(1L, 2L))
  }

  test("the native expression participates in whole-stage codegen") {
    // spark.range input: a literal table would be constant-folded into
    // a LocalTableScan before any codegen could be observed
    val df = spark.range(4)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(vecDot(col("a"), col("b")).as("d"))
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string;
    // the vec_dot projection must carry one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("vec_dot")),
      s"vec_dot projection not inside a codegen span:\n$plan")
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(8.0, 11.0, 14.0, 17.0))
  }
}
