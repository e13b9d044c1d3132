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
