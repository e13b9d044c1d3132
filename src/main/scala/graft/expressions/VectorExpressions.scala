package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftext.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the similarity hot loop: the dot
  * product of two `array<double>` columns as a tight codegen'd Java
  * loop over `ArrayData` — no lambda dispatch, no per-element boxing.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)`, see `graft.functions.TextFunctions.dotProduct`) evaluates
  * interpreted: Spark HOFs run on the Catalyst eval path, allocate the
  * zipped intermediate array, and dispatch two closures per element.
  * For a 64-dim embedding compared against thousands of candidates
  * (q25/q30/q31) that interpreted loop IS the query. This expression
  * generates the loop into whole-stage codegen instead.
  *
  * Float semantics are bit-identical to the HOF form and the DuckDB
  * twin (`list_sum(list_transform(...))`): sequential accumulation in
  * array-index order, double precision throughout — oracle parity is
  * exactly preserved (asserted in VectorExpressionsSpec).
  *
  * Inputs: equal-length `array<double>` with non-null elements
  * (embedding vectors) — the [[VectorFunctions]] wrappers insert the
  * `array<float>` → `array<double>` cast for the parquet layout. A
  * length mismatch yields NULL (surfaced, not silently truncated).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two VALUE-SORTED `array<long>` columns
  * as a codegen'd two-pointer merge — O(|a|+|b|) with zero per-call
  * allocation. `array_intersect` builds a hash set per invocation and
  * evaluates on the interpreted path; on a candidate-verification join
  * (q40: millions of pairs × ~50-element hash sets) the intersection
  * IS the query.
  *
  * Inputs MUST be ascending-sorted and duplicate-free (the gram-set
  * relations are built that way); the result is then exactly
  * `size(array_intersect(a, b))` — set-semantics parity with DuckDB's
  * `len(list_intersect(...))` regardless of order, asserted in
  * VectorExpressionsSpec. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Codegen'd dot product (see [[DotProduct]]). */
  def vecDot(a: Column, b: Column): Column =
    SqlBridge.column(DotProduct(
      SqlBridge.expression(asDouble(a)), SqlBridge.expression(asDouble(b))))

  /** Euclidean norm via the native dot product: `sqrt(a·a)` — same
    * sequential accumulation order as the HOF `l2Norm`. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity via the native dot product. */
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Codegen'd |a ∩ b| for ascending-sorted duplicate-free
    * `array<long>` (see [[SortedIntersectSize]]). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    SqlBridge.column(SortedIntersectSize(
      SqlBridge.expression(a.cast("array<long>")),
      SqlBridge.expression(b.cast("array<long>"))))
}
