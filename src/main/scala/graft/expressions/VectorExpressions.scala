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
}
