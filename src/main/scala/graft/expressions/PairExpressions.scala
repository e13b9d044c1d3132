package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext.SqlBridge
import org.apache.spark.sql.types._

/** Native in-row pair expansion for the basket/co-occurrence family
  * (r22, guide §4): all ordered pairs `(ss[i], ss[j])`, i < j, of one
  * sorted `array<long>` row — exactly
  * `flatten(transform(ss, (x, i) => transform(slice(ss, i+2, size(ss)),
  * y => struct(x, y))))`, the HOF chain q83/q88/q93 shared. That chain
  * evaluates INTERPRETED and its inner `slice` materializes a fresh
  * suffix copy of the array PER ELEMENT — O(w²) allocations per basket
  * before a single pair is emitted. Here one compiled pass writes the
  * w·(w−1)/2 pair structs directly. Pair VALUES and their multiset are
  * identical (parity spec-pinned in RelationalSpec); every consumer
  * aggregates the exploded pairs, so row order never matters. */
object PairUtil {

  /** Elements are expected non-null (`collect_set` output — the one
    * construction path); a null slot would read as 0, exactly like
    * [[SortedIntersectSize]]'s documented contract. */
  def orderedPairs(ss: ArrayData): ArrayData = {
    val n = ss.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val m = n * (n - 1) / 2
    val out = new Array[Any](m)
    var w = 0
    var i = 0
    while (i < n - 1) {
      val x = ss.getLong(i)
      var j = i + 1
      while (j < n) {
        out(w) = new GenericInternalRow(Array[Any](x, ss.getLong(j)))
        w += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<struct<s1, s2>>` of all within-row ordered pairs (see
  * [[PairUtil.orderedPairs]]). */
case class OrderedPairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s1", LongType, nullable = false),
    StructField("s2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(a: Any): Any =
    PairUtil.orderedPairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.PairUtil.orderedPairs($a);")

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

/** Column-API surface. */
object PairFunctions {

  /** Codegen'd within-row ordered pairs of a sorted duplicate-free
    * `array<long>` (see [[OrderedPairs]]). */
  def orderedPairs(ss: Column): Column =
    SqlBridge.column(OrderedPairs(
      SqlBridge.expression(ss.cast("array<long>"))))
}
