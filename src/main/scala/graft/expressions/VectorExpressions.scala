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

/** Nearest-centroid assignment against a DRIVER-CONSTANT centroid
  * matrix as one native expression: for each input vector `e`, return
  * the label maximizing `round(cos(e, c), 6) · 1e12 + label` — the
  * exact argmax key of `Pipeline.assignToCentroids` (the key embeds
  * the label, so ties on the rounded cosine resolve to the larger
  * label, like `max_by`'s tie-break column; keys are unique because
  * labels are).
  *
  * Why an expression and not a literal-array `array_max`: k centroids
  * as an `array(struct(...))` literal inline k dot-product loops plus
  * k struct writers into the generated projection — at k = 64 the
  * method blows past the JIT's compilable size and the whole stage
  * falls back to uncompiled bytecode (measured 3× on q61). Here the
  * matrix rides along as reference objects (flattened row-major, plus
  * per-centroid norms precomputed once on the driver with the same
  * sequential accumulation as `vecNorm`) and the generated code is two
  * nested Java loops of constant size, independent of k.
  *
  * Float semantics are bit-identical to the Column form
  * `max_by(label, round(vecCosine(e, cvec), 6) * 1e12 + label)`:
  * sequential dot accumulation, `dot / (norm_e · norm_c)`
  * parenthesization, and Spark `round`'s exact HALF_UP decimal
  * rounding (`BigDecimal.valueOf(d).setScale(6, HALF_UP)` — the same
  * shortest-representation path Spark's `Round` takes for doubles).
  * Parity is asserted in VectorExpressionsSpec against the crossJoin +
  * max_by derivation on random vectors.
  *
  * A vector whose length differs from the centroid dimensionality
  * yields NULL (surfaced, not mis-scored). */
case class CentroidArgmax(child: Expression,
    labels: Array[Long], cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(labels.length == cents.length && labels.nonEmpty,
    "labels and centroids must be equal-length and non-empty")
  require(labels.distinct.length == labels.length,
    "centroid labels must be distinct (the argmax key embeds the label)")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true // null on dimension mismatch
  override def prettyName: String = "centroid_argmax"

  private lazy val dims = cents(0).length
  // row-major flattening: one reference object instead of k
  private lazy val flat: Array[Double] = {
    require(cents.forall(_.length == dims), "ragged centroid matrix")
    val out = new Array[Double](cents.length * dims)
    var c = 0
    while (c < cents.length) {
      System.arraycopy(cents(c), 0, out, c * dims, dims); c += 1
    }
    out
  }
  // per-centroid norms, sequential accumulation (vecNorm parity)
  private lazy val norms: Array[Double] = cents.map { v =>
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i) * v(i); i += 1 }
    math.sqrt(acc)
  }

  /** Spark `Round(..., 6)` for doubles, exactly. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() != dims) null
    else {
      var ne = 0.0
      var i = 0
      while (i < dims) { val v = e.getDouble(i); ne += v * v; i += 1 }
      val normE = math.sqrt(ne)
      var best = Double.NegativeInfinity
      var bestLabel = 0L
      var c = 0
      while (c < labels.length) {
        var dot = 0.0
        var j = 0
        while (j < dims) { dot += e.getDouble(j) * flat(c * dims + j); j += 1 }
        val key = round6(dot / (normE * norms(c))) * 1000000000000.0 + labels(c)
        if (key > best) { best = key; bestLabel = labels(c) }
        c += 1
      }
      bestLabel
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
    val labelsRef = ctx.addReferenceObj("centLabels", labels, "long[]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, e => {
      val ne = ctx.freshName("ne"); val normE = ctx.freshName("normE")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val key = ctx.freshName("key"); val best = ctx.freshName("best")
      val bestLabel = ctx.freshName("bestLabel")
      val v = ctx.freshName("v")
      s"""
         |if ($e.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ne = 0.0;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    double $v = $e.getDouble($i); $ne += $v * $v;
         |  }
         |  double $normE = java.lang.Math.sqrt($ne);
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  long $bestLabel = 0L;
         |  for (int $c = 0; $c < ${labels.length}; $c++) {
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dims; $j++) {
         |      $dot += $e.getDouble($j) * $flatRef[$c * $dims + $j];
         |    }
         |    double $key = java.math.BigDecimal.valueOf($dot / ($normE * $normsRef[$c]))
         |      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
         |      * 1000000000000.0 + $labelsRef[$c];
         |    if ($key > $best) { $best = $key; $bestLabel = $labelsRef[$c]; }
         |  }
         |  ${ev.value} = $bestLabel;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmax =
    copy(child = newChild)
}

/** TRUE iff any element of the child `array<long>` is a member of the
  * ascending-sorted duplicate-free literal `set` — the codegen'd EXACT
  * confirm behind the streaming decontamination gate's map-side
  * membership test (reference: tzshin/ESPKinesis has no analog; this
  * serves the LLM-pipeline surface). Binary search per element with
  * early exit on the first hit; the set rides as ONE reference object
  * (the [[CentroidArgmax]] discipline), so generated code size is
  * independent of |set|. Null array → null; null elements are skipped
  * (a null gram cannot match).
  *
  * The `Array[Long]` field defeats case-class structural equality
  * (arrays compare by reference), which would make two structurally
  * identical predicates never `semanticEquals` and so never share
  * subexpressions (ADVICE r17); `equals`/`hashCode` are therefore
  * content-based (`java.util.Arrays`), with the hash computed once —
  * a 2^18-element set must not be re-hashed on every canonicalization
  * probe. Sortedness is the CALLER's contract (validated once in
  * [[VectorFunctions.anySortedSetMember]], the one construction path)
  * rather than a constructor `require`: Catalyst `copy()`s expressions
  * freely during tree transforms, and an O(|set|) check per copy is
  * real cost for a plan-literal this size. */
case class AnySortedSetMember(child: Expression, set: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(set.nonEmpty, "empty membership set")

  override def equals(other: Any): Boolean = other match {
    case a: AnySortedSetMember =>
      child == a.child && java.util.Arrays.equals(set, a.set)
    case _ => false
  }
  @transient override lazy val hashCode: Int =
    31 * child.hashCode + java.util.Arrays.hashCode(set)

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "any_sorted_set_member"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var i = 0
    var hit = false
    while (!hit && i < arr.numElements()) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) hit = true
      i += 1
    }
    hit
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sortedSet", set, "long[]")
    nullSafeCodeGen(ctx, ev, e => {
      val i = ctx.freshName("i")
      val hit = ctx.freshName("hit")
      s"""
         |boolean $hit = false;
         |for (int $i = 0; !$hit && $i < $e.numElements(); $i++) {
         |  if (!$e.isNullAt($i) &&
         |      java.util.Arrays.binarySearch($setRef, $e.getLong($i)) >= 0) {
         |    $hit = true;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AnySortedSetMember =
    copy(child = newChild)
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

  /** Cosine with CALLER-HOISTED norms: `vecDot(a, b) / (na · nb)` —
    * bit-identical to [[vecCosine]] whenever `na`/`nb` are [[vecNorm]]
    * of `a`/`b` (the identical loops in the identical operand order;
    * hoisting changes WHERE each norm is computed, never how). For a
    * join projection where each side's vector meets many partners
    * (r22, guide §4): [[vecCosine]] inlines BOTH norm loops per pair,
    * so an n×q candidate scoring stage runs 3·n·q dot-length loops;
    * projecting each side's norm BELOW the join runs n + q norm loops
    * and n·q dots — a 3× cut in the pair stage's float work. */
  def vecCosinePre(a: Column, na: Column, b: Column, nb: Column): Column =
    vecDot(a, b) / (na * nb)

  /** Codegen'd nearest-centroid label (see [[CentroidArgmax]]):
    * argmax over `(label, centroid)` pairs of the
    * `round(cos, 6)·1e12 + label` assignment key. */
  def centroidArgmax(e: Column, cents: Seq[(Long, Seq[Double])]): Column =
    SqlBridge.column(CentroidArgmax(
      SqlBridge.expression(asDouble(e)),
      cents.map(_._1).toArray, cents.map(_._2.toArray).toArray))

  /** Codegen'd |a ∩ b| for ascending-sorted duplicate-free
    * `array<long>` (see [[SortedIntersectSize]]). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    SqlBridge.column(SortedIntersectSize(
      SqlBridge.expression(a.cast("array<long>")),
      SqlBridge.expression(b.cast("array<long>"))))

  /** Codegen'd "any element ∈ sorted literal set" for `array<long>`
    * (see [[AnySortedSetMember]]). `set` must be ascending-sorted and
    * duplicate-free — validated HERE, once per construction, not in
    * the expression's constructor (which Catalyst re-runs per
    * `copy()` during tree transforms). */
  def anySortedSetMember(a: Column, set: Array[Long]): Column = {
    require((1 until set.length).forall(i => set(i - 1) < set(i)),
      "set must be ascending-sorted and duplicate-free (the binary-search contract)")
    SqlBridge.column(AnySortedSetMember(
      SqlBridge.expression(a.cast("array<long>")), set))
  }
}
