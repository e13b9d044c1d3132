package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext.SqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup / PQ hot loops (r21
  * optimization round, guide §4 "eliminate non-codegen expressions in
  * the hot path"). Each replaces a higher-order-function pipeline that
  * evaluated INTERPRETED per row — closure dispatch per element plus
  * intermediate array churn — with one compiled pass whose float/hash
  * semantics are bit-identical to the HOF form it replaces (parity is
  * spec-pinned; the DuckDB oracle twins are untouched).
  *
  * The heavy bodies live as static methods on [[DedupHashUtil]] so the
  * generated code is ONE call per row (the method is JIT-compiled
  * once), keeping whole-stage codegen intact without inlining a page
  * of Java per call site — the [[BpeApplyAll]] reference-object
  * discipline taken one step further. */
object DedupHashUtil {

  /** MinHash universe modulus 2^31 − 1 — must equal
    * [[graft.functions.TextFunctions.P]]. */
  val P: Long = 2147483647L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(bytes), 1, 15), 16, 10)` as arithmetic on the
    * raw digest: the first 15 hex digits are bytes 0..6 plus the high
    * nibble of byte 7 — a 60-bit non-negative value. */
  def top60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) >> 4) & 0xfL)
  }

  /** portableHashMod of one UTF-8 byte sequence fed in `parts` order
    * with single-space separators: identical bytes (and therefore an
    * identical hash) to md5 over the joined shingle string. */
  private def shingleHashMod(md: java.security.MessageDigest,
      parts: Array[UTF8String], from: Int, k: Int): Long = {
    md.reset()
    var j = 0
    while (j < k) {
      if (j > 0) md.update(' '.toByte)
      md.update(parts(from + j).getBytes)
      j += 1
    }
    top60(md.digest()) % P
  }

  /** The sorted distinct word-k-shingle hash set of a token array —
    * exactly `array_sort(array_distinct(transform(wordShingles(toks,
    * k), s => portableHashMod(s))))` (TextFunctions' zip_with fold +
    * md5 chain) in one compiled pass. Tokens are expected non-null
    * (`split` output); a window containing a null token yields the
    * HOF's null shingle hash, which lands (deduplicated) at the END of
    * the sorted array exactly as `array_sort` places nulls. Returns
    * the n < k case as the HOF's empty array. */
  def shingleHashSorted(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    var i = 0
    var sawNullTok = false
    while (i < n) {
      if (toks.isNullAt(i)) sawNullTok = true
      else parts(i) = toks.getUTF8String(i)
      i += 1
    }
    val m = n - k + 1
    val md = md5.get()
    val hs = new Array[Long](m)
    var w = 0
    var sawNull = false
    i = 0
    while (i < m) {
      var ok = true
      var j = 0
      while (ok && j < k) { if (parts(i + j) == null) ok = false; j += 1 }
      if (ok) { hs(w) = shingleHashMod(md, parts, i, k); w += 1 }
      else sawNull = true
      i += 1
    }
    java.util.Arrays.sort(hs, 0, w)
    var d = 0
    i = 0
    while (i < w) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(d) = hs(i); d += 1 }
      i += 1
    }
    val out = new Array[Any](d + (if (sawNull) 1 else 0))
    i = 0
    while (i < d) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out) // trailing slot (if any) stays null
  }

  /** The 16-hash MinHash signature over a shingle-hash array — the
    * map-side twin of the explode + 16 `min`-aggregate derivation
    * (`min_h pmod((2h+1)·x + 12289·h, P)` per hash function; min over
    * the multiset equals min over the distinct set). Null elements are
    * skipped exactly as SQL `min` skips nulls; an input with no
    * non-null element returns null (the aggregation form emits no row
    * for a document that never reaches the explode). */
  def minhashSig(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val x = hs.getLong(i)
        var h = 0
        while (h < numHashes) {
          val v = ((2L * h + 1) * x + 12289L * h) % P
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
    }
    if (!any) null
    else new GenericArrayData(sig)
  }

  /** Spark `Round(d, 6)` for doubles, exactly. */
  private def round6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** PQ encode of one vector against a flattened codebook — exactly
    * the `pqCodeColumns` HOF derivation: per subspace `s`, the rounded
    * sequential-order squared L2 `d6` to every codeword, code =
    * 0-based FIRST argmin of the unique key `d6·1e12 + label`, and the
    * quantization-error term `round(min(d6)·1e6, 0)` (the min over
    * DISTANCES, tracked separately from the key argmin — with labels
    * above 1e6 the two can diverge on near-ties, so both trackers run)
    * summed over subspaces. Returns null on dimension mismatch. */
  def pqEncode(e: ArrayData, labels: Array[Long], flat: Array[Double],
      nsub: Int, subdim: Int): InternalRow = {
    val dims = nsub * subdim
    if (e.numElements() != dims) return null
    val k = labels.length
    val codes = new Array[Int](nsub)
    var qerr = 0L
    var s = 0
    while (s < nsub) {
      var bestKey = Double.PositiveInfinity
      var bestIdx = 0
      var minD6 = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        val eOff = s * subdim
        val cOff = c * dims + s * subdim
        while (j < subdim) {
          val t = e.getDouble(eOff + j) - flat(cOff + j)
          d += t * t
          j += 1
        }
        val d6 = round6(d)
        val key = d6 * 1.0e12 + labels(c).toDouble
        if (key < bestKey) { bestKey = key; bestIdx = c }
        if (d6 < minD6) minD6 = d6
        c += 1
      }
      codes(s) = bestIdx
      qerr += java.math.BigDecimal.valueOf(minD6 * 1.0e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), qerr))
  }
}

/** Sorted distinct word-k-shingle hash set of an `array<string>` token
  * column (see [[DedupHashUtil.shingleHashSorted]]) — the base relation
  * of the whole MinHash dedup family as ONE compiled pass instead of
  * the interpreted zip_with/md5-transform/distinct/sort chain. */
case class ShingleHashSorted(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 2, "shingle width must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"shingle_hash_sorted$k"

  override def nullSafeEval(a: Any): Any =
    DedupHashUtil.shingleHashSorted(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.DedupHashUtil.shingleHashSorted($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSorted =
    copy(child = newChild)
}

/** MinHash signature of an `array<long>` shingle-hash column (see
  * [[DedupHashUtil.minhashSig]]) — map-side, so the signature stage
  * needs no explode + aggregation exchange. */
case class MinhashSigNative(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numHashes >= 1, "positive hash count")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on hash-less input
  override def prettyName: String = s"minhash$numHashes"

  override def nullSafeEval(a: Any): Any =
    DedupHashUtil.minhashSig(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.expressions.DedupHashUtil.minhashSig($a, $numHashes);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSigNative =
    copy(child = newChild)
}

/** PQ encode of an `array<double>` vector column against a
  * driver-constant codebook (see [[DedupHashUtil.pqEncode]]): one
  * struct(codes array<int>, qerr_micro long) per row in one compiled
  * pass — the interpreted HOF form evaluated ~128 closure-dispatched
  * rounded-L2 folds per row and was the single hottest per-row cost in
  * the PQ family. The codebook rides as two reference objects (labels
  * + row-major flattened matrix, the [[CentroidArgmax]] discipline);
  * equality is content-based so structurally identical encodes share
  * subexpressions (the [[AnySortedSetMember]] Array-field lesson). */
case class PqEncode(child: Expression, labels: Array[Long],
    flat: Array[Double], nsub: Int, subdim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(labels.nonEmpty && flat.length == labels.length * nsub * subdim,
    "codebook must be non-empty with nsub*subdim dims per codeword")

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("qerr_micro", LongType, nullable = false)))
  override def nullable: Boolean = true // null on dimension mismatch
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any =
    DedupHashUtil.pqEncode(a.asInstanceOf[ArrayData], labels, flat, nsub, subdim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val labelsRef = ctx.addReferenceObj("pqLabels", labels, "long[]")
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.expressions.DedupHashUtil.pqEncode(
       |  $a, $labelsRef, $flatRef, $nsub, $subdim);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override def equals(o: Any): Boolean = o match {
    case p: PqEncode =>
      p.child == child && p.nsub == nsub && p.subdim == subdim &&
        java.util.Arrays.equals(p.labels, labels) &&
        java.util.Arrays.equals(p.flat, flat)
    case _ => false
  }
  override lazy val hashCode: Int =
    java.util.Objects.hash(child, Int.box(nsub), Int.box(subdim),
      Int.box(java.util.Arrays.hashCode(labels)),
      Int.box(java.util.Arrays.hashCode(flat)))

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Column-API surface for the dedup/PQ native expressions. */
object DedupFunctions {

  /** Codegen'd sorted distinct k-shingle hash set (see
    * [[ShingleHashSorted]]). */
  def shingleHashSetSorted(toks: Column, k: Int): Column =
    SqlBridge.column(ShingleHashSorted(
      SqlBridge.expression(toks.cast("array<string>")), k))

  /** Codegen'd map-side MinHash signature (see [[MinhashSigNative]]). */
  def minhashSigNative(hs: Column, numHashes: Int): Column =
    SqlBridge.column(MinhashSigNative(
      SqlBridge.expression(hs.cast("array<long>")), numHashes))

  /** Codegen'd PQ encode struct (codes, qerr_micro) against a
    * `(label, cvec)` codebook snapshot (see [[PqEncode]]). */
  def pqEncodeStruct(e: Column, seeds: Seq[(Long, Seq[Double])],
      nsub: Int, subdim: Int): Column = {
    val labels = seeds.map(_._1).toArray
    val dims = nsub * subdim
    require(seeds.forall(_._2.length == dims), "ragged codebook")
    val flat = new Array[Double](seeds.length * dims)
    seeds.zipWithIndex.foreach { case ((_, v), c) =>
      var i = 0
      while (i < dims) { flat(c * dims + i) = v(i); i += 1 }
    }
    SqlBridge.column(PqEncode(
      SqlBridge.expression(e.cast("array<double>")), labels, flat, nsub, subdim))
  }
}
