package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext.SqlBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the BPE tokenizer-APPLY hot loop:
  * the full learned merge sequence over an `array<string>` token
  * column as one tight codegen'd Java loop with an in-place token
  * buffer (reference: tzshin/ESPKinesis has no analog; this serves
  * the LLM-pipeline surface).
  *
  * The higher-order-function form
  * ([[graft.operators.Pipeline.bpeMergePass]] — `aggregate` seeding a
  * one-element array and `concat`-appending per token) evaluates
  * interpreted AND rebuilds the accumulator array per element, i.e.
  * O(tokens²) allocation per merge per document; chained over an
  * m-merge vocabulary that interpreted quadratic loop IS the
  * tokenizer-apply query (q104's sf1 probe measured it at 7.07× for
  * 10× data). This expression applies every merge in ONE compiled
  * pass each — O(tokens) per merge, a single buffer, zero per-token
  * allocation — inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the fold chain (scalacheck-pinned
  * in BpeExpressionsSpec, including self-pair runs and freshly-created
  * pair interactions): per merge, one greedy left-to-right pass where
  * every non-overlapping adjacent (lhs, rhs) occurrence collapses to
  * `lhs + " " + rhs` — a token consumed by a merge cannot start
  * another (the standard BPE rule), and merge k+1 sees merge k's
  * output exactly as the sequential rewrites did. Null array → null;
  * null ELEMENTS pass through unmatched (split() never produces them;
  * the contract mirrors [[AnySortedSetMember]]'s null-element
  * discipline).
  *
  * The merge table rides as THREE reference objects (lhs/rhs/merged
  * `UTF8String[]`), so generated code size is independent of the
  * vocabulary — the [[CentroidArgmax]] discipline; a 30k-merge
  * production table is three arrays, not 30k expression nodes. The
  * `merges` field is an immutable Seq, so case-class structural
  * equality (and therefore semanticEquals / subexpression sharing)
  * works — the ADVICE-r17 Array-field lesson applied from the
  * start. */
case class BpeApplyAll(child: Expression, merges: Seq[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(merges.nonEmpty, "empty merge table - apply is the identity")

  @transient private lazy val lhsArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rhsArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val mergedArr: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + " " + m._2)).toArray

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_apply_all"

  override def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[ArrayData]
    val n0 = in.numElements()
    val buf = new Array[UTF8String](n0)
    var i = 0
    while (i < n0) {
      buf(i) = if (in.isNullAt(i)) null else in.getUTF8String(i)
      i += 1
    }
    var len = n0
    var m = 0
    while (m < lhsArr.length) {
      val l = lhsArr(m); val r = rhsArr(m); val g = mergedArr(m)
      // in-place greedy pass: the write index never passes the read
      // index, so unread positions are never clobbered
      var w = 0; var p = 0
      while (p < len) {
        if (p + 1 < len && buf(p) != null && buf(p).equals(l) &&
            buf(p + 1) != null && buf(p + 1).equals(r)) {
          buf(w) = g; p += 2
        } else { buf(w) = buf(p); p += 1 }
        w += 1
      }
      len = w
      m += 1
    }
    val out = new Array[Any](len)
    System.arraycopy(buf, 0, out, 0, len)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = "org.apache.spark.unsafe.types.UTF8String"
    val lhsRef = ctx.addReferenceObj("bpeLhs", lhsArr, s"$u[]")
    val rhsRef = ctx.addReferenceObj("bpeRhs", rhsArr, s"$u[]")
    val mergedRef = ctx.addReferenceObj("bpeMerged", mergedArr, s"$u[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n0 = ctx.freshName("n0")
      val buf = ctx.freshName("buf")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val w = ctx.freshName("w")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      s"""
         |final int $n0 = $a.numElements();
         |$u[] $buf = new $u[$n0];
         |for (int $i = 0; $i < $n0; $i++) {
         |  $buf[$i] = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |}
         |int $len = $n0;
         |for (int $m = 0; $m < $lhsRef.length; $m++) {
         |  int $w = 0;
         |  for (int $p = 0; $p < $len; ) {
         |    if ($p + 1 < $len && $buf[$p] != null && $buf[$p].equals($lhsRef[$m])
         |        && $buf[$p + 1] != null && $buf[$p + 1].equals($rhsRef[$m])) {
         |      $buf[$w++] = $mergedRef[$m]; $p += 2;
         |    } else {
         |      $buf[$w++] = $buf[$p]; $p += 1;
         |    }
         |  }
         |  $len = $w;
         |}
         |Object[] $out = new Object[$len];
         |System.arraycopy($buf, 0, $out, 0, $len);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyAll =
    copy(child = newChild)
}

/** Native Catalyst expression for the `bits`-wide SimHash vote fold
  * over an `array<long>` token-hash column — the signature every
  * SimHash consumer keys on (batch q28 and the streaming
  * `dedupSimhash` / near-dup ingest gates at 16 bits; q143's
  * signature-WIDTH knob table sweeps it). The HOF form (nested
  * `aggregate` over `transform(sequence(0,15))`) evaluates
  * interpreted and walks the token array once PER BIT with closure
  * dispatch per element; this is one compiled pass accumulating all
  * bit votes. Bit test `(x >> b) & 1` equals the HOF's exact
  * double-division test for the non-negative < 2^31 hashes every
  * caller feeds ([[graft.functions.TextFunctions.portableHashMod]] —
  * which also bounds the usable width at 31 bits, the `require`); a
  * NULL element votes −1 on every bit, exactly the HOF's
  * `when(null).otherwise(-1)` fallthrough (parity is
  * scalacheck-pinned in BpeExpressionsSpec). */
case class SimhashBits(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 31,
    "width must fit portableHashMod's 31-bit hash range")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"simhash$bits"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val x = arr.getLong(i)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((x >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |int[] $votes = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    for (int $b = 0; $b < $bits; $b++) { $votes[$b] -= 1; }
         |  } else {
         |    final long $x = $a.getLong($i);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $votes[$b] += ((($x >> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object BpeFunctions {
  /** Codegen'd full-merge-table BPE apply over an `array<string>`
    * column (see [[BpeApplyAll]]): bit-identical to chaining
    * `Pipeline.bpeMergePass` over `merges` in order, O(tokens) per
    * merge instead of the HOF fold's O(tokens²) interpreted
    * allocation. Empty table → the input column unchanged. */
  def bpeApplyAll(toks: Column, merges: Seq[(String, String)]): Column =
    if (merges.isEmpty) toks
    else SqlBridge.column(BpeApplyAll(
      // the cast makes a wrongly-typed column an ANALYSIS error (the
      // simhashBits discipline) instead of a ClassCastException deep
      // in generated code
      SqlBridge.expression(toks.cast("array<string>")), merges.toList))

  /** Codegen'd `bits`-wide SimHash over an `array<long>` token-hash
    * column (see [[SimhashBits]]): one compiled pass over the tokens
    * instead of the HOF form's per-bit interpreted walks. */
  def simhashBits(tokenHashes: Column, bits: Int): Column =
    SqlBridge.column(SimhashBits(
      SqlBridge.expression(tokenHashes.cast("array<long>")), bits))

  /** The 16-bit form — the batch q28 / streaming-gate default. */
  def simhash16Native(tokenHashes: Column): Column =
    simhashBits(tokenHashes, 16)
}
