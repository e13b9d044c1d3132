package graft.expressions

import graft.SparkSpec
import graft.expressions.BpeFunctions.bpeApplyAll
import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** The native codegen'd BPE apply: bit-exact parity with the chained
  * HOF fold (whose DuckDB parity carries q100/q104's oracles), on both
  * eval paths, including the overlap and pair-creation cases the
  * greedy rule is defined by. */
class BpeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** The reference derivation: [[Pipeline.bpeMergePass]] chained in
    * merge order — exactly what the sequential learner's per-round
    * rewrites did. */
  private def hofChain(c: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    merges.foldLeft(c) { case (acc, (l, r)) => Pipeline.bpeMergePass(acc, l, r) }

  test("hand cases: greedy overlap, self-pairs, created pairs, empty/short docs") {
    val merges = Seq(("a", "a"), ("a a", "b"), ("x", "y"))
    val docs = Seq(
      "a a a a b",    // self-pair run: floor(4/2) merges, then created pair
      "a a a b",      // odd run: left-aligned, trailing a survives
      "x y x y",      // two disjoint merges in one pass
      "a b x",        // nothing merges
      "a",            // single token
      "")             // split("") = [""], nothing merges
    val got = docs.toDF("text")
      .select(bpeApplyAll(split(col("text"), " "), merges).as("native"),
        hofChain(split(col("text"), " "), merges).as("hof"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1)))
    got.foreach { case (n, h) => assert(n == h, s"$n vs $h") }
    // "a a a a b": the self-pair run collapses left-aligned to two
    // "a a" tokens, then the SECOND pass merges the created ("a a", b)
    assert(got(0)._1 == Seq("a a", "a a b"))
    assert(got(2)._1 == Seq("x y", "x y"))
  }

  test("random docs over a tiny vocabulary agree with the HOF chain (both merge shapes)") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("a", "b", "c", "d")
    val docs = Seq.fill(300)(
      Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    // merge tables that exercise creation chains and self-pairs
    val tables = Seq(
      Seq(("a", "b"), ("a b", "c"), ("d", "d")),
      Seq(("c", "c"), ("c c", "c c"), ("a", "a")),
      Seq(("b", "a"), ("a", "b"), ("b a", "a b")))
    tables.foreach { merges =>
      val got = docs.toDF("text")
        .select(bpeApplyAll(split(col("text"), " "), merges).as("native"),
          hofChain(split(col("text"), " "), merges).as("hof"))
        .collect()
      got.foreach(r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)} under $merges"))
    }
  }

  test("interpreted eval path (inside a HOF lambda) agrees with codegen") {
    val merges = Seq(("a", "b"))
    val df = Seq(Seq(Seq("a", "b", "c"), Seq("c", "a", "b"))).toDF("docs")
    val got = df.select(transform(col("docs"),
        d => bpeApplyAll(d, merges)).as("out"))
      .head().getSeq[Seq[String]](0)
    assert(got == Seq(Seq("a b", "c"), Seq("c", "a b")))
  }

  test("null array is null; null elements pass through unmatched") {
    val merges = Seq(("a", "b"))
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
    assert(df.select(bpeApplyAll(col("toks"), merges)).head().isNullAt(0))
    val withNulls = Seq(Tuple1(Seq[String](null, "a", "b", null)))
      .toDF("toks")
    assert(withNulls.select(bpeApplyAll(col("toks"), merges))
      .head().getSeq[String](0) == Seq(null, "a b", null))
  }

  test("empty merge table is the identity column") {
    val df = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
    assert(df.select(bpeApplyAll(col("toks"), Seq.empty))
      .head().getSeq[String](0) == Seq("a", "b"))
  }

  test("simhash16: native expression equals the HOF vote fold on random hash multisets") {
    import graft.functions.TextFunctions
    val rnd = new scala.util.Random(20260818L)
    // hashes drawn from portableHashMod's range [0, 2^31), with
    // repeats (multiset votes) and tie-prone tiny arrays
    val rows = Seq.fill(400)(
      Seq.fill(rnd.nextInt(40) + 1)(math.abs(rnd.nextLong()) % 2147483647L))
    val got = rows.toDF("hs").select(
      TextFunctions.simhash16(col("hs")).as("native"),
      TextFunctions.simhash16Hof(col("hs")).as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"${r.getLong(0)} vs ${r.getLong(1)}"))
    // edges: empty array (all votes 0 -> sig 0), single hash
    val edges = Seq(Seq.empty[Long], Seq(0L), Seq(2147483646L))
    val e = edges.toDF("hs").select(
      TextFunctions.simhash16(col("hs")).as("n"),
      TextFunctions.simhash16Hof(col("hs")).as("h")).collect()
    e.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // the documented null-element contract: votes -1 on every bit,
    // the HOF's when(null).otherwise(-1) fallthrough
    val withNull = Seq(Tuple1(Seq[java.lang.Long](65535L, null)))
      .toDF("hs").select(
        TextFunctions.simhash16(col("hs")).as("n"),
        TextFunctions.simhash16Hof(col("hs")).as("h")).collect()
    assert(withNull.head.getLong(0) == withNull.head.getLong(1))
  }

  test("structurally equal instances compare equal (subexpression sharing)") {
    val a = BpeApplyAll(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      List(("a", "b")))
    val b = a.copy()
    assert(a == b && a.hashCode == b.hashCode)
  }
}
