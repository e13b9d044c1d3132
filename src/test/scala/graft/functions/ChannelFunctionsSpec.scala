package graft.functions

import graft.SparkSpec
import graft.functions.ChannelFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** P1/P2/P3/ST2 scalar semantics against the reference's exact values
  * (`src/receiver/main.cpp:68-71`, `TargetManager.h:202-208,169-178`,
  * `src/transmitter/main.cpp:199-212`). */
class ChannelFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def rescaleAll(xs: Seq[Int]): Seq[Int] =
    xs.toDF("x").select(sbusRescale(col("x")).as("y"))
      .collect().map(_.getInt(0)).toSeq

  test("P1 rescale: exact reference anchor values") {
    // Arduino map(x, 1000, 2000, 172, 1811) with truncating int division.
    assert(rescaleAll(Seq(1000, 2000, 1500)) == Seq(172, 1811, 991))
  }

  test("P1 rescale: extrapolates outside the input range (0 -> -1467)") {
    // The reference's zeroed initial frame renders as -1467 SBUS
    // (SURVEY.md §4.3.1).
    assert(rescaleAll(Seq(0, 3000)) == Seq(-1467, 3450))
  }

  test("P1 rescale: monotone non-decreasing over the int domain") {
    val xs = (-500 to 3000 by 7).toSeq
    val ys = rescaleAll(xs)
    assert(ys.zip(ys.tail).forall { case (a, b) => a <= b })
  }

  test("P1 rescale: in-range inputs stay within [172, 1811]") {
    val ys = rescaleAll((1000 to 2000).toSeq)
    assert(ys.forall(y => y >= 172 && y <= 1811))
  }

  test("P2 macFormat: known value and colon-hex shape") {
    // (1 & 0xFFFFFF) * 2654435761 = 0x9E3779B1.
    val got = Seq(1L).toDF("k").select(macFormat(col("k"))).first().getString(0)
    assert(got == "00:00:9E:37:79:B1")
    assert(got.matches("([0-9A-F]{2}:){5}[0-9A-F]{2}"))
  }

  test("P2 macFormat: total over large keys (no ANSI overflow)") {
    val big = Seq(Long.MaxValue, 4294967296L, 0L).toDF("k")
      .select(macFormat(col("k"))).collect().map(_.getString(0))
    assert(big.forall(_.matches("([0-9A-F]{2}:){5}[0-9A-F]{2}")))
  }

  test("P3 overrideRemainingMs: floors at zero") {
    val got = Seq((5000L, 4000L), (5000L, 6000L)).toDF("deadline", "now")
      .select(overrideRemainingMs(col("deadline"), col("now")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1000L, 0L))
  }

  test("ST2 sentinelMerge: -1 skips, value wins") {
    val got = Seq((-1, 7), (1500, 7)).toDF("in", "cur")
      .select(sentinelMerge(col("in"), col("cur")))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(7, 1500))
  }

  test("ST2 sentinelMergeArray: element-wise merge") {
    val got = Seq((Seq(-1, 1500, -1), Seq(1, 2, 3)))
      .toDF("in", "cur")
      .select(sentinelMergeArray(col("in"), col("cur")))
      .first().getSeq[Int](0)
    assert(got == Seq(1, 1500, 3))
  }

  // ---- scalacheck properties over the engine-internal scala twin ----

  private val chanGen: Gen[Seq[Int]] =
    Gen.listOfN(8, Gen.oneOf(Gen.const(-1), Gen.choose(1000, 2000)))

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p).passed)

  test("ST2 property: all-sentinel vector is the merge identity") {
    check(Prop.forAll(chanGen) { cur =>
      graft.streaming.Engine.merge(Seq.fill(8)(-1), cur) == cur
    })
  }

  test("ST2 property: merge is idempotent") {
    check(Prop.forAll(chanGen, chanGen) { (in, cur) =>
      val once = graft.streaming.Engine.merge(in, cur)
      graft.streaming.Engine.merge(in, once) == once
    })
  }

  test("ST2 property: non-sentinel values always win") {
    check(Prop.forAll(chanGen, chanGen) { (in, cur) =>
      graft.streaming.Engine.merge(in, cur).zip(in).zip(cur).forall {
        case ((m, n), o) => if (n == -1) m == o else m == n
      }
    })
  }
}
