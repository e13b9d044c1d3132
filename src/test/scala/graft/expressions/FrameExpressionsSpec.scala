package graft.expressions

import graft.SparkSpec
import graft.expressions.FrameFunctions.unpackFrame
import graft.streaming.Sinks
import org.apache.spark.sql.functions._

/** Wire-frame decode: exact inverse of the 16-byte LE pack, length
  * guard to NULL, codegen participation. */
class FrameExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("unpack_frame is the exact inverse of packFrame") {
    val frames = Seq(
      Seq(1000, 2000, 1500, 172, 1811, 0, 65535, 1),
      Seq.fill(8)(1500),
      Seq(0, 0, 0, 0, 0, 0, 0, 0))
    val df = frames.map(f => Tuple1(Sinks.packFrame(f))).toDF("payload")
    val got = df.select(unpackFrame(col("payload")).as("ch"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(got.toSeq == frames)
  }

  test("length guard: payloads != 16 bytes decode to NULL") {
    val df = Seq(
      Tuple1(Array[Byte](1, 2, 3)), // short
      Tuple1(Array.fill[Byte](17)(0)), // long
      Tuple1(Array.fill[Byte](16)(0))) // valid
      .toDF("payload")
    val got = df.select(unpackFrame(col("payload")).as("ch")).collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0) && !got(2).isNullAt(0))
  }

  test("uint16 semantics: high-byte values decode unsigned") {
    // 0xFFDC = 65500 — must not sign-extend
    val payload = Array[Byte](0xDC.toByte, 0xFF.toByte) ++ Array.fill[Byte](14)(0)
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(unpackFrame(col("payload"))).head().getSeq[Int](0)
    assert(got.head == 65500)
  }

  test("decode participates in whole-stage codegen") {
    // payload must depend on a column — a pure literal would be
    // constant-folded before any codegen could be observed
    val df = spark.range(3)
      .select(when(col("id") >= 0, lit(Array.fill[Byte](16)(1))).as("payload"))
      .select(unpackFrame(col("payload")).as("ch"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("unpack_frame")),
      s"unpack_frame not inside a codegen span:\n$plan")
    assert(df.collect().forall(_.getSeq[Int](0) == Seq.fill(8)(257))) // 0x0101
  }
}
