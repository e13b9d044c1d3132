package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries candidate generation: the survival guarantee, the
  * buffer bound, and layout invariance. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("survival guarantee: every item above N/(m+1) is a candidate, buffer stays bounded") {
    // skewed stream: token "hot<i>" appears 100-i times (heavy),
    // plus a long tail of singletons that forces constant eviction
    val heavy = (0 until 20).flatMap(i => Seq.fill(100 - i)(s"hot$i"))
    val tail = (0 until 5000).map(i => s"cold$i")
    val all = new scala.util.Random(7).shuffle((heavy ++ tail).toVector)
    val m = 64
    val n = all.size.toLong
    val cands = all.toDF("token")
      .agg(HeavyHitters.candidates(m, col("token")))
      .head().getSeq[String](0)
    assert(cands.size <= m, s"candidate set exceeded m: ${cands.size}")
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong)
    counts.filter(_._2 > n / (m + 1)).keys.foreach { t =>
      assert(cands.contains(t), s"item $t above N/(m+1) must survive")
    }
  }

  test("layout invariance: candidates cover the guarantee under any partitioning") {
    val heavy = Seq.fill(500)("the") ++ Seq.fill(400)("of")
    val tail = (0 until 3000).map(i => s"t$i")
    val df = (heavy ++ tail).toDF("token")
    Seq(1, 7, 32).foreach { parts =>
      val cands = df.repartition(parts)
        .agg(HeavyHitters.candidates(32, col("token")))
        .head().getSeq[String](0)
      assert(cands.contains("the") && cands.contains("of"),
        s"parts=$parts: heavy items must survive merges, got ${cands.size} candidates")
      assert(cands.size <= 32)
    }
  }
}
