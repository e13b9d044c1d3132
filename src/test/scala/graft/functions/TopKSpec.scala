package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded top-k aggregator: exact interchangeability with the
  * row_number window form, partition-layout invariance (the map-side
  * merge must be associative), and bound enforcement. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(42)
    // duplicate scores on purpose — tie-break by id must decide
    Seq.tabulate(500) { i =>
      (i % 7L, i.toLong, math.floor(rnd.nextDouble() * 50) / 100.0)
    }.toDF("grp", "id", "score")
  }

  test("aggregator equals the row_number window form exactly") {
    val df = fixture
    val viaAgg = df.groupBy(col("grp"))
      .agg(TopK.topK(5, col("id"), col("score")).as("topk"))
      .select(col("grp"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("grp"), (col("pos") + 1).as("rk"), col("s.id").as("id"),
        col("s.score").as("score"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("grp"), col("rk").cast("int"), col("id"), col("score"))
    assert(viaAgg.collect().map(_.toSeq).toSet ==
      viaWindow.collect().map(_.toSeq).toSet)
  }

  test("result is invariant to partition layout (merge associativity)") {
    val df = fixture
    def run(parts: Int) = df.repartition(parts)
      .groupBy(col("grp")).agg(TopK.topK(3, col("id"), col("score")).as("topk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.toSeq)).toMap
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("bound enforcement: never more than k, fewer when the group is small") {
    val df = Seq((1L, 1L, 0.5), (1L, 2L, 0.4), (2L, 3L, 0.9)).toDF("grp", "id", "score")
    val got = df.groupBy(col("grp"))
      .agg(TopK.topK(5, col("id"), col("score")).as("topk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).size).toMap
    assert(got == Map(1L -> 2, 2L -> 1))
  }
}
