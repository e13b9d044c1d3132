package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generic as-of join semantics on a hand-built fixture. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the most recent right row at-or-before each left row") {
    val left = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 30L, "c"), (2, 15L, "d"))
      .toDF("k", "lts", "tag")
    val right = Seq((1, 10L, 100), (1, 25L, 200), (2, 99L, 300))
      .toDF("k", "rts", "v")
    val got = Joins.asofJoin(left, right, "k", "lts", "rts", Seq("rts", "v"))
      .orderBy(col("k"), col("lts"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(4)) None else Some(r.getInt(4))))
    assert(got.toSeq == Seq(
      (1, 10L, "a", Some(100)), // inclusive: right at the same ts visible
      (1, 20L, "b", Some(100)),
      (1, 30L, "c", Some(200)),
      (2, 15L, "d", None))) // right row is in the future
  }

  test("asofJoinBucketed matches asofJoin exactly on the reference streams") {
    val frames = Channels.frames(spark, sfDir)
      .select(col("target_id"), col("tsm"), col("event_id"), col("ch"))
    val commands = Channels.commands(spark, sfDir)
      .select(col("target_id"), col("tsm").as("cmd_tsm"), col("ovr"),
        col("event_id").as("cmd_eid"))
    val plain = Joins.asofJoin(frames, commands, "target_id", "tsm", "cmd_tsm",
      Seq("cmd_tsm", "ovr"), rightTieBreak = Some("cmd_eid"))
    val bucketed = Joins.asofJoinBucketed(frames, commands, "target_id", "tsm",
      "cmd_tsm", Seq("cmd_tsm", "ovr"), rightTieBreak = "cmd_eid",
      bucketMs = 3600000L)
    val cols = Seq("target_id", "tsm", "event_id", "ch", "cmd_tsm", "ovr")
    val a = plain.select(cols.map(col): _*).orderBy(col("event_id")).collect().toSeq
    val b = bucketed.select(cols.map(col): _*).orderBy(col("event_id")).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("asofJoinBucketed: small buckets (many empty) still fill correctly") {
    import spark.implicits._
    val left = Seq((1, 1000L, "a"), (1, 50000L, "b"), (2, 2000L, "c"))
      .toDF("k", "lts", "tag")
    val right = Seq((1, 500L, 1L, 10), (1, 900L, 2L, 20))
      .toDF("k", "rts", "rid", "v")
    val got = Joins.asofJoinBucketed(left, right, "k", "lts", "rts",
      Seq("v"), rightTieBreak = "rid", bucketMs = 100L)
      .orderBy(col("k"), col("lts"))
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
    assert(got.toSeq == Seq(
      (1, 1000L, Some(20)), // carried across 1 empty bucket
      (1, 50000L, Some(20)), // carried across ~490 empty buckets
      (2, 2000L, None))) // key 2 has no right rows at all
  }

  test("property: bucketed and plain as-of agree on randomized fixtures") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val nKeys = 1 + rnd.nextInt(3)
      val left = (1 to 40).map { i =>
        (rnd.nextInt(nKeys), rnd.nextInt(1000).toLong, i.toLong)
      }
      val right = (1 to 25).map { i =>
        (rnd.nextInt(nKeys), rnd.nextInt(1000).toLong, (1000 + i).toLong, rnd.nextInt(100))
      }
      import spark.implicits._
      val l = left.toDF("k", "lts", "lid")
      val r = right.toDF("k", "rts", "rid", "v")
      val bucketMs = Seq(7L, 50L, 100000L)(trial % 3) // incl. one giant bucket
      val a = Joins.asofJoin(l, r, "k", "lts", "rts", Seq("rts", "v"),
          rightTieBreak = Some("rid"))
        .orderBy(col("lid")).collect().map(_.toSeq).toSeq
      val b = Joins.asofJoinBucketed(l, r, "k", "lts", "rts", Seq("rts", "v"),
          rightTieBreak = "rid", bucketMs = bucketMs)
        .orderBy(col("lid")).collect().map(_.toSeq).toSeq
      assert(a == b, s"trial $trial (bucketMs=$bucketMs) diverged")
    }
  }

  test("asofJoin preserves every left row (no filtering, no duplication)") {
    val frames = Channels.frames(spark, sfDir)
      .select(col("target_id"), col("tsm"), col("event_id"), col("ch"))
    val commands = Channels.commands(spark, sfDir)
      .select(col("target_id"), col("tsm").as("cmd_tsm"), col("ovr"))
    val joined = Joins.asofJoin(frames, commands, "target_id", "tsm", "cmd_tsm",
      Seq("cmd_tsm", "ovr"))
    assert(joined.count() == frames.count())
  }

  test("saltedEquiJoin is row-identical to the plain join under heavy skew") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i % 7L else 42L, i.toLong)).toDF("k", "lid")
    val right = (0 to 6).map(k => (k.toLong, s"payload_$k"))
      .toDF("k", "payload")
      .unionByName(Seq((42L, "hot_payload")).toDF("k", "payload"))
    val plain = left.join(right, Seq("k"))
      .select("k", "lid", "payload").collect().map(_.toSeq).toSeq
    val salted = Joins.saltedEquiJoin(left, right, "k", col("lid"), salts = 8)
      .select("k", "lid", "payload").collect().map(_.toSeq).toSeq
    assert(salted.sortBy(_.toString) == plain.sortBy(_.toString))
    // and the salt really spreads the hot key across buckets
    val spread = left.filter(col("k") === 42L)
      .select(pmod(hash(col("lid")), lit(8)).as("s"))
      .distinct().count()
    assert(spread >= 6, s"salt spread only $spread of 8 buckets")
  }
}
