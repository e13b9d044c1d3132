package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-twin invariants for the reference-semantics queries. */
class ReferenceSpec extends SparkSpec {

  test("q13 validation cascade emits the reference's verbatim messages") {
    val msgs = Reference.q13ValidateCascade(spark, sfDir)
      .select(col("message")).collect().map(_.getString(0)).toSet
    assert(msgs.exists(_.startsWith("Invalid channel count. Expected 1-8, got ")))
    assert(msgs.contains("Duration must be at least 1ms"))
    assert(msgs.contains("Channel values must be between 1000-2000 or -1 to skip"))
    assert(msgs.exists(m => m.startsWith("Channels updated for target ") &&
      m.endsWith("ms timeout")))
  }

  test("q17 effective channels: one row per target, override implies remaining > 0") {
    val rows = Reference.q17EffectiveChannels(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    assert(rows.map(_.getInt(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val overridden = r.getInt(r.fieldIndex("is_overridden")) == 1
      val remaining = r.getLong(r.fieldIndex("remaining_ms"))
      if (overridden) assert(remaining > 0) else assert(remaining == 0)
      val eff = r.getInt(r.fieldIndex("effective_ch"))
      val src = r.getString(r.fieldIndex("source"))
      if (overridden) assert(src == "override" && eff == r.getInt(r.fieldIndex("ovr_ch")))
      else assert(src == "live" && eff == r.getInt(r.fieldIndex("live_ch")))
    }
  }

  test("q18 sentinel merge: merged value honors the -1 skip rule") {
    Reference.q18SentinelMerge(spark, sfDir).collect().foreach { r =>
      val live = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val ovr = if (r.isNullAt(3)) None else Some(r.getInt(3))
      val merged = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val expected = ovr.filter(_ != -1).orElse(live)
      assert(merged == expected)
    }
  }

  test("q19 forward fill: value holds between observations per target") {
    val rows = Reference.q19ForwardFill(spark, sfDir)
      .orderBy(col("target_id"), col("hour_ms")).collect()
    // After the first non-null value, filled_ch is never null again.
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val filled = rs.map(r => if (r.isNullAt(2)) None else Some(r.getInt(2)))
      val afterFirst = filled.dropWhile(_.isEmpty)
      assert(afterFirst.forall(_.nonEmpty))
    }
  }

  test("q21 sessionize: events within a session gap-bounded, sessions ordered") {
    val gapMs = 14400000L
    val rows = Reference.q21Sessionize(spark, sfDir).collect()
    rows.groupBy(r => r.getLong(0)).foreach { case (_, sess) =>
      val ordered = sess.sortBy(_.getLong(1))
      // session ids dense from 1; consecutive sessions separated by > gap
      assert(ordered.map(_.getLong(1)).toSeq == (1L to ordered.length))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) - a.getLong(4) > gapMs) // next start - prev end
        case _ => ()
      }
      ordered.foreach { s =>
        assert(s.getLong(5) == s.getLong(4) - s.getLong(3)) // duration = end - start
      }
    }
  }

  test("q22 snapshot: all 8 registry targets present with names and macs") {
    val rows = Reference.q22SnapshotDerived(spark, sfDir).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getString(1)).toSeq == (1 to 8).map(i => s"Drone_$i"))
    assert(rows.forall(_.getString(2).matches("([0-9A-F]{2}:){5}[0-9A-F]{2}")))
  }

  test("q84 lerp resample: grid values match a local interpolation, bounded by neighbors") {
    val rows = Reference.q84LerpResample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cell = 21600000L
    val events = graft.Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.unix_millis(
          org.apache.spark.sql.functions.col("ts")).as("tsm"),
        org.apache.spark.sql.functions.col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = events.groupBy(_._1)
    val expected = byUser.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val (lo, hi) = (sorted.map(_._3).min, sorted.map(_._3).max)
      val start = (lo + cell - 1) / cell * cell
      val stop = hi / cell * cell
      (start to stop by cell).flatMap { t =>
        val prev = sorted.filter(_._3 <= t).lastOption
        val next = sorted.find(_._3 > t)
        (prev, next) match {
          case (Some(p), Some(n)) =>
            val v = p._4 + (n._4 - p._4) *
              ((t - p._3).toDouble / (n._3 - p._3).toDouble)
            Some((u, t) -> math.rint(v * 1e6) / 1e6)
          case _ => None
        }
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val want = expected((r.getLong(0), r.getLong(1)))
      assert(math.abs(r.getDouble(2) - want) < 1e-9,
        s"user ${r.getLong(0)} t ${r.getLong(1)}: ${r.getDouble(2)} vs $want")
    }
  }
}
