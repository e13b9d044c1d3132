package graft.operators

import graft.SparkSpec

/** Relational-inventory invariants not covered by the DuckDB hash gate. */
class RelationalSpec extends SparkSpec {

  test("q36 approx distinct stays within 5% of the exact count per group") {
    val exact = Relational.q12DistinctUsers(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.q36ApproxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e")
    }
  }

  test("q09 top customers: exactly 10, strictly ordered by revenue") {
    val rows = Relational.q09TopCustomers(spark, sfDir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q35 set ops: union >= intersect, except <= base") {
    val m = Reference.q35SetOps(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("union") >= m("intersect"))
    assert(m("union") >= m("except"))
  }
}
