package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions SQL surface: the native expressions must
  * be callable from plain SQL in a session built with GraftExtensions,
  * with the same semantics as the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot / sorted_intersect_size / unpack_frame register and evaluate via SQL") {
    spark // force the shared session (and its SparkContext) to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // a NEW SparkSession over the SAME SparkContext, with the
    // extensions applied at build time (the spark.sql.extensions path);
    // never stopped — stopping would kill the shared context
    val ext = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(ext ne spark, "extensions require a freshly built session")
      val r = ext.sql(
        """SELECT
          |  vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
          |  vec_dot(array(1.0d), array(1.0d, 2.0d)) AS mismatch,
          |  sorted_intersect_size(array(1L, 3L, 7L, 9L),
          |                        array(3L, 4L, 9L, 12L)) AS s,
          |  unpack_frame(X'0100FF00DC05000000000000000000FF') AS f,
          |  unpack_frame(X'0102') AS torn,
          |  simhash(array(7L), 16) AS sh
          |""".stripMargin).head()
      assert(r.getDouble(0) == 32.0)
      assert(r.isNullAt(1), "length mismatch must be NULL, not truncation")
      assert(r.getInt(2) == 2)
      val frame = r.getSeq[Int](3)
      assert(frame == Seq(1, 255, 1500, 0, 0, 0, 0, 0xFF00),
        s"frame: $frame")
      assert(r.isNullAt(4), "non-16-byte payloads must hit the guard")
      // a single hash's set bits ARE its signature (every vote is +1
      // on its set bits, -1 elsewhere)
      assert(r.getLong(5) == 7L, s"simhash: ${r.getLong(5)}")
      // the width must be a literal: it compiles into the expression
      intercept[Exception](ext.sql(
        "SELECT simhash(array(1L), cast(rand() * 16 as int))").collect())
      // arity errors surface at analysis, not as a wrong answer
      val e = intercept[Exception](ext.sql("SELECT vec_dot(array(1.0d))").head())
      assert(e.getMessage.contains("vec_dot"), e.getMessage)
      // the plain session stays extension-free (registration is
      // per-session-build, no global mutation)
      val plain = intercept[Exception](
        spark.sql("SELECT vec_dot(array(1.0d), array(1.0d))").head())
      assert(plain.getMessage.toLowerCase.contains("vec_dot"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
