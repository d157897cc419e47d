package graft

import org.apache.spark.sql.SparkSession

/** The SQL face of the native kernels: a session built with
  * GraftExtensions can call them from plain SQL. Uses its own
  * SparkSession (extensions are fixed at session build). */
class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val sql: SparkSession = {
    // getOrCreate would return the shared test session (extensions only
    // apply at session build), so register on a derived session instead
    val s = SparkTestBase.spark.newSession()
    GraftExtensions.register(s)
    s
  }

  test("poly_hash callable from SQL and equals the kernel") {
    val got = sql.sql("SELECT poly_hash('abc') AS h").head().getLong(0)
    assert(got == graft.functions.PolyHash.hash("abc"))
  }

  test("l1_dist / dot_product callable from SQL") {
    val r = sql.sql(
      """SELECT l1_dist(array(1.0d, 2.0d), array(4.0d, 0.0d)) AS l1,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp""".stripMargin)
      .head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 11.0)
  }

  test("shingle_hashes callable from SQL") {
    val n = sql.sql("SELECT size(shingle_hashes('a b c d', 2)) AS n")
      .head().getInt(0)
    assert(n == 3)
  }

  test("sorted_intersect_count callable from SQL") {
    val n = sql.sql(
      """SELECT sorted_intersect_count(array(1L, 3L, 5L, 9L),
        |  array(3L, 4L, 9L)) AS n""".stripMargin).head().getInt(0)
    assert(n == 2)
  }

  test("winnow_fingerprints / simhash60 callable from SQL, equal kernels") {
    val r = sql.sql(
      """SELECT winnow_fingerprints('a b c d e f', 2, 4) AS wf,
        |  simhash60('a b c d e f', 2) AS sh""".stripMargin).head()
    assert(r.getSeq[Long](0) ==
      graft.functions.TextKernels.winnowFingerprints("a b c d e f", 2, 4).toSeq)
    assert(r.getLong(1) == graft.functions.TextKernels.simhash60("a b c d e f", 2))
    val b = sql.sql("SELECT cdc_boundaries('abcdefghij', 8, 1) AS b")
      .head().getSeq[Int](0)
    assert(b == Seq(8, 9, 10), s"mod 1 accepts every window end: $b")
  }

  test("wrong arity fails analysis, not execution") {
    val e = intercept[Exception] {
      sql.sql("SELECT l1_dist(array(1.0d))").collect()
    }
    assert(e.getMessage != null)
  }
}
