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

  test("cosine_sim / sign_bands / minhash_sig / nfc_normalize from SQL") {
    val r = sql.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c1,
        |  cosine_sim(array(0.0d, 0.0d), array(1.0d, 0.0d)) AS c0,
        |  size(sign_bands(array(0.5d, -1.0d), 2, 4, 8)) AS nb,
        |  size(minhash_sig(array(7L, 9L, 42L), 16)) AS nm,
        |  nfc_normalize('é') AS nfc""".stripMargin).head()
    assert(r.getDouble(0) == 1.0, "identical vectors score 1")
    assert(r.getDouble(1) == 0.0, "zero-norm guard yields 0, not NaN")
    assert(r.getInt(2) == 8, "one key per band")
    assert(r.getInt(3) == 16, "one min per permutation")
    assert(r.getString(4) == "é", "combining acute folds to é")
  }

  test("minhash_sig folds full-range inputs into the poly-hash domain") {
    // xxhash64-scale longs used to overflow h·a and emit negative
    // signature garbage through Java's sign-preserving %; the kernel now
    // folds each input once, so sig(h) == sig(floorMod(h, P)) and every
    // entry is non-negative
    val P = graft.functions.PolyHash.Prime
    val raw = Seq(Long.MaxValue - 11, -987654321098765432L, 42L)
    val folded = raw.map(h => Math.floorMod(h, P))
    val r = sql.sql(
      s"""SELECT minhash_sig(array(${raw.mkString("L,")}L), 16) AS a,
         |  minhash_sig(array(${folded.mkString("L,")}L), 16) AS b"""
        .stripMargin).head()
    val (a, b) = (r.getSeq[Long](0), r.getSeq[Long](1))
    assert(a == b, "full-range input must hash like its folded form")
    assert(a.forall(v => v >= 0 && v < P), s"entries outside [0, P): $a")
  }

  test("SQL registration plans the same expression tree as the Column form") {
    import org.apache.spark.sql.functions.{col, expr}
    import sql.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0), "a b c d"))
      .toDF("a", "b", "t")
    def tree(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.analyzed.expressions.head match {
        case al: org.apache.spark.sql.catalyst.expressions.Alias => al.child
        case e => e
      }
    val cases = Seq(
      "l1_dist" -> (df.selectExpr("l1_dist(a, b)"),
        df.select(graft.functions.VecKernels.l1_dist(col("a"), col("b")))),
      "cosine_sim" -> (df.selectExpr("cosine_sim(a, b)"),
        df.select(graft.functions.Distances.cosine(col("a"), col("b")))),
      "poly_hash" -> (df.selectExpr("poly_hash(t)"),
        df.select(graft.functions.PolyHash.poly_hash(col("t")))),
      "sign_bands" -> (df.selectExpr("sign_bands(a, 2, 4, 8)"),
        df.select(graft.functions.VecKernels.sign_bands(col("a"),
          dim = 2, bits = 4, bands = 8))),
      "minhash_sig" -> (df.selectExpr("minhash_sig(array(7L, 9L), 16)"),
        df.select(graft.functions.TextKernels.minhash_sig(
          expr("array(7L, 9L)"), 16))))
    cases.foreach { case (name, (sqlForm, colForm)) =>
      assert(tree(sqlForm).semanticEquals(tree(colForm)),
        s"$name: SQL plans ${tree(sqlForm)} but Column plans ${tree(colForm)}")
    }
  }
}
