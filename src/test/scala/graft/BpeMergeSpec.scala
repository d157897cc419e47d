package graft

import graft.operators.BpeMerge
import org.apache.spark.sql.functions._

/** Pins greedy BPE semantics the oracle exercises only at corpus scale:
  * left-to-right non-overlapping merges, tie-breaking, early stop, and
  * the marker structure of merged symbols.
  */
class BpeMergeSpec extends GraftSuite {
  import spark.implicits._

  private val M = BpeMerge.Marker

  private def syms(fit: BpeMerge.Fit): Map[Long, Seq[String]] =
    fit.syms.select(col("doc_id"),
        BpeMerge.symbols(col("sym")).as("a"))
      .as[(Long, Seq[String])].collect().toMap

  test("most frequent pair merges; repeats merge non-overlapping") {
    // "x y x y": pair (x,y) twice -> both occurrences merge in one round
    val d = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val fit = BpeMerge.fit(d, "doc_id", "text", 1)
    assert(fit.merges.map(m => (m.lhs, m.rhs, m.cnt)) == Seq(("x", "y", 3L)))
    val out = syms(fit)
    assert(out(1L) == Seq(s"x${M}y", s"x${M}y"))
    assert(out(2L) == Seq(s"x${M}y", "z"))
    fit.release()
  }

  test("overlapping run 'x x x' merges greedily left-to-right: once") {
    val d = Seq((1L, "x x x")).toDF("doc_id", "text")
    val fit = BpeMerge.fit(d, "doc_id", "text", 1)
    assert(fit.merges.head.lhs == "x" && fit.merges.head.rhs == "x")
    assert(syms(fit)(1L) == Seq(s"x${M}x", "x"))
    fit.release()
  }

  test("count ties break to the lexicographically first pair") {
    // (a,b) and (b,c) both appear once; (a,b) < (b,c)
    val d = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val fit = BpeMerge.fit(d, "doc_id", "text", 1)
    assert(fit.merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
    fit.release()
  }

  test("rounds compose: a merged symbol participates in later merges") {
    // round 1 merges (a,b) [2 occurrences]; round 2 merges (a&b, c)
    val d = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val fit = BpeMerge.fit(d, "doc_id", "text", 2)
    assert(fit.merges.map(m => (m.lhs, m.rhs, m.cnt)) ==
      Seq(("a", "b", 2L), (s"a${M}b", "c", 2L)))
    assert(syms(fit)(1L) == Seq(s"a${M}b${M}c"))
    fit.release()
  }

  test("stops early when no pairs remain; empty/one-token docs survive") {
    val d = Seq((1L, "solo"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    val fit = BpeMerge.fit(d, "doc_id", "text", 3)
    assert(fit.merges.isEmpty)
    val out = syms(fit)
    assert(out(1L) == Seq("solo") && out(2L).isEmpty && out(3L).isEmpty)
    fit.release()
  }
}
