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

  test("property: engine fit matches an in-memory reference on random corpora") {
    // independent greedy-BPE reference: explicit left-to-right
    // non-overlapping merge over symbol vectors (no string replace), so
    // a divergence in the engine's padded-string rewrite would surface
    def refMerge(doc: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < doc.length) {
        if (i + 1 < doc.length && doc(i) == a && doc(i + 1) == b) {
          out += s"$a$M$b"; i += 2
        } else { out += doc(i); i += 1 }
      }
      out.result()
    }
    def refFit(docs0: Map[Long, Vector[String]], rounds: Int)
    : (Map[Long, Vector[String]], Seq[(String, String, Long)]) = {
      var docs = docs0
      val merges = Seq.newBuilder[(String, String, Long)]
      var r = 0
      var stop = false
      while (r < rounds && !stop) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        docs.valuesIterator.foreach(d => d.indices.dropRight(1).foreach(i =>
          counts((d(i), d(i + 1))) = counts.getOrElse((d(i), d(i + 1)), 0L) + 1))
        if (counts.isEmpty) stop = true
        else {
          val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          merges += ((a, b, c))
          docs = docs.map { case (k, d) => k -> refMerge(d, a, b) }
        }
        r += 1
      }
      (docs, merges.result())
    }
    val rnd = new scala.util.Random(42)
    // tiny alphabet forces heavy repeats, adjacency ties and overlap runs
    for (trial <- 1 to 8) {
      val corpus = (0L until 6L).map { id =>
        id -> Vector.fill(2 + rnd.nextInt(10))(s"w${rnd.nextInt(3)}")
      }.toMap
      val df = corpus.toSeq
        .map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val fit = BpeMerge.fit(df, "doc_id", "text", 3)
      val (refDocs, refMerges) = refFit(corpus, 3)
      assert(fit.merges.map(m => (m.lhs, m.rhs, m.cnt)) == refMerges,
        s"trial $trial merge sequences diverge")
      assert(syms(fit) == refDocs, s"trial $trial symbol tables diverge")
      fit.release()
    }
  }
}
