package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Pins the sketch contracts that the oracle gates exercise only at one
  * geometry: Bloom filters never produce false NEGATIVES, count-min never
  * UNDER-estimates, and both probe paths agree with the direct
  * re-computation of their hash scheme.
  */
class SketchesSpec extends GraftSuite {
  import spark.implicits._

  private val keys = (0 until 200).map(i => s"key$i")
  private val inSet = keys.take(120)

  test("hll registers max-merge: sketch(a ∪ b) equals merged shard sketches") {
    // the mergeability contract behind hll_distinct's 100 TB story:
    // shards sketch independently, registers merge by element-wise max
    val toks = graft.core.Tables.table(spark, sf0001, "documents")
      .select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "source", "w", 64, 24)
        .as[(String, Long, Long)].collect().toSet
    val parity = graft.functions.PolyHash.poly_hash(col("w")) % 2
    val shardA = toks.where(parity === 0)
    val shardB = toks.where(parity === 1)
    val merged = Sketches.hllRegisters(shardA, "source", "w", 64, 24)
      .unionByName(Sketches.hllRegisters(shardB, "source", "w", 64, 24))
      .groupBy("source", "bucket")
      .agg(org.apache.spark.sql.functions.max("m").as("m"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == regs(toks), "max-merge must equal the union sketch")
    assert(regs(shardA) != regs(toks), "shard A alone must differ (sanity)")
  }

  test("bloom: no false negatives at any geometry") {
    val ks = inSet.toDF("k")
    for (m <- Seq(256, 1024); kh <- Seq(2, 4)) {
      val words = Sketches.buildBloom(ks, "k", m, kh)
      val misses = ks.where(!Sketches.mightContain(col("k"), words, m, kh))
        .count()
      assert(misses == 0, s"m=$m k=$kh dropped members")
    }
  }

  test("bloom: probe agrees with a driver-side recomputation") {
    val m = 512; val kh = 3
    val words = Sketches.buildBloom(inSet.toDF("k"), "k", m, kh)
    def refContains(s: String): Boolean = {
      val h1 = graft.functions.PolyHash.hash(s) % m
      val h2 = graft.functions.PolyHash.hash(s + "#") % (m - 1) + 1
      (0 until kh).forall { i =>
        val p = ((h1 + i * h2) % m).toInt
        (words(p / 32) & (1L << (p % 32))) != 0
      }
    }
    val engine = keys.toDF("k")
      .where(Sketches.mightContain(col("k"), words, m, kh))
      .as[String].collect().toSet
    assert(engine == keys.filter(refContains).toSet)
  }

  test("cms: estimates never under-count and are exact sans collision") {
    // zipf-ish multiset: key i appears (200 - i) times
    val occ = (0 until 50).flatMap(i => Seq.fill(200 - i)(s"tok$i")).toDF("k")
    val w = 128; val d = 4
    val sketch = Sketches.countMin(occ, "k", w, d)
    val exact = occ.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(exact.select("k"), "k", sketch, w, d)
    val joined = exact.join(est, Seq("k"))
      .select(col("k"), col("exact"), col("est")).collect()
    assert(joined.length == 50)
    joined.foreach(r =>
      assert(r.getLong(2) >= r.getLong(1), s"under-estimate on ${r.getString(0)}"))
    // wide sketch, 50 keys: the vast majority of rows must be collision-free
    val exactRows = joined.count(r => r.getLong(2) == r.getLong(1))
    assert(exactRows >= 40, s"only $exactRows/50 exact at w=$w d=$d")
  }

  test("bloom words fit 32 bits and cover all probe positions") {
    val ks = inSet.toDF("k")
    val rows = Sketches.bloomWords(ks, "k", 1024, 3).collect()
    rows.foreach { r =>
      val word = r.getLong(1)
      assert(word > 0 && word < (1L << 32), s"word out of 32-bit range: $word")
    }
  }
  test("mgCandidates: superset guarantee under counter pressure") {
    // 8 distinct values, k = 4 (3 counters) — the sketch MUST decrement.
    // One genuinely heavy value (freq 400/682 > n/4) plus skewed tail,
    // shuffled deterministically and spread across 4 partitions.
    val heavy = Seq.fill(400)("hot")
    val tail = (0 until 7).flatMap(i => Seq.fill(6 * (i + 1))(s"cold$i"))
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(heavy ++ tail)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(stream.map(Tuple1(_)), 4)
    ).toDF("v")
    val cands = Sketches.mgCandidates(df, "v", k = 4)
      .as[String].collect().toSet
    assert(cands.contains("hot"),
      s"true heavy hitter must survive the sketch, got $cands")
    // bound: each of the 4 partitions contributes at most k-1 = 3
    assert(cands.size <= 12, s"too many candidates: $cands")
    // end-to-end determinism of the two-phase form: exact recount of the
    // candidates + strict threshold finds exactly the true heavy hitters
    val n = stream.size
    val exact = df.join(broadcast(Sketches.mgCandidates(df, "v", 4)),
        Seq("v"), "left_semi")
      .groupBy("v").count()
      .where(col("count") * 4 > n)
      .as[(String, Long)].collect().toMap
    assert(exact == Map("hot" -> 400L), exact)
  }

  test("mgCandidates: k wider than the alphabet keeps every key, no nulls") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq(null, "c"))
      .map(Tuple1(_)).toDF("v")
    val cands = Sketches.mgCandidates(df, "v", k = 16)
      .as[String].collect().toSet
    assert(cands == Set("a", "b", "c"), cands)
  }
}
