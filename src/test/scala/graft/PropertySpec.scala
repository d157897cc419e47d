package graft

import graft.functions.Distances
import graft.operators.NeighborJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.1): grid-blocked ε-join ≡ cartesian oracle on
  * random point sets in the reference data's observed ranges. Uses raw
  * ScalaCheck generators with fixed seeds (no scalatestplus bridge in the
  * offline dependency set). */
class PropertySpec extends GraftSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("grid eps-join equals cartesian oracle on random points (property)") {
    val gen = for {
      n <- Gen.choose(20, 120)
      dims <- Gen.oneOf(2, 3)
      seed <- Gen.choose(0L, 10000L)
      eps <- Gen.choose(1, 12)
    } yield (n, dims, seed, eps.toDouble)
    samples(gen, 8).foreach { case (n, dims, seed, eps) =>
      val rnd = new scala.util.Random(seed)
      val df = (0 until n)
        .map(i => (i.toLong, Array.fill(dims)(rnd.nextInt(60).toDouble)))
        .toDF("id", "pt")
      val grid = NeighborJoin.epsJoinGrid(df, "id", "pt", eps, blockDims = dims.min(2))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val cross = NeighborJoin.epsJoinCross(df, "id", "pt", eps)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(grid == cross, s"n=$n dims=$dims seed=$seed eps=$eps")
    }
  }

  test("sorted merge-intersect equals array_intersect size (property)") {
    val gen = for {
      na <- Gen.choose(0, 40)
      nb <- Gen.choose(0, 40)
      seed <- Gen.choose(0L, 9999L)
    } yield (na, nb, seed)
    samples(gen, 10).foreach { case (na, nb, seed) =>
      val rnd = new scala.util.Random(seed)
      // distinct sorted draws from a small universe → real overlaps
      val a = rnd.shuffle((0L until 60L).toList).take(na).sorted.toArray
      val b = rnd.shuffle((0L until 60L).toList).take(nb).sorted.toArray
      val got = Seq((a, b)).toDF("a", "b").select(
        graft.functions.VecKernels.sorted_intersect_count(col("a"), col("b")),
        size(array_intersect(col("a"), col("b"))))
        .as[(Int, Int)].head()
      assert(got._1 == got._2, s"na=$na nb=$nb seed=$seed")
    }
  }

  test("inverted-index BM25 equals fixed-bag BM25 on random corpora (property)") {
    // same idf/tf/norm arithmetic, different summation discipline (exact
    // integer lift vs literal-order float fold) — equal within 1e-6, and
    // the postings form covers exactly the docs containing >= 1 term
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val gen = for {
      nDocs <- Gen.choose(3, 25)
      maxLen <- Gen.choose(1, 40)
      nTerms <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 9999L)
    } yield (nDocs, maxLen, nTerms, seed)
    samples(gen, 8).foreach { case (nDocs, maxLen, nTerms, seed) =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until nDocs).map { i =>
        val len = rnd.nextInt(maxLen + 1)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val terms = rnd.shuffle(vocab).take(nTerms)
      val fixed = graft.operators.LexicalRank.bm25(docs, "doc_id", "text", terms)
        .as[(Long, Double)].collect().toMap
      val inv = graft.operators.LexicalRank
        .bm25Inverted(docs, "doc_id", "text", terms)
        .as[(Long, Double)].collect().toMap
      for ((id, s) <- inv)
        assert(math.abs(s - fixed(id)) <= 1e-6,
          s"doc $id: $s vs ${fixed(id)} (nDocs=$nDocs terms=$terms seed=$seed)")
      val expected = fixed.filter(_._2 > 0).keySet
      assert(expected.subsetOf(inv.keySet),
        s"positive-scoring docs missing from postings: seed=$seed")
    }
  }

  test("chunkTokens tiles every token exactly per (len, stride) (property)") {
    val gen = for {
      n <- Gen.choose(0, 60)
      chunkLen <- Gen.choose(1, 12)
      stride <- Gen.choose(1, 12)
    } yield (n, chunkLen, stride)
    samples(gen, 10).foreach { case (n, chunkLen, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val out = graft.operators.Chunking.chunkTokens(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
          chunkLen, stride)
        .select("chunk_idx", "start", "n_tokens")
        .as[(Int, Int, Long)].collect().sortBy(_._1)
      if (n == 0) assert(out.isEmpty)
      else {
        val expStarts = 1 to n by stride
        assert(out.map(_._2).toSeq == expStarts.toSeq,
          s"starts n=$n len=$chunkLen stride=$stride")
        assert(out.forall(c => c._3 == math.min(chunkLen, n - c._2 + 1)),
          s"lengths n=$n len=$chunkLen stride=$stride")
        // stride <= chunkLen covers every token
        if (stride <= chunkLen) {
          val covered = out.flatMap(c => c._2 until (c._2 + c._3.toInt)).toSet
          assert(covered == (1 to n).toSet)
        }
      }
    }
  }

  test("native L1/dot kernels equal the higher-order-function forms (property)") {
    val gen = for {
      dims <- Gen.choose(1, 32)
      seed <- Gen.choose(0L, 9999L)
    } yield (dims, seed)
    samples(gen, 8).foreach { case (dims, seed) =>
      val rnd = new scala.util.Random(seed)
      val a = Array.fill(dims)(rnd.nextDouble() * 100 - 50)
      val b = Array.fill(dims)(rnd.nextDouble() * 100 - 50)
      val row = Seq((a, b)).toDF("a", "b")
      val got = row.select(
        Distances.l1(col("a"), col("b")),
        Distances.l1Hof(col("a"), col("b")),
        Distances.dot(col("a"), col("b")),
        Distances.dotHof(col("a"), col("b")))
        .as[(Double, Double, Double, Double)].head()
      assert(got._1 == got._2, s"l1 kernel != HOF form dims=$dims seed=$seed")
      assert(got._3 == got._4, s"dot kernel != HOF form dims=$dims seed=$seed")
    }
  }
}
