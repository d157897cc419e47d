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
