package graft

import graft.operators.ProductQuant
import org.apache.spark.sql.functions._

class ProductQuantSpec extends GraftSuite {
  import spark.implicits._

  private val dim = 8
  private val m = 2
  // deterministic pseudo-random corpus; first ks rows double as codebook
  private val rnd = new scala.util.Random(11)
  private val vecs: Seq[(Long, Array[Double])] =
    (0L until 40L).map(i => i -> Array.fill(dim)(rnd.nextDouble()))
  private val cb = ProductQuant.codebookFromSamples(
    vecs.take(4).map(_._2), m)

  private def vecDf = vecs.map { case (i, v) => (i, v.toSeq) }
    .toDF("vec_id", "embedding")

  test("codebook slicing: entry c of book j is subvector j of sample c") {
    assert(cb.m == m && cb.ks == 4 && cb.subDim == dim / m)
    assert(cb.books(1)(2).toSeq == vecs(2)._2.slice(dim / 2, dim).toSeq)
  }

  test("sample vectors encode to their own codebook index") {
    val codes = ProductQuant.encode(vecDf, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    (0 until cb.ks).foreach { c =>
      assert(codes(c.toLong) == Seq.fill(m)(c), s"sample $c")
    }
  }

  test("encode picks the argmin sub-centroid (brute cross-check)") {
    val codes = ProductQuant.encode(vecDf, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.foreach { case (id, v) =>
      val expect = (0 until m).map { j =>
        val sub = v.slice(j * cb.subDim, (j + 1) * cb.subDim)
        cb.books(j).zipWithIndex
          .map { case (e, c) =>
            (BigDecimal(l2sq(sub, e)).setScale(6,
              BigDecimal.RoundingMode.HALF_UP), c)
          }.min._2
      }
      assert(codes(id) == expect, s"vec $id")
    }
  }

  test("encode plans as a shuffle-free projection") {
    val plan = ProductQuant.encode(vecDf, "vec_id", "embedding", cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }

  test("adc distance to a sample vector is the exact squared L2") {
    // sample vectors reconstruct losslessly, so ADC(q, sample) must be
    // the true ||q - sample||² up to the 6dp gate rounding
    val q = vecs(20)
    val got = ProductQuant.adcTopK(
        ProductQuant.encode(vecDf, "vec_id", "embedding", cb),
        Seq(q), cb, k = 40)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._2 -> r._3).toMap
    (0 until cb.ks).foreach { c =>
      val exact = q._2.zip(vecs(c)._2).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(got(c.toLong) - exact) < 1e-6, s"sample $c")
    }
  }

  test("ivfAdcTopK agrees with full ADC on the probed candidate set") {
    // coarse quantizer: first 3 vectors as centroids
    val cents = vecs.take(3).map { case (i, v) => i.toInt -> v }.toMap
    val q = vecDf.where(col("vec_id") === 7L)
    val got = ProductQuant.ivfAdcTopK(vecDf, "vec_id", "embedding",
        cents, cb, q, k = 40, nprobe = 3)
      .as[(Long, Long, Double, Int)].collect()
    // nprobe = nlist probes EVERY bucket → identical to exhaustive ADC
    val full = ProductQuant.adcTopK(
        ProductQuant.encode(vecDf, "vec_id", "embedding", cb),
        Seq(7L -> vecs(7)._2), cb, k = 40)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.sortBy(_._4).toSeq == full.sortBy(_._4).toSeq)
    // nprobe = 1 returns a subset of the exhaustive ranking's pairs
    val pruned = ProductQuant.ivfAdcTopK(vecDf, "vec_id", "embedding",
        cents, cb, q, k = 40, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    val fullDist = full.map(r => r._2 -> r._3).toMap
    assert(pruned.nonEmpty && pruned.length < full.length)
    pruned.foreach(r => assert(fullDist(r._2) == r._3))
  }

  test("adcTopK ranks by (dist asc, id asc) and excludes the query") {
    val q = vecs(5)
    val rows = ProductQuant.adcTopK(
        ProductQuant.encode(vecDf, "vec_id", "embedding", cb),
        Seq(q), cb, k = 10)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(rows.length == 10)
    assert(!rows.exists(_._2 == 5L))
    assert(rows.map(_._4).toSeq == (1 to 10))
    val sorted = rows.map(r => (r._3, r._2)).toSeq
    assert(sorted == sorted.sorted)
  }
}
