package graft.tools

import graft.functions.{PrunedCentroidIndex, VecKernels}
import org.apache.spark.sql.catalyst.util.ArrayData

/** Dev profiler: pruned-exact argmin vs the exhaustive top-1 kernel at
  * the cluster counts where the >8k assign regime lives. Pure-JVM (the
  * kernels are static calls over ArrayData — no Spark session), so the
  * numbers are the per-row kernel cost, not job overhead.
  *
  * Prints, per (k, dim, distribution): exhaustive ns/row, pruned ns/row,
  * the speedup, the fraction of member-distance evaluations the pruning
  * skipped, and a full-agreement check (labels AND distances must match
  * bit-for-bit — the probe doubles as a large-scale exactness sweep).
  */
object ProbePrunedAssign {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000)
    for {
      k <- Seq(8192, 65536)
      dim <- Seq(2, 8)
      clustered <- Seq(true, false)
    } {
      val rnd = new scala.util.Random(42 + k + dim)
      def vec(): Array[Double] =
        if (clustered) {
          val c = rnd.nextInt(64)
          Array.fill(dim)(c * 100.0 + rnd.nextGaussian() * 5)
        } else Array.fill(dim)(rnd.nextDouble() * 6400)
      val cents = IndexedSeq.tabulate(k)(i => i.toLong -> vec())
      val ids = cents.map(_._1).toArray
      val intIds = cents.indices.toArray
      val flat = cents.flatMap(_._2).toArray
      val idx = new PrunedCentroidIndex(ids, flat, dim)
      val queries = Array.fill(rows)(ArrayData.toArrayData(vec()))

      // warmup both paths (JIT), then time
      queries.take(500).foreach { q =>
        idx.nearest(q); VecKernels.topCentroids(q, intIds, flat, dim, false, 1)
      }
      var agree = true
      val t0 = System.nanoTime()
      val exhaustive = queries.map(q =>
        VecKernels.topCentroids(q, intIds, flat, dim, false, 1))
      val tExh = System.nanoTime() - t0
      val t1 = System.nanoTime()
      val pruned = queries.map(idx.nearest)
      val tPru = System.nanoTime() - t1
      var i = 0
      while (i < rows) {
        val e = exhaustive(i).getStruct(0, 2)
        val p = pruned(i)
        if (e.getInt(0).toLong != p.getLong(0) ||
            e.getDouble(1) != p.getDouble(1)) agree = false
        i += 1
      }
      val tag = if (clustered) "clustered" else "uniform"
      println(f"[pruned] k=$k%6d dim=$dim%2d $tag%-9s " +
        f"exhaustive ${tExh / rows}%8d ns/row  pruned ${tPru / rows}%8d ns/row  " +
        f"speedup ${tExh.toDouble / tPru}%6.1fx  agree=$agree")
      require(agree, "pruned diverged from exhaustive — DO NOT SHIP")
    }
  }
}
