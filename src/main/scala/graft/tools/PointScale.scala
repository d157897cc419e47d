package graft.tools

import graft.core.Tables
import graft.dbscan.{Cc, Dbscan}
import graft.functions.Distances
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Point-count scaling sweep of the DBSCAN path — the demonstration that
  * the grid ε-join ([[graft.operators.NeighborJoin]]) makes >10k points
  * FEASIBLE, not just "correct": the reference engine's cartesian join
  * OOM'd three times on its own 10k workload (BASELINE.md), and this tool
  * measures the engine at 10k / 100k / 1M synthetic points drawn from the
  * same 6-dim integer distribution.
  *
  * Scale-up protocol (constant density): each size resamples the
  * reference's 10k empirical rows (deterministic per-index PolyHash-style
  * fold, no RNG), DILATES every coordinate by (n/10k)^(1/6), and adds ±2
  * integer jitter per dim — marginal shapes are preserved while per-ε-ball
  * population stays roughly constant, so a bigger input means MORE
  * clusters, not an ever-denser one. That is the regime a growing corpus
  * actually lives in, and the regime where a scaling exponent is
  * meaningful: with a FIXED domain the ε-graph's edge count itself grows
  * Θ(n²) for any implementation (every algorithm must count those
  * neighbors), and the engine's value-collapsed weighted vertices would
  * saturate at the domain's cell count — flat by construction, measuring
  * the data, not the plan. The jitter also keeps the collapsed vertex set
  * growing with n (≈ distinct cells), so the ε-join, CC, and aggregation
  * all scale with the input instead of the 10k support.
  *
  * Default run: single ε=15.0 DBSCAN (minPts=10, k=10, blockDims=3 — the
  * ReferenceScale configuration) per size; pass sizes as args. Prints one
  * line per size (n, vertices, edges-proxy via cluster count, seconds)
  * plus the fitted log-log exponent between consecutive sizes.
  */
object PointScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(10000, 100000, 1000000)
    val eps = sys.env.getOrElse("SPARK_GRAFT_SCALE_EPS", "15.0").toDouble
    // machine-layout knobs ride env with this box's values as defaults,
    // so the tool runs anywhere the reference CSV was copied to
    val csv = sys.env.getOrElse("SPARK_GRAFT_SCALE_CSV",
      "/root/reference/data10k_6attr.csv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-point-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // empirical base: the reference's 10k × 6-int rows, driver-held ONLY
    // as the bounded resampling table (10k × 6 ints, the ReferenceScale
    // contract — never the generated corpus)
    val base = Tables.readPointsCsv(spark, csv, 6)
      .select(array((0 until 6).map(i => col(s"x$i").cast("int")): _*).as("xs"))
      .collect()
      .map(_.getSeq[Int](0).toArray)

    val results = sizes.map { n =>
      val dilate = math.pow(n / 10000.0, 1.0 / 6.0)
      // deterministic resample + dilate + jitter, generated distributed
      // (spark.range scales; nothing corpus-sized touches the driver):
      // coordinate d = dilated base row (hash-picked) + jitter in [-2, 2]
      val dimCols = (0 until 6).map { d =>
        val lut = typedLit(base.map(r => math.round(r(d) * dilate).toInt).toSeq)
        (element_at(lut, pmod(xxhash64(col("id")), lit(10000L)).cast("int") + 1)
          + pmod(xxhash64(col("id"), lit(d + 11)), lit(5L)).cast("int") - 2)
          .as(s"x$d")
      }
      val packed = spark.range(n.toLong)
        .select(col("id") +: dimCols: _*)
        .select(col("id"),
          Distances.pack((0 until 6).map(d => col(s"x$d")): _*).as("qi"))
      // value-collapsed weighted vertices with distributed dense ids —
      // the production lift (PrefixScan.denseIds, never rdd.zipWithIndex)
      val verts0 = packed.groupBy("qi").agg(count(lit(1)).as("w"))
      val verts = graft.operators.PrefixScan.denseIds(
          verts0.withColumn("qik", concat_ws(",", col("qi"))),
          Seq("qik"), "vid", numParts = 32)
        .select(col("vid").as("id"), col("qi"), col("w"))
        .cache()
      val nVerts = verts.count()
      val t0 = System.nanoTime()
      val (recs, best) = Dbscan.sweep(verts, "id", "qi", Seq(eps),
        minPts = 10, k = 10, Cc, weightCol = Some("w"), blockDims = 3)
      val secs = (System.nanoTime() - t0) / 1e9
      best.foreach(_._2.unpersist())
      verts.unpersist()
      val r = recs.head
      println(f"n=$n%8d vertices=$nVerts%8d eps=$eps%5.1f " +
        f"clusters=${r.nClusters}%6d noise=${r.nNoise}%8d ${secs}%8.1fs")
      (n, secs)
    }
    results.sliding(2).foreach {
      case Seq((n1, t1), (n2, t2)) =>
        val ex = math.log(t2 / t1) / math.log(n2.toDouble / n1)
        println(f"exponent $n1%d -> $n2%d: $ex%.2f")
      case _ =>
    }
    spark.stop()
  }
}
