package graft.tools

import graft.core.Tables
import graft.dbscan.{Cc, Dbscan, Outputs}
import graft.functions.Distances
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference-scale headline run (BASELINE.md): DBSCAN-CC over
  * data10k_6attr.csv (10,000 × 6 QI dims + label), ε sweep 10..19,
  * minPts=k=10 — the exact configuration whose cartesian join OOM'd the
  * reference's 2 GB VM three times (hs_err_pid*.log). Prints per-ε
  * metrics and total wall time.
  */
object ReferenceScale {
  def main(args: Array[String]): Unit = {
    val epsRange = if (args.nonEmpty) args.map(_.toDouble).toSeq
      else Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 18.0, 19.0)
    val spark = Tables.configure(SparkSession.builder())
      .master("local[32]")
      .appName("graft-reference-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Tables.readPointsCsv(spark, "/root/reference/data10k_6attr.csv", 6)
    val pts = raw.select(Distances.pack(
      col("x0"), col("x1"), col("x2"), col("x3"), col("x4"), col("x5")).as("qi"),
      col("label"))

    val t0 = System.nanoTime()
    // value-collapsed, reference-faithful (SURVEY §2.7 G1)
    val verts = pts.groupBy("qi", "label").agg(count(lit(1)).as("w"))
    val sorted = verts.orderBy("qi", "label")
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))
    val withId = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema).cache()
    withId.count()

    // the production sweep path: the ε-join runs ONCE at max(ε) and each
    // radius slices the persisted distance-carrying superset
    val (recs, best) = Dbscan.sweep(withId, "id", "qi", epsRange,
      minPts = 10, k = 10, Cc, weightCol = Some("w"), blockDims = 3)
    recs.foreach { r =>
      println(f"eps=${r.eps}%5.1f clusters=${r.nClusters}%4d noise=${r.nNoise}%5d " +
        f"clusterErr=${r.clusterError}%12.2f noiseErr=${r.noiseError}%12.2f ${r.seconds}%7.1fs")
    }
    best.foreach(_._2.unpersist())
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
