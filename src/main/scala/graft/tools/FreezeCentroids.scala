package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: prints the centroids of the seed-42 constrained-k-means fit on
  * sf0.001 (the sharedKmeans gate parameters) as Scala literals — the
  * provenance of ClusterQueries.FrozenCentroids, which puts the
  * nearest-centroid assignment kernel under the driver oracle via a
  * non-iterative gate (kmeans_assign). Shortest-round-trip Double.toString
  * parses back to the identical bits in both Spark and DuckDB.
  */
object FreezeCentroids {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = graft.core.Tables.table(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_partkey").as("id"),
        graft.functions.Distances.pack(col("p_size"), col("p_retailprice")).as("qi"))
    val m = graft.kmeans.ConstrainedKMeans.fit(
      pts, "id", "qi", nClusters = 8, kAnon = 4, seed = 42, maxLloyd = 5)
    m.centroids.toSeq.sortBy(_._1).foreach { case (cid, c) =>
      println(s"    $cid -> Array(${c.map(_.toString).mkString(", ")}),")
    }
    spark.stop()
  }
}
