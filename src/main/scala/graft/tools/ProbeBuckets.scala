package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure (band, key) bucket-size distributions for the two
  * streaming-dedup gate geometries (MinHash text bands, embedding sign
  * bands) at each SF — the numbers the StreamingDedup default hot-bucket
  * cap is sized from. */
object ProbeBuckets {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[8]")
      .appName("graft-probe-buckets")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      // text geometry: 2-shingles, 16 bands x 4 rows (the dedup_stream
      // gate) — through the SHIPPED key builder, so the cap is sized
      // against exactly what the store routes on
      val d = graft.core.Tables.table(spark, dir, "documents")
      val textBuckets = graft.streaming.StreamingDedup
        .textBandKeys(d, "doc_id", "text", None, 2, 16, 4)
        .select(posexplode(col("keys")).as(Seq("band", "key")))
        .groupBy("band", "key").count()
        .agg(max("count").as("max"), expr("percentile(count, 0.99)").as("p99"),
          count(lit(1)).as("buckets"))
        .head()
      // embedding geometry: 64 bands x 5 bits (the embed_stream gate)
      val e = graft.core.Tables.table(spark, dir, "embeddings")
      val embBuckets = e
        .select(col("vec_id"), posexplode(
          graft.functions.VecKernels.sign_bands(
            col("embedding").cast("array<double>"), dim = 64, bits = 5,
            bands = 64)).as(Seq("band", "key")))
        .groupBy("band", "key").count()
        .agg(max("count").as("max"), expr("percentile(count, 0.99)").as("p99"),
          count(lit(1)).as("buckets"))
        .head()
      println(s"$sf text  max=${textBuckets.getLong(0)} p99=${textBuckets.getDouble(1)} buckets=${textBuckets.getLong(2)}")
      println(s"$sf embed max=${embBuckets.getLong(0)} p99=${embBuckets.getDouble(1)} buckets=${embBuckets.getLong(2)}")
    }
    spark.stop()
  }
}
