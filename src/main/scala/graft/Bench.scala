package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) at local[32] and prints ONE JSON
  * line {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is fully materialized via count() (not collect — results can
  * be wide); the first query pays session/codegen warmup, so a trivial
  * warmup scan runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + parquet footer reads off the timed path
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: $e")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-20s ${secs}%8.2fs")
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
