package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time the named queries (or all) on a given sf dir, with
  * immediate unbuffered per-query output and a hard per-query timeout. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .appName("graft-timing")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val t0 = System.nanoTime()
      // GRAFT_TIME_NOOP=1 switches to the bench's noop-sink protocol
      // (§1.4: count() lets Catalyst prune output columns, so the two
      // can time very different plans — use noop when chasing a bench
      // number)
      val useNoop = sys.env.get("GRAFT_TIME_NOOP").contains("1")
      val fut = scala.concurrent.Future {
        if (useNoop) {
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          -1L
        } else graft.SparkEntry.queries(name)(spark, sfDir).count()
      }(scala.concurrent.ExecutionContext.global)
      try {
        val n = scala.concurrent.Await.result(fut,
          scala.concurrent.duration.Duration(120, "s"))
        println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          println(f"$name%-20s TIMEOUT >120s")
          spark.sparkContext.cancelAllJobs()
        case e: Throwable =>
          println(f"$name%-20s FAILED ${e.getMessage.take(200)}")
      }
      System.out.flush()
    }
    spark.stop()
  }
}
