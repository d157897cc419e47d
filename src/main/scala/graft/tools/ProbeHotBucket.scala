package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure the StreamingDedup hot-bucket cap doing its job.
  *
  * Adversarial geometry: EVERY doc lands in one (band, key) bucket — a
  * single stateful group pinned to one task, the exact shape the cap
  * exists for (a boilerplate-heavy shingle bucket at 100 TB). One doc in
  * 400 is "new" so emission stays bounded and the measured cost is the
  * store scan, not output materialization. Batch mode, one group
  * invocation — this times the handler loop itself.
  *
  * Expected: uncapped per-arrival work is O(stored) → O(n²) total in one
  * task; capped is O(maxBucket) per arrival → linear. Pass sizes as
  * args (default 20k/40k/80k).
  */
object ProbeHotBucket {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(20000, 40000, 80000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-probe-hot-bucket")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: Int, cap: Int): (Long, Long, Double) = {
      val keyed = spark.range(n).select(col("id"),
        (col("id") % 400 === 0).as("isNew"),
        array(lit(0L)).as("keys"))
      val t0 = System.nanoTime()
      val events = graft.streaming.StreamingDedup
        .statefulEventsFromKeys(keyed, maxBucket = cap)
      val (pairs, over) = events.toDF()
        .agg(sum(when(!col("overflow"), 1L).otherwise(0L)),
          sum(when(col("overflow"), 1L).otherwise(0L)))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
        .head()
      (pairs, over, (System.nanoTime() - t0) / 1e9)
    }
    // warmup
    run(2000, 1024)
    println("n, variant, pairs, overflow, sec")
    sizes.foreach { n =>
      for ((label, cap) <- Seq("capped-1024" -> 1024,
                               "uncapped" -> Int.MaxValue)) {
        val (p, o, s) = run(n, cap)
        println(f"$n%7d  $label%-12s pairs=$p%9d overflow=$o%8d $s%8.2f s")
      }
    }
    spark.stop()
  }
}
