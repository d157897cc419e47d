package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: measure steady-state shuffle-write bytes for named gates at
  * sf0.01 under EXACTLY the ShuffleBudgetSpec session shape (local[4],
  * 4 shuffle partitions, warm pass first) — the numbers its budgets are
  * pinned from. */
object ShuffleMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .appName("graft-shuffle-measure")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir).count() // warm
      val l = new SparkListener {
        @volatile var write = 0L
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
          synchronized {
            val m = sc.stageInfo.taskMetrics
            if (m != null) write += m.shuffleWriteMetrics.bytesWritten
          }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        var prev = -1L
        var stable = 0
        while (stable < 3) {
          Thread.sleep(50)
          val cur = l.write
          if (cur == prev) stable += 1 else stable = 0
          prev = cur
        }
        println(f"$name%-20s shuffleWrite=${l.write}%,d")
      } finally spark.sparkContext.removeSparkListener(l)
      System.out.flush()
    }
    spark.stop()
  }
}
