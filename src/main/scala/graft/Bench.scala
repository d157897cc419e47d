package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) at local[32] and prints ONE JSON
  * line {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is fully materialized via count() (not collect — results can
  * be wide); the first query pays session/codegen warmup, so a trivial
  * warmup scan runs first.
  *
  * Besides wall time the line carries per-query shuffle read/write bytes
  * and peak task execution memory (from a stage-completion listener), so
  * plan regressions show up as measured shuffle volume, not just seconds —
  * and a "failed" list: failing queries are excluded from `value` instead
  * of silently contributing their elapsed time.
  */
object Bench {

  /** Accumulates stage-level metrics between [[reset]] calls. Listener
    * delivery is async, so [[settle]] polls until two consecutive
    * snapshots agree. */
  private final class StageMetrics extends SparkListener {
    @volatile private var shuffleRead = 0L
    @volatile private var shuffleWrite = 0L
    @volatile private var peakMem = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          peakMem = math.max(peakMem, m.peakExecutionMemory)
        }
      }
    def reset(): Unit = synchronized {
      shuffleRead = 0L; shuffleWrite = 0L; peakMem = 0L
    }
    private def snapshot(): (Long, Long, Long) =
      synchronized((shuffleRead, shuffleWrite, peakMem))
    def settle(): (Long, Long, Long) = {
      var prev = snapshot()
      var i = 0
      while (i < 20) {
        Thread.sleep(50)
        val cur = snapshot()
        if (cur == prev) return cur
        prev = cur
        i += 1
      }
      prev
    }
  }

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
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    // warmup: JIT + parquet footer reads off the timed path
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      metrics.reset()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      val (sr, sw, pm) = metrics.settle()
      System.err.println(
        f"[bench] $name%-20s ${secs}%8.2fs ${if (ok) "" else "FAILED"}%s")
      (name, secs, ok, sr, sw, pm)
    }
    def r3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _, _, _, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, _, _, sr, sw, pm) =>
      "\"" + k + s"""":{"shuffle_read":$sr,"shuffle_write":$sw,"peak_mem":$pm}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _, _, _) => v }.sum
    // stage metrics first (their own parseable line), the compact headline
    // JSON LAST — the driver keeps a bounded tail of stdout, and the line it
    // must parse has to survive that truncation with per-query times intact
    println(s"""{"metric":"stage_metrics","stage_metrics":$sh,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
