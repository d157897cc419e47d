package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does a repartition(col)+localCheckpoint leaf carry its
  * HashPartitioning into later plans — i.e. does a subsequent src-keyed
  * SMJ skip re-exchanging the checkpointed side? Prints the joined plan
  * with autoBroadcast off so the join can't hide behind a broadcast.
  *
  * MEASURED ANSWER (Spark 4.1.2, this probe): NO — with AQE on, the
  * checkpoint captures `physicalPlan.outputPartitioning` from an
  * AdaptiveSparkPlanExec BEFORE execution, which reports Unknown, so the
  * LogicalRDD leaf advertises no partitioning and EnsureRequirements
  * re-exchanges it in every consumer (coalescing on or off — see
  * PROBE_COALESCE). Round-10 tried pre-partitioning the traversals'
  * symmetrized adjacency on this assumption and reverted it: +1 full
  * adjacency exchange in every build, zero reuse. Keep this probe as the
  * regression check if a future Spark version starts preserving it. */
object ProbePartitioning {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .appName("graft-probe-part")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("PROBE_COALESCE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (0L until 2000L).map(i => (i % 97, i)).toDF("src", "dst")

    for (pre <- Seq(false, true)) {
      val sym = (if (pre) e.repartition(col("src")) else e)
        .localCheckpoint(eager = false)
      sym.count()
      val frontier = (0L until 500L).map(i => (i % 97, i)).toDF("src", "h")
      val j = frontier.join(sym, "src").groupBy("src").count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val nEx = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
      println(s"[part] prePartitioned=$pre exchanges=$nEx")
      if (args.contains("-v")) println(plan)
    }
    spark.stop()
  }
}
