package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-15 stationary-side pre-partitioning batch:
  * does `repartition(n, key).localCheckpoint(eager = false)` carry its
  * HashPartitioning through the LogicalRDD so that per-round joins and
  * aggregations keyed the same way skip the stationary side's Exchange?
  *
  * Prints the physical plan of (a) a join of an UNPARTITIONED checkpoint
  * with a small keyed frame, (b) the same join against a PRE-PARTITIONED
  * checkpoint, and (c) a groupBy on the pre-partitioned key — the
  * decision evidence for the batch (guide §2.4: two operations keyed the
  * same way share one exchange).
  */
object ProbeStationary {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .appName("graft-probe-stationary")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val edges = (0L until 200000L).map(i => (i % 5000, i % 7919)).toDF("src", "dst")
    val frontier = (0L until 50L).toDF("id")

    val plainCp = edges.localCheckpoint(eager = false)
    val n = spark.sessionState.conf.numShufflePartitions
    val partCp = edges.repartition(n, col("src")).localCheckpoint(eager = false)

    println("=== (a) join against UNPARTITIONED checkpoint ===")
    frontier.join(plainCp, frontier("id") === plainCp("src"))
      .select(col("dst")).explain("formatted")

    println("=== (b) join against PRE-PARTITIONED checkpoint ===")
    frontier.join(partCp, frontier("id") === partCp("src"))
      .select(col("dst")).explain("formatted")

    println("=== (c) groupBy(src) on the PRE-PARTITIONED checkpoint ===")
    partCp.groupBy("src").agg(count(lit(1))).explain("formatted")

    println("=== (d) join of two co-partitioned checkpoints on the key ===")
    val ranks = edges.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1.0))
      .repartition(n, col("id")).localCheckpoint(eager = false)
    partCp.join(ranks.withColumnRenamed("id", "src"), "src")
      .select(col("dst"), col("pr")).explain("formatted")

    println("=== (e) dropDuplicates(src,dst) on a src-partitioned frame ===")
    edges.repartition(n, col("src")).dropDuplicates("src", "dst")
      .explain("formatted")


    println("=== (f) groupBy(src) on EAGER pre-partitioned checkpoint ===")
    val partCpEager = edges.repartition(n, col("src")).localCheckpoint(eager = true)
    partCpEager.groupBy("src").agg(count(lit(1))).explain("formatted")

    println("=== (g) same but AQE off during checkpoint build ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val partCpNoAqe = edges.repartition(n, col("src")).localCheckpoint(eager = false)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    partCpNoAqe.groupBy("src").agg(count(lit(1))).explain("formatted")

    println("=== (h) outputPartitioning visibility ===")
    def part(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning.toString
      }.getOrElse("no LogicalRDD")
    println("lazy+AQE:  " + part(partCp))
    println("eager+AQE: " + part(partCpEager))
    println("lazy-AQE:  " + part(partCpNoAqe))

    println("=== (i) round-shaped join: lazy frontier cp vs stationary sym ===")
    // stationary: AQE off at checkpoint-compile time, partitioned+sorted
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sym = edges.repartition(n, col("src")).sortWithinPartitions("src")
      .localCheckpoint(eager = false)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val layer = frontier.localCheckpoint(eager = false)
    val round = layer.join(sym, layer("id") === sym("src"))
      .select(sym("dst").as("id")).distinct()
    round.explain("formatted")
    val cnt = round.count()
    println(s"round count = $cnt")
    println("--- final adaptive plan after execution ---")
    round.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Sort") || l.contains("ExistingRDD") ||
        l.contains("AQEShuffleRead"))
      .foreach(println)

    println("=== (j) co-partitioned stationary x stationary join ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ranks2 = edges.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1.0))
      .repartition(n, col("id")).sortWithinPartitions("id")
      .localCheckpoint(eager = false)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val cj = sym.join(ranks2.withColumnRenamed("id", "src"), "src")
      .select(col("dst"), col("pr"))
    cj.explain("formatted")
    println(s"cj count = ${cj.count()}")
    cj.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Sort") || l.contains("ExistingRDD"))
      .foreach(println)

    spark.stop()
  }
}
