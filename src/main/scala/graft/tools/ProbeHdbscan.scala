package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the dendrogram-sweep gates: times each internal stage
  * of hdbscan_stability separately (shared-MST build, slice explode, CC,
  * final aggregation) so regressions attribute to a stage instead of a
  * gate total. */
object ProbeHdbscan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    // stage 1: memoized MST build (cold) — the gate's sharedMst
    t("gate run 1 (cold)") {
      graft.SparkEntry.queries("hdbscan_stability")(spark, sfDir).count()
    }
    // warm rep, full
    t("gate run 2 (warm)") {
      graft.SparkEntry.queries("hdbscan_stability")(spark, sfDir).count()
    }
    // decomposed warm rep using the same memoized forest
    val f = t("sharedMst fetch") {
      graft.queries.ClusterQueries.probeMst(spark, sfDir)
    }
    val off = t("off head()") {
      f.labels.agg(max("id")).head().getLong(0) + 1
    }
    val cuts = Seq(25L, 50L, 75L, 100L, 125L, 150L, 175L, 199L)
    val cutLit = array(cuts.map(lit(_)): _*)
    val edges = f.edges
      .select(col("a"), col("b"), col("w"),
        posexplode(cutLit).as(Seq("ci", "cut")))
      .where(col("w") <= col("cut"))
      .select((col("ci") * off + col("a")).as("src"),
        (col("ci") * off + col("b")).as("dst"))
    t("slice explode count") { edges.count() }
    val comp = t("CC.run (plan)") {
      graft.graph.ConnectedComponents.run(edges)
    }
    t("CC result count") { comp.count() }
    // single-round microscope: where does the ~0.7s/round build go?
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val e0 = t("e0 normalize+cp") {
      val x = edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct()
        .localCheckpoint(eager = false)
      x.count(); x
    }
    def withSrcMin(df: DataFrame): DataFrame =
      df.join(df.groupBy("src").agg(min("dst").as("m")), "src")
    for (k <- 0 until 3) {
      val sym = t(s"r$k sym") { e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))) }
      val lmin = t(s"r$k withSrcMin(sym)") { withSrcMin(sym) }
      val large = t(s"r$k large") {
        lmin.withColumn("m", least(col("m"), col("src")))
          .where(col("dst") > col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
          .where(col("src") =!= col("dst"))
      }
      val oriented = t(s"r$k oriented sel") {
        large.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
      }
      val ocp = t(s"r$k oriented cp(toRdd)") { oriented.localCheckpoint(eager = false) }
      val wm = t(s"r$k withSrcMin(or)") { withSrcMin(ocp) }
      val small = t(s"r$k small construct") {
        wm.select(col("dst").as("src"), col("m").as("dst"))
          .union(wm.select(col("src"), col("m").as("dst")))
          .where(col("src") =!= col("dst"))
          .distinct()
      }
      val scp = t(s"r$k small cp(toRdd)") { small.localCheckpoint(eager = false) }
      t(s"r$k checksum job") {
        scp.agg(count(lit(1)),
          coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
            lit(java.math.BigDecimal.ZERO))).head()
      }
    }
    val lab = comp
      .select(expr(s"CAST(id DIV ${off}L AS INT)").as("ci"),
        (col("component") % off).as("component"))
    val sizes = lab.groupBy("ci", "component").agg(count(lit(1)).as("n"))
    t("final agg count") {
      sizes.groupBy(col("component").as("cluster"))
        .agg(count(lit(1)).as("n_cuts"),
          min(element_at(cutLit, col("ci") + 1)).as("birth_cut"),
          sum("n").as("sum_sizes"),
          max("n").as("max_size"))
        .orderBy("cluster").count()
    }
    spark.stop()
  }
}
