package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler: decompose the per-round driver cost of one CC round into
  * sub-steps on an EVOLVING edge set (each round's survivor feeds the
  * next, exactly like ConnectedComponents.run), under codegen on/off. */
object ProbePlanning {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .appName("graft-probe-planning")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[plan] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }
    val f = graft.queries.ClusterQueries.probeMst(spark, sfDir)
    val off = f.labels.agg(max("id")).head().getLong(0) + 1
    val cuts = Seq(25L, 50L, 75L, 100L, 125L, 150L, 175L, 199L)
    val cutLit = array(cuts.map(lit(_)): _*)
    val edges = f.edges
      .select(col("a"), col("b"), col("w"),
        posexplode(cutLit).as(Seq("ci", "cut")))
      .where(col("w") <= col("cut"))
      .select((col("ci") * off + col("a")).as("src"),
        (col("ci") * off + col("b")).as("dst"))

    def withSrcMin(df: DataFrame): DataFrame =
      df.join(df.groupBy("src").agg(min("dst").as("m")), "src")

    def loop(tag: String, wsc: String, rounds: Int): Unit = {
      spark.conf.set("spark.sql.codegen.wholeStage", wsc)
      var e = edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct()
        .localCheckpoint(eager = false)
      e.count()
      for (k <- 0 until rounds) {
        val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        val large = withSrcMin(sym)
          .withColumn("m", least(col("m"), col("src")))
          .where(col("dst") > col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
          .where(col("src") =!= col("dst"))
        val o0 = large.select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        val oriented = t(s"$tag r$k oriented cp") { o0.localCheckpoint(eager = false) }
        val wm = withSrcMin(oriented)
        val s0 = wm
          .select(col("dst").as("src"), col("m").as("dst"))
          .union(wm.select(col("src"), col("m").as("dst")))
          .where(col("src") =!= col("dst"))
          .distinct()
        val small = t(s"$tag r$k small cp") { s0.localCheckpoint(eager = false) }
        t(s"$tag r$k checksum job") {
          small.agg(count(lit(1)),
            coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
              lit(java.math.BigDecimal.ZERO))).head()
        }
        graft.core.LineageCut.release(e)
        graft.core.LineageCut.release(oriented)
        e = small
      }
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }

    loop("wsc=on ", "true", 5)
    loop("wsc=off", "false", 5)
    loop("wsc=on2", "true", 5)
    spark.stop()
  }
}
