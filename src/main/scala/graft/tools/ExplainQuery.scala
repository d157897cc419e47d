package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev plan inspector: print the formatted physical plan of the named
  * gate queries (all, if none named) on a given sf dir. AQE is left on,
  * so run with an action first if you want the final adaptive plan; the
  * static plan printed here is what plan-hygiene reviews audit
  * (exchanges, reuse, pushed filters, codegen spans).
  *
  * Usage: runMain graft.tools.ExplainQuery [sfDir] [query ...]
  * Extra session confs (e.g. to preview the at-scale plan shape with
  * broadcast off): SPARK_GRAFT_EXPLAIN_CONF="k=v,k=v".
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val builder = graft.core.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").toSeq
      .flatMap(_.split(',')).map(_.split("=", 2))
      .foreach {
        case Array(k, v) if k.nonEmpty => builder.config(k, v)
        case _ => () // tolerate empty/valueless entries (trailing comma)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      // execute THIS DataFrame's plan (count() would build a derived
      // query and leave this one's AdaptiveSparkPlan unfinalized), then
      // show the final adaptive plan — stage reuse only appears here
      df.collect()
      println("---- after AQE (final) ----")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .take(120).mkString("\n"))
    }
    spark.stop()
  }
}
