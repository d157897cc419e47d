package graft

import graft.core.{CorpusWriter, Tables}
import org.apache.spark.sql.functions._

class CorpusWriterSpec extends GraftSuite {

  test("partitioned write: lang dirs exist, readers prune partitions") {
    val docs = Tables.table(spark, sf0001, "documents")
    val dir = java.nio.file.Files.createTempDirectory("corpus").toString
    CorpusWriter.writePartitioned(docs, dir, Seq("lang"), filesPerPartition = 2)
    val langs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
    assert(langs.contains("lang=en") && langs.size == 5)
    // partition pruning shows up as PartitionFilters, not PushedFilters
    val back = spark.read.parquet(dir).where(col("lang") === "en")
    val plan = back.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(800))
    assert(back.count() == docs.where(col("lang") === "en").count())
    // file count bounded per partition dir
    val enFiles = new java.io.File(s"$dir/lang=en").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(enFiles <= 2, s"$enFiles files in lang=en")
  }

  test("bucketed tables: co-located equi-join and agg plan with zero Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "n_chars")
    val embs = Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    CorpusWriter.writeBucketed(docs, "b_docs", Seq("doc_id"), numBuckets = 4,
      path = Some(s"$wh/b_docs"))
    CorpusWriter.writeBucketed(embs, "b_embs", Seq("doc_id"), numBuckets = 4,
      path = Some(s"$wh/b_embs"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_docs").join(spark.table("b_embs"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(900)}")
      assert(joined.count() == 500)
      // aggregation on the bucket key also skips the shuffle
      val agg = spark.table("b_docs").groupBy("doc_id")
        .agg(sum("n_chars").as("s"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket-key agg must not shuffle")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_embs")
    }
  }

  test("sorted write: range-partitioned files, rows sorted within") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("sorted").toString
    CorpusWriter.writeSorted(li, dir, Seq("l_orderkey"), numFiles = 3)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    // row-group pruning works: a narrow key predicate reads fine
    assert(back.where(col("l_orderkey") === 1).count() ==
      li.where(col("l_orderkey") === 1).count())
  }

  test("schema evolution: mergeSchema unions batches, old rows get nulls") {
    // a corpus written over time gains columns; readers must see the
    // union schema with back-filled nulls, not a failure — the
    // append-only evolution story every long-lived dataset needs
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "quality", "batch"))
    assert(merged.count() == 3)
    assert(merged.where(col("quality").isNull).count() == 2,
      "pre-evolution rows surface as nulls")
    assert(merged.where(col("quality") === 0.9).select("doc_id")
      .as[Long].head() == 3L)
  }
}
