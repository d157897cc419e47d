package graft

import graft.core.Tables
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends GraftSuite {

  private def fixtures = {
    val e = Tables.table(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
    val dim = e.select("event_type").distinct()
      .withColumn("weight", (length(col("event_type")) % 5 + 1).cast("long"))
    (e, dim)
  }

  test("salted join is row-identical to the plain join") {
    val (e, dim) = fixtures
    val plain = e.join(dim, Seq("event_type"))
      .select("event_id", "event_type", "weight")
    val salted = SkewJoin.saltedJoin(e, dim, "event_type", 8)
      .select("event_id", "event_type", "weight")
    assert(plain.count() === salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salt spreads a hot key across buckets and joins on (key, salt)") {
    val (e, dim) = fixtures
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = SkewJoin.saltedJoin(e, dim, "event_type", 8)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_salt"),
        s"join must key on the salt:\n${plan.take(800)}")
      assert(!plan.contains("BroadcastHashJoin"))
      // the hot key's rows actually land in >1 salt bucket
      val buckets = e.withColumn("s",
          pmod(xxhash64(struct(e.columns.map(col).toSeq: _*)), lit(8)))
        .where(col("event_type") === "view")
        .select(countDistinct("s")).head().getLong(0)
      assert(buckets > 1, s"hot key stayed in $buckets bucket")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("left join keeps unmatched large-side rows exactly once") {
    val (e, dim) = fixtures
    val partialDim = dim.where(col("event_type") =!= "view")
    val left = SkewJoin.saltedJoin(e, partialDim, "event_type", 4, "left")
    assert(left.count() === e.count())
    assert(left.where(col("weight").isNull).count() ===
      e.where(col("event_type") === "view").count())
  }
}
