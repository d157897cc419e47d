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

  test("blockedSelfPairs is pair-identical to the plain within-group join") {
    import spark.implicits._
    // skewed: ~90% of rows land in one hot group, the rest in 3 small ones
    val rows = (0L until 400L)
      .map(i => (if (i % 10 == 0) s"g${i % 3}" else "hot", i, (i * 7 % 13)))
      .toDF("grp", "id", "v")
    // normalize a pair to (min id, max id, payloads in that order) — the
    // blocked form emits off-diagonal pairs in hash order, not id order
    def norm(pairs: org.apache.spark.sql.DataFrame) = pairs.select(
      col("grp"),
      least(col("id_a"), col("id_b")).as("lo"),
      greatest(col("id_a"), col("id_b")).as("hi"),
      when(col("id_a") < col("id_b"), col("v_a")).otherwise(col("v_b")).as("v_lo"),
      when(col("id_a") < col("id_b"), col("v_b")).otherwise(col("v_a")).as("v_hi"))
    val a = rows.select(col("grp"), col("id").as("id_a"), col("v").as("v_a"))
    val b = rows.select(col("grp"), col("id").as("id_b"), col("v").as("v_b"))
    val plain = norm(a.join(b, "grp").where(col("id_a") < col("id_b")))
    // cap=1 (every row its own slice), mid caps (multi-slice hot group),
    // and a cap larger than any group (degenerates to the plain join)
    for (cap <- Seq(1, 7, 64, 1000)) {
      val blocked = norm(SkewJoin.blockedSelfPairs(rows, "grp", "id", cap))
      assert(blocked.count() === plain.count(), s"cap=$cap")
      assert(blocked.exceptAll(plain).isEmpty && plain.exceptAll(blocked).isEmpty,
        s"cap=$cap pair sets differ")
    }
  }

  test("blockedSelfPairs joins on the slice-pair key, bounding task pair work") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => ("hot", i)).toDF("grp", "id")
    val joined = SkewJoin.blockedSelfPairs(rows, "grp", "id", 50)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_p") && plan.contains("__graft_q"),
      s"pair join must key on (group, slice, slice):\n${plan.take(800)}")
    // 300 rows / cap 50 → 6 slices → 21 blocks; the diagonal keeps
    // id_a < id_b, off-diagonals pair disjoint slices — spot-check totals
    assert(joined.count() === 300L * 299L / 2)
    // slice occupancy is hash-uniform: with 6 slices of a 300-row group
    // no slice may hold more than 2× its fair share on this fixed data
    val s = 6
    val occ = rows.withColumn("slice",
        pmod(xxhash64(col("id")), lit(s.toLong))).groupBy("slice").count()
      .agg(max("count")).head().getLong(0)
    assert(occ <= 100, s"max slice occupancy $occ exceeds 2x fair share")
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
