package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.plans.GlobalWindowTopK]]: the global-window top-k rewrite.
  * Uses a derived session (rules fixed at session state build) so the
  * shared suite session's plans stay untouched. */
class GlobalWindowTopKSpec extends org.scalatest.funsuite.AnyFunSuite {

  private lazy val s: SparkSession = {
    val s = SparkTestBase.spark.newSession()
    GraftExtensions.register(s)
    s
  }

  private def data(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toLong))
      .toDF("id", "score")
  }

  private val w = Window.orderBy(col("score").desc, col("id"))

  test("global row_number rank<=k rewrites to Sort+Limit and plans TakeOrdered") {
    val q = data(s).withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("GlobalLimit"),
      s"expected the Limit+Sort rewrite under the window:\n$opt")
    val exec = q.queryExecution.executedPlan.toString
    assert(exec.contains("TakeOrderedAndProject"),
      s"Sort+Limit must plan as the parallel top-k:\n$exec")
    // row-identical to the unrewritten plan (shared session has no rule)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exp = data(SparkTestBase.spark)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.sortBy(_._3).toSeq == exp.sortBy(_._3).toSeq)
  }

  test("equality and flipped literal-first bounds fire too") {
    val q = data(s).withColumn("rank", row_number().over(w))
      .where(lit(3) >= col("rank"))
    assert(q.queryExecution.optimizedPlan.toString.contains("GlobalLimit"))
    assert(q.count() == 3)
    val eq = data(s).withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
    assert(eq.queryExecution.optimizedPlan.toString.contains("GlobalLimit"))
    assert(eq.count() == 1)
  }

  test("partitioned windows and lower-bound rank filters stay untouched") {
    val pw = Window.partitionBy(col("id") % 10)
      .orderBy(col("score").desc, col("id"))
    val part = data(s).withColumn("rank", row_number().over(pw))
      .where(col("rank") <= 2)
    assert(!part.queryExecution.optimizedPlan.toString.contains("GlobalLimit"),
      "keyed windows are already parallel — must not rewrite")
    assert(part.count() == 20)
    val lower = data(s).withColumn("rank", row_number().over(w))
      .where(col("rank") > 5)
    assert(!lower.queryExecution.optimizedPlan.toString.contains("GlobalLimit"),
      "a lower bound is not a top-k — must not rewrite")
    assert(lower.count() == 995)
  }

  test("rewrite equals the unrewritten plan on random data and k (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 300)   // includes n = 0 and n < k
      k <- Gen.choose(1, 40)
      seed <- Gen.choose(0L, 100000L)
    } yield (n, k, seed)
    val cases = (0 until 8)
      .flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
    cases.foreach { case (n, k, seed) =>
      val rnd = new scala.util.Random(seed)
      val seedData = (0 until n).map(i => (i.toLong, rnd.nextInt(50).toLong))
      // unique order (score, id) so both plans are deterministic
      val ww = Window.orderBy(col("score").desc, col("id"))
      def run(d: org.apache.spark.sql.DataFrame) =
        d.withColumn("rank", row_number().over(ww))
          .where(col("rank") <= k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .sortBy(_._3).toSeq
      val got = {
        import s.implicits._
        run(seedData.toDF("id", "score"))
      }
      val plain = SparkTestBase.spark
      val exp = {
        import plain.implicits._
        run(seedData.toDF("id", "score"))
      }
      assert(got == exp, s"n=$n k=$k seed=$seed")
    }
  }

  test("rewrite is stable under the fixed-point batch (no double wrap)") {
    val q = data(s).withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.linesIterator.count(_.contains("GlobalLimit")) == 1,
      s"exactly one Limit expected:\n$opt")
  }
}
