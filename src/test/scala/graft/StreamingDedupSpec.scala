package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

/** Pins for the continuous-ingest near-dup path (the dedup_stream gate):
  * the stateful banding is split-invariant (batch mode ≡ any streaming
  * schedule), its candidate set matches the batch banding restricted to
  * >= 1-new-side pairs, and on the test corpus the verified output equals
  * the exact incremental pair set (banding recall 1 at this geometry —
  * the property that lets the gate share dedup_incremental's semantics).
  */
class StreamingDedupSpec extends GraftSuite {
  import spark.implicits._

  private val N = 2
  private val Tau = 0.3
  private val Bands = 16
  private val Rows = 4
  /** Lower than the gate's 400 so BOTH old-old suppression and new-side
    * emission have witnesses in sf0.001's pair graph. */
  private val Split = 200L

  private def docsDf = graft.core.Tables.table(spark, sf0001, "documents")
    .select(col("doc_id"), col("text"),
      (col("doc_id") >= Split).as("is_new"))

  private def batchCandidates = StreamingDedup
    .bandedCandidatesStateful(docsDf, "doc_id", "text", "is_new", N, Bands, Rows)
    .as[(Long, Long)].collect().toSet

  test("batch-mode candidates = batch banding with >= 1 new side") {
    val sigs = docsDf
      .select(col("doc_id").as("id"),
        graft.functions.TextKernels.shingle_hashes(col("text"), lit(N)).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"),
        graft.functions.TextKernels.minhash_sig(col("sh"), Bands * Rows).as("sig"))
    val expected = graft.operators.Dedup
      .bandedCandidatesFromSigs(sigs, Bands, Rows)
      .where(col("id_a") >= Split || col("id_b") >= Split)
      .as[(Long, Long)].collect().toSet
    val got = batchCandidates
    assert(got == expected, s"stateful ${got.size} vs banding ${expected.size}")
    assert(got.nonEmpty, "split leaves no candidate pairs — test is vacuous")
    // the old×old suppression is real: the unfiltered banding is larger
    val all = graft.operators.Dedup.bandedCandidatesFromSigs(sigs, Bands, Rows)
      .as[(Long, Long)].collect().toSet
    assert(all.size > got.size, "no old-old pair existed to suppress")
  }

  test("streaming candidates across micro-batches = batch mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val rows = docsDf.as[(Long, String, Boolean)].collect().toSeq
    // corpus first, then the new side split across two micro-batches —
    // including a pair whose sides arrive in different batches
    val batches = Seq(rows.filter(!_._3),
      rows.filter(r => r._3 && r._1 % 2 == 0),
      rows.filter(r => r._3 && r._1 % 2 == 1))
    val src = MemoryStream[(Long, String, Boolean)]
    val q = StreamingDedup.bandedCandidatesStateful(
        src.toDF().toDF("doc_id", "text", "is_new"),
        "doc_id", "text", "is_new", N, Bands, Rows)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdd_out").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val got = spark.table("sdd_out").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "a pair was emitted twice")
      assert(got.toSet == batchCandidates,
        s"stream ${got.length} pairs != batch ${batchCandidates.size}")
    } finally q.stop()
  }

  test("bootstrapped store: streaming only the NEW docs = full replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // the 100 TB shape: the corpus loads into group state via the
    // initial-state API (never traverses the micro-batch path), and the
    // stream carries ONLY the new side — output must equal the full
    // replay (= batch mode over old+new)
    val corpus = graft.core.Tables.table(spark, sf0001, "documents")
      .where(col("doc_id") < Split)
    val newRows = docsDf.as[(Long, String, Boolean)].collect().filter(_._3)
    val batches = Seq(newRows.filter(_._1 % 2 == 0), newRows.filter(_._1 % 2 == 1))
    val src = MemoryStream[(Long, String, Boolean)]
    val q = StreamingDedup.bandedCandidatesStateful(
        src.toDF().toDF("doc_id", "text", "is_new"),
        "doc_id", "text", "is_new", N, Bands, Rows,
        bootstrapOpt = Some(corpus))
      .writeStream.outputMode("append")
      .format("memory").queryName("sdb_out").start()
    try {
      batches.foreach { b => src.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("sdb_out").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "a pair was emitted twice")
      assert(got.toSet == batchCandidates,
        s"bootstrapped ${got.length} pairs != full replay ${batchCandidates.size}")
    } finally q.stop()
  }

  test("sign-band fromKeys path: streaming = batch (embedding stream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // the banding-agnostic core under a DIFFERENT LSH family: embedding
    // sign-band keys (embed_stream's geometry) — same store, same
    // min-colliding-band rule, so stream must equal batch here too
    val keyedDf = graft.core.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id").cast("long").as("id"),
        (col("vec_id") >= 250).as("isNew"),
        graft.functions.VecKernels.sign_bands(
          col("embedding").cast("array<double>"), dim = 64, bits = 5,
          bands = 64).as("keys"))
    val batch = StreamingDedup.bandedCandidatesStatefulFromKeys(keyedDf)
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "no sign-band candidates — test is vacuous")
    val rows = keyedDf.as[(Long, Boolean, Seq[Long])].collect().toSeq
    val batches = Seq(rows.filter(!_._2),
      rows.filter(r => r._2 && r._1 % 2 == 0),
      rows.filter(r => r._2 && r._1 % 2 == 1))
    val src = MemoryStream[(Long, Boolean, Seq[Long])]
    val q = StreamingDedup.bandedCandidatesStatefulFromKeys(
        src.toDF().toDF("id", "isNew", "keys"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sde_out").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      val got = spark.table("sde_out").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "a pair was emitted twice")
      assert(got.toSet == batch,
        s"stream ${got.length} pairs != batch ${batch.size}")
    } finally q.stop()
  }

  test("verified stateful pairs = the exact incremental pair set") {
    val d = graft.core.Tables.table(spark, sf0001, "documents")
    val exact = graft.operators.Dedup.incrementalJaccardPairs(
        d.where(col("doc_id") < Split), d.where(col("doc_id") >= Split),
        "doc_id", "text", N, Tau)
      .as[(Long, Long, Double)].collect().toSet
    val side = d.select(col("doc_id").as("id"),
        graft.functions.TextKernels.shingle_hashes(col("text"), lit(N)).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), sort_array(col("sh")).as("shs"))
    val cand = StreamingDedup.bandedCandidatesStateful(
      docsDf, "doc_id", "text", "is_new", N, Bands, Rows).toDF()
    val inter = graft.functions.VecKernels
      .sorted_intersect_count(col("sh_a"), col("sh_b"))
    val got = cand
      .join(side.select(col("id").as("id_a"), col("shs").as("sh_a")), "id_a")
      .join(side.select(col("id").as("id_b"), col("shs").as("sh_b")), "id_b")
      .withColumn("jaccard", round(inter.cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - inter), 6))
      .where(col("jaccard") >= Tau)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == exact,
      s"banded-verified ${got.size} != exact incremental ${exact.size}")
    assert(got.nonEmpty, "no incremental pairs at this split — vacuous")
  }
}
