package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-volume regression pins for the most expensive gates at
  * sf0.01. Wall time on a busy 32-core box swings ±2× run to run, but
  * the BYTES a plan shuffles are a property of the plan — a lost
  * broadcast, an unpruned scan, or a candidate-set blowup shows up here
  * structurally even when seconds are pure noise.
  *
  * Budgets are ~1.5× the values measured when pinned (4-thread session,
  * shuffle.partitions=4, full memoized-model build included — these run
  * on a cold cache because no other suite touches sf0.01). A red here
  * means the plan changed shape, not that the machine was slow; the
  * lower bound guards the measurement itself (a near-zero reading means
  * the listener stopped seeing the gate's stages, or the gate stopped
  * doing its work).
  */
class ShuffleBudgetSpec extends GraftSuite {

  private val sf001 = "/root/testdata/sf0.01"

  private final class ShuffleBytes extends SparkListener {
    @volatile var write = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) write += m.shuffleWriteMetrics.bytesWritten
      }
  }

  /** gate -> (floor, budget) in shuffle-write bytes. Measured r7 (post
    * ε-join hoist + kernel noise-assign): dbscan_sweep 769,620;
    * dedup_groups 1,027,713; embed_pairs_lsh 745,133. Budget = measured
    * × 1.5; floor ≈ ⅓.
    */
  private val budgets: Seq[(String, (Long, Long))] = Seq(
    "dbscan_sweep" -> (255000L, 1155000L),
    "dedup_groups" -> (340000L, 1550000L),
    "embed_pairs_lsh" -> (250000L, 1120000L),
    // the CC-family gates are the remaining top cost centers under the
    // median bench; order matters — dbscan_sweep above has already
    // memoized sharedPairs, so these measure edge build + rounds only
    // (measured r7: 627,198 / 400,489 / 129,340)
    "cc_components" -> (200000L, 945000L),
    "scc_components" -> (130000L, 605000L),
    "dbscan_anonymize" -> (43000L, 195000L))

  for ((q, (lo, hi)) <- budgets)
    test(s"$q shuffle-write volume stays within budget at sf0.01") {
      val l = new ShuffleBytes
      spark.sparkContext.addSparkListener(l)
      try {
        SparkEntry.queries(q)(spark, sf001).count()
        // listener delivery is async: poll until two reads agree
        var prev = -1L
        var i = 0
        while (i < 40 && prev != l.write) {
          prev = l.write; Thread.sleep(50); i += 1
        }
        info(s"$q shuffle_write=${l.write}")
        assert(l.write >= lo,
          s"$q shuffle write ${l.write} below floor $lo — measurement " +
            "broke or the gate degenerated")
        assert(l.write <= hi,
          s"$q shuffle write ${l.write} over budget $hi — plan regression " +
            "(lost broadcast? unpruned scan? candidate blowup?)")
      } finally spark.sparkContext.removeSparkListener(l)
    }
}
