package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) at local[32] and prints its headline
  * as ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...} — sized to the driver's ~2000-byte stdout
  * tail (the `queries` map carries the most expensive medians; the full
  * per-query maps ride the preceding bench_detail line and the
  * SPARK_GRAFT_BENCH_OUT artifact file).
  *
  * Measurement protocol (round 7): single-shot timings proved unusable —
  * byte-identical code swung ±23% in total and ±2.4× per query between
  * rounds 5 and 6 (JIT, GC, AQE re-planning on a shared 32-core box). Each
  * query therefore runs once UNTIMED-for-the-headline (the "cold" pass,
  * which also absorbs per-(session,dir) memoized model builds) and then
  * SPARK_GRAFT_REPS (default 3) timed repetitions; the headline `queries`
  * map and `value` carry per-query MEDIANS of the timed reps. The cold
  * times and per-query minima are emitted on a separate `bench_detail`
  * line so the one-off build costs stay visible.
  *
  * Each query is fully materialized via the noop DataSourceV2 writer
  * (round 9; previously count()): count() lets Catalyst PRUNE every
  * unreferenced output column, so pure-projection gates (winnowing,
  * chunking, masking, NFC) were timing the row count, not the operator —
  * the fused winnow kernel's 40× win was invisible to count() and very
  * visible to Verify. The noop writer evaluates every output column
  * without collecting (results can be wide); the first query pays
  * session/codegen warmup, so a trivial warmup scan runs first.
  * ShuffleBudgetSpec's pins intentionally KEEP the count() protocol —
  * they were calibrated under it and guard shuffle shape, not projection
  * cost.
  *
  * Stage metrics (shuffle read/write bytes, peak task memory) are captured
  * on the cold pass — the full build, comparable to rounds ≤6 — so plan
  * regressions show up as measured shuffle volume, not just seconds. A
  * "failed" list excludes failing queries from `value` instead of silently
  * contributing their elapsed time.
  *
  * Self-diagnosis (round 13): BENCH_r12 was recorded in a contended
  * window — six gates read 2-9× their own same-code quiet medians across
  * ALL three reps, and nothing in the artifact could say so. Three
  * defenses: (1) the 1-minute system load average is stamped at start and
  * end of the run (`load_start`/`load_end` on both JSON lines) so a
  * contended window is visible from inside the artifact; (2) bench_detail
  * carries the per-gate `max` alongside median/min/stddev, so a rep
  * spread is readable per gate; (3) a gate whose rep spread exceeds
  * [[RetrySpreadRatio]] (max/min) with median above [[RetryFloorSec]]
  * re-runs its timed reps once and keeps the LOWER-median set (contention
  * inflates, never deflates) — retried gates are listed in the headline's
  * `retried` field, and BOTH medians ride bench_detail's
  * `retried_medians` so a persistent bimodal gate is distinguishable
  * from one-off contention (round 14).
  *
  * Round 14 adds the run-quality layer on top: (1) a quiet-window
  * pre-flight delays the run start until the 1-min load drops below
  * SPARK_GRAFT_LOAD_GATE (default 2.0), bounded by
  * SPARK_GRAFT_LOAD_WAIT_MAX seconds, with the wait and a `quiet_run`
  * verdict stamped in the artifact; (2) a per-gate history envelope
  * (SPARK_GRAFT_BENCH_HISTORY, default bench_history.json — committed so
  * it persists across rounds, keyed by SF dir so cross-SF runs never
  * share an envelope) records each gate's quiet-run medians, and
  * any gate whose new median leaves the historical envelope is flagged
  * in the `drift` field — so machine drift vs code regression is decided
  * by the artifact, not re-derived by the reader. Contended runs can
  * flag drift but never write history.
  *
  * Exit status stays 0 by default (the driver parses the
  * artifact, not the exit code — a teardown hiccup must not discard a
  * valid run); CI callers that key on exit codes can set
  * SPARK_GRAFT_STRICT_EXIT=1 to get exit 2 when any gate failed.
  */
object Bench {

  /** Accumulates stage-level metrics between [[reset]] calls. Listener
    * delivery is async, so [[settle]] polls until two consecutive
    * snapshots agree. */
  private final class StageMetrics extends SparkListener {
    @volatile private var shuffleRead = 0L
    @volatile private var shuffleWrite = 0L
    @volatile private var peakMem = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          peakMem = math.max(peakMem, m.peakExecutionMemory)
        }
      }
    def reset(): Unit = synchronized {
      shuffleRead = 0L; shuffleWrite = 0L; peakMem = 0L
    }
    private def snapshot(): (Long, Long, Long) =
      synchronized((shuffleRead, shuffleWrite, peakMem))
    def settle(): (Long, Long, Long) = {
      // require THREE consecutive stable reads — a single quiet 50ms
      // window can fall inside a listener-bus stall on a loaded box and
      // return a partial sum
      var prev = snapshot()
      var stable = 0
      var i = 0
      while (i < 60 && stable < 3) {
        Thread.sleep(50)
        val cur = snapshot()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        i += 1
      }
      prev
    }
  }

  /** Rep spread (max/min) past which a gate's timings are re-drawn once. */
  private val RetrySpreadRatio = 3.0

  /** Below this median the "spread" is scheduler noise, not contention. */
  private val RetryFloorSec = 0.3

  /** History-envelope slack: a gate drifts when its new median leaves
    * [hist_min / DriftSlack, hist_max * DriftSlack] (history = quiet-run
    * medians persisted in the bench-history file). Round 13 measured
    * ±6-7% round-over-round swing on unchanged code plus occasional
    * 1.5× machine drift (rand_walks 3.06 → 4.69 s with tight rep
    * spread), so the envelope is wide: it exists to separate "moved
    * outside anything history has seen" from ordinary wobble. */
  private val DriftSlack = 1.3

  /** Quiet-run history entries kept per gate. */
  private val HistoryDepth = 8

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Quiet-window pre-flight (round 14): rounds 12 AND 13 both drew
    // their reps in contended windows (load 8+ at start) — the artifact
    // self-diagnosed it, but the headline was still not a trend point.
    // Sample the 1-min load and DELAY the run until it drops below the
    // gate (env-tunable), bounded by a max wait; the wait is stamped in
    // the artifact so a still-contended start is legible.
    val loadGate = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "2.0").trim.toDouble)
      .getOrElse(2.0)
    val maxWaitS = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_MAX", "300").trim.toInt)
      .getOrElse(300)
    var waitedS = 0
    while (loadAvg() > loadGate && waitedS < maxWaitS) {
      System.err.println(f"[bench] load ${loadAvg()}%.1f > gate $loadGate%.1f" +
        f" — waiting (${waitedS}s/${maxWaitS}s)")
      Thread.sleep(15000)
      waitedS += 15
    }
    val loadStart = loadAvg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new StageMetrics
    spark.sparkContext.addSparkListener(metrics)

    // warmup: JIT + parquet footer reads off the timed path
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // tolerate junk in the env var — a crashed bench emits no headline
    // JSON and costs the whole round's measurement
    val reps = scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_REPS", "3").trim.toInt)
      .getOrElse(3).max(1)

    // Steady-state visibility of memoized builds (round 12): the cut-sweep
    // memos make hdbscan_stability / mreach_stability medians memo READS
    // (~0.15 s) and push the expensive batched union-CC sweep into the
    // extract gates' cold column only — a 2× regression in the sweep
    // would be invisible in every median. For the gates below, after the
    // normal reps, `reps` additional timed passes each EVICT the named
    // memo entries first, so the pass re-runs the sweep build over its
    // still-memoized inputs (the MST forest stays cached — this isolates
    // the union-CC sweep, the same plan ShuffleBudgetSpec pins by
    // evicting the same keys). The final probe pass leaves the memo warm
    // (the rebuild repopulates it), so later gates still read steady
    // state. Medians ride bench_detail's and the headline's `build` map.
    val buildProbes: Map[String, Seq[String]] = Map(
      "hdbscan_stability" -> Seq(graft.queries.ClusterQueries.StabCompKey),
      "mreach_stability" -> Seq(graft.queries.ClusterQueries.MreachCompKey))

    def medianOf(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }

    final case class QResult(name: String, cold: Double, times: Seq[Double],
                             ok: Boolean, sr: Long, sw: Long, pm: Long,
                             builds: Seq[Double] = Seq.empty,
                             retried: Boolean = false,
                             discardedMedian: Option[Double] = None) {
      def median: Double = if (times.isEmpty) cold else medianOf(times)
      def min: Double = if (times.isEmpty) cold else times.min
      def max: Double = if (times.isEmpty) cold else times.max
      /** population stddev of the timed reps — 0 when reps < 2, so a
        * noisy query is visibly noisy in bench_detail at a glance */
      def stddev: Double =
        if (times.length < 2) 0.0
        else {
          val m = times.sum / times.length
          math.sqrt(times.map(t => (t - m) * (t - m)).sum / times.length)
        }
    }

    def timed(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      metrics.reset()
      // cold pass: pays memoized builds + codegen; stage metrics come from
      // here so shuffle volumes describe the full build, as in rounds ≤6
      val (cold, coldOk) =
        try { (timed(fn), true) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name cold failed: $e"); (0.0, false)
        }
      val (sr, sw, pm) = metrics.settle()
      val (times, ok) =
        if (!coldOk) (Seq.empty[Double], false)
        else try {
          (Seq.fill(reps)(timed(fn)), true)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name rep failed: $e")
            (Seq.empty[Double], false)
        }
      // contention self-defense: a rep set whose spread exceeds the
      // ratio at a non-noise median is re-drawn once, keeping the
      // lower-median set (contention inflates, never deflates). BOTH
      // medians are recorded — a persistent bimodal gate whose slow
      // draw keeps being discarded must be distinguishable from one-off
      // contention in the artifact, not just in this process's stderr.
      val (times2, retried, discarded) =
        if (ok && times.nonEmpty && medianOf(times) > RetryFloorSec &&
            times.max / math.max(times.min, 1e-9) > RetrySpreadRatio) {
          System.err.println(f"[bench] $name spread ${times.max}%.2f/" +
            f"${times.min}%.2f exceeds ${RetrySpreadRatio}%.1fx — retrying")
          try {
            val redo = Seq.fill(reps)(timed(fn))
            if (medianOf(redo) < medianOf(times))
              (redo, true, Some(medianOf(times)))
            else (times, true, Some(medianOf(redo)))
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name retry failed (kept " +
                s"original reps): $e")
              (times, true, None)
          }
        } else (times, false, None)
      val builds =
        if (!ok) Seq.empty[Double]
        else buildProbes.get(name).fold(Seq.empty[Double]) { keys =>
          try Seq.fill(reps) {
            keys.foreach(k => graft.core.QueryCache.evict(k, spark, sfDir))
            timed(fn)
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name build probe failed: $e")
              // restore the 'memo left warm' invariant for later gates —
              // the failed pass may have evicted without repopulating
              try timed(fn) catch { case _: Throwable => () }
              Seq.empty[Double]
          }
        }
      val r = QResult(name, cold, times2, ok, sr, sw, pm, builds, retried,
        discarded)
      System.err.println(
        f"[bench] $name%-20s med ${r.median}%8.2fs cold ${cold}%8.2fs ${if (ok) "" else "FAILED"}%s")
      r
    }
    def r3(v: Double): String = f"$v%.3f"
    def jmap(f: QResult => Double): String =
      results.map(r => "\"" + r.name + "\":" + r3(f(r))).mkString("{", ",", "}")
    val sh = results.map { r =>
      "\"" + r.name + s"""":{"shuffle_read":${r.sr},"shuffle_write":${r.sw},"peak_mem":${r.pm}}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case r if r.ok => r.median }.sum
    val coldTotal = results.collect { case r if r.ok => r.cold }.sum
    // The driver keeps only a ~2000-BYTE tail of stdout (measured from
    // BENCH_r08.json, whose "tail" field is 2000 bytes): a full per-query
    // median map at 200+ gates is ~5 KB and can NEVER fit, which is the
    // real reason round 8's headline parsed as null — and the 11 RDD-
    // unpersist WARN lines the post-headline QueryCache eviction logged
    // ate another 1650 bytes of that tail. Therefore:
    //   1. full per-query medians/cold/min/stddev ride the bench_detail
    //      line (full stdout + the env-gated artifact file below);
    //   2. the headline carries the total, cold_total, failure list, and
    //      only the TopNHeadline most expensive medians (~1.2 KB);
    //   3. ALL JSON lines print after logging is off and Spark is
    //      stopped, so nothing can follow the headline in the tail.
    val TopNHeadline = 35
    val topQ = results.filter(_.ok).sortBy(-_.median).take(TopNHeadline)
      .map(r => "\"" + r.name + "\":" + r3(r.median)).mkString("{", ",", "}")
    // memoized-build medians (evict-between-passes probes) — tiny map,
    // rides both lines so the sweep-build trend survives the stdout tail
    val buildQ = results.filter(_.builds.nonEmpty)
      .map(r => "\"" + r.name + "\":" + r3(medianOf(r.builds))).mkString("{", ",", "}")
    val retriedQ = results.collect { case r if r.retried => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    // both medians of every retried gate: {"gate":{"kept":x,"discarded":y}}
    val retriedM = results.collect {
      case r if r.discardedMedian.isDefined =>
        "\"" + r.name + s"""":{"kept":${r3(r.median)},"discarded":${r3(r.discardedMedian.get)}}"""
    }.mkString("{", ",", "}")
    val loadEnd = loadAvg()
    def r2(v: Double): String = f"$v%.2f"

    // Per-gate history envelope (round 14): rand_walks moved 3.06 → 4.69s
    // on UNCHANGED code with a tight rep spread — intra-run spread can't
    // certify cross-run comparability, so drift-vs-regression must be
    // decided by the artifact. The history file holds each gate's last
    // HistoryDepth QUIET-run medians; a new median outside
    // [min/DriftSlack, max*DriftSlack] is flagged on both JSON lines.
    // Only quiet runs (load below the gate at both ends) append, so a
    // contended draw can flag drift but never pollutes the envelope.
    val histPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY",
      "bench_history.json")
    // the file is keyed by SF dir FIRST — medians at sf0.001 and sf0.1
    // differ by orders of magnitude, so a shared per-gate list would
    // flag every cross-SF run as drift and pollute the envelope
    val fullHistory: Map[String, Map[String, Seq[Double]]] =
      try {
        val f = java.nio.file.Paths.get(histPath)
        if (java.nio.file.Files.exists(f)) {
          import org.json4s._
          import org.json4s.jackson.JsonMethods.parse
          implicit val fmt: Formats = DefaultFormats
          parse(java.nio.file.Files.readString(f))
            .extract[Map[String, Map[String, Seq[Double]]]]
        } else Map.empty
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] history read failed (fresh start): $e")
          Map.empty
      }
    val history: Map[String, Seq[Double]] =
      fullHistory.getOrElse(sfDir, Map.empty)
    // active from the FIRST history entry: with the 1.3x slack a single
    // quiet median already brackets the documented ±7% wobble, and the
    // envelope widens as more entries accumulate. Same noise floor as
    // the retry logic — at sub-RetryFloorSec medians a 1.3x move is
    // scheduler/barrier noise, not drift (a back-to-back sf0.001 pair
    // flagged 12 such gates at 1.3-1.4x; none exceeded 2.1s)
    val driftAll = results.filter(_.ok).flatMap { r =>
      history.get(r.name).filter(_.nonEmpty).flatMap { h =>
        if ((r.median > RetryFloorSec || h.max > RetryFloorSec) &&
            (r.median < h.min / DriftSlack || r.median > h.max * DriftSlack))
          Some(r.median -> ("\"" + r.name +
            s"""":{"median":${r3(r.median)},"hist_min":${r3(h.min)},"hist_max":${r3(h.max)}}"""))
        else None
      }
    }
    // the headline rides a ~2000-byte stdout tail: keep the 12 most
    // expensive drifters inline, count the rest
    val drift = driftAll.sortBy(-_._1).take(12).map(_._2)
      .mkString("{", ",", "}") +
      (if (driftAll.size > 12) s""","drift_more":${driftAll.size - 12}"""
       else "")
    // quiet = the WINDOW WE ENTERED was quiet (pre-flight enforced);
    // load_end is dominated by the benchmark's own 32-thread work (a
    // full run leaves the 1-min average near the core count), so gating
    // on it would make quiet_run unsatisfiable by construction —
    // load_end stays stamped for visibility only
    val quietRun = loadStart <= loadGate
    if (quietRun) {
      try {
        def jq(s: String): String = "\"" + s + "\""
        val mergedSf = (history.keySet ++ results.filter(_.ok).map(_.name))
          .toSeq.sorted.map { name =>
            val h = history.getOrElse(name, Seq.empty) ++
              results.find(r => r.name == name && r.ok).map(_.median)
            jq(name) + ":" +
              h.takeRight(HistoryDepth).map(r3).mkString("[", ",", "]")
          }.mkString("{", ",", "}")
        val merged = (fullHistory - sfDir).toSeq.sortBy(_._1).map {
          case (sf, gates) => jq(sf) + ":" + gates.toSeq.sortBy(_._1).map {
            case (g, hs) => jq(g) + ":" + hs.map(r3).mkString("[", ",", "]")
          }.mkString("{", ",", "}")
        } :+ (jq(sfDir) + ":" + mergedSf)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(histPath),
          merged.mkString("{", ",", "}"))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] history write failed: $e")
      }
    }

    val loadF = s""""load_start":${r2(loadStart)},"load_end":${r2(loadEnd)}""" +
      s""","load_wait_s":$waitedS,"quiet_run":$quietRun"""
    val lines = Seq(
      s"""{"metric":"stage_metrics","stage_metrics":$sh,"sf":"$sfDir"}""",
      s"""{"metric":"bench_detail","reps":$reps,"median":${jmap(_.median)},"cold":${jmap(_.cold)},"min":${jmap(_.min)},"max":${jmap(_.max)},"stddev":${jmap(_.stddev)},"build":$buildQ,"retried":$retriedQ,"retried_medians":$retriedM,"drift":$drift,$loadF,"sf":"$sfDir"}""",
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.length},"queries":$topQ,"queries_note":"top-$TopNHeadline medians by cost; full map on bench_detail","failed":$failed,"reps":$reps,"cold_total":${r3(coldTotal)},"build":$buildQ,"retried":$retriedQ,"drift":$drift,$loadF,"sf":"$sfDir"}""")
    // full machine-readable artifact for the repo/COVERAGE trend notes.
    // A failed artifact write must not cost the round its stdout output.
    try sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        lines.mkString("", "\n", "\n"))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] artifact write failed: $e")
    }
    // silence the unpersist WARNs BEFORE eviction, stop Spark, then emit
    // the JSON lines as the absolute last bytes of stdout. Cleanup runs
    // inside try/catch so an eviction/stop failure cannot swallow the
    // headline the driver parses — the println is unconditional.
    try {
      spark.sparkContext.setLogLevel("OFF")
      // release memoized checkpoint blocks deterministically (not via GC)
      graft.core.QueryCache.evictSession(spark)
      spark.stop()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] cleanup failed (headline still emitted): $e")
    }
    lines.foreach(println)
    // Spark's non-daemon threads can outlive a failed evictSession/stop
    // (the catch above skips the remaining cleanup); the headline is out,
    // so force the forked JVM down rather than let the driver wait out
    // its window on a hung process.
    //
    // Exit status is 0 by default: the measurements are complete and the
    // headline printed before cleanup runs, so a cleanup failure
    // (stderr-logged above) does not invalidate the run — and the driver
    // parses the artifact, not the exit code, so it must not discard a
    // valid run over a teardown hiccup. Per-query failures ride the
    // headline's `failed` list; a CI caller that keys on exit codes can
    // opt into exit 2 for non-empty `failed` via SPARK_GRAFT_STRICT_EXIT.
    System.out.flush()
    val strictExit = sys.env.get("SPARK_GRAFT_STRICT_EXIT").contains("1")
    sys.exit(if (strictExit && results.exists(!_.ok)) 2 else 0)
  }
}
