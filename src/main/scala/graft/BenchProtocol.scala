package graft

/** Pure logic for the bench run-quality layer (drift envelope + history
  * merge), extracted from [[Bench]] so it is unit-testable without a
  * SparkSession.
  *
  * Round-15 protocol fixes, each motivated by a failure the round-14
  * artifact trail caught in its own machinery:
  *
  *   1. '''Quarantine with two-run confirmation''': a gate whose median
  *      exits its historical envelope is flagged and held PENDING — it
  *      only becomes baseline if an independent later quiet run lands at
  *      the same level (a real shift); a one-off never does. Round 14's
  *      first real catch (span_strip 31.8 s vs a 1.9–2.1 s history, a
  *      contended mid-run window) was immediately appended into the very
  *      envelope that caught it, because the append gated on `load_start`
  *      only — 19 envelopes were poisoned and span_strip's would have
  *      passed a future 20x regression. See [[mergeHistory]].
  *   2. '''Per-gate contention attribution''': the 1-min load is sampled
  *      before each gate's rep block; a gate whose window load exceeded
  *      the quiet gate is counted in `contended_gates`, excluded from the
  *      history append, and eligible for a retry even when its rep spread
  *      is tight (sustained contention inflates all reps together, so the
  *      spread heuristic alone never fires — span_strip ran 15x slow with
  *      a tight spread and was not retried).
  *   3. '''Outlier-tolerant envelope''': with >= 4 entries the envelope
  *      drops the single extreme entry at each end before applying the
  *      slack, so one bad historical point (however it got in) cannot
  *      widen the flag boundary for the next [[HistoryDepth]] rounds.
  *      See [[envelopeBounds]].
  */
object BenchProtocol {

  /** History-envelope slack: a gate drifts when its new median leaves
    * [env_min / DriftSlack, env_max * DriftSlack]. Round 13 measured
    * ±6-7% round-over-round swing on unchanged code plus occasional 1.5x
    * machine drift, so the envelope is wide: it separates "moved outside
    * anything history has seen" from ordinary wobble. */
  val DriftSlack = 1.3

  /** Quiet-run history entries kept per gate. */
  val HistoryDepth = 8

  /** Below this median, moves are scheduler/barrier noise, not drift. */
  val RetryFloorSec = 0.3

  /** Envelope base over the raw history: with n >= 4 entries the single
    * extreme entry at EACH end is dropped before taking min/max, so one
    * outlier append cannot dominate the bounds. With n <= 3 every entry
    * counts (too few to call any of them an outlier). Returns raw
    * (min, max) BEFORE slack — callers apply [[DriftSlack]]. */
  def envelopeBounds(history: Seq[Double]): (Double, Double) = {
    require(history.nonEmpty, "envelopeBounds needs a non-empty history")
    val core =
      if (history.length >= 4) history.sorted.slice(1, history.length - 1)
      else history
    (core.min, core.max)
  }

  /** True when `median` exits the slack-widened envelope of `history`.
    * Sub-noise-floor gates (both the median and the whole envelope below
    * [[RetryFloorSec]]) never flag — at those scales a 1.3x move is
    * scheduler noise. Empty history never flags (first run seeds). */
  def isDrift(median: Double, history: Seq[Double]): Boolean =
    history.nonEmpty && {
      val (lo, hi) = envelopeBounds(history)
      (median > RetryFloorSec || hi > RetryFloorSec) &&
        (median < lo / DriftSlack || median > hi * DriftSlack)
    }

  /** True when two quiet-run medians agree to within the drift slack —
    * the "second quiet run confirms the new level" test. */
  def confirms(median: Double, pendingLevel: Double): Boolean =
    median <= pendingLevel * DriftSlack && median >= pendingLevel / DriftSlack

  /** Merge this run's quiet medians into the per-gate history with
    * drift quarantine and two-run shift confirmation.
    *
    * Per gate:
    *   - '''contended window''' (sampled load above the gate threshold):
    *     the median is unreliable in either direction — history AND any
    *     pending level carry forward unchanged.
    *   - '''in envelope''': append the median (capped at
    *     [[HistoryDepth]]); clear any pending level (the old level
    *     re-confirmed, so the earlier flag was a one-off).
    *   - '''drift-flagged, no pending level''': hold the median as
    *     pending; history unchanged. One contended-but-quiet-looking
    *     draw can flag, but never becomes the baseline (round 14's
    *     span_strip 31.8 s would have parked here and been cleared by
    *     the next 2.0 s draw).
    *   - '''drift-flagged, pending level agrees''' ([[confirms]]): a
    *     second independent quiet run landed at the same new level — a
    *     real code/machine shift, not a one-off. The history RESEEDS to
    *     just this median (the old envelope described code that no
    *     longer exists) and pending clears.
    *   - '''drift-flagged, pending level disagrees''': still unstable —
    *     the new median replaces the pending level, history unchanged.
    *
    * Gates present only in `history` (renamed/retired) are preserved.
    * Returns (new history, new pending levels). */
  def mergeHistory(history: Map[String, Seq[Double]],
                   pending: Map[String, Double],
                   medians: Map[String, Double],
                   flagged: Set[String],
                   contended: Set[String])
      : (Map[String, Seq[Double]], Map[String, Double]) = {
    val names = history.keySet ++ medians.keySet
    val merged = scala.collection.mutable.Map[String, Seq[Double]]()
    val nextPending = scala.collection.mutable.Map[String, Double]()
    names.foreach { name =>
      val prior = history.getOrElse(name, Seq.empty)
      (medians.get(name), contended.contains(name), flagged.contains(name)) match {
        case (None, _, _) =>
          merged(name) = prior
          pending.get(name).foreach(nextPending(name) = _)
        case (Some(_), true, _) =>
          merged(name) = prior
          pending.get(name).foreach(nextPending(name) = _)
        case (Some(m), false, false) =>
          merged(name) = (prior :+ m).takeRight(HistoryDepth)
        case (Some(m), false, true) =>
          pending.get(name) match {
            case Some(p) if confirms(m, p) => merged(name) = Seq(m)
            case _ => merged(name) = prior; nextPending(name) = m
          }
      }
    }
    (merged.toMap, nextPending.toMap)
  }
}
