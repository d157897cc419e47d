package graft.streaming

import graft.functions.PolyHash
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous-ingest near-duplicate detection: new documents MinHash-banded
  * against an ACCUMULATING signature store held in stream state — the
  * streaming counterpart of [[graft.operators.Dedup.incrementalJaccardPairs]]
  * (which covers the daily-batch shape; this covers the firehose shape a
  * training-data pipeline runs between batch passes).
  *
  * Design: each document computes its MinHash signature and the `bands`
  * folded band keys ONCE (the same kernels and slice-fold as
  * [[graft.operators.Dedup.bandedCandidatesFromSigs]], so batch and stream
  * band geometry are identical by construction), then lands in its `bands`
  * (band, key) groups. Each group's [[org.apache.spark.sql.streaming
  * .GroupState]] is the signature store: the band-key bucket's member list
  * (id, isNew flag, band-key prefix). An arriving document emits a
  * candidate pair against every stored member — deduplicated across bands
  * WITHOUT a second stateful pass by the MIN-COLLIDING-BAND rule: the
  * pair is emitted only by the smallest band index on which the two key
  * vectors agree (every other shared band sees the same vectors and stays
  * silent), so each group only needs keys [0..its own band] — the stored
  * PREFIX. Old×old pairs are suppressed
  * at emission (both sides' isNew false — the incremental contract), but
  * old documents still accumulate into the store, which is what makes the
  * corpus side queryable forever.
  *
  * Exactly-once emission is split-invariant: whether two documents arrive
  * in one micro-batch or months apart, the same single (band, key) group
  * emits their pair, so batch mode (state empty, each group sees all rows
  * at once) is row-equivalent to any streaming schedule — the equivalence
  * StreamingDedupSpec pins. Document ids must be unique across the
  * stream; a re-ingested id whose first copy is STORED is skipped by the
  * handler (no re-emission, no double append — the append-mode
  * exactly-once invariant survives an upstream replay). A re-ingest of an
  * id that previously OVERFLOWED (below) is not detectable from state —
  * it re-pairs against the stored members, which remains the caller's
  * replay contract — but its duplicate overflow ROUTING record is
  * harmless: [[overflowRecoveryPairs]] dedups routing records on
  * (id, band, key), so the batch recovery stays exactly-once regardless.
  *
  * Scale — the hot-bucket cap (`maxBucket`, default [[DefaultMaxBucket]]):
  * a (band, key) group is pinned to one stateful task and CANNOT be
  * re-partitioned, so an unguarded hot LSH bucket (the boilerplate-heavy
  * shingle case) concentrates O(bucket²) emission and O(bucket) state in
  * one unsplittable task — the streaming sibling of the batch skew
  * [[graft.operators.SkewJoin.blockedSelfPairs]] guards with triangle
  * blocking. Here the guard is a bounded store with an EXPLICIT overflow
  * policy: a bucket stores at most `maxBucket` members; an arrival at a
  * saturated bucket still pairs against the stored members (work and
  * emission per arrival stay ≤ `maxBucket`) but is NOT appended —
  * instead an overflow ROUTING record ([[StoreEvent]] with
  * `overflow = true`, carrying the doc id and the saturated (band, key))
  * is emitted for a batch-side recovery pass. Without retention the
  * missed pairs are EXACTLY the overflow×overflow pairs of each bucket
  * (an overflowed doc pairs with everything stored before it; everything
  * after it either sees the same full bucket and overflows too, or is a
  * stored member it already paired with), so
  * [[overflowRecoveryPairs]] restores the uncapped pair set exactly:
  * capped stream ∪ recovery = uncapped stream, any cap, any schedule —
  * StreamingDedupSpec pins this cap-invariance at caps 1/4/64. State per
  * group is ≤ maxBucket × (band + 4) longs, per-arrival work ≤ 2·maxBucket
  * member scans. The default cap (1024) clears the measured gate-corpus
  * maxima ~7× (sf0.1: text bucket max 18, sign-band bucket max 141 —
  * tools/ProbeBuckets) while bounding a genuinely hot 100 TB bucket.
  * A bootstrap bucket larger than the cap is REFUSED by default (round
  * 14): bootstrap rows never traverse the handler, so no overflow record
  * could ever be emitted for a dropped member and its future pairs would
  * be silently lost — the one silent-loss seam left after round 13, now
  * fail-loud like the pairs-only view. Pre-resolve hot buckets
  * batch-side (they are exactly what `blockedSelfPairs` handles), raise
  * the cap, or opt into `truncateBootstrap = true` to keep the
  * `maxBucket` smallest ids with the documented loss.
  *
  * Retention ([[Retention]], optional, [[bandedCandidatesStatefulFromKeys]]
  * only): bounded state for operators who don't need the
  * queryable-forever store. The keyed frame carries an event-time `ts`
  * column (watermarked here); a member stops pairing — and is evicted —
  * once the watermark has advanced `horizonMs` past its event time, and
  * wholly-expired groups are removed via event-time timeout, so state is
  * bounded by the live horizon instead of the corpus. Within the horizon
  * the emitted pairs equal the unretained stream's (spec-pinned); pairs
  * whose sides are more than a horizon apart are intentionally dropped.
  * Retention is a STREAMING-mode feature: in batch execution there is no
  * watermark, so nothing expires. Retention + bootstrap is refused at
  * call time (initial-state groups register no timeout, so an untouched
  * bootstrapped bucket would outlive any horizon — a horizon-bounded
  * store bootstraps by replaying the retained window). Combining
  * retention with cap overflow
  * weakens the exact-recovery contract (an evicted slot can re-open and
  * store a later doc the overflowed one never paired with); route
  * overflowed docs to a batch re-verification against the full corpus in
  * that mode.
  *
  * Checkpoint compatibility: the state now carries an explicit
  * [[StateVersion]] tag (round 14), checked on every group read, so a
  * semantically-incompatible checkpoint fails with an actionable message
  * instead of whatever the state-store deserializer throws. History:
  * round 13 widened the state schema (BandMember gained `tsMs`, StoreEvent
  * replaced CandPair) — those SHAPE changes Spark's own
  * `stateStore.stateSchemaCheck` rejects at restart; the version tag
  * additionally catches same-shape semantic drift. A checkpoint from
  * either earlier round cannot resume here; restart with a fresh
  * checkpoint, bootstrapping from the corpus store.
  *
  * State bill: per doc, prefixes sum to bands(bands+1)/2 key longs (+ 3
  * bookkeeping longs per membership) across its groups, not bands² —
  * StreamingDedupSpec pins the measured `stateOperators` rows/bytes
  * against this budget. Verification joins candidate ids back to the
  * corpus-side shingle store (id-keyed, broadcast-free). Output is
  * append-mode (each pair exactly once).
  */
object StreamingDedup {

  /** Default hot-bucket cap — see the scale note above: ~7× the largest
    * bucket either gate geometry produces on the sf0.1 corpus, small
    * enough that one saturated bucket's state (≤ 1024 prefixes) and
    * per-arrival scan stay bounded at any corpus size. */
  val DefaultMaxBucket = 1024

  /** One (band, key) routing row: the doc's id, new-side flag, its
    * band-key PREFIX [0..band] (all the min-colliding-band rule reads),
    * and its event time (None when the feed carries no `ts`). The raw
    * timestamp — not derived millis — rides through so the watermarked
    * attribute reaches the stateful operator (event-time timeout's
    * analyzer requirement). */
  case class BandDoc(band: Int, key: Long, id: Long, isNew: Boolean,
                     keys: Seq[Long], ts: Option[java.sql.Timestamp])

  /** The accumulating per-bucket signature store. `version` is the
    * state-semantics tag ([[StateVersion]]) checked on every group read —
    * a checkpoint written under different store semantics fails with an
    * actionable message instead of decoding into silently-wrong state. */
  case class BandMember(id: Long, isNew: Boolean, keys: Seq[Long], tsMs: Long)
  case class BandState(version: Int, members: Seq[BandMember])

  /** Current state-semantics version. Bump whenever the MEANING of stored
    * state changes (field repurposing, eviction-rule changes, …) — shape
    * changes are already rejected by Spark's state-schema check, but a
    * same-shape semantic change would otherwise resume quietly. */
  val StateVersion = 3

  /** An emitted candidate pair (id_a < id_b), pre-verification. */
  case class CandPair(id_a: Long, id_b: Long)

  /** Full handler output: a candidate pair (`overflow = false`,
    * id_a < id_b, band/key = the emitting bucket) or an overflow routing
    * record (`overflow = true`: id_a = the doc that arrived at the
    * saturated (band, key) bucket and was not stored; id_b = -1). */
  case class StoreEvent(id_a: Long, id_b: Long, band: Int, key: Long,
                        overflow: Boolean)

  /** Bounded-retention policy: members expire `horizonMs` after their
    * event time (relative to the stream watermark, whose lateness
    * allowance is `watermarkDelay`). */
  case class Retention(horizonMs: Long, watermarkDelay: String = "0 seconds") {
    require(horizonMs > 0, "retention horizon must be positive")
  }

  /** Smallest band index on which two key vectors agree; both docs
    * sharing a (band, key) group guarantees one exists at or below that
    * group's band. */
  private def minCollidingBand(a: Seq[Long], b: Seq[Long]): Int = {
    var i = 0
    while (i < a.length) {
      if (a(i) == b(i)) return i
      i += 1
    }
    -1
  }

  /** MinHash-banded candidate pairs with at least one NEW side, from a
    * (batch or streaming) document frame. `newCol` is a boolean column
    * marking the new-ingest side; empty documents (no shingles) are
    * dropped exactly as in the batch banding.
    *
    * `bootstrapOpt`: a STATIC corpus frame (same idCol/textCol) loaded
    * directly into the group state as the initial signature store —
    * Structured Streaming's initial-state API — so the stream starts
    * against an existing 100 TB corpus WITHOUT replaying it through the
    * micro-batch path (bootstrap rows never traverse the handler as
    * arrivals: zero old×old work, by construction rather than by flag).
    * Bootstrapped members carry isNew = false. */
  def bandedCandidatesStateful(docs: DataFrame, idCol: String,
                               textCol: String, newCol: String, n: Int,
                               bands: Int, rows: Int,
                               bootstrapOpt: Option[DataFrame] = None,
                               maxBucket: Int = DefaultMaxBucket,
                               truncateBootstrap: Boolean = false)
  : Dataset[CandPair] =
    bandedCandidatesStatefulFromKeys(
      textBandKeys(docs, idCol, textCol, Some(newCol), n, bands, rows),
      bootstrapOpt.map(c => textBandKeys(c, idCol, textCol, None, n, bands, rows)),
      maxBucket, truncateBootstrap = truncateBootstrap)

  /** The banding-agnostic core: stateful candidate pairs from a keyed
    * frame (id: long, isNew: boolean, keys: array<long> — one key per
    * band, ANY LSH family; plus a `ts` timestamp column when `retention`
    * is set). [[bandedCandidatesStateful]] feeds it MinHash band keys
    * over text; an embedding stream feeds sign-band keys
    * ([[graft.functions.VecKernels.sign_bands]]) — same store, same
    * min-colliding-band exactly-once rule, same bootstrap path. This
    * pairs-only view has no channel for overflow routing records, so a
    * saturated bucket FAILS the task rather than silently shrinking the
    * pair set — use [[statefulEventsFromKeys]] +
    * [[overflowRecoveryPairs]] when buckets can exceed the cap. */
  def bandedCandidatesStatefulFromKeys(keyed: DataFrame,
                                       bootstrapOpt: Option[DataFrame] = None,
                                       maxBucket: Int = DefaultMaxBucket,
                                       retention: Option[Retention] = None,
                                       truncateBootstrap: Boolean = false)
  : Dataset[CandPair] = {
    import keyed.sparkSession.implicits._
    // the pairs-only view has no channel for overflow routing records,
    // so a saturated bucket here would mean SILENTLY missing pairs —
    // the bug class round 12 existed to kill. Fail the task loudly
    // instead; the capped path is statefulEventsFromKeys +
    // overflowRecoveryPairs.
    statefulEventsFromKeys(keyed, bootstrapOpt, maxBucket, retention,
      truncateBootstrap)
      .map { e =>
        if (e.overflow) throw new IllegalStateException(
          s"(band=${e.band}, key=${e.key}) overflowed maxBucket=$maxBucket: " +
            "the pairs-only view would silently miss its overflow pairs — " +
            "raise maxBucket or use statefulEventsFromKeys + " +
            "overflowRecoveryPairs")
        CandPair(e.id_a, e.id_b)
      }
  }

  /** [[bandedCandidatesStatefulFromKeys]] with the overflow routing
    * records kept in-stream: candidate pairs ride `overflow = false`
    * rows; saturated-bucket arrivals ride `overflow = true` rows for the
    * batch-side [[overflowRecoveryPairs]] pass. */
  def statefulEventsFromKeys(keyed: DataFrame,
                             bootstrapOpt: Option[DataFrame] = None,
                             maxBucket: Int = DefaultMaxBucket,
                             retention: Option[Retention] = None,
                             truncateBootstrap: Boolean = false)
  : Dataset[StoreEvent] = {
    require(maxBucket > 0, "maxBucket must be positive")
    // retention + bootstrap is refused, not fudged: initial-state groups
    // register no event-time timeout (an untouched bootstrapped bucket
    // would hold state past any horizon), and a ts-less corpus would
    // land at tsMs = 0 and silently evict wholesale on first touch. A
    // horizon-bounded store bootstraps by REPLAYING the retained window
    // — which is the supported path.
    require(retention.isEmpty || bootstrapOpt.isEmpty,
      "retention with a bootstrap store is not supported: bootstrap by " +
        "replaying the retention window instead")
    import keyed.sparkSession.implicits._
    val input = retention.fold(keyed) { r =>
      require(keyed.columns.contains("ts"),
        "retention requires an event-time `ts` column on the keyed frame")
      keyed.withWatermark("ts", r.watermarkDelay)
    }
    val grouped = explodePrefix(input).groupByKey(d => (d.band, d.key))
    val timeoutConf = retention.fold[GroupStateTimeout](
      GroupStateTimeout.NoTimeout)(_ => GroupStateTimeout.EventTimeTimeout)
    val h = handler(maxBucket, retention)
    bootstrapOpt match {
      case None =>
        grouped.flatMapGroupsWithState[BandState, StoreEvent](
          OutputMode.Append, timeoutConf)(h)
      case Some(corpus) =>
        // one BandState per (band, key): the store a previous batch run
        // (or a snapshot of this stream's own state) would have built.
        // A bucket beyond the cap is REFUSED unless the caller opted
        // into truncation: bootstrap rows never traverse the handler,
        // so no overflow record can ever cover a dropped member — the
        // silent-loss seam the strict default closes (round 14).
        val init = explodePrefix(corpus)
          .groupByKey(d => (d.band, d.key))
          .mapGroups { (k, ds) =>
            val all = ds.map(d => BandMember(d.id, d.isNew, d.keys,
                d.ts.fold(0L)(_.getTime)))
              .toSeq.sortBy(_.id)
            if (all.length > maxBucket && !truncateBootstrap)
              throw new IllegalStateException(
                s"bootstrap bucket (band=${k._1}, key=${k._2}) holds " +
                  s"${all.length} members > maxBucket=$maxBucket: pairs " +
                  "against the dropped members would be silently lost " +
                  "(bootstrap rows emit no overflow records). Pre-resolve " +
                  "hot buckets batch-side (SkewJoin.blockedSelfPairs), " +
                  "raise maxBucket, or pass truncateBootstrap = true to " +
                  "keep the maxBucket smallest ids")
            (k, BandState(StateVersion, all.take(maxBucket)))
          }
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState[BandState, StoreEvent](
          OutputMode.Append, timeoutConf, init)(h)
    }
  }

  /** Batch recovery of the pairs a capped stream routed out-of-band: the
    * overflow records of [[statefulEventsFromKeys]] joined back to their
    * full key vectors (`keyed`: the same id/isNew/keys frame the stream
    * consumed — at 100 TB, the id-keyed corpus-side store), then the
    * within-bucket all-pairs under the SAME min-colliding-band and
    * ≥ 1-new-side rules the handler applies. The self-join runs through
    * [[graft.operators.SkewJoin.blockedSelfPairs]] (cap 256), so a hot
    * bucket's recovery work is spread across tasks instead of recreating
    * the skew the stream-side cap removed. Without retention,
    * capped pairs ∪ these = the uncapped pair set, each pair exactly
    * once (see the class note for why). Output columns: id_a < id_b. */
  def overflowRecoveryPairs(events: Dataset[StoreEvent], keyed: DataFrame)
  : DataFrame = {
    // a re-ingest of an id whose FIRST copy overflowed is invisible to
    // the stream-side unique-id guard (only stored members are checked),
    // so it emits a second identical overflow record; dedup here keeps
    // the recovered pair set exactly-once even under such a replay
    val over = events.filter(_.overflow).toDF()
      .select(col("id_a").as("id"), col("band"), col("key"))
      .dropDuplicates("id", "band", "key")
    val sides = over.join(
      keyed.select(col("id").cast("long").as("id"), col("isNew"),
        col("keys")), "id")
    val blocked = graft.operators.SkewJoin.blockedSelfPairs(
      sides.select(struct(col("band"), col("key")).as("bk"), col("id"),
        col("isNew"), col("keys")),
      groupCol = "bk", idCol = "id", cap = 256)
    // first index where the FULL key vectors agree (1-based, 0 = never);
    // restricting emission to the bucket's own band keeps cross-band
    // duplicates out, exactly as the stateful handler does
    val minBand = array_position(
      zip_with(col("keys_a"), col("keys_b"), (x, y) => x === y), true) - 1
    blocked
      .where(minBand === col("bk.band"))
      .where(col("isNew_a") || col("isNew_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
  }

  /** The shared group handler: evict expired members (retention mode),
    * emit min-band candidate pairs of each arrival against the
    * accumulated store, then append the arrival — or emit an overflow
    * routing record when the bucket is saturated. */
  private[graft] def handler(maxBucket: Int, retention: Option[Retention])
  : ((Int, Long), Iterator[BandDoc], GroupState[BandState])
    => Iterator[StoreEvent] =
    (bk, ds, state) => {
      val (band, key) = bk
      // watermark is only readable under EventTimeTimeout on a streaming
      // query; batch execution has none → nothing expires there
      val wm = retention.fold(Long.MinValue) { _ =>
        try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MinValue }
      }
      val st = state.getOption
      st.foreach { s =>
        if (s.version != StateVersion) throw new IllegalStateException(
          s"(band=$band, key=$key): checkpointed state version " +
            s"${s.version} != this store's $StateVersion — the checkpoint " +
            "was written under incompatible store semantics and cannot " +
            "resume here. Restart with a fresh checkpoint, bootstrapping " +
            "from the corpus store")
      }
      val stored = st.fold(Seq.empty[BandMember])(_.members)
      // amortized O(1) appends — a hot LSH bucket's initial micro-
      // batch can route thousands of docs into one group, and an
      // immutable :+ per doc would copy the whole store each time
      val members = scala.collection.mutable.ArrayBuffer.from(
        retention.filter(_ => wm != Long.MinValue)
          .fold(stored)(r => stored.filter(_.tsMs + r.horizonMs > wm)))
      val out = Seq.newBuilder[StoreEvent]
      // id order makes batch-mode processing deterministic; the
      // emitted SET is order-independent (pairs are symmetric)
      if (!state.hasTimedOut) ds.toSeq.sortBy(_.id).foreach { d =>
        // retention keys eviction on the event time: a null ts would
        // store tsMs = 0 and silently evict on the first watermark
        // advance — fail the task instead (quiet data loss, round 14)
        if (retention.isDefined && d.ts.isEmpty)
          throw new IllegalStateException(
            s"retention mode: doc id=${d.id} has a null event time `ts` " +
              "— it would be stored at epoch 0 and silently evicted on " +
              "the first watermark advance. Filter or timestamp null-ts " +
              "rows upstream")
        // unique-id guard: a replayed doc whose first copy is stored
        // must not re-emit or double-append (exactly-once output)
        if (!members.exists(_.id == d.id)) {
          members.foreach { m =>
            if ((m.isNew || d.isNew) && minCollidingBand(m.keys, d.keys) == band)
              out += StoreEvent(math.min(m.id, d.id), math.max(m.id, d.id),
                band, key, overflow = false)
          }
          if (members.length < maxBucket)
            members += BandMember(d.id, d.isNew, d.keys,
              d.ts.fold(0L)(_.getTime))
          else
            out += StoreEvent(d.id, -1L, band, key, overflow = true)
        }
      }
      if (members.isEmpty && retention.isDefined) state.remove()
      else {
        state.update(BandState(StateVersion, members.toSeq))
        // wake the group once its youngest member can expire, so idle
        // groups drain instead of holding state forever
        if (retention.isDefined && wm != Long.MinValue)
          state.setTimeoutTimestamp(
            members.map(_.tsMs).max + retention.get.horizonMs)
      }
      out.result().iterator
    }

  /** MinHash band keys for a document frame — (id, isNew, keys);
    * `newColOpt = None` marks every row isNew = false (the bootstrap
    * corpus side). Band key = the slice fold shared with
    * [[graft.operators.Dedup.bandedCandidatesFromSigs]]. Public so a
    * capped-store caller can hold the keyed frame for the
    * [[overflowRecoveryPairs]] batch pass. */
  def textBandKeys(docs: DataFrame, idCol: String, textCol: String,
                   newColOpt: Option[String], n: Int, bands: Int,
                   rows: Int): DataFrame = {
    val isNew = newColOpt.map(col).getOrElse(lit(false))
    docs.select(col(idCol).cast("long").as("id"),
        isNew.as("isNew"),
        graft.functions.TextKernels.shingle_hashes(col(textCol), lit(n))
          .as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), col("isNew"),
        graft.functions.TextKernels.minhash_sig(col("sh"), bands * rows)
          .as("sig"))
      .select(col("id"), col("isNew"),
        transform(sequence(lit(0), lit(bands - 1)), b =>
          aggregate(slice(col("sig"), b * rows + lit(1), lit(rows)), lit(0L),
            (acc, v) => (acc * 31 + v) % PolyHash.Prime)).as("keys"))
  }

  /** (id, isNew, keys) → per-band routing rows carrying only the key
    * PREFIX [0..band] — the min-colliding-band scan never reads past a
    * group's own band, so the accumulating store holds bands(bands+1)/2
    * longs per doc instead of bands² (state size is the firehose's
    * bill). The `ts` column rides through UNALIASED when present (the
    * retention mode) so its watermark metadata survives to the stateful
    * operator; absent, a null timestamp fills the slot. */
  private def explodePrefix(keyed: DataFrame): Dataset[BandDoc] = {
    import keyed.sparkSession.implicits._
    val ts: Column =
      if (keyed.columns.contains("ts")) col("ts")
      else lit(null).cast("timestamp").as("ts")
    keyed.select(posexplode(col("keys")).as(Seq("band", "key")),
        col("id").cast("long").as("id"), col("isNew"),
        slice(col("keys"), lit(1), col("band") + 1).as("keys"), ts)
      .as[BandDoc]
  }
}
