package graft.streaming

import graft.functions.PolyHash
import org.apache.spark.sql.{DataFrame, Dataset}
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
  * StreamingDedupSpec pins. Document ids must be unique across the stream
  * (a re-ingested id would re-pair).
  *
  * Scale: state per (band, key) is the bucket population × (band + 3)
  * longs (the key prefix — bands(bands+1)/2 per doc summed over its
  * groups, not bands²) — the classic LSH bucket-skew exposure, bounded by
  * band-key cardinality exactly like the batch join's hot keys; key
  * prefixes (not shingle sets) live in state, so verification joins the
  * candidate ids back to the corpus-side shingle store (id-keyed,
  * broadcast-free). Output is append-mode (each pair exactly once).
  */
object StreamingDedup {

  /** One (band, key) routing row: the doc's id, new-side flag, and its
    * band-key PREFIX [0..band] (all the min-colliding-band rule reads). */
  case class BandDoc(band: Int, key: Long, id: Long, isNew: Boolean,
                     keys: Seq[Long])

  /** The accumulating per-bucket signature store. */
  case class BandMember(id: Long, isNew: Boolean, keys: Seq[Long])
  case class BandState(members: Seq[BandMember])

  /** An emitted candidate pair (id_a < id_b), pre-verification. */
  case class CandPair(id_a: Long, id_b: Long)

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
                               bootstrapOpt: Option[DataFrame] = None)
  : Dataset[CandPair] =
    bandedCandidatesStatefulFromKeys(
      textKeys(docs, idCol, textCol, Some(newCol), n, bands, rows),
      bootstrapOpt.map(c => textKeys(c, idCol, textCol, None, n, bands, rows)))

  /** The banding-agnostic core: stateful candidate pairs from a keyed
    * frame (id: long, isNew: boolean, keys: array<long> — one key per
    * band, ANY LSH family). [[bandedCandidatesStateful]] feeds it MinHash
    * band keys over text; an embedding stream feeds sign-band keys
    * ([[graft.functions.VecKernels.sign_bands]]) — same store, same
    * min-colliding-band exactly-once rule, same bootstrap path. */
  def bandedCandidatesStatefulFromKeys(keyed: DataFrame,
                                       bootstrapOpt: Option[DataFrame] = None)
  : Dataset[CandPair] = {
    import keyed.sparkSession.implicits._
    val grouped = explodePrefix(keyed).groupByKey(d => (d.band, d.key))
    bootstrapOpt match {
      case None =>
        grouped.flatMapGroupsWithState[BandState, CandPair](
          OutputMode.Append, GroupStateTimeout.NoTimeout)(handler)
      case Some(corpus) =>
        // one BandState per (band, key): the store a previous batch run
        // (or a snapshot of this stream's own state) would have built
        val init = explodePrefix(corpus)
          .groupByKey(d => (d.band, d.key))
          .mapGroups { (k, ds) =>
            (k, BandState(ds.map(d => BandMember(d.id, d.isNew, d.keys)).toSeq))
          }
          .groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState[BandState, CandPair](
          OutputMode.Append, GroupStateTimeout.NoTimeout, init)(handler)
    }
  }

  /** The shared group handler: emit min-band candidate pairs of each
    * arrival against the accumulated store, then append the arrival. */
  private val handler: ((Int, Long), Iterator[BandDoc],
                        GroupState[BandState]) => Iterator[CandPair] =
    (bk, ds, state) => {
      val band = bk._1
      // amortized O(1) appends — a hot LSH bucket's initial micro-
      // batch can route thousands of docs into one group, and an
      // immutable :+ per doc would copy the whole store each time
      val members = scala.collection.mutable.ArrayBuffer
        .from(state.getOption.fold(Seq.empty[BandMember])(_.members))
      val out = Seq.newBuilder[CandPair]
      // id order makes batch-mode processing deterministic; the
      // emitted SET is order-independent (pairs are symmetric)
      ds.toSeq.sortBy(_.id).foreach { d =>
        members.foreach { m =>
          if ((m.isNew || d.isNew) && m.id != d.id &&
              minCollidingBand(m.keys, d.keys) == band)
            out += CandPair(math.min(m.id, d.id), math.max(m.id, d.id))
        }
        members += BandMember(d.id, d.isNew, d.keys)
      }
      state.update(BandState(members.toSeq))
      out.result().iterator
    }

  /** MinHash band keys for a document frame — (id, isNew, keys);
    * `newColOpt = None` marks every row isNew = false (the bootstrap
    * corpus side). Band key = the slice fold shared with
    * [[graft.operators.Dedup.bandedCandidatesFromSigs]]. */
  private def textKeys(docs: DataFrame, idCol: String, textCol: String,
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
    * bill). */
  private def explodePrefix(keyed: DataFrame): Dataset[BandDoc] = {
    import keyed.sparkSession.implicits._
    keyed.select(posexplode(col("keys")).as(Seq("band", "key")),
        col("id").cast("long").as("id"), col("isNew"),
        slice(col("keys"), lit(1), col("band") + 1).as("keys"))
      .as[BandDoc]
  }
}
