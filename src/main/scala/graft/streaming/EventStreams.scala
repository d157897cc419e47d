package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-stream operators, written once and usable both batch and
  * streaming (Structured Streaming's unified Dataset API): the windowed
  * aggregation below runs identically over `spark.read` and
  * `spark.readStream` inputs — the streaming spec asserts that equality.
  *
  * The reference is batch-only (SURVEY §2.9), so this module is part of
  * the beyond-reference surface for continuous training-data ingestion.
  */
object EventStreams {

  /** On-disk schema for the `ts` column has shipped in two testdata
    * generations — TIMESTAMP(NANOS) (surfaced as nano-epoch Long under
    * `spark.sql.legacy.parquet.nanosAsLong`, Tables.configure) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (TIMESTAMP_NTZ). */
  def eventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of the events table (file source, schema-explicit —
    * a streaming source cannot infer, so the on-disk ts shape is probed
    * with one footer-only batch read), with ts normalized to a
    * micro-precision session-zone timestamp exactly like Tables.table. */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val tsOnDisk =
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val raw = spark.readStream.schema(eventSchema(tsOnDisk))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    tsOnDisk match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling-window aggregate per event type; with a watermark so state
    * is bounded when run as a stream. Works on batch DataFrames too. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 day",
                     watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Watermark-sizing audit: per-event lateness (running max of `usCol`
    * per key in `arrivalCol` order, minus the event's own value),
    * bucketed into a minute histogram — the distribution a
    * `withWatermark` delay must cover. The running max rides a KEYED
    * window (never global); the histogram groupBy is map-side combined.
    * On an in-order stream every event lands in bucket 0 — the audit's
    * "watermark can be zero" answer; LatenessSpec pins the non-zero
    * buckets on a synthetic out-of-order stream. */
  def latenessHistogram(events: DataFrame, keyCol: String,
                        arrivalCol: String, usCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(arrivalCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("late_us", max(col(usCol)).over(w) - col(usCol))
      .groupBy(expr("late_us div 60000000").as("late_min"))
      .agg(count(lit(1)).as("n_events"), max("late_us").as("max_late_us"))
  }

  /** Batch sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gap`. Pure window functions
    * (lag + running sum), fully SQL-mirrorable. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val withGap = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap.groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }

  /** Streaming exact-dedup by id: keeps the first occurrence of each
    * `idCols` combination; the watermark bounds the dedup state (ids older
    * than the watermark are dropped from state — the only way exact dedup
    * runs forever on an unbounded stream). Batch inputs get a plain
    * dropDuplicates, so the one dataflow serves both modes — the
    * batch ≡ stream equality is spec-asserted like windowedCounts. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Watermarked stream-stream interval join: each `right` event picks up
    * the `left` events of the same user with ts in [r_ts - lookback, r_ts].
    * Both sides carry event-time watermarks and the join condition is
    * time-bounded, which is exactly what lets Structured Streaming AGE OUT
    * join state (a left row is dropped once the right watermark passes
    * l_ts + lookback) — the unbounded-state trap of naive stream joins.
    * Batch inputs run the identical condition, so batch ≡ stream is
    * spec-asserted like the other dual-mode operators. The batch analogue
    * with aggregation is [[graft.operators.RangeJoin.lookbackAgg]] (grid
    * bucketing); this is the continuous-ingestion form. */
  def lookbackJoin(left: DataFrame, right: DataFrame, lookbackMinutes: Int,
                   watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val l = wm(left).select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_id"), col("value").as("l_value"))
    val r = wm(right).select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
    r.join(l, col("l_user") === col("r_user")
      && col("l_ts") <= col("r_ts")
      && col("l_ts") >= col("r_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
  }

  /** Stream-static enrichment join — the "enrich the firehose with
    * reference data" shape: each event picks up its user's attributes
    * from a STATIC dimension. Stateless on the stream side (no
    * watermark, no join state to age out — Structured Streaming plans a
    * fresh broadcast of the static side per microbatch), which is why
    * reference-data joins should be stream-static, never stream-stream.
    * Batch inputs run the identical plan, spec-asserted batch ≡ stream
    * like the other dual-mode operators. */
  def enrichJoin(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  // ------------------------- stateful streaming sessionization ----------

  case class Ev(user_id: Long, tsUs: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                        n_events: Long, open: Boolean)

  /** Custom streaming state: per-user session tracking via
    * flatMapGroupsWithState (the KeyValueGroupedDataset stateful API —
    * SURVEY §2.9's beyond-parity streaming surface). Emits the current
    * session per user each batch (update mode). */
  def statefulSessions(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          var cur = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          evs.toSeq.sortBy(_.tsUs).foreach { e =>
            cur match {
              case null =>
                cur = SessionState(e.tsUs, e.tsUs, 1)
              case s if e.tsUs - s.last > gapUs =>
                closed += SessionOut(uid, s.start, s.last, s.n, open = false)
                cur = SessionState(e.tsUs, e.tsUs, 1)
              case s =>
                cur = s.copy(last = math.max(s.last, e.tsUs), n = s.n + 1)
            }
          }
          if (cur != null) state.update(cur)
          (closed :+ SessionOut(uid, cur.start, cur.last, cur.n, open = true))
            .iterator
      }
  }

  // ------------------------- stateful streaming attribution -------------

  case class AEv(user_id: Long, tsUs: Long, event_id: Long,
                 event_type: String, value: Double)
  case class AttrState(start: Long, last: Long, firstType: String,
                       nPurch: Long, cents: Long)
  case class AttrOut(user_id: Long, start_us: Long, first_type: String,
                     n_purchases: Long, attributed_cents: Long,
                     open: Boolean)

  /** Streaming first-touch attribution — the continuous form of the
    * `attribution` batch gate: per-user gap sessions tracked in
    * flatMapGroupsWithState, each session crediting its purchases
    * (cents = floor(value·100), the batch gate's integerization) to the
    * FIRST event's type. Within a micro-batch events sort by
    * (tsUs, event_id) — the batch gate's deterministic order — so a
    * batch-mode run is row-equivalent to the window-based plan; across
    * micro-batches the per-user state carries the open session exactly
    * like [[statefulSessions]]. Emits closed sessions plus the open one
    * per touched user each batch (update mode). */
  def statefulAttribution(events: Dataset[AEv],
                          gapMinutes: Int): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    def out(uid: Long, s: AttrState, open: Boolean): AttrOut =
      AttrOut(uid, s.start, s.firstType, s.nPurch, s.cents, open)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[AEv], state: GroupState[AttrState]) =>
          var cur = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer.empty[AttrOut]
          def purchCents(e: AEv): (Long, Long) =
            if (e.event_type == "purchase")
              (1L, math.floor(e.value * 100).toLong)
            else (0L, 0L)
          evs.toSeq.sortBy(e => (e.tsUs, e.event_id)).foreach { e =>
            val (np, c) = purchCents(e)
            cur match {
              case null =>
                cur = AttrState(e.tsUs, e.tsUs, e.event_type, np, c)
              case s if e.tsUs - s.last > gapUs =>
                closed += out(uid, s, open = false)
                cur = AttrState(e.tsUs, e.tsUs, e.event_type, np, c)
              case s =>
                cur = s.copy(last = math.max(s.last, e.tsUs),
                  nPurch = s.nPurch + np, cents = s.cents + c)
            }
          }
          if (cur != null) state.update(cur)
          (closed :+ out(uid, cur, open = true)).iterator
      }
  }
}
