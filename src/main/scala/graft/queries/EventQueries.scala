package graft.queries

import graft.core.Tables.table
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-table gate queries: time windows, sessionization, JSON
  * extraction. The same `windowedCounts` dataflow also runs as a
  * Structured Streaming query (EventStreamsSpec asserts batch ≡ stream).
  */
object EventQueries {
  private val GapMinutes = 60
  // precomputed Long (an inline 3600*1000000 would overflow INT32 in the
  // oracle engine's literal arithmetic)
  private val HourUs = 3600L * 1000000L

  private def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling time window aggregate (streaming-capable dataflow)
    "events_window" -> ((s, dir) => {
      EventStreams.windowedCounts(events(s, dir), "1 day")
        .orderBy("window_start", "event_type")
    }),

    // gap-based sessionization via lag + running-sum windows
    "events_sessions" -> ((s, dir) => {
      EventStreams.sessionize(events(s, dir), GapMinutes)
        .orderBy("user_id", "session_idx")
    }),

    // as-of join: each click gets the user's most recent view at or
    // before it (the training-feature primitive); oracle is DuckDB's
    // native ASOF JOIN over the same deduped streams
    "events_asof" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      // right side unique per (user, ts): keep the max-event_id view
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("us"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(Window
          .partitionBy("user_id", "us").orderBy(col("event_id").desc)))
        .where(col("rn") === 1)
      graft.operators.AsofJoin.lastPrior(clicks, views, "user_id", "us",
          payloadCols = Seq("us", "value"))
        .select(col("event_id"), col("user_id"),
          col("asof.us").as("view_us"), col("asof.value").as("view_value"),
          (col("us") - col("asof.us")).as("gap_us"))
        .orderBy("event_id")
    }),

    // range join: sliding-lookback aggregate — per click, the count/sum
    // of the user's views in the preceding hour (bucketed-interval plan,
    // the 1-D grid blocking; oracle is the plain inequality join)
    "events_lookback" -> ((s, dir) => {
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val clicks = e.where(col("event_type") === "click")
        .select("event_id", "user_id", "us")
      val views = e.where(col("event_type") === "view")
        .select("user_id", "us", "value")
      graft.operators.RangeJoin.lookbackAgg(clicks, views, "user_id", "us",
          windowLen = HourUs,
          aggs = Seq(count(col("r_us")).as("n_views_1h"),
            round(coalesce(sum(col("r_value")), lit(0.0)), 2).as("sum_value_1h")))
        .select("event_id", "user_id", "n_views_1h", "sum_value_1h")
        .orderBy("event_id")
    }),

    // JSON field extraction + aggregate
    "events_json" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type")
    }))

  val oracleSql: Map[String, String] = Map(
    "events_window" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_sessions" ->
      s"""WITH g AS (SELECT user_id, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
         |      AS prev_us
         |  FROM events),
         |flagged AS (SELECT user_id, us,
         |    CASE WHEN prev_us IS NULL
         |      OR us - prev_us > ${GapMinutes * 60L * 1000000L}
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM g),
         |sess AS (SELECT user_id, us,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us
         |      ROWS UNBOUNDED PRECEDING) AS session_idx
         |  FROM flagged)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |  count(*) AS n_events, min(us) AS start_us, max(us) AS end_us
         |FROM sess GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,
    "events_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(ts) AS us FROM events),
        |clicks AS (SELECT event_id, user_id, us FROM e
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, us, value FROM (
        |    SELECT user_id, us, value, row_number() OVER (
        |      PARTITION BY user_id, us ORDER BY event_id DESC) AS rn
        |    FROM e WHERE event_type = 'view') WHERE rn = 1)
        |SELECT c.event_id, c.user_id, v.us AS view_us,
        |  v.value AS view_value, c.us - v.us AS gap_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.us <= c.us
        |ORDER BY c.event_id""".stripMargin,
    "events_lookback" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
         |    epoch_us(ts) AS us FROM events),
         |clicks AS (SELECT event_id, user_id, us FROM e
         |  WHERE event_type = 'click'),
         |views AS (SELECT user_id, us, value FROM e
         |  WHERE event_type = 'view')
         |SELECT c.event_id, c.user_id,
         |  count(v.us) AS n_views_1h,
         |  round(coalesce(sum(v.value), 0), 2) AS sum_value_1h
         |FROM clicks c LEFT JOIN views v
         |  ON c.user_id = v.user_id
         |  AND v.us >= c.us - $HourUs AND v.us <= c.us
         |GROUP BY c.event_id, c.user_id
         |ORDER BY c.event_id""".stripMargin,
    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
        |    AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
