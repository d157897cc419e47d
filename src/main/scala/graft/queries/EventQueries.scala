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
  /** basket_pairs: per-user basket size cap and minimum pair support. The
    * cap is the scale guard — it bounds the per-user pair fan-out at
    * C(cap, 2) regardless of how many distinct items a hot user touches —
    * and it is deterministic (keep the cap lowest item ids), so the
    * oracle applies the identical rule. */
  private val BasketCap = 40
  // low enough that the gate is non-empty at the sf0.001 smoke scale
  // (max pair support there is 9)
  private val MinSupport = 3
  /** item_recs neighbors per item. */
  private val RecK = 3
  /** resample_ffill / moving_window user cap (bounds the gate's daily
    * spine; the operators themselves are user-keyed at any scale). */
  private val FillUsers = 10

  private def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling time window aggregate (streaming-capable dataflow)
    "events_window" -> ((s, dir) => {
      EventStreams.windowedCounts(events(s, dir), "1 day")
        .orderBy("window_start", "event_type")
    }),

    // Watermark-sizing audit: per-event lateness in ARRIVAL order
    // (event_id) — running max(ts) per user minus the event's own ts —
    // bucketed into a minute histogram. This distribution is exactly
    // what withWatermark's delay must cover (the streaming gates use
    // WatermarkMinutes; this gate measures whether that bound holds on
    // the data). The running max rides a USER-keyed window (never
    // global) and the histogram groupBy is map-side combined — both
    // scale-safe at any event volume.
    "lateness_hist" -> ((s, dir) => {
      EventStreams.latenessHistogram(
          events(s, dir).withColumn("us", unix_micros(col("ts"))),
          "user_id", "event_id", "us")
        .orderBy("late_min")
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
    }),

    // Market-basket co-occurrence mining: items = the JSON `k` prop, a
    // basket = one user's distinct items (capped at BasketCap lowest ids —
    // the fan-out bound), support = #users whose basket holds both items,
    // lift = n·supp(a,b) / (supp(a)·supp(b)). The pair generation is a
    // self-join KEYED BY USER with per-user cardinality capped, so
    // candidate rows are ≤ |users|·C(cap,2) — no item-domain quadratics —
    // and the pair count aggregation combines map-side. Item supports ride
    // as a broadcast (|item domain| rows). Lift is one IEEE expression
    // over exact integer counts, 6dp-rounded in both engines.
    "basket_pairs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = events(s, dir)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .where(col("item").isNotNull)
        .distinct()
      val capped = items
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("item")))
        .where(col("rn") <= BasketCap)
        .select("user_id", "item")
      // n riding as a 1-row broadcast keeps the whole gate lazy (no
      // driver action at build time) — same pattern as domain_mix
      val nUsers = capped.agg(
        countDistinct(col("user_id")).cast("double").as("nu"))
      val itemCnt = capped.groupBy("item").agg(count(lit(1)).as("c"))
      val a = capped.select(col("user_id"), col("item").as("item_a"))
      val b = capped.select(col("user_id"), col("item").as("item_b"))
      val support = a.join(b, Seq("user_id"))
        .where(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= MinSupport)
      support
        .join(broadcast(itemCnt.select(col("item").as("item_a"),
          col("c").as("ca"))), Seq("item_a"))
        .join(broadcast(itemCnt.select(col("item").as("item_b"),
          col("c").as("cb"))), Seq("item_b"))
        .crossJoin(broadcast(nUsers))
        .select(col("item_a"), col("item_b"), col("support"),
          round(col("nu") * col("support") /
            (col("ca").cast("double") * col("cb")), 6).as("lift"))
        .orderBy(col("support").desc, col("item_a"), col("item_b"))
    }),

    // Item-to-item recommendations off the basket co-occurrence graph:
    // for each item, the top-3 co-occurring neighbors by (support desc,
    // neighbor id) — the classic "users who touched X also touched Y"
    // table. Same capped-basket pair generation as basket_pairs (user-
    // keyed, fan-out bounded), symmetrized, ranked through an
    // item-partitioned window (never a global one).
    "item_recs" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val items = events(s, dir)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .where(col("item").isNotNull)
        .distinct()
      val capped = items
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("item")))
        .where(col("rn") <= BasketCap)
        .select("user_id", "item")
      val a = capped.select(col("user_id"), col("item").as("item_a"))
      val b = capped.select(col("user_id"), col("item").as("item_b"))
      val pairs = a.join(b, Seq("user_id"))
        .where(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= MinSupport)
      val sym = pairs.select(col("item_a").as("item"),
          col("item_b").as("nbr"), col("support"))
        .unionByName(pairs.select(col("item_b").as("item"),
          col("item_a").as("nbr"), col("support")))
      val w = Window.partitionBy("item")
        .orderBy(col("support").desc, col("nbr"))
      sym.withColumn("rank", row_number().over(w))
        .where(col("rank") <= RecK)
        .orderBy("item", "rank")
    }),

    // First-touch attribution: every purchase credits the FIRST event of
    // its gap session (60 min, same rule as events_sessions), keyed by
    // that first event's type — the marketing-analytics composition of
    // sessionization + a deterministic per-session argmin. All shuffles
    // are user- or (user, session)-keyed; money is integerized
    // (floor(value·100) cents) before summing so the aggregate is exact
    // across engines and summation orders. The session first is a
    // min-struct over the unique (us, event_id) order (no per-session
    // sort), matching the oracle's row_number() = 1.
    "attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val gapUs = GapMinutes * 60L * 1000000L
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val wUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      val flagged = e
        .withColumn("prev", lag("us", 1).over(wUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("sid", sum("new_s").over(wUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val firsts = flagged.groupBy("user_id", "sid")
        .agg(min(struct(col("us"), col("event_id"), col("event_type")))
          .as("f"))
        .select(col("user_id"), col("sid"),
          col("f.event_type").as("first_type"))
      flagged.where(col("event_type") === "purchase")
        .select(col("user_id"), col("sid"),
          floor(col("value") * 100).cast("long").as("cents"))
        .join(firsts, Seq("user_id", "sid"))
        .groupBy("first_type")
        .agg(count(lit(1)).as("n_purchases"),
          sum("cents").cast("long").as("attributed_cents"))
        .orderBy("first_type")
    }),

    // RFM customer scoring — the classic warehouse segmentation: per
    // purchasing user, recency (days since last purchase, vs the log's
    // last day), frequency (purchase count), monetary (cents), each
    // mapped to a 1-5 quintile by EXACT rank. Ranks come from three
    // PrefixScan denseIds passes (data-scaled — never a global window
    // over users); quintile = rank·5 div n + 1 is pure integer
    // arithmetic, ties broken by user_id so the cut is total. The
    // output is every user's (r, f, m) plus the concatenated segment
    // code marketing filters on.
    "rfm_scores" -> ((s, dir) => {
      val p = events(s, dir).where(col("event_type") === "purchase")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
      val gmax = p.agg(max("day").as("gmax"))
      val base = p.groupBy("user_id")
        .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
          sum("cents").as("mon"))
        .crossJoin(broadcast(gmax))
        .select(col("user_id"), (col("gmax") - col("last_day")).as("rec"),
          col("freq"), col("mon"))
      val n = base.count()
      def quint(metric: String, asc: Boolean, out: String) = {
        val ordered =
          if (asc) base.select(col("user_id"), col(metric).as("v"))
          else base.select(col("user_id"), (-col(metric)).as("v"))
        graft.operators.PrefixScan.denseIds(ordered, Seq("v", "user_id"),
            "rk", numParts = s.sparkContext.defaultParallelism)
          .select(col("user_id"),
            expr(s"CAST(rk * 5 div ${n}L + 1 AS INT)").as(out))
      }
      // recency: smaller = better = higher score -> rank desc on rec
      base.join(quint("rec", asc = false, "r_score"), "user_id")
        .join(quint("freq", asc = true, "f_score"), "user_id")
        .join(quint("mon", asc = true, "m_score"), "user_id")
        .select(col("user_id"), col("rec"), col("freq"), col("mon"),
          col("r_score"), col("f_score"), col("m_score"),
          concat(col("r_score").cast("string"), col("f_score").cast("string"),
            col("m_score").cast("string")).as("segment"))
        .orderBy("user_id")
    }),

    // Calendar resampling with forward fill: each (user, day) cell of a
    // dense daily spine carries the user's most recent ACTIVE day's
    // spend — the gap-filling step feature stores and BI both need
    // before joins against daily grids. The spine is |users| × |days|
    // BY DEFINITION of resampling (the gate caps users; the day list is
    // a 1-row-derived broadcast); the fill is one user-keyed
    // ignore-nulls `last` window — no self-join, no per-day scans.
    // Cents are exact integers.
    "resample_ffill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir).where(col("user_id") < FillUsers)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
      val daily = e.groupBy("user_id", "day")
        .agg(sum("cents").as("cents"), count(lit(1)).as("n"))
      val days = e.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val spine = e.select("user_id").distinct().crossJoin(broadcast(days))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled_cents",
          last(col("cents"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("filled_cents"), lit(0L)).as("filled_cents"))
        .orderBy("user_id", "day")
    }),

    // RANGE-frame rolling aggregate: per user, each active day's spend
    // plus the 3-day trailing sum — the moving-average family, framed by
    // VALUE (RANGE BETWEEN 2 PRECEDING), so calendar gaps are respected
    // without materializing a spine. One user-keyed window over the
    // daily aggregate; integer cents.
    "moving_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).where(col("user_id") < FillUsers)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
        .groupBy("user_id", "day").agg(sum("cents").as("cents"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rangeBetween(-2, 0)
      daily.withColumn("mov3_cents", sum("cents").over(w))
        .orderBy("user_id", "day")
    }),

    // Per-entry-type bounce rate over the same gap sessions: sessions
    // grouped by their FIRST event's type, counting one-event sessions
    // (bounces) — the engagement health metric next to attribution.
    // One (user, session) min-struct agg (no per-session sort), one
    // tiny-key groupBy, bounce rate in integer ppm.
    "session_bounce" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val gapUs = GapMinutes * 60L * 1000000L
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val wUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      val flagged = e
        .withColumn("prev", lag("us", 1).over(wUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("sid", sum("new_s").over(wUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged.groupBy("user_id", "sid")
        .agg(min(struct(col("us"), col("event_id"), col("event_type")))
          .as("f"), count(lit(1)).as("n"))
        .select(col("f.event_type").as("entry_type"), col("n"))
        .groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum((col("n") === 1).cast("long")).as("n_bounces"))
        .withColumn("bounce_ppm",
          expr("n_bounces * 1000000 div n_sessions"))
        .orderBy("entry_type")
    }),

    // Multi-touch attribution over the same gap sessions: every
    // non-purchase touch in a purchasing session shares the session's
    // purchase cents under two standard position models — linear
    // (1/n each) and U-shaped (40/20/40: first and last 400000 ppm,
    // middles splitting 200000) — with every weight an INTEGER ppm
    // (1000000 div n), so credit sums are exact in any engine and any
    // summation order. One (user, session)-keyed position window, one
    // keyed join of the per-session purchase totals, one tiny-key
    // groupBy; same scale shape as attribution.
    "attribution_multi" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val gapUs = GapMinutes * 60L * 1000000L
      val e = events(s, dir).withColumn("us", unix_micros(col("ts")))
      val wUser = Window.partitionBy("user_id").orderBy("us", "event_id")
      val flagged = e
        .withColumn("prev", lag("us", 1).over(wUser))
        .withColumn("new_s",
          when(col("prev").isNull || col("us") - col("prev") > gapUs, 1)
            .otherwise(0))
        .withColumn("sid", sum("new_s").over(wUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val purchases = flagged.where(col("event_type") === "purchase")
        .groupBy("user_id", "sid")
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      val wSess = Window.partitionBy("user_id", "sid")
        .orderBy("us", "event_id")
      val cSess = Window.partitionBy("user_id", "sid")
      val pos = flagged.where(col("event_type") =!= "purchase")
        .withColumn("pos", row_number().over(wSess).cast("long"))
        .withColumn("n", count(lit(1)).over(cSess))
      pos.join(purchases, Seq("user_id", "sid"))
        .withColumn("lin_ppm", expr("1000000L div n"))
        .withColumn("u_ppm",
          when(col("n") === 1, lit(1000000L))
            .when(col("n") === 2, lit(500000L))
            .when(col("pos") === 1 || col("pos") === col("n"), lit(400000L))
            .otherwise(expr("200000L div (n - 2)")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum(col("lin_ppm") * col("cents")).cast("long").as("linear_credit"),
          sum(col("u_ppm") * col("cents")).cast("long").as("ushape_credit"))
        .orderBy("event_type")
    }))

  val oracleSql: Map[String, String] = Map(
    // same user-keyed running max over arrival order, minute buckets
    "lateness_hist" ->
      """WITH r AS (SELECT epoch_us(ts) AS us,
        |    max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS UNBOUNDED PRECEDING) AS mx
        |  FROM events)
        |SELECT (mx - us) // 60000000 AS late_min,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(mx - us) AS BIGINT) AS max_late_us
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "basket_pairs" ->
      s"""WITH items AS (SELECT DISTINCT user_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
         |capped AS (SELECT user_id, item FROM (
         |    SELECT user_id, item, row_number() OVER (
         |      PARTITION BY user_id ORDER BY item) AS rn FROM items)
         |  WHERE rn <= $BasketCap),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS nu
         |  FROM capped),
         |cnt AS (SELECT item, count(*) AS c FROM capped GROUP BY item),
         |pairs AS (SELECT a.item AS item_a, b.item AS item_b,
         |    count(*) AS support
         |  FROM capped a JOIN capped b
         |    ON a.user_id = b.user_id AND a.item < b.item
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport)
         |SELECT p.item_a, p.item_b, p.support,
         |  round(nu.nu * p.support / (CAST(ca.c AS DOUBLE) * cb.c), 6)
         |    AS lift
         |FROM pairs p CROSS JOIN nu
         |JOIN cnt ca ON ca.item = p.item_a
         |JOIN cnt cb ON cb.item = p.item_b
         |ORDER BY p.support DESC, p.item_a, p.item_b""".stripMargin,
    "item_recs" ->
      s"""WITH items AS (SELECT DISTINCT user_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
         |capped AS (SELECT user_id, item FROM (
         |    SELECT user_id, item, row_number() OVER (
         |      PARTITION BY user_id ORDER BY item) AS rn FROM items)
         |  WHERE rn <= $BasketCap),
         |pairs AS (SELECT a.item AS item_a, b.item AS item_b,
         |    count(*) AS support
         |  FROM capped a JOIN capped b
         |    ON a.user_id = b.user_id AND a.item < b.item
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSupport),
         |sym AS (SELECT item_a AS item, item_b AS nbr, support FROM pairs
         |  UNION ALL SELECT item_b, item_a, support FROM pairs),
         |ranked AS (SELECT item, nbr, support, row_number() OVER (
         |    PARTITION BY item ORDER BY support DESC, nbr) AS rank
         |  FROM sym)
         |SELECT item, nbr, support, CAST(rank AS INT) AS rank FROM ranked
         |WHERE rank <= $RecK ORDER BY item, rank""".stripMargin,
    "attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
         |    epoch_us(ts) AS us FROM events),
         |g AS (SELECT *, lag(us) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
         |f AS (SELECT *, CASE WHEN prev IS NULL
         |      OR us - prev > ${GapMinutes * 60L * 1000000L}
         |      THEN 1 ELSE 0 END AS new_s FROM g),
         |sess AS (SELECT *, sum(new_s) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sid FROM f),
         |firsts AS (SELECT user_id, sid, event_type AS first_type FROM (
         |    SELECT user_id, sid, event_type, row_number() OVER (
         |      PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
         |    FROM sess) WHERE rn = 1),
         |p AS (SELECT user_id, sid,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM sess WHERE event_type = 'purchase')
         |SELECT fi.first_type, count(*) AS n_purchases,
         |  CAST(sum(p.cents) AS BIGINT) AS attributed_cents
         |FROM p JOIN firsts fi
         |  ON p.user_id = fi.user_id AND p.sid = fi.sid
         |GROUP BY fi.first_type ORDER BY fi.first_type""".stripMargin,
    // denseIds ≡ row_number()-1 over the identical (value, user) order;
    // quintile = rank*5 // n + 1 in integers on both sides
    "rfm_scores" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT max(day) AS gmax FROM p),
        |base AS (SELECT user_id, g.gmax - max(day) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(cents) AS BIGINT) AS mon
        |  FROM p, g GROUP BY user_id, g.gmax),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
        |r AS (SELECT user_id,
        |    row_number() OVER (ORDER BY -rec, user_id) - 1 AS rk_r,
        |    row_number() OVER (ORDER BY freq, user_id) - 1 AS rk_f,
        |    row_number() OVER (ORDER BY mon, user_id) - 1 AS rk_m
        |  FROM base),
        |sc AS (SELECT r.user_id,
        |    CAST(rk_r * 5 // n.n + 1 AS INT) AS r_score,
        |    CAST(rk_f * 5 // n.n + 1 AS INT) AS f_score,
        |    CAST(rk_m * 5 // n.n + 1 AS INT) AS m_score
        |  FROM r, n)
        |SELECT b.user_id, b.rec, b.freq, b.mon,
        |  sc.r_score, sc.f_score, sc.m_score,
        |  CAST(sc.r_score AS VARCHAR) || CAST(sc.f_score AS VARCHAR)
        |    || CAST(sc.m_score AS VARCHAR) AS segment
        |FROM base b JOIN sc ON b.user_id = sc.user_id
        |ORDER BY b.user_id""".stripMargin,
    "resample_ffill" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE user_id < $FillUsers),
         |daily AS (SELECT user_id, day, CAST(sum(cents) AS BIGINT) AS cents,
         |    CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
         |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
         |days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span),
         |users AS (SELECT DISTINCT user_id FROM e),
         |spine AS (SELECT u.user_id, d.day FROM users u CROSS JOIN days d),
         |j AS (SELECT s.user_id, s.day, daily.cents, daily.n FROM spine s
         |  LEFT JOIN daily ON s.user_id = daily.user_id
         |    AND s.day = daily.day),
         |f AS (SELECT user_id, day, n,
         |    last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
         |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS fc FROM j)
         |SELECT user_id, day, CAST(coalesce(n, 0) AS BIGINT) AS n_events,
         |  CAST(coalesce(fc, 0) AS BIGINT) AS filled_cents
         |FROM f ORDER BY user_id, day""".stripMargin,
    "moving_window" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE user_id < $FillUsers),
         |daily AS (SELECT user_id, day, CAST(sum(cents) AS BIGINT) AS cents
         |  FROM e GROUP BY 1, 2)
         |SELECT user_id, day, cents,
         |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day
         |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS mov3_cents
         |FROM daily ORDER BY user_id, day""".stripMargin,
    "session_bounce" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
         |    epoch_us(ts) AS us FROM events),
         |g AS (SELECT *, lag(us) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
         |f AS (SELECT *, CASE WHEN prev IS NULL
         |      OR us - prev > ${GapMinutes * 60L * 1000000L}
         |      THEN 1 ELSE 0 END AS new_s FROM g),
         |sess AS (SELECT *, sum(new_s) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sid FROM f),
         |firsts AS (SELECT user_id, sid, event_type AS entry_type FROM (
         |    SELECT user_id, sid, event_type, row_number() OVER (
         |      PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
         |    FROM sess) WHERE rn = 1),
         |cnt AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n
         |  FROM sess GROUP BY user_id, sid),
         |per AS (SELECT f.entry_type, c.n FROM firsts f
         |  JOIN cnt c ON f.user_id = c.user_id AND f.sid = c.sid)
         |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bounces,
         |  CAST((CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000) // count(*) AS BIGINT) AS bounce_ppm
         |FROM per GROUP BY entry_type ORDER BY entry_type""".stripMargin,
    "attribution_multi" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
         |    epoch_us(ts) AS us FROM events),
         |g AS (SELECT *, lag(us) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
         |f AS (SELECT *, CASE WHEN prev IS NULL
         |      OR us - prev > ${GapMinutes * 60L * 1000000L}
         |      THEN 1 ELSE 0 END AS new_s FROM g),
         |sess AS (SELECT *, sum(new_s) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sid FROM f),
         |p AS (SELECT user_id, sid,
         |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM sess WHERE event_type = 'purchase' GROUP BY user_id, sid),
         |t AS (SELECT user_id, sid, event_type,
         |    CAST(row_number() OVER (PARTITION BY user_id, sid
         |      ORDER BY us, event_id) AS BIGINT) AS pos,
         |    CAST(count(*) OVER (PARTITION BY user_id, sid) AS BIGINT) AS n
         |  FROM sess WHERE event_type <> 'purchase'),
         |wt AS (SELECT t.event_type, p.cents,
         |    1000000 // t.n AS lin_ppm,
         |    CASE WHEN t.n = 1 THEN 1000000
         |         WHEN t.n = 2 THEN 500000
         |         WHEN t.pos = 1 OR t.pos = t.n THEN 400000
         |         ELSE 200000 // (t.n - 2) END AS u_ppm
         |  FROM t JOIN p ON t.user_id = p.user_id AND t.sid = p.sid)
         |SELECT event_type, count(*) AS n_touches,
         |  CAST(sum(lin_ppm * cents) AS BIGINT) AS linear_credit,
         |  CAST(sum(u_ppm * cents) AS BIGINT) AS ushape_credit
         |FROM wt GROUP BY event_type ORDER BY event_type""".stripMargin)
}
