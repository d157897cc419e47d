package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class EventStreamsSpec extends GraftSuite {
  import spark.implicits._

  test("windowed counts: streaming result equals batch result") {
    val batch = EventStreams.windowedCounts(
      graft.core.Tables.table(spark, sf0001, "events"), "1 day")
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val stream = EventStreams.windowedCounts(
      EventStreams.readEventStream(spark, sf0001), "1 day")
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(got == batch, "stream ≠ batch on identical input")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup equals batch distinct on a duplicated stream") {
    val batchEvents = graft.core.Tables.table(spark, sf0001, "events")
    // duplicate every event, then dedup by id: stream result == batch
    val dupBatch = batchEvents.unionByName(batchEvents)
    val expected = EventStreams.dedupStream(dupBatch, Seq("event_id"))
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap

    val s = EventStreams.readEventStream(spark, sf0001)
    val dupStream = s.unionByName(s)
    val q = EventStreams.dedupStream(dupStream, Seq("event_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").groupBy("event_type").count()
        .as[(String, Long)].collect().toMap
      assert(got == expected, "stream dedup ≠ batch distinct")
      assert(got.values.sum == batchEvents.count())
    } finally q.stop()
  }

  test("asof lastPrior: inclusive at-or-before, latest wins, null if none") {
    val clicks = Seq((1L, 1L, 4L), (2L, 1L, 10L), (3L, 1L, 20L), (4L, 2L, 10L))
      .toDF("event_id", "user", "ts")
    val views = Seq((1L, 10L, 1.0), (1L, 15L, 2.0)).toDF("user", "ts", "v")
    val out = graft.operators.AsofJoin
      .lastPrior(clicks, views, "user", "ts", Seq("ts", "v"))
      .select(col("event_id"), col("asof.v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty, "no view at or before ts=4")
    assert(out(2L).contains(1.0), "boundary is inclusive (view AT ts=10)")
    assert(out(3L).contains(2.0), "latest prior view wins")
    assert(out(4L).isEmpty, "keys don't leak across users")
  }

  test("range lookbackAgg: inclusive bounds, zero when empty, no double count") {
    val clicks = Seq((1L, 1L, 100L), (2L, 1L, 250L), (3L, 2L, 100L))
      .toDF("event_id", "user", "ts")
    val views = Seq((1L, 0L, 1.0), (1L, 100L, 2.0), (1L, 151L, 4.0))
      .toDF("user", "ts", "v")
    val out = graft.operators.RangeJoin
      .lookbackAgg(clicks, views, "user", "ts", windowLen = 100L,
        aggs = Seq(count(col("r_ts")).as("n"),
          coalesce(sum(col("r_v")), lit(0.0)).as("sv")))
      .select(col("event_id"), col("n"), col("sv"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == ((2L, 3.0)), "ts 0 and 100 both inside [0, 100]")
    assert(out(2L) == ((1L, 4.0)), "only ts 151 inside [150, 250]")
    assert(out(3L) == ((0L, 0.0)), "no views for user 2")
  }

  test("stream-stream lookback join equals the batch join") {
    def split(df: org.apache.spark.sql.DataFrame) =
      (df.where(col("event_type") === "view"),
        df.where(col("event_type") === "click"))
    val (bv, bc) = split(graft.core.Tables.table(spark, sf0001, "events"))
    val batch = EventStreams.lookbackJoin(bv, bc, lookbackMinutes = 30)
      .select("r_id", "l_id").as[(Long, Long)].collect().toSet

    val (sv, sc) = split(EventStreams.readEventStream(spark, sf0001))
    val q = EventStreams.lookbackJoin(sv, sc, lookbackMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("lbj_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("lbj_out")
        .select("r_id", "l_id").as[(Long, Long)].collect().toSet
      assert(got == batch, "stream join ≠ batch join on identical input")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join") {
    val batchEvents = graft.core.Tables.table(spark, sf0001, "events")
    // static reference data: per-user lifetime-value tier
    val dim = batchEvents.groupBy("user_id")
      .agg((sum("value") > 100.0).as("high_value"))
    def project(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "high_value")
        .as[(Long, Long, Boolean)].collect().toSet
    val batch = project(EventStreams.enrichJoin(batchEvents, dim))
    val q = EventStreams.enrichJoin(
        EventStreams.readEventStream(spark, sf0001), dim)
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val got = project(spark.table("enrich_out"))
      assert(got == batch, "stream-static enrichment ≠ batch join")
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("lateness histogram buckets out-of-order arrivals; zero when in-order") {
    val M = 60000000L
    // user 1 arrives in-order; user 2's third arrival is 2.5 min stale
    // and its fifth is 1 min stale
    val rows = Seq(
      (1L, 1L, 0L), (1L, 2L, M), (1L, 3L, 2 * M),
      (2L, 1L, 10 * M), (2L, 2L, 13 * M), (2L, 3L, 13 * M - 5 * M / 2),
      (2L, 4L, 14 * M), (2L, 5L, 13 * M))
      .toDF("user_id", "event_id", "us")
    val byBucket = EventStreams
      .latenessHistogram(rows, "user_id", "event_id", "us")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // in-order events (user 1's three + user 2's rows 1,2,4) → bucket 0;
    // 2.5 min stale → bucket 2 with max 150s; 1 min stale → bucket 1
    assert(byBucket(0L) == ((6L, 0L)))
    assert(byBucket(1L) == ((1L, M)))
    assert(byBucket(2L) == ((1L, 5 * M / 2)))
    assert(byBucket.size == 3)
  }

  test("batch sessionization invariants") {
    val ev = graft.core.Tables.table(spark, sf0001, "events")
    val sess = EventStreams.sessionize(ev, gapMinutes = 60).cache()
    val total = sess.agg(sum("n_events")).head().getLong(0)
    assert(total == ev.count(), "every event lands in exactly one session")
    // sessions of one user don't overlap and are ordered
    val rows = sess.orderBy("user_id", "session_idx")
      .select("user_id", "start_us", "end_us")
      .as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, ss) =>
      ss.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._2, "sessions overlap")
        case _ =>
      }
    }
  }

  test("stateful streaming sessionization emits per-user sessions") {
    val evs = graft.core.Tables.table(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"), col("value"))
      .as[EventStreams.Ev]
    // run the same stateful logic in batch mode via groupByKey+flatMapGroups
    // equivalence: session count must match the window-function sessionizer
    val stateful = EventStreams.statefulSessions(evs, gapMinutes = 60)
    // statefulSessions targets streaming; in batch each group sees all
    // events at once, so open+closed sessions == total sessions
    val n = stateful.count()
    val expected = EventStreams.sessionize(
      graft.core.Tables.table(spark, sf0001, "events"), 60).count()
    assert(n == expected, s"stateful $n vs window-based $expected")
  }

  test("streaming foreachBatch upsert folds to the batch merge") {
    // exactly-once snapshot refresh from a stream: each micro-batch is
    // MergeUpsert.lastWriterWins'd into the running snapshot; with
    // unique versions per key the fold is order-insensitive, so the
    // final snapshot must equal one batch merge over ALL rows —
    // including out-of-order (stale) arrivals and tombstone/re-insert.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.DataFrame
    implicit val sq = spark.sqlContext
    // rows: (user, version, value, del)
    val b1 = Seq[(Long, Long, Double, Boolean)]((1L, 1L, 10.0, false),
      (2L, 1L, 20.0, false), (3L, 1L, 30.0, false))
    val b2 = Seq[(Long, Long, Double, Boolean)]((1L, 10L, 11.0, false),
      (2L, 2L, 21.0, false), (4L, 1L, 40.0, false))
    val b3 = Seq[(Long, Long, Double, Boolean)](
      (1L, 7L, 99.0, false), // stale: must NOT override v=10
      (3L, 5L, 0.0, true),   // tombstone kills user 3
      (2L, 3L, 0.0, true), (2L, 4L, 22.0, false)) // delete then re-insert
    val all = (b1 ++ b2 ++ b3).toDF("user_id", "us", "value", "del")
    val expected = graft.operators.MergeUpsert
      .lastWriterWins(all.limit(0), all, Seq("user_id"), "us", "del")
      .select("user_id", "us", "value").as[(Long, Long, Double)]
      .collect().toSet

    val src = MemoryStream[(Long, Long, Double, Boolean)]
    var snapshot: DataFrame = all.limit(0)
    val q = src.toDF().toDF("user_id", "us", "value", "del")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        snapshot = graft.operators.MergeUpsert
          .lastWriterWins(snapshot, batch, Seq("user_id"), "us", "del")
          .localCheckpoint()
      }.start()
    try {
      Seq(b1, b2, b3).foreach { b => src.addData(b); q.processAllAvailable() }
      val got = snapshot.select("user_id", "us", "value")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"stream fold $got != batch merge $expected")
      assert(!got.exists(_._1 == 3L), "tombstoned key must be gone")
      assert(got.contains((2L, 4L, 22.0)), "re-insert after delete survives")
      assert(got.contains((1L, 10L, 11.0)), "stale arrival must not win")
    } finally q.stop()
  }

  test("stateful attribution folds to the batch attribution gate") {
    val evs = graft.core.Tables.table(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"),
        col("event_id"), col("event_type"), col("value"))
      .as[EventStreams.AEv]
    // batch mode: each group sees every event at once, so closed + open
    // sessions cover the whole log; summing per first_type must equal
    // the window-based gate (which only emits types with >= 1 purchase)
    val got = EventStreams.statefulAttribution(evs, 60)
      .groupBy("first_type")
      .agg(sum("n_purchases").as("np"), sum("attributed_cents").as("ac"))
      .where(col("np") > 0)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exp = SparkEntry.queries("attribution")(spark, sf0001)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == exp, s"stateful $got != gate $exp")
  }

  test("streaming attribution carries open sessions across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def min(m: Long): Long = m * 60L * 1000000L
    val evs = Seq(
      EventStreams.AEv(1, min(0), 1, "view", 9.99),
      EventStreams.AEv(1, min(10), 2, "purchase", 1.23),
      EventStreams.AEv(2, min(5), 3, "purchase", 0.555),
      EventStreams.AEv(1, min(200), 4, "click", 0.0),
      EventStreams.AEv(1, min(210), 5, "purchase", 2.0),
      EventStreams.AEv(2, min(400), 6, "view", 0.0))
    // ts-ordered slices; user 1's second session SPANS the batch split
    // (click arrives in batch 2, its purchase in batch 3)
    val batches = Seq(evs.filter(_.tsUs < min(100)),
      evs.filter(e => e.tsUs >= min(100) && e.tsUs < min(205)),
      evs.filter(_.tsUs >= min(205)))
    val src = MemoryStream[EventStreams.AEv]
    val q = EventStreams.statefulAttribution(src.toDS(), 60)
      .writeStream.outputMode("update")
      .format("memory").queryName("attr_out").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      // update mode re-emits a session as it grows; counters are
      // monotone, so the max per (user, session start) is its final
      // state — compare against a single batch-mode pass over all rows
      val emitted = spark.table("attr_out")
        .groupBy("user_id", "start_us", "first_type")
        .agg(max("n_purchases").as("np"), max("attributed_cents").as("ac"))
        .as[(Long, Long, String, Long, Long)].collect().toSet
      val oneShot = EventStreams
        .statefulAttribution(evs.toDS(), 60)
        .select(col("user_id"), col("start_us"), col("first_type"),
          col("n_purchases"), col("attributed_cents"))
        .as[(Long, Long, String, Long, Long)].collect().toSet
      assert(emitted == oneShot, s"stream $emitted != one-shot $oneShot")
      // the split session credited its click first-touch with the
      // batch-3 purchase
      assert(emitted.contains((1L, min(200), "click", 1L, 200L)))
      assert(emitted.contains((2L, min(5), "purchase", 1L, 55L)),
        "floor(0.555 * 100) = 55 cents")
    } finally q.stop()
  }
}

class MultimodalSpec extends GraftSuite {
  import graft.multimodal.Multimodal
  import spark.implicits._

  test("synthetic media: kinds partition the corpus, payloads non-empty") {
    val m = Multimodal.syntheticMedia(spark, sf0001).cache()
    val kinds = m.groupByKey(_.kind).count().collect().toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(m.filter(_.payload.isEmpty).count() == 0)
  }

  test("decode pipeline: dims and features are consistent") {
    val m = Multimodal.syntheticMedia(spark, sf0001)
    val dec = Multimodal.decodeImages(m).cache()
    val rows = dec.collect()
    assert(rows.nonEmpty)
    rows.foreach { d =>
      assert(d.width == 16 && d.height >= 1 && d.channels == 1)
      assert(d.mean.head >= 0 && d.mean.head <= 255)
      assert(d.embedding.length == 8)
      assert(math.abs(d.embedding.sum - 1.0f) < 1e-3, "histogram normalized")
    }
  }

  test("frame sampling: stride-2 keeps every other frame") {
    val m = Multimodal.syntheticMedia(spark, sf0001)
    val frames = Multimodal.sampleFrames(m, stride = 2)
    val idx = frames.select("frame_idx").as[Int].collect()
    assert(idx.nonEmpty && idx.forall(_ % 2 == 0))
  }

  test("stub resize downsamples deterministically") {
    val px = Array.tabulate(8, 8)((y, x) => y * 8 + x)
    val out = Multimodal.StubCodec.resize(px, 4, 4)
    assert(out.length == 4 && out.head.length == 4)
    assert(out(0)(0) == 0 && out(3)(3) == px(6)(6))
  }

  test("JdkCodec: PNG round-trips bytes exactly and matches the stub seam") {
    val bytes = Array.tabulate(48)(i => (32 + i % 95).toByte) // printable ASCII
    val png = Multimodal.JdkCodec.encodePng(bytes, 16, 3)
    // a real PNG on the wire, not the raw bytes
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val (w, h, px) = Multimodal.JdkCodec.decodePng(png)
    assert(w == 16 && h == 3)
    val stub = Multimodal.StubCodec.decodeImage(bytes, 16, 3)
    assert(px.map(_.toSeq).toSeq == stub.map(_.toSeq).toSeq,
      "real PNG decode must equal the identity seam sample-for-sample")
  }

  test("JdkCodec: WAV round-trips 8-bit unsigned PCM exactly") {
    val samples = Array.tabulate(100)(i => (i % 256).toByte)
    val wav = Multimodal.JdkCodec.encodeWav(samples, 16000)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val (rate, out) = Multimodal.JdkCodec.decodeWav(wav)
    assert(rate == 16000)
    assert(out.toSeq == samples.map(java.lang.Byte.toUnsignedInt).toSeq)
  }

  test("JdkCodec: frame container seeks by prefix and decodes sampled frames") {
    val chunks = Seq(Array.fill(32)(7.toByte), Array.fill(32)(9.toByte),
      Array.fill(5)(3.toByte)) // short tail frame
    val container = Multimodal.JdkCodec.encodeFrameContainer(chunks.iterator)
    val frames = Multimodal.JdkCodec.frameIndex(container).toSeq
    assert(frames.map(_._1) == Seq(0, 1, 2))
    val decoded = frames.map { case (_, png) => Multimodal.JdkCodec.decodePng(png) }
    assert(decoded.map(_._1) == Seq(32, 32, 5), "frame widths preserved")
    assert(decoded(2)._3(0).toSeq == Seq(3, 3, 3, 3, 3))
    // corrupt length prefix fails loudly instead of yielding junk frames
    val corrupt = container.clone(); corrupt(0) = 0x7f.toByte
    intercept[IllegalArgumentException] {
      Multimodal.JdkCodec.frameIndex(corrupt).toSeq
    }
  }

  test("resize + audio features reproduce the text-byte formulas exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val m = Multimodal.syntheticMedia(spark, sf0001)
    Multimodal.resizeImages(m, 8, 8).take(5).foreach { r =>
      val b = docs(r.media_id).getBytes("UTF-8")
      val inH = b.length / 16
      val expect = (for (y <- 0 until 8; x <- 0 until 8) yield
        b(math.min(y * inH / 8, inH - 1) * 16 + math.min(x * 2, 15)).toDouble)
        .sum / 64
      assert(math.abs(r.mean_resized - expect) < 1e-9, s"media_id=${r.media_id}")
    }
    Multimodal.audioFeatures(m).take(5).foreach { a =>
      val s = docs(a.media_id).getBytes("UTF-8")
        .map(java.lang.Byte.toUnsignedInt(_))
      val rms = math.sqrt(s.map(v => v.toLong * v).sum.toDouble / s.length)
      val mean = s.map(_.toLong).sum.toDouble / s.length
      val mc = s.sliding(2).count(p => (p(0) < mean) != (p(1) < mean))
      assert(a.n_samples == s.length && math.abs(a.rms - rms) < 1e-12 &&
        a.mean_crossings == mc, s"media_id=${a.media_id}")
      assert(a.mean_crossings > 0, "mean-crossing count is vacuously zero")
    }
  }

  test("synthetic media payloads are real encoded media, decode = doc bytes") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val m = Multimodal.syntheticMedia(spark, sf0001)
    val img = Multimodal.decodeImages(m).take(5)
    img.foreach { d =>
      val expect = docs(d.media_id).getBytes("UTF-8")
        .take(d.width * d.height).map(java.lang.Byte.toUnsignedInt(_))
      assert(math.abs(d.mean.head - expect.map(_.toDouble).sum / expect.length) < 1e-9,
        s"decoded PNG mean must equal the text-byte formula for ${d.media_id}")
    }
    val aud = Multimodal.decodeAudio(m).take(5)
    aud.foreach { a =>
      val expect = docs(a.media_id).getBytes("UTF-8").map(java.lang.Byte.toUnsignedInt(_))
      assert(a.n_samples == expect.length)
      assert(math.abs(a.mean_amplitude - expect.map(_.toDouble).sum / expect.length) < 1e-9)
    }
  }

  test("JdkCodec: RGB PNG round-trips every channel exactly, band 0 = red") {
    // pixel p's (R,G,B) are bytes 3p..3p+2 — decode must give them back
    // per band, not just band 0 (the gray path's old contract)
    val bytes = Array.tabulate(16 * 2 * 3)(i => (i * 7 % 256).toByte)
    val png = Multimodal.JdkCodec.encodeRgbPng(bytes, 16, 2)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val (w, h, px) = Multimodal.JdkCodec.decodeImageBands(png)
    assert(w == 16 && h == 2 && px.length == 3)
    for (c <- 0 until 3; y <- 0 until 2; x <- 0 until 16)
      assert(px(c)(y)(x) ==
        java.lang.Byte.toUnsignedInt(bytes((y * 16 + x) * 3 + c)),
        s"channel $c pixel ($x,$y) diverged")
    // the gray band-0 read on an RGB payload sees the RED channel
    val (_, _, band0) = Multimodal.JdkCodec.decodePng(png)
    assert(band0.map(_.toSeq).toSeq == px(0).map(_.toSeq).toSeq)
  }

  test("rgb corpus decode reproduces the per-channel text-byte formulas") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = Multimodal.decodeRgbImages(
      Multimodal.syntheticRgbMedia(spark, sf0001)).take(5)
    assert(got.nonEmpty)
    got.foreach { d =>
      val b = docs(d.media_id).getBytes("UTF-8")
      val npix = 16 * (b.length / 48)
      assert(d.width == 16 && d.height == b.length / 48 && d.channels == 3)
      def mean(c: Int): Double =
        (0 until npix).map(p => java.lang.Byte.toUnsignedInt(b(3 * p + c))
          .toDouble).sum / npix
      assert(math.abs(d.mean_r - mean(0)) < 1e-9 &&
        math.abs(d.mean_g - mean(1)) < 1e-9 &&
        math.abs(d.mean_b - mean(2)) < 1e-9, s"media_id=${d.media_id}")
    }
  }

  test("JdkCodec: 16-bit stereo WAV round-trips both channels exactly") {
    val l = Array.tabulate(200)(i => i * 321 - 32000) // spans negatives
    val r = Array.tabulate(200)(i => 32700 - i * 123)
    val wav = Multimodal.JdkCodec.encodeWav16Stereo(l, r, 16000)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val (rate, gotL, gotR) = Multimodal.JdkCodec.decodeWav16Stereo(wav)
    assert(rate == 16000 && gotL.toSeq == l.toSeq && gotR.toSeq == r.toSeq)
    // the 8-bit mono decoder refuses the stereo format loudly
    intercept[IllegalArgumentException] {
      Multimodal.JdkCodec.decodeWav(wav)
    }
  }

  test("stereo corpus decode reproduces the byte-quad formulas exactly") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val got = Multimodal.decodeStereo(
      Multimodal.syntheticStereoMedia(spark, sf0001)).take(5)
    assert(got.nonEmpty)
    got.foreach { d =>
      val b = docs(d.media_id).getBytes("UTF-8")
      val n = b.length / 4
      def u(i: Int): Int = java.lang.Byte.toUnsignedInt(b(i))
      val ml = (0 until n).map(i => (u(4 * i) << 8 | u(4 * i + 1)) - 32768)
        .map(_.toDouble).sum / n
      val mr = (0 until n).map(i => (u(4 * i + 2) << 8 | u(4 * i + 3)) - 32768)
        .map(_.toDouble).sum / n
      assert(d.n_samples == n && math.abs(d.mean_l - ml) < 1e-9 &&
        math.abs(d.mean_r - mr) < 1e-9, s"media_id=${d.media_id}")
      assert(d.mean_l < 0 || d.mean_r < 0 || d.mean_l != d.mean_r,
        "channels identical and non-negative — stereo test may be vacuous")
    }
  }

  test("JPEG probe: real lossy payloads, exact dims, mean within tolerance") {
    val probes = Multimodal.jpegProbe(
      Multimodal.syntheticJpegMedia(spark, sf0001))
    val rows = probes.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.mean_ok),
      s"${rows.count(!_.mean_ok)} clips exceeded JpegMeanTolerance=" +
        s"${Multimodal.JpegMeanTolerance}")
    // the payloads really are JPEG (SOI marker) and really are lossy:
    // at least one clip must decode to different bytes than its source
    val media = Multimodal.syntheticJpegMedia(spark, sf0001).take(10)
    assert(media.forall(r => (r.payload(0) & 0xff) == 0xd8 ||
      (r.payload(1) & 0xff) == 0xd8), "payload lacks the JPEG SOI marker")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val anyLossy = media.exists { r =>
      val src = docs(r.media_id).getBytes("UTF-8").take(r.width * r.height)
        .map(java.lang.Byte.toUnsignedInt(_))
      val (_, _, px) = Multimodal.JdkCodec.decodePng(r.payload)
      px.flatten.toSeq != src.toSeq
    }
    assert(anyLossy, "JPEG decode was byte-exact — probe is vacuous")
  }
}
