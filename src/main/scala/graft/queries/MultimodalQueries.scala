package graft.queries

import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal gate queries over REAL codecs: the payloads are real
  * PNG/WAV/frame-container bytes and the decoders are the JDK's ImageIO /
  * AudioSystem (Multimodal.JdkCodec). The corpus encodes the documents'
  * ASCII bytes as the pixel/sample values, so byte i == ord(char i) and
  * every gate stays value-oracle-checkable in SQL even though the bytes
  * on the wire are genuine encoded media.
  */
object MultimodalQueries {

  /** The encoded media corpus, memoized per (session, dir) like every
    * other shared gate input: a real pipeline READS an existing media
    * table — encoding the documents' bytes into PNG/WAV/container
    * payloads is this repo's synthetic stand-in for the lake, so it is
    * fixture synthesis, not the operator under test. Memoizing it makes
    * the four media gates measure DECODE (and its downstream dataflow)
    * in steady state, with the one-time encode on the cold pass. */
  private[graft] val MediaKey = "media.corpus"
  private def sharedMedia(s: SparkSession, dir: String)
  : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    graft.core.QueryCache.shared(MediaKey, s, dir) {
      Multimodal.syntheticMedia(s, dir).toDF().localCheckpoint()
    }.as[Multimodal.MediaRow]
  }

  private[graft] val RgbKey = "media.rgb"
  private def sharedRgbMedia(s: SparkSession, dir: String)
  : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    graft.core.QueryCache.shared(RgbKey, s, dir) {
      Multimodal.syntheticRgbMedia(s, dir).toDF().localCheckpoint()
    }.as[Multimodal.MediaRow]
  }

  private[graft] val StereoKey = "media.stereo"
  private def sharedStereoMedia(s: SparkSession, dir: String)
  : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    graft.core.QueryCache.shared(StereoKey, s, dir) {
      Multimodal.syntheticStereoMedia(s, dir).toDF().localCheckpoint()
    }.as[Multimodal.MediaRow]
  }

  private[graft] val JpegKey = "media.jpeg"
  private def sharedJpegMedia(s: SparkSession, dir: String)
  : org.apache.spark.sql.Dataset[Multimodal.JpegRow] = {
    import s.implicits._
    graft.core.QueryCache.shared(JpegKey, s, dir) {
      Multimodal.syntheticJpegMedia(s, dir).toDF().localCheckpoint()
    }.as[Multimodal.JpegRow]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode + feature plumbing: per image, dims + mean intensity
    "media_stats" -> ((s, dir) => {
      Multimodal.mediaStats(sharedMedia(s, dir)).orderBy("media_id")
    }),

    // audio decode: per WAV clip, sample count, mean amplitude, duration
    // at the decoded sample rate (the corpus samples are the doc's ASCII
    // bytes, so this is value-oracle-checked like media_stats)
    "media_audio" -> ((s, dir) => {
      Multimodal.decodeAudio(sharedMedia(s, dir))
        .toDF().select(col("media_id"), col("n_samples"),
          round(col("mean_amplitude"), 4).as("mean_amplitude"),
          round(col("n_samples").cast("double") / col("sample_rate"), 6)
            .as("duration_s"))
        .orderBy("media_id")
    }),

    // decode -> resize (thumbnail/normalize): per image, the 8x8
    // nearest-sample downscale's mean — integer-division indexing, so
    // the whole chain is SQL-exact over the real PNG decode
    "media_resize" -> ((s, dir) => {
      Multimodal.resizeImages(sharedMedia(s, dir), outW = 8, outH = 8)
        .toDF().select(col("media_id"), col("out_w"), col("out_h"),
          round(col("mean_resized"), 4).as("mean_resized"))
        .orderBy("media_id")
    }),

    // audio feature extraction beyond the mean: RMS energy (exact
    // integer sum of squares under the sqrt) and the mean-crossing
    // count (ASCII samples never cross the PCM midpoint, so crossings
    // count against the clip's own mean)
    "media_audio_features" -> ((s, dir) => {
      Multimodal.audioFeatures(sharedMedia(s, dir))
        .toDF().select(col("media_id"), col("n_samples"),
          round(col("rms"), 4).as("rms"), col("mean_crossings"))
        .orderBy("media_id")
    }),

    // multi-channel decode: per RGB PNG, dims + per-channel means — the
    // all-band read the gray corpus cannot exercise (PNG is lossless, so
    // every channel mean is SQL-exact over the doc's byte triples)
    "media_rgb_stats" -> ((s, dir) => {
      Multimodal.decodeRgbImages(sharedRgbMedia(s, dir))
        .toDF().select(col("media_id"), col("width"), col("height"),
          col("channels"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("media_id")
    }),

    // 16-bit stereo decode: per clip, sample count + exact per-channel
    // means — signed 16-bit PCM is lossless, so both channels stay
    // SQL-exact over the doc's byte quads
    "media_stereo" -> ((s, dir) => {
      Multimodal.decodeStereo(sharedStereoMedia(s, dir))
        .toDF().select(col("media_id"), col("n_samples"),
          round(col("mean_l"), 4).as("mean_l"),
          round(col("mean_r"), 4).as("mean_r"))
        .orderBy("media_id")
    }),

    // lossy-codec probe: real JPEG encode/decode; the decode pins what
    // JPEG CAN promise — exact dimensions and an image mean within
    // JpegMeanTolerance of the lossless source mean (per-pixel exactness
    // is not a contract a lossy codec can sign)
    "media_jpeg" -> ((s, dir) => {
      Multimodal.jpegProbe(sharedJpegMedia(s, dir))
        .toDF().select(col("media_id"), col("width"), col("height"),
          col("mean_ok"))
        .orderBy("media_id")
    }),

    // frame sampling: per video, how many frames survive the stride
    "media_frames" -> ((s, dir) => {
      Multimodal.sampleFrames(sharedMedia(s, dir), stride = 2)
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
        .orderBy("media_id")
    }),

    // cross-module integration: PNG-decode images -> histogram embeddings
    // -> brute-force cosine top-k over them (the full multimodal-to-ANN
    // pipeline). The decoded pixels are the doc bytes and the float
    // histogram arithmetic is exactly reproducible in SQL (exact-int
    // operands, one REAL division), so even this composite is
    // value-oracle-checked.
    "media_similar" -> ((s, dir) => {
      val dec = Multimodal.decodeImages(sharedMedia(s, dir))
        .toDF().select(col("media_id"), col("embedding"))
      graft.operators.SimilaritySearch.cosineTopK(
        dec, dec.where(col("media_id") < 10), "media_id", "embedding", 5)
        .orderBy("q_id", "rank")
    }))

  val oracleSql: Map[String, String] = Map(
    // image docs -> 8-bin intensity histogram (count/npix in REAL, the
    // codec's float division, then DOUBLE like Spark's float->double
    // cast) -> pairwise cosine -> top-5 by (round(sim,6) desc, id)
    "media_similar" ->
      """WITH img AS (SELECT doc_id AS media_id,
        |    16 * CAST(n_chars // 16 AS INT) AS npix, text
        |  FROM documents WHERE doc_id % 3 = 0 AND n_chars >= 16),
        |emb AS (SELECT media_id,
        |    list_transform(range(0, 8), b -> CAST(CAST(
        |      len(list_filter(list_transform(range(1, npix + 1),
        |        i -> ord(substr(text, i, 1))), p -> p // 32 = b))
        |      AS REAL) / CAST(npix AS REAL) AS DOUBLE)) AS e
        |  FROM img),
        |scored AS (SELECT a.media_id AS q_id, b.media_id AS id,
        |    round(list_dot_product(a.e, b.e) /
        |      (sqrt(list_dot_product(a.e, a.e)) *
        |       sqrt(list_dot_product(b.e, b.e))), 6) AS sim
        |  FROM emb a JOIN emb b
        |  ON a.media_id < 10 AND a.media_id <> b.media_id),
        |ranked AS (SELECT q_id, id, sim, row_number() OVER (
        |    PARTITION BY q_id ORDER BY sim DESC, id) AS rank
        |  FROM scored)
        |SELECT q_id, id, sim, CAST(rank AS INT) AS rank FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "media_stats" ->
      """SELECT doc_id AS media_id, 16 AS width,
        |  CAST(n_chars // 16 AS INT) AS height,
        |  round(CAST(list_sum(list_transform(
        |      range(1, 16 * CAST(n_chars // 16 AS INT) + 1),
        |      i -> ord(substr(text, i, 1)))) AS DOUBLE)
        |    / (16 * CAST(n_chars // 16 AS INT)), 4) AS mean_intensity
        |FROM documents WHERE doc_id % 3 = 0 AND n_chars >= 16
        |ORDER BY media_id""".stripMargin,
    "media_audio" ->
      """SELECT doc_id AS media_id, CAST(n_chars AS BIGINT) AS n_samples,
        |  round(CAST(list_sum(list_transform(range(1, n_chars + 1),
        |      i -> ord(substr(text, i, 1)))) AS DOUBLE) / n_chars, 4)
        |    AS mean_amplitude,
        |  round(CAST(n_chars AS DOUBLE) / 16000, 6) AS duration_s
        |FROM documents WHERE doc_id % 3 = 1 AND n_chars >= 1
        |ORDER BY media_id""".stripMargin,
    // resized pixel (y,x) = source pixel (min(y*inH//8, inH-1),
    // min(x*2, 15)) — the kernel's integer-division indexing verbatim
    "media_resize" ->
      """SELECT doc_id AS media_id, 8 AS out_w, 8 AS out_h,
        |  round(CAST(list_sum(flatten(list_transform(range(0, 8), y ->
        |    list_transform(range(0, 8), x ->
        |      ord(substr(text,
        |        CAST(least(y * (n_chars // 16) // 8, n_chars // 16 - 1)
        |          * 16 + least(x * 2, 15) + 1 AS INT), 1))))))
        |    AS DOUBLE) / 64, 4) AS mean_resized
        |FROM documents WHERE doc_id % 3 = 0 AND n_chars >= 16
        |ORDER BY media_id""".stripMargin,
    "media_audio_features" ->
      """WITH s AS (SELECT doc_id AS media_id, n_chars,
        |    list_transform(range(1, n_chars + 1),
        |      i -> ord(substr(text, CAST(i AS INT), 1))) AS sm
        |  FROM documents WHERE doc_id % 3 = 1 AND n_chars >= 1),
        |f AS (SELECT media_id, CAST(n_chars AS BIGINT) AS n_samples,
        |    round(sqrt(CAST(list_sum(list_transform(sm, v -> v * v))
        |      AS DOUBLE) / n_chars), 4) AS rms,
        |    CAST(list_sum(sm) AS DOUBLE) / n_chars AS mn, sm, n_chars
        |  FROM s)
        |SELECT media_id, n_samples, rms,
        |  CAST(len(list_filter(range(2, n_chars + 1),
        |    i -> (sm[CAST(i - 1 AS INT)] < mn) <> (sm[CAST(i AS INT)] < mn)))
        |    AS BIGINT) AS mean_crossings
        |FROM f ORDER BY media_id""".stripMargin,
    // RGB: pixel p's channel c is doc byte 3p+c (0-based), so the
    // channel mean is an exact integer sum over every third byte
    "media_rgb_stats" ->
      """SELECT doc_id AS media_id, 16 AS width,
        |  CAST(n_chars // 48 AS INT) AS height, 3 AS channels,
        |  round(CAST(list_sum(list_transform(
        |      range(0, 16 * CAST(n_chars // 48 AS INT)),
        |      p -> ord(substr(text, CAST(3 * p + 1 AS INT), 1))))
        |    AS DOUBLE) / (16 * (n_chars // 48)), 4) AS mean_r,
        |  round(CAST(list_sum(list_transform(
        |      range(0, 16 * CAST(n_chars // 48 AS INT)),
        |      p -> ord(substr(text, CAST(3 * p + 2 AS INT), 1))))
        |    AS DOUBLE) / (16 * (n_chars // 48)), 4) AS mean_g,
        |  round(CAST(list_sum(list_transform(
        |      range(0, 16 * CAST(n_chars // 48 AS INT)),
        |      p -> ord(substr(text, CAST(3 * p + 3 AS INT), 1))))
        |    AS DOUBLE) / (16 * (n_chars // 48)), 4) AS mean_b
        |FROM documents WHERE n_chars >= 48 ORDER BY media_id""".stripMargin,
    // stereo: sample i's L is the recentered big-endian pair (4i,4i+1),
    // R the pair (4i+2,4i+3) — exact integer sums per channel
    "media_stereo" ->
      """SELECT doc_id AS media_id,
        |  CAST(n_chars // 4 AS BIGINT) AS n_samples,
        |  round(CAST(list_sum(list_transform(range(0, CAST(n_chars // 4 AS INT)),
        |      i -> ord(substr(text, CAST(4 * i + 1 AS INT), 1)) * 256
        |        + ord(substr(text, CAST(4 * i + 2 AS INT), 1)) - 32768))
        |    AS DOUBLE) / (n_chars // 4), 4) AS mean_l,
        |  round(CAST(list_sum(list_transform(range(0, CAST(n_chars // 4 AS INT)),
        |      i -> ord(substr(text, CAST(4 * i + 3 AS INT), 1)) * 256
        |        + ord(substr(text, CAST(4 * i + 4 AS INT), 1)) - 32768))
        |    AS DOUBLE) / (n_chars // 4), 4) AS mean_r
        |FROM documents WHERE doc_id % 3 = 1 AND n_chars >= 4
        |ORDER BY media_id""".stripMargin,
    // JPEG preserves dims exactly; the mean invariant must always hold
    "media_jpeg" ->
      """SELECT doc_id AS media_id, 16 AS width,
        |  CAST(n_chars // 16 AS INT) AS height, TRUE AS mean_ok
        |FROM documents WHERE doc_id % 3 = 0 AND n_chars >= 16
        |ORDER BY media_id""".stripMargin,
    "media_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(floor((ceil(n_chars / 32.0) - 1) / 2) + 1 AS BIGINT)
        |    AS n_frames
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin)
}
