package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride through the engine as opaque `binary` payload columns plus a
  * typed metadata struct — the schema/partitioning/batch-shape layer is
  * real and tested; only the codec kernel itself is a STUB (this container
  * has no image/audio libraries), clearly marked in [[StubCodec]]. A real
  * deployment swaps [[StubCodec]] for JNI/javacpp bindings without touching
  * any dataflow code: decode runs in `mapPartitions` so a batch of payloads
  * amortizes codec init per partition (the Scala analogue of a Pandas-UDF
  * `mapInPandas` batch), and partition sizing is by `repartition` on the
  * id — at 100 TB the payloads never pass through a shuffle unless asked.
  */
object Multimodal {

  /** Typed media row: payload + metadata (what a real lakehouse media
    * table looks like: bytes + sidecar fields). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Decoded image: dims + per-channel summary features. */
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          channels: Int, mean: Array[Double], embedding: Array[Float])

  /** STUB CODEC — deterministic fake. Real impl would call an image/audio
    * library here; everything below this object is production dataflow. */
  object StubCodec {
    /** "Decode" a payload: interpret bytes as row-major gray pixels. */
    def decodeImage(payload: Array[Byte], width: Int, height: Int): Array[Array[Int]] = {
      val px = Array.ofDim[Int](height, width)
      var i = 0
      while (i < width * height) {
        px(i / width)(i % width) = java.lang.Byte.toUnsignedInt(
          payload(i % math.max(payload.length, 1)))
        i += 1
      }
      px
    }

    /** "Feature-extract": 8-bin intensity histogram, L1-normalized. */
    def embed(pixels: Array[Array[Int]]): Array[Float] = {
      val h = new Array[Float](8)
      var n = 0
      pixels.foreach(_.foreach { p => h(p / 32) += 1f; n += 1 })
      if (n > 0) (0 until 8).foreach(i => h(i) /= n)
      h
    }

    /** "Resize" by integer-factor pixel averaging. */
    def resize(pixels: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] = {
      val inH = pixels.length; val inW = pixels.headOption.map(_.length).getOrElse(0)
      Array.tabulate(outH, outW) { (y, x) =>
        pixels(math.min(y * inH / math.max(outH, 1), inH - 1))(
          math.min(x * inW / math.max(outW, 1), inW - 1))
      }
    }
  }

  /** Deterministic synthetic media table derived from `documents` (text
    * bytes as payload), so every SF has a media corpus without binary
    * fixtures. */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(16).as("width"),
        (col("n_chars") / lit(16)).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** Batch decode + feature-extract via mapPartitions: one codec "init"
    * per partition, vectorized over the partition's rows. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    // payloads below one scanline (height 0) are undecodable and skipped —
    // a row-dropping codec policy both the SQL oracle and the stub share
    // (the old max(height,1) clamp silently diverged from the oracle's
    // n_chars//16 on sub-scanline docs)
    media.filter(r => r.kind == "image" && r.height >= 1).mapPartitions { rows =>
      // real codec would init here, once per partition
      rows.map { r =>
        val px = StubCodec.decodeImage(r.payload, r.width, r.height)
        val mean = Array(px.map(_.sum.toDouble).sum / (r.width * r.height))
        DecodedImage(r.media_id, r.width, r.height, 1, mean, StubCodec.embed(px))
      }
    }
  }

  /** Decoded audio: per-payload waveform summary. */
  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Long,
                          mean_amplitude: Double)

  /** Batch audio decode via mapPartitions (same codec-init-amortizing
    * shape as [[decodeImages]]): bytes as unsigned 8-bit samples — the
    * stub's deterministic stand-in for a PCM decoder. Empty payloads are
    * undecodable and skipped. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "audio" && r.payload.nonEmpty)
      .mapPartitions { rows =>
        // real codec would init here, once per partition
        rows.map { r =>
          val n = r.payload.length
          var s = 0L
          var i = 0
          while (i < n) { s += java.lang.Byte.toUnsignedInt(r.payload(i)); i += 1 }
          DecodedAudio(r.media_id, r.sample_rate, n.toLong, s.toDouble / n)
        }
      }
  }

  /** Frame sampling for video rows: every `stride`-th "frame" (payload
    * slice) becomes a row — the explode-shaped op of video pipelines. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.media_id, idx, frame) }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Decoded-media stats per kind — the end-to-end plumbing check. */
  def mediaStats(spark: SparkSession, sfDir: String): DataFrame = {
    val media = syntheticMedia(spark, sfDir)
    val img = decodeImages(media)
    img.toDF().select(col("media_id"), col("width"), col("height"),
      round(element_at(col("mean"), 1), 4).as("mean_intensity"))
  }
}
