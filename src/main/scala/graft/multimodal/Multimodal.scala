package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride through the engine as opaque `binary` payload columns plus a
  * typed metadata struct — the shape of a lakehouse media table. The
  * payloads are REAL encoded media and the decode kernels are REAL
  * JDK-native decoders (round 14; the stub era's "no image/audio
  * libraries" claim was wrong — `java.desktop` ships with this JDK):
  *
  *  - images are PNG, encoded/decoded via `javax.imageio.ImageIO`
  *    (headless-safe: `BufferedImage` + raster I/O, no display);
  *  - audio is 8-bit unsigned PCM mono WAV via
  *    `javax.sound.sampled.AudioSystem`;
  *  - video (no JDK codec exists) is an MJPEG-style container of
  *    length-prefixed PNG frames — frame SEEKING reads only the length
  *    prefixes, so stride sampling decodes just the sampled frames.
  *
  * The synthetic corpus derives payload content deterministically from the
  * `documents` table (pixel i / sample i = byte i of the ASCII text), so
  * every decoded value is SQL-reproducible and the gates stay
  * value-oracle-checked end to end over real codec output. [[StubCodec]]
  * remains as a test seam (a decoder whose output is the identity on the
  * payload bytes) so specs can cross-check the real decode against the
  * formula directly.
  *
  * Decode runs in `mapPartitions` so a batch of payloads amortizes codec
  * init per partition (the Scala analogue of a Pandas-UDF `mapInPandas`
  * batch); at 100 TB the payloads never pass through a shuffle unless
  * asked, and per-row decode state is bounded by one frame/clip.
  */
object Multimodal {

  /** Synthetic-corpus geometry: image scanline width (pixels), video
    * frame payload size (pixels per frame), audio sample rate (Hz). */
  val ImageWidth = 16
  val VideoFrameBytes = 32
  val SampleRate = 16000

  /** Typed media row: payload + metadata (what a real lakehouse media
    * table looks like: bytes + sidecar fields). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  /** Decoded image: dims + per-channel summary features. */
  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          channels: Int, mean: Array[Double], embedding: Array[Float])

  /** REAL JDK-native codec: PNG via ImageIO, WAV via AudioSystem, and a
    * length-prefixed PNG-frame container for video. Headless-safe (raster
    * I/O only). Every decode validates its input and THROWS on a payload
    * it cannot decode exactly — a corrupt media byte must fail the task,
    * not ride through as silently-wrong features. */
  object JdkCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
      DataInputStream, DataOutputStream}
    import javax.imageio.ImageIO
    import javax.imageio.stream.{MemoryCacheImageInputStream,
      MemoryCacheImageOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}

    // ImageIO defaults to a DISK-backed stream cache per read/write —
    // ~4x the cost of the codec itself on small in-memory media
    // (measured: 1667 encode+decodes 616 ms cached vs 158 ms direct).
    // The in-memory fast path is scoped per call with explicit
    // MemoryCacheImage{In,Out}putStreams rather than the JVM-global
    // ImageIO.setUseCache(false), which would silently change disk-cache
    // behavior for every unrelated ImageIO user in the same executor.

    private def writeImage(img: BufferedImage, format: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val ios = new MemoryCacheImageOutputStream(bos)
      try require(ImageIO.write(img, format, ios),
        s"writeImage: no $format writer")
      finally ios.close() // flushes the memory cache into bos
      bos.toByteArray
    }

    private def readImage(payload: Array[Byte]): BufferedImage = {
      // ImageIO.read(ImageInputStream) closes the stream itself
      val img = ImageIO.read(
        new MemoryCacheImageInputStream(new ByteArrayInputStream(payload)))
      require(img != null, "readImage: undecodable image payload")
      img
    }

    /** Encode row-major 8-bit gray pixels as a PNG. */
    def encodePng(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0 && pixels.length == width * height,
        s"encodePng: ${pixels.length} bytes != ${width}x$height")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, width, height, pixels)
      writeImage(img, "png")
    }

    /** Decode a PNG to (width, height, row-major pixel grid of 0..255
      * gray samples). Multi-channel inputs read band 0. */
    def decodePng(payload: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
      val img = readImage(payload)
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val px = Array.ofDim[Int](h, w)
      var y = 0
      while (y < h) {
        raster.getSamples(0, y, w, 1, 0, px(y))
        y += 1
      }
      (w, h, px)
    }

    /** Encode interleaved RGB triples (pixel p = bytes 3p..3p+2 as
      * R,G,B) as a 3-channel PNG — lossless, so per-channel decode is
      * value-exact like the gray path. Channels address raster BANDS
      * (band 0 = red) so the BGR byte layout of the backing buffer never
      * leaks into the contract. */
    def encodeRgbPng(rgb: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0 && rgb.length == width * height * 3,
        s"encodeRgbPng: ${rgb.length} bytes != ${width}x${height}x3")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
      val raster = img.getRaster
      val row = new Array[Int](width)
      var c = 0
      while (c < 3) {
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            row(x) = java.lang.Byte.toUnsignedInt(rgb((y * width + x) * 3 + c))
            x += 1
          }
          raster.setSamples(0, y, width, 1, c, row)
          y += 1
        }
        c += 1
      }
      writeImage(img, "png")
    }

    /** Decode ANY ImageIO-readable payload to (width, height,
      * per-band pixel grids px(band)(y)(x)) — the all-channel sibling of
      * [[decodePng]]'s band-0 read. */
    def decodeImageBands(payload: Array[Byte]): (Int, Int, Array[Array[Array[Int]]]) = {
      val img = readImage(payload)
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val bands = raster.getNumBands
      val px = Array.ofDim[Int](bands, h, w)
      var c = 0
      while (c < bands) {
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, c, px(c)(y))
          y += 1
        }
        c += 1
      }
      (w, h, px)
    }

    /** Encode row-major 8-bit gray pixels as a JPEG (default quality).
      * LOSSY — decoded samples are approximations, so JPEG gates pin
      * dimensions and bounded invariants, never exact values. */
    def encodeJpegGray(pixels: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0 && pixels.length == width * height,
        s"encodeJpegGray: ${pixels.length} bytes != ${width}x$height")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, width, height, pixels)
      writeImage(img, "jpg")
    }

    /** Encode 8-bit unsigned PCM mono samples as a WAV file. */
    def encodeWav(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
      require(samples.nonEmpty, "encodeWav: empty sample array")
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(samples), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV to (sampleRate, unsigned 0..255 samples). Only the
      * corpus format (8-bit unsigned PCM mono) is accepted — anything
      * else fails loudly rather than resampling silently. */
    def decodeWav(payload: Array[Byte]): (Int, Array[Int]) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED &&
          fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"decodeWav: unsupported format $fmt (want 8-bit unsigned PCM mono)")
        val bytes = ais.readAllBytes()
        (fmt.getSampleRate.toInt, bytes.map(java.lang.Byte.toUnsignedInt))
      } finally ais.close()
    }

    /** Encode signed 16-bit PCM STEREO samples as a WAV file
      * (little-endian, interleaved L,R) — the sample shape real
      * lakehouse audio actually has, vs the corpus' 8-bit mono. */
    def encodeWav16Stereo(left: Array[Int], right: Array[Int],
                          sampleRate: Int): Array[Byte] = {
      require(left.nonEmpty && left.length == right.length,
        s"encodeWav16Stereo: ${left.length} L vs ${right.length} R samples")
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 2, 4, sampleRate.toFloat, false)
      val data = new Array[Byte](left.length * 4)
      var i = 0
      while (i < left.length) {
        val l = left(i); val r = right(i)
        require(l >= Short.MinValue && l <= Short.MaxValue &&
          r >= Short.MinValue && r <= Short.MaxValue,
          s"encodeWav16Stereo: sample $i ($l, $r) out of 16-bit range")
        data(4 * i) = (l & 0xff).toByte
        data(4 * i + 1) = ((l >> 8) & 0xff).toByte
        data(4 * i + 2) = (r & 0xff).toByte
        data(4 * i + 3) = ((r >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(data), fmt, left.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a 16-bit signed PCM stereo WAV to (sampleRate, left
      * samples, right samples) — exact; anything but the 16-bit stereo
      * little-endian format fails loudly. */
    def decodeWav16Stereo(payload: Array[Byte]): (Int, Array[Int], Array[Int]) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getChannels == 2 &&
          !fmt.isBigEndian,
          s"decodeWav16Stereo: unsupported format $fmt " +
            "(want 16-bit signed PCM stereo little-endian)")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 4
        val l = new Array[Int](n)
        val r = new Array[Int](n)
        var i = 0
        while (i < n) {
          l(i) = (bytes(4 * i) & 0xff) | (bytes(4 * i + 1).toInt << 8)
          r(i) = (bytes(4 * i + 2) & 0xff) | (bytes(4 * i + 3).toInt << 8)
          i += 1
        }
        (fmt.getSampleRate.toInt, l, r)
      } finally ais.close()
    }

    /** Pack frames (each a row of gray pixels) into the video container:
      * repeated [int32 length][PNG of the frame as a len×1 image]. */
    def encodeFrameContainer(frames: Iterator[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val dos = new DataOutputStream(bos)
      frames.foreach { f =>
        val png = encodePng(f, f.length, 1)
        dos.writeInt(png.length)
        dos.write(png)
      }
      dos.flush()
      bos.toByteArray
    }

    /** Lazily walk a frame container WITHOUT decoding: yields (frameIdx,
      * png bytes). Seeking past an unsampled frame costs one length read. */
    def frameIndex(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
      new Iterator[(Int, Array[Byte])] {
        private val in = new DataInputStream(new ByteArrayInputStream(payload))
        private var avail = payload.length
        private var idx = -1
        def hasNext: Boolean = avail > 0
        def next(): (Int, Array[Byte]) = {
          val len = in.readInt()
          require(len > 0 && len <= avail - 4,
            s"frameIndex: corrupt frame length $len with $avail bytes left")
          val png = new Array[Byte](len)
          in.readFully(png)
          avail -= 4 + len
          idx += 1
          (idx, png)
        }
      }
  }

  /** Shared media feature kernels — pure pixel math, codec-independent. */
  object MediaFeatures {
    /** 8-bin intensity histogram, L1-normalized. */
    def histogram8(pixels: Array[Array[Int]]): Array[Float] = {
      val h = new Array[Float](8)
      var n = 0
      pixels.foreach(_.foreach { p => h(p / 32) += 1f; n += 1 })
      if (n > 0) (0 until 8).foreach(i => h(i) /= n)
      h
    }

    /** Resize by integer-factor pixel averaging (nearest sample). */
    def resize(pixels: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] = {
      val inH = pixels.length; val inW = pixels.headOption.map(_.length).getOrElse(0)
      Array.tabulate(outH, outW) { (y, x) =>
        pixels(math.min(y * inH / math.max(outH, 1), inH - 1))(
          math.min(x * inW / math.max(outW, 1), inW - 1))
      }
    }
  }

  /** TEST SEAM — the identity "codec" (bytes-as-pixels, no container).
    * Specs use it to cross-check the real decode: for the synthetic
    * corpus, `JdkCodec.decodePng(encodePng(bytes, w, h))` must equal
    * `StubCodec.decodeImage(bytes, w, h)` sample-for-sample. */
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

    /** Retained aliases (pre-round-14 call sites and specs). */
    def embed(pixels: Array[Array[Int]]): Array[Float] =
      MediaFeatures.histogram8(pixels)
    def resize(pixels: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] =
      MediaFeatures.resize(pixels, outW, outH)
  }

  /** Deterministic synthetic media table derived from `documents`: the
    * doc's ASCII bytes become the pixel/sample values, REALLY ENCODED —
    * images as PNG (16-wide gray scanlines, `n_chars / 16` tall; a text
    * shorter than one scanline is an undecodable source and carries an
    * empty payload), audio as 8-bit PCM WAV at 16 kHz, video as the
    * PNG-frame container with [[VideoFrameBytes]]-pixel frames. Encoding
    * runs in `mapPartitions` (codec init amortized per partition), so
    * every SF has a real-bytes media corpus without binary fixtures and
    * every decoded value is still `ord(substr(text, i, 1))`-reproducible
    * in SQL. */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 3).cast("int").as("k"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { rows =>
        // real codecs init per partition, amortized over the batch
        rows.map { case (id, k, b) =>
          val height = b.length / ImageWidth
          k match {
            case 0 =>
              val payload =
                if (height >= 1) JdkCodec.encodePng(
                  b.take(ImageWidth * height), ImageWidth, height)
                else Array.empty[Byte]
              MediaRow(id, "image", payload, ImageWidth, height, SampleRate)
            case 1 =>
              val payload =
                if (b.nonEmpty) JdkCodec.encodeWav(b, SampleRate)
                else Array.empty[Byte]
              MediaRow(id, "audio", payload, ImageWidth, height, SampleRate)
            case _ =>
              val payload =
                if (b.nonEmpty) JdkCodec.encodeFrameContainer(
                  b.grouped(VideoFrameBytes))
                else Array.empty[Byte]
              MediaRow(id, "video", payload, ImageWidth, height, SampleRate)
          }
        }
      }
  }

  /** Deterministic 3-channel corpus from the SAME documents: pixel p's
    * (R,G,B) are the doc's byte triples (3p, 3p+1, 3p+2), encoded as a
    * real RGB PNG — [[ImageWidth]] wide, `n_chars / 48` tall. Every doc
    * long enough for one RGB scanline participates (no doc_id % 3 split:
    * this corpus exists to exercise multi-band decode, which the
    * all-gray main corpus cannot). Sub-scanline docs are dropped, the
    * same row-dropping rule the SQL oracle applies. */
  def syntheticRgbMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, b) =>
          val height = b.length / (ImageWidth * 3)
          if (height >= 1)
            Some(MediaRow(id, "rgb",
              JdkCodec.encodeRgbPng(b.take(ImageWidth * height * 3),
                ImageWidth, height),
              ImageWidth, height, SampleRate))
          else None
        }
      }
  }

  /** Decoded RGB image: dims + per-channel means. */
  case class DecodedRgb(media_id: Long, width: Int, height: Int,
                        channels: Int, mean_r: Double, mean_g: Double,
                        mean_b: Double)

  /** Batch all-band decode via mapPartitions: every channel is read
    * (lifting the gray path's band-0 contract), dims and band count are
    * cross-checked against the corpus contract, and the per-channel
    * means stay SQL-exact because PNG is lossless. */
  def decodeRgbImages(media: Dataset[MediaRow]): Dataset[DecodedRgb] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "rgb" && r.payload.nonEmpty).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JdkCodec.decodeImageBands(r.payload)
        require(w == r.width && h == r.height,
          s"media_id=${r.media_id}: decoded ${w}x$h != sidecar ${r.width}x${r.height}")
        require(px.length == 3,
          s"media_id=${r.media_id}: ${px.length} bands != 3")
        val n = (w * h).toDouble
        def mean(c: Int): Double = px(c).map(_.sum.toDouble).sum / n
        DecodedRgb(r.media_id, w, h, 3, mean(0), mean(1), mean(2))
      }
    }
  }

  /** Max |decoded JPEG mean − exact source mean| accepted by
    * [[jpegProbe]]. JPEG's per-pixel error on high-frequency text bytes
    * can reach the quantization step, but the IMAGE mean is dominated by
    * the DC coefficients and lands well under 1 intensity level in
    * practice; 3.0 leaves margin without accepting a broken codec. */
  val JpegMeanTolerance = 3.0

  /** JPEG probe row: decoded dims (JPEG preserves them exactly) + the
    * bounded-mean invariant — the honest oracle surface for a LOSSY
    * codec (exact per-pixel values are not a contract JPEG can sign). */
  case class JpegProbe(media_id: Long, width: Int, height: Int,
                       mean_ok: Boolean)

  /** JPEG corpus row: the encoded payload plus the EXACT source mean as
    * a sidecar (the lossless ground truth the lossy decode is probed
    * against). */
  case class JpegRow(media_id: Long, payload: Array[Byte], width: Int,
                     height: Int, src_mean: Double)

  /** Encode the gray image corpus' docs as real JPEGs (same selection as
    * the PNG corpus: doc_id % 3 = 0, ≥ one scanline — so the oracle
    * shares [[mediaStats]]'s dims shape), carrying the exact source mean
    * alongside. */
  def syntheticJpegMedia(spark: SparkSession, sfDir: String): Dataset[JpegRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, b) =>
          val height = b.length / ImageWidth
          if (height < 1) None
          else {
            val src = b.take(ImageWidth * height)
            var srcSum = 0L
            src.foreach(v => srcSum += java.lang.Byte.toUnsignedInt(v))
            Some(JpegRow(id, JdkCodec.encodeJpegGray(src, ImageWidth, height),
              ImageWidth, height, srcSum.toDouble / src.length))
          }
        }
      }
  }

  /** Decode the JPEG corpus and pin what a lossy codec CAN promise:
    * exact dimensions and the bounded-mean invariant. */
  def jpegProbe(media: Dataset[JpegRow]): Dataset[JpegProbe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JdkCodec.decodePng(r.payload)
        var decSum = 0L
        px.foreach(_.foreach(decSum += _))
        val decMean = decSum.toDouble / (w * h)
        JpegProbe(r.media_id, w, h,
          math.abs(decMean - r.src_mean) <= JpegMeanTolerance)
      }
    }
  }

  /** Deterministic 16-bit stereo corpus from the audio docs: sample i's
    * (L, R) are the doc's byte QUADS — L from big-endian pair (4i, 4i+1)
    * recentered to signed 16-bit, R from (4i+2, 4i+3) — so decoded
    * values stay `ord(substr(...))`-reproducible in SQL while the wire
    * format is genuine 16-bit signed PCM stereo. Docs shorter than one
    * quad are dropped (the oracle's row rule). */
  def syntheticStereoMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 3 === 1)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, b) =>
          val n = b.length / 4
          if (n < 1) None
          else {
            def s16(hi: Byte, lo: Byte): Int =
              ((java.lang.Byte.toUnsignedInt(hi) << 8) |
                java.lang.Byte.toUnsignedInt(lo)) - 32768
            val l = Array.tabulate(n)(i => s16(b(4 * i), b(4 * i + 1)))
            val r = Array.tabulate(n)(i => s16(b(4 * i + 2), b(4 * i + 3)))
            Some(MediaRow(id, "stereo",
              JdkCodec.encodeWav16Stereo(l, r, SampleRate),
              0, 0, SampleRate))
          }
        }
      }
  }

  /** Decoded stereo clip: per-channel exact means. */
  case class DecodedStereo(media_id: Long, n_samples: Long, mean_l: Double,
                           mean_r: Double)

  /** Batch 16-bit stereo decode via mapPartitions — the multi-channel
    * audio sibling of [[decodeRgbImages]]: both channels read exactly
    * (PCM is lossless), rate cross-checked against the sidecar. */
  def decodeStereo(media: Dataset[MediaRow]): Dataset[DecodedStereo] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "stereo" && r.payload.nonEmpty)
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, l, rr) = JdkCodec.decodeWav16Stereo(r.payload)
          require(rate == r.sample_rate,
            s"media_id=${r.media_id}: decoded rate $rate != sidecar ${r.sample_rate}")
          var sl = 0L; var sr = 0L
          var i = 0
          while (i < l.length) { sl += l(i); sr += rr(i); i += 1 }
          DecodedStereo(r.media_id, l.length.toLong,
            sl.toDouble / l.length, sr.toDouble / l.length)
        }
      }
  }

  /** Batch PNG decode + feature-extract via mapPartitions: one codec init
    * per partition, vectorized over the partition's rows. Decoded
    * dimensions are cross-checked against the sidecar metadata — a
    * payload/sidecar mismatch fails the task rather than mislabeling
    * features. Empty payloads (sub-scanline sources, undecodable by
    * construction) are skipped — the row-dropping codec policy the SQL
    * oracle shares. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "image" && r.payload.nonEmpty).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JdkCodec.decodePng(r.payload)
        require(w == r.width && h == r.height,
          s"media_id=${r.media_id}: decoded ${w}x$h != sidecar ${r.width}x${r.height}")
        val mean = Array(px.map(_.sum.toDouble).sum / (w * h))
        DecodedImage(r.media_id, w, h, 1, mean, MediaFeatures.histogram8(px))
      }
    }
  }

  /** Decoded audio: per-payload waveform summary. */
  case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Long,
                          mean_amplitude: Double)

  /** Batch WAV decode via mapPartitions (same codec-init-amortizing shape
    * as [[decodeImages]]): AudioSystem parses the container and the
    * unsigned 8-bit PCM samples summarize to count + mean amplitude. The
    * decoded sample rate is cross-checked against the sidecar. Empty
    * payloads (empty sources) are skipped. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "audio" && r.payload.nonEmpty)
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, samples) = JdkCodec.decodeWav(r.payload)
          require(rate == r.sample_rate,
            s"media_id=${r.media_id}: decoded rate $rate != sidecar ${r.sample_rate}")
          var s = 0L
          var i = 0
          while (i < samples.length) { s += samples(i); i += 1 }
          DecodedAudio(r.media_id, rate, samples.length.toLong,
            s.toDouble / samples.length)
        }
      }
  }

  /** Resized image: output dims + resized-pixel summary. */
  case class ResizedImage(media_id: Long, out_w: Int, out_h: Int,
                          mean_resized: Double)

  /** Decode + resize via mapPartitions — the thumbnail/normalize step of
    * an image pipeline: real PNG decode, then the deterministic
    * nearest-sample downscale ([[MediaFeatures.resize]], SQL-exact
    * integer indexing). Output is the resized-pixel mean, the
    * value-oracle surface for the whole decode→resize chain. */
  def resizeImages(media: Dataset[MediaRow], outW: Int, outH: Int)
  : Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "image" && r.payload.nonEmpty).mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = JdkCodec.decodePng(r.payload)
        require(w == r.width && h == r.height,
          s"media_id=${r.media_id}: decoded ${w}x$h != sidecar ${r.width}x${r.height}")
        val rs = MediaFeatures.resize(px, outW, outH)
        var s = 0L
        rs.foreach(_.foreach(s += _))
        ResizedImage(r.media_id, outW, outH, s.toDouble / (outW * outH))
      }
    }
  }

  /** Audio feature row: exact-integer energy plus the mean-crossing
    * count (the ZCR analogue for unsigned samples — ASCII-derived
    * corpora never cross the PCM midpoint 128, so crossings are counted
    * against the clip's own mean). */
  case class AudioFeatures(media_id: Long, n_samples: Long, rms: Double,
                           mean_crossings: Long)

  /** Decode + feature-extract for audio beyond the mean: RMS energy
    * (sum of squares is exact integer arithmetic, so the rounded double
    * is bit-reproducible cross-engine) and the mean-crossing count
    * (adjacent sample pairs straddling the clip mean — integer-vs-double
    * compares, exact). Same mapPartitions decode seam as
    * [[decodeAudio]]. */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "audio" && r.payload.nonEmpty)
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, samples) = JdkCodec.decodeWav(r.payload)
          require(rate == r.sample_rate,
            s"media_id=${r.media_id}: decoded rate $rate != sidecar ${r.sample_rate}")
          val n = samples.length
          var sum = 0L
          var sumSq = 0L
          var i = 0
          while (i < n) {
            sum += samples(i); sumSq += samples(i).toLong * samples(i)
            i += 1
          }
          val mean = sum.toDouble / n
          var crossings = 0L
          i = 1
          while (i < n) {
            if ((samples(i - 1) < mean) != (samples(i) < mean)) crossings += 1
            i += 1
          }
          AudioFeatures(r.media_id, n.toLong,
            math.sqrt(sumSq.toDouble / n), crossings)
        }
      }
  }

  /** Frame sampling for video rows: every `stride`-th frame of the
    * container is DECODED (PNG → pixel bytes) and becomes a row — the
    * explode-shaped op of video pipelines. Unsampled frames are skipped
    * by length-prefix seek without decoding, so the per-row decode bill
    * is `n_frames / stride`, not `n_frames`. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "video" && r.payload.nonEmpty).flatMap { r =>
      JdkCodec.frameIndex(r.payload)
        .filter(_._1 % stride == 0)
        .map { case (idx, png) =>
          val (w, h, px) = JdkCodec.decodePng(png)
          require(h == 1, s"media_id=${r.media_id} frame $idx: height $h != 1")
          (r.media_id, idx, px(0).take(w).map(_.toByte))
        }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Decoded-media stats per kind — the end-to-end plumbing check. */
  def mediaStats(media: Dataset[MediaRow]): DataFrame = {
    val img = decodeImages(media)
    img.toDF().select(col("media_id"), col("width"), col("height"),
      round(element_at(col("mean"), 1), 4).as("mean_intensity"))
  }

  def mediaStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaStats(syntheticMedia(spark, sfDir))
}
