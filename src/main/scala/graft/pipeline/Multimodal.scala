package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed by per-partition batch operators.
  *
  * The Spark-side plumbing — schema, partition batching, operator
  * signatures, deterministic output shape — is real and tested. The codec
  * seam ([[MediaDecoder]]) ships real decoders for every image format the
  * JDK carries plus PCM audio: [[BmpDecoder]] and [[WavDecoder]] (pure-JVM
  * parsers written against the format specs), [[ImageIoDecoder]]
  * (JPEG/PNG/GIF/TIFF via the JDK's built-in `javax.imageio` readers —
  * headless-safe, no native deps), and [[SniffDecoder]] (magic-byte
  * router over the above for mixed-format corpora). [[FakeDecoder]] is a
  * deterministic hash-derived stand-in ONLY for formats with no JVM codec
  * in this container (MP4 / compressed audio — a one-class JavaCV swap;
  * see the [[MediaDecoder]] contract below for what such a swap must
  * satisfy).
  *
  * Scale notes: payloads never pass through a shuffle — all media ops are
  * narrow `mapPartitions` over the batch iterator; only extracted features
  * (small, fixed-width) flow into joins/aggregations. `binaryFile`-style
  * sources should cap `maxPartitionBytes` so a partition of payloads fits
  * executor memory.
  */
object Multimodal {

  /** media row schema: payload + the metadata a lakehouse would carry. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Decoded intermediate: planar frame/sample data + dims. */
  final case class Decoded(
      mediaId: Long, kind: String, width: Int, height: Int,
      nFrames: Int, samples: Array[Float])

  /** The codec seam — the contract any decoder (including a future
    * JavaCV-backed MP4/compressed-audio swap) must satisfy; the
    * `DecoderConformanceSpec` test harness asserts it mechanically:
    *
    *  1. DETERMINISM: `decode` is a pure function of `(payload)` — two
    *     calls on any executor, any run, return bit-identical `Decoded`
    *     (the oracle gates and exact dedup both rely on replayability;
    *     a codec with threaded/nondeterministic output must be pinned).
    *  2. RANGE: every sample is a finite Float in [0, 1].
    *  3. SHAPE: `width > 0`, `height > 0`, `nFrames >= 1`. For images,
    *     `samples.length == width*height*nFrames` (row-major, top-down,
    *     frame-major). For audio, `width` = source channel count,
    *     `height == 1`, and `samples.length == nFrames` (mono-mixed
    *     per-frame values — channels average into one sample).
    *  4. STRICTNESS: a payload that is not the decoder's format throws
    *     (never a silent garbage decode) — [[SniffDecoder]] routes
    *     per-format so strict decoders compose over mixed corpora.
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): Decoded
  }

  /** Deterministic stand-in: "pixels" are a hash-seeded byte expansion of
    * the payload — stable across executors/runs, shaped like real decode
    * output (width*height samples, frame count from payload length). */
  object FakeDecoder extends MediaDecoder {
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): Decoded = {
      val p = if (payload == null) Array.emptyByteArray else payload
      val w = math.max(1, math.min(64, p.length))
      val h = math.max(1, w / 2)
      val frames = if (kind == "video") math.max(1, p.length / 256) else 1
      var seed = 1125899906842597L
      var i = 0
      while (i < p.length) { seed = seed * 31 + p(i); i += 1 }
      val samples = new Array[Float](w * h)
      var j = 0
      var s = seed
      while (j < samples.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        samples(j) = ((s >>> 40).toInt & 0xff) / 255.0f
        j += 1
      }
      Decoded(mediaId, kind, w, h, frames, samples)
    }
  }

  /** A REAL decoder behind the same seam — pure-JVM parser for
    * uncompressed 24/32-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * BI_RGB), zero native dependencies: proof the [[MediaDecoder]] seam
    * carries an actual codec, not only the stub. Samples are BT.601 luma
    * in [0, 1], row-major TOP-DOWN (BMP stores rows bottom-up when the
    * header height is positive; a negative height means top-down, per the
    * format). Strict: non-BMP payloads and compressed variants throw —
    * a mixed-modality corpus routes per-mime to the right decoder rather
    * than silently mis-decoding. */
  object BmpDecoder extends MediaDecoder {
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): Decoded = {
      require(payload != null && payload.length >= 54,
        s"media $mediaId: not a BMP (too short)")
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(payload(0) == 'B' && payload(1) == 'M',
        s"media $mediaId: missing BM magic")
      val pixelOffset = buf.getInt(10)
      // an unvalidated offset would bypass the truncation check below
      // (negative: crash; into the header: silent mis-decode)
      require(pixelOffset >= 54 && pixelOffset <= payload.length,
        s"media $mediaId: bad pixel offset $pixelOffset")
      val headerSize = buf.getInt(14)
      require(headerSize >= 40, s"media $mediaId: BITMAPCOREHEADER unsupported")
      val width = buf.getInt(18)
      val rawHeight = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      val compression = buf.getInt(30)
      require(width > 0 && rawHeight != 0, s"media $mediaId: bad dims")
      require(bpp == 24 || bpp == 32, s"media $mediaId: $bpp bpp unsupported")
      require(compression == 0, s"media $mediaId: compressed BMP unsupported")
      val height = math.abs(rawHeight)
      val bottomUp = rawHeight > 0
      val bytesPp = bpp / 8
      val stride = ((bpp * width + 31) / 32) * 4 // rows pad to 4 bytes
      require(payload.length >= pixelOffset + stride.toLong * height,
        s"media $mediaId: truncated pixel array")
      val samples = new Array[Float](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        var x = 0
        while (x < width) {
          val o = pixelOffset + srcRow * stride + x * bytesPp
          val bB = payload(o) & 0xff // BMP pixel order is B, G, R [, A]
          val g = payload(o + 1) & 0xff
          val r = payload(o + 2) & 0xff
          samples(y * width + x) =
            ((0.299f * r + 0.587f * g + 0.114f * bB) / 255.0f)
          x += 1
        }
        y += 1
      }
      Decoded(mediaId, kind, width, height, nFrames = 1, samples)
    }
  }

  /** Real pure-JVM decoder for PCM WAV audio (RIFF/WAVE, 8- or 16-bit
    * integer PCM) — the audio-modality counterpart of [[BmpDecoder]].
    * Samples are mono-mixed (channel average) and mapped to [0, 1]
    * (`(s + 1) / 2` of the [-1, 1] PCM range), so downstream pooling in
    * [[extractFeatures]] treats audio exactly like image luma. `width` =
    * channel count, `height` = 1, `nFrames` = per-channel sample count.
    * Strict on non-WAV / compressed payloads, like [[BmpDecoder]]. */
  object WavDecoder extends MediaDecoder {
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): Decoded = {
      require(payload != null && payload.length >= 44,
        s"media $mediaId: not a WAV (too short)")
      val buf = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String =
        new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      require(tag(0) == "RIFF" && tag(8) == "WAVE",
        s"media $mediaId: missing RIFF/WAVE magic")
      // walk chunks: fmt must precede data (the canonical layout). Long
      // offsets: an adversarial chunk size near Int.MaxValue must step
      // the cursor PAST the payload (loop exit), never wrap negative.
      var off = 12L
      var nChannels = 0; var bits = 0; var fmtSeen = false
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= payload.length && dataOff < 0) {
        val o = off.toInt
        val id = tag(o)
        val size = buf.getInt(o + 4)
        require(size >= 0, s"media $mediaId: bad chunk size")
        id match {
          case "fmt " =>
            require(size >= 16 && o + 24 <= payload.length,
              s"media $mediaId: truncated fmt chunk")
            val audioFormat = buf.getShort(o + 8).toInt
            require(audioFormat == 1,
              s"media $mediaId: non-PCM WAV (format $audioFormat) unsupported")
            nChannels = buf.getShort(o + 10).toInt
            bits = buf.getShort(o + 22).toInt
            require(nChannels > 0, s"media $mediaId: zero channels")
            require(bits == 8 || bits == 16,
              s"media $mediaId: $bits-bit PCM unsupported")
            fmtSeen = true
          case "data" =>
            require(fmtSeen, s"media $mediaId: data chunk before fmt")
            dataOff = o + 8
            dataLen = math.min(size, payload.length - dataOff)
          case _ => // skip LIST/INFO/etc
        }
        off += 8L + size.toLong + (size & 1) // chunks pad to even length
      }
      require(dataOff >= 0, s"media $mediaId: no data chunk")
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * nChannels
      val nFrames = dataLen / frameBytes
      val samples = new Array[Float](nFrames)
      var f = 0
      while (f < nFrames) {
        var acc = 0.0f
        var c = 0
        while (c < nChannels) {
          val o = dataOff + f * frameBytes + c * bytesPerSample
          // 8-bit WAV is UNSIGNED (0..255, midpoint 128); 16-bit is signed
          val v = if (bits == 8) ((payload(o) & 0xff) - 128) / 128.0f
                  else buf.getShort(o) / 32768.0f
          acc += v
          c += 1
        }
        samples(f) = (acc / nChannels + 1.0f) / 2.0f
        f += 1
      }
      Decoded(mediaId, kind, width = nChannels, height = 1, nFrames, samples)
    }
  }

  /** Real decoder for the JDK's built-in raster formats — JPEG, PNG, GIF,
    * TIFF, (and BMP) — via `javax.imageio.ImageIO`, which is headless-safe
    * and ships in every JDK 17: no native dependency. Luma extraction:
    * single-band 8-bit images (gray PNG etc.) read the raster sample
    * directly (`v / 255` — exact, no colorspace round-trip); everything
    * else goes through sRGB `getRGB` + the same BT.601 weights as
    * [[BmpDecoder]], so a pixel-identical BMP and PNG produce identical
    * samples. Strict: payloads no installed reader recognizes throw. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): Decoded = {
      require(payload != null && payload.length > 0,
        s"media $mediaId: empty payload")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        s"media $mediaId: no ImageIO reader recognizes this payload")
      val w = img.getWidth
      val h = img.getHeight
      require(w > 0 && h > 0, s"media $mediaId: bad dims ${w}x$h")
      val samples = new Array[Float](w * h)
      val raster = img.getRaster
      val gray8 = raster.getNumBands == 1 &&
        img.getColorModel.getComponentSize(0) == 8
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          samples(y * w + x) =
            if (gray8) raster.getSample(x, y, 0) / 255.0f
            else {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
            }
          x += 1
        }
        y += 1
      }
      Decoded(mediaId, kind, w, h, nFrames = 1, samples)
    }
  }

  /** Magic-byte router: each payload dispatches to the decoder for the
    * format it actually is — [[BmpDecoder]] for `BM`, [[WavDecoder]] for
    * `RIFF…WAVE`, [[ImageIoDecoder]] for JPEG/PNG/GIF/TIFF signatures —
    * so one [[extractFeatures]] pass handles a mixed-modality corpus
    * without a per-format shuffle or split. Payloads matching nothing go
    * to `fallback` (e.g. [[FakeDecoder]] for MP4 until a JavaCV decoder
    * lands); no fallback → strict throw. Routing reads magic bytes, not
    * the `mime` column: object stores lie about content types, payloads
    * don't. */
  final case class SniffDecoder(fallback: Option[MediaDecoder] = None)
      extends MediaDecoder {
    private def at(p: Array[Byte], i: Int): Int =
      if (i < p.length) p(i) & 0xff else -1
    def decode(mediaId: Long, kind: String, payload: Array[Byte]): Decoded = {
      val p = if (payload == null) Array.emptyByteArray else payload
      val d: MediaDecoder =
        if (at(p, 0) == 'B' && at(p, 1) == 'M') BmpDecoder
        else if (at(p, 0) == 'R' && at(p, 1) == 'I' && at(p, 2) == 'F' &&
          at(p, 3) == 'F' && at(p, 8) == 'W' && at(p, 9) == 'A' &&
          at(p, 10) == 'V' && at(p, 11) == 'E') WavDecoder
        else if ((at(p, 0) == 0xff && at(p, 1) == 0xd8) || // JPEG SOI
          (at(p, 0) == 0x89 && at(p, 1) == 'P' && at(p, 2) == 'N' &&
            at(p, 3) == 'G') || // PNG
          (at(p, 0) == 'G' && at(p, 1) == 'I' && at(p, 2) == 'F') || // GIF
          (at(p, 0) == 'I' && at(p, 1) == 'I' && at(p, 2) == 42) || // TIFF LE
          (at(p, 0) == 'M' && at(p, 1) == 'M' && at(p, 3) == 42)) // TIFF BE
          ImageIoDecoder
        else fallback.getOrElse(throw new IllegalArgumentException(
          s"media $mediaId: unrecognized format and no fallback decoder"))
      d.decode(mediaId, kind, payload)
    }
  }

  /** Encoder twins of the real decoders — the write path of the media
    * seam. Grayscale-only on purpose: features pool luma, so gray
    * round-trips decode → encode → decode losslessly (BMP/PNG) or
    * near-losslessly (16-bit PCM), which is what the conformance spec and
    * the `multimodal_mixed` oracle gate exercise. All three are
    * deterministic per input (required: gate oracles replay payload
    * sizes). */
  def encodeBmpGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodeBmpGray: need $width x $height = ${width * height} pixels")
    val stride = ((24 * width + 31) / 32) * 4
    val size = 54 + stride * height
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height) // bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(stride * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = gray(y * width + x)
        buf.put(v).put(v).put(v) // B = G = R = gray
        x += 1
      }
      buf.position(buf.position() + (stride - 3 * width))
      y -= 1
    }
    buf.array()
  }

  /** Mono 16-bit PCM at 8 kHz — `44 + 2 * samples.length` bytes. */
  def encodeWavPcm16(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** 8-bit grayscale PNG via the JDK writer (compressed size is
    * writer-dependent — callers must not predict `length`, only
    * decodability and pixels). */
  def encodePngGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"encodePngGray: need $width x $height = ${width * height} pixels")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, gray(y * width + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out),
      "no PNG writer installed") // JDK always ships one; belt-and-braces
    out.toByteArray
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Decode + feature-extract, batched per partition (the `mapInPandas`
    * batch shape, Scala-side): one decoder instance per partition, rows
    * streamed through it, features = `featDim` pooled buckets. */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder,
      featDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val md5Of = java.security.MessageDigest.getInstance("MD5")
    val _ = md5Of // instantiated per partition below; driver copy unused
    val rows = media.select("media_id", "kind", "payload").rdd.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val d = decoder.decode(id, kind, payload)
        // mean-pool samples into featDim buckets
        val feat = new Array[Float](featDim)
        val cnt = new Array[Int](featDim)
        var i = 0
        while (i < d.samples.length) {
          val b = i * featDim / math.max(1, d.samples.length)
          feat(b) += d.samples(i); cnt(b) += 1; i += 1
        }
        var j = 0
        while (j < featDim) { if (cnt(j) > 0) feat(j) /= cnt(j); j += 1 }
        val sum = if (payload == null) null
          else {
            digest.reset()
            digest.digest(payload).map("%02x".format(_)).mkString
          }
        Row(id, kind, d.width, d.height, d.nFrames,
          (if (payload == null) 0L else payload.length.toLong), sum, feat.toSeq)
      }
    }
    spark.createDataFrame(rows, featSchema)
  }

  /** Resize bookkeeping: target dims + scale factors — metadata transform
    * only (a real pipeline would re-encode payloads in the same
    * mapPartitions pass; the stub keeps payloads opaque). */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media
      .withColumn("target_width", lit(targetW))
      .withColumn("target_height", lit(targetH))
      .withColumn("scale_x",
        when(col("width").isNotNull && col("width") > 0,
          lit(targetW).cast("double") / col("width")))
      .withColumn("scale_y",
        when(col("height").isNotNull && col("height") > 0,
          lit(targetH).cast("double") / col("height")))

  /** Frame sampling plan for videos: every `everyMs` milliseconds across
    * the duration — pure metadata expansion, one row per sampled frame. */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))
}
