package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus batched feature extraction.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape, typed
  * pipeline — is real and tested, and so are ALL THREE codec paths:
  * [[decodeImages]] / [[resizeImages]] run `javax.imageio` (BMP/PNG/JPEG/
  * GIF, JDK-built-in), [[decodeAudio]] runs `javax.sound.sampled` (RIFF/
  * WAVE PCM, JDK-built-in), and [[decodeVideo]] demuxes a motion-image
  * elementary stream (concatenated per-frame image files, the MJPEG shape)
  * and decodes every frame through the same ImageIO path — all inside the
  * batched `mapPartitions` loop, no external libraries. A production
  * inter-frame codec (H.264 via JNI/FFM) would replace only the demux+
  * per-frame decode body; the batch contract and frame-row schema hold.
  *
  * Scale notes: payloads stay opaque binary end-to-end (parquet binary
  * columns — no base64 inflation); feature extraction is `mapPartitions`
  * over batches so decoder init amortizes across a partition, mirroring
  * PySpark's `mapInPandas` batch contract; metadata lives in a separate
  * struct column so metadata-only queries never touch the payload bytes
  * (parquet column pruning).
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long, kind: String, dim: Int, features: Array[Float])

  /** Batch size for the decode loop — the `mapInPandas`-style unit a real
    * codec would process per call.
    */
  final val DecodeBatchSize = 64

  /** Adapt any table with an id + string column into media records (the
    * sandbox stand-in for reading real image/audio payload files).
    */
  def packAsMedia(
      df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      struct(
        lit("raw").as("format"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0L).as("durationMs")).as("meta"))

  /** Payload-level feature: `dim`-bin byte histogram, L1-normalized —
    * a codec-free signature over the RAW bytes (compression fingerprints,
    * format drift detection, cheap near-dup blocking on binary columns).
    * Codec-aware features live in [[imageFeatures]] (decoded pixels).
    */
  private def byteHistogram(payload: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      counts(((payload(i) & 0xFF) * dim) / 256) += 1f
      i += 1
    }
    val total = math.max(payload.length, 1).toFloat
    counts.map(_ / total)
  }

  /** Batched byte-level feature extraction over the binary payload column
    * (see [[byteHistogram]]; decoded-pixel features are [[imageFeatures]]).
    */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap { batch =>
        // one "decoder session" per batch (amortized init in production)
        batch.map { r =>
          MediaFeatures(r.media_id, r.kind, dim, byteHistogram(r.payload, dim))
        }
      }
    }
  }

  /** Byte-stride downsample: keep every `factor`-th payload byte — the
    * codec-FREE shrink for opaque payloads (raw sensor dumps, capped
    * previews). The codec-aware scaler is [[resizeImages]] (decode →
    * pixel subsample → re-encode); both run in the same batched loop
    * because resizing is a codec-boundary op, not a SQL expression.
    * Payload shrinks ~`factor`x; metadata passes through unchanged.
    */
  private def byteStride(payload: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = payload(i * factor); i += 1 }
    out
  }

  /** Batched payload downsample over the binary payload column (same
    * `mapPartitions` batch contract as [[extractFeatures]]).
    */
  def resize(
      spark: SparkSession, media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(r => r.copy(payload = byteStride(r.payload, factor)))
      }
    }.toDF()
  }

  /** Frame sampling STUB: pretends every `frameBytes` slice of the payload
    * is one video frame and keeps every `stride`-th — exercising the
    * explode/one-to-many shape (media row → frame rows) a real sampler has.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        greatest((length(col("payload")) / frameBytes).cast("int"), lit(1)))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame_payload",
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .select("media_id", "kind", "frame_idx", "frame_payload")

  /** Metadata projection: id/kind/format plus payload size — everything a
    * catalog query needs without decoding.
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      col("meta.format").as("format"),
      length(col("payload")).as("payload_bytes"))

  // ------------------------------------------------------------------
  // REAL codecs (JDK-only: javax.imageio + javax.sound.sampled).
  //
  // The sandbox ships no media files, so [[packAsBmp]]/[[packAsWav]]
  // synthesize REAL payloads (a well-formed 24-bit BMP / RIFF-WAVE
  // 16-bit PCM) deterministically from a table's text bytes; decode then
  // runs the actual JDK codec on them. Because the pixel/sample values
  // are a known function of the source bytes, a SQL oracle can verify
  // the full encode→codec-decode round trip value-exactly — the decoder
  // output is PROVEN against byte math, not just shape-checked. At
  // production scale the pack step disappears (payloads arrive in
  // parquet binary columns) and the decode path is unchanged.
  // ------------------------------------------------------------------

  /** Decoded-image summary: dims from the codec plus exact per-channel
    * pixel sums (for grayscale sources all three equal the byte sum).
    */
  final case class DecodedImage(
      media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decoded-audio summary: format fields from the codec plus the exact
    * sample-derived byte sum (inverse of [[packAsWav]]'s sample map).
    */
  final case class DecodedAudio(
      media_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Long, byte_sum: Long)

  /** Build a well-formed 24-bit uncompressed BMP from grayscale values
    * (one byte per pixel, row-major top-down; BMP stores rows bottom-up
    * with 4-byte row padding — both handled here).
    */
  private[ext] def encodeBmp24(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val stride = rowBytes + pad
    val dataSize = stride * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val v: Byte = if (i < gray.length) gray(i) else 0
        out.put(v).put(v).put(v)
        x += 1
      }
      var p = 0
      while (p < pad) { out.put(0: Byte); p += 1 }
      y -= 1
    }
    out.array()
  }

  /** Build a well-formed RIFF/WAVE file: 16-bit PCM mono, little-endian,
    * `sample(i) = (byte(i) - 128) * 256` over the first `nSamples` input
    * bytes (zero-padded — pad byte 0 maps to sample -32768).
    */
  private[ext] def encodeWavPcm16(
      rate: Int, nSamples: Int, bytes: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val b = if (i < bytes.length) bytes(i) & 0xFF else 0
      out.putShort(((b - 128) * 256).toShort)
      i += 1
    }
    out.array()
  }

  /** Pack a text column's first `w*h` UTF-8 bytes into a REAL grayscale
    * 24-bit BMP payload (zero-padded). Runs in the batched codec loop;
    * exists only because the sandbox has no media files to read.
    */
  def packAsBmp(
      spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      w: Int, h: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap(_.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          MediaRecord(id, "image", encodeBmp24(w, h, bytes.take(w * h)),
            MediaMeta("bmp", w, h, 0L))
        })
      }.toDF()
  }

  /** Pack a text column's first `nSamples` UTF-8 bytes into a REAL
    * RIFF/WAVE 16-bit PCM mono payload (see [[encodeWavPcm16]]).
    */
  def packAsWav(
      spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      rate: Int, nSamples: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap(_.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          MediaRecord(id, "audio", encodeWavPcm16(rate, nSamples, bytes),
            MediaMeta("wav", 0, 0, nSamples.toLong * 1000L / rate))
        })
      }.toDF()
  }

  /** REAL image decode: `javax.imageio.ImageIO` (BMP/PNG/JPEG/GIF are
    * JDK-built-in readers) inside the batched `mapPartitions` loop.
    * Returns codec-reported dimensions plus exact per-channel pixel sums —
    * value-verifiable against the source bytes for [[packAsBmp]] payloads.
    * Scale: cost is linear in payload bytes, no shuffle; reader instances
    * are per-call (ImageIO readers are not thread-safe to share).
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"media_id=${r.media_id}: undecodable image payload")
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        DecodedImage(r.media_id, img.getWidth, img.getHeight, sr, sg, sb)
      })
    }
  }

  /** REAL image resize: codec-decode, subsample every `factor`-th pixel in
    * both axes (exact nearest-pixel semantics — oracle-reproducible, unlike
    * interpolating scalers), then codec-RE-ENCODE to `format` (default
    * lossless PNG). Payload out is a real image file; metadata dims update.
    */
  def resizeImages(
      spark: SparkSession, media: DataFrame, factor: Int,
      format: String = "png"): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"media_id=${r.media_id}: undecodable image payload")
        val nw = math.max((img.getWidth + factor - 1) / factor, 1)
        val nh = math.max((img.getHeight + factor - 1) / factor, 1)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            out.setRGB(x, y, img.getRGB(x * factor, y * factor))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        // write() returns false (without throwing) when no writer handles
        // the format — that would silently emit a zero-byte payload
        require(javax.imageio.ImageIO.write(out, format, bos),
          s"media_id=${r.media_id}: no ImageIO writer for format=$format")
        r.copy(payload = bos.toByteArray,
          meta = r.meta.copy(format = format, width = nw, height = nh))
      })
    }.toDF()
  }

  /** REAL image feature extraction: codec-decode, then a `dim`-bin
    * luminance histogram over the DECODED pixels ((r+g+b)/3 per pixel),
    * L1-normalized — the [[MediaFeatures]] shape the similarity/dedup
    * stack consumes (`ext.Similarity` cosine / LSH over the vector), so
    * decode → featurize → near-dup composes end-to-end. For grayscale
    * sources the luminance equals the source byte, making the histogram
    * oracle-reproducible as byte math.
    */
  def imageFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"media_id=${r.media_id}: undecodable image payload")
        val counts = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
            counts((lum * dim) / 256) += 1f
            x += 1
          }
          y += 1
        }
        val total = math.max(img.getWidth * img.getHeight, 1).toFloat
        MediaFeatures(r.media_id, r.kind, dim, counts.map(_ / total))
      })
    }
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (RIFF/WAVE PCM is
    * JDK-built-in) inside the batched loop. Reports the codec's format
    * fields and frame count, plus `byte_sum` — the sum of samples mapped
    * back through the inverse of [[packAsWav]]'s sample function, exact for
    * 16-bit PCM — so a SQL oracle verifies the decode value-exactly.
    */
  /** One decoded video frame as emitted by [[decodeVideo]]. */
  final case class DecodedFrame(
      media_id: Long, frame_idx: Int, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Pack consecutive `w*h`-byte windows of a text column into a REAL
    * motion-image elementary stream: `nFrames` well-formed BMP files
    * back-to-back (the MJPEG container shape with a lossless per-frame
    * codec, so the decode is byte-math verifiable — JPEG frames would
    * drop into the same demux/decode path but defeat an exact oracle).
    */
  def packAsVideo(
      spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
      w: Int, h: Int, nFrames: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap(_.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          val bos = new java.io.ByteArrayOutputStream()
          var k = 0
          while (k < nFrames) {
            bos.write(encodeBmp24(w, h,
              bytes.slice(k * w * h, (k + 1) * w * h)))
            k += 1
          }
          MediaRecord(id, "video", bos.toByteArray,
            MediaMeta("bmpseq", w, h, nFrames * 40L)) // 25 fps
        })
      }.toDF()
  }

  /** REAL video decode: demux the concatenated-frame stream (each frame's
    * length is its BMP header's file-size field — the container carries
    * its own framing, nothing is assumed about frame dimensions) and
    * decode every frame through the SAME `javax.imageio` path as
    * [[decodeImages]], emitting one row per frame. One media row → many
    * frame rows is the shape a production sampler feeds feature
    * extraction; an inter-frame codec would swap only this body.
    */
  def decodeVideo(spark: SparkSession, media: DataFrame): Dataset[DecodedFrame] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
        val p = r.payload
        val frames = Iterator.unfold(0) { off =>
          if (off >= p.length) None
          else {
            require(off + 6 <= p.length && p(off) == 'B' && p(off + 1) == 'M',
              s"media_id=${r.media_id}: bad frame magic at offset $off")
            val size = (p(off + 2) & 0xFF) | ((p(off + 3) & 0xFF) << 8) |
              ((p(off + 4) & 0xFF) << 16) | ((p(off + 5) & 0xFF) << 24)
            require(size > 0 && off + size <= p.length,
              s"media_id=${r.media_id}: frame at $off overruns payload ($size)")
            Some(((off, size), off + size))
          }
        }
        frames.zipWithIndex.map { case ((off, size), idx) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(p, off, size))
          require(img != null,
            s"media_id=${r.media_id}: undecodable frame $idx at offset $off")
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          DecodedFrame(r.media_id, idx, img.getWidth, img.getHeight, sr, sg, sb)
        }
      })
    }
  }

  def decodeAudio(spark: SparkSession, media: DataFrame): Dataset[DecodedAudio] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap(_.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1,
            s"media_id=${r.media_id}: expected 16-bit mono PCM, got $f")
          val nFrames = ais.getFrameLength
          val pcm = ais.readAllBytes()
          var (i, sum) = (0, 0L)
          while (i + 1 < pcm.length) {
            val s = (pcm(i) & 0xFF) | (pcm(i + 1).toInt << 8)
            sum += (s / 256) + 128
            i += 2
          }
          DecodedAudio(r.media_id, f.getSampleRate.toInt, f.getChannels,
            nFrames, nFrames * 1000L / f.getSampleRate.toInt, sum)
        } finally ais.close()
      })
    }
  }

  // ------------------------------------------------- spectral analysis

  /** One STFT frame: Hann-windowed power spectrum (length frameSize/2,
    * DC excluded from `dominant_bin` so a constant offset never wins).
    */
  final case class SpectrogramFrame(
      media_id: Long, frame_idx: Int, dominant_bin: Int,
      power: Array[Double])

  /** Pack a pure sine tone per row — frequency = `bin(id)` × rate /
    * `frameSize`, i.e. EXACTLY centered on an STFT bin, so the expected
    * spectrogram is known in closed form (the analytic ground truth the
    * m10 oracle checks). Amplitude 0.5 full-scale.
    */
  def packAsTone(
      spark: SparkSession, df: DataFrame, idCol: String,
      rate: Int, nSamples: Int, frameSize: Int,
      bin: Long => Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { rows =>
        rows.grouped(DecodeBatchSize).flatMap(_.map { id =>
          val b = bin(id)
          val omega = 2.0 * math.Pi * b / frameSize
          val samples = Array.tabulate(nSamples)(t =>
            (16384.0 * math.sin(omega * t)).toShort)
          MediaRecord(id, "audio", encodeWavPcm16Samples(rate, samples),
            MediaMeta("wav", 0, 0, nSamples.toLong * 1000L / rate))
        })
      }.toDF()
  }

  /** [[encodeWavPcm16]]'s sibling for direct 16-bit samples. */
  private[ext] def encodeWavPcm16Samples(
      rate: Int, samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val out = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Short-time spectrogram of 16-bit mono WAV payloads: decode through
    * the JDK codec, slide a Hann window (`frameSize` power of two, `hop`
    * step, trailing partial frame dropped), radix-2 FFT per frame, emit
    * the one-sided power spectrum and its loudest non-DC bin.
    *
    * Row-local end to end — the FFT runs inside the same batched
    * `mapPartitions` contract as the codecs: no shuffle, cost linear in
    * audio seconds, and the downstream table is (frames × frameSize/2)
    * doubles that feed band-energy features or the similarity stack.
    */
  def spectrogram(
      spark: SparkSession, media: DataFrame,
      frameSize: Int = 256, hop: Int = 128): Dataset[SpectrogramFrame] = {
    import spark.implicits._
    require(frameSize >= 8 && (frameSize & (frameSize - 1)) == 0,
      s"frameSize must be a power of two >= 8, got $frameSize")
    require(hop >= 1, "hop must be positive")
    media.as[MediaRecord].mapPartitions { records =>
      records.grouped(DecodeBatchSize).flatMap(_.flatMap { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val samples =
          try {
            val f = ais.getFormat
            require(f.getSampleSizeInBits == 16 && f.getChannels == 1,
              s"media_id=${r.media_id}: expected 16-bit mono PCM, got $f")
            val pcm = ais.readAllBytes()
            val out = new Array[Double](pcm.length / 2)
            var i = 0
            while (i < out.length) {
              out(i) =
                ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1).toInt << 8)).toShort /
                  32768.0
              i += 1
            }
            out
          } finally ais.close()
        val window = Array.tabulate(frameSize)(i =>
          0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (frameSize - 1))))
        val nFrames =
          if (samples.length < frameSize) 0
          else (samples.length - frameSize) / hop + 1
        (0 until nFrames).map { fr =>
          val re = new Array[Double](frameSize)
          val im = new Array[Double](frameSize)
          var i = 0
          while (i < frameSize) {
            re(i) = samples(fr * hop + i) * window(i)
            i += 1
          }
          fft(re, im)
          val half = frameSize / 2
          val power = new Array[Double](half)
          var best = 1
          var k = 0
          while (k < half) {
            power(k) = re(k) * re(k) + im(k) * im(k)
            if (k >= 1 && power(k) > power(best)) best = k
            k += 1
          }
          SpectrogramFrame(r.media_id, fr, best, power)
        }
      })
    }
  }

  /** Fixed-size audio embedding: the spectrogram's per-frame power
    * folded into `nBands` equal bins, averaged over frames, and
    * L2-normalized — `(media_id, dim, features)` in the same
    * [[MediaFeatures]] shape the image histogram uses, so the output
    * plugs straight into the [[Similarity]] stack (audio near-dup = the
    * same cosine/LSH machinery as text embeddings). Row-local after the
    * per-media average (one vocab-free aggregation).
    */
  def audioFeatures(
      spark: SparkSession, media: DataFrame,
      frameSize: Int = 256, hop: Int = 128,
      nBands: Int = 16): DataFrame = {
    import spark.implicits._
    require(nBands >= 1 && nBands <= frameSize / 2, s"nBands=$nBands")
    val perBand = frameSize / 2 / nBands
    spectrogram(spark, media, frameSize, hop)
      .mapPartitions(_.map { f =>
        val bands = new Array[Double](nBands)
        var k = 0
        while (k < perBand * nBands) {
          bands(k / perBand) += f.power(k)
          k += 1
        }
        (f.media_id, bands)
      })
      .toDF("media_id", "bands")
      .select(col("media_id"), posexplode(col("bands")).as(Seq("band", "p")))
      .groupBy("media_id", "band").agg(avg("p").as("p"))
      .groupBy("media_id")
      // struct sorts by its first field, so the array rebuilds band-ordered
      .agg(array_sort(collect_list(struct(col("band"), col("p")))).as("bp"))
      .select(col("media_id"),
        transform(col("bp"), x => x("p")).as("raw"))
      .select(col("media_id"), lit(nBands).as("dim"),
        transform(col("raw"), x =>
          (x / greatest(sqrt(aggregate(col("raw"), lit(0.0),
            (acc, v) => acc + v * v)), lit(1e-12))).cast("float"))
          .as("features"))
  }

  /** In-place iterative radix-2 Cooley-Tukey. */
  private[ext] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr = re(blk + k + len / 2) * cr - im(blk + k + len / 2) * ci
          val vi = re(blk + k + len / 2) * ci + im(blk + k + len / 2) * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }
}
