package graft

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Clusters, CorpusPipeline, Curation, Dedup, Fingerprint, Keyword, LanguageModel, Multimodal, Shingles, Similarity, TextAnalysis}
import graft.lake.ZOrder
import graft.ops.{AsofJoin, Cohorts, Diff, Drift, Funnel, FuzzyJoin, Hierarchy, Ids, IntervalJoin, Normalize, Profile, Resample, RuntimeFilter, Seasonal, SkewJoin, Sketches}
import graft.pipeline.{Cdc, IncrementalAgg, Scd2}
import graft.ops.ColumnOps._
import graft.ops.JsonOps._
import graft.ops.ValidateOps._

/** Multimodal family of the driver contract — query declarations and their
  * DuckDB oracle SQL, split verbatim out of SparkEntry.scala (round 13,
  * pure mechanical move; no behavior change). The self-type pins this
  * trait to the SparkEntry object so every helper reference (rd, model
  * memoizers, shared oracle CTEs) resolves exactly as before the split.
  */
private[graft] trait EntryMultimodal { this: SparkEntry.type =>

  private[graft] def queriesMultimodal: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------- LLM-pipeline: multimodal
    "m1_multimodal_meta" -> ((s, dir) => {
      Multimodal.metadataOnly(
        Multimodal.packAsMedia(rd(s, dir, "documents"), "doc_id", "text", "text"))
        .orderBy("media_id")
    }),


    "m2_multimodal_features" -> ((s, dir) => {
      // value-checked: the byte-level 16-bin histogram (the codec-free
      // signature over RAW payload bytes; decoded-pixel features are m8)
      // is deterministic byte math, so un-normalizing two bins
      // back to integer byte counts (bin k covers bytes [16k, 16k+16))
      // gives numbers a DuckDB oracle reproduces exactly. Integer compare
      // — no float-vs-double rounding hazard. Exactness bound: features
      // are Float32 (24-bit mantissa), so the un-normalization is only
      // exact while a single bin holds < 2^24 bytes (~16 MB per payload
      // per bin) — far above any test payload; a production decoder would
      // emit counts, not fractions, and not carry this bound.
      val packed = Multimodal.packAsMedia(
        rd(s, dir, "documents"), "doc_id", "text", "text")
      val meta = Multimodal.metadataOnly(packed)
        .select(col("media_id"), col("payload_bytes"))
      Multimodal.extractFeatures(s, packed).toDF()
        .join(meta, Seq("media_id"))
        .select(
          col("media_id"), col("dim"),
          floor(element_at(col("features"), 1).cast("double") *
            col("payload_bytes") + 0.5).cast("long").as("bin0_bytes"),
          floor(element_at(col("features"), 7).cast("double") *
            col("payload_bytes") + 0.5).cast("long").as("bin6_bytes"))
        .orderBy("media_id")
    }),


    "m4_resize" -> ((s, dir) => {
      // value-checked end-to-end: every-3rd-byte downsample is expressible
      // in DuckDB as a regex keep-1-of-3 on the (ASCII) packed text, so
      // both the resized length AND an md5 over the resized bytes compare
      // exactly — the payload content is verified, not just its size.
      // The oracle strides CHARACTERS while we stride BYTES, so the
      // equivalence needs single-byte text: assert it structurally (a
      // multi-byte document fails the query instead of silently diverging).
      val packed = Multimodal.packAsMedia(
        asciiGuard(rd(s, dir, "documents"), "m4_resize"), "doc_id", "text", "text")
      Multimodal.resize(s, packed, factor = 3)
        .select(
          col("media_id"),
          length(col("payload")).as("resized_bytes"),
          md5(col("payload")).as("resized_md5"))
        .orderBy("media_id")
    }),


    "m3_frame_sample" -> ((s, dir) => {
      // value-compared via per-media frame count + total sampled bytes
      // (pure arithmetic on payload length — engine-neutral)
      Multimodal.sampleFrames(
        Multimodal.packAsMedia(rd(s, dir, "documents"), "doc_id", "text", "text"),
        frameBytes = 32, stride = 2)
        .groupBy("media_id")
        .agg(
          count(lit(1)).as("n_frames_sampled"),
          sum(length(col("frame_payload"))).cast("long").as("frame_bytes"))
        .orderBy("media_id")
    }),


    "m5_image_decode" -> ((s, dir) => {
      // REAL codec, oracle-proven: pack each doc's first 64 bytes as an
      // actual 8x8 grayscale 24-bit BMP, decode it through javax.imageio,
      // and emit the codec-reported dims + exact per-channel pixel sums.
      // The oracle recomputes the sums as plain byte math over the text
      // (ascii(substr) = byte value only for single-byte text — asserted
      // structurally, same contract as m4).
      Multimodal.decodeImages(s,
        Multimodal.packAsBmp(s, asciiGuard(rd(s, dir, "documents"),
          "m5_image_decode"), "doc_id", "text", w = 8, h = 8))
        .toDF().orderBy("media_id")
    }),


    "m6_image_resize_decode" -> ((s, dir) => {
      // REAL codec round trip: BMP-encode -> imageio decode -> exact 2x
      // pixel subsample -> PNG re-encode -> imageio decode again. The
      // final sums must equal byte math over the strided source positions
      // (y,x even), proving both codec passes AND the resize pixel map.
      Multimodal.decodeImages(s,
        Multimodal.resizeImages(s,
          Multimodal.packAsBmp(s, asciiGuard(rd(s, dir, "documents"),
            "m6_image_resize_decode"), "doc_id", "text", w = 8, h = 8),
          factor = 2))
        .toDF().orderBy("media_id")
    }),


    "m7_audio_decode" -> ((s, dir) => {
      // REAL codec, oracle-proven: pack each doc's first 64 bytes as an
      // actual RIFF/WAVE 16-bit PCM mono file (sample = (byte-128)*256),
      // decode through javax.sound.sampled, and emit the codec-reported
      // format/frames/duration + the inverse-mapped byte sum.
      Multimodal.decodeAudio(s,
        Multimodal.packAsWav(s, asciiGuard(rd(s, dir, "documents"),
          "m7_audio_decode"), "doc_id", "text", rate = 8000, nSamples = 64))
        .toDF().orderBy("media_id")
    }),


    "m8_image_features" -> ((s, dir) => {
      // REAL feature extraction: luminance histogram over codec-DECODED
      // pixels (the MediaFeatures shape ext.Similarity consumes). Same
      // un-normalization trick as m2: bins are count/64 (exact in Float32),
      // so floor(f*64+0.5) recovers integer pixel counts the oracle
      // reproduces as byte math — zero-pad pixels land in bin 0.
      Multimodal.imageFeatures(s,
        Multimodal.packAsBmp(s, asciiGuard(rd(s, dir, "documents"),
          "m8_image_features"), "doc_id", "text", w = 8, h = 8), dim = 16)
        .toDF()
        .select(col("media_id"), col("dim"),
          floor(element_at(col("features"), 1).cast("double") * 64 + 0.5)
            .cast("long").as("bin0_px"),
          floor(element_at(col("features"), 7).cast("double") * 64 + 0.5)
            .cast("long").as("bin6_px"))
        .orderBy("media_id")
    }),


    "m9_video_decode" -> ((s, dir) => {
      // REAL video path, oracle-proven: pack 4 consecutive 64-byte text
      // windows as a motion-image stream (concatenated BMP frames — the
      // MJPEG shape with a lossless per-frame codec), demux by the
      // container's own framing, decode every frame through javax.imageio,
      // and emit codec-reported dims + exact per-channel sums per frame.
      // The oracle recomputes frame k's sums as byte math over text
      // positions [k*64+1, k*64+64] (zero-pad positions read ascii('')=0).
      Multimodal.decodeVideo(s,
        Multimodal.packAsVideo(s, asciiGuard(rd(s, dir, "documents"),
          "m9_video_decode"), "doc_id", "text", w = 8, h = 8, nFrames = 4))
        .toDF().orderBy("media_id", "frame_idx")
    }),


    "m10_audio_spectrogram" -> ((s, dir) => {
      // STFT spectrogram through the real JDK audio codec + an in-engine
      // radix-2 FFT (Multimodal.spectrogram). The tones are bin-aligned
      // sines with frequency a pure function of doc_id, so the loudest
      // FFT bin has a closed form the oracle states directly — the FFT is
      // value-proven against analytic ground truth, the m5-m9 pattern
      // lifted from byte math to spectral math.
      val ids = rd(s, dir, "documents").select(col("doc_id"))
      val media = Multimodal.packAsTone(s, ids, "doc_id",
        rate = 8000, nSamples = 1024, frameSize = 256,
        bin = id => (id % 20 + 5).toInt)
      Multimodal.spectrogram(s, media, frameSize = 256, hop = 128)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          min("dominant_bin").as("bin_lo"),
          max("dominant_bin").as("bin_hi"))
        .orderBy("media_id")
    })
  )

  private[graft] def oraclesMultimodal: Map[String, String] = Map(

    "m2_multimodal_features" ->
      """SELECT doc_id AS media_id, 16 AS dim,
        |  CAST(length(regexp_replace(text, '[^\x00-\x0f]', '', 'g'))
        |    AS BIGINT) AS bin0_bytes,
        |  CAST(length(regexp_replace(text, '[^\x60-\x6f]', '', 'g'))
        |    AS BIGINT) AS bin6_bytes
        |FROM documents ORDER BY media_id""".stripMargin,


    "m1_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'text' AS kind, 'raw' AS format,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_bytes
        |FROM documents ORDER BY media_id""".stripMargin,


    // Cross-engine equivalence precondition: the Spark side downsamples raw
    // UTF-8 payload BYTES while this oracle strides CHARACTERS, so the two
    // agree only on single-byte text. `(?s)` makes '.' match newlines (RE2
    // default does not); the ASCII requirement is asserted structurally on
    // the Spark side (Multimodal resize query fails on multi-byte payloads).
    "m4_resize" ->
      """SELECT doc_id AS media_id,
        |  length(regexp_replace(text, '(?s)(.).{0,2}', '\1', 'g')) AS resized_bytes,
        |  md5(regexp_replace(text, '(?s)(.).{0,2}', '\1', 'g')) AS resized_md5
        |FROM documents ORDER BY media_id""".stripMargin,


    "m3_frame_sample" ->
      """WITH f AS (SELECT doc_id AS media_id,
        |    octet_length(encode(text)) AS L,
        |    greatest(octet_length(encode(text)) // 32, 1) AS nf
        |  FROM documents)
        |SELECT media_id,
        |  CAST(len(range(0, nf, 2)) AS BIGINT) AS n_frames_sampled,
        |  CAST(list_sum(list_transform(range(0, nf, 2),
        |    i -> least(32, L - i * 32))) AS BIGINT) AS frame_bytes
        |FROM f ORDER BY media_id""".stripMargin,


    // m5–m7 prove the REAL JDK codecs (javax.imageio / javax.sound.sampled)
    // value-exactly: the packed pixel/sample values are a known function of
    // the text bytes, so the oracle recomputes the decoded sums as byte
    // math. ascii(substr(text,i,1)) = byte i only for single-byte text
    // (asserted structurally Spark-side via asciiGuard, as in m4); padded
    // positions read ascii('') = 0, matching the Spark side's zero-pad.
    "m5_image_decode" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> ascii(substr(text, i, 1)))) AS BIGINT) AS lum
        |  FROM documents)
        |SELECT doc_id AS media_id, 8 AS width, 8 AS height,
        |  lum AS sum_r, lum AS sum_g, lum AS sum_b
        |FROM s ORDER BY media_id""".stripMargin,


    // 2x subsample keeps source pixels (x,y) with x,y even: byte index
    // y*8+x -> substr position yy*16 + xx*2 + 1 for yy,xx in [0,4)
    "m6_image_resize_decode" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 4), yy ->
        |      list_sum(list_transform(range(0, 4), xx ->
        |        ascii(substr(text, yy * 16 + xx * 2 + 1, 1)))))) AS BIGINT)
        |      AS lum
        |  FROM documents)
        |SELECT doc_id AS media_id, 4 AS width, 4 AS height,
        |  lum AS sum_r, lum AS sum_g, lum AS sum_b
        |FROM s ORDER BY media_id""".stripMargin,


    "m7_audio_decode" ->
      """SELECT doc_id AS media_id, 8000 AS sample_rate, 1 AS channels,
        |  CAST(64 AS BIGINT) AS n_frames, CAST(8 AS BIGINT) AS duration_ms,
        |  CAST(list_sum(list_transform(range(1, 65),
        |    i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum
        |FROM documents ORDER BY media_id""".stripMargin,


    // bin k holds pixels with luminance in [16k, 16k+16); grayscale lum =
    // source byte, and the 64 - min(len, 64) zero-pad pixels land in bin 0
    "m8_image_features" ->
      """SELECT doc_id AS media_id, 16 AS dim,
        |  CAST(length(regexp_replace(substr(text, 1, 64),
        |      '[^\x00-\x0f]', '', 'g'))
        |    + 64 - least(length(text), 64) AS BIGINT) AS bin0_px,
        |  CAST(length(regexp_replace(substr(text, 1, 64),
        |      '[^\x60-\x6f]', '', 'g')) AS BIGINT) AS bin6_px
        |FROM documents ORDER BY media_id""".stripMargin,


    // frame k of the motion stream covers text bytes [k*64+1, k*64+64];
    // beyond-length positions are zero-padded pixels (ascii('') = 0)
    "m9_video_decode" ->
      """WITH fr AS (SELECT CAST(unnest(range(0, 4)) AS INT) AS f),
        |  s AS (SELECT doc_id, f,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> ascii(substr(text, f * 64 + i, 1)))) AS BIGINT) AS lum
        |  FROM documents, fr)
        |SELECT doc_id AS media_id, f AS frame_idx, 8 AS width, 8 AS height,
        |  lum AS sum_r, lum AS sum_g, lum AS sum_b
        |FROM s ORDER BY media_id, frame_idx""".stripMargin,


    // (1024 - 256) / 128 + 1 = 7 frames; every frame of a bin-aligned
    // tone must peak at bin doc_id % 20 + 5, so min = max = that bin
    "m10_audio_spectrogram" ->
      """SELECT doc_id AS media_id, CAST(7 AS BIGINT) AS n_frames,
        |  CAST(doc_id % 20 + 5 AS INT) AS bin_lo,
        |  CAST(doc_id % 20 + 5 AS INT) AS bin_hi
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
