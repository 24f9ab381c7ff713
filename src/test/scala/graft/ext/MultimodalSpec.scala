package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Multimodal.packAsMedia(
      Seq((1L, "short"), (2L, "a considerably longer payload body here"))
        .toDF("id", "body"),
      "id", "body", kind = "image")
  }

  test("packAsMedia produces binary payload + typed metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(media.count() === 2)
  }

  test("m1 metadataOnly never touches payload bytes beyond length") {
    import spark.implicits._
    val m = Multimodal.metadataOnly(media)
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    assert(m(0) === ((1L, "image", "raw", 5)))
    assert(m(1)._4 === "a considerably longer payload body here".length)
  }

  test("m2 feature extraction: deterministic, L1-normalized, right dim") {
    val feats = Multimodal.extractFeatures(spark, media, dim = 16).collect()
    assert(feats.length === 2)
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5)
    }
    // determinism: same input -> same features
    val again = Multimodal.extractFeatures(spark, media, dim = 16).collect()
    assert(feats.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("resize keeps every factor-th payload byte, ceil-divided length") {
    import spark.implicits._
    val out = Multimodal.resize(spark, media, factor = 3)
      .select(col("media_id"), decode(col("payload"), "UTF-8").as("p"))
      .as[(Long, String)].collect().sortBy(_._1)
    // "short" -> indices 0,3 -> "sr"; 5 bytes -> ceil(5/3) = 2
    assert(out(0) === ((1L, "sr")))
    val full = "a considerably longer payload body here"
    assert(out(1)._2 === full.indices.collect {
      case i if i % 3 == 0 => full(i) }.mkString)
    // factor 1 is the identity
    val id = Multimodal.resize(spark, media, factor = 1)
      .select(decode(col("payload"), "UTF-8")).as[String].collect().toSet
    assert(id === Set("short", full))
  }

  test("frame sampling explodes media rows into stride-spaced frames") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
    val byId = frames.select("media_id", "frame_idx")
      .as[(Long, Int)].collect().groupBy(_._1)
    // payload "short" = 5 bytes -> 1 frame (idx 0)
    assert(byId(1L).map(_._2).toSeq.sorted === Seq(0))
    // 39 bytes / 4 = 9 frames, stride 2 -> indices 0,2,4,6,8
    assert(byId(2L).map(_._2).toSeq.sorted === Seq(0, 2, 4, 6, 8))
    // each frame payload is at most frameBytes long
    val lens = frames.selectExpr("length(frame_payload)").as[Int].collect()
    assert(lens.forall(_ <= 4))
  }

  // ---------------------------------------------- REAL codecs (JDK-only)

  private def textRows = {
    import spark.implicits._
    // 64+ byte ASCII payload and a short one (exercises zero-padding)
    Seq(
      (1L, ('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"),
      (2L, "tiny"))
      .toDF("id", "body")
  }

  private def byteSum(s: String, n: Int): Long =
    s.getBytes("UTF-8").take(n).map(_ & 0xFFL).sum

  test("packAsBmp produces a real BMP that javax.imageio decodes exactly") {
    val decoded = Multimodal.decodeImages(spark,
      Multimodal.packAsBmp(spark, textRows, "id", "body", w = 8, h = 8))
      .collect().sortBy(_.media_id)
    assert(decoded.map(d => (d.width, d.height)).toSeq === Seq((8, 8), (8, 8)))
    // grayscale: all three channel sums equal the source byte sum (zero-pad
    // beyond the text contributes nothing)
    val texts = Map(
      1L -> (('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"),
      2L -> "tiny")
    decoded.foreach { d =>
      val e = byteSum(texts(d.media_id), 64)
      assert((d.sum_r, d.sum_g, d.sum_b) === ((e, e, e)),
        s"media_id=${d.media_id}")
    }
  }

  test("resizeImages: codec decode -> exact 2x subsample -> PNG re-encode") {
    val resized = Multimodal.resizeImages(spark,
      Multimodal.packAsBmp(spark, textRows, "id", "body", w = 8, h = 8),
      factor = 2)
    // metadata dims update and the payload is a real PNG (magic bytes)
    val metas = resized.selectExpr(
        "media_id", "meta.format", "meta.width", "meta.height",
        "substring(payload, 2, 3)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), new String(r.getAs[Array[Byte]](4), "US-ASCII")))
    metas.foreach { case (_, fmt, w, h, magic) =>
      assert((fmt, w, h, magic) === (("png", 4, 4, "PNG")))
    }
    // decode the PNG back: sums must equal byte math over strided positions
    val decoded = Multimodal.decodeImages(spark, resized)
      .collect().sortBy(_.media_id)
    val texts = Map(
      1L -> (('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"),
      2L -> "tiny")
    decoded.foreach { d =>
      val bytes = texts(d.media_id).getBytes("UTF-8")
      var e = 0L
      for (yy <- 0 until 4; xx <- 0 until 4) {
        val i = yy * 16 + xx * 2
        if (i < bytes.length) e += bytes(i) & 0xFFL
      }
      assert((d.width, d.height) === ((4, 4)))
      assert((d.sum_r, d.sum_g, d.sum_b) === ((e, e, e)),
        s"media_id=${d.media_id}")
    }
  }

  test("imageFeatures: luminance histogram over codec-decoded pixels") {
    val feats = Multimodal.imageFeatures(spark,
      Multimodal.packAsBmp(spark, textRows, "id", "body", w = 8, h = 8),
      dim = 16).collect().sortBy(_.media_id)
    val texts = Map(
      1L -> (('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"),
      2L -> "tiny")
    feats.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-5)
      // histogram equals byte math on the 64-byte zero-padded source
      val bytes = texts(f.media_id).getBytes("UTF-8").padTo(64, 0.toByte)
      val expect = new Array[Float](16)
      bytes.foreach(b => expect(((b & 0xFF) * 16) / 256) += 1f / 64)
      assert(f.features.toSeq === expect.toSeq, s"media_id=${f.media_id}")
    }
    // the features compose with the similarity stack: an exact image
    // duplicate (same payload, new id) scores cosine 1 through the same
    // vector ops the ANN/dedup paths use
    import spark.implicits._
    val withDup = textRows.union(
      Seq((3L, ('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"))
        .toDF("id", "body"))
    val fdf = Multimodal.imageFeatures(spark,
      Multimodal.packAsBmp(spark, withDup, "id", "body", w = 8, h = 8),
      dim = 16).toDF()
      .selectExpr("media_id AS id", "features AS embedding")
    val pairs = Similarity.cosinePairsBruteForce(fdf, "id", "embedding")
      .where("cosine >= 0.9999").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 3L)))
  }

  test("packAsVideo + decodeVideo: demux by container framing, codec-exact") {
    val decoded = Multimodal.decodeVideo(spark,
      Multimodal.packAsVideo(spark, textRows, "id", "body",
        w = 4, h = 4, nFrames = 3))
      .collect().sortBy(d => (d.media_id, d.frame_idx))
    val texts = Map(
      1L -> (('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"),
      2L -> "tiny")
    // 2 media x 3 frames, codec-reported dims
    assert(decoded.length === 6)
    assert(decoded.forall(d => d.width == 4 && d.height == 4))
    assert(decoded.map(_.frame_idx).toSeq === Seq(0, 1, 2, 0, 1, 2))
    // frame k covers source bytes [k*16, k*16+16); zero-pad beyond length
    decoded.foreach { d =>
      val e = texts(d.media_id).getBytes("UTF-8")
        .slice(d.frame_idx * 16, d.frame_idx * 16 + 16).map(_ & 0xFFL).sum
      assert((d.sum_r, d.sum_g, d.sum_b) === ((e, e, e)),
        s"media_id=${d.media_id} frame=${d.frame_idx}")
    }
  }

  test("decodeVideo rejects a corrupt stream loudly (bad frame magic)") {
    import spark.implicits._
    val junk = Seq(Multimodal.MediaRecord(9L, "video",
      Array[Byte]('X', 'Y', 1, 2, 3, 4), Multimodal.MediaMeta("bmpseq", 4, 4, 0L)))
      .toDS().toDF()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideo(spark, junk).collect()
    }
    assert(e.getMessage.contains("bad frame magic") ||
      Option(e.getCause).exists(_.getMessage.contains("bad frame magic")))
  }

  test("packAsWav produces a real RIFF/WAVE that javax.sound decodes exactly") {
    val decoded = Multimodal.decodeAudio(spark,
      Multimodal.packAsWav(spark, textRows, "id", "body",
        rate = 8000, nSamples = 64))
      .collect().sortBy(_.media_id)
    val texts = Map(
      1L -> (('a' to 'z').mkString + ('A' to 'Z').mkString + "0123456789!?"),
      2L -> "tiny")
    decoded.foreach { d =>
      assert((d.sample_rate, d.channels, d.n_frames, d.duration_ms) ===
        ((8000, 1, 64L, 8L)))
      // inverse sample map recovers the byte sum; zero-pad maps to sample
      // -32768 -> byte 0, contributing nothing
      assert(d.byte_sum === byteSum(texts(d.media_id), 64),
        s"media_id=${d.media_id}")
    }
  }

  test("fft matches the DFT definition on a small vector") {
    val re = Array(1.0, 2.0, 0.0, -1.0, 3.0, 0.5, -2.0, 1.5)
    val im = new Array[Double](8)
    val (r0, i0) = (re.clone(), im.clone())
    Multimodal.fft(re, im)
    for (k <- 0 until 8) {
      var (er, ei) = (0.0, 0.0)
      for (t <- 0 until 8) {
        val a = -2.0 * math.Pi * k * t / 8
        er += r0(t) * math.cos(a) - i0(t) * math.sin(a)
        ei += r0(t) * math.sin(a) + i0(t) * math.cos(a)
      }
      assert(math.abs(re(k) - er) < 1e-9 && math.abs(im(k) - ei) < 1e-9,
        s"bin $k")
    }
  }

  test("spectrogram of a bin-aligned tone peaks at exactly that bin") {
    import spark.implicits._
    val ids = Seq(3L, 7L).toDF("id")
    val media = Multimodal.packAsTone(spark, ids, "id",
      rate = 8000, nSamples = 1024, frameSize = 256,
      bin = id => (id % 20 + 5).toInt)
    val frames = Multimodal.spectrogram(spark, media, frameSize = 256,
      hop = 128).collect()
    // (1024 - 256) / 128 + 1 = 7 frames per tone
    assert(frames.length === 14)
    frames.foreach { f =>
      val expected = (f.media_id % 20 + 5).toInt
      assert(f.dominant_bin === expected,
        s"media ${f.media_id} frame ${f.frame_idx}")
      // bin-aligned Hann tone: energy concentrates in bin +- 1; anything
      // two bins away is far below the peak
      val peak = f.power(expected)
      f.power.zipWithIndex.foreach { case (p, k) =>
        if (math.abs(k - expected) > 1) assert(p < peak / 100.0)
      }
    }
  }

  test("spectrogram drops the trailing partial frame and short audio") {
    import spark.implicits._
    val short = Multimodal.packAsTone(spark, Seq(1L).toDF("id"), "id",
      rate = 8000, nSamples = 100, frameSize = 256, bin = _ => 6)
    assert(Multimodal.spectrogram(spark, short, 256, 128).count() === 0L)
  }

  test("audioFeatures: L2-normalized band energies peak in the tone's band") {
    import spark.implicits._
    // bin 20 of 128 -> band 2 of 16 (8 bins per band)
    val media = Multimodal.packAsTone(spark, Seq(5L).toDF("id"), "id",
      rate = 8000, nSamples = 1024, frameSize = 256, bin = _ => 20)
    val row = Multimodal.audioFeatures(spark, media, 256, 128, nBands = 16)
      .collect().head
    assert(row.getInt(1) === 16)
    val f = row.getSeq[Float](2)
    assert(f.length === 16)
    assert(math.abs(f.map(x => x * x).sum - 1.0) < 1e-3)
    assert(f.indexOf(f.max) === 2, f.mkString(","))
  }
}
