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
}
