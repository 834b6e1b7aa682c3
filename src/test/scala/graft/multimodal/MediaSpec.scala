package graft.multimodal

import graft.SparkSpec

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def records = Seq(
    Media.MediaRecord(1L, "image", "synthetic://1", Array[Byte](10, 20, 30, 40)),
    Media.MediaRecord(2L, "audio", "synthetic://2", Array.fill[Byte](2048)(1)),
    Media.MediaRecord(3L, "image", "synthetic://3", Array.emptyByteArray)
  ).toDS()

  test("decode emits deterministic features with the stub codec") {
    val f = Media.decodeFeatures(records).collect().map(x => x.mediaId -> x).toMap
    f(1L).width shouldBe 4
    f(1L).height shouldBe 1
    f(1L).channels shouldBe 3
    f(1L).meanIntensity shouldBe 25.0
    f(1L).payloadBytes shouldBe 4L
    f(2L).channels shouldBe 1 // audio
    f(2L).height shouldBe 2 // 2048 / 1024
    f(3L).meanIntensity shouldBe 0.0
  }

  test("frame sampling yields per-frame records that decode independently") {
    val video = Seq(Media.MediaRecord(5L, "video", "synthetic://5", Array.tabulate[Byte](1000)(_.toByte))).toDS()
    val frames = Media.sampleFrames(video, frames = 4, frameBytes = 100).collect()
    frames.length shouldBe 4
    frames.map(_.mediaId).toSeq shouldBe Seq(5000L, 5001L, 5002L, 5003L)
    frames.foreach(_.payload.length should be <= 100)
    // decode the sampled frames end-to-end
    Media.decodeFeatures(Media.sampleFrames(video, 4, 100)).count() shouldBe 4
  }

  test("resize normalizes every payload to the target geometry") {
    val resized = Media.resizeTo(records, w = 8, h = 2).collect().map(r => r.mediaId -> r).toMap
    resized(1L).payload.length shouldBe 8 * 2 * 3 // image: padded up
    resized(2L).payload.length shouldBe 8 * 2 * 1 // audio: 1 channel, truncated
    resized(3L).payload.length shouldBe 8 * 2 * 3 // empty: zero-padded
    resized(3L).payload.forall(_ == 0) shouldBe true
    // padding is deterministic repetition of the source bytes
    resized(1L).payload.take(4).toSeq shouldBe resized(1L).payload.slice(4, 8).toSeq
    // resized frames decode with uniform geometry
    val feats = Media.decodeFeatures(Media.resizeTo(records, 8, 2)).collect()
    feats.filter(_.kind == "image").foreach(_.payloadBytes shouldBe 48L)
  }

  test("fromText builds the canonical binary media schema") {
    val df = Media.fromText(Seq((7L, "abc")).toDF("doc_id", "text"), "doc_id", "text", "image")
    df.columns.toSeq shouldBe Seq("mediaId", "kind", "uri", "payload")
    val r = df.as[Media.MediaRecord].head()
    r.payload.toSeq shouldBe "abc".getBytes("UTF-8").toSeq
    r.uri shouldBe "synthetic://7"
  }
}
