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

  /** A real in-memory PNG: w×h with a known two-tone pattern (left
    * half black, right half pure red), so width/height/channels and
    * the mean intensity have exact expected values.
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes a real PNG through the partition-batched stage") {
    val ds = Seq(
      Media.MediaRecord(10L, "image", "synthetic://10", pngBytes(64, 32)),
      Media.MediaRecord(11L, "audio", "synthetic://11", Array.fill[Byte](2048)(1))
    ).toDS()
    val f = Media
      .decodeFeatures(ds, () => Media.ImageIoCodec)
      .collect()
      .map(x => x.mediaId -> x)
      .toMap
    f(10L).width shouldBe 64
    f(10L).height shouldBe 32
    f(10L).channels shouldBe 3
    // half the pixels are (255,0,0), half (0,0,0): mean = 255/3/2 = 42.5
    f(10L).meanIntensity shouldBe 42.5
    f(11L).channels shouldBe 1 // non-image kinds take the Fake path
    f(11L).height shouldBe 2
  }

  test("ImageIoResizer rescales a real PNG and the result decodes at the target geometry") {
    val ds = Seq(Media.MediaRecord(12L, "image", "synthetic://12", pngBytes(64, 32))).toDS()
    val resized = Media.resizeTo(ds, w = 16, h = 8, () => Media.ImageIoResizer)
    val feats = Media.decodeFeatures(resized, () => Media.ImageIoCodec).collect()
    feats.length shouldBe 1
    feats.head.width shouldBe 16
    feats.head.height shouldBe 8
    // the two-tone pattern survives scaling: mean stays near 42.5
    // (bilinear edge blending can wiggle the boundary column slightly)
    feats.head.meanIntensity shouldBe 42.5 +- 3.0
  }

  /** Real 16-bit PCM mono WAV: a square wave of constant absolute
    * amplitude A, so the RMS has the exact closed form A/32768.
    */
  private def wavBytes(frames: Int, sampleRate: Int, amplitude: Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val v: Short = if (i % 2 == 0) amplitude else (-amplitude).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavCodec decodes a real WAV: frames, rate, channels, exact RMS") {
    val ds = Seq(
      Media.MediaRecord(20L, "audio", "synthetic://20", wavBytes(4000, 8000, 16384)),
      Media.MediaRecord(21L, "image", "synthetic://21", pngBytes(8, 8))
    ).toDS()
    val f = Media
      .decodeFeatures(ds, () => Media.JdkCodec)
      .collect()
      .map(x => x.mediaId -> x)
      .toMap
    f(20L).width shouldBe 4000 // frames: width/height = 0.5 s duration
    f(20L).height shouldBe 8000 // sample rate
    f(20L).channels shouldBe 1
    // |sample| is constant 16384 -> RMS = 16384/32768 = 0.5 exactly
    f(20L).meanIntensity shouldBe 0.5 +- 1e-12
    // the dispatcher still routes images to the real image codec
    f(21L).width shouldBe 8
    f(21L).meanIntensity shouldBe 42.5
  }

  test("WavCodec fails loudly on bytes that are not an audio container") {
    val ds = Seq(Media.MediaRecord(22L, "audio", "synthetic://22", Array[Byte](9, 9, 9))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(ds, () => Media.WavCodec).collect()
    }
    e.getMessage should include("undecodable audio payload")
  }

  test("ImageIoCodec fails loudly on bytes that are not an image container") {
    val ds = Seq(Media.MediaRecord(13L, "image", "synthetic://13", Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(ds, () => Media.ImageIoCodec).collect()
    }
    e.getMessage should include("undecodable image payload")
  }

  test("fromText builds the canonical binary media schema") {
    val df = Media.fromText(Seq((7L, "abc")).toDF("doc_id", "text"), "doc_id", "text", "image")
    df.columns.toSeq shouldBe Seq("mediaId", "kind", "uri", "payload")
    val r = df.as[Media.MediaRecord].head()
    r.payload.toSeq shouldBe "abc".getBytes("UTF-8").toSeq
    r.uri shouldBe "synthetic://7"
  }
}
