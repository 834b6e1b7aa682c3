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

  /** Hand-rolled AVI container (independent byte-level construction —
    * the codec must not be validated against bytes it wrote itself).
    * Frames are either raw bottom-up BGR DIB rows ('00db') or
    * caller-supplied JPEG bytes ('00dc', compression 'MJPG').
    */
  private def aviBytes(
      w: Int, h: Int, frames: Seq[Array[Byte]], mjpg: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children)
    // BITMAPINFOHEADER: biSize, biWidth, biHeight, planes+bpp,
    // biCompression ('MJPG' or 0), biSizeImage, 4 trailing fields
    val strf = chunk(
      "strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le32(1 | (24 << 16)) ++
        (if (mjpg) "MJPG".getBytes("US-ASCII") else le32(0)) ++
        le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk(
      "strh",
      "vids".getBytes("US-ASCII") ++
        (if (mjpg) "MJPG".getBytes("US-ASCII") else le32(0)) ++
        Array.fill(48)(0.toByte))
    val avih = chunk("avih", le32(33333) ++ Array.fill(12)(0.toByte) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(w) ++ le32(h) ++
      Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list(
      "movi",
      frames.flatMap(f => chunk(if (mjpg) "00dc" else "00db", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  /** One bottom-up padded BGR DIB frame of a solid (r, g, b) color. */
  private def dibFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      out(y * rowBytes + x * 3) = b.toByte
      out(y * rowBytes + x * 3 + 1) = g.toByte
      out(y * rowBytes + x * 3 + 2) = r.toByte
    }
    out
  }

  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AviCodec decodes an uncompressed DIB AVI: geometry, frame count, exact mean") {
    // 6x4, 3 solid frames: (30,60,90), (120,120,120), (0,0,255)
    val avi = aviBytes(6, 4, Seq(
      dibFrame(6, 4, 30, 60, 90), dibFrame(6, 4, 120, 120, 120), dibFrame(6, 4, 0, 0, 255)), mjpg = false)
    val ds = Seq(Media.MediaRecord(30L, "video", "synthetic://30", avi)).toDS()
    val f = Media.decodeFeatures(ds, () => Media.JdkCodec).head()
    f.width shouldBe 6
    f.height shouldBe 4
    f.channels shouldBe 3 // decoded frame count
    // mean over all pixels of all frames: (60 + 120 + 85) / 3
    f.meanIntensity shouldBe ((60.0 + 120.0 + 85.0) / 3) +- 1e-12
  }

  test("AviCodec decodes an MJPEG AVI through the partition-batched stage") {
    val avi = aviBytes(16, 8, Seq(
      jpegFrame(16, 8, 0x808080), jpegFrame(16, 8, 0x808080)), mjpg = true)
    val ds = Seq(Media.MediaRecord(31L, "video", "synthetic://31", avi)).toDS()
    val f = Media.decodeFeatures(ds, () => Media.JdkCodec).head()
    f.width shouldBe 16
    f.height shouldBe 8
    f.channels shouldBe 2
    // JPEG is lossy: a solid 0x80 frame round-trips near 128
    f.meanIntensity shouldBe 128.0 +- 3.0
  }

  test("AviCodec handles an audio-first multi-stream AVI (strf gated on strh fccType)") {
    // hand-build: RIFF(AVI (hdrl: avih + strl[auds: strh+WAVEFORMATEX strf]
    //                        + strl[vids: strh+BITMAPINFOHEADER strf]) + movi)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ children)
    val audStrh = chunk("strh", "auds".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte))
    // 16-byte WAVEFORMATEX: would crash (or misparse as 44100-wide
    // video) if strf weren't gated on the owning strh's fccType
    val audStrf = chunk("strf", le32(1 | (1 << 16)) ++ le32(44100) ++ le32(88200) ++ le32(2 | (16 << 16)))
    val vidStrh = chunk("strh", "vids".getBytes("US-ASCII") ++ Array.fill(52)(0.toByte))
    val vidStrf = chunk("strf",
      le32(40) ++ le32(4) ++ le32(2) ++ le32(1 | (24 << 16)) ++ le32(0) ++
        le32(4 * 2 * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val avih = chunk("avih", Array.fill(56)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", audStrh ++ audStrf) ++ list("strl", vidStrh ++ vidStrf))
    val movi = list("movi", chunk("00db", dibFrame(4, 2, 10, 20, 30)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val (w, h, frames, mean) = Media.AviCodec.decode(avi, "video")
    w shouldBe 4
    h shouldBe 2
    frames shouldBe 1
    mean shouldBe 20.0 +- 1e-12
  }

  test("AviCodec refuses DIB frames arriving before any video strf (no fabricated geometry)") {
    // an AVI whose hdrl is missing entirely: frames must not silently
    // decode as 0x0 with intensity 0.0
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++ chunk("00db", Array.fill(24)(7.toByte)))
    val body = "AVI ".getBytes("US-ASCII") ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val e = intercept[IllegalArgumentException](Media.AviCodec.decode(avi, "video"))
    e.getMessage should include("strf")
  }

  test("AviCodec rejects corrupt strf geometry at the header (negative / overflow-sized)") {
    // a negative biWidth (or one that overflows width*3 in Int) would
    // make the DIB rowBytes arithmetic wrap and read header bytes as
    // pixels — the codec must refuse at the strf, before any frame
    val junkFrame = Array.fill(64)(7.toByte)
    for (badW <- Seq(-6, 0, 0x40000000)) {
      val e = intercept[IllegalArgumentException](
        Media.AviCodec.decode(aviBytes(badW, 4, Seq(junkFrame), mjpg = false), "video"))
      e.getMessage should include("geometry")
    }
  }

  test("AviCodec fails loudly on non-AVI bytes and on unsupported compression") {
    val bad = Seq(Media.MediaRecord(32L, "video", "synthetic://32", Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(bad, () => Media.AviCodec).collect()
    }
    e.getMessage should include("RIFF")
    // an honest container whose stream claims H264 must refuse, not fake
    val h264 = aviBytes(4, 4, Seq(dibFrame(4, 4, 1, 2, 3)), mjpg = false)
    // corrupt the strf compression field to 'H264' and retag frames '00dc'
    val idx = h264.indexOfSlice("strf".getBytes("US-ASCII"))
    val compOff = idx + 8 + 16
    Array('H', '2', '6', '4').map(_.toByte).copyToArray(h264, compOff)
    val dcIdx = h264.indexOfSlice("00db".getBytes("US-ASCII"))
    Array('0', '0', 'd', 'c').map(_.toByte).copyToArray(h264, dcIdx)
    val ds2 = Seq(Media.MediaRecord(33L, "video", "synthetic://33", h264)).toDS()
    val e2 = intercept[org.apache.spark.SparkException] {
      Media.decodeFeatures(ds2, () => Media.AviCodec).collect()
    }
    e2.getMessage should include("H264")
  }

  test("fromText builds the canonical binary media schema") {
    val df = Media.fromText(Seq((7L, "abc")).toDF("doc_id", "text"), "doc_id", "text", "image")
    df.columns.toSeq shouldBe Seq("mediaId", "kind", "uri", "payload")
    val r = df.as[Media.MediaRecord].head()
    r.payload.toSeq shouldBe "abc".getBytes("UTF-8").toSeq
    r.uri shouldBe "synthetic://7"
  }
}
