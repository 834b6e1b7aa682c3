package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract stages.
  *
  * The Spark-side plumbing is real and tested — schema, partition-wise
  * batched processing, stage signatures. Two codec implementations sit
  * behind the seam: [[Media.ImageIoCodec]]/[[Media.ImageIoResizer]]
  * (real PNG/BMP/GIF/JPEG decode + bilinear resize via the JDK's
  * `javax.imageio`, no external libraries) and
  * [[Media.FakeCodec]]/[[Media.FakeResizer]] (deterministic synthetic
  * fixtures for payloads that are not real containers — and the codec
  * q50's cross-engine oracle replays, since DuckDB cannot decode
  * PNGs), plus [[Media.WavCodec]] (real PCM WAV/AIFF/AU decode via the
  * JDK's `javax.sound.sampled`: frames, sample rate, channels, RMS)
  * [[Media.AviCodec]] (real pure-JVM AVI parse: MJPEG frames via
  * `javax.imageio`, uncompressed DIB frames directly), and
  * [[Media.JdkCodec]] dispatching image/audio/video to the real
  * codecs. Modern video codecs (H.264/VP9/AV1) need a JNI/ffmpeg
  * decoder that drops into the same trait with nothing else changing.
  *
  * Scale design: decode runs as `mapPartitions` over the binary column
  * — one codec instance per partition (amortized init, the same shape
  * as a pandas-UDF batch), no driver involvement, and the binary
  * payload is projected out as early as possible so only the narrow
  * feature columns shuffle.
  */
object Media {

  /** Typed metadata accompanying every media payload. */
  case class MediaMeta(mediaId: Long, kind: String, uri: String, sizeBytes: Long)

  case class MediaRecord(mediaId: Long, kind: String, uri: String, payload: Array[Byte])

  /** Decoded-frame features: what a real image/audio decode would emit. */
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      meanIntensity: Double,
      payloadBytes: Long
  )

  /** The codec seam. A real implementation wraps e.g. libjpeg/ffmpeg.
    * Stages take a FACTORY, invoked once per partition on the executor,
    * so the codec instance itself (native handles, JNI state) is never
    * serialized — only the small factory closure ships with the task.
    */
  trait Codec {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int, Double)
  }

  /** STUB codec: deterministic fake decode so the pipeline shape is
    * testable without media libraries. "Dimensions" derive from payload
    * length, "intensity" from a byte sum — stable across runs/engines.
    */
  object FakeCodec extends Codec {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int, Double) = {
      val n = payload.length
      val width = math.max(1, n % 1024)
      val height = math.max(1, (n / 1024) % 1024)
      val channels = if (kind == "audio") 1 else 3
      var sum = 0L
      var i = 0
      while (i < n) { sum += payload(i) & 0xff; i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      (width, height, channels, mean)
    }
  }

  /** Real JDK-backed image codec — `javax.imageio` ships with the JVM,
    * so PNG/BMP/GIF/JPEG decode needs no external libraries. `kind ==
    * "image"` payloads must be a readable container: decode failures
    * are LOUD (a corrupt corpus should fail the task and surface in
    * Spark's task error, not silently emit fake features). Other kinds
    * (audio/video chunks) fall back to [[FakeCodec]]'s deterministic
    * shape so mixed media tables keep flowing through one stage.
    *
    * meanIntensity = mean over all pixels of (R+G+B)/3 from the sRGB
    * view — integer byte sums divided once, so it is deterministic
    * across partitionings.
    */
  object ImageIoCodec extends Codec {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int, Double) =
      if (kind != "image") FakeCodec.decode(payload, kind)
      else {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        require(img != null, s"undecodable image payload (${payload.length} bytes)")
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB view regardless of storage
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val mean = if (w == 0 || h == 0) 0.0 else sum.toDouble / (w.toLong * h * 3L)
        (w, h, channels, mean)
      }
  }

  /** Real JDK-backed audio codec — `javax.sound.sampled` ships with the
    * JVM, so WAV/AIFF/AU PCM decode needs no external libraries. For
    * `kind == "audio"` the [[Codec]] tuple is mapped as:
    *
    *   - width    → frame count (so width / height = duration in s)
    *   - height   → sample rate in Hz
    *   - channels → channel count
    *   - meanIntensity → RMS amplitude normalized to [0, 1]
    *
    * Decode failures are LOUD, same policy as [[ImageIoCodec]]: a
    * corrupt corpus should fail the task, not silently emit fake
    * features. Non-audio kinds fall back to [[FakeCodec]].
    */
  object WavCodec extends Codec {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int, Double) =
      if (kind != "audio") FakeCodec.decode(payload, kind)
      else {
        val in =
          try
            javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
          catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              throw new IllegalArgumentException(
                s"undecodable audio payload (${payload.length} bytes)", e)
          }
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          require(
            enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
            s"unsupported audio encoding $enc (PCM only)")
          val bits = fmt.getSampleSizeInBits
          require(bits == 8 || bits == 16, s"unsupported sample size $bits (8/16-bit PCM only)")
          val frames = in.getFrameLength
          require(frames >= 0 && frames <= Int.MaxValue, s"frame count $frames out of range")
          val bytes = in.readAllBytes()
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          var sumSq = 0.0
          var n = 0
          if (bits == 8) {
            var i = 0
            while (i < bytes.length) {
              // 8-bit WAV convention is unsigned; normalize to [-1, 1)
              val v =
                if (signed) bytes(i).toDouble / 128.0
                else ((bytes(i) & 0xff) - 128).toDouble / 128.0
              sumSq += v * v
              n += 1
              i += 1
            }
          } else {
            val big = fmt.isBigEndian
            var i = 0
            while (i + 1 < bytes.length) {
              val lo = bytes(if (big) i + 1 else i) & 0xff
              val hi = bytes(if (big) i else i + 1)
              val raw = (hi << 8) | lo
              val v =
                if (signed) raw.toDouble / 32768.0
                else (((raw & 0xffff) - 32768)).toDouble / 32768.0
              sumSq += v * v
              n += 1
              i += 2
            }
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          (frames.toInt, fmt.getSampleRate.toInt, fmt.getChannels, rms)
        } finally in.close()
      }
  }

  /** Real pure-JVM video codec for AVI (RIFF) containers — the two
    * stream formats decodable without ffmpeg/JNI: MJPEG ('MJPG'
    * handler / '00dc' chunks, each frame an ordinary JPEG handed to
    * `javax.imageio`) and uncompressed bottom-up BGR DIB
    * (biCompression=0 / '00db' chunks). That covers the classic
    * offline interchange forms; anything else (H.264 etc.) needs a
    * native decoder and fails LOUDLY, same policy as the other real
    * codecs. For `kind == "video"` the [[Codec]] tuple is mapped as:
    *
    *   - width / height → pixel geometry from the BITMAPINFOHEADER
    *   - channels       → DECODED FRAME COUNT (the video analog of
    *                      [[WavCodec]] mapping width → audio frames)
    *   - meanIntensity  → mean (R+G+B)/3 over every pixel of every
    *                      decoded frame (integer sums, one division)
    *
    * Container parsing is a plain RIFF chunk walk (fourcc + LE size +
    * even padding; LIST chunks recurse) — AVI structure is public
    * format knowledge, ~60 lines, no dependencies. Non-video kinds
    * fall back to [[FakeCodec]].
    */
  object AviCodec extends Codec {
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(payload: Array[Byte], kind: String): (Int, Int, Int, Double) =
      if (kind != "video") FakeCodec.decode(payload, kind)
      else {
        require(
          payload.length >= 12 && fourcc(payload, 0) == "RIFF" && fourcc(payload, 8) == "AVI ",
          s"undecodable video payload (${payload.length} bytes): not a RIFF/AVI container")
        var width = 0
        var height = 0
        var compression = "" // '\0\0\0\0' ↦ "" for biCompression = 0
        var frames = 0
        var pixSum = 0L
        var pixCount = 0L
        // multi-stream AVIs interleave strl lists (audio first is
        // legal); a strf only describes video when its stream's strh
        // said fccType 'vids' — an audio strf is a WAVEFORMATEX whose
        // bytes would otherwise misparse as geometry
        var lastStreamType = ""

        def decodeJpegFrame(b: Array[Byte], off: Int, len: Int): Unit = {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(b, off, len))
          require(img != null, s"undecodable MJPEG frame ($len bytes)")
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              pixSum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          pixCount += img.getWidth.toLong * img.getHeight * 3L
          frames += 1
        }

        def decodeDibFrame(b: Array[Byte], off: Int, len: Int): Unit = {
          require(
            width > 0 && height > 0,
            "DIB frame before any video strf header (corrupt or truncated hdrl)")
          // bottom-up BGR rows, each padded to a 4-byte boundary
          val rowBytes = ((width * 3 + 3) / 4) * 4
          require(
            len >= rowBytes.toLong * height,
            s"DIB frame too short: $len bytes for ${width}x$height")
          var y = 0
          while (y < height) {
            val row = off + (height - 1 - y) * rowBytes
            var x = 0
            while (x < width) {
              val p = row + x * 3
              pixSum += (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          pixCount += width.toLong * height * 3L
          frames += 1
        }

        def walk(off0: Int, end: Int): Unit = {
          var off = off0
          while (off + 8 <= end) {
            val id = fourcc(payload, off)
            val size = le32(payload, off + 4)
            // bounds math in Long: a crafted size near Int.MaxValue
            // would wrap `off + 8 + size` negative and defeat the guard
            require(
              size >= 0 && off.toLong + 8L + size <= end,
              s"corrupt chunk $id at $off (size $size)")
            if (id == "LIST") {
              walk(off + 12, off + 8 + size) // skip the 4-byte list type
            } else if (id == "strh") {
              require(size >= 4, s"strh too short ($size bytes)")
              lastStreamType = fourcc(payload, off + 8)
            } else if (id == "strf" && lastStreamType == "vids" && width == 0) {
              // BITMAPINFOHEADER: biWidth @4, biHeight @8, biCompression @16
              require(size >= 20, s"video strf too short ($size bytes)")
              width = le32(payload, off + 8 + 4)
              height = math.abs(le32(payload, off + 8 + 8))
              // Fail loudly on corrupt geometry AT THE HEADER, not in
              // the frame loop: a negative biWidth (or one big enough
              // to overflow width*3 in Int) would make the DIB
              // rowBytes arithmetic wrap and index backwards from the
              // frame offset — in-bounds header bytes read as pixels,
              // a silently wrong meanIntensity. 1<<15 = 32768 px per
              // side is beyond any real AVI (8K video is 7680x4320)
              // and keeps every later Int product safe.
              require(
                width > 0 && width <= (1 << 15) && height > 0 && height <= (1 << 15),
                s"corrupt video strf geometry ${width}x$height")
              val comp = le32(payload, off + 8 + 16)
              compression = if (comp == 0) "" else fourcc(payload, off + 8 + 16)
            } else if (id.length == 4 && id.substring(2) == "dc") {
              require(
                compression == "MJPG",
                s"unsupported video compression '$compression' (MJPG or uncompressed DIB only)")
              if (size > 0) decodeJpegFrame(payload, off + 8, size)
            } else if (id.length == 4 && id.substring(2) == "db") {
              if (size > 0) decodeDibFrame(payload, off + 8, size)
            }
            off += 8 + size + (size & 1) // chunks pad to even offsets
          }
        }
        walk(12, math.min(payload.length, 8 + le32(payload, 4)))
        require(frames > 0, "AVI container holds no decodable video frames")
        val mean = if (pixCount == 0) 0.0 else pixSum.toDouble / pixCount
        (width, height, frames, mean)
      }
  }

  /** The all-real JDK dispatcher: image → [[ImageIoCodec]], audio →
    * [[WavCodec]], video → [[AviCodec]], anything else (unknown
    * kinds) → [[FakeCodec]]'s deterministic shape, so mixed media
    * tables flow through one stage. [[FakeCodec]] remains q50's
    * oracle codec — DuckDB can replay neither a PNG nor a WAV nor an
    * AVI decode.
    */
  object JdkCodec extends Codec {
    def decode(payload: Array[Byte], kind: String): (Int, Int, Int, Double) = kind match {
      case "image" => ImageIoCodec.decode(payload, kind)
      case "audio" => WavCodec.decode(payload, kind)
      case "video" => AviCodec.decode(payload, kind)
      case _ => FakeCodec.decode(payload, kind)
    }
  }

  /** Decode stage: binary payloads → typed features, batched per
    * partition with one codec instance each (the mapInPandas shape).
    */
  def decodeFeatures(
      records: Dataset[MediaRecord],
      codecFactory: () => Codec = () => FakeCodec
  ): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val codec = codecFactory() // one codec init per partition, executor-side
      it.map { r =>
        val (w, h, c, mean) = codec.decode(r.payload, r.kind)
        MediaFeatures(r.mediaId, r.kind, w, h, c, mean, r.payload.length.toLong)
      }
    }
  }

  /** Frame-sampling stage for video-like payloads: deterministic stride
    * sampling of `frames` chunks from the payload, each chunk becoming
    * its own decodable record — the flatMap shape of video → frames.
    */
  def sampleFrames(records: Dataset[MediaRecord], frames: Int, frameBytes: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    // Frame ids are mediaId*1000+idx; more than 1000 frames per record
    // would collide with the NEXT record's frame ids, corrupting every
    // downstream join on mediaId — enforce the scheme's bound loudly.
    require(
      frames >= 1 && frames <= 1000,
      s"frames must be in [1, 1000] (frame ids are mediaId*1000+idx), got $frames"
    )
    records.flatMap { r =>
      val n = r.payload.length
      if (n == 0) Iterator.empty
      else {
        val stride = math.max(1, n / frames)
        (0 until frames).iterator
          .map(_ * stride)
          .takeWhile(_ < n)
          .zipWithIndex
          .map { case (off, idx) =>
            r.copy(
              mediaId = r.mediaId * 1000 + idx,
              payload = r.payload.slice(off, math.min(n, off + frameBytes))
            )
          }
      }
    }
  }

  /** The resize seam: a real implementation wraps an image library's
    * scaler; the stub deterministically re-buckets the payload to the
    * byte budget a (w×h×channels) frame would occupy, so downstream
    * stages see correctly-shaped records.
    */
  trait Resizer {
    def resize(payload: Array[Byte], kind: String, w: Int, h: Int): Array[Byte]
  }

  object FakeResizer extends Resizer {
    def resize(payload: Array[Byte], kind: String, w: Int, h: Int): Array[Byte] = {
      val channels = if (kind == "audio") 1 else 3
      val target = w * h * channels
      if (payload.length >= target) payload.take(target)
      else {
        // repeat-pad deterministically to the target size
        val out = new Array[Byte](target)
        var i = 0
        while (i < target) { out(i) = if (payload.isEmpty) 0 else payload(i % payload.length); i += 1 }
        out
      }
    }
  }

  /** Real JDK-backed resizer: bilinear Java2D scale to w×h, re-encoded
    * as PNG (lossless, so resize → decode round-trips bit-exactly on a
    * given JVM). Non-image kinds fall back to [[FakeResizer]].
    */
  object ImageIoResizer extends Resizer {
    def resize(payload: Array[Byte], kind: String, w: Int, h: Int): Array[Byte] =
      if (kind != "image") FakeResizer.resize(payload, kind, w, h)
      else {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        require(src != null, s"undecodable image payload (${payload.length} bytes)")
        val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
  }

  /** Resize stage: normalize every payload to a target frame geometry
    * before feature extraction — the standard pre-processing step that
    * makes batch tensor shapes uniform. Same partition-batched shape as
    * [[decodeFeatures]]; payload size becomes O(w·h), so resize EARLY:
    * at 100 TB the shrunken payloads are what shuffle, not the originals.
    */
  def resizeTo(
      records: Dataset[MediaRecord],
      w: Int,
      h: Int,
      resizerFactory: () => Resizer = () => FakeResizer
  ): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val resizer = resizerFactory() // per-partition init, executor-side
      it.map(r => r.copy(payload = resizer.resize(r.payload, r.kind, w, h)))
    }
  }

  /** Build a media table from any DataFrame with an id and a string
    * column, treating the UTF-8 bytes as the opaque payload — the test
    * harness's stand-in for reading real media files.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("mediaId"),
      lit(kind).as("kind"),
      concat(lit("synthetic://"), col(idCol).cast("string")).as("uri"),
      encode(col(textCol), "UTF-8").as("payload")
    )
}
