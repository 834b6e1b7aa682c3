package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract stages.
  *
  * The Spark-side plumbing is real and tested — schema, partition-wise
  * batched processing, stage signatures; only the codec itself is a
  * STUB (`FakeCodec`), because media libraries are not available in
  * this environment. Swap `Codec` for a JNI/library-backed
  * implementation and nothing else changes.
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
