package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The decode kernel is a clearly-marked STUB (no media codecs in this
  * environment): it derives deterministic dimensions and a byte-histogram
  * feature vector from the payload. Everything AROUND the kernel is the
  * real production plumbing — schema, typed Datasets, per-partition batch
  * processing (the JVM analog of `mapInPandas` Arrow batches: one
  * iterator per partition, scratch buffers reused across records, no
  * per-row JNI/codec setup), and narrow, spill-free transformations.
  *
  * Scale: payloads never leave their partition (decode/resize/sample are
  * maps); only extracted features/metadata — a few hundred bytes per
  * record — flow into joins or ANN stages downstream.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      source: String)

  final case class DecodedMedia(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      features: Array[Float])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_bytes: Array[Byte])

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes of
    * the text (a deterministic fake), kind round-robins by doc_id. The
    * production equivalent reads (path, bytes) from object storage with
    * `binaryFile` or a manifest join.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        col("source"))
      .as[MediaRecord]
  }

  /** Decode a partition of media records.
    *
    * STUB KERNEL: a real implementation hands `r.bytes` to an image/audio
    * codec (e.g. via a JNI batch call) right where `fakeDims`/`histogram`
    * run. The deterministic fake keeps the contract testable: dims are a
    * pure function of payload length, features a normalized 16-bin byte
    * histogram.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition (per-batch) scratch state — allocated once, like a
      // codec context or an Arrow batch buffer.
      val hist = new Array[Long](16)
      it.map { r =>
        val n = r.bytes.length.toLong
        val (w, h) = fakeDims(n)
        java.util.Arrays.fill(hist, 0L)
        var i = 0
        while (i < r.bytes.length) {
          hist((r.bytes(i) & 0xff) >> 4) += 1
          i += 1
        }
        val feats = new Array[Float](16)
        var j = 0
        while (j < 16) {
          feats(j) = if (n == 0) 0f else hist(j).toFloat / n
          j += 1
        }
        DecodedMedia(r.media_id, r.kind, w, h, n, feats)
      }
    }
  }

  /** Deterministic fake dimensions: pure function of payload size. */
  def fakeDims(nBytes: Long): (Int, Int) =
    (16 + (nBytes % 64).toInt, 16 + ((nBytes / 64) % 64).toInt)

  final case class HashedMedia(media_id: Long, ahash: Int)

  /** Average-hash (aHash) perceptual fingerprint over the payload: split
    * the byte stream into 16 equal segments (the stand-ins for pixel
    * blocks; a real kernel hashes the decoded, downscaled luma plane)
    * and set bit b when segment b's mean byte exceeds the whole-payload
    * mean. The compare is EXACT integer arithmetic — `seg_sum * n >
    * total * seg_len` — so no float rounding can flip a bit between
    * engines or platforms. Narrow map: payloads never leave their
    * partition; only the 4-byte hash flows downstream into the
    * near-dup join.
    */
  def perceptualHash(media: Dataset[MediaRecord]): Dataset[HashedMedia] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val bs = r.bytes
      val n = bs.length
      var total = 0L
      var i = 0
      while (i < n) { total += (bs(i) & 0xff); i += 1 }
      var h = 0
      var b = 0
      while (b < 16) {
        val lo = (b.toLong * n / 16).toInt
        val hi = ((b + 1).toLong * n / 16).toInt
        var s = 0L
        var j = lo
        while (j < hi) { s += (bs(j) & 0xff); j += 1 }
        if (s * n > total * (hi - lo)) h |= 1 << b
        b += 1
      }
      HashedMedia(r.media_id, h)
    }
  }

  /** "Resize": metadata transform + deterministic payload truncation —
    * stands in for a real scaling kernel; stays a narrow map.
    */
  def resize(decoded: Dataset[DecodedMedia], w: Int, h: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map(d => d.copy(width = w, height = h))
  }

  /** Frame sampling for video payloads: every `stride`-th 64-byte chunk
    * becomes a "frame" — the real kernel would pull keyframes from a
    * container format. flatMap keeps it a narrow op; fan-out is bounded
    * by payload size / (64 * stride).
    */
  def frameSample(media: Dataset[MediaRecord], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.bytes.grouped(64).zipWithIndex
        .collect { case (chunk, idx) if idx % stride == 0 =>
          Frame(r.media_id, idx, chunk)
        }
    }
  }
}
