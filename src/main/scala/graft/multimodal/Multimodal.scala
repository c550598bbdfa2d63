package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The image decode kernel is REAL for the formats the JDK ships codecs
  * for (PNG/GIF/BMP/JPEG via `javax.imageio` — zero external deps):
  * payloads that sniff as one of those magic numbers are decoded to
  * true dimensions and a 16-bin luma histogram of the actual pixels.
  * The audio kernel ([[audioWindows]]) is likewise REAL for RIFF/WAVE
  * PCM via `javax.sound.sampled.AudioSystem`. Payloads that don't
  * sniff as a JDK-decodable format — compressed audio and video
  * containers, which the JDK has no codecs for, and corrupt or
  * truncated bytes — fall back to the clearly-marked byte-level
  * STAND-IN (deterministic dims from payload length + byte histogram)
  * rather than erroring, the standard poison-row posture for a 100 TB
  * ingest. Everything around the kernel is the real production
  * plumbing — schema, typed Datasets, per-partition batch processing
  * (the JVM analog of `mapInPandas` Arrow batches: one iterator per
  * partition, scratch buffers reused across records, ImageIO disk
  * cache off so decode never touches executor-local tmp), and narrow,
  * spill-free transformations.
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

  /** True iff the payload starts with a magic number of a format the
    * JDK's ImageIO ships a decoder for: PNG, GIF (87a/89a), BMP, JPEG.
    */
  def sniffsAsJdkImage(bs: Array[Byte]): Boolean = {
    def at(i: Int) = if (i < bs.length) bs(i) & 0xff else -1
    (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') ||
    (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') ||
    (at(0) == 'B' && at(1) == 'M') ||
    (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff)
  }

  /** Decode a partition of media records.
    *
    * REAL KERNEL for JDK image formats: payloads sniffing as
    * PNG/GIF/BMP/JPEG go through `javax.imageio.ImageIO` — dims are the
    * decoded image's, features a normalized 16-bin histogram of pixel
    * luma (single-band non-indexed rasters read raw samples, so a
    * grayscale PNG roundtrips bit-exactly; everything else goes through
    * sRGB getRGB with integer (r+g+b)/3 luma).
    *
    * STAND-IN for everything else (audio/video containers — no JDK
    * codecs — and corrupt/undecodable image bytes): deterministic dims
    * as a pure function of payload length (`fakeDims`) and a normalized
    * 16-bin byte histogram. Corrupt rows degrade to the stand-in
    * instead of failing the task — at 10^9 scraped images a poison row
    * must never kill a 10-hour stage.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition (per-batch) scratch state — allocated once, like a
      // codec context or an Arrow batch buffer. ImageIO's disk cache is
      // off: decode stays in-memory, no executor tmp-file churn.
      javax.imageio.ImageIO.setUseCache(false)
      val hist = new Array[Long](16)
      def feats(n: Long): Array[Float] = {
        val out = new Array[Float](16)
        var j = 0
        while (j < 16) {
          out(j) = if (n == 0) 0f else hist(j).toFloat / n
          j += 1
        }
        out
      }
      it.map { r =>
        val n = r.bytes.length.toLong
        val img =
          if (sniffsAsJdkImage(r.bytes)) {
            // catch NonFatal, not just IOException: crafted chunk
            // headers can surface as runtime exceptions inside the
            // codec, and a poison row must degrade, not kill the stage
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          } else None
        img match {
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            java.util.Arrays.fill(hist, 0L)
            val raster = im.getRaster
            val raw = raster.getNumBands == 1 &&
              !im.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val luma =
                  if (raw) raster.getSample(x, y, 0)
                  else {
                    val rgb = im.getRGB(x, y)
                    (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                      + (rgb & 0xff)) / 3
                  }
                hist(luma >> 4) += 1
                x += 1
              }
              y += 1
            }
            DecodedMedia(r.media_id, r.kind, w, h, n,
              feats(w.toLong * h.toLong))
          case None =>
            val (w, h) = fakeDims(n)
            java.util.Arrays.fill(hist, 0L)
            var i = 0
            while (i < r.bytes.length) {
              hist((r.bytes(i) & 0xff) >> 4) += 1
              i += 1
            }
            DecodedMedia(r.media_id, r.kind, w, h, n, feats(n))
        }
      }
    }
  }

  /** Deterministic stand-in dimensions: pure function of payload size
    * (used only when the payload is not a JDK-decodable image).
    */
  def fakeDims(nBytes: Long): (Int, Int) =
    (16 + (nBytes % 64).toInt, 16 + ((nBytes / 64) % 64).toInt)

  /** Encode a deterministic grayscale PNG: `w`×`h`, pixel (x,y) =
    * `(seed * 37 + x * 3 + y * 5) mod 256`. Pure function of (seed, w,
    * h) — the test/q187 fixture generator (PNG is lossless and the
    * decoder reads single-band rasters raw, so decode must recover
    * exactly these samples).
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = im.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          (((seed * 37 + x * 3 + y * 5) % 256 + 256) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Audio: REAL PCM decode for the container the JDK ships a parser
  // for (RIFF/WAVE via `javax.sound.sampled.AudioSystem` — zero
  // external deps), the same move that made the image kernel real.
  // Non-WAV audio payloads (MP3/AAC/OGG — no JDK codec) fall back to
  // the clearly-marked byte-proxy stand-in, the poison-row posture of
  // `decode`.
  // ------------------------------------------------------------------

  final case class AudioWindow(
      media_id: Long,
      widx: Int,
      n_samples: Int,
      sumsq: Long, // Σ sample² over the window — exact integer
      decoded: Boolean) // true = real PCM path, false = byte proxy

  /** True iff the payload carries a RIFF/WAVE container header. */
  def sniffsAsWav(bs: Array[Byte]): Boolean =
    bs.length >= 12 &&
      bs(0) == 'R' && bs(1) == 'I' && bs(2) == 'F' && bs(3) == 'F' &&
      bs(8) == 'W' && bs(9) == 'A' && bs(10) == 'V' && bs(11) == 'E'

  /** Decode a WAV payload to its 16-bit mono PCM samples via the JDK's
    * `AudioSystem`. Returns None when the payload is not WAV, the
    * format is not 16-bit mono PCM, or the header itself is corrupt —
    * callers degrade to the byte proxy. A payload TRUNCATED inside the
    * data chunk decodes the full frames that survive (the header's
    * declared length is a promise the stream no longer keeps; a
    * trailing partial frame is dropped) — at 10^9 scraped clips a
    * poison row must never kill the stage.
    */
  def pcmSamples(bs: Array[Byte]): Option[Array[Int]] =
    if (!sniffsAsWav(bs)) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bs))
        try {
          val fmt = in.getFormat
          val pcm16mono =
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          if (!pcm16mono) None
          else {
            val data = in.readAllBytes()
            val n = data.length / 2 // partial trailing frame dropped
            val out = new Array[Int](n)
            var i = 0
            while (i < n) {
              val b0 = data(2 * i) & 0xff
              val b1 = data(2 * i + 1) & 0xff
              out(i) =
                (if (fmt.isBigEndian) (b0 << 8) | b1
                 else (b1 << 8) | b0).toShort.toInt
              i += 1
            }
            Some(out)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Windowed audio energy over the audio subset: decode each payload
    * to PCM samples (REAL `AudioSystem` kernel for WAV; byte-proxy
    * sample = `(byte & 0xff) - 100` for containers the JDK can't
    * decode), group into `win`-sample windows, and emit the EXACT
    * integer sum of squared samples per window — RMS and thresholds
    * are then plain SQL over scalars. Narrow flatMap: payloads never
    * leave their partition; fan-out is bounded by samples/win.
    */
  def audioWindows(media: Dataset[MediaRecord],
      win: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").flatMap { r =>
      val pcm = pcmSamples(r.bytes)
      val samples = pcm.getOrElse(r.bytes.map(b => (b & 0xff) - 100))
      val real = pcm.isDefined
      samples.grouped(win).zipWithIndex.map { case (w, idx) =>
        var sq = 0L
        var j = 0
        while (j < w.length) { sq += w(j).toLong * w(j); j += 1 }
        AudioWindow(r.media_id, idx, w.length, sq, real)
      }
    }
  }

  /** Encode a deterministic 16-bit mono PCM WAV at 8 kHz: sample i =
    * [[sample16]](seed, i). Pure function of (seed, nSamples) — the
    * test/q215 fixture generator (WAV PCM is lossless, so
    * [[pcmSamples]] must recover exactly these values). The 44-byte
    * canonical RIFF header is hand-rolled so the bytes are a pure
    * function too.
    */
  def syntheticWav(seed: Long, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(16000) // sample rate, byte rate
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { bb.putShort(sample16(seed, i).toShort); i += 1 }
    bb.array()
  }

  /** Deterministic PCM sample i of stream `seed`: a gated arithmetic
    * wave — `(((seed·31 + i·7) mod 201) − 100) · 50`, muted to 0 in
    * 64-sample block b = i/64 when `(seed+b) mod 3 = 0` or
    * `(seed+b) mod 5 = 0` (the two-modulus sieve makes silence gaps —
    * and therefore voice-activity run lengths — vary per stream and
    * position). Pure nonnegative-integer arithmetic, restated verbatim
    * in q215's DuckDB oracle.
    */
  def sample16(seed: Long, i: Int): Int = {
    val b = seed + i / 64
    if (b % 3 == 0 || b % 5 == 0) 0
    else ((((seed * 31 + i.toLong * 7) % 201) - 100) * 50).toInt
  }

  // ------------------------------------------------------------------
  // Video: REAL multi-frame decode for the one moving-picture container
  // the JDK ships a codec for — animated GIF via ImageIO's GIF reader
  // (`ImageReader.read(i)` per frame; zero external deps). The same
  // move that made images (q187) and audio (q215) real: true video
  // containers (MP4/WebM — no JDK codec) keep the byte-proxy
  // stand-in, GIF payloads decode ACTUAL frames.
  // ------------------------------------------------------------------

  final case class VideoFrame(
      media_id: Long,
      frame_idx: Int,
      mean_luma: Double, // Σ luma / (w·h); the sum is exact integer
      decoded: Boolean) // true = real GIF frame, false = byte proxy

  /** True iff the payload carries a GIF87a/GIF89a header. */
  def sniffsAsGif(bs: Array[Byte]): Boolean = {
    def at(i: Int) = if (i < bs.length) bs(i) & 0xff else -1
    at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8' &&
      (at(4) == '7' || at(4) == '9') && at(5) == 'a'
  }

  /** Decode every frame of a GIF payload to its mean luma (Σ luma over
    * the frame raster, divided by the pixel count — the sum is exact
    * integer so the double mean is a deterministic function of the
    * pixels). Frames read SEQUENTIALLY until the reader runs out: a
    * payload TRUNCATED mid-stream yields the frames that survive (the
    * WAV truncation posture — a poison row degrades, never kills the
    * stage); a payload with no decodable frame, or no GIF header at
    * all, returns None and callers fall back to the byte proxy.
    */
  def gifFrameLumas(bs: Array[Byte]): Option[Array[Double]] =
    if (!sniffsAsGif(bs)) None
    else
      try {
        javax.imageio.ImageIO.setUseCache(false)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bs))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false (frames re-readable), ignoreMetadata
            reader.setInput(iis, false, true)
            val out = scala.collection.mutable.ArrayBuffer.empty[Double]
            var i = 0
            var done = false
            while (!done) {
              val im =
                try Option(reader.read(i))
                catch { case scala.util.control.NonFatal(_) => None }
              im match {
                case Some(frame) =>
                  val w = frame.getWidth
                  val h = frame.getHeight
                  var s = 0L
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = frame.getRGB(x, y)
                      s += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff)
                        + (rgb & 0xff)) / 3
                      x += 1
                    }
                    y += 1
                  }
                  out += s.toDouble / (w.toLong * h.toLong)
                  i += 1
                case None => done = true
              }
            }
            if (out.isEmpty) None else Some(out.toArray)
          } finally { reader.dispose(); iis.close() }
        }
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame mean luminance over the video subset: REAL multi-frame
    * ImageIO decode for GIF payloads; byte-proxy frames (64-byte
    * chunks' mean byte) for containers the JDK can't decode. Narrow
    * flatMap — payloads never leave their partition, only (frame_idx,
    * mean) scalars flow downstream into the shot-boundary stage.
    */
  def videoFrames(media: Dataset[MediaRecord]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      gifFrameLumas(r.bytes) match {
        case Some(ls) =>
          ls.iterator.zipWithIndex.map { case (m, i) =>
            VideoFrame(r.media_id, i, m, decoded = true)
          }
        case None =>
          r.bytes.grouped(64).zipWithIndex.map { case (c, i) =>
            var s = 0L
            var j = 0
            while (j < c.length) { s += (c(j) & 0xff); j += 1 }
            VideoFrame(r.media_id, i, s.toDouble / c.length,
              decoded = false)
          }
      }
    }
  }

  /** Frame f's luma at (x, y) for the synthetic GIF fixture: base
    * pattern `(seed·37 + x·3 + y·5) mod 256`, shifted by +128 (mod
    * 256) on every third frame — the shift moves the frame MEAN, so
    * shot boundaries land exactly at the f mod 3 transitions. Pure
    * nonnegative-integer arithmetic, restated verbatim in q226's
    * DuckDB oracle.
    */
  def gifLuma(seed: Long, f: Int, x: Int, y: Int): Int =
    ((((seed * 37 + x * 3 + y * 5) % 256)
      + (if (f % 3 == 0) 128 else 0)) % 256).toInt

  /** Encode a deterministic animated GIF: `nFrames` full-size frames of
    * `w`×`h`, frame f's pixel (x,y) = [[gifLuma]](seed, f, x, y), on an
    * explicit 256-gray palette (so the indexed encode is lossless and
    * [[gifFrameLumas]] must recover exactly these values — the
    * q187/q215 fixture recipe applied to multi-frame video).
    */
  def syntheticGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      // interlace OFF: the JDK's GIF writer drops rows of interlaced
      // images at some (w, h) shapes (rows come back zeroed/shifted —
      // observed at 5×3, 6×4, 9×2...), and interlaced default is what
      // you get with a null param. Non-progressive output roundtrips
      // every shape exactly.
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        val raster = im.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, gifLuma(seed, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(im, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

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
  def frameSample(media: Dataset[MediaRecord], stride: Int): Dataset[Frame] =
    chunks(media, "video", 64, stride)

  /** Fixed-size payload chunking in the typed kernel — the byte-level
    * framing primitive behind [[frameSample]] (video frames; audio
    * windowing goes through [[audioWindows]], which frames decoded PCM
    * samples instead of raw bytes): chunk index is over ALL chunks,
    * then the stride filter applies, so a stride change never
    * renumbers the survivors.
    * Payloads stay partition-local; downstream ships per-chunk scalars.
    */
  def chunks(media: Dataset[MediaRecord], kind: String, size: Int,
      stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    val k = kind
    media.filter(_.kind == k).flatMap { r =>
      r.bytes.grouped(size).zipWithIndex
        .collect { case (chunk, idx) if idx % stride == 0 =>
          Frame(r.media_id, idx, chunk)
        }
    }
  }
}
