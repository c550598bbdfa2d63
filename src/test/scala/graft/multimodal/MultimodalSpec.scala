package graft.multimodal

import graft.TestSpark
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def media =
    mediaFromDocuments(spark.read.parquet(s"$dir/documents.parquet"))

  test("media table: binary payloads with kind metadata, all docs kept") {
    val rows = media.collect()
    assert(rows.length == 500)
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
    // payload is the UTF-8 text bytes — non-empty, deterministic id→kind
    assert(rows.forall(_.bytes.nonEmpty))
    assert(rows.forall(r =>
      r.kind == Seq("image", "audio", "video")((r.media_id % 3).toInt)))
  }

  test("decode: real ImageIO kernel recovers PNG dims and exact pixels") {
    import spark.implicits._
    // grayscale PNG roundtrip is lossless and the kernel reads
    // single-band rasters raw, so the 16-bin luma histogram must equal
    // the generator formula's bin counts exactly
    val fixtures = Seq((7L, 5, 3), (42L, 16, 16), (0L, 1, 1)).map {
      case (seed, w, h) =>
        MediaRecord(seed, "image", Multimodal.syntheticPng(seed, w, h), "t")
    }
    val decoded = decode(fixtures.toDS()).collect()
      .map(d => d.media_id -> d).toMap
    Seq((7L, 5, 3), (42L, 16, 16), (0L, 1, 1)).foreach { case (seed, w, h) =>
      val d = decoded(seed)
      assert((d.width, d.height) == (w, h), s"seed $seed: real dims")
      assert((d.width, d.height) != fakeDims(d.n_bytes)
        || w * h == 1, s"seed $seed: must not be the stand-in path")
      val counts = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w)
        counts((((seed * 37 + x * 3 + y * 5) % 256).toInt & 0xff) >> 4) += 1
      val npx = w.toLong * h
      d.features.zipWithIndex.foreach { case (f, j) =>
        assert(math.abs(f - counts(j).toFloat / npx) < 1e-6,
          s"seed $seed bin $j: luma histogram must match the generator")
      }
    }
  }

  test("decode: corrupt image bytes degrade to the stand-in, never throw") {
    import spark.implicits._
    val pngMagic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val corrupt = Seq(
      // PNG magic + garbage body: sniffs as image, ImageIO fails
      MediaRecord(1L, "image", pngMagic ++ Array.fill(64)(0x5a.toByte), "t"),
      // truncated real PNG: header parses, pixel data missing
      MediaRecord(2L, "image", Multimodal.syntheticPng(9L, 8, 8).take(40), "t"),
      // empty payload
      MediaRecord(3L, "image", Array.empty[Byte], "t"))
    val out = decode(corrupt.toDS()).collect().sortBy(_.media_id)
    assert(out.length == 3, "poison rows must survive decode")
    out.foreach { d =>
      assert((d.width, d.height) == fakeDims(d.n_bytes),
        s"media ${d.media_id}: corrupt bytes must take the stand-in path")
    }
  }

  test("decode: stub kernel is deterministic with the documented contract") {
    val d1 = decode(media).collect().sortBy(_.media_id)
    val d2 = decode(media).collect().sortBy(_.media_id)
    assert(d1.length == 500)
    d1.zip(d2).foreach { case (a, b) =>
      assert(a == b.copy(features = a.features) &&
        a.features.sameElements(b.features), "decode must be deterministic")
    }
    d1.foreach { d =>
      assert((d.width, d.height) == fakeDims(d.n_bytes))
      // histogram features: 16 bins, nonnegative, sums to 1
      assert(d.features.length == 16)
      assert(d.features.forall(_ >= 0f))
      assert(math.abs(d.features.sum - 1f) < 1e-3)
    }
  }

  test("resize rewrites metadata only") {
    val r = resize(decode(media), 224, 224).collect()
    assert(r.forall(d => d.width == 224 && d.height == 224))
    assert(r.map(_.n_bytes).sum == decode(media).collect().map(_.n_bytes).sum)
  }

  test("binaryFile source feeds the decode pipeline (production ingest path)") {
    import spark.implicits._
    // the real ingest: opaque payloads + path metadata from the FS
    val files = spark.read.format("binaryFile")
      .load(graft.TestSpark.resource("books") + "/*.txt")
      .select(col("path"), col("content"), col("length"))
    val media = files.as[(String, Array[Byte], Long)].map {
      case (path, bytes, _) =>
        Multimodal.MediaRecord(
          media_id = path.hashCode.toLong, kind = "image",
          bytes = bytes, source = path)
    }
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == 4) // the four book fixtures
    decoded.foreach { d =>
      assert(d.n_bytes > 0 && (d.width, d.height) == fakeDims(d.n_bytes))
    }
    // payload length from the source matches what decode saw
    val lens = files.select(col("length")).as[Long].collect().sorted
    assert(decoded.map(_.n_bytes).sorted.sameElements(lens))
  }

  test("perceptualHash: exact-integer bit rule, sequential oracle parity") {
    // crafted payload: 32 bytes, first half 0x10, second half 0x30 —
    // segments 0-7 sit below the mean (0x20), 8-15 above, so the hash
    // must be exactly 0xFF00
    import spark.implicits._
    val crafted = Seq(MediaRecord(1L,
      "image", Array.fill(16)(0x10.toByte) ++ Array.fill(16)(0x30.toByte),
      "t")).toDS()
    assert(perceptualHash(crafted).collect().head.ahash == 0xFF00)

    // whole corpus: distributed kernel == sequential restatement
    val dist = perceptualHash(media).collect()
      .map(h => h.media_id -> h.ahash).toMap
    media.collect().foreach { r =>
      val bs = r.bytes
      val n = bs.length
      val total = bs.map(b => (b & 0xff).toLong).sum
      var h = 0
      for (b <- 0 until 16) {
        val lo = (b.toLong * n / 16).toInt
        val hi = ((b + 1).toLong * n / 16).toInt
        val s = bs.slice(lo, hi).map(x => (x & 0xff).toLong).sum
        if (s * n > total * (hi - lo)) h |= 1 << b
      }
      assert(dist(r.media_id) == h, s"media ${r.media_id}")
    }
    // hashes must actually discriminate (not all equal / all distinct)
    val uniq = dist.values.toSet.size
    assert(uniq > 50, s"aHash collapsed: $uniq distinct of ${dist.size}")
  }

  test("frameSample emits every stride-th 64-byte chunk of videos only") {
    val frames = frameSample(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 2 == 0))
    val videos = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.bytes).toMap
    assert(frames.map(_.media_id).toSet == videos.keySet)
    frames.foreach { f =>
      val expected = videos(f.media_id)
        .slice(f.frame_idx * 64, f.frame_idx * 64 + 64)
      assert(f.frame_bytes.sameElements(expected))
    }
  }

  test("pcmSamples: real AudioSystem decode roundtrips syntheticWav exactly") {
    // WAV PCM is lossless: the decoded samples must equal the generator
    // formula bit-for-bit (a wrong endianness or a padded frame fails)
    Seq((7L, 100), (42L, 512), (0L, 1), (13L, 257)).foreach {
      case (seed, n) =>
        val wav = syntheticWav(seed, n)
        assert(sniffsAsWav(wav), s"seed $seed: header must sniff as WAV")
        val got = pcmSamples(wav)
        assert(got.isDefined, s"seed $seed: JDK must decode the fixture")
        val expect = (0 until n).map(i => sample16(seed, i)).toArray
        assert(got.get.sameElements(expect), s"seed $seed: PCM roundtrip")
    }
  }

  test("pcmSamples: truncated WAV decodes surviving full frames, never throws") {
    val wav = syntheticWav(9L, 64) // 44-byte header + 128 data bytes
    // cut inside the data chunk, mid-frame (odd byte count): the 10 full
    // frames before the cut survive, the partial 11th is dropped
    val cut = wav.take(44 + 21)
    assert(sniffsAsWav(cut))
    val got = pcmSamples(cut)
    assert(got.isDefined && got.get.length == 10)
    assert(got.get.sameElements((0 until 10).map(i => sample16(9L, i))))
    // cut inside the header itself: not decodable → None (callers
    // degrade to the byte proxy; nothing throws)
    assert(pcmSamples(wav.take(20)).isEmpty)
    assert(pcmSamples(Array.empty[Byte]).isEmpty)
  }

  test("audioWindows: real PCM path for WAV, byte proxy for the rest") {
    import spark.implicits._
    val rows = Seq(
      MediaRecord(1L, "audio", syntheticWav(1L, 70), "t"), // real path
      MediaRecord(2L, "audio", Array[Byte](10, 120, -56), "t"), // proxy
      MediaRecord(3L, "audio", syntheticWav(3L, 64).take(44 + 21), "t"),
      MediaRecord(4L, "video", syntheticWav(4L, 64), "t")) // wrong kind
    val wins = audioWindows(rows.toDS(), 32).collect()
      .groupBy(_.media_id)
    assert(!wins.contains(4L), "non-audio rows are out of scope")
    // real path: 70 samples → windows of 32/32/6, exact Σs² per window
    val w1 = wins(1L).sortBy(_.widx)
    assert(w1.map(_.n_samples).toSeq == Seq(32, 32, 6))
    assert(w1.forall(_.decoded))
    w1.foreach { w =>
      val expect = (w.widx * 32 until w.widx * 32 + w.n_samples)
        .map(i => sample16(1L, i).toLong).map(s => s * s).sum
      assert(w.sumsq == expect, s"window ${w.widx}")
    }
    // proxy path: sample = (byte & 0xff) - 100 → (-90)² + 20² + 100²
    val w2 = wins(2L)
    assert(w2.length == 1 && !w2.head.decoded)
    assert(w2.head.n_samples == 3 && w2.head.sumsq == 8100L + 400L + 10000L)
    // truncated WAV: the surviving 10 frames window up on the REAL path
    val w3 = wins(3L)
    assert(w3.length == 1 && w3.head.decoded && w3.head.n_samples == 10)
  }

  test("gifFrameLumas: real multi-frame ImageIO decode roundtrips " +
      "syntheticGif exactly") {
    // the 256-gray palette makes the indexed encode lossless, so each
    // decoded frame's mean luma must equal the generator formula's
    // exact integer sum / pixel count — a decoder that drops a frame,
    // merges deltas wrong, or quantizes the palette fails
    Seq((7L, 5, 3, 4), (42L, 16, 12, 7), (0L, 1, 1, 1), (13L, 9, 2, 6))
      .foreach { case (seed, w, h, nf) =>
        val gif = syntheticGif(seed, w, h, nf)
        assert(sniffsAsGif(gif), s"seed $seed: header must sniff as GIF")
        val got = gifFrameLumas(gif)
        assert(got.isDefined && got.get.length == nf,
          s"seed $seed: expected $nf frames, got ${got.map(_.length)}")
        (0 until nf).foreach { f =>
          val s = (for (y <- 0 until h; x <- 0 until w)
            yield gifLuma(seed, f, x, y).toLong).sum
          val want = s.toDouble / (w.toLong * h.toLong)
          assert(got.get(f) == want,
            s"seed $seed frame $f: got ${got.get(f)} want $want")
        }
      }
  }

  test("gifFrameLumas: truncated GIF yields the surviving frame prefix, " +
      "never throws") {
    // 32×32 frames so the frame data dominates the fixed ~781-byte
    // header + 256-gray global palette — a 3/5 cut then lands INSIDE
    // the frame stream (a cut inside the palette would yield zero
    // decodable frames, the separate None case below)
    val gif = syntheticGif(9L, 32, 32, 5)
    // cut mid-stream: the decodable prefix survives, the rest is
    // dropped (the WAV truncation posture)
    val cut = gif.take(gif.length * 3 / 5)
    assert(sniffsAsGif(cut))
    val got = gifFrameLumas(cut)
    assert(got.isDefined && got.get.nonEmpty && got.get.length < 5,
      s"expected a proper nonempty prefix, got ${got.map(_.length)}")
    // each surviving frame must still be exact
    got.get.zipWithIndex.foreach { case (m, f) =>
      val s = (for (y <- 0 until 32; x <- 0 until 32)
        yield gifLuma(9L, f, x, y).toLong).sum
      assert(m == s.toDouble / 1024)
    }
    // cut inside the header / empty: not decodable → None
    assert(gifFrameLumas(gif.take(4)).isEmpty)
    assert(gifFrameLumas(Array.empty[Byte]).isEmpty)
  }

  test("videoFrames: real GIF path for GIFs, byte proxy for the rest") {
    import spark.implicits._
    val rows = Seq(
      MediaRecord(1L, "video", syntheticGif(1L, 6, 4, 3), "t"), // real
      MediaRecord(2L, "video", Array[Byte](10, 120, -56, 7), "t"), // proxy
      MediaRecord(3L, "image", syntheticGif(3L, 6, 4, 3), "t")) // wrong kind
    val frames = videoFrames(rows.toDS()).collect().groupBy(_.media_id)
    assert(!frames.contains(3L), "non-video rows are out of scope")
    val real = frames(1L).sortBy(_.frame_idx)
    assert(real.length == 3 && real.forall(_.decoded))
    val proxy = frames(2L)
    assert(proxy.length == 1 && !proxy.head.decoded)
    // proxy mean byte: (10 + 120 + 200 + 7) / 4
    assert(proxy.head.mean_luma == (10 + 120 + 200 + 7) / 4.0)
  }

  test("chunks: stride-1 windows reassemble each payload exactly") {
    // byte-level framing: every byte appears in exactly one window, in
    // order — chunking loses and duplicates nothing
    val wins = chunks(media, "audio", 32, 1).collect()
      .groupBy(_.media_id)
    val audios = media.filter(_.kind == "audio").collect()
    assert(audios.nonEmpty && wins.keySet == audios.map(_.media_id).toSet)
    audios.foreach { a =>
      val rebuilt = wins(a.media_id).sortBy(_.frame_idx)
        .flatMap(_.frame_bytes)
      assert(rebuilt.sameElements(a.bytes), s"media ${a.media_id}")
    }
    // frameSample is exactly the video instantiation of chunks
    val viaChunks = chunks(media, "video", 64, 2).collect()
      .map(f => (f.media_id, f.frame_idx, f.frame_bytes.toSeq)).toSet
    val viaSample = frameSample(media, 2).collect()
      .map(f => (f.media_id, f.frame_idx, f.frame_bytes.toSeq)).toSet
    assert(viaChunks == viaSample)
  }
}
