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
}
