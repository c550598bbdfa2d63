package graft.queries

import graft.{QDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Driver-checkable slice of the multimodal pipeline: the decode stage's
  * metadata contract (dims/kind/size are pure functions of the payload,
  * see Multimodal.fakeDims) is SQL-expressible, so the DuckDB oracle can
  * validate the real mapPartitions path end-to-end. The feature vectors
  * are covered by MultimodalSpec.
  */
object MultimodalQueries {

  val defs: Seq[QDef] = Seq(
    QDef(
      "q28_media_decode",
      (s, dir) => {
        val decoded = Multimodal.decode(
          Multimodal.mediaFromDocuments(Tables(s, dir).documents))
        decoded.toDF().select(col("media_id"), col("kind"),
          col("width"), col("height"), col("n_bytes"))
      },
      Some("""
        SELECT doc_id AS media_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS kind,
               CAST(16 + strlen(text) % 64 AS INTEGER) AS width,
               CAST(16 + (strlen(text) // 64) % 64 AS INTEGER) AS height,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
      """)),

    // ------------------------------------------------------------------
    // q118: perceptual-hash near-duplicate detection over the image
    // subset — the multimodal analog of q58's SimHash join. The aHash
    // kernel (Multimodal.perceptualHash) runs in the typed decode path
    // (payloads stay partition-local; only 4-byte hashes shuffle), then
    // the pair stage is the pigeonhole band join: two 8-bit halves, a
    // pair at hamming ≤ 1 must agree on at least one half, so candidates
    // come from two equi-joins on band keys — the shard keys at scale —
    // never an all-pairs scan. Exact bit_count(xor) re-rank keeps only
    // true hamming ≤ 1 pairs. The oracle restates the kernel's
    // exact-integer bit rule in SQL (same contract-level check as q28)
    // and closes pairs with the unfiltered theta join, so hash equality
    // proves the band join dismissed nothing.
    QDef(
      "q118_phash_neardup",
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.mediaFromDocuments(Tables(s, dir).documents)
          .filter(_.kind == "image")
        val hashed = Multimodal.perceptualHash(media).toDF()
        val a = hashed.select(col("media_id").as("id_a"),
          col("ahash").as("ha"))
        val b = hashed.select(col("media_id").as("id_b"),
          col("ahash").as("hb"))
        val lo = a.join(b, expr("(ha & 255) = (hb & 255) and id_a < id_b"))
        val hi = a.join(b,
          expr("(shiftright(ha, 8) & 255) = (shiftright(hb, 8) & 255) " +
            "and id_a < id_b"))
        lo.union(hi).distinct()
          .where(expr("bit_count(ha ^ hb) <= 1"))
          .select(col("id_a"), col("id_b"), col("ha"), col("hb"),
            expr("cast(bit_count(ha ^ hb) as int)").as("hamming"))
      },
      Some("""
        WITH img AS (
          SELECT doc_id,
                 list_transform(range(1, strlen(text) + 1),
                   i -> ascii(substring(text, i, 1))) AS cs,
                 CAST(strlen(text) AS BIGINT) AS n
          FROM documents WHERE doc_id % 3 = 0),
        hashed AS (
          SELECT doc_id AS media_id,
                 CAST(list_sum(list_transform(range(0, 16), b ->
                   CASE WHEN list_sum(cs[CAST(b * n // 16 AS INTEGER) + 1 :
                                        CAST((b + 1) * n // 16 AS INTEGER)])
                             * n >
                             list_sum(cs) *
                             ((b + 1) * n // 16 - b * n // 16)
                        THEN 1 << CAST(b AS INTEGER) ELSE 0 END))
                   AS INTEGER) AS ahash
          FROM img)
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               a.ahash AS ha, b.ahash AS hb,
               CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
        FROM hashed a JOIN hashed b
          ON a.media_id < b.media_id
         AND bit_count(xor(a.ahash, b.ahash)) <= 1
      """)),

    // ------------------------------------------------------------------
    // q187: REAL image decode, oracle-pinned end-to-end. The fixture
    // closes the loop the stub never could: each image-kind doc_id gets
    // an ACTUAL PNG (Multimodal.syntheticPng — dims and every pixel are
    // pure integer functions of doc_id), the real javax.imageio kernel
    // in Multimodal.decode parses those bytes, and the output exposes
    // the decoded width/height plus a pixel checksum (Σ bin·count over
    // the 16-bin luma histogram, recovered exactly from the normalized
    // features). DuckDB restates dims + checksum from the generator
    // formula — so a decoder that mis-parses dimensions, drops rows on
    // any payload, or corrupts a single pixel's high nibble hash-fails.
    // Scale shape: pure narrow map (encode+decode never leave the
    // partition); only ~30 bytes/record of metadata survive.
    QDef(
      "q187_image_decode",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir).documents
          .where(col("doc_id") % 3 === 0)
          .select(col("doc_id")).as[Long]
          .map { id =>
            val w = 1 + (id % 16).toInt
            val h = 1 + ((id / 16) % 16).toInt
            Multimodal.MediaRecord(id, "image",
              Multimodal.syntheticPng(id, w, h), "synthetic")
          }
        Multimodal.decode(media).toDF()
          .select(col("media_id"), col("width"), col("height"),
            expr("""cast(round(aggregate(
                     zip_with(features, sequence(0, 15), (f, j) -> f * j),
                     cast(0.0 as double), (a, x) -> a + x)
                   * width * height, 0) as bigint)""").as("luma_chk"))
      },
      Some("""
        WITH img AS (SELECT doc_id,
                            CAST(1 + doc_id % 16 AS INTEGER) AS w,
                            CAST(1 + (doc_id // 16) % 16 AS INTEGER) AS h
                     FROM documents WHERE doc_id % 3 = 0)
        SELECT doc_id AS media_id, w AS width, h AS height,
               CAST(list_sum(list_transform(range(0, w * h),
                    i -> ((doc_id * 37 + (i % w) * 3 + (i // w) * 5) % 256)
                         // 16)) AS BIGINT) AS luma_chk
        FROM img
      """))
  )
}
