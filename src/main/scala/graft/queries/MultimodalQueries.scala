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
      """)),

    // ------------------------------------------------------------------
    // q214: shot-boundary detection over the video subset — the frame-
    // level pipeline stage between raw ingest and per-shot sampling
    // (dedup/captioning pipelines keyframe per SHOT, not per frame, so
    // boundary detection decides what a 100 TB video corpus actually
    // pays to process). Exercises `Multimodal.frameSample` (stride-2
    // frame extraction in the typed kernel — payloads stay partition-
    // local, only per-frame scalar features shuffle), then the classic
    // luminance-delta detector: per-frame mean byte value, lag window
    // per video, boundary where the jump exceeds the threshold. Output
    // per video: frame count, boundary count, shots = boundaries + 1,
    // and the largest jump.
    //
    // Scale: frame explode is stateless per-row work; the only shuffle
    // is the per-VIDEO window (keyed, bounded by frames-per-video) and
    // the per-video rollup. Determinism: mean byte values round at 6
    // (exact integer sum / length), jumps are differences of rounded
    // values rounded at 6, the threshold (1.0) compares against a
    // round-6 value. The oracle restates the kernel's chunking exactly
    // (64-byte chunks, idx % 2 == 0, ASCII payload ⇒ byte == char).
    QDef(
      "q214_shot_boundaries",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val frames = Multimodal.frameSample(
          Multimodal.mediaFromDocuments(Tables(s, dir).documents), 2)
        // mean byte value in the typed kernel (payloads never shuffle;
        // only the scalar rides on). Exact-rational HALF_UP at 6 ==
        // ROUND(sum/len, 6): for len ≤ 64 the quotient is never within
        // 7.8e-9 of a rounding tie, so BigDecimal-exact and
        // double-quotient rounding agree in both engines.
        val feat = frames.map { f =>
          val sum = f.frame_bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
          val mb = new java.math.BigDecimal(sum)
            .divide(new java.math.BigDecimal(f.frame_bytes.length), 6,
              java.math.RoundingMode.HALF_UP).doubleValue
          (f.media_id, f.frame_idx, mb)
        }.toDF("media_id", "frame_idx", "mb")
        val byVid = Window.partitionBy(col("media_id"))
          .orderBy(col("frame_idx"))
        feat
          .withColumn("jump",
            round(abs(col("mb") - lag(col("mb"), 1).over(byVid)), 6))
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("jump") > 1.0d, 1L).otherwise(0L))
              .as("n_boundaries"),
            round(coalesce(max(col("jump")), lit(0.0d)), 6)
              .as("max_jump_r"))
          .select(col("media_id"), col("n_frames"),
            col("n_boundaries"),
            (col("n_boundaries") + 1L).as("n_shots"),
            col("max_jump_r"))
      },
      Some("""
        WITH media AS (SELECT doc_id AS media_id, text
                       FROM documents WHERE doc_id % 3 = 2),
        idx AS (
          -- length(text) > 0 guard: DuckDB's (0-1)//64 truncates to 0,
          -- so an empty payload would otherwise yield range(0, 1) = one
          -- phantom empty frame, while the kernel (Multimodal.chunks)
          -- emits NO chunk for an empty payload
          SELECT media_id, text,
                 unnest(range(0, CAST(1 + (length(text) - 1) // 64
                                      AS BIGINT))) AS k
          FROM media WHERE length(text) > 0),
        frames AS (
          SELECT media_id, CAST(k AS INTEGER) AS frame_idx,
                 substr(text, CAST(k * 64 + 1 AS INTEGER), 64) AS chunk
          FROM idx WHERE k % 2 = 0),
        feat AS (
          SELECT media_id, frame_idx,
                 ROUND(list_sum(list_transform(string_split(chunk, ''),
                         c -> ascii(c)))
                       / CAST(length(chunk) AS DOUBLE), 6) AS mb
          FROM frames),
        j AS (SELECT media_id, frame_idx, mb,
                     ROUND(ABS(mb - LAG(mb) OVER (PARTITION BY media_id
                       ORDER BY frame_idx)), 6) AS jump
              FROM feat)
        SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN jump > 1.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boundaries,
               CAST(SUM(CASE WHEN jump > 1.0 THEN 1 ELSE 0 END) + 1
                    AS BIGINT) AS n_shots,
               ROUND(COALESCE(MAX(jump), 0.0), 6) AS max_jump_r
        FROM j GROUP BY 1
      """)),

    // ------------------------------------------------------------------
    // q215: voice-activity segmentation over REAL decoded PCM — the
    // audio twin of q214's video stage, and the op that decides which
    // SEGMENTS of a 100 TB audio corpus are worth transcribing. The
    // fixture closes the loop the byte proxy never could (the q187
    // recipe applied to audio): each audio-kind doc_id gets an ACTUAL
    // RIFF/WAVE payload (Multimodal.syntheticWav — every 16-bit PCM
    // sample is a pure integer function of doc_id), the real
    // javax.sound.sampled kernel in Multimodal.audioWindows decodes it
    // and emits per-32-sample-window EXACT integer energies (Σ s²),
    // then SQL computes window RMS, thresholds into active/silent, and
    // runs gaps-and-islands per stream for the longest ACTIVE RUN —
    // the q102/q151 island pattern at the frame level. A decoder that
    // drops a sample, misreads endianness, or pads a frame shifts a
    // window's sumsq and hash-fails. Output per audio: windows, active
    // windows, longest run, and the active ratio.
    //
    // Scale: payloads decode partition-locally (only 3 scalars per
    // window shuffle); one media_id exchange serves the island window
    // and the rollup (runs are bounded by windows-per-stream).
    // Determinism: sumsq is exact integer; rms = round(sqrt(sumsq/n),6)
    // is the same IEEE double chain in both engines (sqrt is
    // correctly-rounded by spec), so the rounded values are identical.
    // The oracle's range(0, 512) is exact, not a data cap: n = 256 +
    // doc_id % 257 ≤ 512 by construction of the fixture itself.
    QDef(
      "q215_audio_activity",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val media = Tables(s, dir).documents
          .where(col("doc_id") % 3 === 1)
          .select(col("doc_id")).as[Long]
          .map { id =>
            val n = (256 + id % 257).toInt
            Multimodal.MediaRecord(id, "audio",
              Multimodal.syntheticWav(id, n), "synthetic")
          }
        val en = Multimodal.audioWindows(media, 32).toDF()
          .select(col("media_id"), col("widx"),
            round(sqrt(col("sumsq").cast("double") / col("n_samples")), 6)
              .as("e"))
        val byM = Window.partitionBy(col("media_id")).orderBy(col("widx"))
        val runs = en
          .withColumn("active", (col("e") > 1000.0d).cast("int"))
          .withColumn("isl",
            col("widx") - sum(col("active")).over(byM)
              + when(col("active") === 1, 1).otherwise(0))
        runs.groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_windows"),
            sum(col("active")).cast("bigint").as("n_active"))
          .join(
            runs.where(col("active") === 1)
              .groupBy(col("media_id"), col("isl"))
              .agg(count(lit(1)).as("run"))
              .groupBy(col("media_id"))
              .agg(max(col("run")).as("longest_run")),
            Seq("media_id"), "left")
          .select(col("media_id"), col("n_windows"), col("n_active"),
            coalesce(col("longest_run"), lit(0L)).as("longest_run"),
            round(col("n_active").cast("double") / col("n_windows"), 6)
              .as("active_ratio_r"))
      },
      Some("""
        WITH media AS (SELECT doc_id AS media_id,
                              CAST(256 + doc_id % 257 AS INTEGER) AS n
                       FROM documents WHERE doc_id % 3 = 1),
        samp AS (SELECT media_id, CAST(i.i AS INTEGER) AS i,
                        CASE WHEN (media_id + i.i // 64) % 3 = 0
                               OR (media_id + i.i // 64) % 5 = 0 THEN 0
                             ELSE (((media_id * 31 + i.i * 7) % 201)
                                   - 100) * 50 END AS s
                 FROM media, range(0, 512) i(i)
                 WHERE i.i < n),
        w AS (SELECT media_id, CAST(i // 32 AS INTEGER) AS widx,
                     COUNT(*) AS ns, SUM(CAST(s AS BIGINT) * s) AS sumsq
              FROM samp GROUP BY 1, 2),
        en AS (SELECT media_id, widx,
                      ROUND(SQRT(CAST(sumsq AS DOUBLE) / ns), 6) AS e
               FROM w),
        act AS (SELECT media_id, widx,
                       CASE WHEN e > 1000.0 THEN 1 ELSE 0 END AS active
                FROM en),
        isl AS (SELECT media_id, widx, active,
                       widx - SUM(active) OVER (PARTITION BY media_id
                         ORDER BY widx ROWS UNBOUNDED PRECEDING)
                       + CASE WHEN active = 1 THEN 1 ELSE 0 END AS isl
                FROM act),
        runs AS (SELECT media_id, isl, CAST(COUNT(*) AS BIGINT) AS run
                 FROM isl WHERE active = 1 GROUP BY 1, 2),
        longest AS (SELECT media_id, MAX(run) AS longest_run
                    FROM runs GROUP BY 1),
        base AS (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
                        CAST(SUM(active) AS BIGINT) AS n_active
                 FROM act GROUP BY 1)
        SELECT b.media_id, b.n_windows, b.n_active,
               COALESCE(l.longest_run, 0) AS longest_run,
               ROUND(CAST(b.n_active AS DOUBLE) / b.n_windows, 6)
                 AS active_ratio_r
        FROM base b LEFT JOIN longest l ON l.media_id = b.media_id
      """)),

    // ------------------------------------------------------------------
    // q226: shot-boundary detection over REAL multi-frame decode — the
    // video stage graduates from byte proxy to actual decoded frames,
    // the same move that made images (q187) and audio (q215) real. The
    // JDK's one moving-picture codec is the animated-GIF ImageIO
    // reader, so the fixture is an ACTUAL multi-frame GIF per video
    // doc (Multimodal.syntheticGif — frame f's pixel (x,y) is the pure
    // integer function gifLuma(doc_id, f, x, y), encoded losslessly on
    // a 256-gray palette), and Multimodal.videoFrames decodes the real
    // payload frame by frame (`ImageReader.read(i)`). Every third
    // frame shifts the pattern by +128 mod 256, moving the frame MEAN,
    // so shot boundaries land at the f mod 3 transitions — except for
    // seeds whose luma distribution straddles 128 closely (the shift
    // then barely moves the mean), which keeps the threshold honest.
    // The oracle recomputes each frame's mean luma from the CLOSED
    // FORM (a pixel-grid cross join — DuckDB never sees a GIF byte),
    // so the hash gate proves the decoder recovered every pixel of
    // every frame: a dropped frame, a wrong palette entry, or the
    // interlace row-shift bug this fixture caught during development
    // all change some frame's integer luma sum. n_decoded = n_frames
    // additionally pins that NO payload fell back to the byte proxy.
    //
    // Scale: payloads decode partition-locally (the q187/q215 posture
    // — only per-frame scalar means shuffle); one media_id exchange
    // serves the lag window and the rollup; fan-out is bounded by
    // frames-per-video. q214 keeps the byte-proxy stage for true video
    // containers (MP4/WebM — no JDK codec).
    QDef(
      "q226_gif_shot_boundaries",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val media = Tables(s, dir).documents
          .where(col("doc_id") % 3 === 2)
          .select(col("doc_id")).as[Long]
          .map { id =>
            Multimodal.MediaRecord(id, "video",
              Multimodal.syntheticGif(id, 16, 12, (4 + id % 4).toInt),
              "fixture")
          }
        val byVid = Window.partitionBy(col("media_id"))
          .orderBy(col("frame_idx"))
        Multimodal.videoFrames(media).toDF()
          .withColumn("mb", round(col("mean_luma"), 6))
          .withColumn("jump",
            round(abs(col("mb") - lag(col("mb"), 1).over(byVid)), 6))
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(col("decoded").cast("long")).as("n_decoded"),
            sum(when(col("jump") > 16.0d, 1L).otherwise(0L))
              .as("n_boundaries"),
            round(coalesce(max(col("jump")), lit(0.0d)), 6)
              .as("max_jump_r"))
          .select(col("media_id"), col("n_frames"), col("n_decoded"),
            col("n_boundaries"),
            (col("n_boundaries") + 1L).as("n_shots"),
            col("max_jump_r"))
      },
      Some("""
        WITH vids AS (SELECT doc_id AS media_id,
                             CAST(4 + doc_id % 4 AS BIGINT) AS nf
                      FROM documents WHERE doc_id % 3 = 2),
        fr AS (SELECT media_id, unnest(range(0, nf)) AS f FROM vids),
        px AS (SELECT media_id, f, tx.range AS x, ty.range AS y
               FROM fr, range(0, 16) tx, range(0, 12) ty),
        lum AS (SELECT media_id, f,
                       SUM(((media_id * 37 + x * 3 + y * 5) % 256
                            + CASE WHEN f % 3 = 0 THEN 128 ELSE 0 END)
                           % 256) AS s
                FROM px GROUP BY 1, 2),
        feat AS (SELECT media_id, f,
                        ROUND(CAST(s AS DOUBLE) / 192, 6) AS mb
                 FROM lum),
        j AS (SELECT media_id, f, mb,
                     ROUND(ABS(mb - LAG(mb) OVER (PARTITION BY media_id
                       ORDER BY f)), 6) AS jump
              FROM feat)
        SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(COUNT(*) AS BIGINT) AS n_decoded,
               CAST(SUM(CASE WHEN jump > 16.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boundaries,
               CAST(SUM(CASE WHEN jump > 16.0 THEN 1 ELSE 0 END) + 1
                    AS BIGINT) AS n_shots,
               ROUND(COALESCE(MAX(jump), 0.0), 6) AS max_jump_r
        FROM j GROUP BY 1
      """))
  )
}
