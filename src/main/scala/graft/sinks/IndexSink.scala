package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The maintenance contract shared by every persisted index sink
  * ([[DedupIndex]], [[TextIndex]], [[VectorIndex]], [[ContamIndex]],
  * [[SpanIndex]], [[LmIndex]]).
  * Each sink's probe surface stays its own (classify / searchBm25 /
  * search / probe — those have per-sink shapes and specs), but the
  * LIFECYCLE is one contract:
  *
  *  - `build(data, dir)`   — index a corpus from scratch (Overwrite).
  *  - `append(data, dir)`  — O(batch) incremental index of NEW rows;
  *    deltas merge at read time, so append-then-read must be
  *    indistinguishable from a full rebuild over the union.
  *  - `compact(src, dst)`  — consolidate accumulated append
  *    generations into one tight file set WITHOUT recomputing a row;
  *    reads over the compacted index are identical to the source.
  *    Separate dstDir; the swap is the caller's atomic-rename concern
  *    (the CorpusExport.compact contract).
  *
  * [[contents]] exposes each sink's persisted relations in a CANONICAL
  * semantic form (e.g. TextIndex's per-generation stats log folds to
  * its one-row sum, because readers only ever see the sum) so the
  * parameterized contract spec (SinkContractSpec) can assert
  * append≡rebuild and compact≡identity uniformly — a fifth sink
  * implements this trait and inherits the whole invariant harness
  * instead of hand-rolling (and drifting from) the contract.
  */
trait IndexSink {
  /** Sink name for spec/diagnostic labels. */
  def name: String

  /** Index `data` from scratch into `outDir` (mode Overwrite). */
  def build(data: DataFrame, outDir: String): Unit

  /** Incrementally index a batch of NEW rows — O(batch), no corpus
    * rescan; upstream admission (dedup/ingest) guarantees novelty.
    * Exactly-once callers only: a replayed batch appends a SECOND
    * copy. At-least-once callers (Structured Streaming's foreachBatch)
    * must use [[appendDelta]].
    */
  def append(data: DataFrame, indexDir: String): Unit

  /** Replay-safe form of [[append]] for at-least-once callers: the
    * batch's delta relations land under their own `gen`-scoped subtree
    * with mode Overwrite, so replaying a micro-batch REWRITES its own
    * generation instead of duplicating rows — the commit is idempotent
    * per gen (pass the micro-batch id as `gen`; distinct batches must
    * use distinct gens). Readers merge delta generations transparently;
    * [[compact]] folds them back into the main tree. Same O(batch)
    * cost and same read-time semantics as append — the contract spec
    * asserts replayed-appendDelta ≡ applied-once ≡ rebuild uniformly.
    */
  def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit

  /** Consolidate append generations `srcDir` → `dstDir`; rows are
    * reorganized, never recomputed.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit

  /** The persisted relations in canonical semantic form, keyed by
    * relation name — the comparison surface for the contract spec.
    */
  def contents(spark: SparkSession, indexDir: String): Map[String, DataFrame]
}

/** Atomic check-and-claim seam for [[DeltaIO.nextPlainGen]]'s
  * generation allocation. The contract is exactly-one-winner: for any
  * set of concurrent `tryClaim(dir, g)` callers, AT MOST ONE may see
  * true — that single guarantee is what stands between two
  * simultaneous plain appends and a silent mode-overwrite of the same
  * `gen=` subtree. Two implementations ship ([[ClaimPrimitive.hadoopCreate]]
  * for atomic-create filesystems, [[ClaimPrimitive.conditionalPut]]
  * adapting a store-native conditional write); SinkContractSpec races
  * 4 claimants over both and asserts zero shared generations.
  */
trait ClaimPrimitive {
  /** Label for diagnostics/specs. */
  def name: String

  /** Generations already claimed under `claimsDir` (crash-stale claims
    * included — a skipped gen id is harmless, a reused one is not).
    */
  def claimedGens(claimsDir: String): Seq[Long]

  /** Atomically create the claim marker for `gen` under `claimsDir`;
    * true iff THIS caller created it. Losing (false, or any
    * already-exists signal mapped to false) means: retry one gen
    * lower.
    */
  def tryClaim(claimsDir: String, gen: Long): Boolean
}

object ClaimPrimitive {

  private def parseGens(names: Seq[String]): Seq[Long] =
    names.filter(_.startsWith("gen=-"))
      .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toLong).toOption)

  /** The filesystem claim, valid ONLY on
    * [[DeltaIO.AtomicCreateSchemes]]. Hadoop's LOCAL FS is NOT a valid
    * claim primitive as-is: RawLocalFileSystem.create(f,
    * overwrite=false) is exists-then-open (plain FileOutputStream, no
    * O_EXCL), so two racers can BOTH pass the exists check and both
    * "win" — the SinkContractSpec claimant race reproduced exactly
    * that (15 shared gens in 100 claims). On file:// the claim
    * therefore goes through java.io.File.createNewFile, which the JDK
    * guarantees atomic (O_CREAT|O_EXCL). On HDFS-family schemes
    * fs.createNewFile is atomic at the namenode, but its exists
    * pre-check can still THROW FileAlreadyExistsException to the
    * loser instead of returning false — either signal means lost.
    */
  def hadoopCreate(conf: org.apache.hadoop.conf.Configuration)
      : ClaimPrimitive = new ClaimPrimitive {
    def name = "hadoop-create"
    def claimedGens(claimsDir: String): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(claimsDir)
      val fs = p.getFileSystem(conf)
      fs.mkdirs(p)
      parseGens(fs.listStatus(p).toSeq.map(_.getPath.getName))
    }
    def tryClaim(claimsDir: String, gen: Long): Boolean = {
      val p = new org.apache.hadoop.fs.Path(claimsDir, s"gen=$gen")
      val fs = p.getFileSystem(conf)
      val scheme = Option(fs.getUri.getScheme).getOrElse("file")
      require(DeltaIO.AtomicCreateSchemes.contains(scheme),
        s"hadoopCreate claim on '$scheme://' is not atomic — use " +
          "ClaimPrimitive.conditionalPut with the store's native " +
          "conditional write")
      // a first claim on a fresh index may precede any claimedGens
      // call — createNewFile throws (rather than returning false) when
      // the parent is missing, so ensure it here; mkdirs on an
      // existing dir is a no-op and atomicity lives in the file create
      fs.mkdirs(p.getParent)
      if (scheme == "file")
        new java.io.File(p.toUri.getPath).createNewFile()
      else
        try fs.createNewFile(p)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
    }
  }

  /** Adapter for a store-NATIVE conditional write — the real claim
    * path for object stores, where create-with-overwrite=false is
    * HEAD-then-PUT (last-writer-wins, not a claim): S3 `If-None-Match:
    * *` PUT, GCS `ifGenerationMatch=0`, ABFS ETag preconditions all
    * fit this shape. The caller supplies the store's atomic
    * put-if-absent (true iff the key was created by this call) and a
    * prefix listing; markers are keys `<claimsDir>/gen=<g>`. This
    * container has no object store, so SinkContractSpec proves the
    * seam with an in-memory atomic fake under real thread contention —
    * wiring a production store is one constructor call around its
    * client, no DeltaIO change.
    */
  def conditionalPut(label: String, putIfAbsent: String => Boolean,
      listKeys: String => Seq[String]): ClaimPrimitive =
    new ClaimPrimitive {
      def name = label
      def claimedGens(claimsDir: String): Seq[Long] =
        parseGens(listKeys(claimsDir).map { k =>
          val i = k.lastIndexOf('/')
          if (i < 0) k else k.substring(i + 1)
        })
      def tryClaim(claimsDir: String, gen: Long): Boolean =
        putIfAbsent(s"$claimsDir/gen=$gen")
    }

  /** An S3-shaped conditional store: the two operations (and their
    * HTTP status contract) the [[s3Style]] adapter consumes. This is
    * the REFERENCE wiring for the most common object store — the
    * "one constructor call" around a production client, demonstrated
    * rather than asserted. Against the AWS SDK v2 it is literally:
    *
    * {{{
    * val s3: S3Client = ...            // the application's client
    * val claim = ClaimPrimitive.s3Style("bucket-b",
    *   new S3ConditionalStore {
    *     def putIfNoneMatch(key: String): Int =
    *       try s3.putObject(PutObjectRequest.builder()
    *           .bucket("b").key(key).ifNoneMatch("*").build(),
    *         RequestBody.empty()).sdkHttpResponse().statusCode()
    *       catch { case e: S3Exception => e.statusCode() }
    *     def listKeys(prefix: String): Seq[String] =
    *       s3.listObjectsV2Paginator(ListObjectsV2Request.builder()
    *           .bucket("b").prefix(prefix + "/").build())
    *         .contents().asScala.map(_.key()).toSeq
    *   })
    * TextIndex.append(batch, remoteIndexDir, Some(claim))
    * }}}
    *
    * (GCS: `ifGenerationMatch(0)` insert, status 412 on loss; ABFS:
    * Create with `If-None-Match: *`, 409/412 on loss — same shape.)
    */
  trait S3ConditionalStore {
    /** PUT `key` with `If-None-Match: *` and return the store's HTTP
      * status. 200/201 = this caller created the key; 412
      * (PreconditionFailed) = it already exists; 409 = a concurrent
      * create beat this one mid-flight (S3 strong-consistency
      * semantics for conditional writes).
      */
    def putIfNoneMatch(key: String): Int

    /** ListObjectsV2-shaped listing: all keys under `prefix/`. */
    def listKeys(prefix: String): Seq[String]
  }

  /** [[conditionalPut]] specialized to the S3 status-code contract:
    * 200/201 → claim won, 412/409 → claim lost (retry one gen lower —
    * a 409 loser may leave its gen unclaimed, which merely SKIPS an
    * id; the exactly-one-winner contract cares only that no two
    * claimants share one). Any other status is an error, not a loss:
    * mapping a 5xx to "lost" would silently burn gen ids under a
    * store outage. SinkContractSpec races this adapter over a fake
    * store that answers real statuses (including interleaved 409s)
    * under thread contention.
    */
  def s3Style(label: String, store: S3ConditionalStore): ClaimPrimitive =
    conditionalPut(label,
      putIfAbsent = key => store.putIfNoneMatch(key) match {
        case 200 | 201 => true
        case 412 | 409 => false
        case s => throw new java.io.IOException(
          s"conditional PUT $key answered HTTP $s — not a win or a " +
            "loss; refusing to guess (a 5xx mapped to 'lost' would " +
            "burn gen ids under a store outage)")
      },
      listKeys = store.listKeys)
}

/** Shared read/write plumbing for the gen-scoped delta trees every
  * sink's [[IndexSink.appendDelta]] uses: relation `rel` may carry an
  * optional sibling `rel_delta/gen=<g>/...` tree; readers union it in
  * (payload columns only — the gen partition column is dropped), and
  * writers overwrite exactly one generation's subtree. Centralized so
  * five sinks cannot implement five subtly different replay stories.
  */
private[sinks] object DeltaIO {

  /** Filesystem schemes where create-with-overwrite=false is an ATOMIC
    * check-and-claim (POSIX O_CREAT|O_EXCL / HDFS namenode create):
    * the set [[nextPlainGen]]'s claim protocol is safe on. Object
    * stores (s3a, gs, abfs, oss, …) implement it as HEAD-then-PUT —
    * last-writer-wins, NOT a claim — so they are deliberately absent.
    */
  private[sinks] val AtomicCreateSchemes: Set[String] =
    Set("file", "hdfs", "viewfs", "webhdfs")

  def exists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** `dir/rel` plus, when present, every `dir/rel_delta/gen=*`
    * generation, as ONE relation over the payload `cols`.
    */
  def readMerged(spark: SparkSession, dir: String, rel: String,
      cols: Seq[String]): DataFrame = {
    val main = spark.read.parquet(s"$dir/$rel").select(cols.map(col): _*)
    val delta = s"$dir/${rel}_delta"
    if (exists(spark, delta))
      main.unionByName(
        spark.read.parquet(delta).select(cols.map(col): _*))
    else main
  }

  /** Overwrite exactly generation `gen` of `dir/rel`'s delta tree. */
  def writeGen(data: DataFrame, dir: String, rel: String,
      gen: Long): Unit =
    data.write.mode("overwrite").parquet(s"$dir/${rel}_delta/gen=$gen")

  /** Next free PLAIN-append generation across `rels`' delta trees.
    * Plain (exactly-once) appends use the NEGATIVE gen namespace —
    * -1, -2, … — so they can never collide with a streaming caller's
    * non-negative micro-batch ids on the same index. Listing cost is
    * O(#appends so far), not O(index files): this is why a sink routes
    * plain append through the delta tree at all. A parquet mode-append
    * commit lists (and schema-infers over) the ENTIRE main tree, so
    * its constant factor grows with the corpus — the r9 10× SinkBench
    * measured DedupIndex.append at 3.8× on a FIXED 500-row batch from
    * exactly that listing. A `gen=` subtree write touches only its own
    * directory and stays O(batch) at any index size.
    */
  def nextPlainGen(spark: SparkSession, dir: String, rels: Seq[String],
      claim: Option[ClaimPrimitive] = None): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val used = rels.flatMap { rel =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/${rel}_delta")
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty[Long]
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen=-"))
        .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toLong).toOption)
    }
    // Allocate via an atomic claim marker ([[ClaimPrimitive]]): two
    // concurrent appenders that both list the same free gen would
    // otherwise mode-overwrite the same gen= subtree and silently drop
    // the first batch. DEFAULT primitive (claim = None) is the
    // filesystem create ([[ClaimPrimitive.hadoopCreate]]), which is an
    // atomic check-and-claim ONLY on HDFS and local/POSIX filesystems
    // — enforced by the hard scheme check below. It is NOT atomic on
    // S3A and most object stores (create-with-overwrite=false there is
    // HEAD-then-PUT), so two remote appenders could race to the same
    // gen and SILENTLY lose a batch; rather than ship that, plain
    // append REFUSES to allocate on a scheme outside the atomic-create
    // set unless the caller passes a primitive wired to the store's
    // native conditional write ([[ClaimPrimitive.conditionalPut]] —
    // e.g. an S3 If-None-Match PUT). The other safe object-store path
    // stays [[writeGen]] via appendDelta with caller-assigned gens (a
    // streaming micro-batch id, or any externally serialized counter).
    // The loser retries one gen lower. Claim files are O(#appends)
    // tiny markers — same listing class as the delta tree itself —
    // and stale claims merely skip a gen id.
    val claims = s"$dir/_gen_claims"
    val primitive = claim.getOrElse {
      val fs = new org.apache.hadoop.fs.Path(claims).getFileSystem(conf)
      val scheme = Option(fs.getUri.getScheme).getOrElse("file")
      if (!AtomicCreateSchemes.contains(scheme))
        throw new UnsupportedOperationException(
          s"nextPlainGen on '$scheme://' — createNewFile is not an " +
            "atomic check-and-claim on this filesystem, so concurrent " +
            "plain appends could silently drop a batch. Use appendDelta " +
            "with a caller-assigned gen (streaming micro-batch id or an " +
            "externally serialized counter), or pass a " +
            "ClaimPrimitive.conditionalPut wired to the store's native " +
            "conditional write (e.g. S3 If-None-Match).")
      ClaimPrimitive.hadoopCreate(conf)
    }
    val claimed = primitive.claimedGens(claims)
    var g = ((used ++ claimed) :+ 0L).min - 1L
    while (!primitive.tryClaim(claims, g))
      g -= 1L
    g
  }
}

object IndexSink {

  /** [[DedupIndex]] under the shared contract ((doc_id, text) input). */
  val dedup: IndexSink = new IndexSink {
    def name = "DedupIndex"
    def build(data: DataFrame, outDir: String): Unit =
      DedupIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      DedupIndex.append(data, indexDir)
    def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit =
      DedupIndex.appendDelta(data, indexDir, gen)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      DedupIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "fingerprints" -> DedupIndex.readFingerprints(spark, dir),
        "bands" -> DedupIndex.readBands(spark, dir))
  }

  /** [[TextIndex]] under the shared contract ((doc_id, text) input).
    * `stats` is canonicalized to its one-row fold — the only form
    * readers ([[TextIndex.searchBm25]]) ever consume — so a 4-delta
    * log and its compacted single row compare equal, as they must.
    */
  val text: IndexSink = new IndexSink {
    def name = "TextIndex"
    def build(data: DataFrame, outDir: String): Unit =
      TextIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      TextIndex.append(data, indexDir)
    def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit =
      TextIndex.appendDelta(data, indexDir, gen)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      TextIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "postings" -> TextIndex.readPostings(spark, dir),
        "doclens" -> TextIndex.readDoclens(spark, dir),
        "stats" -> TextIndex.readTotals(spark, dir))
  }

  /** [[ContamIndex]] under the shared contract ((doc_id, text) input). */
  val contam: IndexSink = new IndexSink {
    def name = "ContamIndex"
    def build(data: DataFrame, outDir: String): Unit =
      ContamIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      ContamIndex.append(data, indexDir)
    def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit =
      ContamIndex.appendDelta(data, indexDir, gen)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      ContamIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "postings" -> ContamIndex.readPostings(spark, dir),
        "docs" -> ContamIndex.readDocs(spark, dir))
  }

  /** [[SpanIndex]] under the shared contract ((doc_id, text) input).
    * Relations are canonicalized to the PROBE-VISIBLE form (sub-cap
    * postings, summed df ledger) because that is the only form probes
    * consume — it is what lets [[SpanIndex.compact]] garbage-collect
    * dead hot grams' postings and still satisfy compact ≡ identity.
    */
  val span: IndexSink = new IndexSink {
    def name = "SpanIndex"
    def build(data: DataFrame, outDir: String): Unit =
      SpanIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      SpanIndex.append(data, indexDir)
    def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit =
      SpanIndex.appendDelta(data, indexDir, gen)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      SpanIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "grams" -> SpanIndex.livePostings(spark, dir),
        "dfs" -> SpanIndex.totalDfs(spark, dir),
        // membership ledger canonicalizes to the doc-id SET (append
        // generations partition it; compact folds it) — appended
        // doc_ids are new by contract, so distinct loses nothing
        "docs" -> SpanIndex.indexedDocs(spark, dir).distinct())
  }

  /** [[LmIndex]] under the shared contract ((doc_id, text) input).
    * Relations canonicalize to their MERGED-AND-SUMMED form (the only
    * form [[LmIndex.score]] consumes) — counts are additive, so a
    * 3-generation delta log and the from-scratch rebuild compare
    * equal by arithmetic.
    */
  val lm: IndexSink = new IndexSink {
    def name = "LmIndex"
    def build(data: DataFrame, outDir: String): Unit =
      LmIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      LmIndex.append(data, indexDir)
    def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit =
      LmIndex.appendDelta(data, indexDir, gen)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      LmIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "bigrams" -> LmIndex.readBigrams(spark, dir),
        "words" -> LmIndex.readWords(spark, dir))
  }

  /** [[VectorIndex]] (raw IVF postings) under the shared contract
    * ((vec_id, embedding) input; the quantizer's k is bound here
    * because the contract's build takes only data + dir). Postings are
    * read through the delta-merging reader, so a streaming
    * `appendDelta` generation and its compacted form compare equal.
    */
  def vector(k: Int): IndexSink = new IndexSink {
    def name = s"VectorIndex(k=$k)"
    def build(data: DataFrame, outDir: String): Unit =
      VectorIndex.build(data, outDir, k)
    def append(data: DataFrame, indexDir: String): Unit =
      VectorIndex.append(data.sparkSession, indexDir, data)
    def appendDelta(data: DataFrame, indexDir: String, gen: Long): Unit =
      VectorIndex.appendDelta(data.sparkSession, indexDir, data, gen)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      VectorIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "centroids" -> spark.read.parquet(s"$dir/centroids"),
        "postings" -> VectorIndex.readPostings(spark, dir))
  }
}
