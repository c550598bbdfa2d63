package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus FREEZE manifest — the versioned artifact a data lead signs
  * before a training mixture ships, composing the three reports the
  * repo already maintains into one immutable tree per freeze:
  *
  * {{{
  *   <outDir>/v=<n>/health/    q200's per-source corpus health rows
  *   <outDir>/v=<n>/verdicts/  q279's per-source ship/hold close-out
  *   <outDir>/v=<n>/audit/     [[GenAudit]] over the index estate
  *                             (present when indexDirs was passed)
  *   <outDir>/v=<n>/meta/      ONE summary row — written LAST, so its
  *                             _SUCCESS is the version's COMMIT MARKER
  * }}}
  *
  * Both composed reports are the LITERAL oracle-gated `SparkEntry`
  * queries, so a manifest's numbers can never drift from the gated
  * surface — freezing is composition, not recomputation logic.
  *
  * Versioning: a freeze is a deliberate human act, so allocation is
  * single-writer (max existing version + 1 — no claim protocol; two
  * simultaneous freezes of one corpus is an operational error, not a
  * race to arbitrate). Crash atomicity comes from write ORDER: `meta`
  * lands last, and [[latest]]/[[read]] only trust versions whose meta
  * committed — a torn freeze is invisible until re-run, and re-running
  * allocates a fresh version rather than patching the torn one
  * (manifests are immutable once committed; FreezeManifestSpec pins
  * immutability, the commit-marker rule, and the meta arithmetic).
  *
  * The meta row is the sign-off line: (version, n_sources, n_ship,
  * n_hold, n_docs, audit_partial) — `n_hold > 0` or `audit_partial >
  * 0` is what a lead investigates before signing; the manifest
  * reports, it does not block.
  *
  * Scale: the composed queries carry their own 100 TB arguments
  * (|sources|-bounded outputs); the audit is O(#gens) driver
  * listings; meta folds the already-bounded relations. Nothing here
  * adds a corpus-sized pass.
  */
object FreezeManifest {

  /** Freeze the current state of `dataDir`'s corpus into the next
    * version under `outDir`; returns the version id.
    */
  def write(spark: SparkSession, dataDir: String, outDir: String,
      indexDirs: Map[String, String] = Map.empty): Long = {
    val v = latest(spark, outDir) + 1L
    val root = s"$outDir/v=$v"
    val health = graft.SparkEntry.queries("q200_corpus_health")(
      spark, dataDir).localCheckpoint()
    val verdicts = graft.SparkEntry.queries("q279_curation_closeout")(
      spark, dataDir).localCheckpoint()
    health.write.mode("overwrite").parquet(s"$root/health")
    verdicts.write.mode("overwrite").parquet(s"$root/verdicts")
    val partials =
      if (indexDirs.isEmpty) 0L
      else {
        val audit = GenAudit.audit(spark, indexDirs).localCheckpoint()
        audit.write.mode("overwrite").parquet(s"$root/audit")
        audit.where(col("status") === "partial").count()
      }
    val vstats = verdicts.agg(
      count(lit(1)).as("n_sources"),
      sum(when(col("verdict") === "ship", 1L).otherwise(0L))
        .as("n_ship"),
      sum(when(col("verdict") =!= "ship", 1L).otherwise(0L))
        .as("n_hold"),
      sum(col("n_docs")).as("n_docs"))
    vstats.select(lit(v).as("version"), col("n_sources"),
        col("n_ship"), col("n_hold"), col("n_docs"),
        lit(partials).as("audit_partial"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/meta") // commit marker
    v
  }

  /** Highest COMMITTED version (meta present), 0 when none — torn
    * freezes (no meta/_SUCCESS) are skipped by construction.
    */
  def latest(spark: SparkSession, outDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(
        s"$outDir/v=$v/meta/_SUCCESS")))
      .sorted.lastOption.getOrElse(0L)
  }

  /** The committed relations of `version` (default: latest) as
    * name → DataFrame; `audit` present only if that freeze carried
    * index dirs.
    */
  def read(spark: SparkSession, outDir: String,
      version: Long = 0L): Map[String, DataFrame] = {
    val v = if (version > 0L) version else latest(spark, outDir)
    require(v > 0L, s"no committed manifest under $outDir")
    val root = s"$outDir/v=$v"
    val base = Map(
      "meta" -> spark.read.parquet(s"$root/meta"),
      "health" -> spark.read.parquet(s"$root/health"),
      "verdicts" -> spark.read.parquet(s"$root/verdicts"))
    if (DeltaIO.exists(spark, s"$root/audit"))
      base + ("audit" -> spark.read.parquet(s"$root/audit"))
    else base
  }
}
