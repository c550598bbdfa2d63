package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned corpus export — the write side of the training-data
  * pipeline (the read side is `graft.Tables`; the reference's only sink
  * is the per-shard text file, `/root/reference/mr/worker.go:182-199`).
  *
  * Layout contract:
  *   - hive-style directories `split=…/lang=…` so any reader
  *     partition-prunes on the two standard downstream predicates
  *     ("train only", "one language");
  *   - `maxRecordsPerFile` bounds shard size, so one giant language
  *     cannot produce an unsplittable file at 100 TB;
  *   - rows inside each file are sorted by doc_id
  *     (`sortWithinPartitions`), which keeps parquet min/max row-group
  *     stats tight for doc_id range scans and makes file contents
  *     deterministic for a fixed partitioning.
  *
  * The returned manifest is computed by READING BACK what was written —
  * it is the export's receipt, not an echo of the input.
  */
object CorpusExport {

  def export(docs: DataFrame, outDir: String,
      maxRecordsPerFile: Int = 100000): DataFrame = {
    write(docs, outDir, "overwrite", maxRecordsPerFile)
    manifest(docs.sparkSession, outDir)
  }

  /** The bare partitioned write ("append" mode is what the streaming
    * foreachBatch bridge uses — each micro-batch adds files under the
    * same hive tree).
    */
  /** The shared layout pipeline: partition-keyed repartition, the
    * in-file doc_id sort (the partition columns MUST lead the sort: the
    * file writer requires child ordering by (split, lang), so a bare
    * doc_id sort would be buried under a planner-inserted sort and
    * eliminated), the shard bound, and the hive partitioning — one
    * definition so the parquet and jsonl writers cannot drift.
    */
  private def layout(docs: DataFrame, maxRecordsPerFile: Int) =
    docs
      .repartition(col("split"), col("lang"))
      .sortWithinPartitions(col("split"), col("lang"), col("doc_id"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("split", "lang")

  def write(docs: DataFrame, outDir: String, mode: String,
      maxRecordsPerFile: Int = 100000): Unit =
    layout(docs, maxRecordsPerFile).mode(mode).parquet(outDir)

  /** JSONL export — the interchange format training stacks actually
    * consume (one JSON object per line, gzip-compressed shards). Same
    * layout contract as the parquet write: hive `split=…/lang=…`
    * directories for partition-pruned reads, `maxRecordsPerFile` shard
    * bound, in-file doc_id sort for deterministic shard contents.
    * Spark's json writer IS JSON Lines, and gzip'd JSONL stays
    * per-file-parallel (one task per shard — which is why the shard
    * bound matters more here than for parquet: gzip is not splittable
    * WITHIN a file).
    */
  def writeJsonl(docs: DataFrame, outDir: String,
      mode: String = "overwrite",
      maxRecordsPerFile: Int = 100000): Unit =
    layout(docs, maxRecordsPerFile)
      .option("compression", "gzip")
      .mode(mode)
      .json(outDir)

  /** Compaction — the small-files remedy every long-lived corpus tree
    * needs: streaming appends (CorpusStreaming commits one file set per
    * micro-batch) and incremental loads accrete shards far below the
    * target size, and at 100 TB an over-sharded tree taxes both the
    * namenode listing and every downstream scan's task count. Reads the
    * hive tree back (split/lang recovered as partition columns) and
    * rewrites it through the SAME layout pipeline into `dstDir` —
    * consolidated shards, identical rows, identical partitioning and
    * in-file sort. Writes to a separate directory: the swap is the
    * caller's (atomic-rename) concern, not buried in here.
    *
    * @return the manifest of the compacted tree (the receipt, read back)
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      maxRecordsPerFile: Int = 100000): DataFrame = {
    write(spark.read.parquet(srcDir), dstDir, "overwrite", maxRecordsPerFile)
    manifest(spark, dstDir)
  }

  /** One row per (split, lang) partition of an exported corpus:
    * doc/token counts plus file count and bytes from the filesystem.
    */
  def manifest(spark: SparkSession, outDir: String): DataFrame = {
    val stats = spark.read.parquet(outDir)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("cast(length(text) as bigint)")).as("n_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .load(outDir)
      .select(col("path"), col("length"),
        regexp_extract(col("path"), "split=([^/]+)", 1).as("split"),
        regexp_extract(col("path"), "lang=([^/]+)", 1).as("lang"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_files"), sum(col("length")).as("n_bytes"))
    stats.join(files, Seq("split", "lang"))
  }
}
