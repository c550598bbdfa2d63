package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The maintenance contract shared by every persisted index sink
  * ([[DedupIndex]], [[TextIndex]], [[VectorIndex]], [[ContamIndex]],
  * [[SpanIndex]]).
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
    */
  def append(data: DataFrame, indexDir: String): Unit

  /** Consolidate append generations `srcDir` → `dstDir`; rows are
    * reorganized, never recomputed.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit

  /** The persisted relations in canonical semantic form, keyed by
    * relation name — the comparison surface for the contract spec.
    */
  def contents(spark: SparkSession, indexDir: String): Map[String, DataFrame]
}

object IndexSink {

  /** [[DedupIndex]] under the shared contract ((doc_id, text) input). */
  val dedup: IndexSink = new IndexSink {
    def name = "DedupIndex"
    def build(data: DataFrame, outDir: String): Unit =
      DedupIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      DedupIndex.append(data, indexDir)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      DedupIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "fingerprints" -> spark.read.parquet(s"$dir/fingerprints"),
        "bands" -> spark.read.parquet(s"$dir/bands"))
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
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      TextIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "postings" -> spark.read.parquet(s"$dir/postings"),
        "doclens" -> spark.read.parquet(s"$dir/doclens"),
        "stats" -> spark.read.parquet(s"$dir/stats")
          .agg(sum(col("nn")).as("nn"), sum(col("toktot")).as("toktot")))
  }

  /** [[ContamIndex]] under the shared contract ((doc_id, text) input). */
  val contam: IndexSink = new IndexSink {
    def name = "ContamIndex"
    def build(data: DataFrame, outDir: String): Unit =
      ContamIndex.build(data, outDir)
    def append(data: DataFrame, indexDir: String): Unit =
      ContamIndex.append(data, indexDir)
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      ContamIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "postings" -> spark.read.parquet(s"$dir/postings"),
        "docs" -> spark.read.parquet(s"$dir/docs"))
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
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      SpanIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "grams" -> SpanIndex.livePostings(spark, dir),
        "dfs" -> SpanIndex.totalDfs(spark, dir))
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
    def compact(spark: SparkSession, srcDir: String, dstDir: String): Unit =
      VectorIndex.compact(spark, srcDir, dstDir)
    def contents(spark: SparkSession, dir: String): Map[String, DataFrame] =
      Map(
        "centroids" -> spark.read.parquet(s"$dir/centroids"),
        "postings" -> VectorIndex.readPostings(spark, dir))
  }
}
