package graft.queries

import graft.{QDef, Tables}
import graft.apps.{Indexer, WordCount}
import graft.core.{KV, MRApp}
import graft.core.MRAggregators.HolisticReduce
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The MR-compatibility layer under the driver's DuckDB oracle: the
  * actual MRApp map/reduce implementations run as Catalyst-planned
  * aggregations over `documents` rows (doc_id stands in for the file
  * name, text for the contents — the engine's whole-file record model,
  * SURVEY.md §1.2). This closes the loop: the same code golden-tested
  * against the sequential oracle is also hash-checked against SQL.
  */
object MRQueries {

  /** Run an MRApp over (doc_id-as-name, text) records via the holistic
    * Aggregator; output is the reference's (key, value) string pairs.
    */
  private def runApp(s: SparkSession, dir: String, app: MRApp): DataFrame = {
    implicit val kvEnc: org.apache.spark.sql.Encoder[KV] =
      org.apache.spark.sql.Encoders.product[KV]
    implicit val bufEnc: org.apache.spark.sql.Encoder[(String, List[String])] =
      org.apache.spark.sql.Encoders.kryo[(String, List[String])]
    val reduce = udaf(new HolisticReduce(app))
    Tables(s, dir).documents
      .select(col("doc_id").cast("string").as("name"), col("text"))
      .as[(String, String)](org.apache.spark.sql.Encoders
        .tuple(org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.STRING))
      .flatMap { case (name, text) => app.map(name, text) }
      .groupBy(col("key"))
      .agg(reduce(col("key"), col("value")).as("value"))
  }

  /** DuckDB restatement of WordCount.tokenize (wc.go:23-26): split on
    * runs of non-Unicode-letters, case-PRESERVING. Deliberately not
    * TextQueries.wordsExprDuck, which lowercases and splits on [^a-z]+ —
    * the two only coincide on all-lowercase-ASCII text; this oracle
    * stays faithful on any corpus.
    */
  private val mrWordsDuck =
    """list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '')"""

  val defs: Seq[QDef] = Seq(
    // wc.go semantics end-to-end: tokenize on non-letters, value is the
    // occurrence count as a decimal STRING (the reference's string-only
    // data plane, SURVEY.md §1.1).
    QDef(
      "q42_mrapp_wordcount",
      (s, dir) => runApp(s, dir, WordCount),
      Some(s"""
        SELECT word AS key, CAST(COUNT(*) AS VARCHAR) AS value
        FROM (SELECT unnest($mrWordsDuck) AS word
              FROM documents) t
        GROUP BY word
      """)),

    // indexer.go semantics: per-doc distinct words; value is
    // "%d %s" with the doc-name list sorted BYTE-WISE (doc ids as
    // strings: "10" < "2") and comma-joined.
    QDef(
      "q43_mrapp_indexer",
      (s, dir) => runApp(s, dir, Indexer),
      Some(s"""
        SELECT word AS key,
               CAST(COUNT(*) AS VARCHAR) || ' ' ||
                 string_agg(name, ',' ORDER BY name) AS value
        FROM (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS name,
                     unnest($mrWordsDuck) AS word
              FROM documents) t
        GROUP BY word
      """))
  )
}
