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
      """))
  )
}
