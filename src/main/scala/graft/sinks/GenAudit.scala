package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Generation-ledger audit — the fsck for the persisted index estate:
  * one report over any set of sinks' gen-delta trees reconciling
  * CLAIMED generation ids (`_gen_claims/gen=<g>` markers from
  * [[DeltaIO.nextPlainGen]]) against PRESENT delta subtrees
  * (`<rel>_delta/gen=<g>`), per sink and generation. A data lead runs
  * this before freezing a corpus: the one anomaly that needs action is
  * a PARTIAL generation (some of a sink's relations carry the gen,
  * others don't — the crash window between a multi-relation append's
  * writes; replay the generation or delete the stragglers).
  *
  * Status vocabulary (presence-derived; `claimed` is reported
  * separately because streaming appends use caller-assigned
  * non-negative gens and never claim):
  *  - `complete`   — every relation of at least one of the sink's
  *    relation GROUPS carries the gen ([[VectorIndex]] has two
  *    single-relation groups, raw `postings` and `pq_postings`,
  *    because its two append families allocate from ONE claim ledger
  *    but write disjoint trees; all other sinks are one group).
  *  - `partial`    — the gen is present in some but not all relations
  *    of every group: the mid-append crash window. ACTION REQUIRED.
  *  - `claim_only` — a marker with no data anywhere: either an
  *    allocation that crashed before its first write, or a generation
  *    a maintenance job folded into the main tree and dropped
  *    ([[VectorIndex.splitHotCells]]). Benign — the id is burned,
  *    which is exactly what the claim protocol guarantees.
  *
  * Cost: pure driver-side directory listings, O(#generations +
  * #claims) per sink — the same listing class as [[DeltaIO
  * .nextPlainGen]] itself, independent of index data size; the report
  * materializes as a local relation. GenAuditSpec plants each anomaly
  * (orphan claim, straggler-deleted partial, unclaimed streaming gen)
  * and pins the verdicts.
  */
object GenAudit {

  /** Relation groups per sink (a gen is complete when it fully covers
    * ≥1 group) — the write sets of each sink's `appendDelta`.
    */
  val relGroups: Map[String, Seq[Seq[String]]] = Map(
    "DedupIndex" -> Seq(Seq("fingerprints", "bands")),
    "TextIndex" -> Seq(Seq("postings", "doclens", "stats")),
    "SpanIndex" -> Seq(Seq("grams", "dfs", "docs")),
    "ContamIndex" -> Seq(Seq("postings", "docs")),
    "LmIndex" -> Seq(Seq("bigrams", "words")),
    "VectorIndex" -> Seq(Seq("postings"), Seq("pq_postings")),
    "ClusterIndex" -> Seq(
      Seq("shingles", "assign", "clusters", "srcstats", "docs")))

  /** Audit `sinkDirs` (sink name from [[relGroups]] → index dir) into
    * (sink, gen, claimed, present_rels, missing_rels, status), one row
    * per generation id seen in either ledger, ordered by (sink, gen).
    */
  def audit(spark: SparkSession,
      sinkDirs: Map[String, String]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    def listGenDirs(p: String): Set[Long] = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path)) Set.empty
      else fs.listStatus(path).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen="))
        .flatMap(n =>
          scala.util.Try(n.stripPrefix("gen=").toLong).toOption)
        .toSet
    }
    val rows = sinkDirs.toSeq.sortBy(_._1).flatMap { case (name, dir) =>
      val groups = relGroups.getOrElse(name,
        throw new IllegalArgumentException(s"unknown sink: $name"))
      val rels = groups.flatten.distinct
      val present: Map[String, Set[Long]] =
        rels.map(r => r -> listGenDirs(s"$dir/${r}_delta")).toMap
      val claimed = listGenDirs(s"$dir/_gen_claims")
      val allGens = (claimed ++ present.values.flatten).toSeq.sorted
      allGens.map { g =>
        val have = rels.filter(r => present(r).contains(g))
        val status =
          if (groups.exists(_.forall(have.contains))) "complete"
          else if (have.isEmpty) "claim_only"
          else "partial"
        val missing =
          if (status == "complete") Seq.empty[String]
          else rels.filterNot(have.contains)
        Row(name, g, claimed.contains(g), have, missing, status)
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("sink", StringType, nullable = false),
        StructField("gen", LongType, nullable = false),
        StructField("claimed", BooleanType, nullable = false),
        StructField("present_rels", ArrayType(StringType), false),
        StructField("missing_rels", ArrayType(StringType), false),
        StructField("status", StringType, nullable = false))))
  }
}
