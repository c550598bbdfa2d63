package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-probe generator is measurement infrastructure — if it
  * silently produced correlated copies, the "10× is sublinear" evidence
  * would be measuring an easier workload than claimed. This spec pins
  * the synthesis contract on a small blow-up:
  *  - copy 0 is the ORIGINAL rows (ids, text, vectors untouched), so
  *    seed-id conventions keep holding on the blown-up corpus;
  *  - salted document copies share NO fingerprint (and therefore no
  *    shingle-derived structure) with the originals;
  *  - rotated embedding copies preserve the norm while changing
  *    direction;
  *  - row counts scale exactly by the multiplier.
  */
class ScaleProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  private lazy val dst = {
    val out = TestSpark.tmpDir("scaleprobe-spec")
    ScaleProbe.generate(spark, 3, src, out)
    out
  }

  test("documents: exact 3x rows, copy 0 verbatim, salted copies disjoint") {
    val orig = spark.read.parquet(s"$src/documents.parquet")
    val blown = spark.read.parquet(s"$dst/documents.parquet")
    val n = orig.count()
    assert(blown.count() == 3 * n)
    // copy 0 = the original rows, byte-for-byte
    val copy0 = blown.where(col("doc_id") < n)
      .select(col("doc_id"), col("text"))
    assert(copy0.exceptAll(orig.select(col("doc_id"), col("text")))
      .isEmpty, "copy 0 must be the original rows unchanged")
    // no fingerprint collision between originals and salted copies —
    // the property that keeps dedup workloads ~linear in the blow-up
    val fp = (d: org.apache.spark.sql.DataFrame) =>
      d.select(graft.queries.Q.fingerprint(col("text")).as("fp"))
    val shared = fp(blown.where(col("doc_id") >= n))
      .join(fp(orig), "fp").count()
    assert(shared == 0, s"salted copies share $shared fingerprints")
  }

  test("embeddings: 3x rows, copy 0 verbatim, rotation preserves norms") {
    val orig = spark.read.parquet(s"$src/embeddings.parquet")
    val blown = spark.read.parquet(s"$dst/embeddings.parquet")
    val n = orig.count()
    assert(blown.count() == 3 * n)
    val norm = expr(
      "aggregate(embedding, 0d, (a, x) -> a + cast(x as double) * x)")
    // norms of copy k equal the norms of the originals (a rotation),
    // compared as rounded multisets
    val normsOf = (d: org.apache.spark.sql.DataFrame) =>
      d.select(round(norm, 6).as("n2")).groupBy("n2").count()
        .collect().map(_.toString).sorted.toSeq
    val o = normsOf(orig)
    assert(normsOf(blown.where(col("vec_id") >= n && col("vec_id") < 2 * n))
      == o, "rotated copy must preserve the norm multiset")
    // but directions must differ for non-constant vectors: copy-1
    // vectors equal to their original are (near-)rotation-invariant —
    // require that to be rare (the synthetic corpus has none)
    val same = blown.where(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("vec_id"),
        col("embedding").as("rot"))
      .join(orig, "vec_id")
      .where(col("rot") === col("embedding"))
      .count()
    assert(same == 0, s"$same rotated vectors identical to the original")
  }
}
