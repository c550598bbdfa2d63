package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The prefix-filter lemma behind q111 must hold on adversarial set
  * families, not just the gate corpus: for J >= t, two sets ordered by
  * the global (df, token) order MUST share a token within their first
  * n - ceil(t*n) + 1 elements. This spec re-runs the full filtered
  * pipeline on seeded random set families (skewed token frequencies,
  * many near-threshold pairs) and compares against the O(n²) brute
  * force.
  */
class SimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bruteForce(sets: Map[Long, Set[String]], t: Double) =
    (for {
      (x, sx) <- sets.toSeq; (y, sy) <- sets.toSeq if x < y
      i = (sx & sy).size
      j = i.toDouble / (sx.size + sy.size - i)
      if j >= t
    } yield (x, y, math.rint(j * 1e6) / 1e6)).toSet

  private def filtered(sets: Map[Long, Set[String]], t: Double) = {
    import spark.implicits._
    val sh = sets.toSeq.flatMap { case (id, s) => s.map(id -> _) }
      .toDF("doc_id", "g")
    val dfreq = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val docs = sh.join(dfreq, "g")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("arr"))
      .select(col("doc_id"),
        expr("transform(arr, e -> e.g)").as("grams"),
        size(col("arr")).as("n"),
        expr(s"""transform(slice(arr, 1,
            size(arr) - cast(ceil(${t}d * size(arr)) as int) + 1),
            e -> e.g)""").as("prefix"))
    // mirrors q111's candidate generation INCLUDING the length and
    // positional prunes — the random net must cover the filters that
    // could dismiss a true pair
    val posts = docs.select(col("doc_id"), col("n"),
      posexplode(col("prefix")).as(Seq("pos", "g")))
    val cands = posts.alias("a")
      .join(posts.alias("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
          col("b.n") * lit(1.0) >= lit(t) * col("a.n") &&
          col("a.n") * lit(1.0) >= lit(t) * col("b.n") &&
          (lit(1) + least(col("a.n") - col("a.pos"),
            col("b.n") - col("b.pos"))) * lit(1.0 + t) >=
            lit(t) * (col("a.n") + col("b.n")))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y")).distinct()
    cands
      .join(docs.select(col("doc_id").as("x"), col("grams").as("gx"),
        col("n").as("nx")), "x")
      .join(docs.select(col("doc_id").as("y"), col("grams").as("gy"),
        col("n").as("ny")), "y")
      .withColumn("i", size(array_intersect(col("gx"), col("gy")))
        .cast("bigint"))
      .where(col("i") / (col("nx") + col("ny") - col("i")) >= t)
      .select(col("x"), col("y"),
        round(col("i") / (col("nx") + col("ny") - col("i")), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  test("prefix filter loses no pairs on skewed random set families") {
    val rnd = new Random(20260813L)
    for (trial <- 1 to 3; t <- Seq(0.3, 0.5, 0.8)) {
      // Zipf-ish token pool: low ids are hot, high ids rare; clone-and-
      // mutate half the sets to force many near-threshold pairs
      val base = Seq.tabulate(40) { i =>
        val size = 3 + rnd.nextInt(12)
        i.toLong -> Iterator.continually(
          s"t${(math.pow(rnd.nextDouble(), 2.5) * 60).toInt}")
          .take(size * 3).toSet.take(size)
      }
      val mutated = base.take(20).map { case (id, s) =>
        val drop = s.take(1 + rnd.nextInt(2))
        (id + 100) -> (s -- drop + s"t${rnd.nextInt(60)}")
      }
      val sets = (base ++ mutated).toMap.filter(_._2.nonEmpty)
      val want = bruteForce(sets, t)
      val got = filtered(sets, t)
      assert(got == want,
        s"trial $trial t=$t: filtered=${got.size} brute=${want.size}; " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}
