package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Star-contraction vs a sequential union-find oracle on randomized
  * graphs — deterministic seeds so failures replay. Shapes chosen to
  * stress the algorithm where naive propagation breaks: long paths
  * (diameter >> rounds), dense blocks, self-loops, duplicate and
  * reversed edges.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = par.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); par(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-label per member, non-roots only — the run() contract
    par.keys.map(k => k -> find(k)).filter { case (k, r) => k != r }.toMap
  }

  // smallGraphEdges = 0 pins the distributed star-contraction loop;
  // the default takes the single-task union-find endgame. Both paths
  // must agree with the sequential oracle on every shape.
  private def run(edges: Seq[(Long, Long)], small: Long): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("u", "v"), smallGraphEdges = small)
      .as[(Long, Long)].collect().toMap
  }

  private val paths = Seq(
    "star-contraction" -> 0L, "union-find endgame" -> Long.MaxValue)

  for ((label, small) <- paths) {
    test(s"random graphs match the union-find oracle [$label]") {
      val rnd = new scala.util.Random(42)
      for (trial <- 0 until 5) {
        val n = 30 + rnd.nextInt(50)
        val m = n / 2 + rnd.nextInt(2 * n)
        val edges = Seq.fill(m)(
          (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        assert(run(edges, small) == unionFind(edges.filter(e => e._1 != e._2)),
          s"trial $trial n=$n m=$m")
      }
    }

    test(s"a 60-node path needs far more hops than contraction rounds [$label]") {
      val edges = (0L until 59L).map(i => (i, i + 1))
      val got = run(edges, small)
      assert(got == (1L to 59L).map(_ -> 0L).toMap)
    }

    test(s"duplicate, reversed, and self-loop edges are harmless [$label]") {
      val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 4L),
        (4L, 2L), (5L, 5L))
      assert(run(edges, small) == Map(2L -> 1L, 4L -> 1L))
    }
  }
}
