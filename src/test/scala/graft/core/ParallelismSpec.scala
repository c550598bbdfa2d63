package graft.core

import java.util.concurrent.atomic.AtomicInteger

import graft.TestSpark
import graft.apps.NoCrash
import org.scalatest.funsuite.AnyFunSuite

/** mtiming/rtiming analog (SURVEY.md §2.3): the reference probes live
  * sibling workers via pid marker files; here tasks bump a shared
  * in-JVM counter (valid in local mode — executors share the test JVM)
  * and we assert ≥2 map tasks and ≥2 reduce tasks overlapped.
  */
object ParallelismProbe {
  val mapCur, mapMax, redCur, redMax = new AtomicInteger(0)
  def enter(cur: AtomicInteger, max: AtomicInteger): Unit = {
    val c = cur.incrementAndGet()
    max.getAndUpdate(m => math.max(m, c))
    Thread.sleep(250)
  }
  def exit(cur: AtomicInteger): Unit = { cur.decrementAndGet(); () }
}

object InstrumentedApp extends MRApp {
  val name = "timing"
  def map(file: String, contents: String): Seq[KV] = {
    ParallelismProbe.enter(ParallelismProbe.mapCur, ParallelismProbe.mapMax)
    try NoCrash.map(file, contents)
    finally ParallelismProbe.exit(ParallelismProbe.mapCur)
  }
  def reduce(key: String, values: Seq[String]): String = {
    ParallelismProbe.enter(ParallelismProbe.redCur, ParallelismProbe.redMax)
    try NoCrash.reduce(key, values)
    finally ParallelismProbe.exit(ParallelismProbe.redCur)
  }
}

class ParallelismSpec extends AnyFunSuite {
  test("map and reduce phases each run >=2 tasks concurrently") {
    val spark = TestSpark.spark
    val inputs = Seq("whale.txt", "garden.txt", "numbers.txt", "repeat.txt")
      .map(f => TestSpark.resource(s"books/$f"))
    val out = TestSpark.tmpDir("mr-timing")
    MapReduce.run(spark, inputs, InstrumentedApp, nReduce = 4, out)
    assert(ParallelismProbe.mapMax.get() >= 2,
      s"map parallelism ${ParallelismProbe.mapMax.get()}")
    assert(ParallelismProbe.redMax.get() >= 2,
      s"reduce parallelism ${ParallelismProbe.redMax.get()}")
  }
}
