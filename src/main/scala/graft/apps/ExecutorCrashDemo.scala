package graft.apps

import org.apache.spark.sql.SparkSession

/** Process-level crash fidelity. The reference's crash app kills the
  * whole WORKER PROCESS (`/root/reference/mrapps/crash.go:24`,
  * `os.Exit(1)`), while [[FaultInjected]] injects task-level
  * exceptions — same recovery semantics, smaller blast radius. This
  * demo closes that gap on a `local-cluster[2,2,1024]` standalone
  * cluster (real executor JVMs, not threads) with two scenarios, both
  * of which must converge to the uncrashed result:
  *
  *  1. MAP-stage kill: the first attempt of one partition halts its
  *     ENTIRE executor JVM (`Runtime.halt` — no shutdown hooks, exactly
  *     `os.Exit`), taking every concurrently running task with it; the
  *     Worker relaunches the executor and lost tasks reschedule (C3
  *     re-execution + C5 first-finish-wins, SURVEY.md §2.2).
  *  2. REDUCE-stage kill: the executor dies AFTER producing map output,
  *     destroying its local shuffle files (the analog of the
  *     reference's worker-local mr-* intermediates); the retried
  *     reducer hits FetchFailed and the DAGScheduler must RESUBMIT the
  *     already-finished map stage (C8 — re-execution of completed work
  *     after output loss), the hardest recovery path.
  *
  * Runs as a separate main (driven by ExecutorCrashSpec via a child
  * process) because a JVM hosts at most one SparkContext and the test
  * suites share a `local[4,4]` session. Exits 0 on success, 2 on a
  * result mismatch, 3 on watchdog timeout (e.g. executors never
  * launched).
  */
object ExecutorCrashDemo {

  /** Named Serializable function (NOT a lambda): executor-side
    * deserialization of Scala lambdas via extraClassPath hits
    * SerializedLambda/classloader mismatches on a standalone cluster; a
    * plain class round-trips cleanly. Partition 3's first attempt
    * (marker-file CAS) halts the whole executor JVM.
    */
  private final class CrashThenDouble(marker: String)
      extends ((Int, Iterator[Int]) => Iterator[Long]) with Serializable {
    def apply(pid: Int, it: Iterator[Int]): Iterator[Long] = {
      if (pid == 3 && new java.io.File(marker).createNewFile()) {
        // Kill the executor JVM mid-job — not just this task.
        Runtime.getRuntime.halt(1)
      }
      it.map(_.toLong * 2)
    }
  }

  /** Reduce-side kill: halting an executor AFTER the map stage also
    * destroys the shuffle files it served (local-disk shuffle, like the
    * reference's worker-local mr-* intermediates, SURVEY.md §1.3).
    * Recovery needs more than task retry: the retried reducer hits
    * FetchFailed and the DAGScheduler must RESUBMIT the finished map
    * stage (C8 — re-execution of completed work after output loss).
    */
  private final class CrashReducer(marker: String)
      extends ((Int, Iterator[(Long, Long)]) => Iterator[(Long, Long)])
      with Serializable {
    def apply(pid: Int, it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
      if (pid == 0 && new java.io.File(marker).createNewFile()) {
        Runtime.getRuntime.halt(1)
      }
      it
    }
  }

  private final class ModKey(groups: Int)
      extends (Int => (Long, Long)) with Serializable {
    def apply(x: Int): (Long, Long) = (x.toLong % groups, x.toLong)
  }

  private final class SumLong
      extends ((Long, Long) => Long) with Serializable {
    def apply(a: Long, b: Long): Long = a + b
  }

  def main(args: Array[String]): Unit = {
    // Watchdog: local-cluster failures manifest as a hang (job waits
    // forever for executor resources) — convert that to a clean exit 3.
    val watchdog = new Thread(() => {
      Thread.sleep(240000L)
      System.err.println("[executor-crash] watchdog timeout")
      Runtime.getRuntime.halt(3)
    })
    watchdog.setDaemon(true)
    watchdog.start()

    // First-attempt marker on the local FS, visible to both executor
    // JVMs (same host): guarantees exactly one kill, so the job
    // terminates just like crash.go's probabilistic exits eventually do.
    val marker = java.nio.file.Files.createTempDirectory("graft-crash")
      .resolve("killed").toString

    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-executor-crash")
      // Executor JVMs are launched by the standalone Worker from
      // SPARK_HOME; they need this application's classes too. Absolutize
      // every entry: executors run from their own work dir, where a
      // relative target/scala-2.13/classes silently resolves to nothing
      // (symptom: SerializedLambda ClassCastException on task deser).
      .config("spark.executor.extraClassPath",
        sys.props("java.class.path").split(java.io.File.pathSeparator)
          .map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    try {
      val sc = spark.sparkContext
      val n = 100000

      // Scenario 1: executor killed mid-MAP (result stage) — lost
      // running tasks reschedule onto the relaunched executor.
      val expected = (1 to n).map(_.toLong * 2).sum
      val result = sc.parallelize(1 to n, 8)
        .mapPartitionsWithIndex(new CrashThenDouble(marker))
        .collect()
        .sum
      if (result != expected) {
        System.err.println(s"[executor-crash] MAP MISMATCH: $result != $expected")
        spark.stop(); sys.exit(2)
      }
      println(s"[executor-crash] map-stage OK: $result == $expected")

      // Scenario 2: executor killed mid-REDUCE, after its map output was
      // produced — the retried reducer FetchFails against the dead
      // executor's shuffle files and the map stage must be resubmitted.
      val marker2 = marker + "-reduce"
      val groups = 16
      val expected2 = (1 to n).map(_.toLong).groupBy(_ % groups)
        .view.mapValues(_.sum).values.toSeq.sorted
      val result2 = sc.parallelize(1 to n, 8)
        .map(new ModKey(groups))
        .reduceByKey(new SumLong, 8)
        .mapPartitionsWithIndex(new CrashReducer(marker2),
          preservesPartitioning = true)
        .values.collect().toSeq.sorted
      if (result2 != expected2) {
        System.err.println(s"[executor-crash] REDUCE MISMATCH: $result2")
        spark.stop(); sys.exit(2)
      }
      println("[executor-crash] OK: reduce-stage kill recovered " +
        "(map output re-executed) and map-stage kill recovered")
      spark.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        System.err.println(s"[executor-crash] FAILED: $e")
        e.printStackTrace()
        sys.exit(2)
    }
  }
}
