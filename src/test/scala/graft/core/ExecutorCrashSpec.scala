package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Drives [[graft.apps.ExecutorCrashDemo]] in a child JVM: an executor
  * JVM is halted mid-job on a real local-cluster (process blast radius,
  * matching crash.go's os.Exit) and the job must still produce the
  * uncrashed result. A child process is required because this JVM
  * already hosts the shared local[4,4] test SparkContext.
  */
class ExecutorCrashSpec extends AnyFunSuite {

  test("executor JVM kill mid-job recovers to the uncrashed result") {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    // Reuse this JVM's --add-opens flags (Spark-on-JDK17 module opens).
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .sliding(2).collect {
        case Seq("--add-opens", v) => Seq("--add-opens", v)
      }.flatten.toSeq
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.apps.ExecutorCrashDemo")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    // The in-JVM standalone Worker builds executor commands through the
    // launcher, which needs the scala version when SPARK_HOME is a
    // distribution without load-spark-env.sh having run.
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val finished = proc.waitFor()
    assert(finished == 0,
      s"ExecutorCrashDemo exited $finished; last output:\n" +
        out.linesIterator.toSeq.takeRight(40).mkString("\n"))
    assert(out.contains("[executor-crash] OK"))
  }
}
