package graft

/** Dump `.explain("formatted")` for the given queries to files — the
  * per-round plan-evidence artifact (plans/r{N}/<q>_{before,after}.txt).
  * The r16 optimizations are all gated on `spark.graft.fuse`, so BOTH
  * shapes come from one binary: `before` = fuse off (the r15 plan),
  * `after` = fuse on (default).
  *
  * A change that lives INSIDE a checkpointed sub-plan is invisible to
  * the production dump (the ckpt renders as Scan ExistingRDD — the r15
  * verdict's evidence gap); pass suffix `full_before`/`full_after` to
  * dump with checkpoints DISABLED (Ckpt.disabled, the audit-spec flag)
  * so the sub-plan shapes are directly visible. Nothing executes in
  * that mode.
  *
  * usage: runMain graft.PlanDump <outDir> <suffix> <fuse> <sfDir> q...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, fuse, sfDir) = args.take(4)
    val names = args.drop(4)
    val spark = Sessions.localSized("graft-plandump", "32", sfDir)
    spark.conf.set("spark.graft.fuse", fuse)
    if (suffix.startsWith("full_")) Ckpt.disabled = true
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[plandump] $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
