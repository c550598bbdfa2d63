package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for Verify/Bench/tests.
  *
  * Scale posture: shuffle partitions sized to local cores (the cluster
  * equivalent is 2-3x total executor cores), AQE on so skewed shuffles
  * and undersized partitions re-plan at runtime, and nanosecond parquet
  * timestamps admitted as longs (normalized in [[Tables.events]]).
  */
object Sessions {
  /** `master` accepts the bare core count ("8") or a full local spec
    * ("4,4" for maxFailures); shuffle partitions default to the core
    * count. `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides the partition
    * count alone — the knob a scale probe needs when the DATA grows
    * but the box doesn't (at 100× rows, 32 partitions give each task
    * 100× the aggregation state and the fixed heap OOMs; on a real
    * cluster partitions scale with data, so the probe must be allowed
    * to as well). AQE coalesces small partitions back at runtime, so
    * oversizing is safe at every SF.
    */
  /** Pure arithmetic of [[derivedShufflePartitions]], spec-testable:
    * partitions = max(cores, ceil(inputBytes / targetBytesPerTask)).
    * A hash aggregation's per-task state is proportional to (input
    * bytes / partitions), so holding bytes-per-task constant as the
    * data grows is what keeps a fixed heap out of
    * AGGREGATE_OUT_OF_MEMORY — the r12 100× probe hit exactly that
    * with 32 partitions pinned while rows grew 100×. On a real
    * cluster partitions scale with data for the same reason.
    */
  def partitionsFor(inputBytes: Long, cores: Int,
      targetBytesPerTask: Long = 16L << 20): Int =
    math.max(cores,
      ((inputBytes + targetBytesPerTask - 1) / targetBytesPerTask)
        .min(Int.MaxValue).toInt)

  /** Leading core count of a local master spec ("8", "8,4"), with the
    * literal `*` token (local[*]'s "all host cores", a valid spec
    * `SPARK_GRAFT_CPUS` may carry) mapping to the host's processor
    * count. Any OTHER non-integer token is a typo and throws — a
    * silent fall-through to the host count would size the session and
    * every derived partition floor to the box instead of failing fast
    * at startup where the bad spec is visible.
    */
  private[graft] def coresOf(master: String): Int = {
    val tok = master.takeWhile(_ != ',')
    if (tok == "*") Runtime.getRuntime.availableProcessors
    else tok.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"bad core spec '$master': leading token must be an integer or *"))
  }

  /** Shuffle-partition floor derived from the on-disk input size —
    * the 100× OOM guardrail made automatic: instead of leaving
    * `SPARK_GRAFT_SHUFFLE_PARTITIONS` a purely manual knob a probe
    * operator must remember, the session measures the data directory
    * and sizes partitions to the DATA, not the box. The 16 MiB
    * default is ON-DISK (compressed parquet) bytes per task ≈ 128 MiB
    * decompressed at the ~8× ratio typical for text-heavy parquet —
    * i.e. the `maxPartitionBytes` convention restated in the units a
    * directory listing can actually measure. At sf0.1 (~18 MB) the
    * floor stays the core count and nothing changes; at the r12 100×
    * probe dir (~1.8 GB) it derives ~110 partitions — precisely the
    * sizing whose absence produced that probe's
    * AGGREGATE_OUT_OF_MEMORY. AQE coalesces the excess back at
    * runtime, so oversizing costs nothing at small SFs.
    */
  def derivedShufflePartitions(dataDir: String, cores: Int,
      targetBytesPerTask: Long = 16L << 20,
      conf: Option[org.apache.hadoop.conf.Configuration] = None): Int = {
    // `conf` lets a post-session caller pass
    // sparkContext.hadoopConfiguration; the default fresh Configuration
    // (pre-session callers like localSized have nothing else) resolves
    // file:// and hdfs:// but NOT schemes needing configured fs impls
    // or credentials — those land in the catch below, which must be
    // LOUD: a silent 0-byte probe would quietly degrade the floor to
    // the core count, the exact OOM this guardrail exists to prevent.
    val bytes = try {
      val p = new org.apache.hadoop.fs.Path(dataDir)
      val fs = p.getFileSystem(
        conf.getOrElse(new org.apache.hadoop.conf.Configuration()))
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    } catch {
      case e: Throwable =>
        System.err.println(s"[sessions] size probe on $dataDir failed " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}) — shuffle " +
          "partitions fall back to the core count; pass the session's " +
          "hadoopConfiguration or set SPARK_GRAFT_SHUFFLE_PARTITIONS")
        0L
    }
    partitionsFor(bytes, cores, targetBytesPerTask)
  }

  /** [[local]] with the data-derived shuffle-partition floor:
    * `SPARK_GRAFT_SHUFFLE_PARTITIONS` still overrides (the manual
    * escape hatch), otherwise partitions =
    * [[derivedShufflePartitions]] over `dataDir`. Announces a derived
    * setting above the core count so a probe log names the sizing
    * rule that was applied.
    */
  def localSized(appName: String, master: String,
      dataDir: String): SparkSession = {
    val cores = coresOf(master)
    val derived = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .map(_.toInt)
      .getOrElse(derivedShufflePartitions(dataDir, cores))
    if (derived > cores)
      System.err.println(s"[sessions] $dataDir → " +
        s"spark.sql.shuffle.partitions=$derived (data-derived floor; " +
        "override with SPARK_GRAFT_SHUFFLE_PARTITIONS)")
    local(appName, master, Some(derived))
  }

  def local(appName: String, master: String,
      shufflePartitions: Option[Int] = None): SparkSession = {
    val parts = shufflePartitions.map(_.toString).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
        coresOf(master).toString))
    val spark = SparkSession.builder()
      .master(s"local[$master]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // preferSortMergeJoin stays at Spark's default (true): an r15
      // order-alternating in-JVM A/B over eight join-heavy queries
      // measured allowing SHJ as a slight net LOSS (14.8 s vs 13.8 s)
      // — an earlier apparent 1.2-2× SHJ win was an artifact of a
      // biased A/B protocol (the second variant always re-ran the
      // same query warm). Recorded in OPTIMIZATION_r15.md.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
