package graft

import org.apache.spark.sql.Dataset

/** The ONE lineage-cut primitive every query/sink uses in place of a
  * bare `Dataset.localCheckpoint()`.
  *
  * Semantically identical to `localCheckpoint` in production: eagerly
  * materializes the plan so a relation that feeds multiple consumers
  * (both sides of a self-join, a superstep barrier) computes once and
  * downstream plans stay small.
  *
  * The reason it exists is AUDITABILITY: `localCheckpoint` eagerly
  * executes its upstream stages at query-CONSTRUCTION time, so the
  * physical plans the regression nets inspect (PlanQualitySpec /
  * ShuffleBudgetSpec) never contain the checkpointed sub-plans — a
  * data-sized unpartitioned window hidden behind a checkpoint would be
  * invisible to the gates (the round-7 verdict's growing blind spot).
  * Setting [[disabled]] makes `ckpt` a no-op, so a spec pass can build
  * every query's FULL plan — checkpoints included — and run the
  * window/cartesian gates over it. Production code never touches the
  * flag; it is test-only, flipped under try/finally by the audit spec
  * (suites run sequentially in the forked test JVM, so the global is
  * race-free there).
  */
object Ckpt {
  /** Test-only: when true, [[CkptOps.ckpt]] returns the dataset
    * unchanged so full plans stay inspectable.
    */
  @volatile var disabled: Boolean = false

  /** Barrier fusion (r16, guide §2.6/§5 — superstep chains burn most
    * of their wall clock in per-barrier job latency, not work): when
    * on (default), [[CkptOps.fuseCkpt]] skips the checkpoint so the
    * relation is computed inside its consumers' jobs instead of paying
    * a separate materialization job per superstep.
    * `spark.graft.fuse=false` restores the r15 one-barrier-per-step
    * shape — the A/B switch.
    */
  private[graft] def fuseOn(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.getOption("spark.graft.fuse").forall(_ == "true")

  implicit final class CkptOps[T](private val ds: Dataset[T])
      extends AnyVal {
    /** `localCheckpoint()` unless the audit flag is on.
      *
      * Stays EAGER by default: an r15 experiment flipping every ckpt
      * to lazy (folding materialization into the first consumer's job,
      * the ConnectedComponents trick) measured ~5-10 % SLOWER across a
      * 16-query superstep-heavy subset — under AQE, deferred finalize
      * stages interleave with consumer stages and multi-consumer
      * checkpoints pay block-manager contention. Lazy wins only in
      * single-consumer-per-step chains; the one committed opt-in is
      * ConnectedComponents' superstep loop. (mmrSelect/q260 measured
      * −19 % lazy in an ISOLATED A/B but regressed in every full-bench
      * run and stays eager — see the mmrSelect NOTE.)
      */
    def ckpt(): Dataset[T] = if (disabled) ds else ds.localCheckpoint()

    /** `localCheckpoint(eager)` unless the audit flag is on. */
    def ckpt(eager: Boolean): Dataset[T] =
      if (disabled) ds else ds.localCheckpoint(eager)

    /** Barrier elision for cheap DERIVED relations (argmax rows, small
      * per-step picks) whose separate materialization job costs more
      * than recomputing them inside each consumer: identity when
      * fusion is on (default — the consumer's job computes the
      * subtree, typically once via the broadcast build), `ckpt()`
      * when `spark.graft.fuse=false`. Only safe when the relation is
      * deterministic and cheap to recompute from its own checkpointed
      * inputs — results are identical either way, only the job count
      * changes.
      */
    def fuseCkpt(): Dataset[T] =
      if (Ckpt.fuseOn(ds.sparkSession)) ds else ds.ckpt()
  }
}
