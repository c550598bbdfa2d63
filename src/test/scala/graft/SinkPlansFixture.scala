package graft

/** One shared sink-index fixture for the plan gates: builds every
  * sink's index over sf0.001 into a tmp root, once per test JVM
  * (suites run sequentially, so the lazy init is race-free). Both
  * PlanQualitySpec and ShuffleBudgetSpec read it — building twice
  * would double a ~1-minute fixture for no isolation gain.
  */
object SinkPlansFixture {
  val dataDir = "/root/testdata/sf0.001"
  lazy val idxRoot: String = {
    val root = TestSpark.tmpDir("sink-plans-idx")
    graft.sinks.SinkPlans.buildAll(TestSpark.spark, dataDir, root)
    root
  }
}
