package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The Reduce contract as typed Aggregators (SURVEY.md §2.4).
  *
  * The general path is holistic — `Reduce(key, values)` sees the complete
  * value list and need not be associative (the indexer sorts and joins
  * it) — so [[HolisticReduce]] buffers the whole group, exactly like the
  * reference building `values []string` before the call
  * (`/root/reference/mr/worker.go:191-195`). Partial aggregation still
  * helps: buffers merge across partitions without first serializing rows
  * through a `collect_list` + UDF hop.
  *
  * When an app declares combinability, a specialized Aggregator unlocks
  * true map-side combining — [[WordCountCombining]] reduces wc's shuffle
  * from one row per token occurrence to one (word, count) per partition,
  * the Combiner upgrade the reference never implemented
  * (map output goes to disk unaggregated, worker.go:131-149).
  */
object MRAggregators {

  /** Wraps any MRApp reduce. Buffer = (key, reversed values). */
  final class HolisticReduce(app: MRApp)
      extends Aggregator[KV, (String, List[String]), String] {
    def zero: (String, List[String]) = ("", Nil)
    def reduce(b: (String, List[String]), kv: KV): (String, List[String]) =
      (kv.key, kv.value :: b._2)
    def merge(a: (String, List[String]), b: (String, List[String])): (String, List[String]) =
      (if (a._1.nonEmpty) a._1 else b._1, a._2 ::: b._2)
    def finish(b: (String, List[String])): String = app.reduce(b._1, b._2)
    // kryo: the buffer is shuffle-transient, never stored columnar
    def bufferEncoder: Encoder[(String, List[String])] =
      Encoders.kryo[(String, List[String])]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** wc's reduce (`values.size.toString`) as a combinable aggregate:
    * partial counts merge associatively — map-side combine applies.
    */
  object WordCountCombining extends Aggregator[KV, Long, String] {
    def zero: Long = 0L
    def reduce(b: Long, kv: KV): Long = b + 1
    def merge(a: Long, b: Long): Long = a + b
    def finish(b: Long): String = b.toString
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Dataset-native MR run: the same five stages as MapReduce.run but as
    * a typed aggregation — Catalyst plans the shuffle, partial merge and
    * final reduce. Output is unordered (key, value) pairs; file-layout
    * fidelity stays with MapReduce.run.
    */
  def runDataset(
      spark: SparkSession,
      inputs: Seq[String],
      app: MRApp): Dataset[(String, String)] = {
    import spark.implicits._
    val agg = new HolisticReduce(app).toColumn
    MapReduce.mapStage(spark, inputs, app)
      .map { case (k, v) => KV(k, v) }
      .toDS()
      .groupByKey(_.key)
      .agg(agg.name("value"))
  }
}
