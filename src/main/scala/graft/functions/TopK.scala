package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator.
  *
  * The window-function formulation (row_number over partitionBy) sorts
  * every group's FULL row set; this aggregator keeps only k rows per
  * group in a bounded buffer that merges associatively — map-side
  * partial aggregation sends at most k rows per group per partition to
  * the shuffle, which is the shape that survives groups with millions of
  * rows. Ordering: descending by `sortKey`, ties broken ascending by
  * `tieBreak` (a total order, so results are deterministic).
  */
final class TopK[T](k: Int, sortKey: T => Double, tieBreak: T => Long)(
    implicit enc: Encoder[Seq[T]])
    extends Aggregator[T, Seq[T], Seq[T]] {

  private def order(a: T, b: T): Boolean = {
    val (ka, kb) = (sortKey(a), sortKey(b))
    ka > kb || (ka == kb && tieBreak(a) < tieBreak(b))
  }

  private def trim(xs: Seq[T]): Seq[T] =
    xs.sortWith(order).take(k)

  def zero: Seq[T] = Vector.empty
  def reduce(b: Seq[T], a: T): Seq[T] =
    if (b.size < k || order(a, b.last)) trim(b :+ a) else b
  def merge(a: Seq[T], b: Seq[T]): Seq[T] = trim(a ++ b)
  def finish(r: Seq[T]): Seq[T] = r
  def bufferEncoder: Encoder[Seq[T]] = enc
  def outputEncoder: Encoder[Seq[T]] = enc
}

object TopK {
  def apply[T](k: Int, sortKey: T => Double, tieBreak: T => Long)(
      implicit enc: Encoder[Seq[T]]): TopK[T] =
    new TopK(k, sortKey, tieBreak)
}
