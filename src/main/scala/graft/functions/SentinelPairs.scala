package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** sentinel_pairs(s): adjacent token bigrams of a sentinel-encoded
  * corpus row `'<w1><w2>…<wn>'`, one (w1, w2) row per adjacent pair —
  * the q216/q226 BPE trainer's pair stream.
  *
  * Replaces
  * `explode(transform(sequence(1, size(arr)-1), i -> named_struct(…)))`
  * over `split(substring(s, 2, length(s)-2), '><')`: same rows, one
  * streaming pass per document with no token array, no struct-array
  * allocation, and no per-pair Column machinery (the r15 [[Shingles]]
  * rationale). Token boundaries are the literal `><` separators inside
  * the outer sentinels, exactly what the split formulation produced —
  * tokens are never empty (words are non-empty and merges only join
  * them), and a row with fewer than two tokens emits nothing, matching
  * the `size(arr) >= 2` pre-filter.
  */
case class SentinelPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("w1", StringType, nullable = false) ::
      StructField("w2", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String].toString
    if (s.length < 2) return Iterator.empty
    // tokens live between the outer '<' and '>'; split on the literal
    // "><" separators
    val body = s.substring(1, s.length - 1)
    val toks = body.split("><", -1)
    if (toks.length < 2) return Iterator.empty
    (0 until toks.length - 1).iterator.map { i =>
      InternalRow(UTF8String.fromString(toks(i)),
        UTF8String.fromString(toks(i + 1)))
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): SentinelPairs = copy(child = newChild)
}

object SentinelPairs {
  def sentinelPairs(s: Column): Column =
    Bridge.column(SentinelPairs(Bridge.expression(s)))
}
