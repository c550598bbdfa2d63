package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** shingles(text, n): custom Catalyst Generator emitting the DISTINCT
  * word n-gram shingles of a document, one row each.
  *
  * Why a custom UDTF instead of composition: the composed formulation
  * (posexplode + window lead + distinct) costs a shuffle for the window
  * and another for the distinct before any dedup work starts; an
  * array-based formulation trips Catalyst filter-inlining into O(len²)
  * (see DedupQueries). This generator tokenizes, slides, and dedups in
  * one streaming pass per row — shingle generation becomes a pure map
  * stage with ZERO shuffles, which at 100 TB means the only shuffles in
  * MinHash/Jaccard are the ones keyed by signature/shingle.
  *
  * Tokenization matches wc.go (split on non-letters, lowercased) —
  * identical to TextQueries.wordsExpr.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val words = v.asInstanceOf[UTF8String].toString
      .toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    if (words.length < n) return Iterator.empty
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()
    (0 to words.length - n).iterator.flatMap { i =>
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s))
        Iterator.single(InternalRow(UTF8String.fromString(s)))
      else Iterator.empty
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  def shingles(text: Column, n: Int = 3): Column =
    Bridge.column(Shingles(Bridge.expression(text), n))
}
