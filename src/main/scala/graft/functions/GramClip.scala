package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** gram_clip(candidate, reference, n) → array<bigint> [clip, totc, totr]
  *
  * The clipped n-gram overlap of a candidate against a reference — the
  * inner kernel of BLEU (Papineni et al. 2002) and chrF (Popović 2015):
  *   clip = Σ_g min(count_cand(g), count_ref(g))   (modified precision
  *   numerator), totc/totr = the candidate/reference n-gram totals.
  *
  * Two modes by input type, fixed at analysis:
  *   - (string, string, n): CHARACTER n-grams over code points —
  *     exactly `substring(s, i, n)` windows, the chrF convention.
  *   - (array<string>, array<string>, n): WORD n-grams over token
  *     arrays — exactly `concat_ws(' ', slice(w, i, n))` windows.
  *
  * Why a native expression: candidate and reference live in the SAME
  * row, so the metric is row-local by nature — but the composed
  * formulation must explode ~(orders × length) gram rows per document
  * and aggregate them on (doc, n, gram), which at sf0.1 moved ~8×
  * corpus-characters through q251's one exchange (11.3 s; the r10
  * bench's slowest query). This kernel builds a per-row hash multiset
  * of the reference grams and streams the candidate grams through it —
  * O(len · n) per row, ZERO gram rows, zero shuffles: BLEU/chrF become
  * pure narrow maps at any corpus size. Counts are exact integers, so
  * cross-engine determinism is by construction (the DuckDB oracles
  * keep the relational formulation — same integers, different plan).
  *
  * Null inputs yield NULL (never a fabricated zero); inputs shorter
  * than n yield [0, 0, 0]-style exact window counts (max(len−n+1, 0)).
  */
case class GramClip(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_clip"
  override def nullable: Boolean = first.nullable || second.nullable

  private def isTokenMode: Boolean = first.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val okPair = (first.dataType, second.dataType) match {
      case (StringType, StringType) => true
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case _ => false
    }
    if (!okPair)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two strings or two array<string> " +
          s"arguments, got ${first.dataType.sql} and ${second.dataType.sql}")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int n, got ${third.sql}")
    else {
      val n = third.eval()
      if (n == null || n.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(c: Any, r: Any, n: Any): Any =
    if (isTokenMode)
      GramClipOps.clipWords(c.asInstanceOf[ArrayData],
        r.asInstanceOf[ArrayData], n.asInstanceOf[Int])
    else
      GramClipOps.clipChars(c.asInstanceOf[UTF8String],
        r.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  // One static call per ROW (the loop lives in compiled Scala) — the
  // expression stays inside the WholeStageCodegen span like
  // dot_product; there is nothing to gain from inlining a HashMap
  // loop into generated Java.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fn = if (isTokenMode) "clipWords" else "clipChars"
    nullSafeCodeGen(ctx, ev, (c, r, n) =>
      s"${ev.value} = graft.functions.GramClipOps.$fn($c, $r, $n);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): GramClip =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GramClip {
  def clip(cand: Column, ref: Column, n: Int): Column =
    Bridge.column(GramClip(Bridge.expression(cand), Bridge.expression(ref),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}

/** Static kernels for [[GramClip]] (top-level object → Java-callable
  * static forwarders for the generated code).
  */
object GramClipOps {

  /** Character n-grams over CODE POINTS (UTF8String.substring
    * semantics — identical to Spark's `substring` and DuckDB's
    * `substr`, so supplementary-plane characters count as one).
    */
  def clipChars(cand: UTF8String, ref: UTF8String, n: Int): ArrayData = {
    // decode to code points ONCE: UTF8String.substring walks bytes
    // from the start on every call, which would make the window loop
    // O(len²) per row
    val c = cand.toString.codePoints.toArray
    val r = ref.toString.codePoints.toArray
    val totc = math.max(c.length - n + 1, 0)
    val totr = math.max(r.length - n + 1, 0)
    val m = new java.util.HashMap[String, Integer](totr * 2 + 4)
    var i = 0
    while (i < totr) {
      val g = new String(r, i, n)
      val p = m.get(g)
      m.put(g, if (p == null) 1 else p + 1)
      i += 1
    }
    var clip = 0L
    i = 0
    while (i < totc) {
      val g = new String(c, i, n)
      val p = m.get(g)
      if (p != null && p > 0) { clip += 1L; m.put(g, p - 1) }
      i += 1
    }
    new GenericArrayData(Array(clip, totc.toLong, totr.toLong))
  }

  /** Word n-grams over token arrays; the gram key is the space-joined
    * window (`concat_ws(' ', slice(w, i, n))` — injective for the
    * engine tokenizer's `[a-z]+` tokens). Null tokens join as empty
    * strings, matching concat_ws.
    */
  def clipWords(cand: ArrayData, ref: ArrayData, n: Int): ArrayData = {
    def toks(a: ArrayData): Array[String] = {
      val out = new Array[String](a.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
        i += 1
      }
      out
    }
    def key(w: Array[String], i: Int): String =
      if (n == 1) w(i)
      else {
        val sb = new java.lang.StringBuilder(w(i))
        var j = 1
        while (j < n) { sb.append(' ').append(w(i + j)); j += 1 }
        sb.toString
      }
    val c = toks(cand)
    val r = toks(ref)
    val totc = math.max(c.length - n + 1, 0)
    val totr = math.max(r.length - n + 1, 0)
    val m = new java.util.HashMap[String, Integer](totr * 2 + 4)
    var i = 0
    while (i < totr) {
      val g = key(r, i)
      val p = m.get(g)
      m.put(g, if (p == null) 1 else p + 1)
      i += 1
    }
    var clip = 0L
    i = 0
    while (i < totc) {
      val g = key(c, i)
      val p = m.get(g)
      if (p != null && p > 0) { clip += 1L; m.put(g, p - 1) }
      i += 1
    }
    new GenericArrayData(Array(clip, totc.toLong, totr.toLong))
  }
}
