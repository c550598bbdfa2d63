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
  * identical to TextQueries.wordsExpr. Lowercasing is Locale.ROOT in
  * every generator here: Spark's `lower()` is locale-independent, and
  * the default-locale form would diverge under tr/az JVM locales
  * ('I' → dotless 'ı', dropped by the [^a-z]+ split).
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val words = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)
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

  def shinglesWithCount(text: Column, n: Int = 3): Column =
    Bridge.column(ShinglesWithCount(Bridge.expression(text), n))
}

/** shingles_with_count(text, n): [[Shingles]] additionally emitting the
  * document's DISTINCT-shingle total alongside every row, schema
  * (shingle, n) with n typed long.
  *
  * Why: every consumer of the shingle relation that needs per-doc set
  * sizes (Jaccard denominators) previously derived them with
  * `count(*) over (partition by doc_id)` — a full Exchange + Sort of
  * the corpus-sized shingle relation purely to count rows that were
  * generated CONTIGUOUSLY per document one operator earlier (guide
  * §2.4: remove shuffles outright). The generator already buffers the
  * doc's distinct set to dedup it, so the count is free at generation
  * time and shingle+n becomes a pure map stage with zero shuffles.
  * Values are identical to the window formulation (same distinct set,
  * same long count), so downstream results cannot change.
  */
case class ShinglesWithCount(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) ::
      StructField("n", org.apache.spark.sql.types.LongType,
        nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val words = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)
    if (words.length < n) return Iterator.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val cnt = seen.size.toLong
    val it = seen.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow =
        InternalRow(UTF8String.fromString(it.next()), cnt)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShinglesWithCount = copy(child = newChild)
}

/** positioned_shingles(text, n): every word n-gram with its 0-based
  * start position, schema (pos, gram) — NOT deduplicated (positions
  * are the payload; q190/q219/SpanIndex match gram occurrences on
  * diagonals). Replaces `posexplode(transform(sequence(...), i ->
  * array_join(slice(ws, i+1, n), ' ')))`: same rows, one streaming
  * pass per document with no per-gram Column machinery and no
  * intermediate array allocation (r15; the [[Shingles]] rationale).
  * Tokenization matches wordsExpr, same as [[Shingles]].
  */
case class PositionedShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("pos", org.apache.spark.sql.types.IntegerType,
      nullable = false) ::
      StructField("gram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val words = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split("[^a-z]+").filter(_.nonEmpty)
    if (words.length < n) return Iterator.empty
    val sb = new java.lang.StringBuilder()
    (0 to words.length - n).iterator.map { i =>
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      InternalRow(i, UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): PositionedShingles = copy(child = newChild)
}

object PositionedShingles {
  def positionedShingles(text: Column, n: Int): Column =
    Bridge.column(PositionedShingles(Bridge.expression(text), n))
}

/** winnow(text, k, w): MOSS-style winnowing fingerprints as a Generator —
  * hash every k-char gram (first 8 hex chars of md5, matching the SQL
  * restatement `substring(md5(substring(lower(text), i, k)), 1, 8)`),
  * emit the DISTINCT minimum of each w-gram window. Same rationale as
  * [[Shingles]]: the composed formulation needs a 2M-row window
  * sort+shuffle at sf0.1 (4.7s); this computes the minima in one local
  * pass per document.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("fp", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val text = v.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT)
    val nGrams = text.length - k + 1
    if (nGrams < 1) return Iterator.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val digest = md.digest(text.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars == substring(md5hex, 1, 8)
      val sb = new java.lang.StringBuilder(8)
      var b = 0
      while (b < 4) {
        sb.append(Character.forDigit((digest(b) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(digest(b) & 0xf, 16))
        b += 1
      }
      hs(i) = sb.toString
      i += 1
    }
    val nWindows = nGrams - w + 1
    if (nWindows < 1) return Iterator.empty
    val seen = new java.util.HashSet[String]()
    (0 until nWindows).iterator.flatMap { j =>
      var m = hs(j)
      var t = j + 1
      while (t < j + w) {
        if (hs(t).compareTo(m) < 0) m = hs(t)
        t += 1
      }
      if (seen.add(m)) Iterator.single(InternalRow(UTF8String.fromString(m)))
      else Iterator.empty
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    Bridge.column(Winnow(Bridge.expression(text), k, w))
}
