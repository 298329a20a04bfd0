package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native word-n-gram shingling. The declarative version
 * (transform(sequence) + slice + concat_ws) is a higher-order expression —
 * interpreted per element and O(tokens²) per document because each slice
 * re-walks the token array; it dominated the n-gram dedup queries. This
 * expression makes one pass per document in compiled code, while keeping
 * EXACTLY the declarative semantics (split on single space keeping empty
 * tokens, shingle = n consecutive tokens joined by one space, empty array
 * when fewer than n tokens) so the external SQL oracle still matches.
 *
 * Codegen emits a call to the static [[WordShingles.compute]] — the loop
 * runs in compiled Scala and the expression stays inside whole-stage
 * codegen (no CodegenFallback for the surrounding plan).
 */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native per-document n-gram repetition statistics — the inner loop of the
 * Gopher repetition screens (Rae 2021 A1.2). Returns `[top_chars,
 * dup_covered_chars]`:
 *
 *  - `top_chars`: occurrences × token-character mass of the most frequent
 *    word n-gram (ties on count break to the LARGEST mass — deterministic,
 *    and the conservative screen; public reimplementations inherit hash
 *    order here). A count-1 "most common" n-gram still contributes its own
 *    mass, matching the public filters.
 *  - `dup_covered_chars`: token-character mass of positions covered by at
 *    least one n-gram occurring ≥ 2 times in the document, overlapping
 *    occurrences counted ONCE (position mask, not count × length).
 *
 * Character mass is token characters only (spaces excluded) — the same
 * units as `length(replace(text, ' ', ''))`, the denominator the rule
 * thresholds divide by. Tokenization is the engine-wide split-on-single-
 * space contract. One hash-map pass per document in compiled code via the
 * static [[NgramRepetition.compute]]; the expression stays inside
 * whole-stage codegen.
 */
case class NgramRepetition(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "n-gram size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ngram_repetition"

  override def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NgramRepetition.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramRepetition {
  /** One-pass counting + position-mask coverage; called from generated
    * code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val m = tokens.length
    if (m < n) return new GenericArrayData(Array[Any](0L, 0L))
    val cnt = m - n + 1
    val lens = new Array[Int](m)
    var j = 0
    while (j < m) { lens(j) = tokens(j).length; j += 1 }

    // count occurrences per n-gram key (single-space join, the shingle
    // string contract) and remember each position's key + token mass
    val counts = new java.util.HashMap[String, Int](cnt * 2)
    val keys = new Array[String](cnt)
    val mass = new Array[Long](cnt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var w = 0L
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(tokens(i + k))
        w += lens(i + k)
        k += 1
      }
      val key = sb.toString
      keys(i) = key
      mass(i) = w
      counts.put(key, counts.getOrDefault(key, 0) + 1)
      i += 1
    }

    // most frequent n-gram: max count, ties to max mass
    var maxCount = 0
    var topMass = 0L
    i = 0
    while (i < cnt) {
      val c: Int = counts.get(keys(i))
      if (c > maxCount || (c == maxCount && mass(i) > topMass)) {
        maxCount = c; topMass = mass(i)
      }
      i += 1
    }
    val topChars = maxCount.toLong * topMass

    // duplicated-n-gram coverage mask over token positions
    val covered = new Array[Boolean](m)
    i = 0
    while (i < cnt) {
      if (counts.get(keys(i)) >= 2) {
        var p = i
        val end = i + n
        while (p < end) { covered(p) = true; p += 1 }
      }
      i += 1
    }
    var dupChars = 0L
    j = 0
    while (j < m) { if (covered(j)) dupChars += lens(j); j += 1 }

    new GenericArrayData(Array[Any](topChars, dupChars))
  }

  def column(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramRepetition(GraftSqlBridge.expression(text), n))
}

object WordShingles {
  /** One-pass shingle construction; called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // split on single space, keeping empty tokens (Spark split(text, " ")
    // semantics with limit -1)
    val s = text.toString
    val tokens = s.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val count = tokens.length - n + 1
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))
}
