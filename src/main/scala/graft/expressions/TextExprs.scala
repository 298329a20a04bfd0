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
