package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native span-cut edit: drop every token whose 0-based position falls
 * inside any [span_start, span_end] range and re-join the survivors on
 * single spaces — the edit half of span dedup (q73) and surgical
 * decontamination (q76). The declarative chain (transform + filter +
 * exists + concat_ws) runs interpreted per TOKEN × RANGE; this is one
 * compiled pass per document with a sorted-range pointer, inside
 * whole-stage codegen. Semantics are EXACTLY the chain's (and the SQL
 * oracles'): split on single space keeping empty tokens, NULL/empty
 * ranges keep every token (still the canonical single-space rebuild),
 * NULL text rebuilds to the empty string (concat_ws-over-null
 * behavior), correct even for unsorted or overlapping range arrays.
 *
 * `right` is an array<struct<span_start long, span_end long>> column —
 * the per-document collect of Dedup's merged interval frames.
 */
case class CutTokenRanges(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cut_ranges"

  override def eval(input: InternalRow): Any =
    CutTokenRanges.compute(
      left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = l.code + r.code +
      code"UTF8String ${ev.value} = graft.expressions.CutTokenRanges.compute(" +
      code"${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CutTokenRanges {
  /** One-pass cut; called from generated code. Null-tolerant by design —
    * see the class doc for the exact null contract. */
  def compute(text: UTF8String, ranges: ArrayData): UTF8String = {
    if (text == null) return UTF8String.EMPTY_UTF8
    val tokens = text.toString.split(" ", -1)
    val n = if (ranges == null) 0 else ranges.numElements()
    if (n == 0) return UTF8String.fromString(tokens.mkString(" "))
    val sorted = new Array[(Long, Long)](n)
    var k = 0
    while (k < n) {
      val row = ranges.getStruct(k, 2)
      sorted(k) = (row.getLong(0), row.getLong(1))
      k += 1
    }
    java.util.Arrays.sort(sorted, Ordering.by((p: (Long, Long)) => p._1))
    val sb = new java.lang.StringBuilder
    var p = 0
    var first = true
    var i = 0
    while (i < tokens.length) {
      // ranges with end < i can never cover i or anything later; any
      // covering range must then have start <= i (starts are sorted, so
      // no later range can start at or before i if this one doesn't)
      while (p < n && sorted(p)._2 < i) p += 1
      val covered = p < n && sorted(p)._1 <= i
      if (!covered) {
        if (!first) sb.append(' ')
        sb.append(tokens(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def column(text: Column, ranges: Column): Column =
    GraftSqlBridge.column(CutTokenRanges(
      GraftSqlBridge.expression(text), GraftSqlBridge.expression(ranges)))
}
