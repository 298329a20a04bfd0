package graft.expressions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Deterministic MODE() WITHIN GROUP as a typed Aggregator (SURVEY §7.3 —
 * the one aggregate Spark lacks a deterministic built-in for): most
 * frequent value, ties broken to the SMALLEST value — the Postgres
 * `MODE() WITHIN GROUP (ORDER BY v)` rule. Spark's built-in `mode()` is
 * tie-arbitrary.
 *
 * The buffer is a value→count map, merged map-side like any partial
 * aggregate, so a mode fits inside a single groupBy/agg pass next to
 * numeric aggregates (one scan, one shuffle). Use this form for
 * low-cardinality value domains (enums, categories); for unbounded value
 * domains prefer the counts-then-argmax shape
 * (graft.operators.Aggregates.deterministicMode), which never holds a
 * per-group map.
 */
object DeterministicModeAgg extends Aggregator[String, Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(m: Map[String, Long]): String =
    if (m.isEmpty) null
    else m.minBy { case (value, count) => (-count, value) }._1

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column API: modeOf(col("comfort_level")) inside any agg(...). */
  def modeOf(c: Column): Column = udaf(DeterministicModeAgg).apply(c)
}
