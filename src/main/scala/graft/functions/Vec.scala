package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math over `array<float>` embedding columns, computed entirely in
 * Catalyst expressions (whole-stage codegen; no UDF, no driver collect).
 *
 * Precision contract: every element is cast float→double BEFORE arithmetic
 * and sums fold strictly left-to-right, so the result is a deterministic
 * IEEE-754 double — bit-reproducible across engines evaluating the same
 * fold (needed for the external SQL oracle, and for stable top-k ordering
 * across partitionings at scale).
 */
object Vec {

  /** array<float> → array<double>. */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right double dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubles(a), toDoubles(b), _ * _), lit(0.0), _ + _)

  /** Squared L2 norm (left-to-right). */
  def normSq(a: Column): Column =
    aggregate(toDoubles(a), lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity = dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance, left-to-right fold of squared diffs. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDoubles(a), toDoubles(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))
}
