package graft

import graft.expressions.{CosineSimilarity, DotProduct, DotProductFD, NgramRepetition, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * Session extensions registering graft's native expressions as SQL
 * functions, so `spark.sql("SELECT graft_cosine(a, b) ...")` works and the
 * engine is usable from pure-SQL clients (thriftserver, notebooks).
 *
 * Wire up with either:
 *   SparkSession.builder.withExtensions(new GraftExtensions) ...
 *   --conf spark.sql.extensions=graft.GraftExtensions
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(arrayA, arrayB)")
        CosineSimilarity(args.head, args(1))
      }),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(args.head, args(1))
      }),
    ("graft_dot_fd",
      new ExpressionInfo(classOf[DotProductFD].getName, "graft_dot_fd"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot_fd(floatArray, doubleArray)")
        DotProductFD(args.head, args(1))
      }),
    ("graft_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingles(text, n)")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an integer literal, got $other")
        }
        WordShingles(args.head, n)
      }),
    ("graft_ngram_repetition",
      new ExpressionInfo(classOf[NgramRepetition].getName, "graft_ngram_repetition"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_ngram_repetition(text, n) -> [top_chars, dup_covered_chars]")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_ngram_repetition n must be an integer literal, got $other")
        }
        NgramRepetition(args.head, n)
      }))

  /** Register into an already-running session (notebooks, tests). */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, name, info, builder)
    }
}
