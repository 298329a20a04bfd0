package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus cleaning funnel — the C4/Gopher-style quality cascade: an ordered
 * list of keep-predicates where every document is charged to the FIRST
 * stage it fails (or "pass"). Production corpus reports are exactly this
 * shape: "web crawl → 23% dropped too-short, 11% low-stopword, …" — the
 * attribution must be first-failure, not any-failure, or the stage counts
 * double-count and stop summing to the corpus size.
 *
 * Scale shape: the whole cascade is ONE when-chain in a narrow projection
 * (zero shuffles — cleaning 100 TB costs one scan); the report adds a
 * single hash aggregation whose cardinality is the stage count.
 */
object Cleaning {

  /** Attach first-failing-stage columns (`drop_stage_idx`, `drop_stage`);
    * documents passing every stage get (stages.size, "pass"). Predicates
    * are KEEP conditions, evaluated in order. */
  def withDropStage(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val chain = stages.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, ((name, keep), i)) =>
        val branch = struct(lit(i.toLong).as("idx"), lit(name).as("name"))
        Some(acc.fold(when(!keep, branch))(_.when(!keep, branch)))
    }.get.otherwise(struct(lit(stages.size.toLong).as("idx"), lit("pass").as("name")))
    df.withColumn("__stage", chain)
      .withColumn("drop_stage_idx", col("__stage.idx"))
      .withColumn("drop_stage", col("__stage.name"))
      .drop("__stage")
  }

  /** Documents surviving every stage (the cleaned corpus). */
  def survivors(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    withDropStage(df, stages).where(col("drop_stage") === "pass")
      .drop("drop_stage_idx", "drop_stage")

  /** Per-stage drop accounting: (drop_stage_idx, drop_stage, n_docs);
    * stages dropping nothing emit no row, counts sum to the corpus size. */
  def funnelReport(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    withDropStage(df, stages)
      .groupBy("drop_stage_idx", "drop_stage")
      .agg(count(lit(1)).as("n_docs"))
}
