package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — Spark startup
  * dominates suite time otherwise). Built through GraftSession.configure so
  * the specs run under the SAME session contract as the engine mains —
  * a contract flag the tests rely on (AQE, UTC, nanosAsLong) can't drift
  * out of `configure` without a spec noticing. */
object SparkSpec {
  lazy val spark: SparkSession = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4"))
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSpec.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
