package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: 300 facts across 5 keys, 20
  // intervals (some overlapping, one empty, one out of range)
  private lazy val facts = (1 to 300).map { i =>
    (i.toLong, (i * 7919 % 5).toLong, (i * 104729 % 10000).toLong)
  }.toDF("fact_id", "k", "t")
  private lazy val intervals = (1 to 20).map { j =>
    val start = (j * 613 % 9000).toLong
    val span = if (j % 7 == 0) 0L else (j * 271 % 3000 + 1).toLong // j%7==0 → empty
    (j.toLong, (j % 5).toLong, start, start + span)
  }.toDF("iv_id", "k", "s", "e")

  private def naive =
    facts.join(intervals, facts("k") === intervals("k") &&
        col("t") >= col("s") && col("t") < col("e"))
      .select(facts("fact_id"), facts("k"), col("t"), col("iv_id"), col("s"), col("e"))

  test("bucketed range join matches the naive range predicate exactly") {
    // bucket width far smaller than spans AND far larger — both must agree
    Seq(50L, 500L, 100000L).foreach { w =>
      val got = RangeJoin.joinByRange(facts, intervals, Seq("k"), "t", "s", "e", w)
        .select("fact_id", "k", "t", "iv_id", "s", "e")
      withClue(s"width=$w")(assert(got.except(naive).isEmpty && naive.except(got).isEmpty))
      // exactly-once: no dedup stage exists, so pair multiplicity must be 1
      withClue(s"width=$w")(assert(got.count() === naive.count()))
    }
  }

  test("keyless mode joins on the bucket alone and still matches") {
    val naiveK = facts.join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .select("fact_id", "t", "iv_id")
    val got = RangeJoin.joinByRange(facts, intervals.drop("k"), Seq.empty, "t", "s", "e", 500L)
      .select("fact_id", "t", "iv_id")
    assert(got.except(naiveK).isEmpty && naiveK.except(got).isEmpty)
    assert(got.count() === naiveK.count())
  }

  test("empty intervals (end <= start) match nothing and never break bucketing") {
    val onlyEmpty = intervals.where(col("e") <= col("s"))
    assert(onlyEmpty.count() > 0) // fixture really contains them
    assert(RangeJoin.joinByRange(facts, onlyEmpty, Seq("k"), "t", "s", "e", 500L).count() === 0)
  }

  test("plan is an equi-join on (keys, bucket) — no cartesian, no BNLJ") {
    val p = RangeJoin.joinByRange(facts, intervals, Seq("k"), "t", "s", "e", 500L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("negative times bucket correctly (floor, not truncate-toward-zero)") {
    val f = Seq((1L, -10L), (2L, -1L), (3L, 0L), (4L, 9L)).toDF("fact_id", "t")
    val iv = Seq((100L, -15L, 5L)).toDF("iv_id", "s", "e")
    val got = RangeJoin.joinByRange(f, iv, Seq.empty, "t", "s", "e", 7L)
    assert(got.select("fact_id").as[Long].collect().sorted === Array(1L, 2L, 3L))
  }
}
