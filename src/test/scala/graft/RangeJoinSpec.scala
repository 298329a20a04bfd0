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

  test("bucket math is exact beyond 2^53 (nanosecond-epoch regime)") {
    // round-5 advice: floor(col/width) computed in IEEE double loses the
    // low bits above 2^53 and can mis-bucket by one. Facts sit just inside/
    // outside an interval whose bounds straddle a bucket edge near 2^60 —
    // the off-by-one double rounding would drop or duplicate these pairs.
    val base = 1152921504606846976L // 2^60
    val f = Seq((1L, base - 1L), (2L, base), (3L, base + 999L),
      (4L, base + 1000L)).toDF("fact_id", "t")
    val iv = Seq((100L, base, base + 1000L)).toDF("iv_id", "s", "e")
    Seq(7L, 1000L, 1000000007L).foreach { w =>
      val got = RangeJoin.joinByRange(f, iv, Seq.empty, "t", "s", "e", w)
        .select("fact_id").as[Long].collect().sorted
      withClue(s"width=$w")(assert(got === Array(2L, 3L)))
    }
    // overlap join at the same magnitude: [base, base+10) vs a touching,
    // an overlapping and a nested neighbour
    val a = Seq((1L, base, base + 10L)).toDF("id", "s", "e")
    val b = Seq((10L, base + 10L, base + 20L), (20L, base + 3L, base + 5L),
      (30L, base - 5L, base + 1L)).toDF("id", "s", "e")
    val got = RangeJoin.joinByOverlap(a, b, Seq.empty, "s", "e", 9L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 20L), (1L, 30L)))
  }

  // interval fixture for the overlap join: varied spans (incl. spans far
  // wider than the bucket), an empty interval, clustered starts so
  // touching/nested/multi-bucket-shared cases all occur
  private lazy val segsA = (1 to 60).map { i =>
    val s = (i * 613 % 3000).toLong
    (i.toLong, (i % 4).toLong, s, s + (if (i % 11 == 0) 0L else (i * 271 % 900 + 1)))
  }.toDF("id", "k", "s", "e")
  private lazy val segsB = (1 to 60).map { j =>
    val s = (j * 449 % 3000).toLong
    (j.toLong, (j % 4).toLong, s, s + (if (j % 13 == 0) 0L else (j * 157 % 500 + 1)))
  }.toDF("id", "k", "s", "e")

  private def naiveOverlap =
    segsA.toDF("a_id", "k", "a_s", "a_e")
      .join(segsB.toDF("b_id", "k2", "b_s", "b_e"), col("k") === col("k2"))
      // overlap = nonempty intersection; the bare a_s<b_e && b_s<a_e
      // predicate alone would claim an EMPTY interval sitting strictly
      // inside the other "overlaps" — [x,x) contains no points
      .where(col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
        col("a_s") < col("a_e") && col("b_s") < col("b_e"))
      .select("k", "a_id", "a_s", "a_e", "b_id", "b_s", "b_e")

  test("bucketed overlap join matches the naive predicate at any width, " +
    "each pair exactly once") {
    Seq(16L, 128L, 100000L).foreach { w =>
      val got = RangeJoin.joinByOverlap(segsA, segsB, Seq("k"), "s", "e", w)
        .select("k", "a_id", "a_s", "a_e", "b_id", "b_s", "b_e")
      withClue(s"width=$w") {
        // exceptAll is multiset difference: catches duplicate emissions a
        // set-based except would hide (the max-start-bucket rule's job)
        assert(got.exceptAll(naiveOverlap).isEmpty && naiveOverlap.exceptAll(got).isEmpty)
      }
    }
  }

  test("overlap join: touching intervals do not match; nested ones do; " +
    "keyless mode works") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("id", "s", "e")
    val b = Seq((10L, 10L, 20L), (20L, 22L, 25L), (30L, 5L, 21L)).toDF("id", "s", "e")
    val got = RangeJoin.joinByOverlap(a, b, Seq.empty, "s", "e", 8L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a1 [0,10) touches b10 [10,20): NO. b30 [5,21) overlaps both a's;
    // b20 [22,25) nests inside a2 [20,30)
    assert(got == Set((1L, 30L), (2L, 30L), (2L, 20L)))
  }
}
