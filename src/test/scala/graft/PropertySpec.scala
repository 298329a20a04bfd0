package graft

import graft.functions.{Enrich, Text}
import graft.gen.WeatherGenerator
import graft.operators.{Aggregates, Components, Dedup}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5 test plan): evaluated through the
  * engine in batches — one Spark job per property, not per case. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val temps = Gen.choose(-50.0, 60.0)

  private def evalPairs(pairs: Seq[(Double, Double)], expr: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Seq[Double] =
    pairs.toDF("a", "b").select(expr(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0)).toSeq

  test("property: F and K conversions invert to 1 decimal place") {
    val cases = Gen.listOfN(200, temps).sample.get
    val df = cases.toDF("c").select(
      col("c"),
      Enrich.celsiusToFahrenheit(col("c")).as("f"),
      Enrich.celsiusToKelvin(col("c")).as("k")).collect()
    df.foreach { r =>
      val (c, f, k) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs((f - 32.0) * 5.0 / 9.0 - c) < 0.06, s"F inversion off for $c")
      assert(math.abs(k - 273.15 - c) < 0.06, s"K inversion off for $c")
    }
  }

  test("property: heat index >= passthrough threshold behavior and monotone in humidity") {
    val ts = Gen.listOfN(60, Gen.choose(27.0, 45.0)).sample.get
    val pairs = for (t <- ts; h <- Seq(20.0, 50.0, 80.0)) yield (t, h)
    val his = evalPairs(pairs, Enrich.heatIndex)
    pairs.zip(his).groupBy(_._1._1).foreach { case (_, group) =>
      val byH = group.sortBy(_._1._2).map(_._2)
      assert(byH.sliding(2).forall(w => w(0) <= w(1) + 1e-9),
        s"heat index not monotone in humidity: $group")
    }
    // below 80F (26.66C): exact passthrough
    val low = Gen.listOfN(50, Gen.choose(-50.0, 26.0)).sample.get.map((_, 90.0))
    assert(evalPairs(low, Enrich.heatIndex) == low.map(_._1))
  }

  test("property: generator heat index is the engine heat index (differential oracle)") {
    val pairs = (for {
      t <- Gen.listOfN(300, temps).sample.get
      h <- Seq(Gen.choose(0.0, 100.0).sample.get)
    } yield (t, h)).distinct
    val engine = evalPairs(pairs, Enrich.heatIndex)
    val gen = pairs.map { case (t, h) => WeatherGenerator.heatIndexC(t, h) }
    assert(engine == gen)
  }

  test("property: alert level ordering is monotone in each driver") {
    val tiers = Map("NORMAL" -> 0, "WATCH" -> 1, "WARNING" -> 2, "CRITICAL" -> 3)
    val precips = Seq(0.0, 5.0, 10.1, 25.1, 50.1)
    val rows = precips.toDF("p").select(
      Enrich.alertLevel(lit(20.0), col("p"), lit(0.0), lit(10.0), lit(0)).as("a"))
      .collect().map(r => tiers(r.getString(0))).toSeq
    assert(rows.sliding(2).forall(w => w(0) <= w(1)), s"not monotone in precip: $rows")
    val winds = Seq(0.0, 40.1, 60.1, 80.1)
    val w = winds.toDF("w").select(
      Enrich.alertLevel(lit(20.0), lit(0.0), col("w"), lit(10.0), lit(0)).as("a"))
      .collect().map(r => tiers(r.getString(0))).toSeq
    assert(w.sliding(2).forall(x => x(0) <= x(1)), s"not monotone in wind: $w")
  }

  test("property: quality score lattice {0, 100/3, 200/3, 100}") {
    val allowed = Set(0.0, 1.0 / 3.0 * 100.0, 2.0 / 3.0 * 100.0, 100.0)
    val cases = Gen.listOfN(100, Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false), Gen.oneOf(true, false))).sample.get
    val scores = cases.toDF("a", "b", "c")
      .select(Enrich.qualityScore(col("a"), col("b"), col("c")).as("q"))
      .collect().map(_.getDouble(0))
    assert(scores.forall(allowed.contains), scores.distinct.mkString(","))
  }

  test("property: shingles of k tokens has max(0, k-n+1) entries; join inverts") {
    val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val docs = Gen.listOfN(80, Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, wordGen))).sample.get
      .map(_.mkString(" "))
    val n = 3
    val rows = docs.toDF("text")
      .select(col("text"), Text.shingles(col("text"), n).as("s")).collect()
    rows.foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      val sh = r.getSeq[String](1)
      assert(sh.size == math.max(0, toks.length - n + 1))
      // each shingle re-splits to exactly n consecutive tokens
      sh.zipWithIndex.foreach { case (g, i) =>
        assert(g.split(" ", -1).toSeq == toks.slice(i, i + n).toSeq)
      }
    }
  }

  test("property: fingerprint invariant under identity, changed by any token edit") {
    val docs = Seq("alpha beta gamma delta", "alpha beta gamma delta epsilon",
      "beta alpha gamma delta", "alpha beta gamma")
    val fps = docs.toDF("text").select(Text.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps.distinct.length == docs.length) // all four token streams differ
  }

  test("property: BoundedTopKAgg equals sort+slice under random keys and partitionings") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50) / 10.0, rnd.nextInt(1000).toLong)
    }
    for (k <- Seq(1, 2, 3); parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "key", "id").repartition(parts)
      val fast = df.groupBy("g")
        .agg(graft.expressions.BoundedTopKAgg.topIdsByKey(col("key"), col("id"), k).as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val slow = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(k).map(_._2).toSeq
      }
      assert(fast == slow, s"k=$k parts=$parts")
    }
  }

  /** Plain-JVM robust winnowing (the DedupSpec twin, re-stated here for
    * theorem-level randomized checks without Spark jobs per case). */
  private def winnowTwin(toks: IndexedSeq[String], k: Int, w: Int): Set[(Int, Long)] = {
    val hs = toks.sliding(k).filter(_.size == k)
      .map(g => graft.functions.Hashing.stableHash60Scala(g.mkString(" "))).toArray
    if (hs.isEmpty) Set.empty
    else (0 to math.max(hs.length - w, 0)).map { p =>
      val win = p to math.min(p + w - 1, hs.length - 1)
      val q = win.minBy(i => (hs(i), -i))
      (q, hs(q))
    }.toSet
  }

  test("property: winnowing guarantee holds on 200 random planted-passage pairs") {
    // THEOREM check (pure JVM, no Spark): two random docs sharing a random
    // verbatim passage of >= w+k-1 tokens ALWAYS share a fingerprint hash;
    // random vocab makes chance hash collisions impossible in practice.
    val rnd = new scala.util.Random(2026)
    val (k, w) = (4, 5)
    def words(n: Int) = IndexedSeq.fill(n)(s"v${rnd.nextInt(1 << 30)}")
    (1 to 200).foreach { i =>
      val passage = words(k + w - 1 + rnd.nextInt(10))
      val a = words(rnd.nextInt(30)) ++ passage ++ words(rnd.nextInt(30))
      val b = words(rnd.nextInt(30)) ++ passage ++ words(rnd.nextInt(30))
      val fa = winnowTwin(a, k, w).map(_._2)
      val fb = winnowTwin(b, k, w).map(_._2)
      assert((fa intersect fb).nonEmpty, s"case $i: guarantee violated")
    }
  }

  test("property: prefix-filter theorem holds on 300 random set pairs") {
    // THEOREM check: any pair with jaccard >= t shares an element within
    // BOTH prefixes (first |s|-ceil(t|s|)+1 elements in sorted order) —
    // the exactness premise of jaccardPairsPrefix (q117).
    val rnd = new scala.util.Random(7)
    Seq(0.3, 0.5, 0.8).foreach { t =>
      var checked = 0
      while (checked < 100) {
        // overlapping sets: shared core + per-side noise
        val core = Set.fill(1 + rnd.nextInt(40))(rnd.nextLong() >>> 4)
        val a = core ++ Set.fill(rnd.nextInt(30))(rnd.nextLong() >>> 4)
        val b = core ++ Set.fill(rnd.nextInt(30))(rnd.nextLong() >>> 4)
        val jac = (a intersect b).size.toDouble / (a union b).size
        if (jac >= t) {
          checked += 1
          def prefix(s: Set[Long]) =
            s.toSeq.sorted.take(s.size - math.ceil(t * s.size).toInt + 1).toSet
          assert((prefix(a) intersect prefix(b)).nonEmpty,
            s"t=$t jac=$jac |a|=${a.size} |b|=${b.size}")
        }
      }
    }
  }

  test("property: connected components equal brute-force union-find on " +
    "random graphs (sparse/dense/chain/cliques, two partitionings)") {
    // DIFFERENTIAL check: smallestIdPropagation (distributed pointer-jump
    // label propagation) vs an in-memory union-find with min-label
    // semantics. Wrong-on-long-chains and wrong-under-repartition are the
    // two historical failure modes of label propagation — both regimes are
    // in the graph mix.
    val rnd = new scala.util.Random(99)
    def randomEdges(n: Int, m: Int): Seq[(Long, Long)] =
      Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
    val chain = (0L until 40L).sliding(2).map(w => (w(0), w(1))).toSeq
    val cliques = (for (base <- Seq(100L, 200L); a <- 0 until 6; b <- a + 1 until 6)
      yield (base + a, base + b))
    val graphs = Seq(randomEdges(60, 20), randomEdges(60, 60),
      randomEdges(60, 150), chain ++ cliques)
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    for (edges <- graphs; parts <- Seq(1, 5)) {
      val pairs = edges.toDF("id_a", "id_b").repartition(parts)
      val fast = Components.smallestIdPropagation(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == unionFind(edges), s"|E|=${edges.size} parts=$parts")
    }
  }

  test("property: duplicatedSpanRanges equals the brute-force interval " +
    "scan on random planted-passage corpora") {
    // DIFFERENTIAL check: the single-pass posting-list + gaps-and-islands
    // plan (q62) vs a from-scratch JVM scan — mark position p of doc d iff
    // d's window-token span at p appears verbatim in ANY other doc, then
    // merge runs with gap <= window. Random vocab makes chance span
    // collisions impossible in practice; planted passages (some
    // overlapping, some back-to-back) exercise the merge edge cases.
    val rnd = new scala.util.Random(17)
    val window = 5
    def words(n: Int) = IndexedSeq.fill(n)(s"w${rnd.nextInt(1 << 30)}")
    (1 to 5).foreach { trial =>
      val base = (0 until 24).map(i => i.toLong -> words(10 + rnd.nextInt(50))).toMap
      // plant shared passages into random doc pairs (insertion point random,
      // so some docs get several marks; same passage may land twice)
      var docs = base
      (1 to 8).foreach { _ =>
        val passage = words(window + rnd.nextInt(7))
        val (a, b) = (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong)
        def insert(toks: IndexedSeq[String]) = {
          val at = rnd.nextInt(toks.size + 1)
          (toks.take(at) ++ passage ++ toks.drop(at)).toIndexedSeq
        }
        docs = docs + (a -> insert(docs(a))) + (b -> insert(docs(b)))
      }
      // brute force
      val spansOf = docs.map { case (id, toks) =>
        id -> toks.sliding(window).filter(_.size == window).map(_.mkString(" ")).toIndexedSeq
      }
      val expected = docs.keys.flatMap { id =>
        val others = spansOf.collect { case (o, ss) if o != id => ss }.flatten.toSet
        val marked = spansOf(id).zipWithIndex.collect { case (s, p) if others(s) => p.toLong }
        // merge runs: boundary where gap > window
        val runs = marked.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
          if (acc.nonEmpty && p <= acc.last.last + window) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        runs.map(r => (id, r.head, r.last + window - 1, r.size.toLong))
      }.toSet
      val got = Dedup.duplicatedSpanRanges(
          docs.toSeq.map { case (id, t) => (id, t.mkString(" ")) }.toDF("doc_id", "text"),
          "doc_id", "text", window)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"trial $trial: ${got.diff(expected)} vs ${expected.diff(got)}")
    }
  }

  test("property: bucketed simhash pairs equal brute-force hamming " +
    "all-pairs (pigeonhole exactness)") {
    // DIFFERENTIAL check: simhashNearDupPairs' chunk-bucket candidate plan
    // vs collecting every signature and filtering all O(n^2) pairs by
    // popcount. The pigeonhole claim — any pair at hamming <= maxDist
    // agrees on >= 1 of maxDist+1 signature chunks — makes the bucketed
    // plan EXACT; a missed pair here is a silent false negative in q40.
    // Mutated copies of shared base docs force a dense near-dup spectrum
    // (hamming values straddling the threshold both ways).
    val rnd = new scala.util.Random(23)
    val vocab = IndexedSeq.fill(120)(s"t${rnd.nextInt(1 << 30)}")
    def mutate(toks: IndexedSeq[String], k: Int): IndexedSeq[String] =
      (1 to k).foldLeft(toks)((t, _) => t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size))))
    val bases = (0 until 8).map(_ => IndexedSeq.fill(30)(vocab(rnd.nextInt(vocab.size))))
    val docs = (0 until 60).map { i =>
      i.toLong -> mutate(bases(i % bases.size), rnd.nextInt(4)).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val (maxDist, bits) = (3, 60)
    val sigs = Dedup.simhashSignatures(df, "doc_id", "text", bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dists = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
    } yield (a, b, java.lang.Long.bitCount(sigs(a) ^ sigs(b)))).toSeq
    val expected = dists.collect { case (a, b, d) if d <= maxDist => (a, b, d.toLong) }.toSet
    // the fixture must place pairs on BOTH sides of the threshold, close
    // to it — otherwise the exactness claim is tested on nothing
    assert(expected.exists(_._3 > 0), "need a non-identical passing pair")
    assert(dists.exists(d => d._3 > maxDist && d._3 <= maxDist + 8),
      "need a near-miss pair just above the threshold")
    val got = Dedup.simhashNearDupPairs(df, "doc_id", "text", maxDist, bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    assert(got == expected, s"${got.diff(expected)} vs ${expected.diff(got)}")
  }

  test("property: ngramJaccardPairs and containmentPairs equal brute-force " +
    "all-pairs set similarity on a mutated-copy corpus") {
    // DIFFERENTIAL check for the flagship near-dup operator: the
    // posting-list bucket-expansion plan (q18/q103) vs literally computing
    // every pair's distinct-shingle Jaccard / overlap coefficient in the
    // JVM. Mutated copies of shared bases put pair scores on both sides of
    // both thresholds; identical division order makes doubles comparable
    // exactly.
    val rnd = new scala.util.Random(31)
    val vocab = IndexedSeq.fill(150)(s"g${rnd.nextInt(1 << 30)}")
    def mutate(toks: IndexedSeq[String], k: Int): IndexedSeq[String] =
      (1 to k).foldLeft(toks)((t, _) => t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size))))
    val bases = (0 until 6).map(_ => IndexedSeq.fill(25)(vocab(rnd.nextInt(vocab.size))))
    val docs = (0 until 40).map { i =>
      i.toLong -> mutate(bases(i % bases.size), rnd.nextInt(6))
    }
    val n = 3
    val sets = docs.map { case (id, toks) =>
      id -> toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
    }.toMap
    def brute(score: (Set[String], Set[String]) => Double, t: Double) =
      (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        s = score(sets(a), sets(b)) if s >= t
      } yield (a, b, s)).toSet
    val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text")

    val jacT = 0.5
    val expJac = brute((x, y) => {
      val sh = (x intersect y).size
      sh.toDouble / (x.size + y.size - sh).toDouble
    }, jacT)
    val gotJac = Dedup.ngramJaccardPairs(df, "doc_id", "text", n, jacT)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expJac.nonEmpty && gotJac == expJac,
      s"${gotJac.diff(expJac)} vs ${expJac.diff(gotJac)}")

    val ovT = 0.6
    val expOv = brute((x, y) =>
      (x intersect y).size.toDouble / math.min(x.size, y.size).toDouble, ovT)
    val gotOv = Dedup.containmentPairs(df, "doc_id", "text", n, ovT)
      .select("id_a", "id_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expOv.nonEmpty && gotOv == expOv,
      s"${gotOv.diff(expOv)} vs ${expOv.diff(gotOv)}")
  }

  test("property: asOfJoin equals the brute-force latest-at-or-before scan " +
    "(dense time ties, both partitionings)") {
    // DIFFERENTIAL check: the union + carry-forward window plan vs the
    // naive per-left-row argmax over (time, tieBreak). Times are drawn
    // from a tiny domain so equal-time left/right and right/right
    // collisions are everywhere — exactly the regime where the side/tie
    // sort order either holds or silently leaks. Payload is a function of
    // (key, time, tie) so duplicate right rows are indistinguishable and
    // cannot fake a pass.
    val rnd = new scala.util.Random(5)
    val leftRows = (0 until 120).map { i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(30).toLong)
    } // (row_id, key, t)
    val rightRows = (0 until 80).map { _ =>
      val (k, t, tie) = (rnd.nextInt(6).toLong, rnd.nextInt(30).toLong, rnd.nextInt(5).toLong)
      (k, t, tie, k * 10000 + t * 100 + tie) // payload determined by (k,t,tie)
    }
    val expected = leftRows.map { case (id, k, t) =>
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(r => (r._2, r._3))._4))
    }.toMap
    for (parts <- Seq(1, 5)) {
      val left = leftRows.toDF("row_id", "key", "t").repartition(parts)
      val right = rightRows.toDF("key", "t", "tie", "payload").repartition(parts)
      val got = graft.operators.AsOf.asOfJoin(left, right, "key", "t",
          Seq("payload"), "tie")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(got == expected, s"parts=$parts: " +
        expected.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(5))
    }
  }

  test("property: trailingRange equals the brute-force [t-h, t] scan, " +
    "duplicate order values included") {
    // DIFFERENTIAL check: the range-frame window (q119) vs counting/summing
    // every same-key row in [t-h, t] directly. Times collide constantly
    // (domain 0..20) — range frames are peer-inclusive, so duplicates are
    // exactly where a rows-frame confusion would surface.
    val rnd = new scala.util.Random(13)
    val rows = (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(21).toLong, rnd.nextInt(100).toLong)
    } // (row_id, key, t, v)
    val h = 4L
    val expected = rows.map { case (id, k, t, _) =>
      val in = rows.filter(r => r._2 == k && r._3 >= t - h && r._3 <= t)
      id -> (in.size.toLong, in.map(_._4).sum)
    }.toMap
    for (parts <- Seq(1, 6)) {
      val df = rows.toDF("row_id", "key", "t", "v").repartition(parts)
      val got = Aggregates.trailingRange(df, Seq("key"), "t", col("v"), h)
        .select("row_id", "trail_n", "trail_sum")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("property: deterministicMode (window and typed-aggregator forms) " +
    "equals brute-force count-argmax with the Postgres tie rule") {
    // DIFFERENTIAL check: both MODE implementations vs per-key counting
    // with ties broken to the SMALLEST value. A tiny value domain plants
    // exact count ties in most keys — the case where Spark's built-in
    // mode() is arbitrary and these two must not be.
    val rnd = new scala.util.Random(47)
    val rows = (0 until 400).map { _ =>
      (rnd.nextInt(8).toLong, s"v${rnd.nextInt(4)}")
    }
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      val counts = rs.groupBy(_._2).map { case (v, g) => (v, g.size) }
      val maxC = counts.values.max
      k -> counts.filter(_._2 == maxC).keys.min
    }
    for (parts <- Seq(1, 6)) {
      val df = rows.toDF("key", "value").repartition(parts)
      val viaWindow = Aggregates.deterministicMode(df, Seq("key"), "value", "mode")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaTyped = df.groupBy("key")
        .agg(graft.expressions.DeterministicModeAgg.modeOf(col("value")).as("mode"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(viaWindow == expected, s"window form, parts=$parts")
      assert(viaTyped == expected, s"typed form, parts=$parts")
    }
  }

  test("property: PPJoin positional bound never prunes a qualifying pair " +
    "(300 random set pairs)") {
    // THEOREM check for prefixCandidatePairsPos (q117, round 6): at the
    // pair's SMALLEST shared element x, overlap <= 1 + min(|a|-i, |b|-j)
    // (i, j = 1-based positions of x in the sorted sets), and for any
    // pair at jaccard >= t the bound must clear the required overlap
    // ceil(t/(1+t)·(|a|+|b|)) under the exact epsilon-relaxed comparison
    // the operator ships — a pruned qualifying pair would be a silent
    // false negative in the gate.
    val rnd = new scala.util.Random(41)
    Seq(0.3, 0.5, 0.8, 0.9).foreach { t =>
      var checked = 0
      while (checked < 75) {
        val core = Set.fill(1 + rnd.nextInt(40))(rnd.nextLong() >>> 4)
        val a = core ++ Set.fill(rnd.nextInt(30))(rnd.nextLong() >>> 4)
        val b = core ++ Set.fill(rnd.nextInt(30))(rnd.nextLong() >>> 4)
        val jac = (a intersect b).size.toDouble / (a union b).size
        if (jac >= t) {
          checked += 1
          val x = (a intersect b).min
          val (sa, sb) = (a.toSeq.sorted, b.toSeq.sorted)
          val (i, j) = (sa.indexOf(x) + 1, sb.indexOf(x) + 1)
          val ubound = 1L + math.min(a.size - i, b.size - j)
          // the operator's shipped comparison, verbatim
          assert(ubound.toDouble >= t / (1.0 + t) * (a.size + b.size) - 1e-9,
            s"t=$t jac=$jac ubound=$ubound |a|=${a.size} |b|=${b.size}")
          // and the bound really is an upper bound on the true overlap
          assert((a intersect b).size <= ubound,
            s"bound $ubound under overlap ${(a intersect b).size}")
        }
      }
    }
  }

  /** Independent JVM twin of expressions.NgramRepetition: Map-based
    * counting over sliding token windows + an explicit coverage mask —
    * no shared code with the expression's hash-map pass. */
  private def repetitionTwin(toks: IndexedSeq[String], n: Int): (Long, Long) = {
    if (toks.length < n) return (0L, 0L)
    val grams = (0 to toks.length - n).map(i => toks.slice(i, i + n))
    val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
    val withMass = grams.map(g => (counts(g), g.map(_.length.toLong).sum))
    val (mc, _) = withMass.maxBy(_._1)
    val topMass = withMass.filter(_._1 == mc).map(_._2).max
    val covered = Array.fill(toks.length)(false)
    grams.zipWithIndex.foreach { case (g, i) =>
      if (counts(g) >= 2) (i until i + n).foreach(covered(_) = true)
    }
    val dup = toks.indices.collect { case j if covered(j) => toks(j).length.toLong }.sum
    (mc.toLong * topMass, dup)
  }

  test("property: NgramRepetition equals the from-scratch Map+mask twin " +
    "on 200 random small-alphabet documents at n in {2, 3, 5}") {
    // small alphabet + short words force frequent repeats, overlapping
    // duplicate windows, and count ties with distinct masses — the three
    // regimes where the compiled pass could silently diverge
    val rnd = new scala.util.Random(47)
    val words = Vector("a", "bb", "ccc", "d", "ee")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    Seq(2, 3, 5).foreach { n =>
      val got = docs.toDF("id", "text")
        .select(col("id"), graft.expressions.NgramRepetition.column(col("text"), n).as("r"))
        .collect().map(r => r.getLong(0) -> {
          val s = r.getSeq[Long](1); (s(0), s(1))
        }).toMap
      docs.foreach { case (id, text) =>
        val want = repetitionTwin(text.split(" ", -1).toIndexedSeq, n)
        assert(got(id) == want, s"n=$n id=$id text='$text'")
      }
    }
  }

  test("property: dupSegmentStats repeat counts and masses equal the " +
    "first-occurrence scan on 150 random line multisets") {
    val rnd = new scala.util.Random(53)
    val lines = Vector("x", "yy", "zzz", "ww")
    val docs = (1 to 150).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(lines(rnd.nextInt(lines.size))).mkString("\n"))
    }
    val (dl, tl, dlc, tlc) = graft.functions.Quality.dupSegmentStats(col("text"), "\n")
    val got = docs.toDF("id", "text")
      .select(col("id"), dl.as("a"), tl.as("b"), dlc.as("c"), tlc.as("d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    docs.foreach { case (id, text) =>
      val segs = text.split("\n", -1).toSeq
      val seen = scala.collection.mutable.Set[String]()
      var repeats = 0L; var repeatChars = 0L
      segs.foreach { s =>
        if (!seen.add(s)) { repeats += 1; repeatChars += s.length }
      }
      val want = (repeats, segs.size.toLong, repeatChars, segs.map(_.length.toLong).sum)
      assert(got(id) == want, s"id=$id text='${text.replace("\n", "|")}'")
    }
  }
}
