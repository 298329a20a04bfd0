package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 200L)
    .map(i => (i, Seq.fill((i % 37).toInt + 1)("w").mkString(" ")))
    .toDF("doc_id", "text")

  private def pack(df: org.apache.spark.sql.DataFrame) =
    Packing.packSequences(df, "doc_id", graft.functions.Text.tokenCount(col("text")),
      shards = 3, maxTokens = 64)

  test("offsets are contiguous per shard and tokens are conserved") {
    val rows = pack(docs).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(2))) // (shard, start, tokens)
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"shard $shard must start at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, s1, t1), (_, s2, _)) =>
          assert(s2 == s1 + t1, s"shard $shard: gap at offset $s2")
        case _ =>
      }
    }
    val totalPacked = rows.map(_._3).sum
    val totalInput = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(totalPacked == totalInput)
  }

  test("pack_id and spans follow the token interval arithmetic") {
    pack(docs).collect().foreach { r =>
      val (tokens, start, packId, spans) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(packId == start / 64)
      assert(spans == (start + tokens - 1) / 64 - start / 64 + 1)
      // a doc can straddle a boundary at both ends: ≤ (tokens-1)/L + 2
      assert(spans >= 1 && spans <= (tokens - 1) / 64 + 2)
    }
  }

  test("pack ids are exact past 2^53 cumulative tokens (floor-div regime)") {
    // The hardened division (Packing.floorDiv) vs the old IEEE-double
    // floor: with per-doc token counts near 2^51 the shard cumsum crosses
    // 2^53, where floor(x/w) in double drifts. Expected values recompute
    // from the emitted offsets with Math.floorDiv; the test also proves
    // the regime bites by finding at least one offset the double grid
    // would misplace.
    // equal counts make the start sequence independent of the hash order;
    // t ≡ −1 (mod 640) parks every start one token under a pack boundary,
    // where the double quotient rounds UP across it (4 of the 12 starts
    // drift, verified against exact integer arithmetic)
    val t = ((1L << 53) / 640L + 2L) * 640L - 1L
    val big = (1L to 12L).map(i => (i, t)).toDF("doc_id", "ntok")
    val out = Packing.packSequences(big, "doc_id", col("ntok"), shards = 1,
        maxTokens = 640)
      .select("start_offset", "tokens", "pack_id", "spans_packs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(o => o._1 + o._2).max > (1L << 53), "fixture must cross 2^53")
    out.foreach { case (start, toks, packId, spans) =>
      val expId = Math.floorDiv(start, 640L)
      assert(packId == expId, s"pack_id at offset $start")
      assert(spans == Math.floorDiv(start + toks - 1, 640L) - expId + 1,
        s"spans_packs at offset $start")
    }
    assert(out.exists { case (start, _, _, _) =>
      math.floor(start.toDouble / 640.0).toLong != Math.floorDiv(start, 640L)
    }, "no offset where the double grid drifts — fixture too small")
  }

  test("packing is independent of input partitioning (deterministic order)") {
    val a = pack(docs).collect().map(_.toSeq).toSet
    val b = pack(docs.repartition(7)).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("packingEfficiency: utilization and counts derive exactly from the layout") {
    val eff = Packing.packingEfficiency(docs, "doc_id",
        graft.functions.Text.tokenCount(col("text")), shards = 3, maxTokens = 64)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val layout = pack(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    layout.groupBy(_._1).foreach { case (shard, rs) =>
      val (nDocs, nTokens, nSeqs, nSpanning, util) = eff(shard)
      assert(nDocs == rs.length)
      assert(nTokens == rs.map(_._2).sum)
      val maxEnd = rs.map(r => r._3 + r._2).max
      assert(nSeqs == (maxEnd - 1) / 64 + 1)
      assert(nSpanning == rs.count(_._4 > 1))
      assert(util == nTokens.toDouble / (nSeqs * 64).toDouble)
      assert(util > 0.0 && util <= 1.0)
    }
    // the only waste is each shard's final partial sequence
    eff.values.foreach { case (_, nTokens, nSeqs, _, _) =>
      assert((nSeqs - 1) * 64 < nTokens && nTokens <= nSeqs * 64)
    }
    // zero-token / empty shards report zeros, not NaN
    val empty = Packing.packingEfficiency(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", lit(0L), 2, 64)
      .collect().map(r => (r.getLong(2), r.getDouble(5)))
    assert(empty.forall { case (ns, u) => ns == 0L && u == 0.0 })
  }

  test("packSegments: per-doc token conservation and per-sequence disjoint tiling") {
    val segs = Packing.packSegments(docs, "doc_id",
        graft.functions.Text.tokenCount(col("text")), shards = 3, maxTokens = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // mask invariant 1: a doc's segments sum to exactly its token count
    val perDoc = segs.groupBy(_._3).view.mapValues(_.map(s => s._5 - s._4 + 1).sum).toMap
    docs.collect().foreach { r =>
      val (id, n) = (r.getLong(0), r.getString(1).split(" ").length.toLong)
      assert(perDoc(id) == n, s"doc $id: segments cover ${perDoc(id)} of $n tokens")
    }
    // mask invariant 2: within a sequence, segments tile [0, …] without
    // overlap or gap, in range
    segs.groupBy(s => (s._1, s._2)).foreach { case ((shard, seq), rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.forall(s => s._4 >= 0 && s._5 <= 63 && s._4 <= s._5))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._5 + 1, s"seq ($shard,$seq): gap/overlap at ${b._4}")
        case _ =>
      }
      // every sequence except a shard's last is fully tiled
      val last = segs.filter(s => s._1 == shard).map(_._2).max
      if (seq < last)
        assert(sorted.head._4 == 0 && sorted.last._5 == 63)
    }
  }
}
