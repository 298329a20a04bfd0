package graft

import graft.functions.{Subword, Text}
import org.apache.spark.sql.functions._

/** Subword (BPE-lite) tokenizer: deterministic training, the
  * Column-vs-Scala-twin budget parity the packing/chunking consumers rely
  * on, and the opt-in threading into sequence packing. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  test("BPE training merges the most frequent pair first, deterministically") {
    // (a,a) appears 2×3 + 1×2 = 8 times, (a,b) 1×3 + 1×2 = 5 → first merge
    // must be (a,a); "aaab" then segments to [aa, a, b] (left-to-right,
    // non-overlapping)
    val v1 = Subword.trainFromFrequencies(Seq("aaab" -> 3L, "aab" -> 2L), numMerges = 1)
    assert(v1.merges == Seq(("a", "a")))
    assert(Subword.segment("aaab", v1.merges) == Vector("aa", "a", "b"))
    assert(v1.unitCount("aaab") == 3 && v1.unitCount("aab") == 2)
    // untrained word: character-count fallback
    assert(v1.unitCount("zzz") == 3)
    // second round: ("aa","a") and ("a","b") both count 3 ("aa","b" only
    // 2) — the tie breaks lexicographically and "a" < "aa", so ("a","b")
    val v2 = Subword.trainFromFrequencies(Seq("aaab" -> 3L, "aab" -> 2L), numMerges = 2)
    assert(v2.merges == Seq(("a", "a"), ("a", "b")))
    // merge supply exhausts gracefully (single-char words have no pairs)
    val v3 = Subword.trainFromFrequencies(Seq("a" -> 5L, "b" -> 3L), numMerges = 10)
    assert(v3.merges.isEmpty)
  }

  test("column path and Scala twin agree on every corpus document (budget parity)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = Subword.train(docs, "text", numMerges = 100, maxWords = 1000)
    // training is deterministic: re-train → identical merges and table
    val vocab2 = Subword.train(docs, "text", numMerges = 100, maxWords = 1000)
    assert(vocab.merges == vocab2.merges && vocab.wordUnits == vocab2.wordUnits)

    val got = docs.select(col("doc_id"), col("text"),
        Subword.countColumn(col("text"), vocab).as("n"),
        Text.tokenCount(col("text")).cast("long").as("words"))
      .collect()
    assert(got.length == 500)
    got.foreach { r =>
      val (text, n, words) = (r.getString(1), r.getLong(2), r.getLong(3))
      assert(n == Subword.countScala(text, vocab), s"parity broke on doc ${r.getLong(0)}")
      // merged units never exceed raw characters-per-word, never undercut
      // one-unit-per-nonempty-word
      assert(n >= words - text.split(" ", -1).count(_.isEmpty))
      assert(n <= text.split(" ", -1).map(_.length.toLong).sum)
    }
    // the vocabulary actually bites: trained counts are strictly below the
    // char-count floor a merge-free tokenizer would report
    val charFloor = got.map(_.getString(1).split(" ", -1).map(_.length.toLong).sum).sum
    assert(got.map(_.getLong(2)).sum < charFloor)
  }

  test("degenerate inputs: empty, null, repeated spaces") {
    val vocab = Subword.trainFromFrequencies(Seq("ab" -> 2L), numMerges = 1)
    val rows = Seq((1L, ""), (2L, null: String), (3L, "ab  ab"), (4L, "ab cd"))
      .toDF("id", "text")
      .select(col("id"), Subword.countColumn(col("text"), vocab).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 0L, 2L -> 0L,
      3L -> 2L, // "ab", "", "ab" → 1 + 0 + 1
      4L -> 3L)) // "ab" merged (1) + "cd" fallback (2)
    assert(Subword.countScala(null, vocab) == 0L)
    assert(Subword.countScala("ab  ab", vocab) == 2L)
  }

  test("encode: unitsColumn equals the Scala twin, size equals countColumn, " +
    "and segmentation is lossless") {
    val vocab = Subword.trainFromFrequencies(
      Seq("aaab" -> 3L, "aab" -> 2L, "the" -> 5L), numMerges = 3)
    val docs = Seq(
      (1L, "aaab the aab"),
      (2L, "zzz aaab"), // OOV word falls back to characters
      (3L, ""),
      (4L, "the the the")).toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"),
      Subword.unitsColumn(col("text"), vocab).as("u"),
      Subword.countColumn(col("text"), vocab).as("c"),
      col("text")).collect()
    rows.foreach { r =>
      val units = r.getSeq[String](1)
      // twin parity
      assert(units == Subword.unitsScala(r.getString(3), vocab), s"doc ${r.getLong(0)}")
      // the count contract IS the encode's length
      assert(units.size.toLong == r.getLong(2))
      // lossless: concatenated units rebuild the text minus spaces
      assert(units.mkString == r.getString(3).replace(" ", ""))
    }
    // null text → empty sequence
    val n = Seq((5L, null: String)).toDF("doc_id", "text")
      .select(Subword.unitsColumn(col("text"), vocab).as("u")).head()
    assert(n.getSeq[String](0).isEmpty)
  }

  test("packing consumes subword budgets via the tokenCount column (opt-in)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = Subword.train(docs, "text", numMerges = 100, maxWords = 1000)
    val packed = graft.operators.Packing.packSequences(
      docs.select(col("doc_id"), col("text")), "doc_id",
      Subword.countColumn(col("text"), vocab), shards = 4, maxTokens = 512)
    // token conservation: the packed budget equals the twin's total
    val total = packed.agg(sum("tokens")).head.getLong(0)
    val twin = docs.select("text").collect()
      .map(r => Subword.countScala(r.getString(0), vocab)).sum
    assert(total == twin)
    // offsets remain contiguous per shard under the subword budget
    val byShard = packed.select("shard", "start_offset", "tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byShard.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, s1, t1), (_, s2, _)) =>
        assert(s1 + t1 == s2, "per-shard offsets must be gap-free")
      }
    }
  }
}
