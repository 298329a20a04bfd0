package graft.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native portable 60-bit hash — the compiled form of
 * `conv(substring(md5(c), 1, 15), 16, 10) :: long` (round 12, guide §
 * expressions/codegen). The declarative chain materializes a 32-char hex
 * string, substrings it and re-parses base-16 per row; this expression
 * digests once and assembles the SAME first-60-bits value directly from
 * the raw digest bytes — no hex encode, no string parse, one MessageDigest
 * per thread. Bit-identical to the chain (HashingSpec pins the Scala twin
 * and a Column-level equality), so every oracle-verifiable hash value in
 * the engine (shingles, spans, minhash bases, draw keys) is unchanged.
 *
 * Accepts STRING (hashes UTF-8 bytes — what `md5(string)`'s implicit
 * binary cast hashed) and BINARY (raw bytes) children, exactly the two
 * input classes the engine's call sites use.
 */
case class StableHash60(child: Expression) extends UnaryExpression {

  // manual check (not ExpectsInputTypes): the accepted set is
  // STRING ∪ BINARY and Spark 4 keeps `TypeCollection` private[sql] —
  // no implicit cast is wanted anyway, a silently casted child would
  // hash DIFFERENT bytes than the caller's column
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary child, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_stable_hash60"

  private def isString: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) StableHash60.computeUtf8(input.asInstanceOf[UTF8String])
    else StableHash60.computeBytes(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev, c => s"graft.expressions.StableHash60.computeUtf8($c)")
    else
      defineCodeGen(ctx, ev, c => s"graft.expressions.StableHash60.computeBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StableHash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — equal by
    * construction to parsing the first 15 hex chars base-16: hex pair
    * 2i,2i+1 is byte i, so chars [0,15) are bytes 0..6 plus the HIGH
    * nibble of byte 7. */
  def computeBytes(b: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(b)
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def computeUtf8(s: UTF8String): Long = computeBytes(s.getBytes)

  def column(c: Column): Column =
    GraftSqlBridge.column(StableHash60(GraftSqlBridge.expression(c)))
}

/**
 * Native per-document SimHash signature — one compiled pass per row
 * (round 12, guide §2.4/§codegen): tokenize on single space (keeping
 * empties — the split contract), hash each token occurrence with
 * [[StableHash60]], accumulate the ±1 per-bit sums, emit the signature
 * long. Replaces the exploded shape (Generate per token → md5 column →
 * Exchange on id → 60 conditional sums), whose only purpose was undoing
 * the explode: the signature is a pure per-document function, so the
 * corpus never shuffles to compute it. Bit-for-bit the value of
 * [[graft.operators.Dedup.simhashFromHashed]] over
 * [[graft.operators.Dedup.hashedTokens]] (DedupSpec pins the equality).
 */
case class SimhashSig(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 60,
    s"simhash width must be within the 60 informative hash bits, got $bits")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[UTF8String], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimhashSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Native per-document MinHash signature — one compiled pass per row
 * (round 12, guide §2.4): shingle the document, [[StableHash60]] each
 * shingle, fold the `numHashes` universal-hash minima, emit the
 * signature as `array<long>` (EMPTY when the document has fewer than n
 * tokens — the rows [[graft.operators.Dedup.minhashFromHashed]]'s
 * groupBy drops; callers filter `size > 0`). Replaces the from-scratch
 * shape (explode the shingle set → md5 column → Exchange on id → 16
 * min() aggregates): the signature is a pure per-document function of
 * the shingle set, and min() over occurrences equals min() over the
 * distinct set, so the corpus never shuffles to sign. Values are
 * bit-identical to the aggregation (HashingSpec pins it): the
 * universal-hash arithmetic `(a·(h mod p) + b) mod p`, p = 2^31−1,
 * over non-negative 60-bit h is the same Java long arithmetic the
 * Column form evaluates.
 */
case class MinhashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")
  require(numHashes >= 1, "numHashes must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[UTF8String], n, numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinhashSig.compute($c, $n, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  private val P = graft.functions.Hashing.MersennePrime
  // (a_i, b_i) rows of Hashing.coeffs, cached per signature width
  private val coeffCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]
  private def coeffsFor(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.getOrElseUpdate(numHashes, {
      val pairs = (0 until numHashes).map(graft.functions.Hashing.coeffs)
      (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
    })

  /** One-pass signature; called from generated code. */
  def compute(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val spans = WordShingles.compute(text, n)
    val m = spans.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val (as, bs) = coeffsFor(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val hp = StableHash60.computeUtf8(spans.getUTF8String(i)) % P
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * hp + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def column(text: Column, n: Int, numHashes: Int): Column =
    GraftSqlBridge.column(MinhashSig(GraftSqlBridge.expression(text), n, numHashes))
}

object SimhashSig {
  /** One-pass signature; called from generated code. Token stream =
    * split(text, " ", -1) — empty tokens hash too, exactly like the
    * exploded token stream (split never yields an empty array, so every
    * document signs). Bit j of the result is 1 iff the sum over token
    * occurrences of (bit j of stableHash60(token) ? +1 : −1) is > 0. */
  def compute(text: UTF8String, bits: Int): Long = {
    val tokens = text.toString.split(" ", -1)
    val sums = new Array[Int](bits)
    var i = 0
    while (i < tokens.length) {
      val h = StableHash60.computeBytes(
        tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < bits) {
        sums(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  def column(text: Column, bits: Int): Column =
    GraftSqlBridge.column(SimhashSig(GraftSqlBridge.expression(text), bits))
}

/**
 * Upper-triangle pair expansion of a sorted bucket —
 * `[a,b,c] → [(a,b),(a,c),(b,c)]` — in one compiled pass (round 12,
 * guide §"expressions/codegen"). The declarative form
 * `flatten(transform(ids, (x,i) => transform(slice(ids,i+2,…), …)))` is
 * a higher-order-function chain: interpreted per element AND `slice`
 * COPIES the tail of the array for every outer element, so a bucket of
 * k members paid O(k²) array copies plus a lambda dispatch per pair.
 * This is the in-bucket expansion under EVERY posting-list pair
 * operator (jaccard, overlap, LSH candidates, simhash chunks, deletion
 * blocking) — the hot inner loop of the pair family. Output order and
 * values are identical (outer index i, inner j > i, ascending); element
 * type is generic (doc ids, source names, (id, simhash) structs).
 */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: org.apache.spark.sql.types.ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array child, got ${other.sql}")
  }

  private def elementType: DataType =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private def elementNullable: Boolean =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_a", elementType, elementNullable),
      org.apache.spark.sql.types.StructField("id_b", elementType, elementNullable))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_pairs"

  override def nullSafeEval(input: Any): Any =
    SortedPairs.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      elementType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elementType)
    defineCodeGen(ctx, ev, c => s"graft.expressions.SortedPairs.compute($c, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedPairs {
  /** Two-loop expansion; called from generated code. */
  def compute(arr: ArrayData, et: DataType): ArrayData = {
    val k = arr.numElements()
    val vals = arr.toObjectArray(et)
    val out = new Array[Any](k * (k - 1) / 2)
    var idx = 0
    var i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](vals(i), vals(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(ids: Column): Column =
    GraftSqlBridge.column(SortedPairs(GraftSqlBridge.expression(ids)))
}

/**
 * Cross-set pair expansion — `[a,b] × [x,y] → [(a,x),(a,y),(b,x),(b,y)]`
 * — in one compiled pass (round 12): the interpreted nested-transform
 * chain under the cross-set contamination and incremental-LSH buckets
 * allocated through a lambda dispatch per (left, right) pair. Left
 * element arrives as `id_a`, right as `id_b` (callers normalize order
 * post-explode where they need least/greatest); element types must
 * match. Output order is the nested-loop order of the chain it
 * replaces (left outer, right inner).
 */
case class CrossPairs(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (a: org.apache.spark.sql.types.ArrayType,
          b: org.apache.spark.sql.types.ArrayType)
      if org.apache.spark.sql.types.DataType.equalsIgnoreNullability(
        a.elementType, b.elementType) =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of the same element type, got ${a.sql} and ${b.sql}")
  }

  private def elementType: DataType =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private def elementNullable: Boolean =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull ||
      right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_a", elementType, elementNullable),
      org.apache.spark.sql.types.StructField("id_b", elementType, elementNullable))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cross_pairs"

  override def nullSafeEval(a: Any, b: Any): Any =
    CrossPairs.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], elementType)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elementType)
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.CrossPairs.compute($a, $b, $et)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CrossPairs {
  /** Nested-loop expansion; called from generated code. */
  def compute(a: ArrayData, b: ArrayData, et: DataType): ArrayData = {
    val n = a.numElements()
    val m = b.numElements()
    val as = a.toObjectArray(et)
    val bs = b.toObjectArray(et)
    val out = new Array[Any](n * m)
    var idx = 0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](as(i), bs(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(CrossPairs(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
