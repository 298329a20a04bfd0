package graft.expressions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/**
 * Broadcast Bloom-filter membership as a native codegen expression — the
 * "runtime filter" pattern: aggregate the SMALL side of an equi-relation
 * into a compact bitmap, ship it to every task, and drop non-matching rows
 * of the LARGE side before they reach any shuffle. Spark injects this
 * automatically for some join shapes (`InjectRuntimeFilter`); graft's
 * inverted-index pipelines aggregate instead of joining, so the optimizer
 * never fires there — this is the manual equivalent.
 *
 * Two probe positions are derived from the single 60-bit portable hash the
 * pipelines already carry (low 30 bits and high 30 bits, each mod m) — no
 * second hash pass over the data. With k=2 probes the false-positive rate
 * is ≈ (1 − e^(−2n/m))², e.g. n=100k distinct hashes in an m=2^20 bitmap
 * (128 KiB) → ~3%. False positives only cost wasted downstream work;
 * membership of every inserted hash is exact (no false negatives) — which
 * is what lets exact operators compose with this filter without changing
 * their results.
 */
case class BitmapContains(child: Expression, words: Array[Long], mBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(mBits > 0 && words.length == (mBits + 63) / 64,
    s"words must hold exactly $mBits bits")

  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bitmap_contains"

  override def nullSafeEval(input: Any): Any = {
    // floorMod, not %: stableHash60 is non-negative (identical results),
    // but the documented fast-path swap to xxhash64 produces negative
    // longs, and a plain % would index the word array negatively
    val h = input.asInstanceOf[Long]
    val p1 = java.lang.Math.floorMod(h, mBits.toLong).toInt
    val p2 = java.lang.Math.floorMod(h >>> 30, mBits.toLong).toInt
    ((words(p1 >> 6) >>> (p1 & 63)) & 1L) == 1L &&
      ((words(p2 >> 6) >>> (p2 & 63)) & 1L) == 1L
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the bitmap rides the generated class as a referenced object — never
    // inlined into source (a 16k-element array literal would blow the
    // 64KB method limit and janino's constant pool)
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val p1 = ctx.freshName("p1")
      val p2 = ctx.freshName("p2")
      s"""
         |int $p1 = (int) java.lang.Math.floorMod($h, ${mBits}L);
         |int $p2 = (int) java.lang.Math.floorMod($h >>> 30, ${mBits}L);
         |${ev.value} = ((($w[$p1 >> 6] >>> ($p1 & 63)) & 1L) == 1L)
         |  && ((($w[$p2 >> 6] >>> ($p2 & 63)) & 1L) == 1L);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExprs {

  /**
   * Distributed bitmap build over a LongType hash column: the probe
   * positions are computed executor-side and the DISTINCT positions
   * (≤ min(2·n, m) ints — bounded by the bitmap size, never by the input)
   * come back to the driver, which ORs them into the word array. The
   * returned array is m/8 bytes (2^20 bits = 128 KiB) — broadcast-class,
   * like a dimension table in a broadcast join. Positions use pmod, the
   * Column twin of the probe's floorMod, so negative hashes (xxhash64
   * fast path) land identically on both sides.
   */
  def buildBitmap(df: DataFrame, hashCol: String, mBits: Int): Array[Long] = {
    require(mBits > 0, "mBits must be positive")
    val h = col(hashCol)
    val positions = df
      .where(h.isNotNull)
      .select(explode(array(
        pmod(h, lit(mBits.toLong)).cast("int"),
        pmod(shiftrightunsigned(h, 30), lit(mBits.toLong)).cast("int"))).as("p"))
      .distinct()
      .collect()
      .map(_.getInt(0))
    val words = new Array[Long]((mBits + 63) / 64)
    positions.foreach(p => words(p >> 6) |= 1L << (p & 63))
    words
  }

  /** Column API: true iff `hash` might be in the bitmap (exact for inserted hashes). */
  def mightContain(hash: Column, words: Array[Long], mBits: Int): Column =
    GraftSqlBridge.column(BitmapContains(GraftSqlBridge.expression(hash), words, mBits))

  /**
   * Bitmap size for a target false-positive rate under the 2-probe scheme:
   * fpp ≈ (1 − e^(−2n/m))² ⇒ m = −2n / ln(1 − √fpp). Rounded UP to a
   * power of two and clamped to [2^10, 2^30] (128 B to 128 MiB of
   * broadcast) — the auto-sizing callers use instead of guessing the
   * mBits knob: `bitsForFpp(evalShingles.count(), 0.03)`. n is the
   * DISTINCT key count; overestimating n only lowers the realized fpp.
   */
  def bitsForFpp(distinctKeys: Long, fpp: Double): Int = {
    require(distinctKeys >= 0, "distinctKeys must be non-negative")
    require(fpp > 0.0 && fpp < 1.0, "fpp must be in (0, 1)")
    val m = -2.0 * math.max(1L, distinctKeys) / math.log1p(-math.sqrt(fpp))
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, math.ceil(m).toLong - 1L))
    1 << math.max(10, math.min(30, ceilLog2))
  }
}
