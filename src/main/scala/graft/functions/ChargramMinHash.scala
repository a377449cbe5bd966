package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `chargram_minhash(text, gramLen, winnowMod)`: the 32-hash MinHash
  * signature of a string's character-n-gram set, computed straight off the
  * string's bytes in ONE codegen'd pass — no gram array is ever
  * materialized.
  *
  * Semantics are EXACTLY `minhash_sig(transform(sequence(0, length(text) -
  * gramLen), i -> substring(text, i+1, gramLen)), winnowMod)` (spec-pinned
  * by exact array equality over the corpus): each sliding window of
  * `gramLen` characters hashes with the same XXH64/seed-42 as the builtin
  * `xxhash64`, winnowing keeps grams with `h0 % winnowMod == 0`, and slot
  * `i` folds `min(hashLong(h0, hashLong(i, 42)))`. MinHash is
  * duplicate-invariant, so skipping the distinct step changes nothing.
  * NULL when no gram survives (text shorter than `gramLen`, or everything
  * winnowed) — callers filter those rows, like the array formulation.
  *
  * Why native: measured at sf0.1, materializing per-doc gram arrays
  * (`transform` + `substring` + `array_distinct`, an interpreted
  * higher-order lambda) is the single largest cost in char-gram dedup —
  * ~2 s of q53's ~3.2 s — while signatures and banding are ~0.3 s. This
  * expression walks codepoint boundaries once (a ring buffer of the last
  * `gramLen` + 1 byte offsets) and hashes each window's bytes in place, so
  * the corpus-wide pass is pure map-side compute; gram arrays are then
  * needed only for the handful of docs that reach exact verification. */
case class ChargramMinHash(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chargram_minhash"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "gramLen and winnowMod must be literals")
        else (second.eval(), third.eval()) match {
          // reject bad parameters at ANALYSIS, not as a per-row
          // ArithmeticException (winnowMod ring-buffer mod) or a codegen-time
          // NPE (null literal feeding the lazy eval)
          case (null, _) | (_, null) => TypeCheckResult.TypeCheckFailure(
            "gramLen and winnowMod must be non-null literals")
          case (g: Number, _) if g.intValue() < 1 => TypeCheckResult.TypeCheckFailure(
            s"gramLen must be >= 1, got ${g.intValue()}")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"chargram_minhash requires (string, int literal, int literal), got ($a, $b, $c)")
    }

  @transient private lazy val gramLen: Int =
    second.eval().asInstanceOf[Number].intValue()
  @transient private lazy val winnowMod: Int =
    third.eval().asInstanceOf[Number].intValue()

  override def nullSafeEval(text: Any, gl: Any, wm: Any): Any =
    ChargramMinHash.compute(text.asInstanceOf[UTF8String], gramLen, winnowMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ChargramMinHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      val arr = ctx.freshName("sig")
      s"""
        org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
          $cls.compute($t, $gramLen, $winnowMod);
        if ($arr == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $arr;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ChargramMinHash =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ChargramMinHash {
  private val NumHashes = 32

  /** hashLong(i, 42) for i = 0..31 — identical seed chain to MinHashSig. */
  private val slotSeeds: Array[Long] =
    Array.tabulate(NumHashes)(i => XXH64.hashLong(i.toLong, 42L))

  /** One pass over the string's bytes: a ring buffer holds the byte offsets
    * of the last `gramLen` + 1 codepoint boundaries, so each window's bytes
    * hash in place with zero allocation per gram. Called from both the
    * interpreted path and the generated code (static forwarder). */
  def compute(s: UTF8String, gramLen: Int, winnowMod: Int): GenericArrayData = {
    val numBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val ring = new Array[Int](gramLen + 1)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var any = false
    var charIdx = 0
    var byteIdx = 0
    while (byteIdx < numBytes) {
      ring(charIdx % (gramLen + 1)) = byteIdx
      byteIdx += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + byteIdx))
      charIdx += 1
      if (charIdx >= gramLen) {
        val s0 = ring((charIdx - gramLen) % (gramLen + 1))
        val h0 = XXH64.hashUnsafeBytes(base, off + s0,
          math.min(byteIdx, numBytes) - s0, 42L)
        if (winnowMod <= 1 || h0 % winnowMod == 0) {
          any = true
          var k = 0
          while (k < NumHashes) {
            val h = XXH64.hashLong(h0, slotSeeds(k))
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        }
      }
    }
    if (any) new GenericArrayData(mins) else null
  }
}
