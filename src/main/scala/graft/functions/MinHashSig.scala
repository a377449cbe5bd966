package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `minhash_sig(items, winnowMod)`: 32-hash MinHash signature of a string
  * feature set, computed in ONE codegen'd pass per row.
  *
  * Per item: `h0 = xxhash64(item)` (Spark's XXH64, seed 42 — identical to the
  * SQL builtin); items failing the content-defined winnow (`h0 % winnowMod !=
  * 0`, disabled when winnowMod ≤ 1) are skipped; otherwise the i-th signature
  * slot takes `min(hashLong(h0, hashLong(i, 42)))` — exactly the value of the
  * composable `min(xxhash64(lit(i), h0))` aggregation, so banding built on
  * either formulation produces byte-identical candidates. Returns NULL when
  * no item survives winnowing (the caller filters those docs out, matching
  * the aggregate formulation where an empty group produces no row).
  *
  * Why native: the composable route explodes every feature into a row and
  * runs a 32-column min hash-aggregate — per-feature row materialization and
  * aggregation machinery for what is a tight fold. This keeps the signature
  * pass a pure narrow map over the corpus (the 100 TB posture: the only
  * shuffles left in MinHash dedup are the band join and the verify join),
  * same preference order as [[LongArrayDot]].
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  private val NumHashes = 32

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  // null when every item is winnowed away, regardless of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(t, _), IntegerType)
          if t == org.apache.spark.sql.types.StringType =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("winnowMod must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires (array<string>, int literal), got ($l, $r)")
    }

  @transient private lazy val winnowMod: Int =
    right.eval().asInstanceOf[Number].intValue()

  /** hashLong(i, 42) for i = 0..31 — the per-slot seed chain prefix. */
  @transient private lazy val slotSeeds: Array[Long] =
    Array.tabulate(NumHashes)(i => XXH64.hashLong(i.toLong, 42L))

  override def nullSafeEval(items: Any, mod: Any): Any = {
    val xs = items.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val h0 = XXH64.hashUTF8String(xs.getUTF8String(i), 42L)
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
      i += 1
    }
    if (any) new GenericArrayData(mins) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val seeds = ctx.addReferenceObj("slotSeeds", slotSeeds, "long[]")
    val mod = ctx.addReferenceObj("winnowMod", Integer.valueOf(winnowMod), "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val m = ctx.freshName("m")
      s"""
        int $n = $a.numElements();
        int $m = $mod.intValue();
        long[] $mins = new long[$NumHashes];
        java.util.Arrays.fill($mins, Long.MAX_VALUE);
        boolean $any = false;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            long $h0 = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
            if ($m <= 1 || $h0 % $m == 0) {
              $any = true;
              for (int $k = 0; $k < $NumHashes; $k++) {
                long $h = $xxh.hashLong($h0, $seeds[$k]);
                if ($h < $mins[$k]) $mins[$k] = $h;
              }
            }
          }
        }
        if ($any) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        } else {
          ${ev.isNull} = true;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}
