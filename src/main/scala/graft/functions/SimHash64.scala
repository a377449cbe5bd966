package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash64(features)`: Charikar/Manku 64-bit SimHash fingerprint of a
  * feature array — per bit position, the majority vote of that bit over all
  * feature hashes (+1 if set, −1 if clear; bit set in the output when the
  * vote is strictly positive). Accepts `array<bigint>` (pre-hashed features)
  * or `array<string>` (features hashed inline with Spark's XXH64, seed 42 —
  * identical to the SQL `xxhash64` builtin, but WITHOUT paying a per-element
  * interpreted lambda the `transform(x -> xxhash64(x))` route costs).
  *
  * The composable formulation (explode the feature array, then 64
  * `sum(when(bit))` aggregates per doc) pays an n_features× row explosion and
  * a 64-column hash aggregation — a full shuffle of every feature hash just
  * to fold bits. This expression folds the votes in one tight primitive loop
  * per ROW (map-side only, whole-stage-codegen friendly), so the fingerprint
  * pass over a 100 TB corpus is a pure narrow scan; the only shuffle left in
  * SimHash dedup is the tiny (doc_id, chunk) candidate join. Same preference
  * order as [[LongArrayDot]]: builtin > native codegen Expression > UDF.
  *
  * A null array yields null; null elements are skipped.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private def isStringInput: Boolean = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint> or array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Int](64)
    val str = isStringInput
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val h = if (str) XXH64.hashUTF8String(xs.getUTF8String(i), 42L)
                else xs.getLong(i)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var f = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) f |= (1L << b); b += 1 }
    f
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val f = ctx.freshName("f")
      val hashElem =
        if (isStringInput) s"$xxh.hashUTF8String($a.getUTF8String($i), 42L)"
        else s"$a.getLong($i)"
      s"""
        int $n = $a.numElements();
        int[] $votes = new int[64];
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            long $h = $hashElem;
            for (int $b = 0; $b < 64; $b++) {
              $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
            }
          }
        }
        long $f = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($votes[$b] > 0) $f |= (1L << $b);
        }
        ${ev.value} = $f;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
