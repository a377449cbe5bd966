package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `hamming_str(a, b)`: number of codepoint positions at which two
  * EQUAL-LENGTH strings differ; NULL when the lengths (in codepoints)
  * differ — the substitution-only companion to `levenshtein` that entity
  * resolution uses on fixed-format keys (zero-padded ids, hashes, SKUs),
  * where it is exact and O(n) with no DP table. Spark has no builtin;
  * DuckDB's `hamming` provides the oracle. One pass over both byte
  * arrays, codepoint-aligned (UTF-8 lead-byte widths), zero allocation —
  * same native-Expression preference order as the rest of the family.
  */
case class HammingStr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_str"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hamming_str requires (string, string), got ($a, $b)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = HammingStr.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HammingStr.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("dist")
      s"""
        int $d = $cls.compute($a, $b);
        if ($d < 0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $d;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingStr =
    copy(left = newLeft, right = newRight)
}

object HammingStr {
  /** Codepoint-aligned difference count; -1 signals a length mismatch
    * (mapped to NULL by both execution paths). Shared by interpreted eval
    * and generated code (static forwarder). */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes(); val nb = b.numBytes()
    val ba = a.getBaseObject; val oa = a.getBaseOffset
    val bb = b.getBaseObject; val ob = b.getBaseOffset
    var i = 0; var j = 0; var diff = 0
    while (i < na && j < nb) {
      // clamp declared widths to the bytes actually present: truncated /
      // invalid UTF-8 must degrade to a counted difference, never read
      // past the buffer through Platform (same guard as ChargramMinHash)
      val la = math.min(
        UTF8String.numBytesForFirstByte(Platform.getByte(ba, oa + i)), na - i)
      val lb = math.min(
        UTF8String.numBytesForFirstByte(Platform.getByte(bb, ob + j)), nb - j)
      if (la != lb) diff += 1
      else {
        var k = 0
        var same = true
        while (same && k < la) {
          same = Platform.getByte(ba, oa + i + k) == Platform.getByte(bb, ob + j + k)
          k += 1
        }
        if (!same) diff += 1
      }
      i += la; j += lb
    }
    if (i < na || j < nb) -1 else diff // one side has more codepoints left
  }
}
