package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_hi60(arr)`: per element of an `array<string>`, the top 60 bits of
  * its MD5 digest as a BIGINT — bit-identical to the portable SQL form
  * `cast(conv(substring(md5(x),1,15),16,10) as bigint)` (the first 15 hex
  * digits ARE the high 60 bits of the big-endian digest prefix), and to
  * DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT`, which is what makes the
  * SimHash pipeline (q52) oracle-replayable. The expression exists for the
  * hot path: the SQL formulation pays, per element, an interpreted lambda,
  * a 32-char hex-string materialization, a substring slice, and a
  * string-parsing base conversion; this computes digest → long directly
  * with a reused per-thread MessageDigest and zero intermediate strings.
  * Null elements stay null (matching `transform`'s md5(null) = null);
  * a null array yields null. Same preference order as [[SimHash64]]:
  * builtin > native codegen Expression > UDF. */
case class Md5Hi60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, n)
    case _ => ArrayType(LongType, containsNull = true)
  }
  override def prettyName: String = "md5_hi60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_hi60 requires array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Md5Hi60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Hi60.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hi60 =
    copy(child = newChild)
}

object Md5Hi60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(UTF-8 bytes): unsigned big-endian 8-byte prefix
    * shifted right 4 — the first 15 hex digits of the canonical rendering. */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val out = d.digest(s.getBytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (out(i) & 0xFFL); i += 1 }
    be >>> 4
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = hash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
