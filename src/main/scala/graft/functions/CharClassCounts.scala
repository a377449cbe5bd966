package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `char_class_counts(text)`: the 28-class character histogram of a string —
  * counts of 'a'..'z' (26), space (index 26), and everything else (index 27,
  * counted in CODE POINTS) — in ONE pass over the UTF-8 bytes.
  *
  * The composable formulation (27 `replace`/`length` passes, one per class)
  * re-scans the document 27 times per row; this expression classifies each
  * byte once, so the quality-gate scan (q213) reads every byte exactly once
  * at 100 TB. The two formulations are semantically identical: bytes
  * 'a'..'z'/space are single-byte UTF-8 code points, every other code point
  * (uppercase, digits, multi-byte) contributes exactly one to the catch-all
  * class — `numChars − Σ(classified)`, so continuation bytes never
  * miscount. Null input yields null.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_class_counts requires string input, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val counts = new Array[Long](28)
    val nBytes = s.numBytes()
    var classified = 0L
    var i = 0
    while (i < nBytes) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') { counts(b - 'a') += 1; classified += 1 }
      else if (b == ' ') { counts(26) += 1; classified += 1 }
      i += 1
    }
    counts(27) = s.numChars() - classified
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val counts = ctx.freshName("counts")
      val nBytes = ctx.freshName("nBytes")
      val classified = ctx.freshName("classified")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val gad = classOf[GenericArrayData].getName
      s"""
        long[] $counts = new long[28];
        int $nBytes = $s.numBytes();
        long $classified = 0L;
        for (int $i = 0; $i < $nBytes; $i++) {
          byte $b = $s.getByte($i);
          if ($b >= (byte) 'a' && $b <= (byte) 'z') {
            $counts[$b - 'a']++; $classified++;
          } else if ($b == (byte) ' ') {
            $counts[26]++; $classified++;
          }
        }
        $counts[27] = $s.numChars() - $classified;
        ${ev.value} = new $gad($counts);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}
