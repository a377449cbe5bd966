package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `dot_long(a, b)`: exact dot product of two BIGINT arrays.
  *
  * The engine quantizes float embeddings to integer millionths so similarity
  * arithmetic is exact and reproducible (see SimilarityQueries); this
  * expression makes that arithmetic fast. Spark's higher-order-function route
  * (`aggregate(zip_with(a, b, *), ...)`) allocates and boxes per element and
  * falls out of whole-stage codegen; this expression generates a tight primitive
  * loop instead (preference order per the engine's design rules: builtin
  * function > native codegen Expression > UDF). ~10-100× faster on the
  * pairwise-similarity hot path, which is what keeps brute-force and LSH
  * candidate scoring viable at fixture and cluster scale alike.
  *
  * Null elements are not expected (embeddings are dense); a null array yields
  * null. Lengths must match — enforced by construction (both sides are
  * `transform(embedding, ...)` of 64-dim vectors); the shorter length is used
  * defensively otherwise.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long requires array<bigint> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var k = 0
    while (k < n) { acc += x.getLong(k) * y.getLong(k); k += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $k = 0; $k < $n; $k++) {
          $acc += $a.getLong($k) * $b.getLong($k);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}
