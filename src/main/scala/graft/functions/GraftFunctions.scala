package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the engine's native expressions. */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_long" -> (es => LongArrayDot(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es(0))),
    "minhash_sig" -> (es => MinHashSig(es(0), es(1))),
    "chargram_minhash" -> (es => ChargramMinHash(es(0), es(1), es(2))),
    "hamming_str" -> (es => HammingStr(es(0), es(1))),
    "md5_hi60" -> (es => Md5Hi60(es(0))),
    "char_class_counts" -> (es => CharClassCounts(es(0))))

  /** Idempotent per-session registration; queries call this so they work on
    * any SparkSession, extension-injected or not. */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}

/** `SparkSessionExtensions` injector — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`,
  * the deployment path for clusters where sessions aren't built by this
  * library (SURVEY.md §7.3). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "dot_long"),
      (es: Seq[Expression]) => LongArrayDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("chargram_minhash"),
      new ExpressionInfo(classOf[ChargramMinHash].getName, "chargram_minhash"),
      (es: Seq[Expression]) => ChargramMinHash(es(0), es(1), es(2))))
    ext.injectFunction((
      FunctionIdentifier("hamming_str"),
      new ExpressionInfo(classOf[HammingStr].getName, "hamming_str"),
      (es: Seq[Expression]) => HammingStr(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_hi60"),
      new ExpressionInfo(classOf[Md5Hi60].getName, "md5_hi60"),
      (es: Seq[Expression]) => Md5Hi60(es(0))))
    ext.injectFunction((
      FunctionIdentifier("char_class_counts"),
      new ExpressionInfo(classOf[CharClassCounts].getName, "char_class_counts"),
      (es: Seq[Expression]) => CharClassCounts(es(0))))
    // whole-operator tier: plan AsOfJoinPlan nodes (graft.plans.AsOf) —
    // injection here makes the operator available on any session built with
    // this extension class; AsOf.ensureStrategy stays as the idempotent
    // fallback for foreign sessions
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
