package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator AS-OF JOIN as a first-class Catalyst citizen — the (c)
  * tier of the engine's custom-operator preference order (SURVEY.md §7.3):
  * a custom [[LogicalPlan]] node, a [[SparkStrategy]] planning it, and a
  * [[SparkPlan]] that executes a single-pass partition-merge. The composed
  * alternative (q26's union-tag + `last` window) is semantically identical
  * and spec-pinned equal; this operator exists because as-of is a JOIN and
  * deserves a join's physical shape:
  *
  *  - `requiredChildDistribution` = [[ClusteredDistribution]] on the keys —
  *    Catalyst's EnsureRequirements inserts compatible hash exchanges on
  *    both sides (or none, if bucketing/AQE already satisfies them), the
  *    exact mechanism sort-merge join rides;
  *  - `requiredChildOrdering` = (keys, time) ascending — the sorts are
  *    planned, spillable, and visible in EXPLAIN, not hidden inside a
  *    window buffer;
  *  - `doExecute` is a two-pointer merge per co-partition: the right
  *    pointer only moves FORWARD (left times are non-decreasing within a
  *    key), so each side streams once with O(1) carried state (the last
  *    qualifying right row) — no per-key right-side buffering, no
  *    union-row materialization, no tag columns.
  *
  * Semantics: for each left row, the right row with the LARGEST time
  * strictly below the left time within the same key (null-extended when
  * none) — DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t > r.t`,
  * which is exactly the oracle q148 runs against. Times are LongType
  * (epoch micros); a null right time never matches, a null left time
  * matches nothing.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean = true, tolerance: Option[Long] = None,
    broadcastRight: Option[Boolean] = None)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: hash-clustered, (key, time)-sorted children merged
  * in one forward pass per partition.
  *
  * `strict = true` matches `r.t < l.t` (DuckDB `l.t > r.t`); `strict =
  * false` matches `r.t <= l.t` (DuckDB `l.t >= r.t` — the point-in-time /
  * SCD2 convention where a version effective AT the fact time applies).
  * `tolerance` (same unit as the time columns) null-extends a match whose
  * gap `l.t - r.t` exceeds it; because the candidate is already the
  * LARGEST qualifying right time, every other same-key right row is
  * farther away, so the in-merge check equals a post-join null-out.
  *
  * AQE interaction — what holds and what does not (PlansSpec pins both):
  * the ClusteredDistribution exchanges EnsureRequirements plans under this
  * node are ordinary ENSURE_REQUIREMENTS shuffles, so AQE's partition
  * COALESCING folds their near-empty post-shuffle partitions exactly as it
  * does for sort-merge join (both sides consistently — co-partitioning is
  * preserved). AQE's SKEW-JOIN SPLIT does NOT apply: `OptimizeSkewedJoin`
  * pattern-matches `SortMergeJoinExec`/`ShuffledHashJoinExec` only, so a
  * hot key through this exec keeps its straggler partition no matter the
  * thresholds. At 100 TB, handle a known-hot key the pre-AQE way: SALT —
  * extend the left key with `pmod(hash(salt_source), S)` and replicate
  * each right row to all S salts of its key (right rows must reach every
  * salt because any left row of the key may land on any of them); as-of
  * semantics survive salting unchanged since each (key, salt) partition
  * still sees the full right-side timeline for that key. */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    strict: Boolean, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  /** The two-pointer merge as a shared compiled cursor ([[AsOfMergeCursor]])
    * — one implementation behind both the iterator path and the generated
    * produce loop, so the paths cannot drift. */
  private def cursorBuilder = new AsOfMergeCursorBuilder(left.output,
    right.output, leftKeys, rightKeys, leftTime, rightTime, strict, tolerance)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    // the result projection needs nullability WIDENED on both ends: the
    // target is the exec's output (right side nullable), and the input
    // schema must widen rOut too — BoundReference takes its null-check
    // flag from the INPUT attribute, so a non-nullable right attr would
    // skip the check and read garbage from the null-extension row
    // (caught by the brute-equality laws)
    val outAttrs = output
    val builder = cursorBuilder
    val numOutput = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val cursor = builder.create(lIter, rIter)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // downstream consumers (collect's byte-array serializer, exchanges)
      // require UnsafeRow — a bare JoinedRow only survives under a parent
      // projection, so flatten here like SortMergeJoinExec's resultProj
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      new Iterator[InternalRow] {
        private var ready = false
        override def hasNext: Boolean = {
          if (!ready) ready = cursor.advance()
          ready
        }
        override def next(): InternalRow = {
          if (!ready && !cursor.advance())
            throw new NoSuchElementException("exhausted as-of merge")
          ready = false
          val m = cursor.matchedRow
          numOutput += 1
          resultProj(joined(cursor.leftRow, if (m != null) m else nullRight))
        }
      }
    }
  }

  // ---- whole-stage codegen: the SortMergeJoinExec shape — this node OWNS
  // the produce loop over BOTH sorted inputs (they arrive as the stage's
  // two input iterators; the subtrees below the exchanges keep their own
  // codegen stages), and downstream operators fuse onto the merge output,
  // deleting the per-row resultProj materialization the iterator path
  // pays ----

  import org.apache.spark.sql.catalyst.expressions.BoundReference
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
    CodeGenerator, ExprCode, JavaCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.execution.CodegenSupport

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // rows come off the sorters' reused buffers: downstream buffering copies
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val builderRef = ctx.addReferenceObj("asofMergeBuilder", cursorBuilder,
      classOf[AsOfMergeCursorBuilder].getName)
    val cursorTerm = ctx.addMutableState(classOf[AsOfMergeCursor].getName,
      "asofMergeCursor",
      v => s"$v = $builderRef.create(inputs[0], inputs[1]);")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val lTerm = ctx.freshName("asofLeftRow")
    val mTerm = ctx.freshName("asofMatchedRow")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    // decode output vars from the cursor's current rows; right side nullable
    // with null-extension defaults, same widening as the iterator path
    ctx.currentVars = null
    ctx.INPUT_ROW = lTerm
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val rightVars = genRightVars(ctx, mTerm)
    s"""
       |while ($cursorTerm.advance()) {
       |  $rowCls $lTerm = $cursorTerm.leftRow();
       |  $rowCls $mTerm = $cursorTerm.matchedRow();
       |  $numOutput.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  /** Right-side output vars decoded from the matched row — null defaults
    * when unmatched (the null-extension), nullability forced wide. */
  private def genRightVars(ctx: CodegenContext, matched: String): Seq[ExprCode] = {
    ctx.currentVars = null
    ctx.INPUT_ROW = matched
    right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("rIsNull")
      val value = ctx.freshName("rValue")
      val javaType = CodeGenerator.javaType(a.dataType)
      val c = code"""
        |boolean $isNull = true;
        |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
        |if ($matched != null) {
        |  ${ev.code}
        |  $isNull = ${ev.isNull};
        |  $value = ${ev.value};
        |}
      """.stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the right (dimension) side ships whole to every
  * task via a [[BroadcastDistribution]] and the LEFT SIDE IS NEVER
  * SHUFFLED OR SORTED — `outputPartitioning`/`outputOrdering` pass the
  * left child's through untouched. Per partition, the broadcast rows build
  * one hash-of-sorted-arrays index (key → times ascending); each left row
  * binary-searches for the last qualifying time. The as-of analogue of
  * broadcast-hash vs sort-merge: right O(dim) per executor, left streamed
  * in place — the fact table pays ZERO exchanges, which at 100 TB is the
  * entire cost of the operator. Same semantics as [[AsOfJoinExec]]
  * including null-time skipping and tolerance; equality is law-tested on
  * randomized tables. */
case class BroadcastAsOfJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression], leftTime: Expression, rightTime: Expression,
    strict: Boolean, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with org.apache.spark.sql.execution.CodegenSupport {
  import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
    IdentityBroadcastMode, UnspecifiedDistribution}

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  /** Probe index builder shared by the iterator and codegen paths — one
    * lookup implementation, so the paths cannot drift semantically. */
  private def probeBuilder = new AsOfProbeBuilder(
    right.output, rightKeys, rightTime, strict, tolerance)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    // the result projection needs nullability WIDENED on both ends: the
    // target is the exec's output (right side nullable), and the input
    // schema must widen rOut too — BoundReference takes its null-check
    // flag from the INPUT attribute, so a non-nullable right attr would
    // skip the check and read garbage from the null-extension row
    // (caught by the brute-equality laws)
    val outAttrs = output
    val lKeyExprs = leftKeys
    val lTimeExpr = leftTime
    val builder = probeBuilder
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      // built once per executor per (join, broadcast) — NOT per task; see
      // ProbeIndexCache (the HashedRelation-broadcast analogue)
      val index = builder.buildCached(broadcastRows)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTimeEval = BindReferences.bindReference(lTimeExpr, lOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // flatten to UnsafeRow (SMJ's resultProj contract — see the merge exec)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      lIter.map { l =>
        val lt = lTimeEval.eval(l)
        val matched: InternalRow =
          if (lt == null) null
          else index.lookup(lKeyProj(l), lt.asInstanceOf[Long])
        numOutput += 1
        resultProj(joined(l, if (matched != null) matched else nullRight))
      }
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen: fuse the probe into the fact side's pipeline
  // (the BroadcastHashJoinExec shape — stream side produces, this node
  // consumes each row with an index lookup, no per-row virtual calls or
  // UnsafeRow materialization between the scan and the probe) ----

  import org.apache.spark.sql.catalyst.expressions.BoundReference
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
    CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.execution.CodegenSupport

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  // one output row per input row: copy requirements pass through unchanged
  override def needCopyResult: Boolean =
    left.asInstanceOf[CodegenSupport].needCopyResult

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    // index: fetched from the per-executor cache in generated-class init
    // (built by the FIRST task of this join on the JVM, shared by the
    // rest), from the same builder the iterator path uses
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val builderRef = ctx.addReferenceObj("asofBuilder", probeBuilder,
      classOf[AsOfProbeBuilder].getName)
    val bcastRef = ctx.addReferenceObj("asofBroadcast", broadcastRows,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val idxTerm = ctx.addMutableState(classOf[AsOfProbeIndex].getName,
      "asofIndex", v => s"$v = $builderRef.buildCached($bcastRef);")
    // stream-side key (UnsafeRow — binary-equal to the index keys, the
    // null-keys-group-together convention) and probe time
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      leftKeys.map(BindReferences.bindReference(_, left.output)))
    val timeEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val matched = ctx.freshName("asofMatched")
    val rightVars = genRightVars(ctx, matched)
    val numOutput = metricTerm(ctx, "numOutputRows")
    s"""
       |${keyEv.code}
       |${timeEv.code}
       |org.apache.spark.sql.catalyst.InternalRow $matched =
       |  ${timeEv.isNull} ? null : $idxTerm.lookup(${keyEv.value}, ${timeEv.value});
       |$numOutput.add(1);
       |${consume(ctx, input ++ rightVars)}
     """.stripMargin
  }

  /** Right-side output vars decoded from the matched broadcast row — null
    * defaults when unmatched (the null-extension), nullability forced wide
    * exactly like the iterator path's widened resultProj input schema. */
  private def genRightVars(ctx: CodegenContext, matched: String): Seq[ExprCode] = {
    ctx.currentVars = null
    ctx.INPUT_ROW = matched
    right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, nullable = true).genCode(ctx)
      val isNull = ctx.freshName("rIsNull")
      val value = ctx.freshName("rValue")
      val javaType = CodeGenerator.javaType(a.dataType)
      val c = code"""
        |boolean $isNull = true;
        |$javaType $value = ${CodeGenerator.defaultValue(a.dataType)};
        |if ($matched != null) {
        |  ${ev.code}
        |  $isNull = ${ev.isNull};
        |  $value = ${ev.value};
        |}
      """.stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to the merge or broadcast exec; a no-op on every
  * other node.
  *
  * Exec selection is STATS-DRIVEN by default, the same consultation
  * Catalyst's own JoinSelection applies to equi-joins
  * (`SparkStrategies.scala`, `canBroadcastBySize`): when the caller passed
  * no explicit flag, the right side broadcasts iff its Catalyst size
  * estimate (`LogicalPlan.stats.sizeInBytes` — file sizes for scans,
  * row-width products for in-memory relations, filter/project-adjusted
  * under CBO) fits under `spark.sql.autoBroadcastJoinThreshold`, and a
  * non-positive threshold disables auto-broadcast entirely — Spark's own
  * `-1`-disables convention. An explicit `Some(true/false)` from the API
  * always wins, so a caller can still force the merge exec for a
  * known-underestimated right side or force broadcast past a conservative
  * threshold. The measured stake (SCALING.md, `Dev intervalbcast`): a
  * dimension-sized right under the merge exec pays a full fact-side hash
  * exchange that broadcast avoids (−99.99% join wire cost) — that win
  * must not depend on the caller remembering a boolean. */
object AsOfJoinStrategy extends SparkStrategy {
  private[plans] def pickBroadcast(
      requested: Option[Boolean], right: LogicalPlan): Boolean =
    requested.getOrElse {
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      threshold > 0 && right.stats.sizeInBytes <= threshold
    }
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict, tol, bcast) =>
      if (pickBroadcast(bcast, r))
        BroadcastAsOfJoinExec(lk, rk, lt, rt, strict, tol,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, strict, tol,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public API: `AsOf.join(errors, clicks, Seq("user_id" -> "c_user"),
  * "ts_us", "c_ts")`. Key/time columns are named on each side (as-of
  * output keeps BOTH schemas, so the caller disambiguates by renaming up
  * front — the same contract DuckDB's ASOF JOIN has). */
object AsOf {
  /** Idempotently make the strategy available on sessions not built with
    * the GraftExtensions config (tests, foreign sessions). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = AsOfJoinStrategy +: em.extraStrategies
  }

  /** `broadcast = None` (the default) lets [[AsOfJoinStrategy]] pick the
    * exec from the right side's stats vs `autoBroadcastJoinThreshold`;
    * `Some(true)`/`Some(false)` forces broadcast/merge regardless.
    *
    * BEHAVIOR CHANGE NOTE: before the stats-driven strategy landed, `None`
    * always meant the merge exec. It now means "consult the right side's
    * Catalyst size estimate", which carries Spark's own JoinSelection risk
    * profile — a right side whose estimate UNDERestimates actual size
    * (e.g. filter-adjusted CBO stats) can auto-broadcast a large table.
    * Callers that relied on the old always-merge default, or whose right
    * side is known to be size-underestimated, should pin `Some(false)`
    * (or set `spark.sql.autoBroadcastJoinThreshold` to `-1`, Spark's
    * disable convention, which this strategy honors). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String,
      strict: Boolean = true, tolerance: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame = {
    // fleet-wide AUTOMATIC salting (see [[SkewSalt.autoSalts]]): when the
    // session conf opts in AND this join would take the merge exec (a
    // broadcast right has no exchange to skew), rewrite to the salted form
    // without any call-site change — the engine salting itself, the same
    // posture as the stats-driven broadcast default
    if (SkewSalt.autoSalts(left.sparkSession) >= 2 &&
        !AsOfJoinStrategy.pickBroadcast(broadcast,
          right.queryExecution.optimizedPlan))
      joinSalted(left, right, keys, leftTimeCol, rightTimeCol, strict,
        tolerance, salts = SkewSalt.autoSalts(left.sparkSession),
        // stored stats (statsPath conf) replace the per-join detection
        // pass when present; else joinSalted runs the exact counting pass
        hotKeys = SkewSalt.autoHotKeys(left.sparkSession, keys.map(_._1)),
        hotThreshold = SkewSalt.autoThreshold(left.sparkSession),
        broadcast = broadcast.orElse(Some(false)))
    else joinPlain(left, right, keys, leftTimeCol, rightTimeCol, strict,
      tolerance, broadcast)
  }

  private def joinPlain(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTimeCol: String, rightTimeCol: String,
      strict: Boolean, tolerance: Option[Long],
      broadcast: Option[Boolean]): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join (both sides derived from one
    // relation) cannot carry duplicate attribute ids into the node
    val rPlan = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    def resolve(out: Seq[Attribute], name: String): Attribute =
      out.filter(_.name == name) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"no column '$name' in ${out.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column '$name': ${many.size} matches in ${out.map(_.name)}")
      }
    val lk = keys.map(k => resolve(lPlan.output, k._1))
    val rk = keys.map(k => resolve(rPlan.output, k._2))
    // mismatched key types would feed incompatible UnsafeRow layouts into
    // one RowOrdering/hash index — fail loudly instead of grouping wrong
    require(lk.map(_.dataType) == rk.map(_.dataType),
      s"as-of join key types must match pairwise: " +
        s"${lk.map(_.dataType)} vs ${rk.map(_.dataType)}")
    val lt = resolve(lPlan.output, leftTimeCol)
    val rt = resolve(rPlan.output, rightTimeCol)
    require(lt.dataType == LongType && rt.dataType == LongType,
      "as-of time columns must be LongType (epoch micros)")
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt, strict, tolerance, broadcast))
  }

  /** SKEW-SALTED as-of join — same semantics and output as [[join]], for
    * the case a HOT KEY would straggle the merge exec (AQE's skew split
    * never fires for custom execs; see [[SkewSalt]]). Left rows of hot keys
    * split across `salts` sub-keys by `pmod(hash(leftTimeCol), salts)`;
    * right rows of hot keys replicate to every salt — each (key, salt)
    * partition still holds the key's FULL right timeline, so the per-left
    * as-of answer is unchanged (law-tested equal to [[join]] on random and
    * crafted hot-key tables, strict/non-strict/tolerance).
    *
    * Hot keys come from `hotKeys` (a frame of the LEFT key columns) when
    * given — the 100-TB path, where the list comes from prior stats or a
    * sample — else from one exact key-only counting pass at
    * `hotThreshold` rows (map-side combined: the hot key cannot straggle
    * the detection itself). `broadcast` defaults to `Some(false)`: salting
    * exists precisely because the right side is too big to broadcast — if
    * it fits, use [[join]] and skew vanishes with the exchange. A hot key
    * whose left times are all IDENTICAL gains nothing (the salt hash has
    * one input value); such a key is degenerate for as-of anyway. */
  def joinSalted(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String,
      strict: Boolean = true, tolerance: Option[Long] = None,
      salts: Int = 8, hotKeys: Option[DataFrame] = None,
      hotThreshold: Long = 5000000L,
      broadcast: Option[Boolean] = Some(false)): DataFrame = {
    val hot = hotKeys.getOrElse(SkewSalt.hotKeys(left, keys.map(_._1), hotThreshold))
    val (lS, rS) = SkewSalt.saltSides(left, right, keys,
      Seq(leftTimeCol), salts, hot)
    joinPlain(lS, rS, keys :+ (SkewSalt.SaltCol -> SkewSalt.SaltCol),
      leftTimeCol, rightTimeCol, strict, tolerance, broadcast)
      .drop(SkewSalt.SaltCol)
  }

  /** Forward as-of: for each left row, the right row with the SMALLEST time
    * strictly above (strict) / at-or-above (non-strict) the left time —
    * DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t < r.t` (resp. `<=`).
    *
    * Implemented by the identity forward(t) = backward(-t): both time
    * columns are negated in a pre-projection, the ordinary backward merge
    * runs (its (key, -t)-ascending sort IS (key, t)-descending), and the
    * helper columns are dropped on the way out. One exchange per side,
    * same as the backward operator; tolerance bounds `r.t - l.t`. */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String,
      strict: Boolean = true, tolerance: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val lNeg = "__asof_l_neg"
    val rNeg = "__asof_r_neg"
    val l2 = left.withColumn(lNeg, expr(s"-`$leftTimeCol`"))
    val r2 = right.withColumn(rNeg, expr(s"-`$rightTimeCol`"))
    join(l2, r2, keys, lNeg, rNeg, strict, tolerance, broadcast)
      .drop(lNeg, rNeg)
  }
}
