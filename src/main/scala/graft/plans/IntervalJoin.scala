package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  BindReferences, Expression, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator KEYED INTERVAL OVERLAP JOIN — the second §7.3(c)
  * first-class Catalyst operator beside [[AsOfJoinPlan]]: emit every
  * (left, right) pair of same-key intervals that overlap, `l.start ≤ r.end
  * AND r.start ≤ l.end` (closed ends — touching counts, q136's convention).
  *
  * Spark has no physical plan for this: an interval predicate under a plain
  * join plans as BroadcastNestedLoop or Cartesian (the shapes PlansSpec
  * bans), and the composed alternative — grid bucketing (q136) — pays a
  * cell-explode fan-out plus a distinct to undo double-counted cells. This
  * node instead rides the sort-merge infrastructure:
  *
  *  - `requiredChildDistribution` = [[ClusteredDistribution]] on the keys,
  *    so EnsureRequirements plans one compatible exchange pair (or none,
  *    under bucketing/AQE) — the sort-merge join mechanism;
  *  - `requiredChildOrdering` = (keys, start) ascending on BOTH sides,
  *    making the per-partition PLANE SWEEP possible: walk both sides in
  *    start order, keep an ACTIVE list per side (intervals whose end may
  *    still reach a future start), and every arriving interval pairs with
  *    exactly the surviving actives of the other side — each of which is a
  *    REAL overlap (actives have start ≤ arriving.start by sort order, and
  *    pruning guarantees end ≥ arriving.start), so no verify filter runs
  *    after the sweep;
  *  - memory is the MAX CONCURRENT OVERLAP DEPTH per key (intervals alive
  *    at one instant), never a side's row count — the declared bound; a
  *    key×time range dense enough to break it produces quadratic OUTPUT,
  *    which no join shape survives.
  *
  * Null handling: a null start or end never matches (skipped at arrival),
  * and a MALFORMED interval (end < start) never matches — the sweep's
  * correctness argument needs end ≥ start, so the operator declares empty
  * intervals non-joinable rather than silently mis-pairing them; null keys
  * group together (binary row equality), matching the engine's as-of
  * convention. Times are LongType (epoch seconds/micros — any consistent
  * unit).
  */
case class IntervalJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    joinType: String = "inner", broadcastRight: Option[Boolean] = None)
  extends BinaryNode {
  override def output: Seq[Attribute] = joinType match {
    case "left_semi" | "left_anti" => left.output
    case "left_outer" => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical keyed interval join: hash-clustered, (key, start)-sorted
  * children swept in one forward pass per partition.
  *
  * Join-type family over the one sweep (`joinType`): `inner` emits every
  * overlapping pair; `left_outer` additionally null-extends left intervals
  * that never overlap anything (emitted when the sweep PROVES no future
  * right can reach them — eviction or end-of-key — the same
  * watermark-shaped argument the streaming outer joins make);
  * `left_semi` emits each overlapping left interval exactly once, at its
  * FIRST proof of overlap, and drops it from state immediately;
  * `left_anti` emits exactly the lefts that survive to eviction unmatched.
  * Left rows with null/malformed bounds count as never-matching: outer and
  * anti emit them (null-extended / bare) at arrival.
  *
  * AQE interaction — what holds and what does not (PlansSpec pins both on
  * the as-of sibling; the mechanism is identical because both nodes
  * declare the same ClusteredDistribution): AQE partition COALESCING folds
  * the node's post-shuffle partitions consistently on both sides, as for
  * sort-merge join. AQE's SKEW-JOIN SPLIT does NOT apply —
  * `OptimizeSkewedJoin` rewrites `SortMergeJoinExec`/`ShuffledHashJoinExec`
  * only — so a hot key keeps its straggler. At 100 TB the remedies, in
  * preference order: a dimension-sized right makes the strategy pick
  * [[BroadcastIntervalJoinExec]] (no left shuffle at all, so no skew);
  * otherwise SALT — extend the left key with `pmod(hash(salt_source), S)`
  * and replicate each right interval to all S salts of its key; the sweep
  * is correct per (key, salt) partition because every partition still
  * holds the key's full right-side interval set. */
case class IntervalJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression, joinType: String,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] = joinType match {
    case "left_semi" | "left_anti" => left.output
    case "left_outer" => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftStart, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightStart, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    // bytes of sweep state (actives/pending) spilled to disk — nonzero only
    // when a key's concurrent overlap depth outgrows the per-task budget
    // (spark.graft.interval.sweep.spillThreshold); see SweepSpill
    "spillBytes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createSizeMetric(sparkContext, "sweep state spill size"))

  /** The plane sweep as a shared compiled cursor ([[IntervalSweepCursor]])
    * — one step machine behind both the iterator path and the generated
    * produce loop, so the paths cannot drift in ANY mode. */
  private def cursorBuilder = new IntervalSweepCursorBuilder(left.output,
    right.output, leftKeys, rightKeys, leftStart, leftEnd, rightStart,
    rightEnd, joinType)

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
    val mode = joinType
    val builder = cursorBuilder
    val numOutput = longMetric("numOutputRows")
    val spill = longMetric("spillBytes")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val cursor = builder.create(lIter, rIter, spill)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.length)
      // flatten joined pairs to UnsafeRow (SMJ's resultProj contract)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val leftOnly = mode == "left_semi" || mode == "left_anti"
      new Iterator[InternalRow] {
        private var ready = false
        override def hasNext: Boolean = {
          if (!ready) ready = cursor.advance()
          ready
        }
        override def next(): InternalRow = {
          if (!ready && !cursor.advance())
            throw new NoSuchElementException("exhausted interval sweep")
          ready = false
          numOutput += 1
          if (leftOnly) cursor.leftRow
          else {
            val r = cursor.rightRow
            resultProj(joined(cursor.leftRow, if (r != null) r else nullRight))
          }
        }
      }
    }
  }

  // ---- whole-stage codegen: the SortMergeJoinExec shape — this node OWNS
  // the produce loop over BOTH sorted inputs; downstream operators fuse
  // onto the sweep output, deleting the per-pair resultProj
  // materialization the iterator path pays ----

  import org.apache.spark.sql.catalyst.expressions.BoundReference
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
    CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.execution.CodegenSupport

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val builderRef = ctx.addReferenceObj("intervalSweepBuilder", cursorBuilder,
      classOf[IntervalSweepCursorBuilder].getName)
    val spillTerm = metricTerm(ctx, "spillBytes")
    val cursorTerm = ctx.addMutableState(classOf[IntervalSweepCursor].getName,
      "intervalSweepCursor",
      v => s"$v = $builderRef.create(inputs[0], inputs[1], $spillTerm);")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val lTerm = ctx.freshName("sweepLeftRow")
    val mTerm = ctx.freshName("sweepRightRow")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    ctx.currentVars = null
    ctx.INPUT_ROW = lTerm
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val outputVars = joinType match {
      case "left_semi" | "left_anti" => leftVars
      case _ => leftVars ++ genRightVarsFrom(ctx, mTerm)
    }
    val bindRight = joinType match {
      case "left_semi" | "left_anti" => ""
      case _ => s"$rowCls $mTerm = $cursorTerm.rightRow();"
    }
    s"""
       |while ($cursorTerm.advance()) {
       |  $rowCls $lTerm = $cursorTerm.leftRow();
       |  $bindRight
       |  $numOutput.add(1);
       |  ${consume(ctx, outputVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  /** Right-side output vars decoded from the sweep's current right row —
    * null defaults for the outer null-extension, nullability forced wide. */
  private def genRightVarsFrom(ctx: CodegenContext, matched: String): Seq[ExprCode] = {
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
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast keyed interval join: the right (window/dimension) side ships
  * whole to every task and the LEFT SIDE IS NEVER SHUFFLED OR SORTED —
  * `outputPartitioning`/`outputOrdering` pass the left child's through
  * untouched, the same contract as [[BroadcastAsOfJoinExec]]. Per
  * partition the broadcast rows build one hash index key → intervals
  * sorted by start plus a RUNNING MAX-END prefix array; each left
  * interval [ls, le] binary-searches the last start ≤ le, then
  * binary-searches the prefix-max array for the first position that could
  * still be alive at ls (prefix max-end ≥ ls) and scans only [j0 ..
  * last] — the dead head (entries a non-decreasing prefix max proves all
  * ended before ls) is skipped in O(log n) at one extra Long per entry.
  * Per-left cost is O(log n + live-prefix length); a full interval tree
  * would tighten the middle (live-but-dead-interleaved) case too, but at
  * dimension size the two-binary-search scan wins on constant factor,
  * and the `candidatesScanned` SQLMetric keeps the trade observable
  * (spec-measured ~200× fewer entries visited on a short-lived-head
  * fixture). Because the fact side keeps its partitioning, this
  * exec is also what makes UNKEYED (global-window) interval joins
  * feasible: a constant key under the merge exec would funnel every row
  * into one partition, here it just means a one-entry index. Same
  * null/malformed and mode semantics as [[IntervalJoinExec]]; equality
  * is law-tested per mode on randomized tables. */
case class BroadcastIntervalJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression, joinType: String,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode with org.apache.spark.sql.execution.CodegenSupport {
  import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
    IdentityBroadcastMode, UnspecifiedDistribution}

  override def output: Seq[Attribute] = joinType match {
    case "left_semi" | "left_anti" => left.output
    case "left_outer" => left.output ++ right.output.map(_.withNullability(true))
    case _ => left.output ++ right.output
  }

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  // scanned = prefix entries actually visited per probe AFTER the dead-head
  // cut; the spec pins the cut's effect against the naive prefix length
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "candidatesScanned" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "candidate prefix entries scanned"))

  /** Probe builder shared by the iterator and codegen paths — one
    * window/dead-head-cut implementation, so the paths cannot drift. */
  private def probeBuilder = new IntervalProbeBuilder(
    right.output, rightKeys, rightStart, rightEnd)

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
    val lKeyExprs = leftKeys
    val lS = leftStart; val lE = leftEnd
    val mode = joinType
    val scanned = longMetric("candidatesScanned")
    val numOutput = longMetric("numOutputRows")
    val builder = probeBuilder
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      // one mutable cursor per task (Iterator.flatMap consumes each row's
      // sub-iterator fully — or abandons the whole stream — before the
      // next init) over the per-executor-cached index map: the heavy
      // group/sort build happens once per (join, broadcast) per JVM, not
      // per task; see ProbeIndexCache
      val probe = builder.newProbeCached(broadcastRows, scanned)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lSe = BindReferences.bindReference(lS, lOut)
      val lEe = BindReferences.bindReference(lE, lOut)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.length)
      // flatten to UnsafeRow (SMJ's resultProj contract — see the merge exec)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      lIter.flatMap { l =>
        val sv = lSe.eval(l); val ev = lEe.eval(l)
        val valid = sv != null && ev != null &&
          ev.asInstanceOf[Long] >= sv.asInstanceOf[Long]
        // both branches count into numOutputRows — the invalid-bounds
        // emissions (outer null-extension, anti passthrough) are output
        // rows too, and the metric must not undercount them
        val out0: Iterator[InternalRow] = if (!valid) mode match {
          case "left_outer" => Iterator.single(resultProj(joined(l, nullRight)))
          case "left_anti" => Iterator.single(l)
          case _ => Iterator.empty
        } else {
          probe.init(lKeyProj(l), sv.asInstanceOf[Long], ev.asInstanceOf[Long])
          // `scanned` counts LAZILY inside probe.next(): semi/anti stop at
          // the first live match and never inflate the metric with entries
          // they did not visit
          mode match {
            case "inner" =>
              Iterator.continually(probe.next()).takeWhile(_ != null)
                .map(r => resultProj(joined(l, r)))
            case "left_outer" =>
              val first = probe.next()
              if (first == null) Iterator.single(resultProj(joined(l, nullRight)))
              else (Iterator.single(first) ++
                  Iterator.continually(probe.next()).takeWhile(_ != null))
                .map(r => resultProj(joined(l, r)))
            case "left_semi" =>
              if (probe.next() != null) Iterator.single(l) else Iterator.empty
            case _ => // left_anti
              if (probe.next() == null) Iterator.single(l) else Iterator.empty
          }
        }
        out0.map { r => numOutput += 1; r }
      }
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen: fuse the probe into the fact side's pipeline
  // (the BroadcastHashJoinExec shape; multi-match modes loop the shared
  // cursor inline, single-decision modes probe once) ----

  import org.apache.spark.sql.catalyst.expressions.BoundReference
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
    CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.execution.CodegenSupport

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[CodegenSupport].inputRDDs()

  // inner/outer may emit SEVERAL rows per input row whose right-side vars
  // re-read the same buffers — downstream buffering must copy (the
  // BroadcastHashJoinExec non-unique-key contract); semi/anti emit at most
  // one row per input and pass the child's requirement through
  override def needCopyResult: Boolean = joinType match {
    case "inner" | "left_outer" => true
    case _ => left.asInstanceOf[CodegenSupport].needCopyResult
  }

  override protected def doProduce(ctx: CodegenContext): String =
    left.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    val builderRef = ctx.addReferenceObj("intervalBuilder", probeBuilder,
      classOf[IntervalProbeBuilder].getName)
    val bcastRef = ctx.addReferenceObj("intervalBroadcast", broadcastRows,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val scannedTerm = metricTerm(ctx, "candidatesScanned")
    val probeTerm = ctx.addMutableState(classOf[IntervalProbeIndex].getName,
      "intervalProbe", v => s"$v = $builderRef.newProbeCached(" +
        s"$bcastRef, $scannedTerm);")
    ctx.currentVars = input
    val keyEv = GenerateUnsafeProjection.createCode(ctx,
      leftKeys.map(BindReferences.bindReference(_, left.output)))
    val lsEv = BindReferences.bindReference(leftStart, left.output).genCode(ctx)
    val leEv = BindReferences.bindReference(leftEnd, left.output).genCode(ctx)
    val valid = ctx.freshName("intervalValid")
    val m = ctx.freshName("intervalMatched")
    val numOutput = metricTerm(ctx, "numOutputRows")
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    val common =
      s"""
         |${keyEv.code}
         |${lsEv.code}
         |${leEv.code}
         |boolean $valid = !${lsEv.isNull} && !${leEv.isNull} &&
         |  ${leEv.value} >= ${lsEv.value};
         |if ($valid) {
         |  $probeTerm.init(${keyEv.value}, ${lsEv.value}, ${leEv.value});
         |}
       """.stripMargin
    joinType match {
      case "inner" =>
        val rightVars = genRightVars(ctx, m)
        common +
          s"""
             |if ($valid) {
             |  $rowCls $m;
             |  while (($m = $probeTerm.next()) != null) {
             |    $numOutput.add(1);
             |    ${consume(ctx, input ++ rightVars)}
             |  }
             |}
           """.stripMargin
      case "left_outer" =>
        // single consume emission: the loop's final null iteration IS the
        // null-extension when nothing matched (the BroadcastHashJoinExec
        // codegenOuter shape); invalid bounds take the same null path
        val rightVars = genRightVars(ctx, m)
        val found = ctx.freshName("intervalFound")
        common +
          s"""
             |boolean $found = false;
             |$rowCls $m;
             |do {
             |  $m = $valid ? $probeTerm.next() : null;
             |  if ($m != null || !$found) {
             |    $found = true;
             |    $numOutput.add(1);
             |    ${consume(ctx, input ++ rightVars)}
             |  }
             |} while ($m != null);
           """.stripMargin
      case "left_semi" =>
        common +
          s"""
             |if ($valid && $probeTerm.next() != null) {
             |  $numOutput.add(1);
             |  ${consume(ctx, input)}
             |}
           """.stripMargin
      case _ => // left_anti: invalid bounds never match — emit; else emit
        // exactly when the probe finds nothing
        common +
          s"""
             |if (!$valid || $probeTerm.next() == null) {
             |  $numOutput.add(1);
             |  ${consume(ctx, input)}
             |}
           """.stripMargin
    }
  }

  /** Right-side output vars decoded from the matched broadcast row — null
    * defaults when unmatched, nullability forced wide like the iterator
    * path's widened resultProj input schema. */
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
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] to the merge or broadcast exec; a no-op on
  * every other node.
  *
  * Exec selection is STATS-DRIVEN by default (the [[AsOfJoinStrategy]]
  * contract, shared via its `pickBroadcast`): with no explicit caller
  * flag, the right side broadcasts iff `right.stats.sizeInBytes` fits
  * under `spark.sql.autoBroadcastJoinThreshold` (non-positive threshold
  * disables — Spark's `-1` convention), exactly how JoinSelection sizes
  * equi-joins; `Some(true/false)` from the API always overrides. The
  * measured stake is SCALING.md's `Dev intervalbcast` probe: broadcasting
  * a dimension-sized window table cut the join's wire cost −99.99% vs
  * hashing the fact side — a win that should come from the planner, not
  * from the caller remembering a boolean. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, ls, le, rs, re, jt, bcast) =>
      if (AsOfJoinStrategy.pickBroadcast(bcast, r))
        BroadcastIntervalJoinExec(lk, rk, ls, le, rs, re, jt,
          planLater(l), planLater(r)) :: Nil
      else
        IntervalJoinExec(lk, rk, ls, le, rs, re, jt,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public API: `IntervalJoin.join(sessA, sessB, Seq("user_id" -> "b_user"),
  * "a_start", "a_end", "b_start", "b_end")`. Both schemas survive into the
  * output; the caller disambiguates names up front (the as-of contract). */
object IntervalJoin {
  /** Idempotently make the strategy available on sessions not built with
    * the GraftExtensions config (tests, foreign sessions). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(IntervalJoinStrategy))
      em.extraStrategies = IntervalJoinStrategy +: em.extraStrategies
  }

  /** `broadcast = None` (the default) lets [[IntervalJoinStrategy]] pick
    * the exec from the right side's stats vs `autoBroadcastJoinThreshold`;
    * `Some(true)`/`Some(false)` forces broadcast/merge regardless.
    *
    * BEHAVIOR CHANGE NOTE (shared with [[AsOf.join]]): `None` used to mean
    * always-merge; it now consults the right side's Catalyst size estimate,
    * so a size-UNDERestimated right (filter-adjusted CBO stats) can
    * auto-broadcast a large table. Pin `Some(false)` — or disable with
    * `spark.sql.autoBroadcastJoinThreshold = -1` — to recover the old
    * merge-only behavior. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftStartCol: String, leftEndCol: String,
      rightStartCol: String, rightEndCol: String,
      joinType: String = "inner",
      broadcast: Option[Boolean] = None): DataFrame = {
    // fleet-wide AUTOMATIC salting (see [[SkewSalt.autoSalts]]): conf
    // opt-in + merge-exec path → rewrite to the salted form, no call-site
    // change; a broadcast right has no exchange to skew, so it opts out
    if (SkewSalt.autoSalts(left.sparkSession) >= 2 &&
        !AsOfJoinStrategy.pickBroadcast(broadcast,
          right.queryExecution.optimizedPlan))
      joinSalted(left, right, keys, leftStartCol, leftEndCol, rightStartCol,
        rightEndCol, joinType, salts = SkewSalt.autoSalts(left.sparkSession),
        // stored stats (statsPath conf) replace the per-join detection
        // pass when present; else joinSalted runs the exact counting pass
        hotKeys = SkewSalt.autoHotKeys(left.sparkSession, keys.map(_._1)),
        hotThreshold = SkewSalt.autoThreshold(left.sparkSession),
        broadcast = broadcast.orElse(Some(false)))
    else joinPlain(left, right, keys, leftStartCol, leftEndCol,
      rightStartCol, rightEndCol, joinType, broadcast)
  }

  private def joinPlain(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftStartCol: String, leftEndCol: String,
      rightStartCol: String, rightEndCol: String,
      joinType: String, broadcast: Option[Boolean]): DataFrame = {
    require(Set("inner", "left_outer", "left_semi", "left_anti")(joinType),
      s"unsupported interval join type: $joinType")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join cannot carry duplicate
    // attribute ids into the node
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
      s"interval join key types must match pairwise: " +
        s"${lk.map(_.dataType)} vs ${rk.map(_.dataType)}")
    val cols = Seq(resolve(lPlan.output, leftStartCol),
      resolve(lPlan.output, leftEndCol),
      resolve(rPlan.output, rightStartCol), resolve(rPlan.output, rightEndCol))
    require(cols.forall(_.dataType == LongType),
      "interval bounds must be LongType (consistent epoch unit)")
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      IntervalJoinPlan(lPlan, rPlan, lk, rk,
        cols(0), cols(1), cols(2), cols(3), joinType, broadcast))
  }

  /** SKEW-SALTED interval join — same semantics and output as [[join]] in
    * EVERY mode, for the case a HOT KEY would straggle the merge exec
    * (AQE's skew split never fires for custom execs; see [[SkewSalt]]).
    * Left intervals of hot keys split across `salts` sub-keys by
    * `pmod(hash(leftStart, leftEnd), salts)`; right intervals of hot keys
    * replicate to every salt. Each (key, salt) partition holds the key's
    * FULL right interval set, and each left interval lives in exactly ONE
    * salt, so inner emits every overlap pair exactly once and
    * outer/semi/anti make their per-left decision against the complete
    * right side — law-tested equal to [[join]] per mode on random and
    * crafted hot-key tables.
    *
    * Hot keys come from `hotKeys` (a frame of the LEFT key columns) when
    * given — the 100-TB path — else from one exact key-only counting pass
    * at `hotThreshold` rows (map-side combined). `broadcast` defaults to
    * `Some(false)`: a broadcast-able right side has no skew problem to
    * salt. The replication cost is `salts ×` the HOT SLICE of the right
    * side only — cold keys are never duplicated. */
  def joinSalted(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftStartCol: String, leftEndCol: String,
      rightStartCol: String, rightEndCol: String,
      joinType: String = "inner",
      salts: Int = 8, hotKeys: Option[DataFrame] = None,
      hotThreshold: Long = 5000000L,
      broadcast: Option[Boolean] = Some(false)): DataFrame = {
    val hot = hotKeys.getOrElse(SkewSalt.hotKeys(left, keys.map(_._1), hotThreshold))
    val (lS, rS) = SkewSalt.saltSides(left, right, keys,
      Seq(leftStartCol, leftEndCol), salts, hot)
    joinPlain(lS, rS, keys :+ (SkewSalt.SaltCol -> SkewSalt.SaltCol),
      leftStartCol, leftEndCol, rightStartCol, rightEndCol, joinType, broadcast)
      .drop(SkewSalt.SaltCol)
  }
}
