package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join — the (c) extension path: a logical
  * node, a planner strategy, and a physical operator with distribution +
  * ordering requirements, registered through SparkSessionExtensions
  * (GraftExtensions).
  *
  * Semantics: for each left row, attach the payload of the right row
  * with the greatest `rightTs` <= `leftTs` within the same key (NULL
  * payload when none). Equivalent to Windowed.asOfJoin (spec-verified),
  * but executed as a streaming per-partition MERGE over the two sorted,
  * co-partitioned children: each side is shuffled ONCE on its key and
  * sorted within partitions — no union row-blowup, no window state, and
  * the merge is O(|left| + |right|) per partition with O(1) memory.
  *
  * Type restrictions (checked at construction): keys are integral
  * (read as long) and timestamps are timestamp/long-backed — covering
  * the engine's event/order shapes without generic ordering machinery.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]
) extends BinaryNode {
  {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    def longBacked(a: Attribute, what: String): Unit = a.dataType match {
      case LongType | TimestampType | TimestampNTZType => ()
      case dt => throw new IllegalArgumentException(
        s"as-of exec $what '${a.name}' must be long-backed (bigint/timestamp), got $dt")
    }
    longBacked(leftKey, "key"); longBacked(rightKey, "key")
    longBacked(leftTs, "timestamp"); longBacked(rightTs, "timestamp")
  }

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Catalyst optimizer rule (SparkSessionExtensions ·
  * injectOptimizerRule — SURVEY §2 G16): restore filter pushdown
  * through the custom as-of node. Catalyst's stock
  * PushPredicateThroughNonJoin knows nothing about [[AsOfJoinPlan]],
  * so ANY predicate above it — however selective — would otherwise
  * stop at the node and both scans below would read everything.
  * Left-only deterministic conjuncts commute with the as-of
  * semantics (each left row's match depends only on that row and the
  * right side), so they move below the node, where the stock rules in
  * the same fixed-point batch keep walking them down to the scan
  * (`PushedFilters` — spec-locked end to end). Predicates referencing
  * the attached payload are NOT safe to move (they observe the join's
  * result) and stay above; right-side pre-filtering would change the
  * match set and is never derived here.
  */
object AsOfFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(a.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(push.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Catalyst optimizer rule (injectOptimizerRule — SURVEY §2 G17): the
  * column-pruning half of what stock Catalyst cannot do through an
  * unknown node. ColumnPruning stops at [[AsOfJoinPlan]], so a query
  * consuming two columns of a wide as-of result would still scan every
  * column of both children. For a Project above the node (optionally
  * across a retained payload Filter), this rule (1) drops payload
  * columns nothing upstream references — the merge then never copies
  * them — and (2) inserts child Projects keeping only the referenced
  * columns plus each side's key/ts, which the stock rules collapse
  * into the scans (`ReadSchema` narrows — spec-locked). No-op when
  * nothing shrinks, so the fixed point terminates.
  */
object AsOfColumnPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  private def prune(a: AsOfJoinPlan, used: AttributeSet): Option[AsOfJoinPlan] = {
    val keepPayload = a.payload.filter(used.contains)
    val needL = AttributeSet(Seq(a.leftKey, a.leftTs)) ++
      (used -- AttributeSet(a.payload))
    val needR = AttributeSet(Seq(a.rightKey, a.rightTs)) ++
      AttributeSet(keepPayload)
    val newLeft =
      if (a.left.output.forall(needL.contains)) a.left
      else Project(a.left.output.filter(needL.contains), a.left)
    val newRight =
      if (a.right.output.forall(needR.contains)) a.right
      else Project(a.right.output.filter(needR.contains), a.right)
    if (keepPayload.length == a.payload.length &&
        (newLeft eq a.left) && (newRight eq a.right)) None
    else Some(a.copy(left = newLeft, right = newRight, payload = keepPayload))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, a: AsOfJoinPlan) =>
      prune(a, AttributeSet(projList.flatMap(_.references)))
        .map(n => p.copy(child = n)).getOrElse(p)
    case p @ Project(projList, f @ Filter(cond, a: AsOfJoinPlan)) =>
      prune(a, AttributeSet(projList.flatMap(_.references)) ++ cond.references)
        .map(n => p.copy(child = f.copy(child = n))).getOrElse(p)
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, p) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, p) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // 1:1 with the left child's rows: downstream key-aggregations and
  // joins can reuse the partitioning and sort without re-shuffling
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    val payloadIdx = payload.map(a => right.output.indexWhere(_.exprId == a.exprId)).toArray
    require((Seq(lkIdx, ltIdx, rkIdx, rtIdx) ++ payloadIdx).forall(_ >= 0),
      "as-of join attributes must resolve against child outputs")
    val nPayload = payloadIdx.length
    val payloadTypes = payload.map(_.dataType).toArray
    val outputSchema = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val project = UnsafeProjection.create(outputSchema, outputSchema)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(nPayload)
      val matchPayload = new GenericInternalRow(nPayload)

      new Iterator[InternalRow] {
        private var matchKey = 0L
        private var hasMatch = false
        private var rHead: InternalRow = _
        private def advanceRight(): Unit =
          rHead = if (rIt.hasNext) rIt.next() else null
        advanceRight()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          // NULL key/ts never matches (SQL semantics); NULL-keyed left
          // rows sort together but get the null payload below
          if (l.isNullAt(lkIdx) || l.isNullAt(ltIdx))
            return project(joined(l, nullPayload))
          val lKey = l.getLong(lkIdx)
          val lTs = l.getLong(ltIdx)
          // consume right rows up to (lKey, lTs]; the LAST one per key
          // wins; NULL-keyed/ts right rows are skipped
          while (rHead != null && (rHead.isNullAt(rkIdx) || rHead.isNullAt(rtIdx) || {
            val rk = rHead.getLong(rkIdx)
            rk < lKey || (rk == lKey && rHead.getLong(rtIdx) <= lTs)
          })) {
            if (!rHead.isNullAt(rkIdx) && !rHead.isNullAt(rtIdx)) {
              val rk = rHead.getLong(rkIdx)
              if (rk == lKey) {
                var i = 0
                while (i < nPayload) {
                  val idx = payloadIdx(i)
                  if (rHead.isNullAt(idx)) matchPayload.setNullAt(i)
                  else
                    // copyValue: the iterator reuses the row buffer, so
                    // non-primitive values (UTF8String, arrays) must be
                    // deep-copied before advancing past rHead
                    matchPayload.update(i,
                      InternalRow.copyValue(rHead.get(idx, payloadTypes(i))))
                  i += 1
                }
                matchKey = rk
                hasMatch = true
              }
            }
            advanceRight()
          }
          val p =
            if (hasMatch && matchKey == lKey) matchPayload
            else nullPayload
          project(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
