package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native AS-OF join — the whole-operator extension route ((c) in the
  * build plan's preference ladder): a custom logical node, planner
  * strategy, and physical operator registered through
  * `SparkSessionExtensions`, for the one join type Spark has no
  * physical operator for.
  *
  * Semantics are IDENTICAL to the composed
  * [[graft.operators.Sequences.eventAsofJoin]] (union + running
  * `last(ignoreNulls)` carry): for every probe row, the latest ref row
  * of the same user with `ref.ts_sec <= probe.ts_sec`; among
  * same-second refs the max event_id wins; unmatched probes carry -1
  * sentinels. What the native operator buys at scale:
  *
  *  - NO union materialization: the composed form writes probe+ref
  *    rows through one exchange as a single tagged relation; this one
  *    shuffles each side once on user_id and MERGES them per
  *    partition — the classic sort-merge pattern with an as-of rule
  *    instead of an equality match.
  *  - NO window operator: the carry is a two-pointer per-partition
  *    merge holding THREE longs of state, not a WindowExec frame.
  *  - Sorts are (user, ts, id) WITHIN hash partitions — exactly what
  *    EnsureRequirements inserts below SortMergeJoinExec — so the
  *    whale-user story matches SMJ's (spill-able external sort),
  *    and no single-partition stage exists anywhere.
  *
  * Contract: both children must produce exactly
  * `(user_id: Long, ts_sec: Long, event_id: Long)` — the
  * [[graft.operators.Sequences.eventAsofJoinNative]] builder enforces
  * it; the node is an internal operator, not a public analyzer
  * surface, so it asserts rather than type-coerces.
  */
case class AsofJoinNode(probe: LogicalPlan, ref: LogicalPlan,
                        override val output: Seq[Attribute] =
                          AsofJoinNode.freshOutput)
    extends BinaryNode {

  override def left: LogicalPlan = probe
  override def right: LogicalPlan = ref

  // the output attributes are MINTED here, not derived from children —
  // without this the analyzer's missing-attribute check rejects the node
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(probe = newLeft, ref = newRight)
}

object AsofJoinNode {
  /** Output attributes are a CONSTRUCTOR parameter (with this default
    * minting them once per node), never a derived val: tree transforms
    * `copy()` the node, and a derived val would mint new exprIds on
    * every copy while upstream operators still reference the old ones.
    */
  def freshOutput: Seq[Attribute] =
    Seq("event_id", "user_id", "ts_sec", "ref_ts_sec", "ref_id", "gap_sec")
      .map(n => AttributeReference(n, LongType, nullable = false)())
}

/** Plans [[AsofJoinNode]] → [[AsofJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.GraftExtensions]].
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(probe, ref, out) =>
      AsofJoinExec(out, planLater(probe), planLater(ref)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join.
  *
  * Distribution: both children clustered on `user_id` —
  * EnsureRequirements co-partitions them (the SortMergeJoinExec
  * mechanism, so `zipPartitions` alignment is guaranteed, AQE
  * included). Ordering: `(user_id, ts_sec, event_id)` ascending within
  * partitions — the external (spill-able) sorts EnsureRequirements
  * inserts, never a global sort.
  *
  * Execution is a streamed two-pointer merge per partition: refs for
  * the probe's user are consumed while `ref.ts <= probe.ts`, the last
  * one consumed IS the as-of match (sorted ties ⇒ max event_id), and
  * the carry state is three longs. Neither side is ever buffered.
  */
case class AsofJoinExec(override val output: Seq[Attribute],
                        probe: SparkPlan,
                        ref: SparkPlan) extends BinaryExecNode {

  override def left: SparkPlan = probe
  override def right: SparkPlan = ref

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override def outputPartitioning: Partitioning = probe.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(probe.output.head)),
      ClusteredDistribution(Seq(ref.output.head)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(probe.output.map(a => SortOrder(a, Ascending)),
      ref.output.map(a => SortOrder(a, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    probe.output.take(2).map(a => SortOrder(a, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(probe = newLeft, ref = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val NoRef = -1L
    val types = output.map(_.dataType).toArray
    probe.execute().zipPartitions(ref.execute()) { (pIt, rIt) =>
      // downstream exchanges require UnsafeRow — project per partition
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(types)
      new Iterator[InternalRow] {
        // current un-consumed ref row (rows are reused UnsafeRows —
        // only primitives are extracted, nothing is retained)
        private var rUser = 0L; private var rTs = 0L; private var rId = 0L
        private var rValid = false
        // latest consumed ref for bestUser (the as-of carry: 3 longs)
        private var bestUser = 0L; private var bestTs = 0L
        private var bestId = 0L; private var bestValid = false

        private def advanceRef(): Unit =
          if (rIt.hasNext) {
            val r = rIt.next()
            rUser = r.getLong(0); rTs = r.getLong(1); rId = r.getLong(2)
            rValid = true
          } else rValid = false

        advanceRef()

        override def hasNext: Boolean = pIt.hasNext

        override def next(): InternalRow = {
          val p = pIt.next()
          val pUser = p.getLong(0); val pTs = p.getLong(1)
          val pId = p.getLong(2)
          // consume refs up to the probe: earlier users are skipped,
          // same-user refs with ts <= pTs update the carry (sorted
          // order makes the last one the max-(ts, id) match)
          while (rValid &&
            (rUser < pUser || (rUser == pUser && rTs <= pTs))) {
            if (rUser == pUser) {
              bestUser = rUser; bestTs = rTs; bestId = rId
              bestValid = true
            }
            advanceRef()
          }
          val m = bestValid && bestUser == pUser
          toUnsafe(new GenericInternalRow(Array[Any](
            pId, pUser, pTs,
            if (m) bestTs else NoRef,
            if (m) bestId else NoRef,
            if (m) pTs - bestTs else NoRef)))
        }
      }
    }
  }
}
