package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the custom-operator path (c) from SURVEY §2:
  * a whole-operator semantic Spark lacks, shipped as a logical node +
  * planner strategy + physical merge operator instead of a composition.
  *
  * Contract (enforced, not inferred): both children are pre-shaped to
  * exactly three columns `(key: long, t: long, payload: struct)`; the
  * operator emits, for every left row, the left row plus the LATEST
  * right payload with `right.t <= left.t` on the same key — inner
  * semantics (unmatched left rows are dropped), ties on `t` resolved
  * by greatest payload (matching `Temporal.asofJoin`'s window
  * formulation bit for bit).
  *
  * Scale shape: EnsureRequirements co-partitions both sides on the key
  * and sorts them `(key, t [, payload])`, then `doExecute` is ONE
  * forward-only merge pass per partition — no tagged union
  * materialization, no window buffer, right side consumed exactly
  * once. This is the classic time-series as-of merge join; the window
  * formulation (`Temporal.asofJoin`) remains as the composition
  * baseline it is verified against.
  *
  * Registered two ways, mirroring vec_dot: cluster-wide via
  * `GraftExtensions` (`spark.sql.extensions`), or per-session through
  * `spark.experimental.extraStrategies` (done lazily by
  * `Temporal.asofJoinNative`).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ right.output.last
  // the operator consumes every child column positionally (key, t,
  // payload); without this, ColumnPruning sees no expressions on the
  // node and strips the key/time columns any downstream projection
  // doesn't mention
  override def references: org.apache.spark.sql.catalyst.expressions
      .AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, fwd) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), fwd) :: Nil
    case _ => Nil
  }
}

/** `forward = false`: per left row, the LATEST right row with
  * `rt <= lt` (ties -> greatest payload). `forward = true`: the
  * EARLIEST right row with `rt >= lt` (ties -> least payload). Both
  * tie-breaks are exactly their window formulations' (`last` over the
  * preceding frame / `first` over the following frame, right side
  * ordered `(t, payload)` ascending) — and both fall out of the SAME
  * required right-child ordering: the backward merge overwrites its
  * match through equal-t rows so the last (greatest) survives, the
  * forward merge stops at the first qualifying row (least).
  */
case class AsOfMergeJoinExec(left: SparkPlan, right: SparkPlan,
    forward: Boolean = false) extends BinaryExecNode {

  private def checkShape(p: SparkPlan, side: String): Unit = {
    require(p.output.length == 3 &&
      p.output(0).dataType == LongType && p.output(1).dataType == LongType,
      s"AsOfMergeJoinExec $side child must be (key: long, t: long, " +
        s"payload), got ${p.output.map(a => s"${a.name}: ${a.dataType}")}")
  }
  checkShape(left, "left"); checkShape(right, "right")

  override def output: Seq[Attribute] = left.output :+ right.output.last

  // rows stream out in left-child order, partitioned as the left child
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
      ClusteredDistribution(Seq(right.output.head)) :: Nil

  // right side additionally ordered by payload so equal-t ties resolve
  // to the greatest payload — the same deterministic tie-break as the
  // window formulation's orderBy(t, side, rpay) + last()
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending),
      SortOrder(left.output(1), Ascending)),
    Seq(SortOrder(right.output(0), Ascending),
      SortOrder(right.output(1), Ascending),
      SortOrder(right.output(2), Ascending)))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, left.output ++ right.output)
      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (rIt.hasNext) rIt.next() else null
        private var curMatch: InternalRow = null
        private var curKey: Long = 0L
        private var nextOut: InternalRow = null

        /** Backward: consume right rows up to (k, t) — rows on earlier
          * keys can never match again (left keys ascend); rows on key
          * k with rt <= t each overwrite the current match, so the
          * last — greatest (t, payload) — wins.
          */
        private def advanceRight(k: Long, t: Long): Unit = {
          while (rRow != null && (rRow.getLong(0) < k ||
              (rRow.getLong(0) == k && rRow.getLong(1) <= t))) {
            if (rRow.getLong(0) == k) { curMatch = rRow.copy(); curKey = k }
            rRow = if (rIt.hasNext) rIt.next() else null
          }
        }

        /** Forward: DISCARD right rows strictly before (k, t) — they
          * cannot match this or any later left row (left (k, t)
          * ascends) — then the head, if on key k, is the match: first
          * in (k, rt, payload) order = earliest rt, least payload.
          * The head is NOT consumed; it may serve later left rows.
          */
        private def advanceRightFwd(k: Long, t: Long): Unit = {
          while (rRow != null && (rRow.getLong(0) < k ||
              (rRow.getLong(0) == k && rRow.getLong(1) < t))) {
            rRow = if (rIt.hasNext) rIt.next() else null
          }
        }

        private def findNext(): InternalRow = {
          while (lIt.hasNext) {
            val l = lIt.next()
            val k = l.getLong(0)
            if (forward) {
              advanceRightFwd(k, l.getLong(1))
              if (rRow != null && rRow.getLong(0) == k) {
                numOutputRows += 1
                return proj(joined(l, rRow))
              }
            } else {
              advanceRight(k, l.getLong(1))
              if (curMatch != null && curKey == k) {
                numOutputRows += 1
                return proj(joined(l, curMatch))
              }
            }
          }
          null
        }

        override def hasNext: Boolean = {
          if (nextOut == null) nextOut = findNext()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          val r = nextOut; nextOut = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
