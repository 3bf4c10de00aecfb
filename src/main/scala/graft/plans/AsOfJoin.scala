package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BindReferences, Expression, JoinedRow, GenericInternalRow,
  SortOrder, Ascending, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** J5n: the as-of join as a FIRST-CLASS operator — custom logical plan +
  * planner strategy + merge physical operator, the deepest of the three
  * extension tiers (expression < aggregator < whole-operator) and the one
  * the rest of the engine hadn't needed until now.
  *
  * Semantics (pandas merge_asof / DuckDB ASOF LEFT JOIN, the J5 contract,
  * reference's freshest-wins rank at `stg_weather_raw.sql:30-38` being the
  * window cousin): for every left row, attach the LAST right row with the
  * same key whose time is <= the left row's time, or nulls if none.
  * Right-side time ties resolve to the last row in (key, time) partition
  * order — callers that need determinism dedup the right side first
  * (j5_asof's max-orderkey pre-aggregation), exactly as with the composed
  * form.
  *
  * Why a custom operator instead of the J5 union-window encoding:
  *  - the union form pads BOTH sides to one wide schema (null okey on
  *    events, null event cols on orders), shuffles and sorts the UNION,
  *    runs a WindowExec carrying a running last() over every row, then
  *    filters half of them back out. The merge operator shuffles each
  *    side in its own (narrow) schema and emits only left rows — no
  *    padding columns, no post-filter, one streaming pass per partition
  *    with O(1) state (the current match), never a window buffer.
  *  - distribution requirements are declared per CHILD, so a side that
  *    is already hash-partitioned on the key (bucketed table, reused
  *    exchange) joins with NO new shuffle — the union form must always
  *    shuffle the union it just built (AsOfJoinSpec pins both: 2
  *    exchanges from cold inputs, 0 new ones from pre-partitioned).
  * 100 TB: cost = one shuffle+sort per side on the equi key (the SMJ
  * shape), then a linear merge; skew handling is the same as any keyed
  * join (AQE skew split applies to the exchanges); memory per task is one
  * lookahead row + one match row, so it never spills beyond the sorts.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  // left-outer semantics: right columns become nullable on the output
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions` (production) or `session.experimental.extraStrategies`
  * (the same-JVM ensure path). AQE replans through it too — the strategy
  * is resolved from the session's planner on every re-optimization.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Merge-join physical operator: each child is clustered on its key and
  * sorted (key, time) — declared via requiredChildDistribution/Ordering so
  * EnsureRequirements supplies exchanges and sorts ONLY where the child
  * isn't already laid out right. Per partition, a single forward pass:
  * advance the right iterator while its (key, time) stays <= the probe
  * row's, remembering the last same-key row seen — that row IS the as-of
  * match (rows arrive time-ascending, so the last eligible is the
  * greatest). State per task: one lookahead row + one match row.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // left rows pass through in order, exactly once
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lOut = left.output
    val rOut = right.output
    // ascribe to Expression: bindReference[A] would cast the BoundReference
    // result back to the Attribute type parameter
    val lk = BindReferences.bindReference(leftKey: Expression, lOut)
    val lt = BindReferences.bindReference(leftTime: Expression, lOut)
    val rk = BindReferences.bindReference(rightKey: Expression, rOut)
    val rt = BindReferences.bindReference(rightTime: Expression, rOut)
    val outAttrs = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)
        // bind against NULLABLE right attrs: the null-padded no-match row
        // must project as nulls, not as zero-valued primitives
        val project = UnsafeProjection.create(
          outAttrs, lOut ++ rOut.map(_.withNullability(true)))
        // one lookahead row — copied because Spark reuses iterator rows
        var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        var matchRow: InternalRow = null
        var matchKey: Any = null
        lIter.map { l =>
          val probeKey = lk.eval(l)
          val probeTime = lt.eval(l)
          if (matchRow != null && (probeKey == null || keyOrd.compare(matchKey, probeKey) != 0)) {
            matchRow = null
          }
          if (probeKey != null && probeTime != null) {
            var advancing = rRow != null
            while (advancing) {
              val rKeyV = rk.eval(rRow)
              // null right keys sort first and match nothing: skip past
              val cmp = if (rKeyV == null) -1 else keyOrd.compare(rKeyV, probeKey)
              if (cmp < 0) {
                rRow = if (rIter.hasNext) rIter.next().copy() else null
                advancing = rRow != null
              } else if (cmp == 0) {
                val rTimeV = rt.eval(rRow)
                if (rTimeV != null && timeOrd.compare(rTimeV, probeTime) <= 0) {
                  matchRow = rRow
                  matchKey = rKeyV
                  rRow = if (rIter.hasNext) rIter.next().copy() else null
                  advancing = rRow != null
                } else if (rTimeV == null) {
                  // null time sorts first within the key group: ineligible
                  rRow = if (rIter.hasNext) rIter.next().copy() else null
                  advancing = rRow != null
                } else {
                  advancing = false
                }
              } else {
                advancing = false
              }
            }
          }
          numOutputRows += 1
          if (matchRow != null) {
            numMatched += 1
            project(joined(l, matchRow))
          } else {
            project(joined(l, nullRight))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Catalyst integration for the custom node: the built-in ColumnPruning
  * rule doesn't know [[AsOfJoin]], so without help a join of two wide
  * tables shuffles EVERY column even when the caller selects three — at
  * 100 TB the exchange width is the cost. This injected
  * [[org.apache.spark.sql.catalyst.rules.Rule]] (the extension hook the
  * engine hadn't needed before: expression < aggregator < rule <
  * strategy+plan) narrows each child to the columns the parent Project
  * and the join condition actually reference, BEFORE the exchanges the
  * exec's distribution requirements will insert. Fixed-point safe: it
  * only fires when a child still carries unreferenced columns.
  * (Injected post-main-batch, so the inserted Project stays a projection
  * above the scan rather than merging into it — it narrows the SHUFFLE,
  * which is the scale cost; scan-level pruning remains the caller's
  * select, as everywhere else in the engine.)
  */
object PruneAsOfJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoin) =>
      val needed = AttributeSet(p.projectList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.rightKey, j.leftTime, j.rightTime))
      def prune(child: LogicalPlan): Option[LogicalPlan] = {
        val keep = child.output.filter(needed.contains)
        if (keep.size < child.output.size) Some(Project(keep, child)) else None
      }
      (prune(j.left), prune(j.right)) match {
        case (None, None) => p
        case (pl, pr) => p.copy(child =
          j.copy(left = pl.getOrElse(j.left), right = pr.getOrElse(j.right)))
      }
  }
}

/** User-facing constructor (the `merge_asof` entry point). Registers the
  * strategy and the pruning rule idempotently on the session's
  * experimental lists so the operator works in sessions built without
  * `spark.sql.extensions`.
  */
object AsOf {
  def joinAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PruneAsOfJoinColumns)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneAsOfJoinColumns
    }
    def attr(df: DataFrame, name: String): Attribute = {
      val out = df.queryExecution.analyzed.output
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${out.map(_.name).mkString(",")}"))
    }
    GraftPlanBridge.ofRows(spark,
      AsOfJoin(left.queryExecution.analyzed, right.queryExecution.analyzed,
        attr(left, leftKey), attr(right, rightKey),
        attr(left, leftTime), attr(right, rightTime)))
  }
}
