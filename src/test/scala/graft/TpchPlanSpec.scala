package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.ops.SqlTpch

/** Plan-shape pins for the TPC-H completion batch (SqlTpch.scala): each
  * test asserts the scale property the query's scaladoc claims, so a
  * Catalyst regression (a lost pushdown, a decorrelation falling back to a
  * per-row rescan, an OR-join degenerating to nested-loop) fails the build
  * rather than silently 100×-ing the 100 TB plan.
  */
class TpchPlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    val p = df.queryExecution.executedPlan
    val unwrapped: SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    unwrapped.toString + "\n" + df.queryExecution.executedPlan.toString
  }

  test("Q6 pure-scan aggregate: predicates pushed, no join, no wide read") {
    val df = SqlTpch.sqlTpchQ6(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_shipdate"), "ship-date range must reach the scan")
    assert(!plan.contains("Join"), "Q6 must not join anything")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"), "only the 3 used columns read")
  }

  test("Q19 disjunctive predicate stays ONE hash join on p_partkey") {
    val df = SqlTpch.sqlTpchQ19(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "OR blocks must not defeat the equi-join:\n" + plan.take(2000))
    val joins = "HashJoin".r.findAllIn(plan).size
    assert(joins >= 1, "expected a hash join on p_partkey:\n" + plan.take(2000))
  }

  test("Q17 correlated AVG decorrelates to an aggregate, not a per-row rescan") {
    val df = SqlTpch.sqlTpchQ17(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "correlated AVG must decorrelate:\n" + plan.take(2000))
    assert(plan.contains("HashAggregate"), "expected the decorrelated per-part AVG aggregate")
  }

  test("Q15 scalar MAX over the revenue CTE collapses to a one-row subquery, not a join explosion") {
    val df = SqlTpch.sqlTpchQ15(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the argmax equality must be a filter/join against a scalar, never BNLJ
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("Q21 double quantifier lowers to semi + anti hash joins on l_orderkey") {
    val df = SqlTpch.sqlTpchQ21(spark, sfDir)
    df.count()
    val plan = planString(df)
    assert(plan.contains("LeftSemi"), "EXISTS must lower to a semi join:\n" + plan.take(2000))
    assert(plan.contains("LeftAnti"), "NOT EXISTS must lower to an anti join:\n" + plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }
}
