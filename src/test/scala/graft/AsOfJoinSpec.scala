package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.plans.AsOf

/** The native as-of operator (custom LogicalPlan + strategy + merge exec):
  * value-identical to the composed union-window form, and physically what
  * the composed form can't be — no union padding, no WindowExec, per-child
  * distribution requirements so pre-partitioned inputs join shuffle-free.
  */
class AsOfJoinSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect() // force execution so AQE settles on the real plan
    val p: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    p.toString
  }

  test("native as-of equals the composed union-window form on real tables") {
    val composed = Relational.j5AsOf(spark, sfDir).collect().toSeq
    val native = Relational.j5nAsOfNative(spark, sfDir).collect().toSeq
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("native tolerance variant equals the composed J5b (self-join inputs)") {
    val composed = Relational.j5bAsOfTol(spark, sfDir).collect().toSeq
    val native = Relational.j5bnAsOfTolNative(spark, sfDir).collect().toSeq
    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("hand-built semantics: ties match, gaps null, null keys never match") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), 10L, "tie"),      // right row AT t=10 is eligible (>=)
      (Option(1L), 20L, "late"),     // picks the LAST eligible (t=15)
      (Option(2L), 5L, "early"),     // right starts at t=6: no match
      (Option(9L), 50L, "nokey"),    // key absent on the right
      (Option.empty[Long], 30L, "nullkey")) // null key matches nothing
      .toDF("k", "t", "who")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (1L, 99L, 199L),
      (2L, 6L, 260L), (3L, 1L, 310L))
      .toDF("k2", "t2", "v")
    val got = AsOf.joinAsOf(left, right, "k", "k2", "t", "t2")
      .select($"who", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(got === Map("tie" -> 100L, "late" -> 150L,
      "early" -> null, "nokey" -> null, "nullkey" -> null))
  }

  test("plan: merge exec, no window or union, one exchange per child") {
    import spark.implicits._
    val l = spark.range(100).select(($"id" % 10).as("k"), $"id".as("t"), $"id".as("lv"))
    val r = spark.range(50).select(($"id" % 10).as("k2"), ($"id" * 2).as("t2"), $"id".as("rv"))
    val plan = finalPlan(AsOf.joinAsOf(l, r, "k", "k2", "t", "t2"))
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    assert(!plan.contains("Window"), "native as-of must not plan a window")
    assert(!plan.contains("Union"), "native as-of must not union the sides")
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 2, s"expected one exchange per child, got $n:\n$plan")
  }

  test("injected rule prunes unreferenced columns below the join") {
    import spark.implicits._
    import graft.plans.AsOfJoin
    val l = spark.range(100).select(($"id" % 10).as("k"), $"id".as("t"),
      $"id".as("la"), $"id".as("lb"), $"id".as("lc"))
    val r = spark.range(50).select(($"id" % 10).as("k2"), ($"id" * 2).as("t2"),
      $"id".as("ra"), $"id".as("rb"), $"id".as("rc"))
    val j = AsOf.joinAsOf(l, r, "k", "k2", "t", "t2").select($"k", $"t", $"ra")
    val pruned = j.queryExecution.optimizedPlan.collect { case a: AsOfJoin => a }
    assert(pruned.nonEmpty, j.queryExecution.optimizedPlan.toString)
    // keys+times+selected survive; la/lb/lc and rb/rc never reach the join
    // (nor, downstream, its exchanges)
    assert(pruned.head.left.output.map(_.name).toSet == Set("k", "t"))
    assert(pruned.head.right.output.map(_.name).toSet == Set("k2", "t2", "ra"))
    // values unchanged by the rewrite
    val full = AsOf.joinAsOf(l, r, "k", "k2", "t", "t2")
      .select($"k", $"t", $"ra").collect().toSeq.sortBy(_.getLong(1))
    assert(j.collect().toSeq.sortBy(_.getLong(1)) == full)
  }

  test("pre-partitioned inputs join with no ADDITIONAL shuffle") {
    import spark.implicits._
    val l = spark.range(100).select(($"id" % 10).as("k"), $"id".as("t"), $"id".as("lv"))
      .repartition(4, $"k")
    val r = spark.range(50).select(($"id" % 10).as("k2"), ($"id" * 2).as("t2"), $"id".as("rv"))
      .repartition(4, $"k2")
    val plan = finalPlan(AsOf.joinAsOf(l, r, "k", "k2", "t", "t2"))
    assert(plan.contains("AsOfJoin"))
    // exactly the two explicit repartitions — EnsureRequirements found the
    // children already clustered on their keys and added nothing
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 2, s"expected no join-added exchanges, got $n:\n$plan")
  }
}
