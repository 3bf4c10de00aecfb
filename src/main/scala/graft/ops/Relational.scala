package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Core relational engine capabilities (SURVEY.md §2.6) demonstrated on the
  * driver test tables, each paired with a DuckDB oracle.
  *
  * Determinism rules (FIXTURES.md §B):
  *  - money/value doubles are cast to DECIMAL(12,2) before aggregation so
  *    sums are exact and engine/order-independent; final results cast back
  *    to DOUBLE (exact decimal → nearest double is deterministic).
  *  - every query ends in a total ORDER BY with a unique tiebreaker.
  *  - no current_date()/now(); pivots are literals.
  */
object Relational {

  /** Cast a money-ish double column to exact decimal. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  private def d2(c: Column): Column = c.cast(DoubleType)

  // -------------------------------------------------------------------------
  // A1 hash aggregate — TPC-H Q1 shape (partial+final agg, codegen'd).
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-01").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        d2(sum(dec($"l_quantity"))).as("sum_qty"),
        d2(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        d2(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount")))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------------------------------
  // A2 distinct aggregate.
  def a2DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val a2DistinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------------
  // A3 rollup (multi-grain aggregate in one pass).
  def a3Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        d2(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val a3RollupSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------------
  // A3b cube: all 4 grouping combinations in one pass, with explicit
  // grouping flags (Snowflake/DuckDB GROUPING() ↔ Spark grouping()).
  def a3Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping($"o_orderstatus").as("g_status"),
        grouping($"o_orderpriority").as("g_prio"),
        count(lit(1)).as("n_orders"),
        d2(sum(dec($"o_totalprice"))).as("sum_price"))
      .orderBy($"g_status", $"g_prio",
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val a3CubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus) AS g_status,
      |  GROUPING(o_orderpriority) AS g_prio,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------------
  // A3c explicit grouping sets (the general form rollup/cube compile to),
  // via the SQL entry point — exercising spark.sql + temp views as an API
  // surface alongside the DataFrame DSL.
  def a3GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val a3GroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------------
  // J1 star join. Broadcast scope matters at 100×: nation (25) and region (5)
  // are FIXED-size dims → always broadcast; customer grows linearly with SF,
  // so it must NOT be pinned to the broadcast side — it joins normally and
  // AQE picks broadcast at small SF / shuffle at scale.
  def j1StarJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    val nr = broadcast(
      n.join(r, n("n_regionkey") === r("r_regionkey"))
       .select($"n_nationkey", $"n_name", $"r_name"))
    val dim = c.join(nr, c("c_nationkey") === nr("n_nationkey"))
      .select($"c_custkey", $"n_name", $"r_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(dim, o("o_custkey") === dim("c_custkey"))
      .groupBy($"r_name", $"n_name")
      .agg(
        d2(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  val j1StarJoinSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // -------------------------------------------------------------------------
  // J2 large ⋈ large (sort-merge above broadcast threshold at scale).
  def j2LargeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    li.hint("merge")
      .join(o.hint("merge"), li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        d2(sum(dec($"l_quantity"))).as("sum_qty"))
      .orderBy($"o_orderpriority")
  }

  val j2LargeJoinSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------------
  // J3 left-semi / left-anti (EXISTS / NOT EXISTS; SURVEY S5's incremental
  // file-skip is the same anti-join shape).
  def j3SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select($"o_custkey")
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("with_orders"))
    val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("without_orders"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .select(
        $"c_mktsegment",
        coalesce($"with_orders", lit(0L)).as("with_orders"),
        coalesce($"without_orders", lit(0L)).as("without_orders"))
      .orderBy($"c_mktsegment")
  }

  val j3SemiAntiSql: String =
    """WITH w AS (
      |  SELECT c_mktsegment, COUNT(*) AS with_orders FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment),
      |a AS (
      |  SELECT c_mktsegment, COUNT(*) AS without_orders FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment)
      |SELECT COALESCE(w.c_mktsegment, a.c_mktsegment) AS c_mktsegment,
      |  COALESCE(with_orders, 0) AS with_orders,
      |  COALESCE(without_orders, 0) AS without_orders
      |FROM w FULL OUTER JOIN a USING (c_mktsegment)
      |ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------------------------------
  // J4 outer join: dim-completeness audit.
  def j4Outer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"c_custkey").as("n_customers"),
        count($"o_orderkey").as("n_orders"),
        countDistinct(when($"o_orderkey".isNull, $"c_custkey")).as("n_orderless"))
      .orderBy($"c_mktsegment")
  }

  val j4OuterSql: String =
    """SELECT c_mktsegment,
      |  COUNT(DISTINCT c_custkey) AS n_customers,
      |  COUNT(o_orderkey) AS n_orders,
      |  COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_orderless
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // -------------------------------------------------------------------------
  // J5 as-of join: for each event, the latest order of the same user with
  // o_orderdate <= ts. Spark-first scale design: NOT a non-equi join (which
  // would be a broadcast-nested-loop) — instead the union-and-carry-forward
  // trick: one shuffle on user_id, one sort, last(ignoreNulls) window. This
  // is the single-pass merge an as-of join compiles to in engines that have
  // it natively, and it scales linearly with one exchange.
  def j5AsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // one row per (custkey, orderdate): keep max orderkey → deterministic match
    val od = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
    val orderSide = od.select(
      $"o_custkey".as("user_id"), $"o_orderdate".as("t"),
      lit(0).as("tag"), $"o_orderkey".as("okey"),
      lit(null).cast(LongType).as("event_id"))
    val eventSide = ev.select(
      $"user_id", $"ts".as("t"),
      lit(1).as("tag"), lit(null).cast(LongType).as("okey"),
      $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"t".asc, $"tag".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orderSide.unionByName(eventSide)
      .withColumn("matched_orderkey", last($"okey", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"user_id", $"matched_orderkey")
      .orderBy($"event_id")
  }

  val j5AsOfSql: String =
    """WITH od AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, od.o_orderkey AS matched_orderkey
      |FROM events e ASOF LEFT JOIN od
      |  ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // J5n: J5 again, but through the NATIVE as-of operator (custom logical
  // plan + strategy + merge exec — graft.plans.AsOfJoin, the tier-(c)
  // extension). Same dedup'd right side, same >= semantics, same output —
  // shares J5's oracle, so the oracle certifies the custom operator's
  // physical merge against DuckDB's own ASOF JOIN. AsOfJoinSpec pins the
  // plan differences (no union/window, per-child exchanges) and the
  // zero-new-shuffle behavior on pre-partitioned inputs.
  def j5nAsOfNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"ts", $"event_id")
    val od = Tables.orders(spark, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
      // the union form coerces DATE to TIMESTAMP implicitly; here the
      // cast is explicit (UTC session: same instant either way)
      .select($"o_custkey", $"o_orderdate".cast(TimestampType).as("o_ts"), $"o_orderkey")
    graft.plans.AsOf.joinAsOf(ev, od, "user_id", "o_custkey", "ts", "o_ts")
      .select($"event_id", $"user_id", $"o_orderkey".as("matched_orderkey"))
      .orderBy($"event_id")
  }

  // -------------------------------------------------------------------------
  // J6 band (range) join: events within 3 days after the same user's order.
  // Spark-first shape: the EQUI key (user_id) drives a hash/SMJ join and
  // the band predicate is a post-join filter — never a broadcast-nested-
  // loop. At 100 TB add bucketing on the equi key; for band-only joins
  // (no equi key) the technique is bucketizing the range into epochs and
  // joining on the epoch (same banding shape as the LSH operators).
  def j6BandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val buys = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("buy_id"), $"ts".as("buy_ts"))
    buys.join(clicks,
        Seq("user_id"))
      .filter($"click_ts" >= $"buy_ts" - expr("INTERVAL 1 HOUR") && $"click_ts" < $"buy_ts")
      .groupBy($"user_id")
      .agg(
        countDistinct($"buy_id").as("n_attributed_buys"),
        countDistinct($"click_id").as("n_attributing_clicks"),
        count(lit(1)).as("n_pairs"))
      .orderBy($"user_id")
  }

  val j6BandJoinSql: String =
    """SELECT b.user_id,
      |  COUNT(DISTINCT b.event_id) AS n_attributed_buys,
      |  COUNT(DISTINCT c.event_id) AS n_attributing_clicks,
      |  COUNT(*) AS n_pairs
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') b
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON b.user_id = c.user_id
      | AND c.ts >= b.ts - INTERVAL 1 HOUR
      | AND c.ts < b.ts
      |GROUP BY b.user_id
      |ORDER BY b.user_id""".stripMargin

  // -------------------------------------------------------------------------
  // O1 top-k (TakeOrderedAndProject — no global sort at scale).
  def o1TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_custkey")
      .agg(d2(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount")))).as("revenue"))
      .orderBy($"revenue".desc, $"o_custkey".asc)
      .limit(10)
  }

  val o1TopKSql: String =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_custkey
      |ORDER BY revenue DESC, o_custkey ASC
      |LIMIT 10""".stripMargin

  // -------------------------------------------------------------------------
  // SO1 union / intersect / except semantics computed in ONE scan: per-user
  // membership flags via conditional agg, then one global rollup. The naive
  // except/intersect/union formulation scans events 6× (round-2 verdict);
  // this shape is one scan + one shuffle on user_id and is the plan you want
  // at 100 TB.
  def so1SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "click"))
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase", 1).otherwise(0)).as("is_buyer"),
        max(when($"event_type" === "click", 1).otherwise(0)).as("is_clicker"))
      .agg(
        sum(when($"is_buyer" === 1 && $"is_clicker" === 0, 1L).otherwise(0L)).as("n_except"),
        sum(when($"is_buyer" === 1 && $"is_clicker" === 1, 1L).otherwise(0L)).as("n_intersect"),
        count(lit(1)).as("n_union"))
      .selectExpr("stack(3, 'except', n_except, 'intersect', n_intersect, 'union', n_union) AS (op, n_users)")
      .orderBy($"op")
  }

  val so1SetOpsSql: String =
    """WITH b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
      |SELECT 'except' AS op, COUNT(*) AS n_users FROM (SELECT * FROM b EXCEPT SELECT * FROM c)
      |UNION ALL
      |SELECT 'intersect', COUNT(*) FROM (SELECT * FROM b INTERSECT SELECT * FROM c)
      |UNION ALL
      |SELECT 'union', COUNT(*) FROM (SELECT * FROM b UNION SELECT * FROM c)
      |ORDER BY op""".stripMargin

  // -------------------------------------------------------------------------
  // W1 latest-per-key windowed dedup (the reference's canonical operator,
  // fact_*.sql:17-21,32 — freshest dateGenerated per reading slot).
  def w1LatestPerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", d2(dec($"value")).as("value"))
      .orderBy($"user_id", $"event_type")
  }

  val w1LatestPerKeySql: String =
    """SELECT user_id, event_type, event_id,
      |  CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value
      |FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // -------------------------------------------------------------------------
  // W2 analytic windows: lag delta + moving sum over a row frame.
  def w2Analytic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wFrame = wOrd.rowsBetween(-2, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_value", lag(dec($"value"), 1).over(wOrd))
      .withColumn("delta", d2(dec($"value") - $"prev_value"))
      .withColumn("moving_sum", d2(sum(dec($"value")).over(wFrame)))
      .select($"event_id", $"user_id", $"delta", $"moving_sum")
      .orderBy($"event_id")
  }

  val w2AnalyticSql: String =
    """SELECT event_id, user_id,
      |  CAST(CAST(value AS DECIMAL(12,2))
      |       - LAG(CAST(value AS DECIMAL(12,2)), 1) OVER w AS DOUBLE) AS delta,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2)))
      |       OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------------
  // P4/P5/P7: pushed-down filters (between + in-set) and distinct-project.
  def p457FilterDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate".between(
        lit("1995-01-01").cast(TimestampType), lit("1996-12-31").cast(TimestampType)))
      .filter($"l_returnflag".isin("A", "R"))
      .select($"l_returnflag", $"l_linestatus")
      .dropDuplicates()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val p457FilterDistinctSql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      |  AND l_returnflag IN ('A', 'R')
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -------------------------------------------------------------------------
  // A4 exact percentiles (median / tail) per group. Money doubles are first
  // quantized to integer cents so both engines interpolate over the SAME
  // exact integers (linear interpolation of doubles straight off the column
  // would be last-ulp order-sensitive). At 100 TB exact percentile means a
  // per-group sort — swap in approx_percentile when the group is a fact
  // table, keep exact for dimension-sized groups.
  def a4Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(expr("percentile(cents, 0.25D)") / 100.0, 6).as("p25"),
        round(expr("percentile(cents, 0.5D)") / 100.0, 6).as("p50"),
        round(expr("percentile(cents, 0.95D)") / 100.0, 6).as("p95"))
      .orderBy($"o_orderpriority")
  }

  val a4PercentilesSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) / 100.0, 6) AS p25,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) / 100.0, 6) AS p50,
      |  round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.95) / 100.0, 6) AS p95
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------------
  // A5 pivot (long→wide reshape). Pivot values are passed as LITERALS —
  // Spark otherwise runs an eager distinct job to discover them, which is
  // an extra full scan at scale. Null cells (empty combos) coalesce to 0 so
  // the wide table is dense.
  def a5Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }

  val a5PivotSql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // -------------------------------------------------------------------------
  // W3 ranking-window battery: rank / dense_rank / ntile / percent_rank /
  // cume_dist / lag-delta / first_value in ONE window pass (single shuffle
  // on the partition key; all eight functions share the sort).
  def w3Ranking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"bal".desc, $"c_custkey".asc)
    Tables.customer(spark, dir)
      .withColumn("bal", dec($"c_acctbal"))
      .select(
        $"c_custkey", $"c_nationkey",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        d2($"bal" - lag($"bal", 1).over(w)).as("delta_prev"),
        d2(first($"bal").over(w)).as("top_bal"))
      .filter($"c_custkey" <= 300)
      .orderBy($"c_custkey")
  }

  val w3RankingSql: String =
    """WITH r AS (
      |  SELECT c_custkey, c_nationkey,
      |    RANK() OVER w AS rnk,
      |    DENSE_RANK() OVER w AS drnk,
      |    NTILE(4) OVER w AS quartile,
      |    round(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |    round(CUME_DIST() OVER w, 6) AS cume,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2))
      |         - LAG(CAST(c_acctbal AS DECIMAL(12,2)), 1) OVER w AS DOUBLE) AS delta_prev,
      |    CAST(FIRST_VALUE(CAST(c_acctbal AS DECIMAL(12,2))) OVER w AS DOUBLE) AS top_bal
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey
      |               ORDER BY CAST(c_acctbal AS DECIMAL(12,2)) DESC, c_custkey ASC))
      |SELECT * FROM r WHERE c_custkey <= 300 ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------------
  // W4 range-frame window: trailing-one-hour sum per user, frame bounded by
  // the ORDER VALUE (epoch seconds), not row counts — the time-decay /
  // rate-limiting window shape. RANGE frames include peers (equal sort
  // keys), so the result is order-insensitive within a second in both
  // engines. One shuffle on user_id, same as any W2 window.
  def w4RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec").rangeBetween(-3600L, 0L)
    Tables.events(spark, dir)
      .withColumn("sec", unix_timestamp($"ts"))
      .withColumn("trail_hr_sum", d2(sum(dec($"value")).over(w)))
      .withColumn("trail_hr_n", count(lit(1)).over(w))
      .select($"event_id", $"user_id", $"trail_hr_sum", $"trail_hr_n")
      .orderBy($"event_id")
  }

  val w4RangeFrameSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(SUM(v) OVER w AS DOUBLE) AS trail_hr_sum,
      |  COUNT(*) OVER w AS trail_hr_n
      |FROM e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------------------------
  // A5b unpivot (wide→long, the inverse reshape of A5): lineitem's three
  // rate/measure columns melted into (measure, value) rows, aggregated per
  // measure. Spark's unpivot lowers to Expand — each input row emits k
  // rows map-side, no shuffle until the aggregate (same shape the oracle
  // writes as UNION ALL).
  def a5bUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        dec($"l_quantity").as("quantity"),
        dec($"l_discount").as("discount"),
        dec($"l_tax").as("tax"))
      .unpivot(
        ids = Array(col("l_orderkey")),
        values = Array(col("quantity"), col("discount"), col("tax")),
        variableColumnName = "measure",
        valueColumnName = "v")
      .groupBy($"measure")
      .agg(
        count(lit(1)).as("n"),
        d2(sum($"v")).as("total"),
        d2(min($"v")).as("min_v"),
        d2(max($"v")).as("max_v"))
      .orderBy($"measure")
  }

  val a5bUnpivotSql: String =
    """WITH long AS (
      |  SELECT 'quantity' AS measure, CAST(l_quantity AS DECIMAL(12,2)) AS v FROM lineitem
      |  UNION ALL
      |  SELECT 'discount', CAST(l_discount AS DECIMAL(12,2)) FROM lineitem
      |  UNION ALL
      |  SELECT 'tax', CAST(l_tax AS DECIMAL(12,2)) FROM lineitem)
      |SELECT measure, COUNT(*) AS n,
      |  CAST(SUM(v) AS DOUBLE) AS total,
      |  CAST(MIN(v) AS DOUBLE) AS min_v,
      |  CAST(MAX(v) AS DOUBLE) AS max_v
      |FROM long GROUP BY measure ORDER BY measure""".stripMargin

  // -------------------------------------------------------------------------
  // J8 interval-binning join: facts matched to IRREGULAR value bands.
  // The naive plan for `price BETWEEN lo AND hi` is a broadcast-nested-loop
  // join — O(rows × bands) comparisons and no hash path at all. Binning
  // converts it to an equi-join: each band row replicates to the fixed-width
  // bins it covers (tiny dim-side explode), each fact row hashes to exactly
  // ONE bin, and the residual range test rides the join as a cheap conjunct.
  // At 100 TB pick the bin width near the typical band width so dim
  // replication stays O(bands).
  def j8IntervalBin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binW = 5000L
    val bands = Seq(
      ("budget", 0L, 5000L), ("mid", 5000L, 20000L),
      ("premium", 20000L, 50000L), ("luxury", 50000L, 200000L))
      .toDF("band", "lo", "hi")
    val binned = bands.withColumn("bin",
      explode(expr(s"sequence(lo div $binW, (hi - 1) div $binW)")))
    val li = Tables.lineitem(spark, dir)
      .withColumn("bin", floor($"l_extendedprice" / binW.toDouble).cast(LongType))
    li.join(broadcast(binned),
        li("bin") === binned("bin")
          && $"l_extendedprice" >= $"lo" && $"l_extendedprice" < $"hi")
      .groupBy($"band")
      .agg(
        count(lit(1)).as("n_items"),
        d2(sum(dec($"l_extendedprice"))).as("sum_price"))
      .orderBy($"band")
  }

  val j8IntervalBinSql: String =
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('budget', 0, 5000), ('mid', 5000, 20000),
      |  ('premium', 20000, 50000), ('luxury', 50000, 200000))
      |SELECT band, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN bands
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // -------------------------------------------------------------------------
  // X3 salted two-phase aggregation through the correctness gate: the hot
  // keys (3 return flags over the whole fact table) first partial-aggregate
  // on (key, salt) across 16 sub-keys, then final-aggregate on the key —
  // equivalent to the plain groupBy (the oracle IS the plain groupBy) but
  // no single task ever owns a whole hot group. Money math runs in integer
  // cents; the final /100.0 divides identical int64s in both engines.
  def x3SaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    Skew.saltedSumCount(li, "l_returnflag", "cents", 16)
      .select($"l_returnflag",
        ($"sum_value" / 100.0).as("sum_price"),
        $"n_rows")
      .orderBy($"l_returnflag")
  }

  val x3SaltedAggSql: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------------
  // J7 multi-way star join (TPC-H Q9 shape): fact ⋈ two SF-scaling dims
  // (part, supplier) ⋈ one fixed dim (nation). Only nation is pinned to
  // broadcast — part/supplier grow with the data and join on the shuffle
  // side (AQE may still elect to broadcast them at small SF). The p_size
  // filter sits under the join so it prunes the build side first.
  def j7Multiway(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).filter($"p_size" <= 15)
    val s  = Tables.supplier(spark, dir)
    val n  = Tables.nation(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy($"n_name", $"p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        d2(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount")))).as("revenue"))
      .orderBy($"n_name", $"p_brand")
  }

  val j7MultiwaySql: String =
    """SELECT n_name, p_brand,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_size <= 15
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name, p_brand
      |ORDER BY n_name, p_brand""".stripMargin

  // -------------------------------------------------------------------------
  // A6 histogram: fixed-width bucketing by pure integer arithmetic (no
  // width_bucket dependency — the arithmetic is engine-agnostic and the
  // bucket id doubles as a partition key for a layout at scale).
  def a6Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val step = 50
    Tables.documents(spark, dir)
      .withColumn("bucket", least(($"n_chars" / step).cast("long"), lit(11L)))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
      .orderBy($"lang", $"bucket")
  }

  val a6HistogramSql: String =
    """SELECT lang, least(n_chars // 50, 11) AS bucket,
      |  COUNT(*) AS n_docs,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  // -------------------------------------------------------------------------
  // A18 equi-DEPTH histogram (A6's dual): 8 buckets of equal row count via
  // ntile over a TOTAL order — the tie-break on (l_orderkey, l_linenumber)
  // makes the bucket assignment structural, not data-dependent, so ties at
  // a bucket boundary land identically in both engines (the round-6
  // max_by lesson applied to ntile). Money totals follow the
  // DECIMAL(12,2) rule.
  // 100 TB: a global ntile is a single-partition sort — fine at bench SF,
  // wrong at scale; there the boundaries come from approx_percentile over
  // a sample (one scan, map-side sketch) and bucket assignment is a
  // map-side binary search against the broadcast boundaries. The output
  // contract (count/min/max/sum per depth bucket) is unchanged.
  def a18EquiDepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(spark, dir)
      .withColumn("bucket", ntile(8).over(w).cast("long"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"l_extendedprice").as("lo"),
        max($"l_extendedprice").as("hi"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("sum_price"))
      .orderBy($"bucket")
  }

  val a18EquiDepthSql: String =
    """WITH t AS (
      |  SELECT l_extendedprice,
      |    NTILE(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
      |  FROM lineitem)
      |SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_rows,
      |  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------------------
  // A7 statistical aggregates: stddev / variance / correlation / covariance
  // per group, one pass. 4-dp rounding absorbs summation-order last-ulp
  // differences between engines (the inputs are ints, magnitudes ~1e2).
  def a7Stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("n_tok", size(split($"text", " ")).cast("double"))
      .withColumn("nc", $"n_chars".cast("double"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(stddev_samp($"nc"), 4).as("sd_chars"),
        round(var_samp($"n_tok"), 4).as("var_tok"),
        round(corr($"nc", $"n_tok"), 4).as("corr_chars_tok"),
        round(covar_samp($"nc", $"n_tok"), 4).as("cov_chars_tok"))
      .orderBy($"lang")
  }

  val a7StatsSql: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  round(stddev_samp(CAST(n_chars AS DOUBLE)), 4) AS sd_chars,
      |  round(var_samp(CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS var_tok,
      |  round(corr(CAST(n_chars AS DOUBLE), CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS corr_chars_tok,
      |  round(covar_samp(CAST(n_chars AS DOUBLE), CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS cov_chars_tok
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // -------------------------------------------------------------------------
  // A9 extended-aggregate battery: count_if / bool_and / bool_or / median /
  // max_by / min_by — the aggregate surface beyond sum/avg that warehouse
  // SQL leans on. max_by/min_by rank on md5 of the integer id tuple: rows
  // tie on that key only by agreeing on the WHOLE tuple, and l_suppkey
  // (the returned value) is in the tuple, so ties cannot change the answer
  // (engine-defined tie-breaks otherwise; integer columns only, so the
  // concat string is formatting-identical across engines). Skewness
  // is computed from raw power sums: l_quantity is integral and bounded
  // (≤ 50), so sum(q), sum(q²), sum(q³) stay exact in int64 at any SF and
  // the double math afterwards is a fixed expression tree — FP-identical
  // across engines and partitionings, unlike a builtin skewness() whose
  // population/sample convention differs per engine.
  // 100 TB: one hash-aggregate pass, all partials mergeable (median is the
  // exception — exact median buffers per group; swap for approx_percentile
  // at scale, demonstrated in A8).
  def a9AggBattery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .withColumn("q", $"l_quantity".cast("long"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr("count_if(q > 25)").as("n_big"),
        expr("bool_and(q <= 50)").as("all_le50"),
        expr("bool_or(l_discount > 0.09)").as("any_deep_disc"),
        expr("CAST(median(q) AS DOUBLE)").as("med_qty"),
        expr("max_by(l_suppkey, md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)))").as("last_supp"),
        expr("min_by(l_suppkey, md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)))").as("first_supp"),
        sum($"q").as("s1"), sum($"q" * $"q").as("s2"),
        sum($"q" * $"q" * $"q").as("s3"))
      .withColumn("mu", $"s1".cast("double") / $"n")
      .withColumn("vr", $"s2".cast("double") / $"n" - $"mu" * $"mu")
      // + 0.0 normalizes IEEE -0.0 to +0.0 (an exactly-zero skew rounds to
      // a different zero sign in the two engines; every other value is
      // unchanged by adding positive zero)
      .withColumn("skew_qty", round(
        ($"s3".cast("double") / $"n" - lit(3.0) * $"mu" * ($"s2".cast("double") / $"n")
          + lit(2.0) * $"mu" * $"mu" * $"mu") / pow($"vr", 1.5), 4) + lit(0.0))
      .select($"l_returnflag", $"n", $"n_big", $"all_le50", $"any_deep_disc",
        $"med_qty", $"last_supp", $"first_supp", $"skew_qty")
      .orderBy($"l_returnflag")
  }

  val a9AggBatterySql: String =
    """WITH a AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE CAST(l_quantity AS BIGINT) > 25) AS n_big,
      |    bool_and(CAST(l_quantity AS BIGINT) <= 50) AS all_le50,
      |    bool_or(l_discount > 0.09) AS any_deep_disc,
      |    CAST(median(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS med_qty,
      |    max_by(l_suppkey, md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey))) AS last_supp,
      |    min_by(l_suppkey, md5(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey))) AS first_supp,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n, n_big, all_le50, any_deep_disc, med_qty,
      |  last_supp, first_supp,
      |  round((CAST(s3 AS DOUBLE) / n - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |    + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
      |    / power(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1.5), 4) + 0.0 AS skew_qty
      |FROM a ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------------
  // F12 null-semantics battery: nullif / coalesce / null-safe equality /
  // count(col) vs count(*) / explicit null ordering — the engine-semantics
  // corners that silently diverge between SQL dialects if untested.
  def fNullFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .withColumn("rf", nullif($"l_returnflag", lit("N")))
      .groupBy($"l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"rf").as("n_nonnull_rf"),      // count(col) skips nulls
        countDistinct($"rf").as("n_distinct_rf"),
        sum(when($"rf" <=> lit(null), 1L).otherwise(0L)).as("n_nullsafe_null"),
        max(coalesce($"rf", lit("~"))).as("max_rf_coalesced"))
      .orderBy($"l_linestatus".asc_nulls_first)
  }

  val fNullFuncsSql: String =
    """SELECT l_linestatus,
      |  COUNT(*) AS n_rows,
      |  COUNT(nullif(l_returnflag, 'N')) AS n_nonnull_rf,
      |  COUNT(DISTINCT nullif(l_returnflag, 'N')) AS n_distinct_rf,
      |  CAST(SUM(CASE WHEN nullif(l_returnflag, 'N') IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null,
      |  MAX(coalesce(nullif(l_returnflag, 'N'), '~')) AS max_rf_coalesced
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus ASC NULLS FIRST""".stripMargin

  // -------------------------------------------------------------------------
  // F13 map-type battery: build a map column from grouped entries
  // (map_from_entries over a SORTED entry list — construction must be
  // deterministic), read it back via element_at / map_keys. The oracle
  // computes the same scalars relationally; the map is the Spark-side
  // capability under test.
  def fMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.lineitem(spark, dir)
      .groupBy($"l_linestatus", $"l_returnflag")
      .agg(count(lit(1)).as("n"))
    per.groupBy($"l_linestatus")
      .agg(map_from_entries(sort_array(collect_list(struct($"l_returnflag", $"n")))).as("m"))
      .select(
        $"l_linestatus",
        size(map_keys($"m")).cast("long").as("n_flags"),
        coalesce(element_at($"m", "A"), lit(0L)).as("n_a"),
        coalesce(element_at($"m", "N"), lit(0L)).as("n_n"),
        coalesce(element_at($"m", "R"), lit(0L)).as("n_r"))
      .orderBy($"l_linestatus")
  }

  val fMapFuncsSql: String =
    """SELECT l_linestatus,
      |  COUNT(DISTINCT l_returnflag) AS n_flags,
      |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // -------------------------------------------------------------------------
  // W6 SCD2 run collapse (gaps-and-islands): consecutive same-event_type
  // runs per user become validity intervals — the dbt-snapshot /
  // slowly-changing-dimension-type-2 build, from an event log instead of
  // nightly state diffs. Island id = rn(user) − rn(user, type): constant
  // within a run of equal event_type, strictly ordered across runs.
  // valid_to = next interval's valid_from (half-open chaining); the open
  // interval per user is the current state. Determinism: every window and
  // the final sort tie-break on event_id / event_type so equal timestamps
  // cannot reorder output between engines.
  // 100 TB: ONE shuffle on user_id — all three windows and the run
  // aggregate share the user_id partitioning (the run groupBy key
  // (user_id, event_type, grp) is user_id-prefixed, so Catalyst reuses the
  // exchange); nothing is corpus-wide except the final (display) sort.
  def w6Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w  = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wt = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    val runs = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("grp", row_number().over(w) - row_number().over(wt))
      .groupBy($"user_id", $"event_type", $"grp")
      .agg(
        min($"ts").as("valid_from"),
        max($"ts").as("last_seen"),
        count(lit(1)).as("n_events"))
    val wseq = Window.partitionBy($"user_id").orderBy($"valid_from", $"event_type")
    runs
      .withColumn("valid_to", lead($"valid_from", 1).over(wseq))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"user_id", $"event_type", $"valid_from", $"valid_to",
        $"last_seen", $"n_events", $"is_current")
      .orderBy($"user_id", $"valid_from", $"event_type")
  }

  val w6Scd2Sql: String =
    """WITH isl AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS grp
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, grp,
      |    MIN(ts) AS valid_from, MAX(ts) AS last_seen, COUNT(*) AS n_events
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT user_id, event_type, valid_from,
      |  LEAD(valid_from, 1) OVER (PARTITION BY user_id ORDER BY valid_from, event_type) AS valid_to,
      |  last_seen, n_events,
      |  LEAD(valid_from, 1) OVER (PARTITION BY user_id ORDER BY valid_from, event_type) IS NULL AS is_current
      |FROM runs ORDER BY user_id, valid_from, event_type""".stripMargin

  // -------------------------------------------------------------------------
  // A11 one-pass OLS regression per group, closed-form from power sums:
  // slope/intercept/r² of extendedprice-vs-quantity per return flag. The
  // five sums are EXACT int64s over integer cents (the a9 skewness trick),
  // so the arithmetic that combines them is a fixed expression over
  // identical operands in both engines — bit-identical IEEE, no
  // float-summation-order exposure, unlike calling regr_slope on doubles
  // (RelationalSpec pins regr_slope/regr_intercept against these values).
  // 100 TB: this is why closed-form beats the built-in at scale too — the
  // partial state is 6 int64s per group, map-side combinable, merge is
  // addition; no second pass, no per-row residuals.
  def a11Regression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sums = Tables.lineitem(spark, dir)
      .select($"l_returnflag",
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"),
        sum($"x" * $"y").as("sxy"),
        sum($"y" * $"y").as("syy"))
    sums
      .withColumn("dn",  $"n".cast("double"))
      .withColumn("cov", $"dn" * $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double"))
      .withColumn("vx",  $"dn" * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double"))
      .withColumn("vy",  $"dn" * $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double"))
      .select(
        $"l_returnflag", $"n",
        round($"cov" / $"vx", 6).as("slope"),
        round(($"sy".cast("double") - ($"cov" / $"vx") * $"sx".cast("double")) / $"dn" / 100.0, 6).as("intercept_dollars"),
        round($"cov" * $"cov" / ($"vx" * $"vy"), 6).as("r2"))
      .orderBy($"l_returnflag")
  }

  val a11RegressionSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM (SELECT l_returnflag,
      |          CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |          CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n, sx, sy,
      |    CAST(n AS DOUBLE) AS dn,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
      |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
      |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
      |  FROM s)
      |SELECT l_returnflag, n,
      |  round(cov / vx, 6) AS slope,
      |  round((CAST(sy AS DOUBLE) - (cov / vx) * CAST(sx AS DOUBLE)) / dn / 100.0, 6) AS intercept_dollars,
      |  round(cov * cov / (vx * vy), 6) AS r2
      |FROM d ORDER BY l_returnflag""".stripMargin

  // -------------------------------------------------------------------------
  // A12 robust outlier detection: modified z-score (Iglewicz–Hoaglin,
  // 0.6745·(x−median)/MAD) per event_type, flagging |z| > 3.5 — the
  // median/MAD pair is the standard robust alternative to mean/stddev
  // for anomaly screens (a 5%-contaminated mean drags the threshold; the
  // median doesn't). Determinism: values go through exact integer cents,
  // so both medians interpolate between exact int64s (midpoint of ints —
  // exact in double), |x−med| lands on a half-cent grid, and the final z
  // is a fixed expression over identical operands, rounded to 4dp.
  // 100 TB: two aggregation passes over a low-cardinality key (exact
  // median per group buffers per-group values — the scale path swaps in
  // approx_percentile partials, A8-style); the per-row flagging join is a
  // broadcast of one 2-column row per event_type.
  def a12Outliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"event_type",
        $"value", expr("CAST(round(value * 100) AS BIGINT)").as("xc"))
    val med = ev.groupBy($"event_type")
      .agg(expr("percentile(xc, 0.5)").as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy($"event_type")
      .agg(expr("percentile(abs(xc - med), 0.5)").as("mad"), first($"med").as("med"))
    ev.join(broadcast(mad), Seq("event_type"))
      .withColumn("z", round(lit(0.6745) * ($"xc" - $"med") / $"mad", 4))
      .filter(abs($"z") > 3.5)
      .select($"event_type", $"event_id", $"value", $"z".as("robust_z"))
      .orderBy($"event_type", $"event_id")
  }

  val a12OutliersSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, value,
      |    CAST(round(value * 100) AS BIGINT) AS xc
      |  FROM events),
      |med AS (
      |  SELECT event_type, quantile_cont(xc, 0.5) AS med FROM ev GROUP BY event_type),
      |mad AS (
      |  SELECT ev.event_type, quantile_cont(abs(ev.xc - med.med), 0.5) AS mad, ANY_VALUE(med.med) AS med
      |  FROM ev JOIN med USING (event_type) GROUP BY ev.event_type)
      |SELECT ev.event_type, ev.event_id, ev.value,
      |  round(0.6745 * (ev.xc - mad.med) / mad.mad, 4) AS robust_z
      |FROM ev JOIN mad USING (event_type)
      |WHERE abs(round(0.6745 * (ev.xc - mad.med) / mad.mad, 4)) > 3.5
      |ORDER BY ev.event_type, ev.event_id""".stripMargin

  // ---------------------------------------------------------------------
  // J9 grid-bucketed spatial join (the 2D member of the band-join family,
  // and the standard distributed spatial-join shape — GeoSpark/Sedona's
  // partition-by-grid): points within radius r pair via an EQUI-join on
  // grid cells of side r — the smaller side expands to its 3×3 neighbor
  // cells, so every within-r pair shares a cell key and each pair meets
  // in EXACTLY one cell (a point lives in one cell; the 9 expansions are
  // distinct), hence no dedup pass. Exact distance verifies candidates.
  // Coordinates are md5-derived uniforms in [0,100)² (the
  // cur_weighted_sample hex-decode trick — both engines hash identical
  // strings; digits 1-12 → x, 13-24 → y of one digest per key), so the
  // operator runs on driver tables with zero stored geometry.
  // Determinism: the threshold tests the ROUNDED distance, and output
  // order is the total (c_custkey, s_suppkey).
  // 100 TB: cell key equi-join instead of a cross join — candidates are
  // O(points × density), never |A|×|B|; the 9× expansion rides the SMALL
  // side (here broadcast — no shuffle at all); dense cells split under
  // AQE skew handling like any hot key.
  def j9GridJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val r = 5.0
    // NB: the 2^48 divisor must be a Scala-side double lit — in SQL text
    // `281474976710656.0` parses as a DECIMAL literal and silently turns
    // the whole coordinate into decimal arithmetic
    def hexU(lo: Int): Column =
      (expr(s"CAST(conv(substr(h, $lo, 12), 16, 10) AS BIGINT)") + 1)
        .divide(lit(281474976710656.0)).multiply(lit(100.0))
    val cust = Tables.customer(spark, dir)
      .withColumn("h", md5(concat(lit("c|"), $"c_custkey".cast("string"))))
      .select($"c_custkey", hexU(1).as("cx"), hexU(13).as("cy"))
      .withColumn("gx", floor($"cx" / r).cast("int"))
      .withColumn("gy", floor($"cy" / r).cast("int"))
    val supp = Tables.supplier(spark, dir)
      .withColumn("h", md5(concat(lit("s|"), $"s_suppkey".cast("string"))))
      .select($"s_suppkey", hexU(1).as("sx"), hexU(13).as("sy"))
      .withColumn("g", explode(expr(
        s"flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> " +
        s"struct(CAST(floor(sx / $r) AS INT) + dx AS gx, CAST(floor(sy / $r) AS INT) + dy AS gy))))")))
      .select($"s_suppkey", $"sx", $"sy", $"g.gx", $"g.gy")
    cust.join(broadcast(supp), Seq("gx", "gy"))
      .withColumn("dist", round(sqrt(($"cx" - $"sx") * ($"cx" - $"sx")
        + ($"cy" - $"sy") * ($"cy" - $"sy")), 6))
      .filter($"dist" <= r)
      .select($"c_custkey", $"s_suppkey", $"dist")
      .orderBy($"c_custkey", $"s_suppkey")
  }

  val j9GridJoinSql: String =
    """WITH cpt AS (
      |  SELECT c_custkey, md5('c|' || CAST(c_custkey AS VARCHAR)) AS h FROM customer),
      |spt AS (
      |  SELECT s_suppkey, md5('s|' || CAST(s_suppkey AS VARCHAR)) AS h FROM supplier),
      |cxy AS (
      |  SELECT c_custkey,
      |    (CAST(list_sum(list_transform([1,2,3,4,5,6,7,8,9,10,11,12], i ->
      |      CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
      |        * CAST(power(16, 12 - i) AS BIGINT))) AS BIGINT) + 1) / 281474976710656.0 * 100.0 AS cx,
      |    (CAST(list_sum(list_transform([13,14,15,16,17,18,19,20,21,22,23,24], i ->
      |      CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
      |        * CAST(power(16, 24 - i) AS BIGINT))) AS BIGINT) + 1) / 281474976710656.0 * 100.0 AS cy
      |  FROM cpt),
      |sxy AS (
      |  SELECT s_suppkey,
      |    (CAST(list_sum(list_transform([1,2,3,4,5,6,7,8,9,10,11,12], i ->
      |      CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
      |        * CAST(power(16, 12 - i) AS BIGINT))) AS BIGINT) + 1) / 281474976710656.0 * 100.0 AS sx,
      |    (CAST(list_sum(list_transform([13,14,15,16,17,18,19,20,21,22,23,24], i ->
      |      CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
      |        * CAST(power(16, 24 - i) AS BIGINT))) AS BIGINT) + 1) / 281474976710656.0 * 100.0 AS sy
      |  FROM spt),
      |cgrid AS (
      |  SELECT c_custkey, cx, cy,
      |    CAST(floor(cx / 5.0) AS INTEGER) AS gx, CAST(floor(cy / 5.0) AS INTEGER) AS gy
      |  FROM cxy),
      |sgrid AS (
      |  SELECT s_suppkey, sx, sy,
      |    CAST(floor(sx / 5.0) AS INTEGER) + dxt.dx AS gx,
      |    CAST(floor(sy / 5.0) AS INTEGER) + dyt.dy AS gy
      |  FROM sxy
      |  CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS dx) dxt
      |  CROSS JOIN (SELECT unnest(generate_series(-1, 1)) AS dy) dyt)
      |SELECT c.c_custkey, s.s_suppkey,
      |  round(sqrt((c.cx - s.sx) * (c.cx - s.sx) + (c.cy - s.sy) * (c.cy - s.sy)), 6) AS dist
      |FROM cgrid c JOIN sgrid s ON c.gx = s.gx AND c.gy = s.gy
      |WHERE round(sqrt((c.cx - s.sx) * (c.cx - s.sx) + (c.cy - s.sy) * (c.cy - s.sy)), 6) <= 5.0
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  // ---------------------------------------------------------------------
  // A16 Spearman rank correlation (the robust member of the correlation
  // family; a7_stats has the raw-moment Pearson): does order size track
  // account balance within a market segment? Spearman = Pearson over
  // AVERAGE ranks; to keep every sum exact-integer the ranks ride the
  // doubled-rank trick — r2 = 2·rank + (ties−1) is the average rank × 2,
  // an integer, and Pearson is affine-invariant per variable so the
  // doubling cancels. All five sufficient statistics (Σx, Σy, Σx², Σy²,
  // Σxy) are exact int64 (r2 ≤ 2n keeps Σ(r2²) < 2⁶³ far beyond these
  // SFs); the closed form runs in doubles DERIVED from those exact ints,
  // so both engines compute identical values before the 6dp round. A
  // dollar-resolution Pearson on the raw values rides the same
  // statistics shape for comparison.
  // 100 TB: one join shuffle + two rank windows on the segment key +
  // one partial-agg shuffle; the output is segment-sized.
  def a16Spearman(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        expr("CAST(round(o_totalprice) AS BIGINT)").as("xd"),
        expr("CAST(round(c_acctbal) AS BIGINT)").as("yd"))
    val ranked = base
      .withColumn("r2x", lit(2) * rank().over(w.orderBy($"xd"))
        + count(lit(1)).over(Window.partitionBy($"c_mktsegment", $"xd")) - 1)
      .withColumn("r2y", lit(2) * rank().over(w.orderBy($"yd"))
        + count(lit(1)).over(Window.partitionBy($"c_mktsegment", $"yd")) - 1)
    def corrExpr(sx: String, sy: String, sxx: String, syy: String, sxy: String) =
      ((col("n").cast("double") * col(sxy) - col(sx).cast("double") * col(sy))
        / sqrt((col("n").cast("double") * col(sxx) - col(sx).cast("double") * col(sx))
          * (col("n").cast("double") * col(syy) - col(sy).cast("double") * col(sy))))
    ranked.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum($"r2x").as("srx"), sum($"r2y").as("sry"),
        sum($"r2x" * $"r2x").as("srxx"), sum($"r2y" * $"r2y").as("sryy"),
        sum($"r2x" * $"r2y").as("srxy"),
        sum($"xd").as("sx"), sum($"yd").as("sy"),
        sum($"xd" * $"xd").as("sxx"), sum($"yd" * $"yd").as("syy"),
        sum($"xd" * $"yd").as("sxy"))
      .select($"c_mktsegment", $"n",
        round(corrExpr("srx", "sry", "srxx", "sryy", "srxy"), 6).as("spearman"),
        round(corrExpr("sx", "sy", "sxx", "syy", "sxy"), 6).as("pearson"))
      .orderBy($"c_mktsegment")
  }

  val a16SpearmanSql: String =
    """WITH b AS (
      |  SELECT c_mktsegment,
      |    CAST(round(o_totalprice) AS BIGINT) AS xd,
      |    CAST(round(c_acctbal) AS BIGINT) AS yd
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |r AS (
      |  SELECT c_mktsegment, xd, yd,
      |    2 * rank() OVER (PARTITION BY c_mktsegment ORDER BY xd)
      |      + COUNT(*) OVER (PARTITION BY c_mktsegment, xd) - 1 AS r2x,
      |    2 * rank() OVER (PARTITION BY c_mktsegment ORDER BY yd)
      |      + COUNT(*) OVER (PARTITION BY c_mktsegment, yd) - 1 AS r2y
      |  FROM b),
      |s AS (
      |  SELECT c_mktsegment, COUNT(*) AS n,
      |    CAST(SUM(r2x) AS BIGINT) AS srx, CAST(SUM(r2y) AS BIGINT) AS sry,
      |    CAST(SUM(r2x * r2x) AS BIGINT) AS srxx, CAST(SUM(r2y * r2y) AS BIGINT) AS sryy,
      |    CAST(SUM(r2x * r2y) AS BIGINT) AS srxy,
      |    CAST(SUM(xd) AS BIGINT) AS sx, CAST(SUM(yd) AS BIGINT) AS sy,
      |    CAST(SUM(xd * xd) AS BIGINT) AS sxx, CAST(SUM(yd * yd) AS BIGINT) AS syy,
      |    CAST(SUM(xd * yd) AS BIGINT) AS sxy
      |  FROM r GROUP BY c_mktsegment)
      |SELECT c_mktsegment, n,
      |  round((CAST(n AS DOUBLE) * srxy - CAST(srx AS DOUBLE) * sry)
      |    / sqrt((CAST(n AS DOUBLE) * srxx - CAST(srx AS DOUBLE) * srx)
      |         * (CAST(n AS DOUBLE) * sryy - CAST(sry AS DOUBLE) * sry)), 6) AS spearman,
      |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS pearson
      |FROM s ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // A17 Welch's t-test (the A/B-experiment primitive): for every pair of
  // event types, does mean value differ? Welch's unequal-variance t
  //   t = (m1 − m2) / sqrt(s1²/n1 + s2²/n2)
  // with the Welch–Satterthwaite degrees of freedom, computed ENTIRELY
  // from per-group exact-int64 sufficient statistics (n, Σcents,
  // Σcents²) — one aggregation pass over the data, then a 5-row
  // self-join; every double derives from the same exact integers in both
  // engines, so values agree before the 6dp round.
  // 100 TB: ONE shuffle (the tiny stats pass); the pairwise join runs on
  // a group-count-sized table. This is why experiment platforms store
  // sufficient statistics, not samples.
  def a17Welch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.events(spark, dir)
      .select($"event_type", expr("CAST(round(value * 100) AS BIGINT)").as("xc"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"xc").as("s"), sum($"xc" * $"xc").as("ss"))
    def m(p: String) = col(s"$p.s").cast("double") / col(s"$p.n")
    // unbiased variance from exact sums: (ss − s²/n) / (n − 1)
    def v(p: String) = (col(s"$p.ss").cast("double")
      - col(s"$p.s").cast("double") * col(s"$p.s") / col(s"$p.n")) / (col(s"$p.n") - 1)
    val se2 = v("a") / col("a.n") + v("b") / col("b.n")
    stats.as("a").join(stats.as("b"),
        $"a.event_type" < $"b.event_type")
      .select(
        $"a.event_type".as("type_a"), $"b.event_type".as("type_b"),
        $"a.n".as("n_a"), $"b.n".as("n_b"),
        round((m("a") - m("b")) / lit(100.0), 6).as("mean_diff"),
        round((m("a") - m("b")) / sqrt(se2), 6).as("t_stat"),
        round(pow(se2, 2) / (pow(v("a") / col("a.n"), 2) / (col("a.n") - 1)
          + pow(v("b") / col("b.n"), 2) / (col("b.n") - 1)), 6).as("welch_df"))
      .orderBy($"type_a", $"type_b")
  }

  val a17WelchSql: String =
    """WITH st AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss
      |  FROM events GROUP BY event_type),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    a.n AS n_a, b.n AS n_b,
      |    CAST(a.s AS DOUBLE) / a.n AS ma, CAST(b.s AS DOUBLE) / b.n AS mb,
      |    (CAST(a.ss AS DOUBLE) - CAST(a.s AS DOUBLE) * a.s / a.n) / (a.n - 1) AS va,
      |    (CAST(b.ss AS DOUBLE) - CAST(b.s AS DOUBLE) * b.s / b.n) / (b.n - 1) AS vb
      |  FROM st a JOIN st b ON a.event_type < b.event_type)
      |SELECT type_a, type_b, n_a, n_b,
      |  round((ma - mb) / 100.0, 6) AS mean_diff,
      |  round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t_stat,
      |  round(pow(va / n_a + vb / n_b, 2)
      |    / (pow(va / n_a, 2) / (n_a - 1) + pow(vb / n_b, 2) / (n_b - 1)), 6) AS welch_df
      |FROM p ORDER BY type_a, type_b""".stripMargin

  // ---------------------------------------------------------------------
  // A21 Theil–Sen robust trend: per-user median of all pairwise
  // day-over-day slopes of the daily spend series — the robust
  // counterpart to A11's least-squares slope (one outlier day moves OLS
  // arbitrarily; the slope MEDIAN has a 29% breakdown point).
  //
  // Determinism: daily totals land on the cents grid (exact int64 sums),
  // each pairwise slope is ONE IEEE division of those exact ints (no
  // sum-order anywhere), and the median is an order statistic — rank
  // selection by slope value gives the same VALUE at a rank even when
  // equal slopes tie. Even pair-counts average the two middle ranks
  // ((a+b)/2, same expression both engines).
  //
  // 100 TB: the daily roll-up is one shuffle on (user, day); pairs are
  // generated per user — quadratic in SERIES LENGTH (bounded: days per
  // entity), never in user count — and the rank window shuffles on
  // user_id only. For long series the standard move is sampled Theil–Sen
  // (random pair subset); at the reference's per-entity day counts the
  // exact form is the right default.
  def a21TheilSen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .select($"user_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id", $"day")
      .agg(sum($"cents").as("yv"))
    val pairs = daily.as("a")
      .join(daily.as("b"), $"a.user_id" === $"b.user_id" && $"a.day" < $"b.day")
      .select($"a.user_id".as("user_id"),
        (($"b.yv" - $"a.yv").cast("double") / ($"b.day" - $"a.day").cast("double")).as("slope"))
    val w = Window.partitionBy($"user_id").orderBy($"slope")
    val ranked = pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("m", count(lit(1)).over(Window.partitionBy($"user_id")))
    val med = ranked
      .filter($"rn" === expr("(m + 1) div 2") || $"rn" === expr("m div 2 + 1"))
      .groupBy($"user_id")
      .agg(max($"m").as("n_pairs"), avg($"slope").as("med"))
    val nDays = daily.groupBy($"user_id").agg(count(lit(1)).as("n_days"))
    med.join(nDays, Seq("user_id"))
      .select($"user_id", $"n_days", $"n_pairs",
        round($"med" / 100.0, 6).as("slope_per_day"))
      .orderBy($"user_id")
  }

  val a21TheilSenSql: String =
    """WITH daily AS (
      |  SELECT user_id, date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS yv
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.user_id,
      |    CAST(b.yv - a.yv AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
      |  FROM daily a JOIN daily b ON a.user_id = b.user_id AND a.day < b.day),
      |ranked AS (
      |  SELECT user_id, slope,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS m
      |  FROM pairs),
      |med AS (
      |  SELECT user_id, CAST(MAX(m) AS BIGINT) AS n_pairs, AVG(slope) AS med
      |  FROM ranked
      |  WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
      |  GROUP BY 1),
      |nd AS (SELECT user_id, COUNT(*) AS n_days FROM daily GROUP BY 1)
      |SELECT m.user_id, nd.n_days, m.n_pairs,
      |  round(m.med / 100.0, 6) AS slope_per_day
      |FROM med m JOIN nd ON nd.user_id = m.user_id
      |ORDER BY m.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // J5b as-of join WITH TOLERANCE (pandas merge_asof(tolerance=...) /
  // kdb wj semantics): each purchase takes the same user's LATEST PRIOR
  // VIEW, but only within a 1-hour lookback — last-touch attribution,
  // where a stale touchpoint must not claim the sale. Same one-shuffle
  // union-and-carry-forward plan as J5; the carried value is ONE struct
  // (view timestamp + id together — the W10 lesson: two scalar windows
  // could pair an id with the wrong timestamp), and the tolerance test
  // is exact timestamp arithmetic, no float math at all.
  def j5bAsOfTol(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    // one row per (user, ts): max event_id → deterministic match under ties
    val viewSide = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("vid"))
      .select($"user_id", $"ts".as("t"), lit(0).as("tag"),
        $"vid", lit(null).cast(LongType).as("event_id"))
    val buySide = ev.filter($"event_type" === "purchase").select(
      $"user_id", $"ts".as("t"), lit(1).as("tag"),
      lit(null).cast(LongType).as("vid"), $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"t".asc, $"tag".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    viewSide.unionByName(buySide)
      .withColumn("m", last(when($"tag" === 0, struct($"t".as("vt"), $"vid")),
        ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"user_id",
        when($"m".isNotNull && $"t" <= $"m.vt" + expr("INTERVAL 1 HOUR"), $"m.vid")
          .as("attributed_view"))
      .orderBy($"event_id")
  }

  // J5bn: J5b through the native operator — the tolerance test needs NO
  // operator support, it is a projection over the matched row (NULL the
  // attribution when the last prior view is staler than the lookback),
  // which is exactly why the custom plan node carries the whole right row
  // instead of baking a tolerance parameter into the exec. Shares J5b's
  // oracle. Self-join note: both sides derive from the events scan; the
  // right side's aliases mint fresh attribute ids, so the node's output
  // stays conflict-free without a dedup rule.
  def j5bnAsOfTolNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("vid"))
      .select($"user_id".as("v_user"), $"ts".as("vt"), $"vid")
    val buys = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    graft.plans.AsOf.joinAsOf(buys, views, "user_id", "v_user", "ts", "vt")
      .select($"event_id", $"user_id",
        when($"vt".isNotNull && $"ts" <= $"vt" + expr("INTERVAL 1 HOUR"), $"vid")
          .as("attributed_view"))
      .orderBy($"event_id")
  }

  val j5bAsOfTolSql: String =
    """WITH v AS (
      |  SELECT user_id, ts, MAX(event_id) AS vid FROM events
      |  WHERE event_type = 'view' GROUP BY user_id, ts),
      |b AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN v.ts IS NOT NULL AND b.ts <= v.ts + INTERVAL '1 hour'
      |       THEN v.vid END AS attributed_view
      |FROM b ASOF LEFT JOIN v
      |  ON b.user_id = v.user_id AND b.ts >= v.ts
      |ORDER BY b.event_id""".stripMargin

  // -------------------------------------------------------------------------
  // J10 Bloom-pruned join — the runtime-filter pattern that matters most at
  // 100 TB: build a Bloom bitmap over the (filtered) dim keys, broadcast it,
  // and drop non-matching fact rows AT THE SCAN, before any shuffle; only
  // the surviving candidates pay the exact join. Spark's own
  // spark.sql.optimizer.runtimeFilter does this opportunistically — this
  // operator is the explicit, plannable form with the FP accounting
  // surfaced (n_candidates vs n_matches per group).
  //
  // The bitmap is built relationally (explode 3 hash positions → bit_or
  // per 64-bit word → one-row map, ≤4 Ki words / 32 KiB broadcast; m=2^17 sized so sf0.01 exercises the FP-recheck path) and
  // the hashes are pure int64 arithmetic ((k·C + D) mod P mod m) — no
  // engine hash builtin — so DuckDB replays the byte-identical filter via
  // three LEFT JOINs against the same word table: full hash-match oracle
  // including the false-positive counts. At 100 TB: size m ≈ 10×|dim keys|
  // (still ≪ the fact shuffle it prevents) or band the dim into multiple
  // bitmaps; the probe side stays a scan-local filter either way.
  def j10BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = 1L << 17
    val P = 2147483647L // 2^31 − 1; keys ≤ ~6e9 keep k·C + D < 2^63
    val hashes = Seq((1000003L, 12345L), (999983L, 67891L), (1000033L, 54321L))
    def pos(k: Column, cd: (Long, Long)): Column =
      ((k * lit(cd._1) + lit(cd._2)) % lit(P)) % lit(m)
    // 32-bit packing: shift ≤ 31 keeps the mask engine-portable (DuckDB
    // range-checks a signed 1L << 63; bit 31 of an int64 is safe in both).
    // Shift amounts are columns, so the SQL shiftleft (expr) is used — the
    // Scala shiftleft overload only takes a literal Int.
    val mask = expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")

    val dim = Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".cast(LongType).as("k"))
    // the sparse (word → bits) map is densified into a POSITIONAL array
    // once at build time: element_at on a Spark map is a linear scan of
    // all entries, so probing 3 positions per fact row against a 4 Ki-entry
    // map cost O(3·4096) comparisons per row (measured 3.1 s at sf0.1);
    // array indexing is O(1) and the broadcast stays 32 KiB.
    val bloom = dim
      .select(explode(array(hashes.map(cd => pos($"k", cd)): _*)).as("p"))
      .groupBy(($"p" / 32L).cast(LongType).as("w")).agg(bit_or(mask).as("bits"))
      .agg(map_from_entries(collect_list(struct($"w", $"bits"))).as("bm"))
      .select(expr(s"transform(sequence(0, ${m / 32 - 1}), w -> " +
        "coalesce(element_at(bm, CAST(w AS BIGINT)), CAST(0 AS BIGINT)))").as("ba"))

    val probe = Tables.lineitem(spark, dir)
      .select($"l_orderkey".cast(LongType).as("k"), $"l_returnflag")
      .withColumns(hashes.zipWithIndex.map { case (cd, i) =>
        s"p${i + 1}" -> pos($"k", cd)
      }.toMap)
    val isSet = (1 to hashes.size).map { i =>
      expr(s"""element_at(ba, CAST(p$i div 32 AS INT) + 1)
              | & shiftleft(CAST(1 AS BIGINT), CAST(p$i % 32 AS INT)) != 0"""
        .stripMargin.replace("\n", " "))
    }.reduce(_ && _)
    val cand = probe.crossJoin(broadcast(bloom)).filter(isSet)
      .select($"k", $"l_returnflag")

    cand.join(dim.withColumnRenamed("k", "dk"), $"k" === $"dk", "left")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_candidates"),
        count($"dk").as("n_matches"),
        (count(lit(1)) - count($"dk")).as("n_false_pos"))
      .orderBy($"l_returnflag")
  }

  val j10BloomJoinSql: String =
    """WITH dim AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
      |  WHERE o_orderpriority = '1-URGENT'),
      |hp AS (
      |  SELECT ((k * 1000003 + 12345) % 2147483647) % 131072 AS p FROM dim
      |  UNION ALL
      |  SELECT ((k * 999983 + 67891) % 2147483647) % 131072 FROM dim
      |  UNION ALL
      |  SELECT ((k * 1000033 + 54321) % 2147483647) % 131072 FROM dim),
      |bm AS (
      |  SELECT p // 32 AS w, BIT_OR(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
      |  FROM hp GROUP BY 1),
      |probe AS (
      |  SELECT k, l_returnflag,
      |    ((k * 1000003 + 12345) % 2147483647) % 131072 AS p1,
      |    ((k * 999983 + 67891) % 2147483647) % 131072 AS p2,
      |    ((k * 1000033 + 54321) % 2147483647) % 131072 AS p3
      |  FROM (SELECT CAST(l_orderkey AS BIGINT) AS k, l_returnflag FROM lineitem)),
      |cand AS (
      |  SELECT pr.k, pr.l_returnflag FROM probe pr
      |  LEFT JOIN bm b1 ON b1.w = pr.p1 // 32
      |  LEFT JOIN bm b2 ON b2.w = pr.p2 // 32
      |  LEFT JOIN bm b3 ON b3.w = pr.p3 // 32
      |  WHERE COALESCE(b1.bits, 0) & (CAST(1 AS BIGINT) << CAST(pr.p1 % 32 AS INT)) <> 0
      |    AND COALESCE(b2.bits, 0) & (CAST(1 AS BIGINT) << CAST(pr.p2 % 32 AS INT)) <> 0
      |    AND COALESCE(b3.bits, 0) & (CAST(1 AS BIGINT) << CAST(pr.p3 % 32 AS INT)) <> 0)
      |SELECT c.l_returnflag,
      |  COUNT(*) AS n_candidates,
      |  COUNT(d.k) AS n_matches,
      |  COUNT(*) - COUNT(d.k) AS n_false_pos
      |FROM cand c LEFT JOIN dim d ON d.k = c.k
      |GROUP BY c.l_returnflag ORDER BY c.l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j10_bloom_join" -> (j10BloomJoin _),
    "j5b_asof_tol" -> (j5bAsOfTol _),
    "j5bn_asof_tol_native" -> (j5bnAsOfTolNative _),
    "a17_welch"    -> (a17Welch _),
    "a21_theilsen" -> (a21TheilSen _),
    "a16_spearman" -> (a16Spearman _),
    "j9_grid_join" -> (j9GridJoin _),
    "w6_scd2"       -> (w6Scd2 _),
    "a11_regression" -> (a11Regression _),
    "a12_outliers"  -> (a12Outliers _),
    "f_map_funcs"   -> (fMapFuncs _),
    "a6_histogram"  -> (a6Histogram _),
    "a18_equidepth" -> (a18EquiDepth _),
    "a7_stats"      -> (a7Stats _),
    "a9_agg_battery" -> (a9AggBattery _),
    "f_null_funcs"  -> (fNullFuncs _),
    "j7_multiway"   -> (j7Multiway _),
    "a4_percentiles" -> (a4Percentiles _),
    "a5_pivot"      -> (a5Pivot _),
    "w3_ranking"    -> (w3Ranking _),
    "q1_agg"        -> (q1Agg _),
    "a2_distinct_agg" -> (a2DistinctAgg _),
    "a3_rollup"     -> (a3Rollup _),
    "a3_cube"       -> (a3Cube _),
    "a3_gsets"      -> (a3GroupingSets _),
    "j1_star_join"  -> (j1StarJoin _),
    "j2_large_join" -> (j2LargeJoin _),
    "j3_semi_anti"  -> (j3SemiAnti _),
    "j4_outer"      -> (j4Outer _),
    "j5_asof"       -> (j5AsOf _),
    "j5n_asof_native" -> (j5nAsOfNative _),
    "j6_band_join"  -> (j6BandJoin _),
    "j8_interval_bin" -> (j8IntervalBin _),
    "x3_salted_agg" -> (x3SaltedAgg _),
    "o1_topk"       -> (o1TopK _),
    "so1_setops"    -> (so1SetOps _),
    "w1_latest_per_key" -> (w1LatestPerKey _),
    "w2_analytic"   -> (w2Analytic _),
    "w4_range_frame" -> (w4RangeFrame _),
    "a5b_unpivot"   -> (a5bUnpivot _),
    "p457_filter_distinct" -> (p457FilterDistinct _))

  val oracles: Map[String, String] = Map(
    "j10_bloom_join" -> j10BloomJoinSql,
    "j5b_asof_tol" -> j5bAsOfTolSql,
    "j5bn_asof_tol_native" -> j5bAsOfTolSql,
    "a17_welch"    -> a17WelchSql,
    "a21_theilsen" -> a21TheilSenSql,
    "a16_spearman" -> a16SpearmanSql,
    "j9_grid_join" -> j9GridJoinSql,
    "w6_scd2"       -> w6Scd2Sql,
    "a11_regression" -> a11RegressionSql,
    "a12_outliers"  -> a12OutliersSql,
    "f_map_funcs"   -> fMapFuncsSql,
    "a6_histogram"  -> a6HistogramSql,
    "a18_equidepth" -> a18EquiDepthSql,
    "a7_stats"      -> a7StatsSql,
    "a9_agg_battery" -> a9AggBatterySql,
    "f_null_funcs"  -> fNullFuncsSql,
    "j7_multiway"   -> j7MultiwaySql,
    "a4_percentiles" -> a4PercentilesSql,
    "a5_pivot"      -> a5PivotSql,
    "w3_ranking"    -> w3RankingSql,
    "q1_agg"        -> q1AggSql,
    "a2_distinct_agg" -> a2DistinctAggSql,
    "a3_rollup"     -> a3RollupSql,
    "a3_cube"       -> a3CubeSql,
    "a3_gsets"      -> a3GroupingSetsSql,
    "j1_star_join"  -> j1StarJoinSql,
    "j2_large_join" -> j2LargeJoinSql,
    "j3_semi_anti"  -> j3SemiAntiSql,
    "j4_outer"      -> j4OuterSql,
    "j5_asof"       -> j5AsOfSql,
    "j5n_asof_native" -> j5AsOfSql,
    "j6_band_join"  -> j6BandJoinSql,
    "j8_interval_bin" -> j8IntervalBinSql,
    "x3_salted_agg" -> x3SaltedAggSql,
    "o1_topk"       -> o1TopKSql,
    "so1_setops"    -> so1SetOpsSql,
    "w1_latest_per_key" -> w1LatestPerKeySql,
    "w2_analytic"   -> w2AnalyticSql,
    "w4_range_frame" -> w4RangeFrameSql,
    "a5b_unpivot"   -> a5bUnpivotSql,
    "p457_filter_distinct" -> p457FilterDistinctSql)
}
