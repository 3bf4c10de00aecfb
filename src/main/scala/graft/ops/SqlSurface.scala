package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL-entry-point surface: full multi-join analytical queries submitted as
  * SQL text over registered temp views — the API a reference user migrating
  * from a SQL warehouse (the reference runs everything as dbt-rendered SQL
  * on Snowflake) would reach for first. Catalyst parses/optimizes the text
  * into the same physical plans as the DataFrame API: broadcast the
  * fixed-size dims, shuffle on join keys, partial+final aggregate.
  *
  * The query texts are TPC-H shapes (Q3 shipping priority, Q5 local
  * supplier volume) adapted to the driver tables' columns; the DuckDB
  * oracle runs nearly identical text — the engine-portability argument in
  * miniature. Money math follows the DECIMAL(12,2) determinism rule
  * (ops/Relational.scala scaladoc).
  */
object SqlSurface {

  private[ops] def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region", "part")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(s"g_$t"))

  /** TPC-H Q3 shape: top unshipped orders by revenue for one market segment.
    * 100 TB: the selective dim filter (customer segment) reaches the scan;
    * the two joins shuffle on the keys; the top-10 lowers to
    * TakeOrderedAndProject (no global sort).
    */
  def sqlTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM g_customer JOIN g_orders ON c_custkey = o_custkey
        |                JOIN g_lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        |LIMIT 10""".stripMargin)
  }

  val sqlTpchQ3Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** Catalog DDL/DML surface: CREATE TABLE AS SELECT into the warehouse,
    * INSERT INTO appending a grand-total row, read back through the
    * catalog — the dbt-materialization lifecycle (the reference persists
    * every model as a warehouse table) driven purely by SQL text. 100 TB:
    * CTAS inherits the SELECT's distribution; the catalog entry is what
    * makes later scans schema-pinned (no per-file footer merges) and
    * statistics-bearing.
    */
  def sqlCtas(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    graft.sources.Formats.resetTable(spark, "g_order_summary")
    spark.sql(
      """CREATE TABLE g_order_summary USING parquet AS
        |SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM g_orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin)
    spark.sql(
      """INSERT INTO g_order_summary
        |SELECT 'ALL', 'ALL', COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |FROM g_orders""".stripMargin)
    spark.sql(
      "SELECT * FROM g_order_summary ORDER BY o_orderstatus, o_orderpriority")
  }

  val sqlCtasSql: String =
    """SELECT * FROM (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
      |  FROM orders GROUP BY o_orderstatus, o_orderpriority
      |  UNION ALL
      |  SELECT 'ALL', 'ALL', COUNT(*),
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |  FROM orders)
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** TPC-H Q10 shape: returned-item revenue ranked by customer for one
    * quarter — the classic "who returned the most" report. 100 TB: the
    * quarter filter prunes orders at the scan; nation broadcasts; customer
    * and lineitem shuffle on their join keys; the top-20 lowers to
    * TakeOrderedAndProject. The revenue tie-break is c_custkey (unique in
    * the group keys) so the LIMIT edge is total-order deterministic.
    */
  def sqlTpchQ10(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM g_customer
        |  JOIN g_orders   ON c_custkey = o_custkey
        |  JOIN g_lineitem ON l_orderkey = o_orderkey
        |  JOIN g_nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin)
  }

  val sqlTpchQ10Sql: String =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** TPC-H Q5 shape: revenue by nation for one region and order-date year,
    * with the customer and supplier nation required to match (the 6-way
    * join). 100 TB: region/nation pin to broadcast; the c_nationkey =
    * s_nationkey condition rides the lineitem⋈supplier join, no extra
    * shuffle.
    */
  def sqlTpchQ5(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM g_customer
        |  JOIN g_orders   ON c_custkey = o_custkey
        |  JOIN g_lineitem ON l_orderkey = o_orderkey
        |  JOIN g_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN g_nation   ON s_nationkey = n_nationkey
        |  JOIN g_region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin)
  }

  val sqlTpchQ5Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** Correlated EXISTS (TPC-H Q4 shape): Catalyst rewrites the EXISTS into
    * a left-semi join on the correlation key — the same plan J3 builds
    * explicitly, reached from SQL text.
    */
  def sqlExistsSubq(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM g_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM g_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val sqlExistsSubqSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** NOT IN subquery → null-aware anti join. o_custkey is non-null, so
    * this is the S5 incremental-scan equivalence (SURVEY §2.1 note) at the
    * SQL layer: customers that never ordered, per nation.
    */
  def sqlInSubq(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT n_name, COUNT(*) AS n_customers_without_orders
        |FROM g_customer JOIN g_nation ON c_nationkey = n_nationkey
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM g_orders)
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin)
  }

  val sqlInSubqSql: String =
    """SELECT n_name, COUNT(*) AS n_customers_without_orders
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Scalar subqueries: orders above the corpus-average price per status.
    * The average is compared EXACTLY — price·count > sum in DECIMAL — so
    * no float summation-order drift can flip a boundary row between
    * engines (the determinism trap of naive `> (SELECT AVG(...))`).
    */
  def sqlScalarSubq(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderstatus, COUNT(*) AS n_above_avg
        |FROM g_orders
        |WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM g_orders)
        |      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM g_orders)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)
  }

  val sqlScalarSubqSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_above_avg
      |FROM orders
      |WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT COUNT(*) FROM orders)
      |      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** TPC-H Q18 shape (large-quantity orders): the big-aggregate semi-join —
    * an aggregate over the FULL fact produces the qualifying-key set, which
    * then gates a 3-way join, re-aggregated per order, top-100.
    * 100 TB: the HAVING subquery is one partial+final hash aggregate over
    * lineitem (map-side combine shrinks it to one row per order before the
    * shuffle); Catalyst plans the IN as a join on o_orderkey, so the fact
    * is never scanned twice for the same row set; the top-100 lowers to
    * TakeOrderedAndProject. Quantities are integral in the data, so the
    * DECIMAL(12,2) sum + threshold compare is exact in both engines.
    */
  def sqlTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
        |FROM g_customer JOIN g_orders ON c_custkey = o_custkey
        |                JOIN g_lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM g_lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin)
  }

  val sqlTpchQ18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  /** Correlated LATERAL subquery: top-2 orders per customer — SQL's
    * per-row "table function" form of the N-per-key pattern (the reference
    * era's `ROW_NUMBER + filter`, W1, expressed declaratively).
    * 100 TB: Catalyst decorrelates the LATERAL into a ranked window join —
    * one shuffle on the correlation key, no per-row re-execution of the
    * inner query (a naive nested-loop lateral would be O(customers ×
    * orders)); the per-key LIMIT bounds state like any rank filter.
    */
  def sqlLateral(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM g_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM g_orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c.c_custkey ASC, o.o_orderkey ASC""".stripMargin)
  }

  val sqlLateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
      |WHERE c.c_mktsegment = 'BUILDING'
      |ORDER BY c.c_custkey ASC, o.o_orderkey ASC""".stripMargin

  /** Recursive CTE (Spark 4): iterative fixpoint over derived parent edges
    * — each part's parent is floor(id/2), a binary tree rooted at 1; the
    * walk carries every node to the root and the engine aggregates node
    * count per depth (= floor(log2 id)). The hierarchy-traversal /
    * graph-reachability surface (org charts, BOM explosions, category
    * trees) that pre-4.x Spark needed driver-side loops for (our C3
    * dup-clusters does exactly that iteration by hand).
    * 100 TB: each recursion step is a map-side transform + filter on the
    * previous step's output — no shuffle inside the loop, depth bounded at
    * log2(maxkey); one final aggregate.
    */
  def sqlRecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """WITH RECURSIVE walk(node, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM g_part WHERE p_partkey >= 1
        |  UNION ALL
        |  SELECT node, CAST(floor(cur / 2) AS BIGINT), depth + 1 FROM walk WHERE cur > 1
        |)
        |SELECT depth, COUNT(*) AS n_nodes, MIN(node) AS min_node, MAX(node) AS max_node
        |FROM walk WHERE cur = 1
        |GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val sqlRecursiveCteSql: String =
    """WITH RECURSIVE walk(node, cur, depth) AS (
      |  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey >= 1
      |  UNION ALL
      |  SELECT node, CAST(floor(cur / 2) AS BIGINT), depth + 1 FROM walk WHERE cur > 1
      |)
      |SELECT depth, COUNT(*) AS n_nodes, MIN(node) AS min_node, MAX(node) AS max_node
      |FROM walk WHERE cur = 1
      |GROUP BY depth ORDER BY depth""".stripMargin

  /** SQL pipe syntax (Spark 4): the Q1 pricing-summary shape written as a
    * linear `|>` dataflow — FROM → WHERE → EXTEND → AGGREGATE → ORDER BY.
    * Pipe operators parse to exactly the same logical plan as nested
    * SELECTs (the filter still reaches the scan, the aggregate is still
    * partial+final), so this is purely an authoring surface — but one a
    * pipeline-minded reference user migrating hand-rolled Python would
    * reach for. Oracle: the equivalent classic SQL.
    */
  def sqlPipe(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """FROM g_lineitem
        ||> WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        ||> EXTEND CAST(l_quantity AS DECIMAL(12,2)) AS qty,
        |          CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        ||> AGGREGATE COUNT(*) AS n, CAST(SUM(qty) AS DOUBLE) AS sum_qty,
        |             CAST(SUM(price) AS DOUBLE) AS sum_price
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  val sqlPipeSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** SQL UDF (Spark 4 `CREATE FUNCTION … RETURN expr`): the catalog-level
    * scalar-function surface. Unlike a JVM closure UDF, the body is SQL —
    * Catalyst INLINES it into the caller's plan, so it stays inside
    * whole-stage codegen, constant-folds, and pushes down like any
    * built-in expression (a Scala UDF is an optimization barrier; this is
    * not). Revenue math keeps full DECIMAL precision inside the function.
    */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_revenue(price DOUBLE, disc DOUBLE)
        |RETURNS DECIMAL(25,4)
        |RETURN CAST(price AS DECIMAL(12,2))
        |  * (CAST(1 AS DECIMAL(12,2)) - CAST(disc AS DECIMAL(12,2)))""".stripMargin)
    spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(graft_revenue(l_extendedprice, l_discount)) AS DOUBLE) AS revenue
        |FROM g_lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val sqlUdfSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(25,4))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Parameterized SQL (named `:param` markers bound server-side): the
    * injection-safe reuse surface — one parsed template, many bindings.
    * The binder substitutes TYPED literals before optimization, so a
    * selective parameter still prunes/pushes down exactly like a
    * hand-written constant (no plan-cache genericity penalty). Oracle:
    * the same query with the parameters inlined.
    */
  def sqlParams(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM g_orders
        |WHERE o_orderstatus = :status AND o_orderdate >= CAST(:since AS TIMESTAMP)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("status" -> "F", "since" -> "1996-06-01 00:00:00"))
  }

  val sqlParamsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q22 shape (global-sales-opportunity): above-average-balance
    * customers with no recent orders, grouped by country. Adapted to the
    * driver tables: c_nationkey stands in for the phone country code, and
    * "never ordered" (empty on this synthetic data — every customer has
    * orders) becomes "no order since 2000-01-01". Exercises the two
    * remaining correlated-subquery muscles together: a scalar aggregate
    * subquery feeding a filter, and NOT EXISTS (anti-join).
    *
    * Determinism: the above-average test runs in integer CENTS —
    * acctbal_cents × n > sum_cents avoids cross-engine decimal-average
    * rounding entirely; the emitted total is the DECIMAL(12,2) sum rule.
    * 100 TB: both scalar subqueries collapse to one-row broadcasts;
    * NOT EXISTS lowers to a broadcast/shuffle anti-join on o_custkey with
    * the date filter pushed below it.
    */
  /** TPC-H Q7 shape (volume shipping): revenue flowing between two
    * nations, by supplier-nation × customer-nation × ship year. The
    * interesting plan property is the TWO-ROLE dimension: `nation` joins
    * the fact twice under different aliases (supplier side and customer
    * side) — each role broadcasts independently, and the disjunctive
    * nation-pair predicate lands AFTER both joins (it references both
    * roles, so it cannot push into either scan; Catalyst evaluates it on
    * the joined row). Revenue follows the DECIMAL(12,2) determinism rule;
    * year() is identical SQL text in both engines.
    * 100 TB: both nation roles are tiny broadcasts, lineitem⋈orders⋈
    * customer shuffle on their keys, and the date range prunes the
    * lineitem scan (PushedFilters on l_shipdate).
    */
  def sqlTpchQ7(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM g_supplier JOIN g_lineitem ON s_suppkey = l_suppkey
        |  JOIN g_orders ON o_orderkey = l_orderkey
        |  JOIN g_customer ON c_custkey = o_custkey
        |  JOIN g_nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN g_nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1997-12-31 00:00:00'
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  val sqlTpchQ7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |       * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                     AND TIMESTAMP '1997-12-31 00:00:00'
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q14 shape (promotion effect): the conditional-aggregate RATIO —
    * 100 · Σ(case promo)/Σ(all) over one ship-month. Both sums follow the
    * DECIMAL(12,2) rule and the ratio is ONE double division of two exact
    * decimals (deterministic — no float accumulation), rounded to 6dp.
    * p_type='ECONOMY' stands in for the spec's PROMO% prefix on the
    * driver tables' vocabulary.
    * 100 TB: lineitem⋈part shuffles on partkey (or co-bucketed storage
    * makes it exchange-free, the S7b shape); the month filter prunes the
    * fact scan; the CASE rides the join output into one partial+final
    * aggregate — a single row crosses the final exchange.
    */
  def sqlTpchQ14(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT round(CAST(100 AS DOUBLE) * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6)
        |  AS promo_revenue_pct
        |FROM g_lineitem JOIN g_part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin)
  }

  val sqlTpchQ14Sql: String =
    """SELECT round(CAST(100 AS DOUBLE) * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 6)
      |  AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'""".stripMargin

  def sqlTpchQ22(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM g_customer
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) *
        |    (SELECT COUNT(*) FROM g_customer WHERE c_acctbal > 0.0)
        |  > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)
        |     FROM g_customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM g_orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY cntrycode""".stripMargin)
  }

  val sqlTpchQ22Sql: String =
    """SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) *
      |    (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      |  > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT)
      |     FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_nationkey
      |ORDER BY cntrycode""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_tpch_q7"     -> (sqlTpchQ7 _),
    "sql_tpch_q14"    -> (sqlTpchQ14 _),
    "sql_tpch_q22"    -> (sqlTpchQ22 _),
    "sql_pipe"        -> (sqlPipe _),
    "sql_udf"         -> (sqlUdf _),
    "sql_params"      -> (sqlParams _),
    "sql_tpch_q18"    -> (sqlTpchQ18 _),
    "sql_lateral"     -> (sqlLateral _),
    "sql_recursive"   -> (sqlRecursiveCte _),
    "sql_tpch_q3"     -> (sqlTpchQ3 _),
    "sql_tpch_q10"    -> (sqlTpchQ10 _),
    "sql_ctas"        -> (sqlCtas _),
    "sql_tpch_q5"     -> (sqlTpchQ5 _),
    "sql_exists_subq" -> (sqlExistsSubq _),
    "sql_in_subq"     -> (sqlInSubq _),
    "sql_scalar_subq" -> (sqlScalarSubq _))

  val oracles: Map[String, String] = Map(
    "sql_tpch_q7"     -> sqlTpchQ7Sql,
    "sql_tpch_q14"    -> sqlTpchQ14Sql,
    "sql_tpch_q22"    -> sqlTpchQ22Sql,
    "sql_pipe"        -> sqlPipeSql,
    "sql_udf"         -> sqlUdfSql,
    "sql_params"      -> sqlParamsSql,
    "sql_tpch_q18"    -> sqlTpchQ18Sql,
    "sql_lateral"     -> sqlLateralSql,
    "sql_recursive"   -> sqlRecursiveCteSql,
    "sql_tpch_q3"     -> sqlTpchQ3Sql,
    "sql_tpch_q10"    -> sqlTpchQ10Sql,
    "sql_ctas"        -> sqlCtasSql,
    "sql_tpch_q5"     -> sqlTpchQ5Sql,
    "sql_exists_subq" -> sqlExistsSubqSql,
    "sql_in_subq"     -> sqlInSubqSql,
    "sql_scalar_subq" -> sqlScalarSubqSql)
}
