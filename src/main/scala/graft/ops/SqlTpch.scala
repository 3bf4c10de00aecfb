package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import SqlSurface.registerViews

/** The rest of the TPC-H battery: the query shapes not yet covered by
  * [[SqlSurface]] (which has Q3/Q5/Q7/Q10/Q14/Q18/Q22), plus canonical
  * `sql_tpch_q1`/`sql_tpch_q4` texts so all 22 spec names resolve (their
  * shapes also live on as `q1_agg`/`sql_pipe` and `sql_exists_subq`).
  * With this file every TPC-H query shape runs oracle-checked, so a
  * SQL-warehouse user migrating from the reference's dbt-on-Snowflake stack
  * has the full canonical decision-support surface.
  *
  * The driver tables are REDUCED TPC-H (FIXTURES.md §B): no `partsupp`, no
  * `l_commitdate`/`l_receiptdate`/`l_shipmode`, no `p_container`/`c_phone`.
  * Queries that touch those columns are adapted, keeping the SHAPE (the
  * plan-relevant structure: which subqueries correlate, what joins, what
  * aggregates) while substituting driver columns:
  *  - supply relation (Q2/Q11/Q16/Q20): `partsupp` is derived from lineitem
  *    as the distinct (partkey, suppkey) pairs, with min unit price standing
  *    in for ps_supplycost and shipped quantity for ps_availqty;
  *  - lateness (Q12/Q21): `l_shipdate > o_orderdate + 60 days` stands in for
  *    the receipt-after-commit test;
  *  - vocab: p_type/p_brand/n_name filters use the driver vocabulary.
  *
  * Determinism rules are the fleet-wide ones (ops/Relational.scala scaladoc):
  * money math in DECIMAL(12,2), exact-integer threshold compares (cents)
  * where a float boundary could flip a row, `round(..., 6)` on ratio
  * outputs, total ORDER BY with key tie-breaks, identical aliases in both
  * engines' texts.
  */
object SqlTpch {

  /** TPC-H Q1 canonical text (pricing summary report) — registered under
    * its spec name so the battery is nominally complete; the SHAPE has
    * been the flagship since round 1 (`q1_agg`, ops/Relational.scala:28).
    * Full spec column set (driver lineitem carries l_linestatus and
    * l_tax). Money sums ride DECIMAL(12,2) (the charge product grows to
    * scale 6 — still exact); the averages divide an EXACT decimal sum by
    * the group count in one IEEE division, so no double-summation-order
    * drift (avg(l_discount) naively summed is order-dependent).
    * 100 TB: one scan, one partial+final hash agg on a 4-group key; the
    * shipdate cutoff reaches the parquet scan.
    */
  def sqlTpchQ1(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sqlTpchQ1Text("g_lineitem"))
  }

  private def sqlTpchQ1Text(t: String): String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
       |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
       |    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
       |    * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
       |  round(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM $t
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val sqlTpchQ1Sql: String = sqlTpchQ1Text("lineitem")

  /** TPC-H Q4 canonical shape (order-priority checking): the correlated
    * EXISTS over late lineitems. Adapted lateness: shipped >60 days after
    * ordering (no commit/receipt dates — the Q12/Q21 substitution); the
    * quarter window is the spec's. Distinct from `sql_exists_subq`, which
    * pins the plain shipped-after-order EXISTS on a different window.
    * 100 TB: the EXISTS decorrelates to a semi hash join on l_orderkey
    * with the lateness bound riding as a join condition; orders' date
    * range prunes its scan before the join.
    */
  def sqlTpchQ4(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM g_orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM g_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val sqlTpchQ4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q2 shape (minimum-cost supplier): the correlated-MIN scalar
    * subquery — for each qualifying part, keep only suppliers achieving the
    * regional minimum cost. Adapted: supply = per-(part,supplier) MIN unit
    * price derived from lineitem (no partsupp). The min compare is
    * double EQUALITY and still deterministic: both engines compute the same
    * division of the same operands and MIN over the same set.
    * 100 TB: the supply aggregate is one partial+final hash agg over
    * lineitem; Catalyst decorrelates the MIN subquery into a per-part
    * aggregate joined back on p_partkey — two shuffles on the same key, no
    * per-row re-execution; region/nation broadcast.
    */
  def sqlTpchQ2(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """WITH supply AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS ps_supplycost
        |  FROM g_lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type
        |FROM g_part JOIN supply ON p_partkey = ps_partkey
        |  JOIN g_supplier ON s_suppkey = ps_suppkey
        |  JOIN g_nation ON s_nationkey = n_nationkey
        |  JOIN g_region ON n_regionkey = r_regionkey
        |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        |  AND ps_supplycost = (SELECT MIN(s2.ps_supplycost) FROM supply s2
        |    JOIN g_supplier sup2 ON sup2.s_suppkey = s2.ps_suppkey
        |    JOIN g_nation n2 ON sup2.s_nationkey = n2.n_nationkey
        |    JOIN g_region r2 ON n2.n_regionkey = r2.r_regionkey
        |    WHERE s2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        |LIMIT 100""".stripMargin)
  }

  val sqlTpchQ2Sql: String =
    """WITH supply AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE)) AS ps_supplycost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type
      |FROM part JOIN supply ON p_partkey = ps_partkey
      |  JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      |  AND ps_supplycost = (SELECT MIN(s2.ps_supplycost) FROM supply s2
      |    JOIN supplier sup2 ON sup2.s_suppkey = s2.ps_suppkey
      |    JOIN nation n2 ON sup2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE s2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
      |LIMIT 100""".stripMargin

  /** TPC-H Q6 shape (forecasting revenue change): the pure-scan aggregate —
    * no join at all, three pushable predicates, one output row. The
    * discount band compares raw doubles: literal and stored value are the
    * same nearest-double in both engines, so the band edge cannot drift.
    * 100 TB: this is THE filter-pushdown benchmark — all three predicates
    * reach the parquet scan (PushedFilters), only three columns are read,
    * and one partial+final agg emits a single row; nothing shuffles but
    * one row per task.
    */
  def sqlTpchQ6(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |     * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM g_lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin)
  }

  val sqlTpchQ6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |     * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin

  /** TPC-H Q8 shape (national market share): the 8-way join with BOTH
    * nation roles (customer-side gating the region, supplier-side feeding
    * the CASE), then a share-of-total ratio per year. Numerator and
    * denominator are exact DECIMAL sums; ONE double division per group,
    * rounded to 6dp.
    * 100 TB: region/nation broadcast twice (independent roles, as in Q7);
    * part's type filter prunes before the fact join; the ratio needs no
    * second pass — both sums ride one partial+final aggregate keyed by
    * year (conditional-aggregate trick, same as Q14).
    */
  def sqlTpchQ8(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT o_year,
        |  round(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
        |                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |      / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume,
        |    n2.n_name AS nation
        |  FROM g_part JOIN g_lineitem ON p_partkey = l_partkey
        |    JOIN g_supplier ON s_suppkey = l_suppkey
        |    JOIN g_orders ON l_orderkey = o_orderkey
        |    JOIN g_customer ON o_custkey = c_custkey
        |    JOIN g_nation n1 ON c_nationkey = n1.n_nationkey
        |    JOIN g_region ON n1.n_regionkey = r_regionkey
        |    JOIN g_nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                        AND TIMESTAMP '1997-12-31 00:00:00') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin)
  }

  val sqlTpchQ8Sql: String =
    """SELECT o_year,
      |  round(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
      |                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |      / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
      |FROM (SELECT year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume,
      |    n2.n_name AS nation
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |    JOIN supplier ON s_suppkey = l_suppkey
      |    JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |    JOIN region ON n1.n_regionkey = r_regionkey
      |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                        AND TIMESTAMP '1997-12-31 00:00:00') all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q9 shape (product-type profit): LIKE-filtered part gating a
    * 5-way join, profit aggregated by supplier nation × order year.
    * Adapted: cost = 10% of retail price × quantity stands in for
    * ps_supplycost × quantity (no partsupp); the subtraction stays in
    * DECIMAL end to end (scales 4 and 6 — exact, summed exactly).
    * 100 TB: the '%bolt%' LIKE cannot prune the scan (no prefix) but cuts
    * the build side of the part join before the fact shuffle; nation
    * broadcasts; one partial+final agg on (nation, year).
    */
  def sqlTpchQ9(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
        |      * CAST(0.10 AS DECIMAL(4,2)) AS amount
        |  FROM g_part JOIN g_lineitem ON p_partkey = l_partkey
        |    JOIN g_supplier ON s_suppkey = l_suppkey
        |    JOIN g_orders ON o_orderkey = l_orderkey
        |    JOIN g_nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%bolt%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation ASC, o_year DESC""".stripMargin)
  }

  val sqlTpchQ9Sql: String =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |    - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))
      |      * CAST(0.10 AS DECIMAL(4,2)) AS amount
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |    JOIN supplier ON s_suppkey = l_suppkey
      |    JOIN orders ON o_orderkey = l_orderkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%bolt%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation ASC, o_year DESC""".stripMargin

  /** TPC-H Q11 shape (important stock): group-over-threshold where the
    * threshold is a scalar subquery over the SAME filtered relation — the
    * HAVING-vs-global-total pattern. Adapted: "stock value" = lineitem
    * revenue from one nation's suppliers (no partsupp); part keeps >0.1%
    * of the nation total. The compare is exact integer cents × 1000 vs
    * total (the Q22 trick) — no float boundary.
    * 100 TB: the per-part aggregate and the grand total are the same scan
    * group-by at two granularities; the total collapses to a one-row
    * broadcast (Spark executes the scalar subquery once, not per group).
    */
  def sqlTpchQ11(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT l_partkey AS ps_partkey,
        |  round(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS part_value
        |FROM (SELECT l_partkey, CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM g_lineitem JOIN g_supplier ON l_suppkey = s_suppkey
        |  JOIN g_nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7') t
        |GROUP BY l_partkey
        |HAVING SUM(cents) * 1000 > (
        |  SELECT SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        |  FROM g_lineitem JOIN g_supplier ON l_suppkey = s_suppkey
        |  JOIN g_nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
        |ORDER BY part_value DESC, ps_partkey ASC""".stripMargin)
  }

  val sqlTpchQ11Sql: String =
    """SELECT l_partkey AS ps_partkey,
      |  round(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS part_value
      |FROM (SELECT l_partkey, CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7') t
      |GROUP BY l_partkey
      |HAVING SUM(cents) * 1000 > (
      |  SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
      |ORDER BY part_value DESC, ps_partkey ASC""".stripMargin

  /** TPC-H Q12 shape (shipping priority classes): fact join + dual
    * conditional counts per class. Adapted: l_returnflag stands in for
    * l_shipmode, and "late" = shipped >60 days after ordering stands in
    * for receipt-after-commit (no receipt/commit dates). COUNT(CASE) not
    * SUM(CASE) so both engines emit BIGINT.
    * 100 TB: the ship-year filter prunes the fact scan; the lateness
    * predicate is per-row post-join (it references both sides); one
    * partial+final agg on a 3-value key.
    */
  def sqlTpchQ12(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT l_returnflag AS ship_class,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
        |FROM g_orders JOIN g_lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val sqlTpchQ12Sql: String =
    """SELECT l_returnflag AS ship_class,
      |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q13 shape (customer order distribution): the histogram of a
    * LEFT-join count — zero-order customers must survive with c_count=0,
    * so the priority filter lives in the JOIN CONDITION, not WHERE (the
    * classic outer-join-filter-placement lesson). Adapted: the
    * o_comment NOT LIKE filter becomes an order-priority exclusion.
    * 100 TB: two aggregations — per-customer count (shuffles on custkey,
    * map-side partials), then the tiny count-of-counts; the outer join
    * shuffles on the same custkey so AQE can reuse the partitioning.
    */
  def sqlTpchQ13(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM g_customer LEFT JOIN g_orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  val sqlTpchQ13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15 shape (top supplier): a revenue CTE consumed TWICE — once as
    * the join input, once inside the scalar MAX subquery — selecting the
    * argmax row(s) by exact equality. Revenue is summed in integer
    * 10^-4-dollar units (the DECIMAL(25,4) product is integral at that
    * scale), so the MAX equality is integer-exact in both engines; the
    * displayed figure divides once at the end.
    * 100 TB: the CTE is one partial+final agg over the quarter's lineitem;
    * the MAX collapses to a one-row broadcast; supplier joins broadcast.
    */
  def sqlTpchQ15(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
        |      * 10000 AS BIGINT)) AS total_rev
        |  FROM g_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  round(CAST(total_rev AS DOUBLE) / 10000.0, 6) AS total_revenue
        |FROM g_supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s_suppkey ASC""".stripMargin)
  }

  val sqlTpchQ15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |      * 10000 AS BIGINT)) AS BIGINT) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name,
      |  round(CAST(total_rev AS DOUBLE) / 10000.0, 6) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey ASC""".stripMargin

  /** TPC-H Q16 shape (supplier relationship count): COUNT DISTINCT over a
    * derived supply relation with a NOT-IN exclusion subquery. Adapted:
    * supply = distinct (part, supplier) pairs from lineitem (no partsupp);
    * "complaint" suppliers = negative account balance (no s_comment).
    * 100 TB: the distinct-pairs aggregate collapses repeat shipments
    * map-side before the exchange; the exclusion list is a tiny broadcast
    * null-aware anti join (s_suppkey is non-null so it degenerates to a
    * plain anti join); COUNT(DISTINCT) re-shuffles on the group keys only.
    */
  def sqlTpchQ16(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        |      FROM g_lineitem) supply
        |  JOIN g_part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
        |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM g_supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin)
  }

  val sqlTpchQ16Sql: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      |      FROM lineitem) supply
      |  JOIN part ON p_partkey = ps_partkey
      |WHERE p_brand <> 'Brand#13' AND p_type <> 'MEDIUM'
      |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated-AVG
    * scalar subquery — lines below 20% of their part's average quantity.
    * Quantities are integral doubles, so the inner AVG is an exact integer
    * sum over an identical set divided once — the 0.2×avg boundary is the
    * same double in both engines, no drift.
    * 100 TB: Catalyst decorrelates the AVG into a per-part aggregate
    * joined on p_partkey (one extra shuffle of one row per part — NOT a
    * per-row re-scan); the brand filter broadcasts the tiny part side.
    */
  def sqlTpchQ17(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6)
        |  AS avg_yearly
        |FROM g_lineitem JOIN g_part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM g_lineitem l2
        |                          WHERE l2.l_partkey = p_partkey)""".stripMargin)
  }

  val sqlTpchQ17Sql: String =
    """SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 6)
      |  AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
      |                          WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q19 shape (discounted revenue): the disjunctive multi-block
    * predicate — three OR'd (brand × size × quantity) blocks across the
    * join. Adapted: container/shipmode legs dropped (columns absent);
    * brand/size/quantity legs kept, Brand#24 replacing the spec's
    * out-of-vocabulary Brand#34.
    * 100 TB: the plan question this query exists to ask — Catalyst factors
    * the common join key out of the OR so it stays ONE hash join on
    * p_partkey with the disjunction as a post-join filter, never a
    * fallback nested-loop; the extractable p_brand IN (...) residue can
    * prune the part build side.
    */
  def sqlTpchQ19(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |     * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM g_lineitem JOIN g_part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  val sqlTpchQ19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |     * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q20 shape (potential part promotion): the nested semi-join —
    * suppliers qualify via an aggregate-threshold subquery over their own
    * shipments. Adapted: "availqty > half of shipped" becomes "this
    * supplier shipped more than half the part's year total" over the
    * lineitem-derived supply (no partsupp); quantities are integral
    * doubles so qty×2 > total is exact.
    * 100 TB: both aggregates are partial+final over the same year-pruned
    * scan; the per-(supplier,part) and per-part granularities join on
    * partkey; the final IN is a semi join against a supplier-count-sized
    * set; part's LIKE filter broadcasts.
    */
  def sqlTpchQ20(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT s_suppkey, s_name
        |FROM g_supplier JOIN g_nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1' AND s_suppkey IN (
        |  SELECT sp.l_suppkey FROM
        |    (SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty FROM g_lineitem
        |     WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |     GROUP BY l_suppkey, l_partkey) sp
        |    JOIN (SELECT l_partkey, SUM(l_quantity) AS total_qty FROM g_lineitem
        |     WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |     GROUP BY l_partkey) tp ON sp.l_partkey = tp.l_partkey
        |    JOIN g_part ON sp.l_partkey = p_partkey
        |  WHERE p_name LIKE '%red%' AND sp.qty * 2 > total_qty)
        |ORDER BY s_name ASC""".stripMargin)
  }

  val sqlTpchQ20Sql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_1' AND s_suppkey IN (
      |  SELECT sp.l_suppkey FROM
      |    (SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty FROM lineitem
      |     WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |     GROUP BY l_suppkey, l_partkey) sp
      |    JOIN (SELECT l_partkey, SUM(l_quantity) AS total_qty FROM lineitem
      |     WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |     GROUP BY l_partkey) tp ON sp.l_partkey = tp.l_partkey
      |    JOIN part ON sp.l_partkey = p_partkey
      |  WHERE p_name LIKE '%red%' AND sp.qty * 2 > total_qty)
      |ORDER BY s_name ASC""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the double
    * correlated quantifier — EXISTS (another supplier on the order) AND
    * NOT EXISTS (another LATE supplier on the order) — i.e., "uniquely at
    * fault". Adapted: late = shipped >60 days after ordering (no
    * receipt/commit dates); both subqueries correlate on l_orderkey with
    * a non-equality supplier test and, for the NOT EXISTS, an outer-column
    * lateness bound.
    * 100 TB: both quantifiers decorrelate to semi/anti hash joins on
    * l_orderkey (the <> and date predicates ride as extra join
    * conditions); lineitem shuffles on orderkey once per quantifier;
    * nation/supplier broadcast.
    */
  def sqlTpchQ21(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM g_supplier JOIN g_lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN g_orders ON o_orderkey = l1.l_orderkey
        |  JOIN g_nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND EXISTS (SELECT 1 FROM g_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin)
  }

  val sqlTpchQ21Sql: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |  JOIN orders ON o_orderkey = l1.l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_tpch_q1"  -> (sqlTpchQ1 _),
    "sql_tpch_q4"  -> (sqlTpchQ4 _),
    "sql_tpch_q2"  -> (sqlTpchQ2 _),
    "sql_tpch_q6"  -> (sqlTpchQ6 _),
    "sql_tpch_q8"  -> (sqlTpchQ8 _),
    "sql_tpch_q9"  -> (sqlTpchQ9 _),
    "sql_tpch_q11" -> (sqlTpchQ11 _),
    "sql_tpch_q12" -> (sqlTpchQ12 _),
    "sql_tpch_q13" -> (sqlTpchQ13 _),
    "sql_tpch_q15" -> (sqlTpchQ15 _),
    "sql_tpch_q16" -> (sqlTpchQ16 _),
    "sql_tpch_q17" -> (sqlTpchQ17 _),
    "sql_tpch_q19" -> (sqlTpchQ19 _),
    "sql_tpch_q20" -> (sqlTpchQ20 _),
    "sql_tpch_q21" -> (sqlTpchQ21 _))

  val oracles: Map[String, String] = Map(
    "sql_tpch_q1"  -> sqlTpchQ1Sql,
    "sql_tpch_q4"  -> sqlTpchQ4Sql,
    "sql_tpch_q2"  -> sqlTpchQ2Sql,
    "sql_tpch_q6"  -> sqlTpchQ6Sql,
    "sql_tpch_q8"  -> sqlTpchQ8Sql,
    "sql_tpch_q9"  -> sqlTpchQ9Sql,
    "sql_tpch_q11" -> sqlTpchQ11Sql,
    "sql_tpch_q12" -> sqlTpchQ12Sql,
    "sql_tpch_q13" -> sqlTpchQ13Sql,
    "sql_tpch_q15" -> sqlTpchQ15Sql,
    "sql_tpch_q16" -> sqlTpchQ16Sql,
    "sql_tpch_q17" -> sqlTpchQ17Sql,
    "sql_tpch_q19" -> sqlTpchQ19Sql,
    "sql_tpch_q20" -> sqlTpchQ20Sql,
    "sql_tpch_q21" -> sqlTpchQ21Sql)
}
