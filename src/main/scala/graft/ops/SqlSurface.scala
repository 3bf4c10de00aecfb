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

  private def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_tpch_q3" -> (sqlTpchQ3 _),
    "sql_tpch_q5" -> (sqlTpchQ5 _))

  val oracles: Map[String, String] = Map(
    "sql_tpch_q3" -> sqlTpchQ3Sql,
    "sql_tpch_q5" -> sqlTpchQ5Sql)
}
