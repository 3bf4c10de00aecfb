package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]").config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    Tables.load(spark, "/root/testdata/sf0.001", "orders").createOrReplaceTempView("g_orders")
    Tables.load(spark, "/root/testdata/sf0.001", "customer").createOrReplaceTempView("g_customer")
    Tables.load(spark, "/root/testdata/sf0.001", "part").createOrReplaceTempView("g_part")
    def tryQ(name: String, sql: String): Unit =
      try { val r = spark.sql(sql); r.show(5, false); println(s"PROBE $name OK rows=" + r.count()) }
      catch { case e: Throwable => println(s"PROBE $name FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}") }
    tryQ("lateral_limit",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM g_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM g_orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
    tryQ("recursive_walk",
      """WITH RECURSIVE walk(node, cur, depth) AS (
        |  SELECT p_partkey, p_partkey, 0 FROM g_part
        |  UNION ALL
        |  SELECT node, CAST(floor(cur/2) AS BIGINT), depth+1 FROM walk WHERE cur > 1
        |)
        |SELECT depth, count(*) AS n FROM walk WHERE cur = 1 GROUP BY depth ORDER BY depth""".stripMargin)
    spark.stop()
  }
}
