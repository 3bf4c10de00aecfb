package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    def tryQ(name: String, sql: String): Unit =
      try { spark.sql(sql).show(3, false); println(s"PROBE $name OK") }
      catch { case e: Throwable => println(s"PROBE $name FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    tryQ("pipe", "FROM VALUES (1,'a'),(2,'b'),(3,'a') AS t(x,g) |> WHERE x > 0 |> AGGREGATE SUM(x) AS s GROUP BY g |> ORDER BY g")
    tryQ("sqludf", "CREATE TEMPORARY FUNCTION dbl(x INT) RETURNS INT RETURN x * 2")
    tryQ("sqludf_use", "SELECT dbl(21)")
    tryQ("try_funcs", "SELECT try_divide(1, 0), try_add(9223372036854775807L, 1L), try_cast('xyz' AS INT), try_to_number('12x', '999')")
    tryQ("pctcont", "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY x) FROM VALUES (1),(2),(3),(10) AS t(x)")
    try { spark.sql("SELECT :p AS v", Map("p" -> 42)).show(); println("PROBE params OK") }
    catch { case e: Throwable => println(s"PROBE params FAIL ${String.valueOf(e.getMessage).take(150)}") }
    try {
      import org.apache.spark.sql.streaming._
      println("PROBE tws " + classOf[StatefulProcessor[_,_,_]].getName)
    } catch { case e: Throwable => println(s"PROBE tws FAIL $e") }
    spark.stop()
  }
}
