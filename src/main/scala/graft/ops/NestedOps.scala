package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Nested-data operators over driver tables: U1 generator/explode and
  * P1 json-path extraction (SURVEY.md §2.2, §2.4).
  */
object NestedOps {

  /** U1: posexplode of the token array — a Generate node, like the
    * reference's LATERAL FLATTEN (stg_weather_raw.sql:39-42).
    */
  def u1ExplodeTokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"), min($"pos").cast(IntegerType).as("min_pos"))
      .orderBy($"n".desc, $"tok".asc)
      .limit(100)
  }

  val u1ExplodeTokensSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(string_split(text, ' ')) AS tok,
      |    CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos
      |  FROM documents)
      |SELECT tok, COUNT(*) AS n, CAST(MIN(pos) AS INTEGER) AS min_pos
      |FROM t GROUP BY tok
      |ORDER BY n DESC, tok ASC LIMIT 100""".stripMargin

  /** P1: json-path extraction from the events.props JSON column. */
  def p1JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast(IntegerType).as("k_val"))
      .groupBy($"k_val")
      .agg(count(lit(1)).as("n"))
      .orderBy($"k_val".asc_nulls_first)
  }

  val p1JsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val, COUNT(*) AS n
      |FROM events GROUP BY k_val ORDER BY k_val ASC NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_explode_tokens" -> (u1ExplodeTokens _),
    "p1_json_extract"   -> (p1JsonExtract _))

  val oracles: Map[String, String] = Map(
    "u1_explode_tokens" -> u1ExplodeTokensSql,
    "p1_json_extract"   -> p1JsonExtractSql)
}
