package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.weather.{Marts, Staging, WeatherGen}

/** Driver-registered queries for the weather-pipeline surface (SURVEY.md
  * §2.1–2.5). The Spark side builds NESTED documents (WeatherGen.docs),
  * runs the real triple-explode staging flatten (U1) and the mart models;
  * the DuckDB oracle recomputes the identical flat readings directly from
  * range() cross-products — same integer arithmetic, no nesting needed.
  * Timestamps are emitted as formatted strings (UTC both sides) to avoid
  * parquet tz-annotation mismatches in the compare.
  */
object WeatherQueries {

  private def stg(spark: SparkSession): DataFrame =
    Staging.flatten(WeatherGen.docs(spark))

  /** Shared DuckDB CTE reproducing WeatherGen.flatReadings. */
  private val stgCte: String =
    """WITH c AS (
      |  SELECT CAST(i AS INTEGER) AS city_idx,
      |         'city_' || CAST(i AS VARCHAR) AS city,
      |         'country_' || CAST(i % 2 AS VARCHAR) AS country,
      |         CAST(50 + i AS DOUBLE) AS latitude,
      |         CAST(10 + 2*i AS DOUBLE) AS longitude
      |  FROM range(3) t(i)),
      |r AS (
      |  SELECT CAST(j AS INTEGER) AS run_idx,
      |         TIMESTAMP '2025-03-26 02:00:00' + j * INTERVAL 1 DAY AS dateGenerated,
      |         strftime(TIMESTAMP '2025-03-26 00:00:00' + j * INTERVAL 1 DAY, '%Y-%m-%d') AS run_date
      |  FROM range(3) t(j)),
      |p AS (SELECT * FROM (VALUES (0,'t_2m:C'),(1,'wind_speed_10m:ms'),(2,'precip_1h:mm'),(3,'sunrise:sql')) AS p(param_idx, parameter)),
      |h AS (SELECT CAST(k AS INTEGER) AS hour_idx FROM range(73) t(k)),
      |stg AS (
      |  SELECT country, city, dateGenerated, parameter, latitude, longitude,
      |    TIMESTAMP '2025-03-25 00:00:00' + run_idx * INTERVAL 1 DAY + hour_idx * INTERVAL 1 HOUR AS reading_datetime,
      |    CASE WHEN parameter = 'sunrise:sql'
      |      THEN strftime(TIMESTAMP '2025-03-25 00:00:00' + run_idx * INTERVAL 1 DAY + hour_idx * INTERVAL 1 HOUR, '%Y-%m-%d')
      |           || ' 06:' || lpad(CAST((city_idx*7 + run_idx) % 60 AS VARCHAR), 2, '0') || ':00'
      |      ELSE CAST(((city_idx*31 + param_idx*7 + hour_idx*3 + run_idx*13) % 1000) // 10 AS VARCHAR)
      |           || '.' || CAST((city_idx*31 + param_idx*7 + hour_idx*3 + run_idx*13) % 10 AS VARCHAR)
      |    END AS reading_value,
      |    country || '/' || city || '/weather_raw_' || city || '_' || country || '_' || run_date || '.json' AS file_path
      |  FROM c CROSS JOIN r CROSS JOIN p CROSS JOIN h)""".stripMargin

  // -------------------------------------------------------------------------
  // S4+U1+P1/P2: the staging model itself, after doc-nesting + flatten.
  def wxStaging(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    stg(spark).select(
      $"file_path", $"country", $"city",
      date_format($"dateGenerated", "yyyy-MM-dd HH:mm:ss").as("date_generated"),
      $"parameter", $"latitude", $"longitude",
      date_format($"reading_datetime", "yyyy-MM-dd HH:mm:ss").as("reading_ts"),
      $"reading_value")
      .orderBy($"file_path", $"parameter", $"reading_ts")
  }

  val wxStagingSql: String = stgCte +
    """
      |SELECT file_path, country, city,
      |  strftime(dateGenerated, '%Y-%m-%d %H:%M:%S') AS date_generated,
      |  parameter, latitude, longitude,
      |  strftime(reading_datetime, '%Y-%m-%d %H:%M:%S') AS reading_ts,
      |  reading_value
      |FROM stg
      |ORDER BY file_path, parameter, reading_ts""".stripMargin

  // -------------------------------------------------------------------------
  // P7+F1: dim_location.
  def wxDimLocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Marts.dimLocation(stg(spark)).orderBy($"location_key")
  }

  val wxDimLocationSql: String = stgCte +
    """
      |SELECT DISTINCT md5(concat_ws('-', country, city)) AS location_key,
      |  country, city, latitude, longitude
      |FROM stg ORDER BY location_key""".stripMargin

  // -------------------------------------------------------------------------
  // P7+F1+F2: dim_weather_condition.
  def wxDimCondition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Marts.dimCondition(stg(spark)).orderBy($"condition_key")
  }

  val wxDimConditionSql: String = stgCte +
    """
      |SELECT DISTINCT md5(parameter) AS condition_key,
      |  parameter AS parameter_code,
      |  split_part(parameter, ':', 1) AS parameter_name,
      |  split_part(parameter, ':', 2) AS unit
      |FROM stg ORDER BY condition_key""".stripMargin

  // -------------------------------------------------------------------------
  // The four fact models: P4+W1+P5+P6+F1+F3+P3 over the shared ranking.
  private def factQuery(sunTimes: Boolean, history: Boolean)(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val now = lit("2025-03-28 00:00:00").cast(TimestampType)
    val f = Marts.fact(Marts.ranked(stg(spark)), sunTimes = sunTimes, history = history, now = now)
    f.select(
        $"location_key", $"condition_key", $"date_key",
        date_format($"reading_datetime", "yyyy-MM-dd HH:mm:ss").as("reading_ts"),
        $"reading_value")
      .orderBy($"location_key", $"condition_key", $"reading_ts")
  }

  private def factSql(sunTimes: Boolean, history: Boolean): String = {
    val paramPred =
      if (sunTimes) "parameter IN ('sunrise:sql','sunset:sql')"
      else "parameter NOT IN ('sunrise:sql','sunset:sql')"
    val histPred =
      if (history) "reading_datetime <= dateGenerated" else "reading_datetime > dateGenerated"
    val valueExpr =
      if (sunTimes) "reading_value" else "CAST(reading_value AS DOUBLE) AS reading_value"
    stgCte +
      s"""
         |, ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY city, parameter, reading_datetime
         |                               ORDER BY dateGenerated DESC) AS row_num
         |  FROM stg
         |  WHERE reading_datetime BETWEEN TIMESTAMP '2025-03-28 00:00:00' - INTERVAL 2 DAY
         |                             AND TIMESTAMP '2025-03-28 00:00:00' + INTERVAL 7 DAY)
         |SELECT md5(concat_ws('-', country, city)) AS location_key,
         |  md5(parameter) AS condition_key,
         |  CAST(strftime(reading_datetime, '%Y%m%d') AS INTEGER) AS date_key,
         |  strftime(reading_datetime, '%Y-%m-%d %H:%M:%S') AS reading_ts,
         |  $valueExpr
         |FROM ranked
         |WHERE $paramPred AND $histPred AND row_num = 1
         |ORDER BY location_key, condition_key, reading_ts""".stripMargin
  }

  // -------------------------------------------------------------------------
  // S5 incremental-scan: anti-join away the files of run 0, keep per-file
  // reading counts of the genuinely new files.
  def wxIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = ScopedCache.untilConsumed(stg(spark)) // consumed by both anti-join sides
    val existing = all.filter($"dateGenerated" === lit("2025-03-26 02:00:00").cast(TimestampType))
    Staging.incrementalNew(all, existing)
      .groupBy($"file_path").agg(count(lit(1)).as("n_readings"))
      .orderBy($"file_path")
  }

  val wxIncrementalSql: String = stgCte +
    """
      |SELECT file_path, COUNT(*) AS n_readings
      |FROM stg
      |WHERE file_path NOT IN (SELECT DISTINCT file_path FROM stg
      |                        WHERE dateGenerated = TIMESTAMP '2025-03-26 02:00:00')
      |GROUP BY file_path ORDER BY file_path""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wx_staging"           -> (wxStaging _),
    "wx_dim_location"      -> (wxDimLocation _),
    "wx_dim_condition"     -> (wxDimCondition _),
    "wx_fact_params_history"  -> (factQuery(sunTimes = false, history = true) _),
    "wx_fact_params_forecast" -> (factQuery(sunTimes = false, history = false) _),
    "wx_fact_sun_history"     -> (factQuery(sunTimes = true, history = true) _),
    "wx_fact_sun_forecast"    -> (factQuery(sunTimes = true, history = false) _),
    "wx_incremental"       -> (wxIncremental _))

  val oracles: Map[String, String] = Map(
    "wx_staging"           -> wxStagingSql,
    "wx_dim_location"      -> wxDimLocationSql,
    "wx_dim_condition"     -> wxDimConditionSql,
    "wx_fact_params_history"  -> factSql(sunTimes = false, history = true),
    "wx_fact_params_forecast" -> factSql(sunTimes = false, history = false),
    "wx_fact_sun_history"     -> factSql(sunTimes = true, history = true),
    "wx_fact_sun_forecast"    -> factSql(sunTimes = true, history = false),
    "wx_incremental"       -> wxIncrementalSql)
}
