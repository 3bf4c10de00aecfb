package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Scalar-function surface of the reference (SURVEY.md §2.3), demonstrated
  * on driver tables with DuckDB oracles.
  *
  * F1 surrogate key follows dbt_utils.generate_surrogate_key semantics
  * (reference packages.yml:1-3; dim_location.sql:4): md5 of the '-'-joined
  * null-coalesced string casts.
  */
object ScalarFuncs {

  private val nullSentinel = "_dbt_utils_surrogate_key_null_"

  /** The C1 hash-mod bucket (md5 → first 8 hex digits → int64 → mod 100):
    * ONE definition per engine, consumed by the curation split/sample/mix
    * family (llm/Curation.scala) and V8's PSI populations (Metrics.scala)
    * — the populations those operators compare are the C1 split by
    * construction, so the formula must never fork.
    */
  def bucketExpr(keyCol: String): String =
    s"CAST(conv(substr(md5(CAST($keyCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"

  val splitBucketExpr: String = bucketExpr("doc_id")

  /** DuckDB replay of [[bucketExpr]] (hex fold, single line for
    * interpolation into any CTE).
    */
  def bucketSql(keyCol: String): String =
    "CAST(list_sum(list_transform([1,2,3,4,5,6,7,8], i -> " +
      s"CAST(strpos('0123456789abcdef', substr(md5(CAST($keyCol AS VARCHAR)), i, 1)) - 1 AS BIGINT) " +
      "* CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT) % 100"

  val splitBucketSql: String = bucketSql("doc_id")

  /** dbt_utils.generate_surrogate_key (reference dim_location.sql:4). */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast(StringType), lit(nullSentinel))): _*))

  // -------------------------------------------------------------------------
  // F1 surrogate key + F2 split_part on customer.
  def fStringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        surrogateKey($"c_custkey", $"c_nationkey").as("location_key"),
        split_part($"c_name", lit("#"), lit(1)).as("name_prefix"),
        split_part($"c_name", lit("#"), lit(2)).as("name_suffix"),
        lower($"c_mktsegment").as("segment_slug"),
        regexp_replace(lower($"c_mktsegment"), "[ ,]", "_").as("segment_key"))
      .orderBy($"c_custkey")
  }

  val fStringFuncsSql: String =
    """SELECT c_custkey,
      |  md5(concat_ws('-',
      |    COALESCE(CAST(c_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
      |    COALESCE(CAST(c_nationkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS location_key,
      |  split_part(c_name, '#', 1) AS name_prefix,
      |  split_part(c_name, '#', 2) AS name_suffix,
      |  lower(c_mktsegment) AS segment_slug,
      |  regexp_replace(lower(c_mktsegment), '[ ,]', '_', 'g') AS segment_key
      |FROM customer ORDER BY c_custkey""".stripMargin

  // -------------------------------------------------------------------------
  // F3 date-key, F4 dateadd, F5 extract + DOW remap, F6 weekday name,
  // F7 is-weekend on orders dates.
  def fDateFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select(
        $"o_orderkey",
        date_format($"o_orderdate", "yyyyMMdd").cast(IntegerType).as("date_key"),
        date_format(date_add($"o_orderdate", 7), "yyyy-MM-dd").as("plus_week"),
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        // Snowflake dow: 0=Sun..6=Sat (reference dim_date.sql:18);
        // Spark dayofweek: 1=Sun..7=Sat → subtract 1.
        (dayofweek($"o_orderdate") - 1).as("dow"),
        date_format($"o_orderdate", "EEEE").as("weekday_name"),
        dayofweek($"o_orderdate").isin(1, 7).as("is_weekend"))
      .orderBy($"o_orderkey")
  }

  val fDateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
      |  strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
      |  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS d,
      |  CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
      |  dayname(o_orderdate) AS weekday_name,
      |  dayofweek(o_orderdate) IN (0, 6) AS is_weekend
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // -------------------------------------------------------------------------
  // F9 generator + F3..F8: the reference's dim_date calendar
  // (dim_date.sql:3-28), 3653 days from 2020-01-01. F8 week_number uses the
  // reference's formula (Monday-start weeks since the week of Jan 1), NOT
  // weekofyear (ISO semantics differ at year boundaries — SURVEY §7.5).
  def dimDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = to_date(lit("2020-01-01"))
    spark.range(3653)
      .select(date_add(base, $"id".cast(IntegerType)).as("date_day"))
      .select(
        $"date_day",
        date_format($"date_day", "yyyyMMdd").cast(IntegerType).as("date_key"),
        year($"date_day").as("year"),
        month($"date_day").as("month"),
        dayofmonth($"date_day").as("day"),
        (dayofweek($"date_day") - 1).as("weekday"),
        // reference dim_date.sql:16 emits to_char(date_day,'Day') — the
        // day NAME; kept alongside the numeric dow
        date_format($"date_day", "EEEE").as("weekday_name"),
        dayofweek($"date_day").isin(1, 7).as("is_weekend"),
        ((datediff(date_trunc("week", $"date_day").cast(DateType),
                   date_trunc("week", trunc($"date_day", "year")).cast(DateType)) / 7)
          .cast(IntegerType) + 1).as("week_number"))
      .orderBy($"date_day")
  }

  val dimDateSql: String =
    """SELECT date_day,
      |  CAST(strftime(date_day, '%Y%m%d') AS INTEGER) AS date_key,
      |  CAST(EXTRACT(year FROM date_day) AS INTEGER) AS year,
      |  CAST(EXTRACT(month FROM date_day) AS INTEGER) AS month,
      |  CAST(EXTRACT(day FROM date_day) AS INTEGER) AS day,
      |  CAST(dayofweek(date_day) AS INTEGER) AS weekday,
      |  dayname(date_day) AS weekday_name,
      |  dayofweek(date_day) IN (0, 6) AS is_weekend,
      |  CAST(date_diff('day',
      |         date_trunc('week', date_trunc('year', date_day)),
      |         date_trunc('week', date_day)) / 7 AS INTEGER) + 1 AS week_number
      |FROM (SELECT CAST(DATE '2020-01-01' + INTERVAL (i) DAY AS DATE) AS date_day
      |      FROM range(3653) t(i))
      |ORDER BY date_day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f_string_funcs" -> (fStringFuncs _),
    "f_date_funcs"   -> (fDateFuncs _),
    "dim_date"       -> (dimDate _))

  val oracles: Map[String, String] = Map(
    "f_string_funcs" -> fStringFuncsSql,
    "f_date_funcs"   -> fDateFuncsSql,
    "dim_date"       -> dimDateSql)
}
