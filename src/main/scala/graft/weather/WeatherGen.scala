package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic raw-weather documents (no network in the sandbox;
  * mirrors the fetch output shape of reference meteomatics_get_data.py:82-99).
  *
  * Everything is pure integer arithmetic over range() cross-products so a
  * DuckDB oracle can recompute the identical flat readings:
  *  - cities i=0..2: city_i, country_(i%2), lat=50+i, lon=10+2i
  *  - runs j=0..2: run date 2025-03-26+j, dateGenerated = run 02:00 UTC
  *  - params: t_2m:C, wind_speed_10m:ms, precip_1h:mm, sunrise:sql
  *  - hours k=0..72: reading_ts = (run−1d)T00:00 + k h (overlapping runs →
  *    the W1 window-dedup has real work, FIXTURES.md §A)
  *  - numeric value: v10 = (31i+7p+3k+13j) mod 1000, rendered "t.o" with
  *    integer ops (no float formatting ambiguity across engines)
  *  - sunrise value: SQL-datetime STRING (the union-type branch)
  */
object WeatherGen {

  val nCities = 3
  val nRuns   = 3
  val nHours  = 73
  /** epoch seconds of 2025-03-25T00:00:00Z = (run0 − 1 day) at midnight. */
  val epoch0: Long = java.time.Instant.parse("2025-03-25T00:00:00Z").getEpochSecond

  val params: Seq[(Int, String)] = Seq(
    0 -> "t_2m:C", 1 -> "wind_speed_10m:ms", 2 -> "precip_1h:mm", 3 -> "sunrise:sql")

  /** Flat readings (one per city × run × param × hour) with doc metadata.
    * This is the generator's ground truth; `docs` nests it into the raw
    * document shape and `Staging.flatten` must invert that exactly.
    */
  def flatReadings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cities = spark.range(nCities).select(
      $"id".cast(IntegerType).as("city_idx"),
      concat(lit("city_"), $"id").as("city"),
      concat(lit("country_"), ($"id" % 2)).as("country"),
      (lit(50.0) + $"id").as("latitude"),
      (lit(10.0) + $"id" * 2).as("longitude"))
    val runs = spark.range(nRuns).select(
      $"id".cast(IntegerType).as("run_idx"),
      timestamp_seconds(lit(epoch0) + lit(86400L) * (lit(1) + $"id") + lit(7200L)).as("date_generated"))
    val hours = spark.range(nHours).select($"id".cast(IntegerType).as("hour_idx"))
    val ps = params.toDF("param_idx", "parameter")

    cities.crossJoin(runs).crossJoin(ps).crossJoin(hours)
      .withColumn("reading_ts",
        timestamp_seconds(lit(epoch0) + $"run_idx".cast(LongType) * 86400L + $"hour_idx".cast(LongType) * 3600L))
      .withColumn("v10",
        ($"city_idx" * 31 + $"param_idx" * 7 + $"hour_idx" * 3 + $"run_idx" * 13) % 1000)
      .withColumn("value",
        when($"parameter" === "sunrise:sql",
          concat(date_format($"reading_ts", "yyyy-MM-dd"), lit(" 06:"),
                 lpad((($"city_idx" * 7 + $"run_idx") % 60).cast(StringType), 2, "0"), lit(":00")))
        .otherwise(concat(expr("v10 div 10").cast(StringType), lit("."), ($"v10" % 10).cast(StringType))))
      .withColumn("file_path",
        concat($"country", lit("/"), $"city", lit("/weather_raw_"), $"city", lit("_"), $"country",
               lit("_"), date_format(timestamp_seconds(lit(epoch0) + lit(86400L) * (lit(1) + $"run_idx")), "yyyy-MM-dd"),
               lit(".json")))
  }

  /** Nested enriched documents (schema WeatherSchema.enrichedDoc + file_path):
    * one row per (city, run) — the exact S3-object granularity of the
    * reference (meteomatics_get_data.py:108,116). Built by aggregation from
    * `flatReadings`; arrays are sorted so the construction is deterministic.
    */
  def docs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val flat = flatReadings(spark)
      .withColumn("date_str", date_format($"reading_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))

    val perParam = flat
      .groupBy($"city_idx", $"run_idx", $"param_idx", $"parameter",
               $"city", $"country", $"latitude", $"longitude", $"date_generated", $"file_path")
      .agg(array_sort(collect_list(struct($"date_str".as("date"), $"value".as("value")))).as("dates"))
      .withColumn("coordinates",
        array(struct($"latitude".as("lat"), $"longitude".as("lon"), $"dates".as("dates"))))

    perParam
      .groupBy($"city_idx", $"run_idx", $"city", $"country", $"latitude", $"longitude",
               $"date_generated", $"file_path")
      .agg(array_sort(collect_list(struct($"param_idx", $"parameter", $"coordinates"))).as("data0"))
      .select(
        $"city", $"country", $"latitude", $"longitude", $"file_path",
        struct(
          lit("3.0").as("version"),
          lit("graft").as("user"),
          date_format($"date_generated", "yyyy-MM-dd'T'HH:mm:ss'Z'").as("dateGenerated"),
          lit("OK").as("status"),
          transform($"data0", x =>
            struct(x.getField("parameter").as("parameter"),
                   x.getField("coordinates").as("coordinates"))).as("data")
        ).as("weather"))
  }
}
