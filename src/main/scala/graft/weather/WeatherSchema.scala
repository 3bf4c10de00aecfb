package graft.weather

import org.apache.spark.sql.types._

/** Raw weather document schema (SURVEY.md §1.1), fixed by the reference's
  * pydantic models (reference tasks/meteomatics_pipeline/
  * helper_validate_response.py:5-33 + injected metadata at
  * meteomatics_get_data.py:82-88).
  *
  * `DateValue.value` is a union type (numeric for weather params, SQL
  * datetime string for sunrise:sql/sunset:sql — helper_validate_response.py:7)
  * → carried as StringType until the final fact-level cast, exactly the
  * reference's strategy (stg_weather_raw.sql:38 keeps VARIANT;
  * fact_weather_params_history.sql:41 casts ::FLOAT).
  */
object WeatherSchema {

  val dateValue: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("value", StringType)))

  val coordEntry: StructType = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("dates", ArrayType(dateValue))))

  val paramData: StructType = StructType(Seq(
    StructField("parameter", StringType),
    StructField("coordinates", ArrayType(coordEntry))))

  val weather: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("user", StringType),
    StructField("dateGenerated", StringType),
    StructField("status", StringType),
    StructField("data", ArrayType(paramData))))

  /** Full enriched document, one per (location, run date). */
  val enrichedDoc: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("weather", weather)))

  // Case classes for Dataset[T] validation (V1): a successful `as[...]`
  // + strict JSON read IS the schema gate the reference runs via pydantic.
  case class DateValue(date: String, value: String)
  case class CoordEntry(lat: Double, lon: Double, dates: Seq[DateValue])
  case class ParamData(parameter: String, coordinates: Seq[CoordEntry])
  case class Weather(version: String, user: String, dateGenerated: String,
                     status: String, data: Seq[ParamData])
  case class EnrichedDoc(city: String, country: String, latitude: Double,
                         longitude: Double, weather: Weather)

  /** Numeric parameters (reference api_config.yaml:3-13, subset). */
  val sunParams: Seq[String] = Seq("sunrise:sql", "sunset:sql")
}
