package graft

import org.apache.spark.sql.functions._
import graft.weather.{Marts, Staging, WeatherGen}

/** Star-schema semantics: W1 dedup properties, P6 split completeness,
  * V4 dim key tests (reference models/marts/schema.yml:9-11).
  */
class MartsSpec extends SparkSpec {

  private lazy val stg = Staging.flatten(WeatherGen.docs(spark)).cache()
  private val now = to_timestamp(lit("2025-03-27 00:00:00"))

  test("V4: dim_location key is unique and not null") {
    val dim = Marts.dimLocation(stg)
    assert(dim.count() === WeatherGen.nCities.toLong)
    assert(Marts.keyIsUniqueAndNotNull(dim, "location_key"))
  }

  test("V4: dim_weather_condition key is unique and not null; F2 splits param") {
    import spark.implicits._
    val dim = Marts.dimCondition(stg)
    assert(Marts.keyIsUniqueAndNotNull(dim, "condition_key"))
    val row = dim.filter($"parameter_code" === "t_2m:C").head
    assert(row.getAs[String]("parameter_name") === "t_2m")
    assert(row.getAs[String]("unit") === "C")
  }

  test("W1 ranking is idempotent and input-order-insensitive") {
    import spark.implicits._
    val once = Marts.ranked(stg).filter($"row_num" === 1).drop("row_num")
    val twice = Marts.ranked(once).filter($"row_num" === 1).drop("row_num")
    assert(once.count() === twice.count())
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    // shuffle the input rows: same winners (orderBy rand then re-rank)
    val shuffled = Marts.ranked(stg.orderBy(rand(42))).filter($"row_num" === 1).drop("row_num")
    assert(once.exceptAll(shuffled).isEmpty && shuffled.exceptAll(once).isEmpty)
  }

  test("P6: history and forecast partition the deduped readings exactly") {
    import spark.implicits._
    val ranked = Marts.ranked(stg)
    val hist = Marts.fact(ranked, sunTimes = false, history = true, now)
    val fore = Marts.fact(ranked, sunTimes = false, history = false, now)
    val sunH = Marts.fact(ranked, sunTimes = true, history = true, now)
    val sunF = Marts.fact(ranked, sunTimes = true, history = false, now)
    // completeness: the four facts tile the in-window rank-1 rows
    val inWindow = ranked
      .filter($"row_num" === 1)
      .filter($"reading_datetime".between(
        now - expr("INTERVAL 2 DAY"), now + expr("INTERVAL 7 DAY")))
    assert(hist.count() + fore.count() + sunH.count() + sunF.count() === inWindow.count())
    // no overlap between history and forecast on the same key set
    val overlap = hist.select("location_key", "condition_key", "reading_datetime")
      .intersect(fore.select("location_key", "condition_key", "reading_datetime"))
    assert(overlap.isEmpty)
  }

  test("W1 picks the freshest dateGenerated per reading slot") {
    import spark.implicits._
    // slot covered by all 3 runs: hour 48 of run 0 == hour 24 of run 1 ==
    // hour 0 of run 2; the winner must come from run 2 (latest generated).
    val winners = Marts.ranked(stg).filter($"row_num" === 1)
    val slot = winners.filter(
      $"city" === "city_0" && $"parameter" === "t_2m:C" &&
        $"reading_datetime" === "2025-03-27 00:00:00")
    assert(slot.count() === 1)
    val gen = slot.select(date_format($"dateGenerated", "yyyy-MM-dd HH:mm:ss")).head.getString(0)
    assert(gen === "2025-03-28 02:00:00") // run 2's generation time
  }
}
