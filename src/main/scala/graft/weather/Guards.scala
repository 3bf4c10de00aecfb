package graft.weather

import java.time.{Instant, LocalDate, ZoneOffset}

/** Driver-side ingest guards and helpers (SURVEY.md §2.1/§2.9): the
  * pre-flight pieces of the reference's fetch task that sit OUTSIDE the
  * relational engine — location parsing, geocoding, and the fetch time
  * window. Kept as plain Scala (they run once per location on the driver,
  * like the reference's per-task Python).
  */
object Guards {

  /** S2 geocode: static lookup standing in for the Nominatim call
    * (reference helper_geocoders.py:5-13). An external network service has
    * no place inside the engine core — the lookup is injected as data; a
    * production deployment would refresh this table out-of-band.
    */
  val geocodeTable: Map[String, (Double, Double)] = Map(
    "berlin, germany"  -> (52.5170365, 13.3888599),
    "london, uk"       -> (51.5073219, -0.1276474),
    "paris, france"    -> (48.8588897, 2.3200410),
    "madrid, spain"    -> (40.4167047, -3.7035825),
    "rome, italy"      -> (41.8933203, 12.4829321))

  /** V3 format guard (reference meteomatics_get_data.py:55-58): a location
    * must be "City, Country". Left = the error the reference raises.
    */
  def parseLocation(location: String): Either[String, (String, String)] =
    location.split(",").map(_.trim).filter(_.nonEmpty) match {
      case Array(city, country) => Right((city, country))
      case _ => Left(s"Invalid location format: '$location' (expected 'City, Country')")
    }

  /** V2 geocode guard (reference meteomatics_get_data.py:49-53): a null
    * geocode result is an error, not a silent skip.
    */
  def geocode(location: String): Either[String, (Double, Double)] =
    geocodeTable.get(location.trim.toLowerCase) match {
      case Some(coords) => Right(coords)
      case None         => Left(s"Could not geocode location: '$location'")
    }

  /** S2/V2 geocode with the reference's resilience semantics
    * (helper_geocoders.py:5-13): the geocoder call is retried with backoff
    * on TRANSIENT failures (thrown exceptions — network errors, rate
    * limits), while a clean `None` is a PERMANENT "unknown location" and
    * returns immediately without burning retries. The geocoder function is
    * injected (default: the static table) — production supplies the real
    * Nominatim call; specs supply a flaky fake.
    */
  def geocodeRetrying(location: String,
      geocoder: String => Option[(Double, Double)] = k => geocodeTable.get(k),
      attempts: Int = 3, backoffMillis: Long = 2000,
      sleep: Long => Unit = Thread.sleep): Either[String, (Double, Double)] =
    Retry.withBackoff(attempts, backoffMillis, sleep)(
      geocoder(location.trim.toLowerCase)) match {
      case Right(Some(coords)) => Right(coords)
      case Right(None) => Left(s"Could not geocode location: '$location'")
      case Left(err)   => Left(s"Could not geocode location: '$location' ($err)")
    }

  /** F11 time bounds (reference meteomatics_get_data.py:28-36): a run date
    * maps to the fetch window [run−1d T00:00Z, run+7d T00:00Z].
    */
  def timeBounds(runDate: LocalDate): (Instant, Instant) = (
    runDate.minusDays(1).atStartOfDay(ZoneOffset.UTC).toInstant,
    runDate.plusDays(7).atStartOfDay(ZoneOffset.UTC).toInstant)

  /** F10 string-normalize (meteomatics_get_data.py:55-61): slug for task
    * ids / file names.
    */
  def slug(s: String): String =
    s.trim.toLowerCase.replaceAll("[ ,]+", "_")

  /** The reference's API configuration, verbatim (api_config.yaml:1-14):
    * base URL, hourly step, the 10 weather parameters (note the two
    * `:sql`-typed ones — the union-value branch, SURVEY §1.1), JSON output.
    * Config is data, injected into HttpFetch.fetchPlan — the Spark engine
    * core stays config-free.
    */
  object ApiConfig {
    val baseUrl  = "https://api.meteomatics.com"
    val timeStep = "PT1H"
    val parameters: Seq[String] = Seq(
      "wind_speed_10m:ms", "wind_dir_10m:d", "wind_gusts_10m_1h:ms",
      "t_2m:C", "msl_pressure:hPa", "precip_1h:mm", "weather_symbol_1h:idx",
      "uv:idx", "sunrise:sql", "sunset:sql")
    val outputFormat = "json"
  }
}
