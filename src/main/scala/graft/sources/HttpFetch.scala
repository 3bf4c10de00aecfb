package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.{Duration, Instant}
import java.time.format.DateTimeFormatter
import java.util.Base64

import org.apache.spark.sql.{Dataset, SparkSession}

/** S1 http-source (reference meteomatics_get_data.py:63-99): the
  * Meteomatics-style REST fetch — URL template
  * `base/{start--end:PT1H}/{params}/{lat},{lon}/json` (:66-70) with basic
  * auth, non-2xx → raise (:72-78).
  *
  * At the reference's volume (3 calls/day) this runs on the driver; the
  * `fetchMany` fan-out is the 100 TB shape — URLs distributed to executors
  * via mapPartitions, one HttpClient per partition, results landing as a
  * Dataset[String] that `spark.read.schema(...).json(ds)` parses with the
  * V1 gate. Zero-egress container: exercised against a loopback server in
  * HttpFetchSpec.
  */
object HttpFetch extends Serializable {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  /** URL template of meteomatics_get_data.py:66-70. */
  def buildUrl(base: String, start: Instant, end: Instant,
               params: Seq[String], lat: Double, lon: Double): String =
    s"$base/${fmt.format(start)}--${fmt.format(end)}:PT1H/${params.mkString(",")}/$lat,$lon/json"

  def basicAuth(user: String, password: String): String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(StandardCharsets.UTF_8))

  /** One GET; non-2xx raises like the reference's response check. */
  def fetchJson(url: String, user: String, password: String,
                timeoutSec: Long = 10): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSec)).build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Authorization", basicAuth(user, password))
      .timeout(Duration.ofSeconds(timeoutSec))
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} fetching $url")
    resp.body()
  }

  /** [[fetchJson]] behind the reference's bounded retry-with-backoff
    * (helper_geocoders.py:5-13 semantics applied to the REST fetch: 3
    * attempts, 2 s between, 5 s per-call timeout). Driver-side pre-flight
    * only — inside [[fetchMany]]'s executor fan-out the retry is Spark's
    * own task re-attempt, and doubling up would multiply load on a
    * struggling server.
    */
  def fetchJsonRetrying(url: String, user: String, password: String,
      timeoutSec: Long = 5, attempts: Int = 3, backoffMillis: Long = 2000,
      sleep: Long => Unit = Thread.sleep): Either[String, String] =
    graft.weather.Retry.withBackoff(attempts, backoffMillis, sleep)(
      fetchJson(url, user, password, timeoutSec))

  /** Executor-side fan-out: each partition fetches its slice of URLs.
    * Partition count bounds fetch concurrency (rate limiting by
    * repartition(n)); a failed URL fails its task → Spark retry semantics.
    */
  def fetchMany(spark: SparkSession, urls: Seq[String],
                user: String, password: String): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(urls).mapPartitions { it =>
      it.map(u => fetchJson(u, user, password))
    }
  }

  /** Fetch pre-flight for one run date: the reference WeatherDataFetcher's
    * init sequence (meteomatics_get_data.py:38-61) — V3 format guard →
    * S2/V2 geocode → F11 time bounds → S1 URL template. Invalid locations
    * come back as Lefts (the reference raises per-task; a Spark driver
    * surfaces them as an error side-channel instead of dying mid-fan-out).
    */
  def fetchPlan(base: String, locations: Seq[String], params: Seq[String],
                runDate: java.time.LocalDate): (Seq[String], Seq[String]) = {
    import graft.weather.Guards
    val (start, end) = Guards.timeBounds(runDate)
    val (errs, urls) = locations.map { loc =>
      for {
        cc     <- Guards.parseLocation(loc)
        // geocode the NORMALIZED form — the raw string may carry extra
        // whitespace the lookup table's keys don't
        coords <- Guards.geocode(s"${cc._1}, ${cc._2}")
      } yield buildUrl(base, start, end, params, coords._1, coords._2)
    }.partitionMap(identity)
    (errs, urls)
  }
}
