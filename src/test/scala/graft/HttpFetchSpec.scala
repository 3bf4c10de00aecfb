package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.time.Instant
import graft.sources.HttpFetch
import graft.weather.{Staging, WeatherSchema}
import org.scalatest.BeforeAndAfterAll

/** S1 http-source against an in-JVM loopback server (the container has no
  * egress; loopback is enough to exercise the real HttpClient path,
  * auth header, URL template and error handling).
  */
class HttpFetchSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  @volatile private var lastAuth: Option[String] = None
  @volatile private var flakyCalls: Int = 0

  private val doc =
    """{"city":"berlin","country":"germany","latitude":52.5,"longitude":13.4,
      |"weather":{"version":"3.0","user":"t","dateGenerated":"2025-03-26T02:00:00Z","status":"OK",
      |"data":[{"parameter":"t_2m:C","coordinates":[{"lat":52.5,"lon":13.4,
      |"dates":[{"date":"2025-03-26T00:00:00Z","value":"4.2"}]}]}]}}""".stripMargin.replace("\n", "")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val body = doc.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.createContext("/missing", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(404, -1); ex.close()
      }
    })
    server.createContext("/flaky", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        flakyCalls += 1
        if (flakyCalls <= 2) { ex.sendResponseHeaders(503, -1); ex.close() }
        else {
          val body = doc.getBytes("UTF-8")
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
          ex.close()
        }
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  test("S1 URL template matches the reference's path layout") {
    val url = HttpFetch.buildUrl("https://api.example.com",
      Instant.parse("2025-03-25T00:00:00Z"), Instant.parse("2025-04-02T00:00:00Z"),
      Seq("t_2m:C", "wind_speed_10m:ms"), 52.5, 13.4)
    assert(url === "https://api.example.com/2025-03-25T00:00:00Z--2025-04-02T00:00:00Z:PT1H/t_2m:C,wind_speed_10m:ms/52.5,13.4/json")
  }

  test("S1 fetch sends basic auth and returns the body; non-2xx raises") {
    val body = HttpFetch.fetchJson(s"$base/api", "user", "pass")
    assert(body === doc)
    assert(lastAuth.contains(HttpFetch.basicAuth("user", "pass")))
    val err = intercept[RuntimeException] {
      HttpFetch.fetchJson(s"$base/missing", "user", "pass")
    }
    assert(err.getMessage.contains("404"))
  }

  test("S1 retrying fetch survives transient 5xx and gives up on permanent failure") {
    // two 503s then a 200 — succeeds on the third attempt with the
    // reference's 2 s backoff schedule (recorded, not slept)
    flakyCalls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(HttpFetch.fetchJsonRetrying(s"$base/flaky", "user", "pass",
      sleep = sleeps.append) === Right(doc))
    assert(flakyCalls === 3 && sleeps.toSeq === Seq(2000L, 2000L))

    // permanently missing: Left after exactly 3 attempts
    val err = HttpFetch.fetchJsonRetrying(s"$base/missing", "user", "pass", sleep = _ => ())
    assert(err.isLeft && err.swap.toOption.get.contains("after 3 attempts")
      && err.swap.toOption.get.contains("404"))
  }

  test("S1 executor fan-out feeds the schema-validated JSON read (V1)") {
    val urls = Seq(s"$base/api", s"$base/api")
    val ds = HttpFetch.fetchMany(spark, urls, "user", "pass")
    val parsed = spark.read.schema(WeatherSchema.enrichedDoc).json(ds)
    assert(parsed.count() === 2)
    val flat = Staging.flatten(parsed
      .withColumn("file_path", org.apache.spark.sql.functions.lit("http"))
      .withColumn("file_modified", org.apache.spark.sql.functions.lit(null).cast("timestamp")))
    assert(flat.count() === 2) // 1 reading per doc
    assert(flat.select("reading_value").head.getString(0) === "4.2")
  }

  test("fetch pre-flight: guards compose into URLs; bad locations become Lefts") {
    val (errs, urls) = HttpFetch.fetchPlan(
      "https://api.example.com",
      Seq("Berlin, Germany", "Atlantis, Ocean", "nocomma"),
      Seq("t_2m:C", "wind_speed_10m:ms"),
      java.time.LocalDate.parse("2025-03-26"))
    assert(urls.size === 1 && errs.size === 2)
    assert(urls.head ===
      "https://api.example.com/2025-03-25T00:00:00Z--2025-04-02T00:00:00Z:PT1H/" +
      "t_2m:C,wind_speed_10m:ms/52.5170365,13.3888599/json")
    assert(errs.exists(_.contains("geocode")) && errs.exists(_.contains("format")))
  }
}
