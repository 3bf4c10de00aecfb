package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.weather.Guards

/** Driver-side ingest guards (V2/V3) and helpers (S2/F10/F11). */
class GuardsSpec extends AnyFunSuite {

  test("V3 format guard accepts 'City, Country' and rejects malformed input") {
    assert(Guards.parseLocation("Berlin, Germany") === Right(("Berlin", "Germany")))
    assert(Guards.parseLocation(" Paris ,  France ") === Right(("Paris", "France")))
    assert(Guards.parseLocation("Berlin").isLeft)
    assert(Guards.parseLocation("a, b, c").isLeft)
    assert(Guards.parseLocation(",").isLeft)
  }

  test("V2 geocode guard: known location resolves, unknown is an error") {
    assert(Guards.geocode("Berlin, Germany").isRight)
    assert(Guards.geocode("BERLIN, germany").isRight) // case-normalized
    assert(Guards.geocode("Atlantis, Ocean").isLeft)
  }

  test("S2 geocode retry: transient failures back off, permanent miss is immediate") {
    // two transient failures then success — the reference's 3-retry /
    // 2 s-backoff loop (helper_geocoders.py:5-13)
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky: String => Option[(Double, Double)] = { k =>
      calls += 1
      if (calls <= 2) throw new RuntimeException("nominatim timed out")
      Guards.geocodeTable.get(k)
    }
    assert(Guards.geocodeRetrying("Berlin, Germany", flaky, sleep = sleeps.append)
      === Right((52.5170365, 13.3888599)))
    assert(calls === 3 && sleeps.toSeq === Seq(2000L, 2000L))

    // permanently failing service: Left after exactly `attempts` tries
    var calls2 = 0
    val dead: String => Option[(Double, Double)] =
      _ => { calls2 += 1; throw new RuntimeException("connection refused") }
    val err = Guards.geocodeRetrying("Berlin, Germany", dead, sleep = _ => ())
    assert(err.isLeft && err.swap.toOption.get.contains("after 3 attempts"))
    assert(calls2 === 3)

    // unknown location is a clean None — no retries burned, no sleeps
    var calls3 = 0
    val counting: String => Option[(Double, Double)] =
      k => { calls3 += 1; Guards.geocodeTable.get(k) }
    assert(Guards.geocodeRetrying("Atlantis, Ocean", counting, sleep = _ => fail("must not sleep")).isLeft)
    assert(calls3 === 1)
  }

  test("F11 time bounds are [run-1d T00Z, run+7d T00Z]") {
    val (start, end) = Guards.timeBounds(LocalDate.parse("2025-03-26"))
    assert(start.toString === "2025-03-25T00:00:00Z")
    assert(end.toString === "2025-04-02T00:00:00Z")
  }

  test("F10 slug normalizes case, spaces and commas") {
    assert(Guards.slug("Berlin, Germany") === "berlin_germany")
    assert(Guards.slug("  New York , USA ") === "new_york_usa")
  }

  test("ApiConfig mirrors the reference config; sun params are its :sql subset") {
    assert(Guards.ApiConfig.parameters.size === 10)
    assert(Guards.ApiConfig.parameters.filter(_.endsWith(":sql"))
      === weather.WeatherSchema.sunParams)
    val (errs, urls) = sources.HttpFetch.fetchPlan(
      Guards.ApiConfig.baseUrl, Seq("Berlin, Germany"),
      Guards.ApiConfig.parameters, java.time.LocalDate.parse("2025-03-26"))
    assert(errs.isEmpty && urls.head.contains("sunrise:sql,sunset:sql"))
  }
}
