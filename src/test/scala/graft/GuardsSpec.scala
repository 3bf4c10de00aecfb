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
