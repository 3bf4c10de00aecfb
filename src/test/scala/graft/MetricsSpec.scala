package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** ops.Metrics: data-quality counters ride the job that does the real
  * work — the dbt-schema-test intent (V4) without a second scan.
  */
class MetricsSpec extends SparkSpec {

  test("observe counters ride a count() action and report nulls") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(10.0)), (Some(2L), None), (None, Some(3.0)), (Some(1L), Some(4.0))
    ).toDF("k", "v")
    val obs = Observation("quality")
    ops.Metrics.withQualityMetrics(df, obs, "k", "v").count()
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_null_keys") === 1L)
    assert(m("n_null_values") === 1L)
    assert(m("apx_distinct_keys") === 2L) // exact at this size
  }

  test("staging flatten carries its quality counters through one pass") {
    val stg = weather.Staging.flatten(
      weather.WeatherGen.docs(spark)
        .withColumn("file_modified", current_timestamp()))
    val obs = Observation("stg_quality")
    val n = ops.Metrics.withQualityMetrics(stg, obs, "reading_datetime", "reading_value").count()
    val m = obs.get
    assert(m("n_rows") === n)
    assert(m("n_null_keys") === 0L)
    assert(m("n_null_values") === 0L)
  }
}
