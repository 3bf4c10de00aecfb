package graft

import org.apache.spark.sql.functions._
import graft.ops.ScalarFuncs

/** §2.3 scalar functions against hand-computed expectations (reference
  * semantics cited per test).
  */
class ScalarFuncsSpec extends SparkSpec {

  test("F1 surrogate key follows dbt_utils null-sentinel semantics") {
    import spark.implicits._
    // dbt_utils.generate_surrogate_key: md5 of '-'-joined coalesced casts
    // with '_dbt_utils_surrogate_key_null_' for NULLs (packages.yml:1-3).
    val row = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(ScalarFuncs.surrogateKey($"a", $"b").as("k"))
      .head.getString(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("x-_dbt_utils_surrogate_key_null_".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row === expected)
  }

  test("F1 key equality iff input equality (sentinel disambiguates null vs literal)") {
    import spark.implicits._
    val df = Seq(
      ("a", Some("b")), ("a", Some("b")),       // identical
      ("a", None), ("a", Some("_dbt_utils_surrogate_key_null_"))  // null vs sentinel-literal COLLIDE (known dbt behavior)
    ).toDF("a", "b").select($"a", $"b", ScalarFuncs.surrogateKey($"a", $"b").as("k"))
    val ks = df.select($"k").collect().map(_.getString(0))
    assert(ks(0) === ks(1))
    // dbt_utils' documented collision: we reproduce it faithfully.
    assert(ks(2) === ks(3))
  }

  test("F5 DOW remap: Spark dayofweek-1 equals Snowflake dow (0=Sun..6=Sat)") {
    import spark.implicits._
    // 2020-01-05 was a Sunday, 2020-01-06 a Monday, 2020-01-04 a Saturday.
    val df = Seq("2020-01-05", "2020-01-06", "2020-01-04").toDF("d")
      .select((dayofweek(to_date($"d")) - 1).as("dow"))
      .collect().map(_.getInt(0))
    assert(df.toSeq === Seq(0, 1, 6))
  }

  test("F7 is-weekend matches reference dim_date.sql:17-20 (Sat+Sun)") {
    import spark.implicits._
    val we = Seq("2020-01-04", "2020-01-05", "2020-01-06").toDF("d")
      .select(dayofweek(to_date($"d")).isin(1, 7).as("w"))
      .collect().map(_.getBoolean(0))
    assert(we.toSeq === Seq(true, true, false))
  }

  test("F8 week-number uses the reference formula, not ISO weekofyear") {
    // dim_date.sql:21-26: weeks since the Monday-start week containing
    // Jan 1, plus 1. 2021-01-01 is a Friday: its Monday-week starts
    // 2020-12-28, so Jan 1..3 are week 1 and Jan 4 starts week 2 —
    // ISO weekofyear would call Jan 1 'week 53', the bug SURVEY §7.5 flags.
    val got = ScalarFuncs.dimDate(spark, sfDir)
      .filter(col("date_day").isin("2021-01-01", "2021-01-03", "2021-01-04"))
      .orderBy("date_day")
      .select("week_number").collect().map(_.getInt(0))
    assert(got.toSeq === Seq(1, 1, 2))
  }

  test("F3 date-key is yyyyMMdd as int") {
    import spark.implicits._
    val k = Seq("1997-03-09").toDF("d")
      .select(date_format(to_date($"d"), "yyyyMMdd").cast("int").as("k"))
      .head.getInt(0)
    assert(k === 19970309)
  }

  test("dim_date has 3653 unique, not-null date keys (V4 port)") {
    val dd = ScalarFuncs.dimDate(spark, sfDir)
    assert(dd.count() === 3653L)
    assert(graft.weather.Marts.keyIsUniqueAndNotNull(dd, "date_key"))
  }
}
