package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Approximate/sketch aggregates — the operators that replace their exact
  * forms first when data hits 100 TB: HyperLogLog++ distinct counts
  * (approx_count_distinct), t-digest-style quantiles (approx_percentile),
  * and (in SketchSpec) count-min frequency and Bloom membership via
  * DataFrameStatFunctions.
  *
  * a8_approx is registered WITHOUT an oracle: sketch results are
  * implementation-defined, so no cross-engine value identity exists — the
  * driver records the weaker rows-only check, and ApproxSpec enforces the
  * real contract (rigorous error bounds against the exact answers, which
  * ARE oracle-checked via a2_distinct_agg / a4_percentiles).
  *
  * 100 TB: both sketches are fixed-size partial states merged
  * associatively — one pass, map-side partials, no per-group row
  * materialization; exactly why they displace exact distinct/percentile
  * at scale.
  */
object ApproxAggs {

  def a8Approx(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct($"l_partkey", 0.02).as("apx_parts"),
        approx_count_distinct($"l_suppkey", 0.02).as("apx_supps"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("apx_p50"),
        percentile_approx($"l_extendedprice", lit(0.95), lit(10000)).as("apx_p95"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a8_approx" -> (a8Approx _))

  /** No oracle (see scaladoc). */
  val oracles: Map[String, String] = Map.empty
}
