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

  /** A10 mergeable HLL sketches (DataSketches HllSketch): distinct
    * customers are sketched at FINE grain (priority × status), the binary
    * sketches are then hll_union_agg'd up to priority grain — no rescan of
    * the base data. This re-aggregability is the entire point at 100 TB:
    * a daily sketch table rolls up to month/year/anything in sketch-space,
    * while exact countDistinct must re-shuffle raw keys for every grain.
    *
    * Oracle trick (same as emb_quantize's fidelity check): sketch VALUES
    * are engine-defined, so the query outputs the exact count plus a
    * BOOLEAN "merged estimate within 5% of exact" verdict — DuckDB asserts
    * the exact count and `TRUE`. If the merged sketch ever drifts out of
    * tolerance the hash compare fails.
    */
  def a10HllMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fine = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sketch"))
    val merged = fine
      .groupBy($"o_orderpriority")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("est"))
    val exact = Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n_exact"))
    merged.join(exact, Seq("o_orderpriority"))
      .select($"o_orderpriority", $"n_exact",
        (abs($"est" - $"n_exact") / $"n_exact" < 0.05).as("within_5pct"))
      .orderBy($"o_orderpriority")
  }

  val a10HllMergeSql: String =
    """SELECT o_orderpriority,
      |  COUNT(DISTINCT o_custkey) AS n_exact,
      |  TRUE AS within_5pct
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a8_approx"     -> (a8Approx _),
    "a10_hll_merge" -> (a10HllMerge _))

  /** a8_approx has no oracle (see scaladoc); a10's boolean-verdict oracle
    * pins the merge fidelity without comparing sketch values. */
  val oracles: Map[String, String] = Map(
    "a10_hll_merge" -> a10HllMergeSql)
}
