package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe`: named data-quality
  * counters that ride the NEXT action's job — no second scan, no separate
  * validation query. This is the production form of the reference's dbt
  * schema tests (V4, `models/marts/schema.yml:9-11`): instead of
  * re-querying the table for `unique`/`not_null` after materialization,
  * the counters accumulate while the table is being written.
  *
  * Uses the Observation API (listener-backed) rather than reading
  * `queryExecution.observedMetrics` directly — the latter only reflects
  * actions executed through that exact QueryExecution, so e.g. `count()`
  * (which plans its own execution) would silently report nothing.
  *
  * At 100 TB the difference is one full table scan per check; observe
  * metrics are accumulator-backed (constant size per executor, merged on
  * the driver).
  */
object Metrics {

  /** Attach row/null-key/null-value/distinct-key counters. Run any action
    * on the returned frame (in production: the table write), then read
    * `observation.get`.
    */
  def withQualityMetrics(df: DataFrame, observation: Observation,
      keyCol: String, valueCol: String): DataFrame =
    df.observe(observation,
      count(lit(1)).as("n_rows"),
      sum(col(keyCol).isNull.cast("long")).as("n_null_keys"),
      sum(col(valueCol).isNull.cast("long")).as("n_null_values"),
      approx_count_distinct(col(keyCol)).as("apx_distinct_keys"))
}
