package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY.md §2.6 / prompt "salting for skew").
  *
  * AQE's skew-join splitting already rescues sort-merge joins at runtime;
  * explicit salting remains the tool when (a) the hot key is known and the
  * join is hash-based, or (b) the skew is in an AGGREGATION (AQE cannot
  * split a hash-aggregate group).
  */
object Skew {

  /** Salted equi-join: scatter the large side into `buckets` sub-keys by a
    * deterministic content hash, replicate the small side once per bucket,
    * join on (key, salt). A key with N rows spreads over min(N, buckets)
    * tasks instead of one.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(struct(large.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key — a hot group's partials land on `buckets`
    * tasks. `partial` and `merge` must form an associative pair (e.g.
    * count/sum, sum/sum).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(struct(df.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n_rows"))
}
