package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.ops.EventWindows

/** Structured-Streaming entry points (SURVEY.md §2.7): the batch window
  * transforms of graft.ops.EventWindows applied to an unbounded source.
  * The reference pipeline is strictly daily batch, so these are the
  * promotion path, not a port: `readStream` + watermark + the SAME
  * `tumblingAgg`/`sessionAgg` plans (batch/stream equivalence is asserted
  * in StreamingSpec via MemoryStream).
  *
  * At scale: watermark bounds state (1h windows + 1h lateness ⇒ ≤2h of
  * open windows per key); session state is bounded by the 10-minute gap.
  */
object EventStreams {

  /** Watermarked tumbling aggregation over any streaming events frame
    * (schema: ts timestamp, event_type string, value double, ...).
    */
  def tumblingStream(events: DataFrame): DataFrame =
    EventWindows.tumblingAgg(events.withWatermark("ts", "1 hour"))

  /** Watermarked session aggregation (user_id long, ts, value). */
  def sessionStream(events: DataFrame): DataFrame =
    EventWindows.sessionAgg(events.withWatermark("ts", "1 hour"))

  /** File-source stream over a directory of parquet event files → console
    * or any sink; the deployment shape for continuous ingest.
    */
  def fromParquetDir(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(graft.Tables.events(spark, "/root/testdata/sf0.001").schema)
      .parquet(path)

  /** Append-mode writer for a windowed aggregate (finalized windows only —
    * the watermark closes them).
    */
  def toParquetSink(agg: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    agg.writeStream
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
}
