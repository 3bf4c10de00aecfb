package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.weather.{Staging, WeatherSchema}

/** Streaming weather ingest: the reference's file-level incremental load
  * (S5, `METADATA$FILENAME NOT IN (...)`, stg_weather_raw.sql:21-25) is
  * EXACTLY what Structured Streaming's checkpointed file source provides
  * natively — each micro-batch processes only files not recorded in the
  * checkpoint, with exactly-once output to the sink. The batch anti-join
  * (Staging.incrementalNew) and this stream are two implementations of
  * one contract; `Trigger.AvailableNow` turns the stream into a
  * run-to-completion daily batch, which is how the reference's 02:00 cron
  * run maps onto it.
  *
  * 100 TB: the checkpoint read is O(new files); maxFilesPerTrigger bounds
  * batch size so a backfill drains in controlled increments.
  */
object WeatherIngestStream {

  /** Checkpointed scan of the raw landing zone: only files unseen by this
    * checkpoint are read. Schema-on-read with the V1 document schema.
    */
  def rawStream(spark: SparkSession, rawRoot: String, maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(WeatherSchema.enrichedDoc)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(rawRoot)
      .withColumn("file_path", col("_metadata.file_path"))
      .withColumn("file_modified", col("_metadata.file_modification_time"))

  /** U1 flatten applied to the stream (same transform as batch staging). */
  def stagingStream(raw: DataFrame): DataFrame = Staging.flatten(raw)

  /** Run-to-completion incremental load: drain everything new, then stop —
    * the streaming equivalent of one daily batch run.
    */
  def incrementalLoad(stg: DataFrame, outPath: String, checkpoint: String): DataStreamWriter[Row] =
    stg.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
}
