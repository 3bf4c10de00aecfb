package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** §2.7: the window transforms produce IDENTICAL results in batch and
  * streaming execution — same declarative plan, two engines.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling aggregation: streaming (MemoryStream) equals batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "click", 4.0),
      (ts("2024-01-01 10:10:00"), "purchase", 8.0))

    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = EventStreams.tumblingStream(
      input.toDF.toDF("ts", "event_type", "value"))
    val q = stream.writeStream.format("memory")
      .queryName("stream_tumbling").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_tumbling")
        .orderBy($"window_start", $"event_type").collect()
      val batch = graft.ops.EventWindows.tumblingAgg(
        rows.toDF("ts", "event_type", "value"))
        .orderBy($"window_start", $"event_type").collect()
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.length === 3) // 2 click windows + 1 purchase window
    } finally q.stop()
  }

  test("session aggregation: streaming equals batch, gap closes sessions") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:05:00"), 1L, 2.0),  // same session (5 min gap)
      (ts("2024-01-01 10:30:00"), 1L, 4.0),  // new session (25 min gap)
      (ts("2024-01-01 10:00:00"), 2L, 8.0))

    val input = MemoryStream[(Timestamp, Long, Double)]
    val stream = EventStreams.sessionStream(
      input.toDF.toDF("ts", "user_id", "value"))
    val q = stream.writeStream.format("memory")
      .queryName("stream_session").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_session")
        .orderBy($"user_id", $"session_start").collect()
      val batch = graft.ops.EventWindows.sessionAgg(
        rows.toDF("ts", "user_id", "value"))
        .orderBy($"user_id", $"session_start").collect()
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.length === 3) // user 1: two sessions; user 2: one
    } finally q.stop()
  }
}
