package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Streaming semantics driven through MemoryStream micro-batches. */
class StreamOpsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("tumbling window with watermark aggregates by event time") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("user_id", "ts", "value")
    val q = StreamOps.tumblingCounts(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()

    // batch 1: the windowed data
    input.addData(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 00:40:00"), 5.0),
      (1L, ts("2024-01-01 01:10:00"), 7.0),
      (2L, ts("2024-01-01 00:20:00"), 1.0))
    q.processAllAvailable()
    // batch 2 advances the watermark to 03:00 (05:00 - 2h)...
    input.addData((1L, ts("2024-01-01 05:00:00"), 2.0))
    q.processAllAvailable()
    // ...and batch 3 runs with that watermark, emitting the closed windows
    input.addData((2L, ts("2024-01-01 06:00:00"), 3.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tumbling")
      .orderBy("user_id", "wstart").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    // watermark = 05:00 - 2h = 03:00 → only windows ending before 03:00
    // are finalized; the 05:00/06:00 windows stay open at stop
    assert(rows.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", 2L, 15.0),
      (1L, "2024-01-01 01:00:00.0", 1L, 7.0),
      (2L, "2024-01-01 00:00:00.0", 1L, 1.0)))
  }

  test("sessionization accumulates state across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionize(input.toDS(), timeoutMs = 0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()

    input.addData(Event(1L, ts("2024-01-01 00:00:01"), 3.0),
      Event(1L, ts("2024-01-01 00:00:02"), 4.0))
    q.processAllAvailable()
    input.addData(Event(1L, ts("2024-01-01 00:00:03"), 5.0))
    q.processAllAvailable()
    q.stop()

    val snaps = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // batch 1 snapshot: count 2 sum 7; batch 2 snapshot: count 3 sum 12
    assert(snaps.toSet == Set((1L, 2L, 7.0, false), (1L, 3L, 12.0, false)))
  }
}
