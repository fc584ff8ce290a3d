package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured-Streaming extension tests (no streaming in the
  * reference; SURVEY §2.5 extension surface). */
class StreamingSpec extends SparkSpec {

  // offset from epoch 0: rows at exactly the initial watermark (0)
  // would be dropped as late
  private def ts(min: Int) = new Timestamp((1000 + min) * 60000L)

  test("watermarked tumbling-window aggregation over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val agg = EventStream.windowedCounts(
      mem.toDF(), window_ = "10 minutes", watermark = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(5), 10, "click", 2.0),
        Event(3, ts(12), 11, "buy", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first two windows
      mem.addData(Event(4, ts(60), 11, "buy", 1.0))
      q.processAllAvailable()
      val got = rows(s.table("win_agg"))
      assert(got.exists(r => r(1) == "click" && r(2) == 2L &&
        r(3) == 3.0), got.toString)
      assert(got.exists(r => r(1) == "buy" && r(2) == 1L), got.toString)
    } finally q.stop()
  }

  test("file-source stream over an events parquet directory") {
    val s = spark
    // stage an events directory (micros timestamps) for the file source
    val dir = java.nio.file.Files.createTempDirectory("graft-evt-").toString
    Testbed.env(s, "/root/testdata/sf0.001")
      .view("events", Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      .read().withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(dir)
    val events = EventStream.readEvents(s, dir)
    assert(events.isStreaming)
    val q = EventStream.windowedCounts(events, window_ = "1 day")
      .writeStream.format("memory").queryName("file_win")
      .outputMode(OutputMode.Complete).start() // complete: no watermark wait
    try {
      q.processAllAvailable()
      assert(rows(s.table("file_win")).nonEmpty)
    } finally q.stop()
  }

  test("gap-based sessionization with flatMapGroupsWithState") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventStream.sessions(mem.toDS(), gapMs = 10 * 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 10: two bursts separated by > gap -> first session closes
      mem.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(5), 10, "click", 2.0),
        Event(3, ts(30), 10, "click", 4.0))
      q.processAllAvailable()
      val got = rows(s.table("sessions"))
      assert(got.exists(r => r(0) == 10L && r(3) == 2L && r(4) == 3.0),
        got.toString)
    } finally q.stop()
  }
}
