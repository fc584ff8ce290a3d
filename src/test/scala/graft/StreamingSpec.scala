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

  test("streaming merge into a managed bucketed table survives restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val yaml =
      """- table: stream_sink
        |  columns:
        |    event_id: bigint
        |    event_type: varchar
        |    value: float
        |  key: [event_id]
        |  buckets: 8
        |""".stripMargin
    val root = java.nio.file.Files.createTempDirectory("graft-ssink-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val env = Env(s, graft.schema.Registry.fromYaml(yaml), root)
    env.createTables()
    val fields = Seq("event_id", "event_type", "value")

    val mem = MemoryStream[Event]
    val q1 = EventStream.mergeInto(mem.toDF(), env, "stream_sink", fields, ckpt).start()
    try {
      mem.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(1), 10, "click", 2.0),
        Event(2, ts(1), 10, "click", 2.5)) // dup key inside one batch
      q1.processAllAvailable()
    } finally q1.stop()
    val after1 = rows(env.view("stream_sink", fields).read())
    assert(after1.size == 2, after1.toString) // dedup-on-key merged

    // restart from the same checkpoint; replay overlapping keys plus a
    // new one — upsert idempotence keeps exactly one row per key
    val q2 = EventStream.mergeInto(mem.toDF(), env, "stream_sink", fields, ckpt).start()
    try {
      mem.addData(
        Event(2, ts(2), 10, "click", 9.0), // overwrites
        Event(3, ts(3), 11, "buy", 5.0))   // inserts
      q2.processAllAvailable()
    } finally q2.stop()
    val got = rows(env.view("stream_sink", fields).read())
      .map(r => r.head -> (r(1), r(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), got.toString)
    assert(got(2L)._2 == 9.0f, got.toString)
    // ids stayed stable for surviving keys across micro-batches
    val ids = rows(env.view("stream_sink", Seq("id", "event_id")).read())
      .map(r => r(1) -> r.head).toMap
    assert(ids.values.toSet.size == 3, ids.toString)
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
