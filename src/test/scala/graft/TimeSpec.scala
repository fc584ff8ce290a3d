package graft

import java.nio.file.Files
import java.time.{Instant, LocalDate, LocalDateTime, ZoneId}
import graft.schema.Registry

/** Timezone/time-type tests (reference tests/time_test.py, UTC session
  * pinned). */
class TimeSpec extends SparkSpec {

  val yaml: String =
    """- table: timeseries
      |  columns:
      |    timestamp: timestamp
      |    timestamptz: timestamptz
      |    date: date
      |  key: [timestamp]
      |""".stripMargin

  def tsEnv(): Env = {
    val root = Files.createTempDirectory("graft-ts-").toString
    val env = Env(spark, Registry.fromYaml(yaml), root)
    env.createTables()
    env
  }

  private val bru = ZoneId.of("Europe/Brussels")
  private val naive = LocalDateTime.of(2018, 1, 1, 0, 0, 0)
  private val zoned = LocalDateTime.of(2018, 1, 2, 0, 0, 0).atZone(bru).toInstant
  private val d = LocalDate.of(2018, 1, 3)

  test("native JVM time values round-trip") { // time_test.py:26-37
    val env = tsEnv()
    env.view("timeseries", Seq("timestamp", "timestamptz", "date"))
      .write(Seq(Seq(naive, zoned, d)))
    val row = env.view("timeseries", Seq("timestamp", "timestamptz", "date"))
      .readOne().get
    assert(row.getAs[LocalDateTime](0) == naive)
    assert(row.getAs[java.sql.Timestamp](1).toInstant == zoned)
    assert(row.getAs[java.sql.Date](2).toLocalDate == d)
  }

  test("string formats round-trip, tz-aware offsets honoured") { // time_test.py:40-54
    val env = tsEnv()
    for ((tsFmt, tzFmt) <- Seq(
        ("2018-01-01 00:00:00", "2018-01-02 00:00:00+01:00"),
        ("2018-01-01T00:00:00", "2018-01-02T00:00:00+0100"))) { // python %z form
      env.view("timeseries", Seq("timestamp", "timestamptz", "date"))
        .write(Seq(Seq(tsFmt, tzFmt, "2018-01-03")))
      val row = env.view("timeseries", Seq("timestamp", "timestamptz", "date"))
        .readOne().get
      assert(row.getAs[LocalDateTime](0) == naive)
      assert(row.getAs[java.sql.Timestamp](1).toInstant == zoned)
      assert(row.getAs[java.sql.Date](2).toLocalDate == d)
    }
  }

  test("naive tz strings read as UTC (session pinned)") {
    val env = tsEnv()
    env.view("timeseries", Seq("timestamp", "timestamptz", "date"))
      .write(Seq(Seq("2018-01-01 00:00:00", "2018-01-02 00:00:00", "2018-01-03")))
    val row = env.view("timeseries", Seq("timestamptz")).readOne().get
    assert(row.getAs[java.sql.Timestamp](0).toInstant ==
      LocalDateTime.of(2018, 1, 2, 0, 0).atZone(ZoneId.of("UTC")).toInstant)
  }

  test("timestamp filtering and extraction") {
    val env = tsEnv()
    env.view("timeseries", Seq("timestamp", "date")).write(Seq(
      Seq("2018-01-01 06:00:00", "2018-01-01"),
      Seq("2018-06-15 12:00:00", "2018-06-15")))
    check(Seq(Seq(6)),
      env.view("timeseries", Seq("(extract (hour) timestamp)"))
        .read(Seq("""(< timestamp (cast "2018-02-01" (timestamp)))""")))
  }
}
