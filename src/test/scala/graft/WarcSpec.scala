package graft

import org.apache.spark.sql.functions._
import graft.sources.Warc
import java.nio.charset.StandardCharsets.UTF_8

/** WARC crawl-archive source: record framing, HTTP block split,
  * per-record gzip members, payload-cap truncation that never
  * misaligns, torn-tail tolerance, and the write → read round-trip. */
class WarcSpec extends SparkSpec {

  private lazy val s = spark
  import scala.jdk.CollectionConverters._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-warc-$name-")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** A hand-framed WARC record (exact ISO 28500 layout, no helpers
    * from the code under test). */
  private def rec(wtype: String, uri: String, block: Array[Byte],
      http: Boolean = true, date: String = "2026-02-03T04:05:06Z"): Array[Byte] = {
    val ct = if (http) "application/http; msgtype=response"
      else "application/warc-fields"
    val uriH = if (uri == null) "" else s"WARC-Target-URI: $uri\r\n"
    (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" + uriH +
      s"WARC-Record-ID: <urn:uuid:0-$wtype>\r\nWARC-Date: $date\r\n" +
      s"Content-Type: $ct\r\nContent-Length: ${block.length}\r\n\r\n")
      .getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpBlock(body: String,
      ctype: String = "text/html; charset=utf-8"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n").getBytes(UTF_8) ++
      body.getBytes(UTF_8)

  test("framing: warcinfo skipped, response parsed, uncompressed .warc") {
    val dir = tmp("frame")
    val bytes = rec("warcinfo", null,
        "software: test\r\n".getBytes(UTF_8), http = false) ++
      rec("response", "http://a.example/x", httpBlock("hello world")) ++
      rec("request", "http://a.example/x",
        "GET /x HTTP/1.1\r\n\r\n".getBytes(UTF_8), http = false) ++
      rec("response", "http://a.example/y", httpBlock("second doc", "text/plain"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-0.warc"), bytes)

    val rows = Warc.read(s, dir).orderBy("target_uri").collect()
    assert(rows.length == 2, rows.toSeq)
    val a = rows(0)
    assert(a.getString(0) == "http://a.example/x" && a.getString(1) == "response")
    assert(a.getInt(4) == 200 &&
      a.getString(5) == "text/html; charset=utf-8", a)
    assert(new String(a.getAs[Array[Byte]](6), UTF_8) == "hello world")
    assert(!a.getBoolean(8))
    assert(a.getTimestamp(3) == java.sql.Timestamp.from(
      java.time.Instant.parse("2026-02-03T04:05:06Z")))
    assert(new String(rows(1).getAs[Array[Byte]](6), UTF_8) == "second doc")
    // keep-all mode sees every record type
    val all = Warc.read(s, dir, warcTypes = Nil).collect()
    assert(all.map(_.getString(1)).sorted.toSeq ==
      Seq("request", "response", "response", "warcinfo"))
    // non-http block: whole block is the payload, http fields null
    val req = all.find(_.getString(1) == "request").get
    assert(req.isNullAt(4) && req.isNullAt(5) &&
      new String(req.getAs[Array[Byte]](6), UTF_8).startsWith("GET /x"))
  }

  test("payload cap truncates without misaligning the next record") {
    val dir = tmp("cap")
    val big = "x" * 5000
    val bytes = rec("response", "http://b.example/big", httpBlock(big)) ++
      rec("response", "http://b.example/after", httpBlock("small"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-0.warc"), bytes)
    val rows = Warc.read(s, dir, maxPayload = 1000)
      .orderBy("target_uri").collect()
    assert(rows.length == 2, rows.toSeq)
    val after = rows(0); val bigR = rows(1)
    assert(bigR.getString(0) == "http://b.example/big" && bigR.getBoolean(8))
    // capped block still splits: the stored prefix is the HTTP head +
    // the first body bytes
    assert(new String(bigR.getAs[Array[Byte]](6), UTF_8).startsWith("xxx"))
    assert(bigR.getLong(7) > 5000) // full block length reported
    assert(after.getString(0) == "http://b.example/after" &&
      !after.getBoolean(8) &&
      new String(after.getAs[Array[Byte]](6), UTF_8) == "small")
  }

  test("torn tail: records before the tear survive, no throw") {
    val dir = tmp("torn")
    val whole = rec("response", "http://c.example/ok", httpBlock("kept"))
    val torn = rec("response", "http://c.example/torn",
      httpBlock("this one is cut")).dropRight(12)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-0.warc"),
      whole ++ torn)
    val rows = Warc.read(s, dir).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "http://c.example/ok")
    // header-only garbage file parses to zero rows, also no throw
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-1.warc"),
      "WARC/1.0\r\nWARC-Type: response\r\n".getBytes(UTF_8))
    assert(Warc.read(s, dir).collect().length == 1)
  }

  test("write -> read round-trip: gzip members, warcinfo first, exact text") {
    val dir = tmp("rt")
    val df = s.createDataFrame(Seq(
      org.apache.spark.sql.Row("http://d.example/1", "alpha doc\nline two"),
      org.apache.spark.sql.Row("http://d.example/2", "bravo é中 doc"),
      org.apache.spark.sql.Row("http://d.example/3", "")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    Warc.write(df.select(col("url"), encode(col("text"), "UTF-8").as("p")),
      dir, "url", "p", shards = 2)
    val back = Warc.read(s, dir)
      .select(col("target_uri"), decode(col("payload"), "UTF-8").as("text"),
        col("http_status"))
      .orderBy("target_uri").collect()
    assert(back.length == 3, back.toSeq)
    assert(back.map(_.getString(1)).toSeq ==
      Seq("alpha doc\nline two", "bravo é中 doc", ""))
    assert(back.forall(_.getInt(2) == 200))
    // warcinfo records exist on disk (one per shard) but are filtered
    val infos = Warc.read(s, dir, warcTypes = Seq("warcinfo")).collect()
    assert(infos.length == 2 && infos.forall(_.isNullAt(0)))
    // deterministic ids: re-export produces byte-identical records
    val id1 = Warc.read(s, dir).filter(col("target_uri") ===
      "http://d.example/1").head().getString(2)
    assert(id1.startsWith("<urn:uuid:") && id1.endsWith(">"))
  }

  test("foreign layout: one gzip member over the whole multi-record file") {
    // some tools gzip the concatenated records as a single member
    // instead of one member per record — the reader must not care
    val dir = tmp("onegz")
    val bytes = rec("response", "http://g.example/1", httpBlock("first")) ++
      rec("response", "http://g.example/2", httpBlock("second"))
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.close()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-0.warc.gz"),
      out.toByteArray)
    val rows = Warc.read(s, dir).orderBy("target_uri").collect()
    assert(rows.length == 2)
    assert(rows.map(r => new String(r.getAs[Array[Byte]](6), UTF_8)).toSeq ==
      Seq("first", "second"))
  }

  test("WET conversion records: bare text blocks round-trip") {
    val dir = tmp("wet")
    val df = s.createDataFrame(Seq(
      org.apache.spark.sql.Row("http://w.example/1", "extracted one"),
      org.apache.spark.sql.Row("http://w.example/2", "extracted two")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    Warc.write(df.select(col("url"), encode(col("text"), "UTF-8").as("p")),
      dir, "url", "p", shards = 1, wet = true)
    // conversion records: no HTTP wrapper, http fields null, the
    // block IS the payload; the default response filter skips them
    assert(Warc.read(s, dir).collect().isEmpty)
    val back = Warc.read(s, dir, warcTypes = Seq("conversion"))
      .orderBy("target_uri").collect()
    assert(back.length == 2)
    assert(back.forall(r => r.isNullAt(4) && r.isNullAt(5)))
    assert(back.map(r => new String(r.getAs[Array[Byte]](6), UTF_8)).toSeq ==
      Seq("extracted one", "extracted two"))
  }

  test("scale shape: one streaming task per segment file, stable order") {
    val dir = tmp("shape")
    for (i <- 0 until 3)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"seg-$i%02d.warc"),
        rec("response", s"http://s.example/$i", httpBlock(s"doc $i")))
    val df = Warc.read(s, dir)
    // gzip doesn't split: parallelism = segment count, one task each
    assert(df.rdd.getNumPartitions == 3)
    // all three decode; per-file ordering is the on-disk record order
    assert(df.select("target_uri").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("http://s.example/0", "http://s.example/1", "http://s.example/2"))
    // segments one level down (the crawl-release layout) are found too
    val sub = java.nio.file.Paths.get(dir, "segments")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("seg-99.warc"),
      rec("response", "http://s.example/nested", httpBlock("deep")))
    assert(Warc.read(s, dir).count() == 4)
  }

  test("sloppy \\n\\n http split and statusless block degrade gracefully") {
    val dir = tmp("sloppy")
    val lf = ("HTTP/1.1 404 Not Found\nContent-Type: text/plain\n\n" +
      "gone").getBytes(UTF_8)
    val noStatus = "just bytes, not http".getBytes(UTF_8)
    val bytes = rec("response", "http://e.example/lf", lf) ++
      rec("response", "http://e.example/raw", noStatus)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "seg-0.warc"), bytes)
    val rows = Warc.read(s, dir).orderBy("target_uri").collect()
    val lfR = rows(0); val rawR = rows(1)
    assert(lfR.getInt(4) == 404 && lfR.getString(5) == "text/plain" &&
      new String(lfR.getAs[Array[Byte]](6), UTF_8) == "gone")
    // declared application/http but no HTTP/ prefix: whole block kept
    assert(rawR.isNullAt(4) &&
      new String(rawR.getAs[Array[Byte]](6), UTF_8) == "just bytes, not http")
  }
}
