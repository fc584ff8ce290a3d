package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Corpus

/** JSONL/CSV interchange: exact type round-trip via the schema
  * sidecar — binary as base64, nested columns (native in JSONL,
  * embedded JSON in CSV), microsecond timestamps, explicit nulls —
  * plus the no-sidecar inference fallback for foreign data. */
class CorpusSpec extends SparkSpec {

  private lazy val s = spark
  import scala.jdk.CollectionConverters._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-corpus-$name-")
    d.toFile.deleteOnExit()
    d.resolve("data").toString
  }

  private val mixedSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("payload", BinaryType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType),
      StructField("score", DoubleType)))),
    StructField("ts", TimestampType)))

  private def mixedDf = {
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456")
    s.createDataFrame(Seq(
      Row(1L, "hello\nworld \"quoted\", comma", Array[Byte](0, 1, 2, -1),
        Seq(1.5f, -2.25f), Row("en", 0.75), t0),
      Row(2L, "", null, null, Row(null, null), null),
      Row(3L, null, Array[Byte](), Seq.empty[Float], null, t0)).asJava,
      mixedSchema)
  }

  test("JSONL round-trip: binary/nested/timestamp/null fidelity, no inference") {
    val dir = tmp("jsonl")
    Corpus.exportJsonl(mixedDf, dir, shards = 2)
    val back = Corpus.importJsonl(s, dir)
    assert(back.schema == mixedSchema, back.schema.treeString)
    val a = rows(mixedDf.orderBy("id"))
    val b = rows(back.orderBy("id"))
    // binary compares by content (Array[Byte] equality is reference)
    def canon(r: Seq[Any]) = r.map {
      case bs: Array[Byte] => bs.toSeq
      case other => other
    }
    assert(a.map(canon) == b.map(canon), b.toString)
    // the sidecar exists and holds the exact schema
    assert(Corpus.sidecarSchema(s, dir).contains(mixedSchema))
    // shards honored: exactly 2 data files
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(files.size == 2, files.map(_.getName).toString)
    // compressed: gzip members
    assert(files.forall(_.getName.endsWith(".gz")), files.map(_.getName))
  }

  test("CSV round-trip: nested as embedded JSON, quoting, timestamps") {
    val dir = tmp("csv")
    Corpus.exportCsv(mixedDf, dir)
    val back = Corpus.importCsv(s, dir)
    assert(back.schema == mixedSchema, back.schema.treeString)
    val b = rows(back.orderBy("id"))
    // row 1: every field survives (CSV can't tell "" from NULL — the
    // documented caveat — so rows 2/3 only check the non-string cols)
    assert(b(0)(1) == "hello\nworld \"quoted\", comma", b(0))
    assert(b(0)(2).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](0, 1, 2, -1))
    assert(b(0)(3) == Seq(1.5f, -2.25f), b(0))
    assert(b(0)(4) == Row("en", 0.75), b(0))
    assert(b(0)(5) == java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456"))
    assert(b(1)(2) == null && b(1)(3) == null && b(1)(5) == null, b(1))
    assert(b(2)(5) == java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456"))
  }

  test("binary nested inside a map round-trips (base64 through map values)") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("blobs", MapType(StringType, BinaryType))))
    val df = s.createDataFrame(Seq(
      Row(1L, Map("a" -> Array[Byte](1, 2, -3), "b" -> Array[Byte]())),
      Row(2L, null)).asJava, schema)
    val dir = tmp("mapbin")
    Corpus.exportJsonl(df, dir)
    val back = Corpus.importJsonl(s, dir)
    assert(back.schema == schema, back.schema.treeString)
    val b = rows(back.orderBy("id"))
    val m = b(0)(1).asInstanceOf[Map[String, Array[Byte]]]
    assert(m("a").toSeq == Seq[Byte](1, 2, -3) && m("b").isEmpty, b(0))
    assert(b(1)(1) == null, b(1))
  }

  test("non-string map keys round-trip (string on the wire, cast back)") {
    // JSON object keys are strings: Spark's writer stringifies every
    // map key and its reader only materializes string keys, so the
    // wire schema must say string and the decode must cast back —
    // declaring Map<long,_> in the read schema silently nulls the
    // column (the pre-fix behavior)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("counts", MapType(LongType, LongType)),
      StructField("tagged", MapType(IntegerType, BinaryType))))
    val df = s.createDataFrame(Seq(
      Row(1L, Map(7L -> 70L, -2L -> 3L), Map(5 -> Array[Byte](9, -9))),
      Row(2L, Map.empty[Long, Long], null),
      Row(3L, null, Map.empty[Int, Array[Byte]])).asJava, schema)
    val jd = tmp("mapkeyjson")
    Corpus.exportJsonl(df, jd)
    val jBack = Corpus.importJsonl(s, jd)
    assert(jBack.schema == schema, jBack.schema.treeString)
    val jb = rows(jBack.orderBy("id"))
    assert(jb(0)(1) == Map(7L -> 70L, -2L -> 3L), jb(0))
    assert(jb(0)(2).asInstanceOf[Map[Int, Array[Byte]]]
      .apply(5).toSeq == Seq[Byte](9, -9), jb(0))
    assert(jb(1)(1) == Map.empty[Long, Long] && jb(1)(2) == null, jb(1))
    assert(jb(2)(1) == null && jb(2)(2) == Map.empty[Int, Array[Byte]], jb(2))
    val cd = tmp("mapkeycsv")
    Corpus.exportCsv(df, cd)
    val cBack = Corpus.importCsv(s, cd)
    assert(cBack.schema == schema, cBack.schema.treeString)
    val cb = rows(cBack.orderBy("id"))
    assert(cb(0)(1) == Map(7L -> 70L, -2L -> 3L), cb(0))
    assert(cb(0)(2).asInstanceOf[Map[Int, Array[Byte]]]
      .apply(5).toSeq == Seq[Byte](9, -9), cb(0))
    // container-typed keys have no castable string form: loud error
    val badSchema = StructType(Seq(StructField("id", LongType),
      StructField("bad", MapType(ArrayType(LongType), LongType))))
    val bad = s.createDataFrame(Seq(
      Row(1L, Map(Seq(1L) -> 2L))).asJava, badSchema)
    intercept[IllegalArgumentException] {
      Corpus.exportJsonl(bad, tmp("mapkeybad"))
    }
  }

  test("TIMESTAMP_NTZ keeps microseconds in both formats (separate format option)") {
    // parquet written without the UTC flag (pyarrow default) reads as
    // NTZ; its formatter is timestampNTZFormat, NOT timestampFormat —
    // regression: missing it silently truncated micros to millis
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampNTZType)))
    val t = java.time.LocalDateTime.parse("2026-03-01T12:34:56.123456")
    val df = s.createDataFrame(Seq(Row(1L, t)).asJava, schema)
    for ((name, exp, imp) <- Seq(
        ("ntzjson", Corpus.exportJsonl(_: org.apache.spark.sql.DataFrame, _: String, 0, "gzip"),
          Corpus.importJsonl _),
        ("ntzcsv", Corpus.exportCsv(_: org.apache.spark.sql.DataFrame, _: String, 0, "gzip"),
          Corpus.importCsv _))) {
      val dir = tmp(name)
      exp(df, dir)
      val back = imp(s, dir)
      assert(back.schema == schema, back.schema.treeString)
      assert(rows(back) == Seq(Seq(1L, t)), s"$name: ${rows(back)}")
    }
  }

  test("foreign data without a sidecar falls back to inference") {
    val dir = tmp("foreign")
    // hand-written JSONL, no sidecar
    val p = new java.io.File(dir)
    p.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(p, "part-0.jsonl"))
    try { w.println("""{"a": 1, "b": "x"}"""); w.println("""{"a": 2, "b": "y"}""") }
    finally w.close()
    assert(Corpus.sidecarSchema(s, dir).isEmpty)
    val df = Corpus.importJsonl(s, dir)
    assert(rows(df.orderBy("a")) == Seq(Seq(1L, "x"), Seq(2L, "y")))
  }

  test("streaming JSONL source: new shards arrive as micro-batches, sidecar-typed") {
    val dir = tmp("stream")
    Corpus.exportJsonl(mixedDf.select("id", "text"), dir)
    val stream = Corpus.streamJsonl(s, dir)
    assert(stream.isStreaming)
    assert(stream.schema.map(_.name) == Seq("id", "text"))
    val q = stream.writeStream.format("memory").queryName("corpus_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.table("corpus_stream").count() == 3)
      // a NEW shard dropped into the directory lands in the next batch
      val w = new java.io.PrintWriter(new java.io.File(dir, "part-late.json"))
      try w.println("""{"id":99,"text":"late shard"}""") finally w.close()
      q.processAllAvailable()
      val late = rows(s.table("corpus_stream").filter(col("id") === 99))
      assert(late == Seq(Seq(99L, "late shard")), late)
    } finally q.stop()
    // no sidecar -> loud error, not silent inference
    val bare = tmp("stream-bare")
    new java.io.File(bare).mkdirs()
    val e = intercept[IllegalArgumentException](Corpus.streamJsonl(s, bare))
    assert(e.getMessage.contains("sidecar"), e.getMessage)
  }

  test("import plans as a single pass: sidecar schema reaches the scan") {
    val dir = tmp("plan")
    Corpus.exportJsonl(mixedDf.select("id", "text"), dir)
    val back = Corpus.importJsonl(s, dir).filter(col("id") > 1)
    val plan = back.queryExecution.executedPlan.toString
    // the scan carries the declared schema (no inferred _corrupt etc.)
    assert(plan.toLowerCase.contains("json"), plan)
    assert(plan.contains("ReadSchema: struct<id:bigint,text:string>"), plan)
    assert(rows(back.orderBy("id")).map(_.head) == Seq(2L, 3L))
  }
}
