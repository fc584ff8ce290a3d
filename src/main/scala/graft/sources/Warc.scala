package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.Path
import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException,
  InputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.GZIPInputStream

/** WARC (ISO 28500) source/sink — the wire format of web-crawl
  * corpora (Common Crawl, web archives), the raw input of most
  * LLM pretraining pipelines.
  *
  * A WARC file is a sequence of records: a `WARC/1.x` version line,
  * `Name: value` headers (notably `WARC-Type`, `WARC-Target-URI`,
  * `WARC-Date`, `Content-Length`), a blank line, `Content-Length`
  * bytes of block, then a blank-line separator. For `response`
  * records the block is a full HTTP response (status line + headers
  * + body); the body is the document payload a pipeline wants.
  * Crawl releases ship `.warc.gz` with EACH RECORD ITS OWN GZIP
  * MEMBER, so a reader can skip to any member boundary —
  * `GZIPInputStream` decodes concatenated members transparently.
  *
  * Scale shape (the same one production crawl readers use): gzip
  * does not split, so parallelism = file count — crawl releases are
  * shipped as thousands of ~1 GB segments for exactly this reason.
  * `read` parallelizes the FILE LIST (one task per file, stable
  * order) and each task STREAMS its file — records decode one at a
  * time through a bounded buffer, the whole file is never in memory,
  * and payloads over `maxPayload` are truncated (flagged, never
  * misaligned: the tail is skipped byte-exact so the next record
  * still frames). Filters on url/type/status pushed onto the
  * resulting DataFrame prune per record; the decode itself is the
  * unavoidable sequential scan gzip imposes.
  *
  * Reference: the corpus-interchange surface this extends is
  * `sources/Corpus.scala` (JSONL/CSV); the reference engine has no
  * crawl-format reader — this is a Spark-first extension.
  */
object Warc {

  /** One row per WARC record. `http_*` fields are null for
    * non-response records (warcinfo, request, metadata) and for
    * response blocks that are not `application/http`. */
  val schema: StructType = StructType(Seq(
    StructField("target_uri", StringType),
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", TimestampType),
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType),
    StructField("block_length", LongType), // full WARC block (pre-cap)
    StructField("truncated", BooleanType),
    StructField("source_file", StringType)))

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A line terminated by \n with the \r stripped, read byte-wise so
    * the stream position stays exact for the following binary block.
    * None at clean EOF; a torn final line (no terminator) returns
    * what's there. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(96)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
    val b = buf.toByteArray
    val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
    Some(new String(b, 0, n, UTF_8))
  }

  private def readHeaders(in: InputStream): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var line = readLine(in)
    while (line.exists(_.nonEmpty)) {
      val l = line.get
      val i = l.indexOf(':')
      if (i > 0) m += l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
      line = readLine(in)
    }
    m.result()
  }

  /** Exactly n bytes into a capped buffer; bytes past `cap` are
    * consumed (framing!) but not stored. EOFException on a torn
    * block. */
  private def readBlock(in: InputStream, n: Long, cap: Int): (Array[Byte], Boolean) = {
    val keep = math.min(n, cap.toLong).toInt
    val out = new Array[Byte](keep)
    var got = 0
    while (got < keep) {
      val r = in.read(out, got, keep - got)
      if (r < 0) throw new EOFException(s"torn WARC block: $got of $n bytes")
      got += r
    }
    var toSkip = n - keep
    while (toSkip > 0) {
      val r = in.skip(toSkip)
      if (r <= 0) {
        if (in.read() < 0) throw new EOFException("torn WARC block tail")
        toSkip -= 1
      } else toSkip -= r
    }
    (out, n > cap)
  }

  private def parseDate(s: String): java.sql.Timestamp =
    try java.sql.Timestamp.from(java.time.Instant.parse(s))
    catch { case _: Exception => null }

  /** Split an `application/http` block into (status, content-type,
    * body). A block that doesn't open with `HTTP/` yields the whole
    * block as the payload with null http fields. */
  private def parseHttp(block: Array[Byte]): (Integer, String, Array[Byte]) = {
    if (block.length < 5 ||
        new String(block, 0, 5, US_ASCII) != "HTTP/")
      return (null, null, block)
    // header/body split: first \r\n\r\n (or \n\n from sloppy writers)
    var i = 0; var split = -1; var skip = 0
    while (i < block.length - 1 && split < 0) {
      if (block(i) == '\n' &&
          (block(i + 1) == '\n' ||
            (block(i + 1) == '\r' && i + 2 < block.length && block(i + 2) == '\n'))) {
        split = i + 1; skip = if (block(i + 1) == '\n') 1 else 2
      }
      i += 1
    }
    if (split < 0) return (null, null, block)
    val head = new String(block, 0, split, UTF_8)
    val lines = head.split("\r?\n")
    val status: Integer = lines.head.split(" ") match {
      case parts if parts.length >= 2 && parts(1).forall(_.isDigit) =>
        Int.box(parts(1).toInt)
      case _ => null
    }
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    (status, ctype, java.util.Arrays.copyOfRange(block, split + skip, block.length))
  }

  /** All records of one stream; a torn tail ends the iteration with
    * the records already framed (crawl files are truncated in the
    * wild — a reader that throws loses the whole segment). */
  private def records(in: InputStream, file: String, cap: Int): Iterator[Row] =
    new Iterator[Row] {
      private var nextRow: Row = null
      private var done = false
      private def advance(): Unit = {
        try {
          var line = readLine(in)
          while (line.isDefined && !line.get.startsWith("WARC/")) line = readLine(in)
          if (line.isEmpty) { done = true; return }
          val h = readHeaders(in)
          val len = h.get("content-length").map(_.toLong).getOrElse(
            throw new EOFException("record without Content-Length"))
          val (block, truncated) = readBlock(in, len, cap)
          val wtype = h.getOrElse("warc-type", null)
          val isHttp = h.get("content-type").exists(_.startsWith("application/http"))
          val (status, ctype, payload) =
            if (isHttp) parseHttp(block) else (null: Integer, null, block)
          nextRow = Row(h.getOrElse("warc-target-uri", null), wtype,
            h.getOrElse("warc-record-id", null),
            h.get("warc-date").map(parseDate).orNull,
            status, ctype, payload, Long.box(len), Boolean.box(truncated), file)
        } catch { case _: EOFException | _: NumberFormatException => done = true }
      }
      def hasNext: Boolean = {
        if (nextRow == null && !done) advance()
        nextRow != null
      }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }

  /** Read every `*.warc` / `*.warc.gz` under `dir` (sorted for a
    * deterministic task order), one streaming task per file.
    * `warcTypes` pre-filters record types executor-side (default:
    * `response`, the payload-bearing kind); empty keeps all. */
  /** The Hadoop conf as a serializable key/value Vector (the
    * Configuration object itself is not serializable) — same
    * discipline as the warehouse's executor-parallel copy. */
  private def confKv(spark: SparkSession): Vector[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toVector
  }

  private def rebuild(kv: Vector[(String, String)]) = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    kv.foreach { case (k, v) => c.set(k, v) }
    c
  }

  def read(spark: SparkSession, dir: String, maxPayload: Int = 4 << 20,
      warcTypes: Seq[String] = Seq("response")): DataFrame = {
    val root = new Path(dir)
    val fsys = fs(spark, root)
    // crawl releases nest segments one level down (crawl/segments/...);
    // a bounded two-level walk covers both layouts without the
    // listFiles(recursive) per-file-RPC trap
    def isWarc(n: String) = n.endsWith(".warc") || n.endsWith(".warc.gz")
    val top = fsys.listStatus(root).toSeq
    val files = (top.filter(s => s.isFile && isWarc(s.getPath.getName)) ++
      top.filter(_.isDirectory).flatMap(d =>
        fsys.listStatus(d.getPath).toSeq
          .filter(s => s.isFile && isWarc(s.getPath.getName))))
      .map(_.getPath.toString).sorted
    val kv = confKv(spark)
    val types = warcTypes.toSet
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val p = new Path(f)
        val raw = p.getFileSystem(rebuild(kv)).open(p)
        val in: InputStream =
          if (f.endsWith(".gz")) new GZIPInputStream(new BufferedInputStream(raw))
          else new BufferedInputStream(raw)
        val base = records(in, f, maxPayload)
        // close deterministically once the walk ends (drained or torn)
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            val h = base.hasNext
            if (!h && !closed) { closed = true; in.close() }
            h
          }
          def next(): Row = base.next()
        }.filter(r => types.isEmpty || types(r.getString(1)))
      }
    spark.createDataFrame(rdd, schema)
  }

  private def uuidOf(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8))
    val bb = java.nio.ByteBuffer.wrap(d)
    s"<urn:uuid:${new java.util.UUID(bb.getLong, bb.getLong)}>"
  }

  /** Export (url, payload) rows as WARC records — the inverse fixture
    * path, and the hand-off format for tools that only speak crawl
    * archives. One `.warc.gz` per shard, a `warcinfo` header record
    * first, then one gzip MEMBER PER RECORD (the crawl-release
    * convention). Record ids are deterministic (MD5-derived UUID of
    * the url) so exports are reproducible.
    *
    * `wet = false` (default) writes `response` records wrapping the
    * payload in an HTTP response (a .warc archive); `wet = true`
    * writes WET-style `conversion` records — bare text/plain blocks,
    * the extracted-text sibling every CCNet-shaped pipeline consumes
    * (read back with `warcTypes = Seq("conversion")`). */
  def write(df: DataFrame, dir: String, urlCol: String, payloadCol: String,
      shards: Int = 1, date: String = "2026-01-01T00:00:00Z",
      wet: Boolean = false): Unit = {
    val spark = df.sparkSession
    val root = new Path(dir)
    val dfs = fs(spark, root)
    dfs.mkdirs(root)
    val kv = confKv(spark)
    val dirStr = root.toString
    df.select(col(urlCol).cast("string").as("url"),
        col(payloadCol).cast("binary").as("payload"))
      .repartition(math.max(1, shards))
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val p = new Path(dirStr, f"part-$pid%05d.warc.gz")
        val out = p.getFileSystem(rebuild(kv)).create(p, true)
        // one gzip member per record, but ONE reused Deflater per
        // task: GZIPOutputStream allocates a native zlib stream per
        // instance, and a shard writes tens of thousands of members —
        // hand-framed header/trailer around a reset deflater keeps
        // the member layout byte-compatible with GZIPInputStream
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        val crc = new java.util.zip.CRC32()
        val dbuf = new Array[Byte](8192)
        def le32(v: Long): Unit = {
          out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
          out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
        }
        def member(bytes: Array[Byte]): Unit = {
          out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
            0xff.toByte)) // magic, deflate, no flags/mtime, OS unknown
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          while (!deflater.finished()) {
            val n = deflater.deflate(dbuf)
            if (n > 0) out.write(dbuf, 0, n)
          }
          crc.reset(); crc.update(bytes)
          le32(crc.getValue)                      // member CRC32
          le32(bytes.length.toLong & 0xFFFFFFFFL) // ISIZE mod 2^32
        }
        def rec(headers: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
          val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
            .mkString("", "\r\n", "\r\n\r\n")
          head.getBytes(UTF_8) ++ block ++ "\r\n\r\n".getBytes(US_ASCII)
        }
        try {
          val info = "software: graft\r\nformat: WARC File Format 1.0\r\n"
            .getBytes(UTF_8)
          member(rec(Seq("WARC-Type" -> "warcinfo",
            "WARC-Record-ID" -> uuidOf(s"warcinfo-$pid"),
            "WARC-Date" -> date,
            "Content-Type" -> "application/warc-fields",
            "Content-Length" -> info.length.toString), info))
          it.foreach { r =>
            val url = r.getString(0)
            val body = Option(r.get(1)).map(_.asInstanceOf[Array[Byte]])
              .getOrElse(Array.emptyByteArray)
            val block =
              if (wet) body
              else (s"HTTP/1.1 200 OK\r\n" +
                "Content-Type: text/plain; charset=utf-8\r\n" +
                s"Content-Length: ${body.length}\r\n\r\n").getBytes(US_ASCII) ++
                body
            member(rec(Seq(
              "WARC-Type" -> (if (wet) "conversion" else "response"),
              "WARC-Record-ID" -> uuidOf(url),
              "WARC-Date" -> date,
              "WARC-Target-URI" -> url,
              "Content-Type" ->
                (if (wet) "text/plain" else "application/http; msgtype=response"),
              "Content-Length" -> block.length.toString), block))
          }
        } finally { deflater.end(); out.close() }
      }
  }
}
