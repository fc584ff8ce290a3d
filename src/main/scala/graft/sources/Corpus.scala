package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Corpus interchange: JSONL and CSV export/import with EXACT type
  * round-trip.
  *
  * JSONL (one JSON object per line, usually gzipped) is the lingua
  * franca of training-data pipelines — every public corpus release
  * (C4, The Pile, RedPajama, FineWeb) ships it — and CSV is what
  * annotation vendors and spreadsheets speak. Spark reads both
  * natively, but a NAIVE round-trip is lossy: schema inference
  * re-derives types from text (longs become doubles, timestamps
  * become strings, a second full pass over 100 TB just to guess),
  * JSON has no binary type, and CSV has no nested types at all.
  *
  * This module makes the round-trip exact and single-pass:
  *
  *  - a **schema sidecar** (`_graft_schema.json`, Spark's own
  *    `StructType.json` format) is written next to the data; import
  *    reads it and hands the reader the real schema — NO inference
  *    pass, so an import plans exactly like a parquet scan (one pass,
  *    filters still prune line-by-line);
  *  - **binary columns** travel as base64 strings (both formats) and
  *    come back as `BinaryType`;
  *  - **nested columns** (arrays/structs/maps) travel natively in
  *    JSONL and as embedded JSON strings in CSV (`to_json` out,
  *    `from_json` with the sidecar's field type back);
  *  - **timestamps** are pinned to a microsecond ISO format on both
  *    sides, so event times survive to the tick.
  *
  * Scale shape: export is one narrow projection + the writer's
  * existing partitioning (`shards > 0` adds exactly one exchange);
  * import is a narrow scan + per-row decode — no shuffle either way.
  * Compression is line-splittable-friendly gzip per FILE (each shard
  * one .gz member), so 1000 shards read with 1000-way parallelism
  * even though gzip itself doesn't split.
  *
  * CSV caveat (documented, inherent to the format): a quoted empty
  * string and SQL NULL are both written as empty fields; import
  * reads them as NULL. JSONL distinguishes them — prefer JSONL for
  * lossless interchange.
  */
object Corpus {

  private val SchemaFile = "_graft_schema.json"
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
  // TIMESTAMP_NTZ columns (parquet written without the UTC flag reads
  // as NTZ since Spark 3.4) format through a SEPARATE option — missing
  // it silently falls back to the millisecond default and quietly
  // drops microseconds
  private val TsNtzFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Literal (backquoted) column reference: a field name containing a
    * dot — legal in corpus schemas, e.g. the CLI's `country.name`
    * projection — must not parse as a struct path. */
  private def colq(name: String): Column = col(s"`$name`")

  private def writeSidecar(spark: SparkSession, dir: String, schema: StructType): Unit = {
    val p = new Path(dir, SchemaFile)
    val out = fs(spark, p).create(p, true)
    try out.write(schema.json.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** The exported schema, or None when the directory has no sidecar
    * (foreign data — import falls back to inference). */
  def sidecarSchema(spark: SparkSession, dir: String): Option[StructType] = {
    val p = new Path(dir, SchemaFile)
    val fsys = fs(spark, p)
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      Some(DataType.fromJson(text).asInstanceOf[StructType])
    }
  }

  // ------------------------------------------------------------- JSONL

  /** Wire type a field travels as in JSONL: binary → base64 string
    * (recursively inside containers), everything else native — except
    * map KEYS, which are always strings on the wire: JSON object keys
    * are strings, so Spark's JSON writer stringifies every key and the
    * reader only materializes string keys. Declaring the original key
    * type here would silently null the column on import; instead the
    * wire schema says string and [[decodeBinary]] casts keys back.
    * Container-typed keys (array/map/struct) have no castable string
    * form and are rejected loudly at export. */
  private def jsonWireType(dt: DataType): DataType = dt match {
    case BinaryType => StringType
    case ArrayType(e, n) => ArrayType(jsonWireType(e), n)
    case MapType(k, v, n) =>
      require(!(k.isInstanceOf[ArrayType] || k.isInstanceOf[MapType] ||
          k.isInstanceOf[StructType]),
        s"map keys of type ${k.simpleString} cannot round-trip through " +
          "JSON (keys travel as strings; only atomic keys cast back)")
      MapType(StringType, jsonWireType(v), n)
    case StructType(fields) =>
      StructType(fields.map(f => f.copy(dataType = jsonWireType(f.dataType))))
    case other => other
  }

  private def containsBinary(dt: DataType): Boolean = dt match {
    case BinaryType => true
    case ArrayType(e, _) => containsBinary(e)
    case MapType(k, v, _) => containsBinary(k) || containsBinary(v)
    case StructType(fields) => fields.exists(f => containsBinary(f.dataType))
    case _ => false
  }

  /** Does decoding the wire form of `dt` require any work — a binary
    * leaf to un-base64, or a map whose keys travel as strings and
    * must cast back? */
  private def needsDecode(dt: DataType): Boolean = dt match {
    case BinaryType => true
    case ArrayType(e, _) => needsDecode(e)
    case MapType(k, v, _) => k != StringType || needsDecode(v)
    case StructType(fields) => fields.exists(f => needsDecode(f.dataType))
    case _ => false
  }

  /** base64-encode every binary leaf of a column (recursively via
    * HOFs — stays inside codegen, no UDF). */
  private def encodeBinary(c: Column, dt: DataType): Column = dt match {
    case BinaryType => base64(c)
    case ArrayType(e, _) if containsBinary(e) =>
      transform(c, x => encodeBinary(x, e))
    case MapType(k, v, _) if containsBinary(dt) =>
      map_from_arrays(transform(map_keys(c), x => encodeBinary(x, k)),
        transform(map_values(c), x => encodeBinary(x, v)))
    case StructType(fields) if containsBinary(dt) =>
      struct(fields.map(f =>
        encodeBinary(c.getField(f.name), f.dataType).as(f.name)): _*)
    case _ => c
  }

  /** Inverse of [[encodeBinary]]: wire column (per [[jsonWireType]])
    * back to the declared type — un-base64 binary leaves AND cast map
    * keys from their string wire form back to the declared key type. */
  private def decodeBinary(c: Column, dt: DataType): Column = dt match {
    case BinaryType => unbase64(c)
    case ArrayType(e, _) if needsDecode(e) =>
      transform(c, x => decodeBinary(x, e))
    case MapType(k, v, _) if needsDecode(dt) =>
      map_from_arrays(
        transform(map_keys(c), x => k match {
          case BinaryType => unbase64(x)
          case StringType => x
          case other => x.cast(other)
        }),
        transform(map_values(c), x => decodeBinary(x, v)))
    case StructType(fields) if needsDecode(dt) =>
      struct(fields.map(f =>
        decodeBinary(c.getField(f.name), f.dataType).as(f.name)): _*)
    case _ => c
  }

  /** Export as JSONL shards + schema sidecar. `shards > 0` fixes the
    * output file count (one exchange); 0 keeps the frame's current
    * partitioning (no exchange at all). */
  def exportJsonl(df: DataFrame, dir: String, shards: Int = 0,
      compression: String = "gzip"): Unit = {
    jsonWireType(df.schema): Unit // validate (container map keys) BEFORE writing
    val out = if (shards > 0) df.repartition(shards) else df
    val encoded = out.select(out.schema.fields.map(f =>
      encodeBinary(colq(f.name), f.dataType).as(f.name)): _*)
    encoded.write.mode("overwrite")
      .option("compression", compression)
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .option("ignoreNullFields", "false") // explicit nulls: a reader
      .json(dir)                           // without the sidecar still
                                           // sees every column
    writeSidecar(df.sparkSession, dir, df.schema)
  }

  /** Import JSONL written by [[exportJsonl]] (exact schema, no
    * inference pass) or foreign JSONL (falls back to Spark's
    * inference — explicitly the slow path, it reads the data twice). */
  def importJsonl(spark: SparkSession, dir: String): DataFrame =
    sidecarSchema(spark, dir) match {
      case Some(schema) =>
        val wire = spark.read
          .schema(jsonWireType(schema).asInstanceOf[StructType])
          .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
          .json(dir)
        wire.select(schema.fields.map(f =>
          decodeBinary(colq(f.name), f.dataType).as(f.name)): _*)
      case None =>
        spark.read.option("timestampFormat", TsFormat)
          .option("timestampNTZFormat", TsNtzFormat).json(dir)
    }

  /** STREAMING JSONL source over an export directory: shards dropped
    * into `dir` arrive as micro-batches (the hand-off pattern between
    * a crawler that appends .jsonl.gz shards and a Spark ingest that
    * merges them into the warehouse — compose with the streaming merge
    * sinks in [[graft.streaming.EventStream]]). The sidecar is
    * REQUIRED: a stream cannot run an inference pass, and a guessed
    * schema that hardened on the first shard would silently null out
    * columns later shards introduce. */
  def streamJsonl(spark: SparkSession, dir: String): DataFrame =
    sidecarSchema(spark, dir) match {
      case Some(schema) =>
        val wire = spark.readStream
          .schema(jsonWireType(schema).asInstanceOf[StructType])
          .option("timestampFormat", TsFormat)
          .option("timestampNTZFormat", TsNtzFormat)
          .json(dir)
        wire.select(schema.fields.map(f =>
          decodeBinary(colq(f.name), f.dataType).as(f.name)): _*)
      case None => throw new IllegalArgumentException(
        s"$dir has no $SchemaFile — streaming JSONL import requires the " +
        "schema sidecar (a stream cannot infer)")
    }

  // --------------------------------------------------------------- CSV

  /** Wire form of a field in CSV: binary → base64, nested → embedded
    * JSON string, scalars native. */
  private def csvEncode(c: Column, dt: DataType): Column = dt match {
    case BinaryType => base64(c)
    case _: ArrayType | _: MapType | _: StructType =>
      // binary inside a container base64-es first, then the container
      // embeds as a JSON string
      to_json(encodeBinary(c, dt))
    case _ => c
  }

  private def csvDecode(c: Column, dt: DataType): Column = dt match {
    case BinaryType => unbase64(c)
    case _: ArrayType | _: MapType | _: StructType =>
      decodeBinary(from_json(c, jsonWireType(dt)), dt)
    case _ => c
  }

  /** Export as CSV shards (header on, standard quoting/escaping) +
    * schema sidecar recording the REAL types, nested columns as
    * embedded JSON. */
  def exportCsv(df: DataFrame, dir: String, shards: Int = 0,
      compression: String = "gzip"): Unit = {
    jsonWireType(df.schema): Unit // validate (container map keys) BEFORE writing
    val out = if (shards > 0) df.repartition(shards) else df
    val encoded = out.select(out.schema.fields.map(f =>
      csvEncode(colq(f.name), f.dataType).as(f.name)): _*)
    encoded.write.mode("overwrite")
      .option("header", "true")
      .option("compression", compression)
      .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
      .csv(dir)
    writeSidecar(df.sparkSession, dir, df.schema)
  }

  /** Import CSV written by [[exportCsv]]: the sidecar restores exact
    * types (no inference); foreign CSV falls back to header +
    * inference. */
  def importCsv(spark: SparkSession, dir: String): DataFrame =
    sidecarSchema(spark, dir) match {
      case Some(schema) =>
        val wireSchema = StructType(schema.fields.map { f =>
          f.copy(dataType = f.dataType match {
            case BinaryType => StringType
            case _: ArrayType | _: MapType | _: StructType => StringType
            case other => other
          })
        })
        val wire = spark.read
          .schema(wireSchema)
          .option("header", "true")
          // quoted embedded newlines are legal CSV; parsing them needs
          // whole-file records. Costs nothing here: the shards are
          // gzipped, so a file is one task with or without multiLine —
          // parallelism comes from the shard COUNT either way
          .option("multiLine", "true")
          .option("timestampFormat", TsFormat)
      .option("timestampNTZFormat", TsNtzFormat)
          .csv(dir)
        wire.select(schema.fields.map(f =>
          csvDecode(colq(f.name), f.dataType).as(f.name)): _*)
      case None =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .csv(dir)
    }
}
