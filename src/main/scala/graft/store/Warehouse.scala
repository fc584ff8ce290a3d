package graft.store

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.schema.{ColType, ColumnDef, Registry, TableDef}

/** Parquet-snapshot storage: one dataset per table under a warehouse
  * root, with atomic snapshot swap on write.
  *
  * Replaces the reference's RDBMS backends (tanker/context.py:158-236).
  * Layout per managed table:
  *
  * {{{
  *   <root>/<table>/snap-<n>/   parquet files (immutable once current)
  *   <root>/<table>/_CURRENT    single small file naming the live snap
  * }}}
  *
  * Writers build the next `snap-<n+1>` directory in full, then replace
  * `_CURRENT` — a single-file swap, so readers see either the old or
  * the new snapshot, never a mix. This design survives object stores
  * (no directory rename needed; at 100 TB the pointer would name a
  * manifest of files instead of a directory, same protocol). Matches
  * the reference's per-write transaction boundary
  * (tanker/context.py:238-248); cross-write transactions are out of
  * scope (documented divergence).
  *
  * Tables declared `external` read a driver-provided parquet path
  * directly and are never written.
  */
final class Warehouse(val spark: SparkSession, val root: String, val registry: Registry) {

  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)
  private def tableDir(t: String) = new Path(root, t)
  private def currentFile(t: String) = new Path(tableDir(t), "_CURRENT")

  private def currentSnap(t: String): Option[String] = {
    val f = currentFile(t)
    val fsys = fs(f)
    if (!fsys.exists(f)) None
    else {
      val in = fsys.open(f)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  def exists(t: String): Boolean =
    registry(t).external.isDefined || currentSnap(t).isDefined

  /** Read the live snapshot of a table (schema-correct empty frame if
    * the table has never been written). */
  def read(t: String): DataFrame = {
    val td = registry(t)
    td.external match {
      case Some(path) => alignExternal(td, spark.read.parquet(path))
      case None =>
        currentSnap(t) match {
          case Some(snap) =>
            spark.read.schema(td.sparkSchema)
              .parquet(new Path(tableDir(t), snap).toString)
          case None => empty(td)
        }
    }
  }

  /** External files keep their own schema, with one repair: columns a
    * registry declares as timestamps but the file stores as INT64
    * nanos (read via nanosAsLong) are converted — `div 1000` keeps
    * exact micros, no double rounding. */
  private def alignExternal(td: TableDef, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val needsFix = df.schema.fields.exists(f => f.dataType == LongType &&
      td.columnMap.get(f.name).exists(c =>
        c.ctype.spark.exists(t => t == TimestampNTZType || t == TimestampType)))
    if (!needsFix) df
    else df.select(df.schema.fields.map { f =>
      val declared = td.columnMap.get(f.name).flatMap(_.ctype.spark)
      (f.dataType, declared) match {
        case (LongType, Some(t @ (TimestampNTZType | TimestampType))) =>
          expr(s"timestamp_micros(`${f.name}` div 1000)").cast(t).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }.toSeq: _*)
  }

  def empty(td: TableDef): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], td.sparkSchema)

  /** Atomically replace a table's contents with `df`. */
  def write(t: String, df: DataFrame): Unit = {
    val td = registry(t)
    require(td.external.isEmpty, s"Table '$t' is external (read-only)")
    val next = "snap-" + (currentSnap(t) match {
      case Some(s) => s.stripPrefix("snap-").toLong + 1
      case None => 0L
    })
    val dir = new Path(tableDir(t), next)
    // Align column order/types with the declared schema.
    val aligned = df.select(td.sparkSchema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType)).toSeq: _*)
    aligned.write.mode("overwrite").parquet(dir.toString)
    swapPointer(t, next)
    gc(t, keep = Set(next))
  }

  private def swapPointer(t: String, snap: String): Unit = {
    val f = currentFile(t)
    val fsys = fs(f)
    val tmp = new Path(tableDir(t), s"_CURRENT.tmp-${System.nanoTime()}")
    val out = fsys.create(tmp, true)
    try out.write(snap.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // HDFS/local rename onto an existing file: delete-then-rename is the
    // portable swap; the tiny race window only exposes old-or-new.
    if (fsys.exists(f)) fsys.delete(f, false)
    if (!fsys.rename(tmp, f))
      throw new java.io.IOException(s"Failed to swap $f")
  }

  /** Drop all but the current (and one prior) snapshot. */
  private def gc(t: String, keep: Set[String]): Unit = {
    val dir = tableDir(t)
    val fsys = fs(dir)
    if (fsys.exists(dir)) {
      val snaps = fsys.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("snap-"))
        .sortBy(_.getName.stripPrefix("snap-").toLong)
      // keep current + most recent predecessor for in-flight readers
      val doomed = snaps.dropRight(2).filterNot(p => keep(p.getName))
      doomed.foreach(p => fsys.delete(p, true))
    }
  }

  /** Create empty snapshots for every managed table that doesn't exist
    * yet — idempotent like the reference's create_tables
    * (tanker/context.py:688-710). Seed `values` are written by
    * [[graft.Env.createTables]] (they may use dotted FK fields). */
  def createTables(): Unit = {
    registry.names.foreach { t =>
      if (registry(t).external.isEmpty && currentSnap(t).isEmpty)
        write(t, empty(registry(t)))
    }
    persistRegistry()
  }

  /** Persist the registry as `<root>/_SCHEMA.yaml` (reference schema
    * format) so a warehouse is self-describing — the introspection
    * path (tanker/context.py:388-569) reads it back without a
    * database catalog. */
  def persistRegistry(): Unit = {
    val f = new Path(root, "_SCHEMA.yaml")
    val fsys = fs(f)
    val out = fsys.create(f, true)
    try out.write(Registry.toYaml(registry).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }
}

object Warehouse {
  /** Rebuild a Registry from a warehouse directory: the persisted
    * `_SCHEMA.yaml` when present (full fidelity), else best-effort
    * from parquet footers (types only; key falls back to `id` —
    * mirrors the reference's unique-index-less fallback,
    * tanker/context.py:309-310). */
  def introspect(spark: SparkSession, root: String): Registry = {
    import org.apache.spark.sql.types._
    val rootPath = new Path(root)
    val fsys = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schemaFile = new Path(rootPath, "_SCHEMA.yaml")
    if (fsys.exists(schemaFile)) {
      val in = fsys.open(schemaFile)
      val text = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8) finally in.close()
      Registry.fromYaml(text)
    } else {
      def colType(dt: DataType): ColType = dt match {
        case LongType => ColType.BigIntT
        case IntegerType => ColType.IntegerT
        case DoubleType | FloatType => ColType.FloatT
        case BooleanType => ColType.BoolT
        case DateType => ColType.DateT
        case TimestampNTZType => ColType.TimestampT
        case TimestampType => ColType.TimestampTzT
        case BinaryType => ColType.ByteaT
        case ArrayType(e, _) => ColType.Arr(colType(e), 1)
        case _ => ColType.VarcharT
      }
      val defs = fsys.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
        .filter(d => fsys.exists(new Path(d, "_CURRENT"))).map { d =>
          val name = d.getName
          val cur = {
            val in = fsys.open(new Path(d, "_CURRENT"))
            try new String(org.apache.commons.io.IOUtils.toByteArray(in),
              StandardCharsets.UTF_8).trim finally in.close()
          }
          val schema = spark.read.parquet(new Path(d, cur).toString).schema
          val cols = schema.fields.map(f => ColumnDef(f.name, colType(f.dataType)))
          TableDef(name, cols.toSeq, key = Seq("id"))
        }
      new Registry(defs.toSeq)
    }
  }
}
