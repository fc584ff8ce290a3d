package graft.store

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, expr, hash, lit, pmod}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import graft.schema.{ColType, ColumnDef, Registry, TableDef}
import graft.view.Json

/** Parquet-snapshot storage: one dataset per table under a warehouse
  * root, with atomic snapshot swap on write.
  *
  * Replaces the reference's RDBMS backends (tanker/context.py:158-236).
  * Layout per managed table:
  *
  * {{{
  *   <root>/_ROOT                       root catalog: table -> pointer
  *   <root>/<table>/snap-<n>/           parquet (immutable once current)
  *   <root>/<table>/snap-<n>/__b=<k>/   key-hash bucket dirs (bucketed)
  *   <root>/<table>/_CURRENT            per-table mirror (see below)
  * }}}
  *
  * Unbucketed `_CURRENT` holds the live snap name. Bucketed tables
  * (`buckets: N` in the schema) hold a JSON manifest instead:
  * `{"snap": ..., "maxId": ..., "buckets": {"3": "snap-7/__b=3", ...}}`
  * — each bucket points at the snapshot that last rewrote it, so a
  * merge touching 2 of 1024 buckets writes 2 directories and reuses
  * the other 1022 by reference. That is the 100-TB merge path: write
  * cost scales with the batch's key footprint, not the table size.
  *
  * Writers build the next `snap-<n+1>` in full, then install its
  * pointer into `_ROOT` — a single-file swap, so readers see either
  * the old or the new state, never a mix (object-store friendly: no
  * directory rename). Matches the reference's per-write transaction
  * boundary, and [[transaction]] gives the cross-write
  * commit/rollback analogue (tanker/context.py:238-248): buffered
  * pointers applied as ONE root swap behind a roll-forward journal —
  * atomic multi-table visibility.
  *
  * Tables declared `external` read a driver-provided parquet path
  * directly and are never written.
  */
final class Warehouse(val spark: SparkSession, val root: String, val registry: Registry) {

  /** One range-cluster of a brin table's snapshot: directory (relative
    * to the table dir) + encoded min/max of the leading key column
    * ([[Brin.encode]]; None = the zone holds only null keys), plus
    * `extra` — min/max of the remaining key columns and the surrogate
    * `id` (postgres BRIN indexes the whole key; in an append-mostly
    * table id correlates with the leading key, so id-bounded reads
    * prune too). */
  final case class Zone(dir: String, lo: Option[Any], hi: Option[Any],
      extra: Map[String, (Option[Any], Option[Any])] = Map())

  /** Bucketed-table manifest: per-bucket pointers + the id high-water
    * mark (so surrogate-id assignment never scans the full table).
    * Brin tables instead carry `zones` — the range-cluster zone map. */
  final case class Manifest(snap: String, maxId: Long, buckets: Map[Int, String],
      zones: Seq[Zone] = Nil, zorder: Seq[String] = Nil)

  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  private def fs(p: Path): FileSystem = p.getFileSystem(hadoopConf)
  private def tableDir(t: String) = new Path(root, t)
  private def currentFile(t: String) = new Path(tableDir(t), "_CURRENT")

  /** Root catalog: ONE file mapping table -> pointer content, swapped
    * atomically on every commit — so a multi-table transaction becomes
    * visible in a single swap and a concurrent reader can never
    * observe a partial commit (the prefix-visibility window the
    * per-table-pointer design had). Per-table `_CURRENT` files remain
    * as MIRRORS: written after each root swap for legacy layouts and
    * catalog-less introspection, never authoritative once `_ROOT`
    * exists. Root read-modify-write is serialized by a JVM-wide
    * per-root lock — correct for any single-driver deployment (all
    * Warehouse writes are driver-coordinated). A SECOND driver
    * process attempting to write the same root is refused loudly by
    * the `_LEASE` writer lease ([[ensureLease]]) instead of losing
    * updates; read-only processes are unaffected. */
  private def rootFile = new Path(root, "_ROOT")
  private def rootLock: Object = Warehouse.lockFor(root)

  /** Parsed root catalog memo, keyed by the `_ROOT` file's
    * (modification time, length) and SHARED per root across every
    * Warehouse instance in this JVM ([[Warehouse.memoFor]]) — a
    * per-instance memo would treat a sibling instance's commit as a
    * foreign swap and could cache stale state. Every table read
    * resolves through [[readRoot]], so at thousands of tables × reads
    * per plan the open + read + YAML parse is pure driver overhead;
    * the memo turns the steady-state cost into ONE getFileStatus
    * call. Same-process commits refresh it under the root lock
    * (marked `exact` — never stale while this process holds the
    * writer lease); a swap by a different process is caught by the
    * status check, and the same-mtime-tick/same-length blind spot is
    * closed by re-reading any non-exact memo held locally for less
    * than [[Warehouse.RootFreshnessMs]] (a colliding foreign swap can
    * only land within one mtime tick of the swap we read; an idle
    * catalog stays memoized). */
  private def rootMemo = Warehouse.memoFor(root)

  /** table -> pointer content from the root catalog; empty when the
    * warehouse predates the catalog (readers then fall back to the
    * per-table mirrors, which ARE authoritative for a legacy layout). */
  private def readRoot(): Map[String, String] = {
    val f = rootFile
    val fsys = fs(f)
    val status =
      try Some(fsys.getFileStatus(f))
      catch { case _: java.io.FileNotFoundException => None }
    status match {
      case None => Map()
      case Some(st) =>
        rootMemo.get() match {
          // freshness keys on the LOCAL time this entry was installed
          // (seen), never the storage-assigned mtime: a foreign swap
          // sharing the memoized mtime tick can only land within one
          // tick granularity of the swap we read, so re-reading until
          // the entry has been held locally for RootFreshnessMs covers
          // it regardless of storage/driver clock skew
          case Some((mt, len, m, exact, seen))
              if mt == st.getModificationTime && len == st.getLen &&
                (exact || System.currentTimeMillis - seen >
                  Warehouse.RootFreshnessMs) => m
          case _ =>
            try {
              val in = fsys.open(f)
              val text = try new String(
                org.apache.commons.io.IOUtils.toByteArray(in),
                StandardCharsets.UTF_8) finally in.close()
              val y = new org.yaml.snakeyaml.Yaml()
                .load[java.util.Map[String, Object]](text)
              val parsed =
                if (y == null) Map[String, String]()
                else y.asScala.map { case (k, v) => k -> v.toString }.toMap
              // a re-read that finds the SAME (mtime, length) keeps the
              // original install time, so the entry ages into
              // servability even under sustained sub-freshness-interval
              // reads (resetting `seen` would re-parse forever)
              val seen0 = rootMemo.get() match {
                case Some((mt0, len0, _, _, s0))
                    if mt0 == st.getModificationTime &&
                      len0 == st.getLen => s0
                case _ => System.currentTimeMillis
              }
              rootMemo.set(Some((st.getModificationTime, st.getLen, parsed,
                false, seen0)))
              parsed
            } catch { case scala.util.control.NonFatal(_) => Map() }
        }
    }
  }

  /** Install `entries` into the root catalog as ONE atomic swap, then
    * refresh the touched `_CURRENT` mirrors. The root swap is the
    * commit point; a crash mid-mirror is healed by the transaction
    * journal replay ([[recoverTransactions]]) or simply ignored
    * (readers resolve through the root first). */
  private def commitPointers(entries: collection.Seq[(String, String)]): Unit =
    rootLock.synchronized {
      val f = rootFile
      val fsys = fs(f)
      ensureLease(fsys)
      val merged = readRoot() ++ entries
      atomicWrite(fsys, f,
        Json.write(merged).getBytes(StandardCharsets.UTF_8))
      // refresh the memo under the lock: same-process readers see the
      // new catalog without re-parsing (and never a stale one)
      try {
        val st = fsys.getFileStatus(f)
        rootMemo.set(Some((st.getModificationTime, st.getLen, merged, true,
          System.currentTimeMillis)))
      } catch { case scala.util.control.NonFatal(_) => rootMemo.set(None) }
      entries.foreach { case (t, content) => writeMirror(t, content) }
    }

  /** Writer lease: `_LEASE` under the root names the ONE process
    * allowed to commit (hostname:pid, heartbeat = the file's mtime).
    * Checked and refreshed at every commit — NOT at construction, so
    * read-only Envs from other processes (`tk read` against a running
    * server) stay legal. A second process attempting a write refuses
    * loudly while the holder's heartbeat is fresh, and may steal a
    * lease older than [[Warehouse.LeaseTtlMs]] (a crashed or exited
    * holder); a merely-idle holder whose lease was stolen refuses at
    * its own next commit instead of silently losing updates. This
    * turns the formerly documented multi-driver `_ROOT`
    * read-modify-write hazard into a loud error. Heartbeat writes are
    * skipped while the lease is younger than TTL/2, so a busy writer
    * adds roughly one tiny write per TTL/2, not per commit. */
  private def ensureLease(fsys: FileSystem): Unit = {
    val f = new Path(root, "_LEASE")
    val me = Warehouse.processId
    def readHolder(): Option[(String, Long)] =
      try {
        val st = fsys.getFileStatus(f)
        val in = fsys.open(f)
        val h = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8).trim finally in.close()
        Some((h, System.currentTimeMillis - st.getModificationTime))
      } catch { case _: java.io.FileNotFoundException => None }
    def refuse(h: String, age: Long): Nothing = throw new IllegalStateException(
      s"warehouse $root is write-leased by process '$h' " +
        s"(heartbeat $age ms ago): a second writer would lose updates. " +
        "Stop the holder, or wait for its lease to expire " +
        s"(ttl ${Warehouse.LeaseTtlMs} ms).")
    // take/steal uses create(overwrite = false) — atomic on local/HDFS
    // semantics — so two processes racing for an absent lease cannot
    // both believe they won: the loser's create throws, it re-reads,
    // and refuses unless the winner was itself
    def take(): Unit = {
      val out =
        try fsys.create(f, false)
        catch {
          case _: java.io.IOException =>
            readHolder() match {
              case Some((h, age)) if h != me => refuse(h, age)
              case _ => fsys.create(f, true) // ours (or vanished): refresh
            }
        }
      try out.write(me.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }
    readHolder() match {
      case Some((h, age)) if h != me && age <= Warehouse.LeaseTtlMs =>
        refuse(h, age)
      case Some((h, age)) if h == me && age <= Warehouse.LeaseTtlMs / 2 =>
        () // ours and fresh — skip the heartbeat write
      case Some((h, _)) if h != me => // stale foreign: steal
        // steal by RENAMING the stale file out of the way: rename is
        // atomic, so of two stealers exactly one succeeds — a plain
        // delete-then-create pair lets B delete A's freshly created
        // lease in the window between A's delete and A's create
        val tomb = new Path(f.getParent,
          s"_LEASE.stale-${System.nanoTime()}-${Thread.currentThread.getId}")
        if (fsys.rename(f, tomb)) { fsys.delete(tomb, false); take() }
        else readHolder() match { // lost the steal race
          case Some((h2, age2)) if h2 != me => refuse(h2, age2)
          case Some(_) => () // we already hold it
          case None => take() // winner vanished between rename and create
        }
      case Some(_) => // ours but aging: heartbeat (we own it — plain write)
        val out = fsys.create(f, true)
        try out.write(me.getBytes(StandardCharsets.UTF_8)) finally out.close()
      case None => take()
    }
  }

  private def writeMirror(t: String, content: String): Unit = {
    val f = currentFile(t)
    atomicWrite(fs(f), f, content.getBytes(StandardCharsets.UTF_8))
  }

  private def readPointer(t: String): Option[String] = {
    // in-txn reads see the buffered (uncommitted) pointer first —
    // read-your-writes inside graft.store.Warehouse.transaction
    val txn = txnLocal.get()
    if ((txn ne null) && txn.contains(t)) return Some(txn(t))
    readRoot().get(t).orElse {
      // legacy layout or table not yet written through the catalog
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
  }

  private def currentSnap(t: String): Option[String] =
    readPointer(t).map { p =>
      if (p.startsWith("{")) parseManifest(p).snap else p
    }

  def currentManifest(t: String): Option[Manifest] =
    readPointer(t).map { p =>
      if (p.startsWith("{")) parseManifest(p)
      else Manifest(p, -1L, Map())
    }

  private def parseManifest(text: String): Manifest = {
    val y = new org.yaml.snakeyaml.Yaml()
    val m = y.load[java.util.Map[String, Object]](text).asScala
    val buckets = m.get("buckets").map(
      _.asInstanceOf[java.util.Map[String, Object]].asScala.map {
        case (k, v) => k.toInt -> v.toString
      }.toMap).getOrElse(Map[Int, String]())
    // yaml numbers load as Integer/Long/Double; normalize to the
    // Brin encoding families (Long | Double | String)
    def bound(v: Object): Option[Any] = Option(v).map {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case d: java.lang.Double => d.doubleValue()
      case other => other.toString
    }
    val zones = m.get("zones").map(
      _.asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
        .map { z =>
          val extra = Option(z.get("cols")).map(
            _.asInstanceOf[java.util.Map[String, java.util.List[Object]]]
              .asScala.map { case (c, lh) =>
                c -> (bound(lh.get(0)), bound(lh.get(1)))
              }.toMap).getOrElse(Map[String, (Option[Any], Option[Any])]())
          Zone(z.get("dir").toString, bound(z.get("lo")), bound(z.get("hi")),
            extra)
        }.toSeq).getOrElse(Nil)
    val zorder = m.get("zorder").map(
      _.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq)
      .getOrElse(Nil)
    Manifest(m("snap").toString, m("maxId").toString.toLong, buckets, zones,
      zorder)
  }

  private def manifestJson(m: Manifest): String =
    Json.write(Map("snap" -> m.snap, "maxId" -> m.maxId,
      "buckets" -> m.buckets.map { case (k, v) => k.toString -> v }) ++
      (if (m.zones.isEmpty) Map() else Map("zones" -> m.zones.map(z =>
        Map("dir" -> z.dir, "lo" -> z.lo.orNull, "hi" -> z.hi.orNull) ++
          (if (z.extra.isEmpty) Map() else Map("cols" -> z.extra.map {
            case (c, (lo, hi)) => c -> Seq(lo.orNull, hi.orNull)
          }))))) ++
      (if (m.zorder.isEmpty) Map() else Map("zorder" -> m.zorder)))

  def exists(t: String): Boolean =
    registry(t).external.isDefined || readPointer(t).isDefined

  /** Key-hash bucket id expression for a bucketed table. */
  def bucketExpr(td: TableDef): Column =
    pmod(hash(td.key.map(k => col("`" + k + "`")): _*), lit(td.buckets))

  /** Read the live snapshot of a table (schema-correct empty frame if
    * the table has never been written). */
  def read(t: String): DataFrame = {
    val td = registry(t)
    td.external match {
      case Some(path) => alignExternal(td, spark.read.parquet(path))
      case None if td.buckets > 0 => readBuckets(t, None)
      case None if td.useIndex.equalsIgnoreCase("brin") => readZones(t, None)
      case None =>
        currentSnap(t) match {
          case Some(snap) =>
            spark.read.schema(td.sparkSchema)
              .parquet(new Path(tableDir(t), snap).toString)
          case None => empty(td)
        }
    }
  }

  /** Pruned read of a bucketed table: only the named buckets (None =
    * all). The merge path reads just the buckets its batch keys hash
    * into. */
  def readBuckets(t: String, which: Option[Set[Int]]): DataFrame = {
    val td = registry(t)
    require(td.buckets > 0, s"Table '$t' is not bucketed")
    currentManifest(t) match {
      case None => empty(td)
      case Some(m) =>
        val entries = which match {
          case Some(bs) => m.buckets.view.filterKeys(bs).toMap
          case None => m.buckets
        }
        if (entries.isEmpty) empty(td)
        else spark.read.schema(td.sparkSchema)
          .parquet(entries.values.map(rel =>
            new Path(tableDir(t), rel).toString).toSeq: _*)
    }
  }

  /** Bucket ids of every combination of the given per-key-column
    * point sets (ordered like `td.key`), evaluated through the SAME
    * [[bucketExpr]] Catalyst expression the writer clusters with —
    * one local one-row-per-combo job, so driver-side arithmetic can
    * never drift from the executor hash. The read-side analogue of
    * the write path's bucket pruning: a point read on a 1024-bucket
    * table opens ONE bucket directory instead of 1024. Callers cap
    * the combination count ([[graft.view.View]] uses 64). */
  def bucketIds(t: String, keyPoints: Seq[Seq[Any]]): Set[Int] = {
    val td = registry(t)
    require(td.buckets > 0, s"Table '$t' is not bucketed")
    require(keyPoints.size == td.key.size,
      s"need one point set per key column (${td.key.size}), got ${keyPoints.size}")
    val combos = keyPoints.foldLeft(Seq(Seq.empty[Any]))((acc, ps) =>
      acc.flatMap(c => ps.map(c :+ _)))
    if (combos.isEmpty || keyPoints.exists(_.isEmpty)) Set.empty
    else {
      val schema = org.apache.spark.sql.types.StructType(td.key.map(k =>
        org.apache.spark.sql.types.StructField(k,
          td.columnMap(k).ctype.spark.getOrElse(
            org.apache.spark.sql.types.StringType), true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(combos.map(Row.fromSeq), 1), schema)
      df.select(bucketExpr(td).cast("int").as("b"))
        .collect().map(_.getInt(0)).toSet
    }
  }

  /** Surrogate-id high-water mark: manifest-tracked (no scan);
    * max-scan only for a legacy plain-string pointer. */
  def maxId(t: String): Long = {
    val td = registry(t)
    currentManifest(t) match {
      case Some(m) if m.maxId >= 0 => m.maxId
      case None => 0L
      case Some(_) => // legacy plain pointer: derive once by scan
        if (!td.columnMap.contains("id")) 0L
        else Option(read(t).agg(org.apache.spark.sql.functions.max(col("id")))
          .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    }
  }

  /** External files keep their own schema, with one repair: columns a
    * registry declares as timestamps but the file stores as INT64
    * nanos (read via nanosAsLong) are converted — `div 1000` keeps
    * exact micros, no double rounding. */
  private def alignExternal(td: TableDef, df: DataFrame): DataFrame = {
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

  private def nextSnapName(t: String): String =
    "snap-" + (currentSnap(t) match {
      case Some(s) => s.stripPrefix("snap-").toLong + 1
      case None => 0L
    })

  private def aligned(td: TableDef, df: DataFrame): DataFrame =
    df.select(td.sparkSchema.fields.map(f =>
      col("`" + f.name + "`").cast(f.dataType)).toSeq: _*)

  /** Atomically replace a table's contents with `df` (all buckets for
    * bucketed tables). `knownMaxId` lets a caller that already knows
    * the post-write max(id) (the merge path: old max + insert count)
    * skip the read-back; otherwise the id column of the just-written
    * snapshot is re-read (column-pruned, fresh files — cheap, and
    * never the pre-existing table). */
  /** DataFrameWriter for a table's snapshot files, carrying the
    * table's STORAGE properties: `compression:` picks the parquet
    * codec (zstd buys ~25-35% over snappy on text corpora — at 100 TB
    * that is disk AND network), `bloom: true` writes parquet bloom
    * filters on the key columns so point reads skip row groups INSIDE
    * the files that bucket/zone dir pruning already selected. Both
    * ride the standard parquet write options — no custom writer. */
  private def snapWriter(td: TableDef, df: DataFrame)
      : org.apache.spark.sql.DataFrameWriter[Row] = {
    var w = df.write.mode("overwrite")
    td.compression.foreach(c => w = w.option("compression", c))
    if (td.bloom) td.key.foreach(k =>
      w = w.option(s"parquet.bloom.filter.enabled#$k", "true"))
    w
  }

  def write(t: String, df: DataFrame, knownMaxId: Option[Long] = None): Unit = {
    val td = registry(t)
    require(td.external.isEmpty, s"Table '$t' is external (read-only)")
    if (td.buckets > 0) writeBucketed(t, df, affected = None, knownMaxId = knownMaxId)
    else if (td.useIndex.equalsIgnoreCase("brin")) writeZoned(t, df, knownMaxId)
    else {
      val next = nextSnapName(t)
      val dir = new Path(tableDir(t), next)
      snapWriter(td, aligned(td, df)).parquet(dir.toString)
      // id high-water mark from parquet FOOTERS (r14, guide §6 — see
      // [[footerMinMax]]); the column-pruned scan stays as fallback
      val maxIdNow = knownMaxId.getOrElse {
        if (!td.columnMap.contains("id")) 0L
        else maxIdOfWritten(fs(dir), Seq(dir),
          spark.read.schema(td.sparkSchema).parquet(dir.toString))
      }
      swapPointer(t, manifestJson(Manifest(next, maxIdNow, Map())))
      gc(t, keep = Set(next))
    }
  }

  /** Snapshot write of a `use-index: brin` table: the Spark-native
    * BRIN ([[Brin]]). Rows are range-clustered on the LEADING key
    * column — `repartitionByRange` (sampling range partitioner, any
    * orderable type) + in-partition sort — and land in one `__z=<k>`
    * zone directory per range, so parquet row-group stats are tight
    * AND the manifest's per-zone min/max lets [[readZones]] prune
    * whole directories driver-side. Write amplification is unchanged
    * from a plain snapshot (one extra range shuffle) — BRIN is a
    * read-side structure, exactly like the reference's
    * (tanker/context.py:657-676).
    *
    * Zone count: `spark.graft.brin.zones` (default 32, matched to
    * local[32]; a cluster deployment sizes it so a zone ≈ one
    * executor's worth of scan). */
  private def writeZoned(t: String, df: DataFrame, knownMaxId: Option[Long]): Unit =
    writeZonedImpl(t, df, replaced = None, knownMaxId)

  /** Columns a brin table's zone map tracks: the FULL key (postgres
    * BRIN indexes every key column) plus the surrogate `id` (which
    * correlates with insertion order, hence with the leading key of an
    * append-mostly table). The first entry is the clustering column. */
  private def zoneStatCols(td: TableDef): Seq[String] =
    td.key ++ (if (td.columnMap.contains("id") && !td.key.contains("id"))
      Seq("id") else Nil)

  /** Combined per-column (lo, hi) — already [[Brin.encode]]d — of a
    * set of freshly-written parquet part files, from FOOTER statistics
    * only (r14 optimization, guide §6: the zone-stat and max-id
    * read-backs used to re-SCAN every just-written snapshot with a
    * min/max aggregate job; the writer already recorded exact column
    * min/max in each footer, so the same numbers come from pure
    * metadata — at 100 TB the difference between re-reading a table
    * and reading a few KB per file).
    *
    * Exactness guard: returns None — callers fall back to the scan —
    * unless every stat is of a type whose parquet statistics are
    * trustworthy and map 1:1 onto the [[Brin.encode]] domain: INT32 /
    * INT64 (plain, date, timestamp MILLIS/MICROS) and UTF8 binary
    * (unsigned byte order, matching [[Brin.cmp]]; parquet drops
    * oversized binary stats, which lands in the fallback). Float /
    * double (NaN-unsafe stats), INT96 timestamps and anything exotic
    * fall back. All-null chunks contribute nothing, so an all-null
    * column yields (None, None) exactly like the scan's null min/max. */
  private def footerMinMax(files: Seq[Path], cols: Seq[String])
      : Option[Map[String, (Option[Any], Option[Any])]] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val acc = mutable.Map[String, (Any, Any)]()
    for (f <- files) {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hadoopConf))
      try {
        for (b <- rd.getFooter.getBlocks.asScala; c <- cols) {
          val cc = b.getColumns.asScala.find(_.getPath.toDotString == c)
            .getOrElse(return None)
          val st = cc.getStatistics
          if (st == null) return None
          if (st.getNumNulls != b.getRowCount) {
            if (!st.hasNonNullValue) return None // dropped/oversized stats
            val pt = cc.getPrimitiveType
            val bounds: Option[(Any, Any)] = pt.getPrimitiveTypeName match {
              case INT64 => pt.getLogicalTypeAnnotation match {
                case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                  ts.getUnit match {
                    case LogicalTypeAnnotation.TimeUnit.MICROS =>
                      Some((st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                        st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
                    case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                      Some((st.genericGetMin.asInstanceOf[java.lang.Long] * 1000L,
                        st.genericGetMax.asInstanceOf[java.lang.Long] * 1000L))
                    case _ => None // nanos: not the Brin micros domain
                  }
                case _ =>
                  Some((st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                    st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
              }
              case INT32 => // plain ints and DATE (epoch days) both
                // encode as Long, exactly Brin.encode's Int/LocalDate
                Some((st.genericGetMin.asInstanceOf[java.lang.Integer].toLong,
                  st.genericGetMax.asInstanceOf[java.lang.Integer].toLong))
              case BINARY if pt.getLogicalTypeAnnotation
                  .isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
                Some((new String(st.genericGetMin
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
                    StandardCharsets.UTF_8),
                  new String(st.genericGetMax
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
                    StandardCharsets.UTF_8)))
              case _ => None // float/double (NaN), INT96, others: scan
            }
            bounds match {
              case None => return None
              case Some((lo, hi)) => acc.get(c) match {
                case None => acc(c) = (lo, hi)
                case Some((alo, ahi)) => acc(c) = (
                  if (Brin.cmp(lo, alo) < 0) lo else alo,
                  if (Brin.cmp(hi, ahi) > 0) hi else ahi)
              }
            }
          }
        }
      } finally rd.close()
    }
    Some(cols.map(c =>
      c -> acc.get(c).map { case (l, h) => (Some(l), Some(h)) }
        .getOrElse((None, None))).toMap)
  }

  /** Data part files directly under `dir` (no recursion). */
  private def partFiles(fsys: FileSystem, dir: Path): Seq[Path] =
    fsys.listStatus(dir).map(_.getPath).filter { p =>
      val n = p.getName
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }.toSeq

  /** max(id) of a just-written snapshot from parquet footers, or the
    * exact column-pruned scan when footer stats are unusable. `dirs`
    * are the leaf directories holding the snapshot's part files. */
  private def maxIdOfWritten(fsys: FileSystem, dirs: Seq[Path],
      readBack: => DataFrame): Long = {
    val files = dirs.flatMap(partFiles(fsys, _))
    footerMinMax(files, Seq("id")) match {
      case Some(m) => m("id")._2.map(_.asInstanceOf[Long]).getOrElse(0L)
      case None =>
        Option(readBack.agg(org.apache.spark.sql.functions.max(col("id")))
          .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    }
  }

  /** Multi-column zone overlap: a zone survives pruning iff EVERY
    * bounded column's zone range overlaps its bound. Columns the zone
    * has no stats for (older manifests, non-tracked columns) are
    * unprunable — conservative. */
  private def zoneOverlaps(z: Zone, zkey: String,
      bounds: Map[String, Brin.Bounds]): Boolean =
    bounds.forall { case (c, b) =>
      if (c == zkey) b.overlaps(z.lo, z.hi)
      else z.extra.get(c) match {
        case Some((lo, hi)) => b.overlaps(lo, hi)
        case None => true
      }
    }

  /** Partial rewrite of a brin table: `df` is the new content of every
    * zone whose stats overlap `replaced` (per-column batch key
    * ranges); zones outside it carry over by reference — the zoned
    * analogue of [[writeBuckets]]. An append-mostly table (the BRIN
    * use case) merges a recent-key batch by rewriting the last zone
    * or two. The caller MUST have merged against exactly the
    * overlapping-zone slice (`readZones(t, Some(replaced))`): a
    * stored key can only collide with a batch key if every key
    * column falls inside the batch's range for that column, so the
    * disjoint carried zones cannot duplicate a merged key. */
  def writeZones(t: String, df: DataFrame,
      replaced: Map[String, Brin.Bounds], newMaxId: Long): Unit =
    writeZonedImpl(t, df, Some(replaced), Some(newMaxId))

  /** `cluster`: optional clustering expression overriding the default
    * leading-key order (the z-order compaction path); `setZOrder`:
    * Some(cols) records cols as the table's z-order property (empty =
    * clear), None inherits the previous manifest's — the property
    * survives every write and steers [[compact]]'s re-clustering. */
  private def writeZonedImpl(t: String, df: DataFrame,
      replaced: Option[Map[String, Brin.Bounds]], knownMaxId: Option[Long],
      cluster: Option[Column] = None,
      setZOrder: Option[Seq[String]] = None): Unit = {
    val td = registry(t)
    val zkey = td.key.head
    val next = nextSnapName(t)
    val dir = new Path(tableDir(t), next)
    val confZones = spark.conf.getOption("spark.graft.brin.zones").map(_.toInt)
    // Scale-adaptive zone count for FULL writes (guide §2.2/§6): a
    // zone is both a unit of scan parallelism and of merge/rewrite +
    // footer-stat granularity, so size it by data volume —
    // ~`spark.graft.brin.zoneTargetBytes` (default 64 MB) per zone —
    // instead of a constant matched to local[32]. A 2 MB table
    // collapses to one zone (1 file + 1 footer read instead of 32);
    // a 100-TB table gets proportionally many. Optimizer size
    // estimates can overshoot after joins, so the adaptive value is
    // capped (estimates only ever make zones too MANY, which is the
    // old behavior); an explicit `spark.graft.brin.zones` wins.
    val fullZones = confZones.getOrElse {
      val target = spark.conf.getOption("spark.graft.brin.zoneTargetBytes")
        .map(_.toLong).getOrElse(64L << 20)
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      ((est / target).max(BigInt(1)).min(BigInt(1024))).toInt
    }
    // A partial rewrite reclusters only its slice — into ~as many
    // zones as it replaces (min 1), NOT the full-table zone count:
    // otherwise every narrow merge would splinter its small slice
    // into `fullZones` fragments and the zone list would balloon by
    // 32× per merge. A pure append (overlapping nothing) adds one
    // zone per batch — BRIN ranges grow with the data; compact()
    // consolidates when fragmentation accumulates.
    val nZones = replaced match {
      case None => fullZones
      case Some(b) => currentManifest(t).map(_.zones) match {
        // legacy/empty zone list: the "slice" was the whole table
        case None => fullZones
        case Some(zs) if zs.isEmpty => fullZones
        case Some(zs) => math.max(1, zs.count(z => zoneOverlaps(z, zkey, b)))
      }
    }
    val zc = col("`" + zkey + "`")
    // z-order cluster key first, leading key second: within one
    // z-value run the leading-key stats stay as tight as possible
    val ck: Seq[Column] = cluster.map(c => Seq(c, zc)).getOrElse(Seq(zc))
    snapWriter(td, aligned(td, df)
      .repartitionByRange(nZones, ck: _*).sortWithinPartitions(ck: _*)
      .withColumn("__z", expr("spark_partition_id()")))
      .partitionBy("__z").parquet(dir.toString)
    // zone stats from the WRITTEN files: exact, and immune to any plan
    // re-evaluation. Footer-only by default ([[footerMinMax]] — the
    // writer already recorded each column's min/max, so no Spark job
    // and no data read); the column-pruned scan read-back remains as
    // the fallback for stat types whose footer statistics are not
    // trustworthy (float/double keys, INT96 timestamps, oversized
    // string stats).
    val fsys = fs(dir)
    val zoneDirs =
      if (!fsys.exists(dir)) Seq.empty[Path]
      else fsys.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("__z=")).toSeq
    val statCols = zoneStatCols(td)
    var zones: Seq[Zone] = Nil
    var statMaxId = 0L
    if (zoneDirs.nonEmpty) {
      val viaFooter: Option[Seq[Zone]] = {
        val per = zoneDirs.map(zd =>
          footerMinMax(partFiles(fsys, zd), statCols).map(zd.getName -> _))
        if (per.contains(None)) None
        else Some(per.flatten.map { case (zn, m) =>
          val (lo, hi) = m(statCols.head)
          val extra = statCols.tail.map(c => c -> m(c)).toMap
          Zone(s"$next/$zn", lo, hi, extra)
        }.sortBy(_.dir))
      }
      zones = viaFooter.getOrElse {
        import org.apache.spark.sql.functions.{max => fmax, min => fmin}
        val back = spark.read.parquet(dir.toString)
        val aggs = statCols.flatMap(c => Seq(
          fmin(col("`" + c + "`")).as(s"__lo_$c"),
          fmax(col("`" + c + "`")).as(s"__hi_$c")))
        val rows = back.groupBy(col("__z")).agg(aggs.head, aggs.tail: _*).collect()
        def enc(r: org.apache.spark.sql.Row, i: Int): Option[Any] =
          Option(r.get(i)).map(Brin.encode)
        rows.map { r =>
          val extra = statCols.tail.zipWithIndex.map { case (c, j) =>
            c -> (enc(r, 3 + 2 * j), enc(r, 4 + 2 * j))
          }.toMap
          Zone(s"$next/__z=${r.get(0)}", enc(r, 1), enc(r, 2), extra)
        }.toSeq.sortBy(_.dir)
      }
      if (statCols.contains("id"))
        statMaxId = zones.flatMap { z =>
          (if (statCols.head == "id") z.hi else z.extra.get("id").flatMap(_._2))
            .map(_.asInstanceOf[Long])
        }.foldLeft(0L)(_ max _)
    }
    val prev = currentManifest(t)
    // carry-over: zones provably disjoint from the batch key range
    // (same overlap test the slice read used, so reads and carries
    // partition the old zone set exactly)
    val carried = replaced match {
      case Some(b) => prev.map(_.zones).getOrElse(Nil)
        .filterNot(z => zoneOverlaps(z, zkey, b))
      case None => Nil
    }
    val allZones = carried ++ zones
    val maxIdNow = replaced match {
      case Some(_) => // partial: the id high-water mark never regresses
        knownMaxId.getOrElse(statMaxId).max(prev.map(_.maxId).getOrElse(0L))
      case None => knownMaxId.getOrElse(statMaxId)
    }
    val zorder = setZOrder.getOrElse(prev.map(_.zorder).getOrElse(Nil))
    swapPointer(t, manifestJson(Manifest(next, maxIdNow, Map(), allZones,
      zorder)))
    gc(t, keep = allZones.map(_.dir.split("/")(0)).toSet + next)
    // auto-compaction: every narrow merge adds ~1 zone (and pins its
    // snap dir against gc), so a long-lived append-mostly table would
    // otherwise fragment without bound and rely on a MANUAL compact().
    // Once the zone list exceeds `compactFactor` x the configured
    // count, recluster the live state into one fresh snapshot — the
    // swap happens after the full rebuild, so readers never block, and
    // the rebuild dispatches back through writeZoned with
    // replaced=None (no recursion: a full write never triggers this).
    val factor = spark.conf.getOption("spark.graft.brin.compactFactor")
      .map(_.toDouble).getOrElse(2.0)
    // fragmentation trigger against the CONFIGURED full count (a
    // partial write's adaptive fullZones reflects only its slice and
    // would make the trigger hyperactive on small merges)
    val triggerZones = confZones.getOrElse(32)
    if (replaced.isDefined && factor > 0 && allZones.size > factor * triggerZones)
      compact(t)
  }

  /** Zone-pruned read of a brin table: only the zone directories whose
    * per-column stats overlap every bound in `bounds` (None = all
    * zones — still the canonical read path for brin tables, since
    * their snapshots are `__z=`-partitioned). The caller's filter
    * still applies in full; pruning is pure IO elision, like the
    * reference's BRIN scan. */
  def readZones(t: String, bounds: Option[Map[String, Brin.Bounds]]): DataFrame = {
    val td = registry(t)
    val zkey = td.key.head
    currentManifest(t) match {
      case None => empty(td)
      case Some(m) if m.zones.isEmpty =>
        // empty table (no zones written) or legacy plain snapshot
        spark.read.schema(td.sparkSchema)
          .parquet(new Path(tableDir(t), m.snap).toString)
      case Some(m) =>
        val selected = bounds match {
          case Some(b) if b.exists(_._2.isEmpty) => Nil // provably empty
          case Some(b) => m.zones.filter(z => zoneOverlaps(z, zkey, b))
          case None => m.zones
        }
        if (selected.isEmpty) empty(td)
        else spark.read.schema(td.sparkSchema)
          .parquet(selected.map(z => new Path(tableDir(t), z.dir).toString): _*)
    }
  }

  /** Partial write of a bucketed table: `df` holds the new content of
    * `affected` buckets only; all other buckets carry over by
    * reference. `newMaxId` advances the id high-water mark. */
  def writeBuckets(t: String, df: DataFrame, affected: Set[Int], newMaxId: Long): Unit =
    writeBucketed(t, df, Some(affected), Some(newMaxId))

  private def writeBucketed(t: String, df: DataFrame, affected: Option[Set[Int]],
      knownMaxId: Option[Long]): Unit = {
    val td = registry(t)
    val next = nextSnapName(t)
    val dir = new Path(tableDir(t), next)
    val out = aligned(td, df).withColumn("__b", bucketExpr(td))
    snapWriter(td, out).partitionBy("__b").parquet(dir.toString)
    // which bucket dirs did this snapshot produce?
    val fsys = fs(dir)
    val written: Map[Int, String] =
      if (!fsys.exists(dir)) Map()
      else fsys.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("__b=")).map { n =>
          n.stripPrefix("__b=").toInt -> s"$next/$n"
        }.toMap
    val prev = currentManifest(t)
    val prevBuckets = prev.map(_.buckets).getOrElse(Map())
    val buckets = affected match {
      case Some(bs) => (prevBuckets -- bs) ++ written // carry-over + new
      case None => written // full rewrite
    }
    // id high-water mark from the WRITTEN files' parquet footers (r14,
    // guide §6 — see [[footerMinMax]]): the old `out.agg(max(id))`
    // re-evaluated the whole merge PLAN a second time; the fallback
    // reads the written files column-pruned, still never re-running
    // the merge
    val maxIdNow = knownMaxId.getOrElse {
      if (!td.columnMap.contains("id")) 0L
      else maxIdOfWritten(fsys, written.values.toSeq.map(rel =>
          new Path(tableDir(t), rel)),
        spark.read.schema(td.sparkSchema).parquet(dir.toString))
    }.max(prev.map(_.maxId).getOrElse(0L))
    swapPointer(t, manifestJson(Manifest(next, maxIdNow, buckets)))
    gc(t, keep = buckets.values.map(_.split("/")(0)).toSet + next)
  }

  // ------------------------------------------------- cross-write txn

  /** Thread-local buffer of pending pointer swaps: table -> manifest
    * content. Non-null only inside [[transaction]]. */
  private val txnLocal = new ThreadLocal[mutable.LinkedHashMap[String, String]]()

  /** Is the CURRENT thread inside [[transaction]]? Sinks that commit
    * on other threads (streaming foreachBatch) guard on this: a write
    * buffered into a transaction that thread never closes would swap
    * no pointers and silently commit nothing. */
  def inTransaction: Boolean = txnLocal.get() != null

  /** Cross-write transaction: every write/delete inside `body` builds
    * its snapshot normally but BUFFERS its pointer swap; on success
    * all pointers apply together as ONE root-catalog swap behind a
    * crash-safe journal, on exception none apply (built snapshot dirs
    * are orphaned and reclaimed by later gc). This is the Spark-native
    * analogue of the reference's connection commit/rollback
    * (tanker/context.py:238-248): DURABILITY is all-or-nothing (a
    * crash between journal write and the root swap rolls FORWARD on
    * the next [[recoverTransactions]]) and VISIBILITY is atomic —
    * the `_ROOT` catalog swap is a single file replace, so a
    * concurrent reader sees either every table pre-txn or every table
    * post-txn, never a mix. In-txn reads see the buffered state
    * (read-your-writes), other threads see the pre-txn state until
    * commit. Nested transactions raise. */
  def transaction[A](body: => A): A = {
    require(txnLocal.get() == null, "Nested transactions are not supported")
    val buf = mutable.LinkedHashMap[String, String]()
    txnLocal.set(buf)
    val res =
      try body
      catch { case e: Throwable => txnLocal.remove(); throw e }
    txnLocal.remove() // before applying: the swaps below must be real
    if (buf.nonEmpty) {
      val j = new Path(root, s"_TXN-${System.nanoTime()}")
      val fsys = fs(j)
      val out = fsys.create(j, true)
      try out.write(Json.write(buf.toMap).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      commitPointers(buf.toSeq) // ONE atomic root swap for all tables
      fsys.delete(j, false)
      buf.keys.foreach(gcCurrent)
    }
    res
  }

  /** Roll forward transactions that journaled but crashed before the
    * root swap (or mirror refresh) applied. Idempotent (re-applying a
    * commit writes the same content); called from [[createTables]] so
    * any session that opens the warehouse heals it, and callable
    * directly. A torn or empty journal — a crash DURING the journal
    * write itself — provably corresponds to an uncommitted
    * transaction (the journal is fully written and closed before any
    * pointer applies), so it is discarded, not an error. */
  def recoverTransactions(): Unit = {
    val rootPath = new Path(root)
    val fsys = fs(rootPath)
    if (!fsys.exists(rootPath)) return
    fsys.listStatus(rootPath).map(_.getPath)
      .filter(_.getName.startsWith("_TXN-"))
      .sortBy(_.getName).foreach { j =>
        val in = fsys.open(j)
        val text = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
        finally in.close()
        val parsed =
          try Option(new org.yaml.snakeyaml.Yaml()
            .load[java.util.Map[String, Object]](text))
          catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case None => // torn/empty journal = uncommitted txn: discard
            fsys.delete(j, false)
          case Some(m) =>
            val entries = m.asScala.toSeq.map { case (t, c) => t -> c.toString }
            commitPointers(entries)
            fsys.delete(j, false)
            entries.foreach { case (t, _) => gcCurrent(t) }
        }
      }
  }

  /** gc a table against its CURRENT manifest's references (used after
    * a transactional commit, where per-write gc was suppressed). */
  private def gcCurrent(t: String): Unit = currentManifest(t).foreach { m =>
    gc(t, keep = Set(m.snap) ++
      m.buckets.values.map(_.split("/")(0)) ++
      m.zones.map(_.dir.split("/")(0)))
  }

  private def swapPointer(t: String, content: String): Unit = {
    val txn = txnLocal.get()
    if (txn ne null) { txn(t) = content; return }
    commitPointers(Seq(t -> content))
  }

  /** Drop snapshots that are neither referenced by the manifest nor
    * among the 2 most recent (in-flight reader grace). Suppressed
    * inside a transaction: the VISIBLE manifest still references the
    * old snapshots, and deleting them would break rollback; the commit
    * path gc's every touched table afterwards ([[gcCurrent]]). */
  private def gc(t: String, keep: Set[String]): Unit = {
    if (txnLocal.get() ne null) return
    val dir = tableDir(t)
    val fsys = fs(dir)
    if (fsys.exists(dir)) {
      val snaps = fsys.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith("snap-"))
        .sortBy(_.getName.stripPrefix("snap-").toLong)
      val doomed = snaps.dropRight(2).filterNot(p => keep(p.getName))
      doomed.foreach(p => fsys.delete(p, true))
    }
  }

  /** Compaction: rewrite the live state as ONE fresh snapshot and
    * swap. For bucketed tables this collapses the manifest's
    * many-snapshot bucket pointers (each partial merge leaves its
    * touched buckets in a new snap dir, pinning every referenced old
    * snap against gc) back to a single directory tree, with rows
    * clustered so each bucket dir gets one file per owning task —
    * the small-file compaction a long-lived 100-TB table needs after
    * many incremental merges. Readers are never blocked: the new snap
    * is built in full before the single-file pointer swap, and gc
    * reclaims the old snaps afterwards. Content and the id high-water
    * mark are unchanged. */
  def compact(t: String): Unit = {
    val td = registry(t)
    require(td.external.isEmpty, s"Table '$t' is external (read-only)")
    val keepMax = Some(maxId(t))
    if (td.buckets > 0) {
      // cluster by bucket id before the partitioned write: one file
      // per bucket dir instead of (tasks × buckets) small files
      val full = read(t).repartition(td.buckets, bucketExpr(td))
      writeBucketed(t, full, affected = None, knownMaxId = keepMax)
    } else if (td.useIndex.equalsIgnoreCase("brin") &&
        currentManifest(t).exists(_.zorder.size >= 2)) {
      // the table carries a z-order property ([[compactZOrder]]):
      // re-cluster on the interleaved key, not the leading key, so
      // auto-compaction keeps multi-column pruning tight
      val zcols = currentManifest(t).get.zorder
      val full = read(t)
      writeZonedImpl(t, full, replaced = None, knownMaxId = keepMax,
        cluster = zValueColumn(full, zcols))
    } else write(t, read(t), knownMaxId = keepMax)
  }

  /** Z-ORDER compaction of a brin table: rewrite the live state with
    * zones clustered on the bit-interleaved bucket ranks of `cols`
    * (the Morton / Z-curve order of the lakehouse OPTIMIZE ZORDER
    * command) instead of the leading key alone — every listed
    * column's per-zone min/max tightens to ~a √-fraction of its
    * domain, so [[readZones]] prunes on ANY of them, not just the
    * leading key. `cols` must be zone-tracked (the full table key
    * plus `id` — stats machinery and [[graft.view.ZonePrune]] are
    * unchanged; only the physical clustering moves). The choice is
    * recorded in the manifest as a table PROPERTY: later partial
    * merges write their slices leading-key-clustered (locally fuzzy,
    * still exact — zone pruning is IO elision under per-zone stats
    * that hold regardless of order), and the next [[compact]] —
    * manual or the auto-compaction threshold — re-clusters the whole
    * table on the recorded z-order. `Nil` clears the property and
    * restores plain leading-key compaction.
    *
    * Scale shape: one footer count + one ~20k-row sampled scan decide
    * per-column bucket boundaries driver-side (same sampling idea as
    * `repartitionByRange`); the rewrite itself is the one full
    * range-exchange any compaction pays. The z-value is pure integer
    * arithmetic over an order-preserving bucket id (a ≤63-literal
    * array HOF per column), fully codegen'd. */
  def compactZOrder(t: String, cols: Seq[String]): Unit = {
    val td = registry(t)
    require(td.external.isEmpty, s"Table '$t' is external (read-only)")
    require(td.useIndex.equalsIgnoreCase("brin"),
      s"Table '$t' has use-index '${td.useIndex}'; z-order needs brin")
    require(cols.size != 1,
      "z-order needs at least two columns (Nil clears the property; " +
      "one column is plain compact())")
    require(cols.distinct.size == cols.size,
      s"duplicate z-order columns: ${cols.mkString(", ")}")
    val tracked = zoneStatCols(td)
    cols.foreach(c => require(tracked.contains(c),
      s"Column '$c' carries no zone stats (tracked: ${tracked.mkString(", ")})"))
    val keepMax = Some(maxId(t))
    val full = read(t)
    val cluster = if (cols.size >= 2) zValueColumn(full, cols) else None
    writeZonedImpl(t, full, replaced = None, knownMaxId = keepMax,
      cluster = cluster, setZOrder = Some(cols))
  }

  /** Bit-interleaved z-value over `cols` as a Column, or None when the
    * frame is empty. Per column: sample ~20k rows once (all columns in
    * one job), sort driver-side in zone-map order ([[Brin.cmp]] over
    * [[Brin.encode]] — matches Spark's binary string comparison), take
    * `2^zorderBits − 1` evenly-spaced cut points, and bucket each row
    * by counting cuts at or below its value (array HOF over the
    * literal cut list — order-preserving for any orderable type,
    * codegen'd, no per-row driver call). Nulls bucket to 0 (zone-map
    * order puts them nowhere; stats over them stay conservative).
    * Buckets then interleave bit-by-bit, column i contributing bit b
    * at position `b × nCols + i` — the Morton code. Bit budget:
    * `zorderBits × nCols ≤ 62` (signed-long safe);
    * `spark.graft.brin.zorderBits` (default 6 → 64 buckets/column). */
  private def zValueColumn(df: DataFrame, cols: Seq[String]): Option[Column] = {
    import org.apache.spark.sql.functions.{array, filter, shiftleft, shiftright, size}
    val nBits = spark.conf.getOption("spark.graft.brin.zorderBits")
      .map(_.toInt).getOrElse(6)
    require(nBits >= 1 && nBits * cols.size <= 62,
      s"zorderBits $nBits × ${cols.size} columns exceeds the 62-bit budget")
    val n = df.count()
    if (n == 0) return None
    val frac = math.min(1.0, 20000.0 / n)
    val proj = df.select(cols.map(c => col("`" + c + "`")): _*)
    val sampled = (if (frac >= 1.0) proj else proj.sample(frac, 42)).collect()
    if (sampled.isEmpty) return None
    val nB = 1 << nBits
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      val sorted = sampled.iterator.map(_.get(i)).filter(_ != null).toArray
        .sortWith((a, b) => Brin.cmp(Brin.encode(a), Brin.encode(b)) < 0)
      val cuts =
        if (sorted.isEmpty) Seq.empty[Any] // all-null column: constant 0
        else (1 until nB).map(k =>
          sorted(math.min(((k.toLong * sorted.length) / nB).toInt,
            sorted.length - 1))).distinct
      if (cuts.isEmpty) lit(0L)
      else size(filter(array(cuts.map(v => lit(v)): _*),
        b => col("`" + c + "`") >= b)).cast("long")
    }
    Some(buckets.zipWithIndex.map { case (bkt, i) =>
      (0 until nBits).map { b =>
        shiftleft(shiftright(bkt, b).bitwiseAND(lit(1L)), b * cols.size + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _))
  }

  /** Consistent whole-warehouse BACKUP: pin the root catalog with one
    * atomic read, copy every snapshot directory it references (plus
    * the `_SCHEMA.yaml` sidecar) under `destRoot`, and write the
    * destination's root catalog LAST — so the backup directory is
    * itself a fully functional warehouse root (restore = point an Env
    * at it, or copy it back; there is no separate archive format),
    * and a reader of a half-written backup sees no catalog yet rather
    * than a partial one. Because every commit — including multi-table
    * transactions — swaps the single `_ROOT` file atomically and
    * snapshot dirs are immutable once referenced, the pinned catalog
    * is a transactionally consistent cross-table cut by construction;
    * no writer quiescence is needed for CONSISTENCY. Durability of
    * the copy itself still races gc: a concurrent writer may reclaim
    * a superseded snapshot mid-copy, which surfaces as a loud
    * missing-path error (re-run the backup), never a silent hole.
    * Backups also prune by construction: only LIVE state copies —
    * superseded snapshots and scratch spills stay behind.
    *
    * The COPY itself is the distcp shape: the driver only enumerates
    * the pinned file list; the bytes move on EXECUTORS via one
    * `parallelize(files).foreachPartition` job, so wall-clock scales
    * with cluster width, not file count — a sequential driver loop
    * over a 100-TB warehouse would run for days.
    *
    * Persisted ANN/text index directories (marked by their
    * `_graft_index_meta.json` sidecar) are not part of the catalog's
    * transactional state; with `includeIndexes = true` every index
    * dir found under the warehouse root is copied too (meta sidecar
    * written LAST so a torn index copy is never silently probed).
    * Returns the index directories LEFT BEHIND — callers print them
    * loudly so a later restore's full-corpus re-bootstrap is never a
    * surprise. Indexes living outside the root cannot be discovered
    * and are always the caller's to copy.
    *
    * `incremental = true` REFRESHES an existing backup in place (a
    * standby warehouse): snapshot dirs are immutable once written and
    * snap numbers never reuse (the name counter only grows), so any
    * destination file already present under the same relative path
    * with the same length IS the same bytes and is skipped — a
    * nightly refresh copies only the snapshots the day added. The
    * destination `_ROOT` (and each `_CURRENT` mirror) is written to a
    * tmp name and RENAMED over the target, so a standby reader
    * resolving the catalog mid-refresh sees the old consistent cut or
    * the new one, never a truncated file. Snapshots the refresh
    * strands (no longer referenced) are exactly what
    * `fsck(reclaim = true)` on the standby deletes.
    *
    * Index dirs are NOT immutable (a drift retrain rename-swaps the
    * whole directory; tally appends rewrite the meta sidecar in
    * place), so neither the same-length skip nor the divergence guard
    * applies to them: an incremental refresh always recopies each
    * index dir in full, staged into a `.inc-tmp-*` sibling and
    * rename-swapped in — a standby prober mid-refresh sees the old
    * index or the new one, never a torn mix of the two. */
  def backup(destRoot: String, includeIndexes: Boolean = false,
      incremental: Boolean = false): Seq[String] = {
    recoverTransactions() // fold any journaled commit before pinning
    val destP = new Path(destRoot)
    val dfs = fs(destP)
    require(incremental || !dfs.exists(new Path(destP, "_ROOT")),
      s"'$destRoot' already holds a warehouse root " +
        "(incremental refresh is opt-in)")
    dfs.mkdirs(destP)
    val cat = readRoot()
    // legacy (pre-catalog) layouts fall back to per-table mirrors:
    // each read is atomic but the cross-table cut is then only
    // per-table consistent — exactly the guarantee such layouts have
    val pinned: Map[String, String] =
      if (cat.nonEmpty) cat
      else registry.names.flatMap(t => readPointer(t).map(t -> _)).toMap
    val snapDirs: Seq[(Path, Path)] = pinned.toSeq.flatMap { case (t, ptr) =>
      val m = if (ptr.startsWith("{")) parseManifest(ptr)
        else Manifest(ptr, -1L, Map())
      val snaps = (Seq(m.snap) ++
        m.buckets.values.map(_.split("/")(0)) ++
        m.zones.map(_.dir.split("/")(0))).distinct
      snaps.map(s => (new Path(tableDir(t), s), new Path(new Path(destP, t), s)))
    }
    val idxDirs = discoverIndexDirs()
    val idxCopied = if (includeIndexes) idxDirs else Nil
    val idxPairs: Seq[(Path, Path)] = idxCopied.map { d =>
      val rel = relativize(new Path(root), d)
      (d, new Path(destP, rel))
    }
    // enumerate every file driver-side (cheap: metadata only), then
    // one executor-parallel job moves all the bytes.
    //
    // SNAPSHOT dirs first: a pinned snapshot that cannot be listed has
    // been reclaimed by a concurrent writer's gc mid-backup — fail
    // LOUD (re-run the backup) rather than write an empty snapshot
    // dir and report success while holding a hole.
    val snapFilePairs = snapDirs.flatMap { case (src, dst) =>
      if (!fs(src).exists(src)) throw new java.io.IOException(
        s"backup copy failed: pinned snapshot '$src' vanished " +
          "mid-backup (concurrent gc from another writer?) — re-run")
      val already: Map[String, Long] =
        if (!incremental) Map.empty
        else listFilesUnder(dst)
          .map { case (f, len) => relativize(dst, f) -> len }.toMap
      val srcFiles = listFilesUnder(src, strict = true).map {
        case (f, len) => (relativize(src, f), f, len) }
      // DIVERGENCE guard (snapshot dirs ONLY — index dirs mutate): a
      // referenced snapshot dir is immutable in ONE timeline, so the
      // destination holding files the source lacks under it means src
      // and dst created the same snap name independently (e.g. both
      // kept writing after a restore). Copying alongside would UNION
      // two different snapshots into one directory — silent duplicate
      // rows. Refuse loudly; the remedy is a fresh full backup.
      if (incremental) {
        val srcRels = srcFiles.iterator.map(_._1).toSet
        val foreign = already.keysIterator.filterNot(srcRels).toSeq
        if (foreign.nonEmpty) throw new IllegalStateException(
          s"incremental backup: destination '$dst' holds files the " +
            s"source snapshot does not (${foreign.take(3).mkString(", ")}" +
            s"${if (foreign.size > 3) ", …" else ""}) — the two roots " +
            "have diverged; take a full backup into an empty destination")
      }
      srcFiles.flatMap { case (rel, f, len) =>
        if (already.get(rel).contains(len)) None
        else Some((f.toString, new Path(dst, rel).toString))
      }
    }
    // INDEX dirs: never skipped, never divergence-checked (retrains
    // and tally appends mutate them legitimately). A fresh backup
    // copies them in place (meta sidecar LAST, split out below); an
    // incremental refresh stages the full recopy in a temp sibling
    // and rename-swaps it in, so the standby's old index serves until
    // the new one lands whole.
    val idxSwaps = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    val idxFilePairs = idxPairs.flatMap { case (src, dst) =>
      val srcFiles = listFilesUnder(src)
      if (srcFiles.isEmpty) throw new java.io.IOException(
        s"backup copy failed: index dir '$src' vanished mid-backup " +
          "(concurrent retrain swap?) — re-run")
      val stageTo =
        if (!incremental) dst
        else {
          val tmp = new Path(dst.getParent,
            dst.getName + s".inc-tmp-${System.nanoTime()}")
          idxSwaps += ((tmp, dst))
          tmp
        }
      srcFiles.map { case (f, _) =>
        (f.toString, new Path(stageTo, relativize(src, f)).toString) }
    }
    // meta-last applies only to in-place index copies; files staged
    // into a swap sibling are invisible until the rename, so they
    // ride the bulk job whole
    val (metaFiles, bulkFiles) = (snapFilePairs ++ idxFilePairs)
      .partition(p => p._1.endsWith("/_graft_index_meta.json") &&
        !idxSwaps.exists { case (tmp, _) => p._2.startsWith(tmp.toString) })
    parallelCopy(bulkFiles)
    snapDirs.foreach { case (_, dst) => dfs.mkdirs(dst) } // zero-file snaps
    metaFiles.foreach { case (s, d) => // meta LAST: torn index ≠ probeable
      val sp = new Path(s); val dp = new Path(d)
      if (!org.apache.hadoop.fs.FileUtil.copy(fs(sp), sp, fs(dp), dp,
          false, hadoopConf))
        throw new java.io.IOException(s"backup copy failed: $s")
    }
    idxSwaps.foreach { case (tmp, dst) => // old-or-new, never torn
      if (dfs.exists(dst)) {
        val old = new Path(dst.getParent,
          dst.getName + s".inc-old-${System.nanoTime()}")
        if (!dfs.rename(dst, old))
          throw new java.io.IOException(s"failed to retire old index $dst")
        if (!dfs.rename(tmp, dst))
          throw new java.io.IOException(s"failed to swap index dir $dst")
        dfs.delete(old, true)
      } else if (!dfs.rename(tmp, dst))
        throw new java.io.IOException(s"failed to swap index dir $dst")
    }
    pinned.foreach { case (t, ptr) =>
      atomicWrite(dfs, new Path(new Path(destP, t), "_CURRENT"),
        ptr.getBytes(StandardCharsets.UTF_8))
    }
    val sf = new Path(root, "_SCHEMA.yaml")
    if (fs(sf).exists(sf))
      org.apache.hadoop.fs.FileUtil.copy(fs(sf), sf, dfs,
        new Path(destP, "_SCHEMA.yaml"), false, hadoopConf)
    atomicWrite(dfs, new Path(destP, "_ROOT"),
      Json.write(pinned).getBytes(StandardCharsets.UTF_8))
    (idxDirs diff idxCopied).map(_.toString)
  }

  /** Every regular file under `dir` with its length, recursively;
    * empty when the directory is missing (the caller decides whether
    * that's a race or a zero-file table), unless `strict` — then a
    * path vanishing DURING the walk (a pinned snapshot reclaimed by a
    * concurrent writer's gc) throws instead of silently shortening
    * the list. A manual listStatus walk,
    * NOT `listFiles(recursive)`: the located-status iterator resolves
    * block locations per FILE (~ms each on a checksummed local fs —
    * profiled at 4.5 ms/file, which made enumeration dominate the
    * whole backup), while listStatus is one round trip per DIRECTORY
    * and carries the lengths already. */
  private def listFilesUnder(dir: Path, strict: Boolean = false)
      : Seq[(Path, Long)] = {
    val fsys = fs(dir)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Path, Long)]
    def walk(d: Path): Unit =
      (try fsys.listStatus(d)
       catch {
         case e: java.io.FileNotFoundException =>
           if (strict) throw new java.io.IOException(
             s"backup copy failed: '$d' vanished mid-enumeration " +
               "(concurrent gc from another writer?) — re-run", e)
           Array.empty[org.apache.hadoop.fs.FileStatus]
       })
        .foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else buf += ((st.getPath, st.getLen))
        }
    walk(dir)
    buf.toSeq
  }

  /** Write `bytes` to `f` atomically: tmp sibling + rename, the same
    * old-or-new (never truncated-in-place) swap as [[commitPointers]]
    * — a concurrent reader of `f` sees the previous content or the
    * new one, never a torn file. */
  private def atomicWrite(fsys: FileSystem, f: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = new Path(f.getParent, f.getName + s".tmp-${System.nanoTime()}")
    val out = fsys.create(tmp, true)
    try out.write(bytes) finally out.close()
    // HDFS/local rename onto an existing file: delete-then-rename is
    // the portable swap; the tiny window only exposes old-or-new.
    if (fsys.exists(f)) fsys.delete(f, false)
    if (!fsys.rename(tmp, f))
      throw new java.io.IOException(s"Failed to swap $f")
  }

  /** `child`'s path relative to `base` (both resolved through their
    * FileSystem so scheme/authority differences don't break prefix
    * matching). */
  private def relativize(base: Path, child: Path): String = {
    val b = fs(base).makeQualified(base).toString.stripSuffix("/") + "/"
    val c = fs(child).makeQualified(child).toString
    require(c.startsWith(b), s"$child is not under $base")
    c.stripPrefix(b)
  }

  /** Move a list of (src, dst) file URIs on EXECUTORS — the distcp
    * shape. The Hadoop conf travels as a plain key/value Vector (the
    * Configuration object itself is not serializable); each partition
    * rebuilds it once. A file deleted mid-copy (concurrent gc)
    * surfaces as a loud task failure, never a silent hole. */
  private def parallelCopy(pairs: Seq[(String, String)]): Unit = {
    if (pairs.isEmpty) return
    val confKv: Vector[(String, String)] =
      hadoopConf.asScala.map(e => e.getKey -> e.getValue).toVector
    val slices = math.max(1, math.min(pairs.size,
      spark.sparkContext.defaultParallelism * 2))
    spark.sparkContext.parallelize(pairs, slices).foreachPartition {
      (it: Iterator[(String, String)]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confKv.foreach { case (k, v) => conf.set(k, v) }
        it.foreach { case (s, d) =>
          val sp = new Path(s); val dp = new Path(d)
          if (!org.apache.hadoop.fs.FileUtil.copy(
              sp.getFileSystem(conf), sp, dp.getFileSystem(conf), dp,
              false, conf))
            throw new java.io.IOException(s"backup copy failed: $s")
        }
    }
  }

  /** Persisted index directories under the warehouse root, found by
    * the `_graft_index_meta.json` sidecar every index family writes
    * (MinHash corpus, LSH/IVF/IVF-PQ/semantic). Bounded walk: three
    * levels, skipping snapshot dirs and `_`-prefixed internals. */
  def discoverIndexDirs(): Seq[Path] = {
    val rootP = new Path(root)
    val fsys = fs(rootP)
    if (!fsys.exists(rootP)) return Nil
    def scan(dir: Path, depth: Int): Seq[Path] = {
      val st =
        try fsys.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => return Nil }
      if (st.exists(s => s.isFile &&
          s.getPath.getName == "_graft_index_meta.json")) Seq(dir)
      else if (depth >= 3) Nil
      else st.toSeq
        .filter(s => s.isDirectory &&
          !s.getPath.getName.startsWith("snap-") &&
          !s.getPath.getName.startsWith("_") &&
          // incremental-refresh staging/retired siblings hold a meta
          // sidecar too but are mid-swap state, not live indexes
          !s.getPath.getName.contains(".inc-tmp-") &&
          !s.getPath.getName.contains(".inc-old-"))
        .flatMap(s => scan(s.getPath, depth + 1))
    }
    scan(rootP, 0)
  }

  /** Retained snapshot names for a managed table, oldest first. GC
    * keeps the manifest-referenced snapshots plus the two most recent,
    * so this is a bounded time-travel window over immutable
    * directories. */
  def snapshots(t: String): Seq[String] = {
    val dir = tableDir(t)
    val fsys = fs(dir)
    if (!fsys.exists(dir)) Nil
    else fsys.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("snap-")).toSeq
      .sortBy(_.stripPrefix("snap-").toLong)
  }

  /** One [[fsck]] finding. `kind`: `missing-snapshot` / `missing-bucket`
    * / `missing-zone` / `unparseable-pointer` (broken references —
    * reads WILL fail), `orphan-snapshot` / `stale-tmp` (reclaimable
    * garbage, `bytes` = its size), `unapplied-journal` (a crash before
    * the root swap; the next open rolls it forward), `foreign-lease`
    * (another live writer). */
  final case class FsckIssue(table: String, kind: String, path: String,
      detail: String, bytes: Long)

  /** Integrity + space audit — the operator's fsck for a long-lived
    * warehouse. Verifies every pointer in the live catalog resolves to
    * an existing snapshot / bucket / zone directory, reports snapshot
    * dirs NOTHING references (crashed writes, or gc a crash
    * suppressed) with their reclaimable bytes, and surfaces torn
    * `_CURRENT.tmp-*` mirror swaps, lease-steal tombstones, unapplied
    * `_TXN-*` journals and a live foreign `_LEASE` holder. Read-only
    * by default — it REPORTS unapplied journals rather than folding
    * them, so auditing never mutates a warehouse it may not own.
    * Metadata-only: listStatus walks + one content summary per orphan,
    * no data bytes read — cost scales with snapshot/file counts
    * (bounded by retention), never data size, so it runs in seconds
    * against 100 TB.
    *
    * `reclaim = true` deletes what is provably garbage — orphan
    * snapshots (same never-the-2-newest grace as gc) and stale tmp
    * files — and never touches journals, leases, or referenced state.
    * Returns the findings; empty = clean. */
  def fsck(reclaim: Boolean = false): Seq[FsckIssue] = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[FsckIssue]
    val rootP = new Path(root)
    val rfs = fs(rootP)
    if (!rfs.exists(rootP)) return Nil
    rfs.listStatus(rootP).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("_TXN-"))
        issues += FsckIssue("", "unapplied-journal", st.getPath.toString,
          "journaled commit not rolled forward yet (the next open heals it)",
          0L)
      else if (n.startsWith("_LEASE.stale-")) {
        issues += FsckIssue("", "stale-tmp", st.getPath.toString,
          "lease-steal tombstone", st.getLen)
        if (reclaim) rfs.delete(st.getPath, false)
      }
      else if (n.startsWith("_ROOT.tmp-")) {
        issues += FsckIssue("", "stale-tmp", st.getPath.toString,
          "torn root swap leftover", st.getLen)
        if (reclaim) rfs.delete(st.getPath, false)
      }
    }
    // crashed incremental index-refresh staging/retired dirs — same
    // bounded depth as discoverIndexDirs (they are siblings of index
    // dirs); provably garbage: a completed refresh deletes both
    def sweepStaging(dir: Path, depth: Int): Unit = {
      val st = try rfs.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => return }
      st.foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && (n.contains(".inc-tmp-") ||
            n.contains(".inc-old-"))) {
          issues += FsckIssue("", "stale-tmp", s.getPath.toString,
            "crashed incremental index-refresh staging dir",
            rfs.getContentSummary(s.getPath).getLength)
          if (reclaim) rfs.delete(s.getPath, true)
        } else if (s.isDirectory && depth < 3 &&
            !n.startsWith("snap-") && !n.startsWith("_"))
          sweepStaging(s.getPath, depth + 1)
      }
    }
    sweepStaging(rootP, 0)
    val leaseF = new Path(rootP, "_LEASE")
    try {
      val st = rfs.getFileStatus(leaseF)
      val in = rfs.open(leaseF)
      val h = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim finally in.close()
      val age = System.currentTimeMillis - st.getModificationTime
      if (h != Warehouse.processId && age <= Warehouse.LeaseTtlMs)
        issues += FsckIssue("", "foreign-lease", leaseF.toString,
          s"write-leased by process '$h' (heartbeat $age ms ago)", 0L)
    } catch { case _: java.io.FileNotFoundException => }
    val cat = readRoot()
    val pinned: Map[String, String] =
      if (cat.nonEmpty) cat
      else registry.names.flatMap(t => readPointer(t).map(t -> _)).toMap
    pinned.toSeq.sortBy(_._1).foreach { case (t, ptr) =>
      val td = tableDir(t)
      val tfs = fs(td)
      val keep = scala.collection.mutable.Set.empty[String]
      val parsed =
        try Some(
          if (ptr.startsWith("{")) parseManifest(ptr)
          else Manifest(ptr, -1L, Map()))
        catch {
          case scala.util.control.NonFatal(e) =>
            issues += FsckIssue(t, "unparseable-pointer", td.toString,
              s"catalog pointer does not parse: ${e.getMessage}", 0L)
            None
        }
      parsed.foreach { m =>
        def need(rel: String, kind: String): Unit =
          if (!tfs.exists(new Path(td, rel)))
            issues += FsckIssue(t, kind, new Path(td, rel).toString,
              "referenced by the live catalog but missing on storage", 0L)
        need(m.snap, "missing-snapshot")
        m.buckets.values.foreach(need(_, "missing-bucket"))
        m.zones.foreach(z => need(z.dir, "missing-zone"))
        keep += m.snap
        keep ++= m.buckets.values.map(_.split("/")(0))
        keep ++= m.zones.map(_.dir.split("/")(0))
      }
      if (tfs.exists(td)) {
        val entries = tfs.listStatus(td).map(_.getPath)
        val snaps = entries.filter(_.getName.startsWith("snap-"))
          .sortBy(_.getName.stripPrefix("snap-").toLong)
        val newest = snaps.takeRight(2).map(_.getName).toSet
        snaps.foreach { p =>
          if (!keep(p.getName) && !newest(p.getName)) {
            issues += FsckIssue(t, "orphan-snapshot", p.toString,
              "referenced by nothing (crashed write or suppressed gc)",
              tfs.getContentSummary(p).getLength)
            if (reclaim) tfs.delete(p, true)
          }
        }
        entries.filter(_.getName.startsWith("_CURRENT.tmp-")).foreach { p =>
          issues += FsckIssue(t, "stale-tmp", p.toString,
            "torn mirror swap leftover", tfs.getFileStatus(p).getLen)
          if (reclaim) tfs.delete(p, false)
        }
      }
    }
    // persisted index dirs: the meta sidecar must parse AND satisfy
    // each family's cheap structural invariants (dims present,
    // centroid count == nlist/k, codebook shape) — a half-written or
    // hand-edited meta is caught at audit time, not at first probe
    discoverIndexDirs().foreach { d =>
      val mf = new Path(d, "_graft_index_meta.json")
      val ifs = fs(mf)
      try {
        val in = ifs.open(mf)
        val text = try new String(org.apache.commons.io.IOUtils
          .toByteArray(in), StandardCharsets.UTF_8) finally in.close()
        val m = new org.yaml.snakeyaml.Yaml()
          .load[java.util.Map[String, Object]](text)
        if (m == null)
          issues += FsckIssue("", "index-meta", mf.toString,
            "index metadata is empty", 0L)
        else {
          def bad(msg: String): Unit =
            issues += FsckIssue("", "index-meta", mf.toString, msg, 0L)
          def intOf(k: String): Option[Int] = Option(m.get(k))
            .flatMap(v => scala.util.Try(v.toString.toInt).toOption)
          def vecsOf(k: String): Option[Seq[Int]] = m.get(k) match {
            // the outer list's per-entry SIZES (each entry a vector)
            case l: java.util.List[_] => Some(l.asScala.toSeq.map {
              case e: java.util.List[_] => e.size
              case _ => -1
            })
            case _ => None
          }
          val dims = intOf("dims")
          def needCentroids(expectKey: String): Unit =
            (vecsOf("centroids"), intOf(expectKey)) match {
              case (None, _) => bad("centroids missing or not a list")
              case (_, None) => bad(s"'$expectKey' missing")
              case (Some(cs), Some(n)) =>
                if (cs.size != n)
                  bad(s"centroid count ${cs.size} != $expectKey $n")
                if (dims.exists(dd => cs.exists(_ != dd)))
                  bad(s"a centroid's width differs from dims ${dims.get}")
            }
          Option(m.get("kind")).map(_.toString) match {
            case None => bad("missing 'kind'")
            case Some("minhash") =>
              if (!intOf("numHashes").exists(_ > 0))
                bad("minhash meta: numHashes missing or non-positive")
              if (!intOf("numBands").exists(_ > 0))
                bad("minhash meta: numBands missing or non-positive")
            case Some("lsh") =>
              if (!dims.exists(_ > 0)) bad("lsh meta: dims missing")
              if (!intOf("numPlanes").exists(_ > 0))
                bad("lsh meta: numPlanes missing or non-positive")
            case Some("ivf") =>
              if (!dims.exists(_ > 0)) bad("ivf meta: dims missing")
              needCentroids("nlist")
            case Some("semantic") =>
              if (!dims.exists(_ > 0)) bad("semantic meta: dims missing")
              needCentroids("k")
            case Some("ivfpq") =>
              if (!dims.exists(_ > 0)) bad("ivfpq meta: dims missing")
              needCentroids("nlist")
              (vecsOf("codebooks"), intOf("m"), dims) match {
                case (None, _, _) => bad("codebooks missing or not a list")
                case (_, None, _) => bad("'m' missing")
                case (Some(cb), Some(mm), dd) =>
                  if (cb.size != mm)
                    bad(s"codebook count ${cb.size} != m $mm")
                  if (dd.exists(_ % math.max(mm, 1) != 0))
                    bad(s"dims ${dd.get} not divisible by m $mm")
              }
            case Some(k0) => bad(s"unknown index kind '$k0'")
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          issues += FsckIssue("", "index-meta", mf.toString,
            s"index metadata unreadable: ${e.getMessage}", 0L)
      }
    }
    issues.toSeq
  }

  /** Time travel: read one retained snapshot of an unbucketed table.
    * Snapshot dirs are immutable once written, but NOT immortal: gc on
    * a concurrent write may delete all but the two newest, so
    * materialize (or act on) the returned frame promptly — a lazy read
    * held across later writes can hit a deleted directory. Bucketed
    * tables are excluded (a snapshot dir holds only the buckets
    * rewritten at that version — reconstructing an old full state
    * needs the manifest history, which is not retained). */
  def readSnapshot(t: String, snap: String): DataFrame = {
    val td = registry(t)
    require(td.external.isEmpty, s"Table '$t' is external (no snapshots)")
    require(td.buckets == 0,
      s"Table '$t' is bucketed; snapshots are per-bucket deltas, not full states")
    require(snapshots(t).contains(snap), s"No retained snapshot '$snap' for '$t'")
    spark.read.schema(td.sparkSchema)
      .parquet(new Path(tableDir(t), snap).toString)
      .drop("__z") // brin snapshots are zone-partitioned
  }

  /** Create empty snapshots for every managed table that doesn't exist
    * yet — idempotent like the reference's create_tables
    * (tanker/context.py:688-710). Seed `values` are written by
    * [[graft.Env.createTables]] (they may use dotted FK fields). */
  def createTables(): Unit = {
    recoverTransactions() // heal a crash mid-commit before any reads
    registry.names.foreach { t =>
      if (registry(t).external.isEmpty && readPointer(t).isEmpty)
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
  /** Per-root lock serializing root-catalog read-modify-write within
    * this JVM — the single-driver commit coordinator. Keyed by the
    * root string (all Warehouse instances over one root share it). */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[store] def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  /** Parsed-root memo shared by every Warehouse instance over one root
    * in this JVM, keyed like [[lockFor]]: (mtime, length, entries,
    * exact), where `exact` marks content installed by this JVM's own
    * commit under the root lock. A per-instance memo would treat a
    * sibling instance's commit as a foreign swap. */
  private val rootMemos = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicReference[
      Option[(Long, Long, Map[String, String], Boolean, Long)]]]()
  private[store] def memoFor(root: String): java.util.concurrent.atomic
      .AtomicReference[Option[(Long, Long, Map[String, String], Boolean, Long)]] =
    rootMemos.computeIfAbsent(root,
      _ => new java.util.concurrent.atomic.AtomicReference(None))

  /** A non-exact memo entry held locally for less than this re-reads
    * the catalog: closes the same-mtime-tick/same-length foreign-swap
    * blind spot of the (mtime, length) key at the cost of re-parsing
    * only entries installed in the last two seconds — keyed on the
    * local install time, so storage/driver clock skew cannot reopen
    * the hole. */
  private[store] val RootFreshnessMs: Long = 2000L

  /** Writer-lease heartbeat TTL (see `ensureLease`): a lease whose
    * mtime is older than this is stealable by another process. */
  private[store] val LeaseTtlMs: Long = 10 * 60 * 1000L

  /** This process's writer identity for the `_LEASE` guard; hostname
    * resolution is done once (it can block on DNS). */
  private[store] lazy val processId: String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case scala.util.control.NonFatal(_) => "localhost" }
    s"$host:${ProcessHandle.current().pid()}"
  }

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
          val snap =
            if (cur.startsWith("{")) { // bucketed manifest
              val y = new org.yaml.snakeyaml.Yaml()
              y.load[java.util.Map[String, Object]](cur)
                .get("snap").toString
            } else cur
          val schema = spark.read.parquet(new Path(d, snap).toString).schema
          val cols = schema.fields.filterNot(_.name == "__b")
            .map(f => ColumnDef(f.name, colType(f.dataType)))
          TableDef(name, cols.toSeq, key = Seq("id"))
        }
      new Registry(defs.toSeq)
    }
  }
}
