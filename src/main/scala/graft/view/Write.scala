package graft.view

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import graft.Env
import graft.expr.{Args, QueryBuilder}
import graft.schema.{ColType, ColumnDef}

/** The write path: normalization → coercion → FK resolution → merge
  * (insert/update toggles, write filters with new-vs-old semantics,
  * purge) → atomic snapshot swap, plus delete by data/filter.
  *
  * Re-expresses the reference's temp-table + ON CONFLICT machinery
  * (tanker/view.py:227-711) as DataFrame joins over Parquet snapshots:
  *
  *  - FK resolution (view.py:642-711): one join per dotted FK group
  *    against the remote view, replacing the LRU/pagination machinery —
  *    the join IS the batch lookup. Unknown non-null values raise, an
  *    all-null tuple yields a NULL fk (view.py:700-711).
  *  - Upsert (view.py:469-552): update = current LEFT JOIN batch on key
  *    with mapped non-key columns taken from the batch when matched
  *    (partial-column preservation: unmapped columns keep their stored
  *    values, tests/write_test.py:85-112); insert = batch anti-join
  *    current, surrogate ids assigned as max(id)+row_number, column
  *    `defaults` applied (table.py:56-57).
  *  - Write filters (view.py:356-365, 554-631): the 'new' pass drops
  *    batch rows whose filter over INCOMING values is strictly false
  *    (mapped columns resolve to the batch, others to the stored row);
  *    the 'old' pass drops batch rows whose key exists and whose filter
  *    over the STORED values is strictly false (the
  *    tests/acl_test.py:97-107 semantics).
  *  - Purge (view.py:554-631): stored rows absent from the batch (and
  *    matching the filters, when given) are deleted, counted.
  *
  * At 100-TB scale the full-snapshot rewrite becomes a partition-pruned
  * rewrite (only partitions containing batch keys); the key-based merge
  * here is already shaped for that (SURVEY §4).
  */
object Write {

  /** One physical column targeted by a write, with the view fields that
    * feed it (tanker field_map, view.py:88-102). */
  private final case class Group(col: ColumnDef, items: Seq[(ViewField, Int)]) {
    def m2o: Option[ColType.M2O] = col.ctype match {
      case m: ColType.M2O => Some(m)
      case _ => None
    }
    /** Single non-dotted field on an M2O column = write fk by id
      * (tanker view.py:233-236). */
    def byId: Boolean = items.size == 1 && !items.head._1.desc.contains(".")
  }

  private def c(name: String): Column = col("`" + name + "`")

  private def strictTrue(cond: Column): Column = cond <=> lit(true)
  private def strictFalse(cond: Column): Column = cond <=> lit(false)

  // ------------------------------------------------------------ grouping

  private def groupFields(v: View): Seq[Group] = {
    val grouped = mutable.LinkedHashMap[String, mutable.Buffer[(ViewField, Int)]]()
    v.fields.zipWithIndex.foreach { case (f, i) =>
      val cd = f.localCol.getOrElse(throw new IllegalArgumentException(
        s"Field '${f.desc}' of view on '${v.table.name}' cannot be written"))
      if (cd.ctype.isInstanceOf[ColType.O2M]) throw new IllegalArgumentException(
        s"Cannot write to one-to-many column '${cd.name}'")
      grouped.getOrElseUpdate(cd.name, mutable.Buffer()) += ((f, i))
    }
    grouped.map { case (cn, items) => Group(v.table.column(cn), items.toSeq) }.toSeq
  }

  /** All key columns (or id) must be mapped (tanker view.py:451-467). */
  private def validateKey(v: View, mapped: Set[String]): Unit =
    if (!mapped.contains("id")) {
      val missing = v.table.key.filterNot(mapped)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        "You must reference all the columns composing the table key when " +
        s"""you want to write, delete or reference rows (or pass the id column). Table is "${v.table.name}", missing columns are: ${missing.mkString(",")}""")
    }

  // ------------------------------------------------------------- staging

  /** Spark type a dotted tail resolves to in the remote table. */
  private def tailType(env: Env, table: String, path: String): DataType = {
    val td = env.registry(table)
    if (td.has(path)) td.column(path).ctype.spark.getOrElse(
      throw new IllegalArgumentException(s"Cannot write via virtual column '$path'"))
    else {
      if (!path.contains(".")) throw new NoSuchElementException(
        s"Column '$path' not found in table '$table'")
      val Array(h, rest) = path.split("\\.", 2)
      tailType(env, env.registry.hop(table, h).toTable, rest)
    }
  }

  private def stagingType(env: Env, f: ViewField): DataType = f.kind match {
    case ViewField.Col(cd) => cd.ctype.spark.getOrElse(
      throw new IllegalArgumentException(s"Cannot write to '${cd.name}'"))
    case ViewField.Path(head) =>
      val m2o = head.ctype.asInstanceOf[ColType.M2O]
      tailType(env, m2o.table, f.desc.split("\\.", 2)(1))
    case _ => throw new IllegalArgumentException(
      s"Field '${f.desc}' cannot be written")
  }

  /** Normalize input (rows / maps / single map / tuples / DataFrame,
    * tanker view.py:398-416) into a staged frame with one coerced
    * column `__f<i>` per view field plus a `__seq` input-order column. */
  private def stage(env: Env, v: View, data: Any): DataFrame = {
    val fields = v.fields
    val types = fields.map(stagingType(env, _))
    val schema = StructType(
      types.zipWithIndex.map { case (t, i) => StructField(s"__f$i", t, nullable = true) } :+
      StructField("__seq", LongType, nullable = false))

    def fromRows(rows: Seq[Seq[Any]]): DataFrame = {
      val coerced = rows.zipWithIndex.map { case (r, idx) =>
        require(r.size == fields.size,
          s"Row has ${r.size} values for ${fields.size} fields")
        Row.fromSeq(r.zip(types).map { case (value, t) => Coerce.to(value, t) } :+ idx.toLong)
      }
      env.spark.createDataFrame(coerced.asJava, schema)
    }

    data match {
      case ds: org.apache.spark.sql.Dataset[_] =>
        // `__seq` decides which occurrence wins when a batch holds
        // duplicate keys ("last wins", view.py:306-318). A DataFrame
        // has no inherent row order, so dup-key priority for DataFrame
        // inputs follows partition order and is UNDEFINED across
        // retries (the reference has the same per-batch ambiguity —
        // dict-driven executemany order). Callers needing a defined
        // winner must pre-dedupe or pass a local collection.
        val cols = fields.zipWithIndex.map { case (f, i) =>
          c(f.name).cast(types(i)).as(s"__f$i")
        }
        ds.toDF().select(cols :+ monotonically_increasing_id().as("__seq"): _*)
      case null => fromRows(Nil)
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        fromRows(Seq(fields.map(f => mm.get(f.name).orNull)))
      case s: Iterable[_] =>
        val rows = s.toSeq.map {
          case m: Map[_, _] =>
            val mm = m.asInstanceOf[Map[String, Any]]
            fields.map(f => mm.get(f.name).orNull)
          case r: Seq[_] => r.asInstanceOf[Seq[Any]]
          case a: Array[_] => a.toSeq
          case p: Product => p.productIterator.toSeq
          case other => Seq(other) // single-field views accept bare values
        }
        fromRows(rows)
      case other => throw new IllegalArgumentException(
        s"Unsupported write input: ${other.getClass.getName}")
    }
  }

  // -------------------------------------------------------- FK resolution

  /** Staged frame → batch frame with one column per physical target
    * column; dotted FK groups joined against their remote views
    * (tanker resolve_fk, view.py:642-711). Violation conditions
    * (unknown FK values) are accumulated, not checked here — the
    * caller validates everything in ONE Spark action. */
  private def resolve(env: Env, v: View, groups: Seq[Group], staged: DataFrame)
      : (DataFrame, Seq[(Column, Seq[Column], String)]) = {
    var df = staged
    val out = mutable.Buffer[(String, String)]() // (source col, target name)
    val checks = mutable.Buffer[(Column, Seq[Column], String)]() // (cond, sample, msg)
    groups.zipWithIndex.foreach { case (g, gi) =>
      def anyNonNull = g.items.map { case (_, i) => c(s"__f$i").isNotNull }.reduce(_ || _)
      def sample = g.items.map { case (_, i) => c(s"__f$i").cast("string") }
      g.m2o match {
        case Some(m2o) if !g.byId =>
          val tails = g.items.map { case (f, _) => f.desc.split("\\.", 2)(1) }
          val fkName = s"__fk$gi"
          val kName = (j: Int) => s"__g${gi}_k$j"
          val lookupFields = tails.zipWithIndex.map { case (tl, j) => (kName(j), tl) } :+
            ((fkName, m2o.col))
          val lookup = env.viewNamed(m2o.table, lookupFields).read(disableAcl = true)
          val cond = g.items.zipWithIndex.map { case ((_, i), j) =>
            c(s"__f$i") === c(kName(j))
          }.reduce(_ && _)
          df = df.join(lookup, cond, "left")
          checks += ((anyNonNull && c(fkName).isNull, sample,
            s"""are not known in table "${m2o.table}""""))
          df = df.drop(tails.indices.map(kName): _*)
          out += fkName -> g.col.name
        case Some(m2o) => // fk given by id: emulate the FK constraint
          val (_, i) = g.items.head
          val refName = s"__ref$gi"
          val remote = env.warehouse.read(m2o.table)
            .select(c(m2o.col).as(refName)).distinct()
          df = df.join(remote, c(s"__f$i") === c(refName), "left")
          checks += ((anyNonNull && c(refName).isNull, sample,
            s"""are not known in table "${m2o.table}""""))
          df = df.drop(refName)
          out += s"__f$i" -> g.col.name
        case None =>
          out += s"__f${g.items.head._2}" -> g.col.name
      }
    }
    // violation flags/samples computed while the staged `__f` columns
    // are still present, carried as two array columns
    val vflags =
      if (checks.isEmpty) array().cast("array<string>")
      else array(checks.toSeq.map(_._1.cast("string")): _*)
    val vsamples =
      if (checks.isEmpty) array().cast("array<string>")
      else array(checks.toSeq.map { case (_, smp, _) => concat_ws(", ", smp: _*) }: _*)
    val withSamples = df.select(
      out.toSeq.map { case (s, o) => c(s).as(o) } :+ c("__seq") :+
        vflags.as("__vflags") :+ vsamples.as("__vsamples"): _*)
    (withSamples, checks.toSeq)
  }

  /** Normalized, coerced, FK-resolved, key-checked, key-deduped batch.
    * All violations (unknown FK values, null key columns) surface via
    * a single Spark action. */
  /** Returns (deduped batch, the persisted resolved frame backing it —
    * caller unpersists when done). The staging+FK-resolve subplan is
    * computed ONCE: the validation probe below is the cache's
    * materializing action, and the dedupe plus every downstream
    * reference (bucket set, write filters, merge join, insert
    * anti-join) read from the cache instead of re-running staging
    * (previously the validation action ran the full resolve subplan
    * and the batch's first consumer ran it AGAIN — two passes over
    * the raw batch per write; guide §1.2). */
  private def prepare(v: View, groups: Seq[Group], data: Any)
      : (DataFrame, DataFrame) = {
    val env = v.env
    val keyCols = v.keyCols
    val (resolved0, checks) = resolve(env, v, groups, stage(env, v, data))
    val resolved = resolved0.persist()
    // Violations: unknown FKs (view.py:700-711) + null key values (tmp
    // key columns are NOT NULL, view.py:306-318) — one action for all
    // (validation is PRE-dedupe, as in the reference: a bad row raises
    // even when a later row with the same key would supersede it).
    val nullKey = keyCols.map(k => c(k).isNull).reduce(_ || _)
    val bad = resolved
      .filter(nullKey || (if (checks.isEmpty) lit(false)
        else expr("exists(__vflags, f -> f = 'true')")))
      .select(c("__vflags") +: c("__vsamples") +: keyCols.map(c): _*)
      .limit(1).collect()
    if (bad.nonEmpty) {
      val row = bad.head
      val flags = row.getSeq[String](0)
      val samples = row.getSeq[String](1)
      val fkHit = flags.indexWhere(_ == "true")
      if (fkHit >= 0) throw new IllegalArgumentException(
        s"Values (${samples(fkHit)}) ${checks(fkHit)._3}")
      throw new IllegalArgumentException(
        s"Null value in key column when writing on table '${v.table.name}'")
    }
    // Dedupe on key, last occurrence wins (one row per key per batch):
    // max_by on the unique `__seq` — same winner as the previous
    // row_number window (order by __seq desc, rn = 1) but a partial-
    // aggregable hash aggregate instead of a shuffle + full sort.
    val payload = resolved.columns
      .filter(cn => cn != "__vflags" && cn != "__vsamples" && cn != "__seq")
    val deduped = resolved
      .groupBy(keyCols.map(c): _*)
      .agg(max_by(struct(payload.map(c): _*), c("__seq")).as("__r"))
      .select(payload.map(cn => col(s"__r.`$cn`").as(cn)): _*)
    (deduped, resolved)
  }

  // -------------------------------------------------------- write filters

  /** 'new' pass: drop batch rows whose filter over incoming values is
    * strictly false. Mapped columns resolve to the batch, unmapped ones
    * to the stored row (FROM tmp LEFT JOIN main, aliases → tmp;
    * tanker view.py:600-613). */
  private def newPass(v: View, b: DataFrame, cur: DataFrame, mapped: Set[String],
      keyCols: Seq[String], filters: Seq[Filter], argv: Args): DataFrame = {
    val env = v.env
    val frame = () => {
      val cond = keyCols.map(k => col(s"__t.$k") === col(s"__m.$k")).reduce(_ && _)
      b.as("__t").join(cur.as("__m"), cond, "left")
    }
    val qb = new QueryBuilder(env, v.table, frame,
      cn => if (mapped(cn)) "__t" else "__m", None, v.fieldEnv)
    val cond = filters.map(f => v.compileFilter(qb, f, argv)).reduce(_ && _)
    qb.wideFrame().filter(!strictFalse(cond))
      .select(b.columns.map(cn => col(s"__t.`$cn`").as(cn)).toSeq: _*)
  }

  /** 'old' pass: drop batch rows whose key exists in the stored table
    * and whose filter over the STORED values is strictly false
    * (FROM tmp INNER JOIN main, no aliases; tanker view.py:563-567).
    * `cur` may be a bucket-pruned frame — rows outside it can't match
    * the batch keys anyway. */
  private def oldPass(v: View, b: DataFrame, cur: DataFrame, keyCols: Seq[String],
      filters: Seq[Filter], argv: Args): DataFrame = {
    val qb = new QueryBuilder(v.env, v.table, () => cur.as(v.table.name),
      _ => v.table.name, None, v.fieldEnv)
    val cond = filters.map(f => v.compileFilter(qb, f, argv)).reduce(_ && _)
    val failing = qb.wideFrame().filter(strictFalse(cond))
      .select(keyCols.map(k => col(s"${v.table.name}.`$k`").as(k)): _*).distinct()
    b.join(failing, keyCols, "left_anti")
  }

  /** Deterministic surrogate ids without a single-task window.
    *
    * `Window.orderBy(key)` with no partition funnels the whole insert
    * batch through ONE task — the classic global-row_number scale
    * killer. Instead: range-partition on the key and sort within
    * partitions (now globally sorted), collect per-partition counts
    * (a few bytes per partition), then assign
    * `maxId + partitionOffset + localRank` per partition. A row's id
    * is its global key-rank regardless of where the range boundaries
    * fall, so ids are deterministic across runs and retries (keys are
    * unique after the batch dedupe). Returns the frame and the new id
    * high-water mark (maxId + batch size).
    */
  private def assignIds(env: Env, df: DataFrame, keyCols: Seq[String],
      maxId: Long): (DataFrame, Long, org.apache.spark.rdd.RDD[Row]) = {
    // persist the sorted RDD: it is consumed twice (count pass + assign
    // pass) and the range-partition shuffle + sort should run once
    val rdd = df.repartitionByRange(keyCols.map(c): _*)
      .sortWithinPartitions(keyCols.map(c): _*)
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val withIds = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = maxId + offsets(i)
      it.map { row => n += 1; Row.fromSeq(row.toSeq :+ n) }
    }
    val schema = StructType(df.schema.fields :+
      StructField("id", LongType, nullable = false))
    (env.spark.createDataFrame(withIds, schema), maxId + offsets.last, rdd)
  }

  /** Encoded [min, max] of every batch key column, or None for an
    * empty batch (caller falls back to the full-table path). A stored
    * key can only collide with a batch key when EVERY key column
    * falls inside the batch's range for that column, so each bound
    * prunes independently. Key nulls were already rejected by
    * [[prepare]]. */
  private def batchKeyBounds(b: DataFrame, keyCols: Seq[String])
      : Option[Map[String, graft.store.Brin.Bounds]] = {
    val aggs = keyCols.flatMap(k => Seq(min(c(k)), max(c(k))))
    val r = b.agg(aggs.head, aggs.tail: _*).head()
    if (r.isNullAt(0)) None
    else Some(keyCols.zipWithIndex.map { case (k, i) =>
      k -> graft.store.Brin.Bounds(
        Some(graft.store.Brin.encode(r.get(2 * i))),
        Some(graft.store.Brin.encode(r.get(2 * i + 1))))
    }.toMap)
  }

  // --------------------------------------------------------------- write

  def run(v: View, data: Any, purge: Boolean, insert: Boolean, update: Boolean,
      filters: Seq[Filter], args: Seq[Any], kwargs: Map[String, Any],
      disableAcl: Boolean): WriteResult = {
    val env = v.env
    val t = v.table
    require(t.external.isEmpty, s"Table '${t.name}' is external (read-only)")
    val groups = groupFields(v)
    val mapped = groups.map(_.col.name).toSet
    validateKey(v, mapped)
    val keyCols = v.keyCols
    val argv = Args(env, args, kwargs)

    val (prepared, resolvedCache) = prepare(v, groups, data)
    var b = prepared.persist()

    // Bucket pruning: when the table is key-hash bucketed and the
    // merge is keyed on the natural key (and purge doesn't need the
    // whole table), only the buckets the batch keys hash into are
    // read and rewritten — write cost scales with the batch, not the
    // table (SURVEY §4 100-TB merge path).
    val affected: Option[Set[Int]] =
      if (t.buckets > 0 && !purge && keyCols == t.key)
        Some(b.select(env.warehouse.bucketExpr(t).as("__bk")).distinct()
          .collect().map(_.getInt(0)).toSet)
      else None
    // Zone pruning (brin tables): a stored key can only collide with a
    // batch key if its leading-key value falls inside the batch's key
    // range, so the merge reads and rewrites just the overlapping
    // zones; disjoint zones carry over by reference. The append-mostly
    // table brin targets merges its recent-key batch into 1-2 zones.
    val zoneBounds: Option[Map[String, graft.store.Brin.Bounds]] =
      if (affected.isEmpty && t.useIndex.equalsIgnoreCase("brin") &&
          t.buckets == 0 && !purge && keyCols == t.key)
        batchKeyBounds(b, t.key)
      else None
    val cur = affected match {
      case Some(bs) => env.warehouse.readBuckets(t.name, Some(bs))
      case None => zoneBounds match {
        case Some(zb) => env.warehouse.readZones(t.name, Some(zb))
        case None => env.warehouse.read(t.name)
      }
    }

    val allFilters: Seq[Filter] = filters ++
      (if (disableAcl) Nil
       else env.aclWrite.getOrElse(t.name, Nil).map(FilterExpr.apply))

    var filtered = 0L
    if (allFilters.nonEmpty) {
      val total = b.count()
      val kept = oldPass(v, newPass(v, b, cur, mapped, keyCols, allFilters, argv),
        cur, keyCols, allFilters, argv).persist()
      filtered = total - kept.count()
      b.unpersist()
      b = kept
    }

    // Purge: stored rows absent from the batch (and matching the
    // filters) are removed before the merge (view.py:554-631).
    var base = cur
    var deleted = 0L
    if (purge) {
      val bKeys = b.select(keyCols.map(c): _*)
      val doomed0 =
        if (allFilters.isEmpty) cur.join(bKeys, keyCols, "left_anti")
        else {
          val qb = QueryBuilder(env, t, v.fieldEnv)
          val cond = allFilters.map(f => v.compileFilter(qb, f, argv)).reduce(_ && _)
          qb.wideFrame().filter(strictTrue(cond))
            .select(keyCols.map(k => col(s"${t.name}.`$k`").as(k)): _*).distinct()
            .join(bKeys, keyCols, "left_anti")
        }
      val doomed = doomed0.persist()
      deleted = doomed.count()
      base = cur.join(doomed, keyCols, "left_anti")
    }

    // Update step: stored rows keep their identity; mapped non-key
    // columns are overwritten from the batch when matched (and update
    // is on) — unmapped columns always preserved.
    val joinCond = keyCols.map(k => col(s"__m.$k") === col(s"__t.$k")).reduce(_ && _)
    val tb = b.withColumn("__p", lit(true)).as("__t")
    val joined = base.as("__m").join(tb, joinCond, "left")
    val tPresent = col("__t.__p").isNotNull
    val updatedCols = t.physical.map { cd =>
      val mc = col(s"__m.`${cd.name}`")
      if (!update || keyCols.contains(cd.name) || !mapped(cd.name)) mc.as(cd.name)
      else when(tPresent, col(s"__t.`${cd.name}`")).otherwise(mc).as(cd.name)
    }
    val updated = joined.select(updatedCols: _*)

    // Insert step: batch rows with no stored match get surrogate ids
    // (max(id) + rank in key order: deterministic, no
    // monotonically_increasing_id in stored data) and column defaults.
    // The high-water mark comes from Warehouse.maxId — manifest-
    // tracked, so no full scan per batch.
    var newMaxId = -1L
    var sortedCache: Option[org.apache.spark.rdd.RDD[Row]] = None
    val result =
      if (!insert) updated
      else {
        val newRows0 = b.join(base.select(keyCols.map(c): _*), keyCols, "left_anti")
        val withId =
          if (mapped("id")) newRows0
          else {
            val maxId = env.warehouse.maxId(t.name)
            val (assigned, hwm, cache) = assignIds(env, newRows0, keyCols, maxId)
            newMaxId = hwm
            sortedCache = Some(cache)
            assigned
          }
        val insCols = t.physical.map { cd =>
          if (mapped(cd.name) || cd.name == "id") c(cd.name).as(cd.name)
          else cd.default match {
            case Some(d) => expr(d).cast(cd.ctype.spark.get).as(cd.name)
            case None => lit(null).cast(cd.ctype.spark.get).as(cd.name)
          }
        }
        updated.unionByName(withId.select(insCols: _*))
      }

    (affected, zoneBounds) match {
      case (Some(bs), _) =>
        val hwm = if (newMaxId >= 0) newMaxId else env.warehouse.maxId(t.name)
        env.warehouse.writeBuckets(t.name, result, bs, hwm)
      case (None, Some(zb)) =>
        val hwm = if (newMaxId >= 0) newMaxId else env.warehouse.maxId(t.name)
        env.warehouse.writeZones(t.name, result, zb, hwm)
      case _ =>
        // maxId is exact (old max + inserts) unless purge may have
        // removed the previous max row — then let the store re-derive
        // it from the written snapshot (id-column-only read).
        val hwm = if (newMaxId >= 0 && deleted == 0) Some(newMaxId) else None
        env.warehouse.write(t.name, result, hwm)
    }
    b.unpersist()
    resolvedCache.unpersist(blocking = false)
    sortedCache.foreach(_.unpersist(blocking = false))
    WriteResult(filtered, deleted)
  }

  // -------------------------------------------------------------- delete

  def delete(v: View, filters: Seq[Filter], data: Any, args: Seq[Any],
      kwargs: Map[String, Any], swap: Boolean): Long = {
    val env = v.env
    val t = v.table
    require(t.external.isEmpty, s"Table '${t.name}' is external (read-only)")
    val cur = env.warehouse.read(t.name).persist()
    var resolvedCache: Option[DataFrame] = None
    try {
      val total = cur.count()
      if (data == null && filters.isEmpty) {
        // delete all (tanker view.py:257-259)
        env.warehouse.write(t.name, env.warehouse.empty(t))
        return total
      }
      if (data != null && filters.nonEmpty)
        throw new IllegalArgumentException(
          "Deletion by both data and filter not supported")

      val remaining =
        if (data != null) {
          val groups = groupFields(v)
          validateKey(v, groups.map(_.col.name).toSet)
          val keyCols = v.keyCols
          val (preparedKeys, rc) = prepare(v, groups, data)
          resolvedCache = Some(rc)
          val bKeys = preparedKeys.select(keyCols.map(c): _*)
          // bucket-pruned delete: only buckets holding batch keys can
          // lose rows (not with swap — that deletes everywhere else)
          if (t.buckets > 0 && !swap && keyCols == t.key) {
            val bs = bKeys.select(env.warehouse.bucketExpr(t).as("__bk"))
              .distinct().collect().map(_.getInt(0)).toSet
            val slice = env.warehouse.readBuckets(t.name, Some(bs)).persist()
            val keptSlice = slice.join(bKeys, keyCols, "left_anti").persist()
            val removed = slice.count() - keptSlice.count()
            env.warehouse.writeBuckets(t.name, keptSlice, bs,
              env.warehouse.maxId(t.name))
            keptSlice.unpersist(); slice.unpersist()
            return removed
          }
          // zone-pruned delete: only zones overlapping the batch's key
          // range can lose rows (not with swap — that deletes the rest)
          if (t.useIndex.equalsIgnoreCase("brin") && t.buckets == 0 &&
              !swap && keyCols == t.key) {
            batchKeyBounds(bKeys, t.key) match {
              case Some(zb) =>
                val slice = env.warehouse.readZones(t.name, Some(zb)).persist()
                val keptSlice = slice.join(bKeys, keyCols, "left_anti").persist()
                val removed = slice.count() - keptSlice.count()
                env.warehouse.writeZones(t.name, keptSlice, zb,
                  env.warehouse.maxId(t.name))
                keptSlice.unpersist(); slice.unpersist()
                return removed
              case None => return 0L // empty batch deletes nothing
            }
          }
          cur.join(bKeys, keyCols, if (swap) "left_semi" else "left_anti")
        } else {
          val qb = QueryBuilder(env, t, v.fieldEnv)
          val argv = Args(env, args, kwargs)
          val cond = filters.map(f => v.compileFilter(qb, f, argv)).reduce(_ && _)
          val doomedIds = qb.wideFrame().filter(strictTrue(cond))
            .select(col(s"${t.name}.id").as("id")).distinct()
          cur.join(doomedIds, Seq("id"), if (swap) "left_semi" else "left_anti")
        }
      val rem = remaining.persist()
      val kept = rem.count()
      env.warehouse.write(t.name, rem)
      rem.unpersist()
      total - kept
    } finally {
      cur.unpersist()
      resolvedCache.foreach(_.unpersist(blocking = false))
    }
  }
}
