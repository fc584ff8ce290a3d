package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: the key-level change audit between two
  * versions of a table — the release-QA step a training-data pipeline
  * runs before swapping corpora ("what got added, what vanished, what
  * changed, and did the deletion rate spike?").
  *
  * Scale shape: both sides reduce to `(key, xxhash64(canonical
  * payload))` BEFORE the join, so the full-outer join shuffles key +
  * one long per row — never document payloads — and unchanged rows
  * (the overwhelming majority between adjacent corpus versions) cost
  * one hash comparison each. The canonical payload is the JSON of a
  * name-sorted struct, so column order never affects the verdict and
  * null-shape differences stay distinguishable.
  */
object Diff {

  /** Canonical payload hash: xxhash64 of the name-sorted non-key
    * struct as JSON. JSON (not a bare multi-arg hash) because Spark's
    * hash functions skip null children — `hash(null, x)` equals
    * `hash(x, null)` — which would read a value sliding from one
    * column to its neighbour as "unchanged".
    *
    * Two canonicalizations on top of the name sort: map-typed values
    * melt to KEY-SORTED entry arrays (map JSON would otherwise compare
    * by insertion order, reading logically-equal maps built in
    * different orders as "changed"), and `ignoreNullFields` is pinned
    * to false (null columns serialize explicitly) rather than
    * inheriting the session conf — which also keeps the documented
    * side-only-column semantics exact: a row that is all-null in the
    * columns only one side has still differs (the null fields are
    * present in one JSON and absent from the other). */
  private def payloadHash(df: DataFrame, keyCols: Seq[String]): Column = {
    val payload = df.columns.toSeq.diff(keyCols).sorted
    require(payload.nonEmpty, "diff needs at least one non-key column")
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    xxhash64(to_json(struct(payload.map(n =>
        canonical(col(s"`$n`"), fields(n)).as(n)): _*),
      Map("ignoreNullFields" -> "false")))
  }

  private def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(e, _) => hasMap(e)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
  }

  /** Order-independent form of a value: every map (at any nesting
    * depth) becomes its entry array sorted by key. Inner maps
    * canonicalize first, so the sort never compares raw map values
    * (maps are not orderable; their entry arrays are). */
  private def canonical(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case MapType(k, v, _) =>
        array_sort(transform(map_entries(c), e =>
          struct(canonical(e.getField("key"), k).as("key"),
            canonical(e.getField("value"), v).as("value"))))
      case ArrayType(e, _) if hasMap(e) =>
        transform(c, x => canonical(x, e))
      case StructType(fs) if fs.exists(f => hasMap(f.dataType)) =>
        // null-guarded: rebuilding an all-null struct from a NULL
        // struct must stay NULL, not become a struct of nulls
        when(c.isNotNull, struct(fs.map(f =>
          canonical(c.getField(f.name), f.dataType).as(f.name)).toSeq: _*))
      case _ => c
    }
  }

  /** One row per DIFFERING key between `before` and `after`:
    * `(keyCols…, change ∈ added | removed | changed)`. Unchanged keys
    * are dropped. Both frames must share the key columns; payload
    * columns are compared by name (columns only one side has count as
    * a change for every row, which is what a schema migration is).
    *
    * Keys need not be unique: each side reduces to the key's payload
    * MULTISET — (row count, order-independent sum of row hashes) —
    * so a key whose duplicate count changed, or whose duplicates'
    * contents changed, reads `changed` instead of fanning out the
    * join. The aggregate and the full-outer join share one key
    * partitioning (no extra exchange). */
  def diff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    // decimal accumulator: a plain long sum of 64-bit hashes overflows
    // almost immediately — silent (deterministic) wrap with ANSI off,
    // but a runtime ARITHMETIC_OVERFLOW under ANSI mode; the decimal
    // sum's 30-digit accumulator holds ~1e11 duplicate rows per key,
    // far past any real multiset
    def melt(df: DataFrame, cnt: String, hsh: String) =
      df.select(keys :+ payloadHash(df, keyCols).as("__h"): _*)
        .groupBy(keys: _*)
        .agg(count(lit(1)).as(cnt),
          sum(col("__h").cast("decimal(20,0)")).as(hsh))
    val b = melt(before, "__cb", "__hb")
    val a = melt(after, "__ca", "__ha")
    b.join(a, keyCols, "full_outer")
      .withColumn("change",
        when(col("__cb").isNull, lit("added"))
          .when(col("__ca").isNull, lit("removed"))
          .when(col("__cb") =!= col("__ca") || col("__hb") =!= col("__ha"),
            lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys :+ col("change"): _*)
  }

  /** [[diff]] rolled up to the release-gate summary: one row per
    * change kind with its count (a corpus swap whose `removed` count
    * spikes is the thing this exists to catch). */
  def diffSummary(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame =
    diff(before, after, keyCols)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
