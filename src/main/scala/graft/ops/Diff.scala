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
    * column to its neighbour as "unchanged". */
  private def payloadHash(df: DataFrame, keyCols: Seq[String]): Column = {
    val payload = df.columns.toSeq.diff(keyCols).sorted
    require(payload.nonEmpty, "diff needs at least one non-key column")
    xxhash64(to_json(struct(payload.map(col): _*)))
  }

  /** One row per DIFFERING key between `before` and `after`:
    * `(keyCols…, change ∈ added | removed | changed)`. Unchanged keys
    * are dropped. Both frames must share the key columns; payload
    * columns are compared by name (columns only one side has count as
    * a change for every row, which is what a schema migration is). */
  def diff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val b = before.select(keyCols.map(col) :+
      payloadHash(before, keyCols).as("__hb"): _*)
    val a = after.select(keyCols.map(col) :+
      payloadHash(after, keyCols).as("__ha"): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("change",
        when(col("__hb").isNull, lit("added"))
          .when(col("__ha").isNull, lit("removed"))
          .when(col("__hb") =!= col("__ha"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** [[diff]] rolled up to the release-gate summary: one row per
    * change kind with its count (a corpus swap whose `removed` count
    * spikes is the thing this exists to catch). */
  def diffSummary(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame =
    diff(before, after, keyCols)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
