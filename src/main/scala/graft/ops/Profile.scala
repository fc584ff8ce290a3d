package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling: the "know your data" pass a training pipeline
  * runs before anything else — per-column completeness, cardinality
  * and value range, in scan shapes that survive 100 TB.
  *
  * Why not one `agg(countDistinct(a), countDistinct(b), ...)`: Spark
  * plans multiple distinct aggregates via an Expand node that
  * replicates EVERY input row once per distinct aggregate — profiling
  * 20 columns would scan-equivalent 20x the corpus. Instead:
  *
  *  - counts + min/max: ONE wide aggregate (2-3 simple aggs per
  *    column, all map-side combinable, no row replication);
  *  - distinct counts: ONE melt pass — each row emits its (column,
  *    canonical value) pairs, a two-stage groupBy dedupes then counts
  *    per column. Narrow, combinable, and the shuffle carries only
  *    the distinct survivors of each partition.
  *
  * Values are canonicalized to strings for the reported min/max (so
  * mixed-type profiles fit one output schema); distinct counting is
  * by a 64-bit hash of that canonical form — the melt shuffle carries
  * (column-name, long) pairs regardless of value width, so profiling
  * a document-text column costs the same as profiling a tinyint.
  */
object Profile {

  /** One row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_value, max_value).
    * min/max are computed on the NATIVE type (numeric/time ordering,
    * not lexicographic) and rendered to string after. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val d = Par.spread(df)
    // pass 1: one wide agg — counts and native-ordered min/max
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { cn =>
      Seq(count(col(cn)).as(s"__c_$cn"),
        min(col(cn)).cast("string").as(s"__mn_$cn"),
        max(col(cn)).cast("string").as(s"__mx_$cn"))
    }
    val wideRow = d.agg(aggs.head, aggs.tail: _*)
    val wide = wideRow.select(explode(array(cols.map { cn =>
      struct(lit(cn).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__c_$cn")).as("n_nulls"),
        col(s"__mn_$cn").as("min_value"), col(s"__mx_$cn").as("max_value"))
    }: _*)).as("__p")).select(col("__p.*"))
    // pass 2: melt → two-stage distinct per column (null excluded,
    // matching SQL count(distinct)). The melt carries a 64-bit hash of
    // the canonical string, NEVER the string itself: a document-text
    // column's canonical form IS the document, and shuffling it would
    // move the corpus payload through the distinct pass (r8 verdict).
    // xxhash64 collisions at profile granularity are negligible
    // (n²/2⁶⁵ — one in ~10¹⁰ even at a billion distinct values);
    // count-distinct-by-hash matches exact count(distinct) for every
    // test oracle. Nulls are excluded BEFORE hashing (xxhash64 maps a
    // null input to its seed, which would count as a value).
    val melted = d.select(explode(array(cols.map { cn =>
      struct(lit(cn).as("__col"),
        when(col(cn).isNotNull,
          xxhash64(col(cn).cast("string"))).as("__val"))
    }: _*)).as("__m")).select(col("__m.__col"), col("__m.__val"))
      .filter(col("__val").isNotNull)
    val distincts = melted.groupBy(col("__col"), col("__val")).agg(count(lit(1)))
      .groupBy(col("__col")).agg(count(lit(1)).as("n_distinct"))
      .withColumnRenamed("__col", "column")
    wide.join(distincts, Seq("column"), "left")
      .na.fill(0L, Seq("n_distinct"))
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** [[columns]] PER GROUP: the same data card keyed by `groupCol` —
    * the per-source / per-language release stats a corpus datasheet
    * tabulates. One row per (group, column):
    * (group, column, n_rows, n_nulls, n_distinct, min_value,
    * max_value); a NULL group value profiles as its own group (the
    * rows exist, a datasheet must count them).
    *
    * Scale shape mirrors [[columns]] exactly — the wide aggregate
    * gains a groupBy key (still map-side combinable, state ∝ groups ×
    * columns) and the distinct melt dedupes (group, column, hash)
    * triples, payloads never move. */
  def columnsBy(df: DataFrame, cols: Seq[String], groupCol: String): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(!cols.contains(groupCol),
      s"group column '$groupCol' cannot also be profiled")
    val d = Par.spread(df)
    val g = col(groupCol).as("group")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { cn =>
      Seq(count(col(cn)).as(s"__c_$cn"),
        min(col(cn)).cast("string").as(s"__mn_$cn"),
        max(col(cn)).cast("string").as(s"__mx_$cn"))
    }
    val wide = d.groupBy(g).agg(aggs.head, aggs.tail: _*)
      .select(col("group"), explode(array(cols.map { cn =>
        struct(lit(cn).as("column"), col("__n").as("n_rows"),
          (col("__n") - col(s"__c_$cn")).as("n_nulls"),
          col(s"__mn_$cn").as("min_value"), col(s"__mx_$cn").as("max_value"))
      }: _*)).as("__p")).select(col("group"), col("__p.*"))
    val melted = d.select(g, explode(array(cols.map { cn =>
      struct(lit(cn).as("__col"),
        when(col(cn).isNotNull,
          xxhash64(col(cn).cast("string"))).as("__val"))
    }: _*)).as("__m")).select(col("group"),
        col("__m.__col"), col("__m.__val"))
      .filter(col("__val").isNotNull)
    val distincts = melted
      .groupBy(col("group"), col("__col"), col("__val")).agg(count(lit(1)))
      .groupBy(col("group"), col("__col")).agg(count(lit(1)).as("n_distinct"))
      .withColumnRenamed("__col", "column")
    // null-safe group key: a NULL group's card must still pick up its
    // distinct counts (plain equi-join would null them out)
    wide.as("w").join(distincts.as("d"),
        col("w.group") <=> col("d.group") &&
          col("w.column") === col("d.column"), "left")
      .select(col("w.group").as("group"), col("w.column").as("column"),
        col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }

  /** [[columns]] with SKETCHED distinct counts: the same data-card
    * schema, but `n_distinct` comes from `approx_count_distinct`
    * (HyperLogLog++, relative error `rsd`) computed inside the SAME
    * wide aggregate as the counts and min/max — ONE pass over the
    * corpus with fixed-size state per column, no melt, no second
    * shuffle. The swap-in for columns whose distinct count is itself
    * corpus-scale (ids, urls, hashes at 100 TB), where the exact
    * two-stage distinct's shuffle is the profiling cost. Exact path
    * stays [[columns]]; sketch error is engine-specific, so this
    * variant is spec-gated against the exact counts rather than
    * DuckDB-oracled. */
  def columnsApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val d = Par.spread(df)
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { cn =>
      Seq(count(col(cn)).as(s"__c_$cn"),
        approx_count_distinct(col(cn), rsd).as(s"__d_$cn"),
        min(col(cn)).cast("string").as(s"__mn_$cn"),
        max(col(cn)).cast("string").as(s"__mx_$cn"))
    }
    d.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { cn =>
        struct(lit(cn).as("column"), col("__n").as("n_rows"),
          (col("__n") - col(s"__c_$cn")).as("n_nulls"),
          col(s"__d_$cn").as("n_distinct"),
          col(s"__mn_$cn").as("min_value"), col(s"__mx_$cn").as("max_value"))
      }: _*)).as("__p")).select(col("__p.*"))
  }

  /** Per-column profile DRIFT between two corpus versions: one row
    * per column with before/after row, null and distinct counts,
    * min/max, and the count deltas — the data-card diff a release
    * gate prints next to [[psi]]'s distribution score (psi says "the
    * numeric shape moved", compare says WHERE: a null-rate spike, a
    * cardinality collapse, a range extension). Two [[columns]] passes
    * + a cols-sized join; corpus payloads never move. */
  def compare(before: DataFrame, after: DataFrame,
      cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, sfx: String) = columns(df, cols).select(
      col("column"),
      col("n_rows").as(s"rows_$sfx"), col("n_nulls").as(s"nulls_$sfx"),
      col("n_distinct").as(s"distinct_$sfx"),
      col("min_value").as(s"min_$sfx"), col("max_value").as(s"max_$sfx"))
    side(before, "before").join(side(after, "after"), Seq("column"))
      .withColumn("rows_delta", col("rows_after") - col("rows_before"))
      .withColumn("nulls_delta", col("nulls_after") - col("nulls_before"))
      .withColumn("distinct_delta",
        col("distinct_after") - col("distinct_before"))
  }

  /** Fixed-width histogram of a numeric column over [lo, hi): one row
    * per non-empty bin, (bin, bin_lo, bin_hi, n). Values outside the
    * range clamp into the edge bins (a data-QA histogram must show
    * outliers, not drop them); nulls are excluded. One narrow scan +
    * one combinable count per bin — the shuffle carries at most
    * `bins` rows per partition. */
  def histogram(df: DataFrame, column: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "histogram needs bins > 0 and hi > lo")
    val v = col(column).cast("double")
    val raw = floor((v - lit(lo)) / lit((hi - lo) / bins)).cast("int")
    val bin = least(greatest(raw, lit(0)), lit(bins - 1))
    val w = (hi - lo) / bins
    Par.spread(df).filter(v.isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(w)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(w)).as("bin_hi"),
        col("n"))
  }

  /** Population Stability Index between two corpus versions of a
    * numeric column — the standard distribution-shift release gate
    * (conventional read: < 0.1 stable, 0.1–0.25 moderate shift,
    * > 0.25 investigate): both sides bin into the SHARED fixed-width
    * [[histogram]] grid (outliers clamp into the edge bins), bin
    * shares smooth additively (`(n + 0.5) / (N + bins/2)`, so empty
    * bins stay finite), and
    * `PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)`.
    * Returns one row `(psi, n_before, n_after)`, psi rounded to 6dp.
    *
    * Scale shape: two narrow histogram passes (map-side combined
    * counts — the corpus payload never moves) + a bins-sized join and
    * fold; comparing 100-TB snapshots costs two column scans. */
  def psi(before: DataFrame, after: DataFrame, column: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "psi needs bins > 0 and hi > lo")
    val hb = histogram(before, column, lo, hi, bins)
      .select(col("bin"), col("n").as("__rawnb"))
    val ha = histogram(after, column, lo, hi, bins)
      .select(col("bin"), col("n").as("__rawna"))
    val allBins = before.sparkSession.range(bins)
      .select(col("id").cast("int").as("bin"))
    val joined = allBins
      .join(hb, Seq("bin"), "left").join(ha, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__rawnb"), lit(0L)).as("__nb"),
        coalesce(col("__rawna"), lit(0L)).as("__na"))
    val tot = joined.agg(sum("__nb").as("__tb"), sum("__na").as("__ta"))
    val shares = joined.crossJoin(broadcast(tot)).select(
      col("__tb"), col("__ta"),
      ((col("__nb") + 0.5) / (col("__tb") + 0.5 * bins)).as("__p"),
      ((col("__na") + 0.5) / (col("__ta") + 0.5 * bins)).as("__q"))
    shares.agg(
      round(sum((col("__p") - col("__q")) * log(col("__p") / col("__q"))), 6)
        .as("psi"),
      first(col("__tb")).as("n_before"), first(col("__ta")).as("n_after"))
  }

  /** Exact quantiles of a numeric column with linear interpolation —
    * one row (q, value) per requested fraction, the percentile block
    * of a data card. Nulls are ignored (both here and in every SQL
    * engine's `quantile_cont`/`percentile_cont`); an empty or all-null
    * column yields zero rows. Spark's exact `percentile` aggregate and
    * DuckDB's `quantile_cont` share the same definition (R-7 linear
    * interpolation), so results oracle-match bit-for-bit.
    *
    * Scale shape: one narrow scan (`column` only) into a single
    * aggregate whose partial state is a value→count map, map-side
    * combinable; the shuffle carries one map per partition, bounded by
    * the column's DISTINCT count — fine for the id/metric/score
    * columns data cards profile. For a 100-TB column with ~unbounded
    * distinct values swap `percentile` for `approx_percentile(col,
    * qs, accuracy)` (fixed-size KLL-style sketch state, same output
    * schema, bounded error) — a one-line change kept out of the
    * default because the oracle gate and small-scale cards want exact
    * values. */
  def quantiles(df: DataFrame, column: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "quantiles needs at least one fraction")
    require(qs.forall(q => q >= 0 && q <= 1), s"fractions outside [0,1]: $qs")
    val v = col(column).cast("double")
    Par.spread(df)
      .agg(percentile(v, typedlit(qs)).as("__qv"))
      .select(posexplode(col("__qv")).as(Seq("__i", "value")))
      .select(element_at(typedlit(qs), col("__i") + 1).as("q"), col("value"))
  }

  /** The 100-TB quantile path [[quantiles]]'s doc promises: same
    * output schema, `approx_percentile` instead of `percentile` — the
    * aggregate's state is a fixed-size sketch instead of a value→count
    * map, so the shuffle is O(accuracy) per partition no matter how
    * many distinct values the column has. `accuracy` is Spark's
    * inverse-error knob (10000 ⇒ rank error ≤ 1/10000 of the rows).
    * Not oracle-gated (sketch internals differ across engines); the
    * spec pins it to within-tolerance of the exact path. */
  def quantilesApprox(df: DataFrame, column: String, qs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty, "quantilesApprox needs at least one fraction")
    require(qs.forall(q => q >= 0 && q <= 1), s"fractions outside [0,1]: $qs")
    val v = col(column).cast("double")
    Par.spread(df)
      .agg(approx_percentile(v, typedlit(qs), lit(accuracy)).as("__qv"))
      .select(posexplode(col("__qv")).as(Seq("__i", "value")))
      .select(element_at(typedlit(qs), col("__i") + 1).as("q"), col("value"))
  }

  /** Exact top-k most frequent values of a column (nulls excluded),
    * ties broken by value ascending so the result is deterministic.
    * Scale shape: groupBy(value) partial-aggregates map-side; the
    * final top-k is a TakeOrdered over one count per distinct value,
    * never a full sort of the corpus. */
  def topValues(df: DataFrame, column: String, k: Int): DataFrame = {
    require(k > 0, "topValues needs k > 0")
    Par.spread(df).filter(col(column).isNotNull)
      .groupBy(col(column).cast("string").as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)
  }
}
