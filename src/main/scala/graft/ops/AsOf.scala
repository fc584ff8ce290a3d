package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: match each left row with the single right row having
  * the greatest timestamp at-or-before the left row's, per key — the
  * point-in-time lookup every event/feature pipeline needs (last
  * observed price, last session marker, latest model score), and an
  * operator Spark's built-in joins cannot express without a quadratic
  * range join.
  *
  * Implementation is the UNION + ordered-window shape, not a join:
  * both sides are tagged and unioned on (key, ts), and one window
  * partitioned by key and ordered by (ts, side) carries the latest
  * right-side payload forward into each left row via
  * `last(_, ignoreNulls)`. At equal timestamps the right row sorts
  * FIRST, so the match is inclusive.
  *
  * Scale shape: ONE hash shuffle on the key plus a per-key sort —
  * cost is that of a sort-merge join without the join's range
  * explosion; keys parallelize across partitions (a single pathological
  * hot key serializes only itself, the usual keyed-window caveat).
  */
object AsOf {

  /** Left rows plus `payloadCols` from the matched right row (null
    * when no right row is at-or-before). `toleranceMs` additionally
    * voids matches older than the given distance. The caller must
    * make the right side unique per (key, ts) — with duplicates the
    * carried payload among equal timestamps is unspecified (pre-
    * aggregate, e.g. `groupBy(key, ts).agg(max(payload))`). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the whole `__`-prefixed namespace is reserved internally
    // (__side/__ts/__rts/__frts/__p_*/__f_*) — a collision would
    // silently mis-resolve rather than fail, so reject it up front
    require(!leftCols.exists(_.startsWith("__")) &&
      !payloadCols.exists(_.startsWith("__")),
      "column names starting with __ are reserved by asofJoin")
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns ${payloadCols.intersect(leftCols).mkString(", ")} " +
        "collide with left columns; alias one side first")
    // toleranceMs arithmetic casts ts → double = fractional epoch
    // SECONDS; a numeric epoch column (long millis/seconds) would
    // silently compare wrong units
    if (toleranceMs.isDefined) {
      import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
      for ((df, c, side) <- Seq((left, leftTs, "left"), (right, rightTs, "right")))
        require(Set[org.apache.spark.sql.types.DataType](
          TimestampType, TimestampNTZType).contains(df.schema(c).dataType),
          s"toleranceMs requires a timestamp-typed $side ts column; " +
            s"$c is ${df.schema(c).dataType.simpleString} — cast it first")
    }
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payloadCols.map(p => lit(null).cast(
          right.schema(p).dataType).as(s"__p_$p")) :+
        lit(null).cast(right.schema(rightTs).dataType).as("__rts"): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(p => col(p).as(s"__p_$p")) :+
        col(rightTs).as("__rts"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .select(col("*") +:
        payloadCols.map(p =>
          last(col(s"__p_$p"), ignoreNulls = true).over(w).as(s"__f_$p")) :+
        last(col("__rts"), ignoreNulls = true).over(w).as("__frts"): _*)
      .filter(col("__side") === 1)
    val inTol: Column = toleranceMs match {
      // timestamp→double is fractional epoch seconds
      case Some(ms) => col("__frts").isNotNull &&
        (col("__ts").cast("double") - col("__frts").cast("double")) <= ms / 1000.0
      case None => lit(true)
    }
    filled.select(
      keyCols.map(col) ++
        Seq(col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == leftTs).map(col) ++
        payloadCols.map(p =>
          when(inTol, col(s"__f_$p")).otherwise(lit(null)).as(p)): _*)
  }

  /** RANGE (interval) join: every (left, right) pair with the left
    * timestamp inside the right row's `[startCol, endCol)` interval,
    * equi-constrained on `keyCols` — the "which maintenance window /
    * session / promo covers this event" join that a naive formulation
    * plans as a cross product with a post-filter.
    *
    * Scale shape: BINNING. Each right interval explodes to the
    * `binMs`-wide bins it spans, each left row maps to its single
    * bin, and the join runs on (key…, bin) — an ordinary hash
    * equi-join — with the exact `[start, end)` predicate applied
    * after. Join volume is bounded by per-bin co-occurrence instead
    * of |L|x|R| per key; pick `binMs` near the typical interval
    * length (shorter bins explode more interval rows, longer bins
    * admit more false pairs for the filter). */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, startCol: String, endCol: String,
      binMs: Long): DataFrame = {
    require(binMs > 0, s"binMs must be positive, got $binMs")
    val binUs = binMs * 1000L
    // exact integer microsecond arithmetic — doubles lose microsecond
    // resolution at current epochs, which could mis-bin boundary rows
    // exact floor division for any magnitude: subtract the floor-mod
    // first so the division is of exactly-divisible integers (a bare
    // double `/` misrounds near bin edges once bins pass ~6 days)
    def bin(c: Column): Column =
      ((c - pmod(c, lit(binUs))) / binUs).cast("long")
    // unix_micros rejects TIMESTAMP_NTZ; the session TZ is pinned
    // UTC, so the cast is a stable reinterpretation
    def unixMicros(c: Column): Column = unix_micros(c.cast("timestamp"))
    val r = right
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("__bin", explode(sequence(
        bin(unixMicros(col(startCol))),
        // end is exclusive: a row ending exactly on a bin edge only
        // occupies that bin's predecessor
        bin(unixMicros(col(endCol)) - 1))))
    val l = left.withColumn("__bin", bin(unixMicros(col(leftTs))))
    l.join(r, keyCols :+ "__bin")
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bin")
  }
}
