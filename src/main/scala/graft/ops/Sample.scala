package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus sampling and sharding for training-data pipelines:
  * deterministic hash sampling, per-stratum caps, and token-budget
  * shard packing. All reproducible (no RNG state, no
  * partitioning-dependent output) — rerunning a sample over the same
  * corpus on any cluster size selects the same rows, which is what
  * makes ablations and held-out splits auditable.
  */
object Sample {

  /** 32-bit Knuth multiplicative hash of a non-negative id, as a
    * Column: `((id mod 2³¹) * 2654435761) mod 2³²`. Folded to 2³¹
    * first so the product stays inside signed-64 range (DuckDB and
    * ANSI SQL raise on bigint overflow; Spark would silently wrap —
    * the fold keeps the two engines bit-identical). */
  def idHash(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))

  /** Deterministic `fraction` sample: keep rows whose [[idHash]] falls
    * in the first `fraction` of the 32-bit hash space. A stateless
    * narrow filter — no shuffle, no seed plumbing, membership of a row
    * depends only on its id. Disjoint splits come for free: bands
    * `[lo, hi)` of the hash space partition the corpus, so
    * train/validation/test are non-overlapping by construction. */
  def byHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.filter(idHash(col(idCol)) < lit((fraction * 4294967296.0).toLong))
  }

  /** Band `[lo, hi)` of the hash space (fractions of 1): the disjoint
    *-split form of [[byHash]] — `split(df, id, 0, 0.9)` and
    * `split(df, id, 0.9, 1.0)` never share a row and together cover
    * the corpus. */
  def split(df: DataFrame, idCol: String, lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"bad band [$lo, $hi)")
    val h = idHash(col(idCol))
    df.filter(h >= lit((lo * 4294967296.0).toLong) &&
      h < lit((hi * 4294967296.0).toLong))
  }

  /** Per-stratum cap: the first `n` rows of each stratum in
    * `orderCols` order (ties broken by the full order list — pass a
    * unique id last for determinism). One shuffle on the stratum key;
    * rank never leaves the stratum's partition. The per-source /
    * per-domain cap every mixing recipe needs. */
  def capPerStratum(df: DataFrame, strataCols: Seq[String],
      orderCols: Seq[String], n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Token-budget shard packing: orders rows by `idCol`, then assigns
    * each row to shard `floor(tokens-before-it / budget)` — contiguous
    * runs of ~`budget` tokens each (a shard exceeds `budget` by at
    * most one document, never splits one).
    *
    * Scale shape: a naive global window (`sum over (order by id)`)
    * plans as a SINGLE-partition WindowExec — the whole corpus through
    * one task. Instead: range-repartition on id, sort within
    * partitions, collect ONE long per partition (its token total) for
    * a driver-side prefix sum, then a narrow per-partition pass adds
    * the offset. Two shuffles of the data, driver traffic = one long
    * per partition, every stage parallel. */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perPart = sorted.select(spark_partition_id().as("__p"), col("__w"))
        .groupBy("__p").agg(sum("__w").as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val nPart = sorted.rdd.getNumPartitions
      val offsets = new Array[Long](nPart)
      var acc = 0L
      for (p <- 0 until nPart) {
        offsets(p) = acc
        acc += perPart.getOrElse(p, 0L)
      }
      val wIdx = sorted.schema.fieldIndex("__w")
      val outSchema = org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+
          org.apache.spark.sql.types.StructField("shard", LongType, false))
      val rdd = sorted.rdd.mapPartitions { it =>
        var cum = offsets(TaskContext.getPartitionId())
        it.map { r =>
          val shard = cum / budget
          cum += r.getLong(wIdx)
          Row.fromSeq(r.toSeq :+ shard)
        }
      }
      // shard ids depend only on the id order and weights, not the
      // partition count — offsets absorb the layout
      spark.createDataFrame(rdd, outSchema).drop("__w")
        .localCheckpoint() // materialize before unpersisting the input
    } finally sorted.unpersist(false): Unit
  }

  /** SEQUENCE PACKING: concatenate each [[packByBudget]] shard's
    * documents (in id order, single-space separated) into one
    * training-sequence row — the "fill every context window" step
    * that turns a sharded corpus into fixed-budget model inputs.
    * Returns (seq_id, text, n_docs, n_tokens); `n_tokens` sums the
    * caller's weight column, so it is the same budget currency
    * [[packByBudget]] packed by.
    *
    * Scale shape: the shard assignment already range-partitioned by
    * id, so each shard's docs are near-contiguous; the concat is one
    * hash aggregation on the shard id whose payload per group is
    * bounded by the token budget (a shard never exceeds budget by
    * more than one document). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      weightCol: String, budget: Long): DataFrame = {
    val sharded = packByBudget(df, idCol, weightCol, budget)
    sharded.groupBy(col("shard").as("seq_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), " ").as("text"),
        count(lit(1)).as("n_docs"),
        sum(col(weightCol)).as("n_tokens"))
  }

  /** Corpus MIXTURE sampling: greedily fill a per-source token budget
    * in a deterministic document order, keeping each row while its
    * source's running `weightCol` total stays within
    * `budgets(source)` — the data-mixing step that turns "40% web,
    * 30% code, 30% books" into a concrete document set. Sources
    * absent from `budgets` contribute nothing. The fill order is
    * `md5(id)` — engine-independent (unlike a raw hash function,
    * md5's hex form is identical everywhere), so the selected set is
    * reproducible on any cluster size or SQL engine.
    *
    * Scale shape: the naive form is a per-source running-total window
    * — one reducer PER SOURCE, and real corpora have few huge
    * sources. Instead, the [[packByBudget]] two-phase prefix sum
    * generalized per source: range-partition on (source, md5),
    * per-partition per-source subtotals (one row per pair to the
    * driver), then a narrow pass adds each partition's offsets.
    * Every stage parallel; driver traffic is #partitions × #sources
    * longs. */
  def mixture(df: DataFrame, idCol: String, weightCol: String,
      sourceCol: String, budgets: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .withColumn("__w", coalesce(col(weightCol).cast("long"), lit(0L)))
      .withColumn("__k", md5(col(idCol).cast("string")))
      .repartitionByRange(col(sourceCol), col("__k"))
      .sortWithinPartitions(col(sourceCol), col("__k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val perPart = sorted
        .select(spark_partition_id().as("__p"), col(sourceCol), col("__w"))
        .groupBy(col("__p"), col(sourceCol)).agg(sum("__w").as("__t"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val nPart = sorted.rdd.getNumPartitions
      val srcs = perPart.keys.map(_._2).toSeq.distinct
      // per-(partition, source) starting offsets: tokens of the same
      // source in all earlier partitions (range partitioning keeps a
      // source's rows contiguous across partition boundaries)
      val offsets = scala.collection.mutable.Map[(Int, String), Long]()
      for (s <- srcs) {
        var acc = 0L
        for (p <- 0 until nPart) {
          offsets((p, s)) = acc
          acc += perPart.getOrElse((p, s), 0L)
        }
      }
      val offB = spark.sparkContext.broadcast(offsets.toMap)
      val budB = spark.sparkContext.broadcast(budgets)
      val wIdx = sorted.schema.fieldIndex("__w")
      val sIdx = sorted.schema.fieldIndex(sourceCol)
      val rdd = sorted.rdd.mapPartitions { it =>
        val p = TaskContext.getPartitionId()
        var cur: String = null
        var cum = 0L
        it.flatMap { r =>
          val src = r.getString(sIdx)
          if (src != cur) { cur = src; cum = offB.value.getOrElse((p, src), 0L) }
          cum += r.getLong(wIdx)
          if (cum <= budB.value.getOrElse(src, 0L)) Some(r) else None
        }
      }
      spark.createDataFrame(rdd, sorted.schema).drop("__w", "__k")
        .localCheckpoint()
    } finally sorted.unpersist(false): Unit
  }
}
