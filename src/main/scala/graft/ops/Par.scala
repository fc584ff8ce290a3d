package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy map stages.
  *
  * Spark parallelizes a scan by file splits; a compact table (one
  * parquet file, one row group — the shape of a freshly-written small
  * snapshot) yields ONE task, so everything upstream of the first
  * shuffle (shingle hashing, hyperplane dots, regex scoring) runs on a
  * single core no matter how many executors exist. [[spread]]
  * round-robins such inputs across the cluster first.
  *
  * The small-input test uses optimizer size ESTIMATES, never
  * `df.rdd` (materializing the RDD under AQE can plan or even execute
  * upstream stages): when the estimated bytes are at least one scan
  * split (`spark.sql.files.maxPartitionBytes`) per core, the scan
  * already yields enough tasks and spread is a no-op — so the extra
  * shuffle is never paid at 100-TB scale, while a small hot input
  * costs one trivial round-robin of itself.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val split = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(split) * want) df else df.repartition(want)
  }
}
