package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * content-hash, MinHash+LSH, SimHash — all bucketed (candidate pairs
  * come from hash-bucket joins, never an all-pairs product), so each
  * stage is one shuffle keyed on something that stays small at 100 TB.
  */
object Dedup {

  /** Exact dedup on a set of columns: keeps the row with the smallest
    * `idCol` per group. One hash-partition shuffle. */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(cols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Content-hash dedup: like [[exact]] but shuffles a 64-bit
    * fingerprint instead of the full text — at 100 TB the shuffle
    * payload is the winner. (Hash collisions: 64-bit, ~1e-9 at 1e9
    * docs; acceptable for training-data dedup.) */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", Text.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__fp")
  }

  /** Word n-gram shingle set (distinct) of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val grams = when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    array_distinct(grams)
  }

  /** Jaccard similarity of the shingle sets of two text columns. */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val (sa, sb) = (shingles(a, n), shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb))
  }

  /** MinHash signature (`numHashes` 64-bit mins) over the shingle set.
    * One xxhash64 per shingle, then affine permutations a*h+b — the
    * classic one-pass signature, fully codegen'd. */
  def minhashSignature(text: Column, numHashes: Int = 128, shingleSize: Int = 3): Column = {
    val base = transform(shingles(text, shingleSize), s => xxhash64(s))
    val rnd = new scala.util.Random(42)
    val coefs = Seq.fill(numHashes)((rnd.nextLong() | 1L, rnd.nextLong()))
    array(coefs.map { case (a, b) =>
      array_min(transform(base, h => h * a + b))
    }: _*)
  }

  /** LSH banding: (bandIdx, bandHash) rows per document. Documents
    * sharing any band bucket are near-dup candidates. */
  private def bands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      struct(b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
            h => h.cast("string")))).as("sig")))

  /** Candidate near-duplicate pairs via MinHash LSH banding, verified
    * with true n-gram Jaccard. Returns (idA, idB, jaccard) with
    * idA < idB and jaccard >= threshold.
    *
    * Scale shape: explode to numBands rows/doc → shuffle on (band,
    * bandHash) → pairs only within buckets (skew-guarded by capping
    * bucket size) → verify joins are on candidate ids only.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128, numBands: Int = 32,
      shingleSize: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sig = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__sig", minhashSignature(col("__text"), numHashes, shingleSize))
    val banded = sig.select(col("__id"),
        explode(bands(col("__sig"), numBands, rowsPerBand)).as("__b"))
      .select(col("__id"), col("__b.band").as("__band"), col("__b.sig").as("__bsig"))
    // pairs within a bucket; bucket capped to bound worst-case skew
    val grouped = banded.groupBy("__band", "__bsig")
      .agg(collect_list("__id").as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
    val pairs = grouped
      .select(explode(expr(
        """filter(
             flatten(transform(__ids, (x, i) ->
               transform(slice(__ids, i + 2, size(__ids) - i - 1), y ->
                 struct(least(x, y) AS a, greatest(x, y) AS b)))),
             p -> p.a <> p.b)""")).as("__p"))
      .select(col("__p.a").as("idA"), col("__p.b").as("idB"))
      .distinct()
    // verify with true jaccard
    val docs = df.select(col(idCol).as("__vid"), col(textCol).as("__vtext"))
    pairs
      .join(docs.withColumnRenamed("__vid", "idA")
        .withColumnRenamed("__vtext", "__ta"), Seq("idA"))
      .join(docs.withColumnRenamed("__vid", "idB")
        .withColumnRenamed("__vtext", "__tb"), Seq("idB"))
      .withColumn("jaccard", ngramJaccard(col("__ta"), col("__tb"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** Near-dedup: drop every document that is the larger id of a
    * verified near-duplicate pair (greedy canonical-smallest — one
    * anti-join, no connected components needed for dedup purposes). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val doomed = minhashPairs(df, idCol, textCol, threshold)
      .select(col("idB").as(idCol)).distinct()
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes, as a single codegen'd aggregate expression. */
  def simhash(text: Column): Column = {
    val hashes = transform(split(lower(trim(text)), "\\s+"), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup candidate pairs: band the 64-bit hash into 4
    * 16-bit chunks (pigeonhole: hamming distance <= 3 implies one
    * identical chunk), bucket-join, verify true hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__id"), simhash(col(textCol)).as("__sh"))
    val banded = sh.select(col("__id"), col("__sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("__sh"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))): _*)).as("__b"))
    val l = banded.select(col("__id").as("idA"), col("__sh").as("__shA"),
      col("__b.band").as("__band"), col("__b.chunk").as("__chunk"))
    val r = banded.select(col("__id").as("idB"), col("__sh").as("__shB"),
      col("__b.band").as("__band"), col("__b.chunk").as("__chunk"))
    l.join(r, Seq("__band", "__chunk")).filter(col("idA") < col("idB"))
      .withColumn("hamming", bit_count(col("__shA").bitwiseXOR(col("__shB"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("idA"), col("idB"), col("hamming")).distinct()
  }
}
