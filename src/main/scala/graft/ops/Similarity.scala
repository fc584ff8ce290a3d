package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100-TB path (probe
  * only candidate buckets instead of scanning every vector).
  *
  * Dot products are `zip_with` + `aggregate` higher-order functions —
  * no UDF, stays inside whole-stage codegen.
  */
object Similarity {

  /** Dot product of two array<numeric> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0, lit(null)).otherwise(d / n)
  }

  /** Exact brute-force cosine top-k for one query vector. The global
    * top-k is a TakeOrderedAndProject — no full sort, map-side k. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    df.select(col(idCol),
        cosine(col(vecCol).cast("array<double>"), q).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seed-fixed) for sign-LSH. */
  private def planes(dims: Int, numPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  /** Pack sign bits into per-band hashes: band b holds bits
    * [b*bandBits, (b+1)*bandBits), tagged with `b << bandBits` so
    * values from different bands never collide. Shared by the column
    * and driver-side (query literal) signature paths — the two MUST
    * stay bit-identical. */
  private def packBands(bits: Seq[Long], numPlanes: Int, bandBits: Int): Seq[Long] = {
    require(numPlanes % bandBits == 0, "numPlanes must be a multiple of bandBits")
    (0 until numPlanes / bandBits).map { b =>
      val h = bits.slice(b * bandBits, (b + 1) * bandBits).zipWithIndex
        .map { case (bit, i) => bit << i }.sum
      (b.toLong << bandBits) + h
    }
  }

  /** Sign-bit LSH signature column: one bit per hyperplane, packed per
    * `bandBits` bits into an array of band hashes. Vectors sharing a
    * band value are cosine-similar candidates. Defaults (64 planes →
    * 4 bands × 16 bits) keep the random-pair collision rate at
    * ~4 × 2⁻¹⁶ ≈ 6e-5, so candidate sets stay tiny at 1e9 vectors. */
  def lshBands(vec: Column, dims: Int, numPlanes: Int = 64,
      bandBits: Int = 16, seed: Long = 42L): Column = {
    require(numPlanes % bandBits == 0, "numPlanes must be a multiple of bandBits")
    val ps = planes(dims, numPlanes, seed)
    val bits = ps.map { p =>
      val pc = array(p.map(lit): _*)
      when(dot(vec.cast("array<double>"), pc) >= 0, lit(1L)).otherwise(lit(0L))
    }
    val numBands = numPlanes / bandBits
    array((0 until numBands).map { b =>
      bits.slice(b * bandBits, (b + 1) * bandBits).zipWithIndex
        .map { case (bit, i) => bit * lit(1L << i) }.reduce(_ + _)
        .+(lit(b.toLong << bandBits))
    }: _*)
  }

  /** The query's probe set: its own band values plus, per multi-probe
    * level, every band value within that hamming distance (level 1 =
    * all single-bit flips). Computed on the driver — the query is a
    * literal, so its signature needs no Spark job. */
  private def queryProbes(query: Seq[Float], dims: Int, numPlanes: Int,
      bandBits: Int, seed: Long, probeLevel: Int): Seq[Long] = {
    val qd = query.map(_.toDouble)
    val bits = planes(dims, numPlanes, seed).map { p =>
      if (p.lazyZip(qd).map(_ * _).sum >= 0) 1L else 0L
    }
    val base = packBands(bits, numPlanes, bandBits)
    def expand(vals: Seq[Long], level: Int): Seq[Long] =
      if (level == 0) vals
      else expand(vals.flatMap { v =>
        v +: (0 until bandBits).map(i => v ^ (1L << i))
      }, level - 1)
    expand(base, probeLevel).distinct
  }

  /** ANN top-k: probe only vectors sharing an LSH band with the query
    * (multi-probe: also bands one bit-flip away, recovering recall
    * lost to the aggressive 16-bit bands), then exact cosine on the
    * candidates.
    *
    * Scale shape: the probe set is a driver-side literal list (~4 ×
    * (1+16) longs), so candidate selection is an `IN` predicate on the
    * band column — with a precomputed banded table partitioned on
    * `__band` this is a partition-pruned point lookup, no join and no
    * full scan. Candidate rate for a random vector ≈ numBands ×
    * (1 + bandBits) × 2^-bandBits ≈ 0.1% at the defaults. */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, dims: Int, numPlanes: Int = 64,
      bandBits: Int = 16, probeLevel: Int = 1, seed: Long = 42L): DataFrame = {
    val probes = queryProbes(query, dims, numPlanes, bandBits, seed, probeLevel)
    val banded = df.select(col(idCol), col(vecCol),
      explode(lshBands(col(vecCol), dims, numPlanes, bandBits, seed)).as("__band"))
    val candidates = banded.filter(col("__band").isin(probes: _*))
      .select(col(idCol), col(vecCol)).distinct()
    bruteForceTopK(candidates, vecCol, idCol, query, k)
  }

  /** All near-duplicate embedding pairs above a cosine threshold:
    * LSH-banded buckets → in-bucket pairs (bucket size capped to bound
    * worst-case skew, mirroring [[Dedup.minhashPairs]] — one dense
    * bucket must not go quadratic) → exact cosine verify on candidate
    * ids only. The verify joins vectors back by id, so the bucket
    * stage shuffles (id, band) longs, never the vectors themselves. */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, dims: Int, numPlanes: Int = 64,
      bandBits: Int = 16, maxBucket: Int = 1000, seed: Long = 42L): DataFrame = {
    val banded = df.select(col(idCol).as("__id"),
      explode(lshBands(col(vecCol), dims, numPlanes, bandBits, seed)).as("__band"))
    val grouped = banded.groupBy("__band")
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
    val vecs = df.select(col(idCol).as("__vid"),
      col(vecCol).cast("array<double>").as("__v"))
    pairs
      .join(vecs.withColumnRenamed("__vid", "idA")
        .withColumnRenamed("__v", "__va"), Seq("idA"))
      .join(vecs.withColumnRenamed("__vid", "idB")
        .withColumnRenamed("__v", "__vb"), Seq("idB"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), col("cosine"))
  }
}
