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

  /** Sign-bit LSH signature column: one bit per hyperplane, packed per
    * `bandBits` bits into an array of band hashes. Vectors sharing a
    * band value are cosine-similar candidates. */
  def lshBands(vec: Column, dims: Int, numPlanes: Int = 16,
      bandBits: Int = 8, seed: Long = 42L): Column = {
    val ps = planes(dims, numPlanes, seed)
    val bits = ps.map { p =>
      val pc = array(p.map(lit): _*)
      when(dot(vec.cast("array<double>"), pc) >= 0, lit(1L)).otherwise(lit(0L))
    }
    val numBands = numPlanes / bandBits
    array((0 until numBands).map { b =>
      bits.slice(b * bandBits, (b + 1) * bandBits).zipWithIndex
        .map { case (bit, i) => bit * lit(1L << i) }.reduce(_ + _)
        .+(lit(b.toLong * 4096L)) // band offset so bands don't collide
    }: _*)
  }

  /** ANN top-k: probe only vectors sharing at least one LSH band with
    * the query, then exact cosine on the candidates. At scale the
    * banded table is precomputed + bucketed; here it is derived inline.
    */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, dims: Int, numPlanes: Int = 32,
      bandBits: Int = 2): DataFrame = {
    val qdf = df.sparkSession.range(1)
      .select(array(query.map(v => lit(v.toDouble)): _*).as("__q"))
      .select(explode(lshBands(col("__q"), dims, numPlanes, bandBits)).as("__band"))
    val banded = df.select(col(idCol), col(vecCol),
      explode(lshBands(col(vecCol), dims, numPlanes, bandBits)).as("__band"))
    val candidates = banded.join(broadcast(qdf), Seq("__band"))
      .select(col(idCol), col(vecCol)).distinct()
    bruteForceTopK(candidates, vecCol, idCol, query, k)
  }

  /** All near-duplicate embedding pairs above a cosine threshold,
    * LSH-bucketed (candidates share a band) then exactly verified. */
  def cosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, dims: Int, numPlanes: Int = 16,
      bandBits: Int = 8): DataFrame = {
    val banded = df.select(col(idCol).as("__id"), col(vecCol).as("__vec"),
      explode(lshBands(col(vecCol), dims, numPlanes, bandBits)).as("__band"))
    val l = banded.select(col("__id").as("idA"), col("__vec").as("__va"), col("__band"))
    val r = banded.select(col("__id").as("idB"), col("__vec").as("__vb"), col("__band"))
    l.join(r, Seq("__band")).filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        cosine(col("__va").cast("array<double>"), col("__vb").cast("array<double>")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
