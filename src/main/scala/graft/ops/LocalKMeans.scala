package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-local, seed-deterministic k-means for the ANN index builds.
  *
  * Codebook/centroid training is a SMALL-DATA problem by design: the
  * PQ/IVF literature trains quantizers on 1e5-1e6 sampled points
  * regardless of corpus size, and clustering quality saturates long
  * before that. Spark ML's distributed k-means pays (init passes +
  * maxIter) full Spark jobs of cluster-wide scheduling latency to
  * compute what is, at training-sample size, a sub-second local loop —
  * on the bench corpus one IVF-PQ build ran 1 coarse + m=8 subspace
  * fits ≈ 100 tiny Spark jobs. The optimization-guide order (§1.2:
  * fix the distributed algorithm first) says: collect the BOUNDED
  * sample once, fit locally, keep only assignment/encode distributed
  * (they are map-only kernel projections — [[graft.functions.MiningKernels]]).
  *
  * Determinism: k-means++ init and Lloyd iterations are seeded and
  * single-threaded per fit EXCEPT the assignment pass, which is
  * chunk-parallel with a fixed chunk size and sequential in-order
  * merge — floating-point sums are always accumulated in the same
  * order, so results are bit-reproducible for a given sample.
  *
  * The training-sample cap is `spark.graft.kmeans.trainCap` (default
  * 100k vectors — 51 MB at 64 dims, a bounded driver collect per
  * guide §5; raise it on a driver with headroom). */
private[ops] object LocalKMeans {

  /** Bounded deterministic training sample of `vecCol` (cast to
    * array<double>, null vectors dropped) plus the TOTAL non-null row
    * count of the frame — callers persist the total as the index's
    * `trainedCount` drift baseline, which must reflect the full
    * corpus mass, not the sample. */
  def sampleVectors(df: DataFrame, vecCol: String,
      seed: Long): (Array[Array[Double]], Long) = {
    val cap = df.sparkSession.conf
      .getOption("spark.graft.kmeans.trainCap").map(_.toInt).getOrElse(100000)
    val proj = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
    val total = proj.count()
    val picked =
      if (total <= cap) proj
      else proj.sample(withReplacement = false,
        math.min(1.0, cap.toDouble * 1.05 / total), seed)
    val sample = picked.collect().map(_.getSeq[Double](0).toArray)
    (sample, total)
  }

  /** Seeded k-means++ init + Lloyd to `tol` movement or `maxIter`.
    * Always returns exactly `k` centroids; with fewer than `k` points
    * the sample cycles (duplicate centroids attract no members under
    * the strict-< first-index assignment rule, which matches an
    * effectively smaller k). */
  def fit(points: Array[Array[Double]], k: Int, maxIter: Int, seed: Long,
      tol: Double = 1e-4): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs at least one training point")
    require(k >= 1, s"k must be positive, got $k")
    val n = points.length
    val d = points(0).length
    if (n <= k)
      return Array.tabulate(k)(i => points(i % n).clone())

    val rnd = new scala.util.Random(seed)
    // k-means++: first center uniform, then weighted by min sq dist
    val centers = new Array[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.PositiveInfinity)
    var c = 1
    while (c < k) {
      val prev = centers(c - 1)
      var i = 0
      var totalW = 0.0
      while (i < n) {
        val dist = sqDist(points(i), prev, d)
        if (dist < minD(i)) minD(i) = dist
        totalW += minD(i)
        i += 1
      }
      if (totalW <= 0.0) {
        // all remaining points coincide with chosen centers
        centers(c) = points(c % n).clone()
      } else {
        var r = rnd.nextDouble() * totalW
        var pick = 0
        i = 0
        var acc = 0.0
        while (i < n) {
          acc += minD(i)
          if (acc >= r) { pick = i; i = n } else i += 1
        }
        centers(c) = points(pick).clone()
      }
      c += 1
    }

    // Lloyd, chunk-parallel assignment with deterministic merge order
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val chunk = 8192
    val ranges = (0 until n by chunk).map(s => (s, math.min(s + chunk, n)))
    var iter = 0
    var moved = Double.PositiveInfinity
    while (iter < maxIter && moved > tol) {
      val partials = Await.result(Future.sequence(ranges.map { case (s, e) =>
        Future {
          val sums = Array.ofDim[Double](k, d)
          val counts = new Array[Long](k)
          var i = s
          while (i < e) {
            val p = points(i)
            var best = 0
            var bestD = Double.PositiveInfinity
            var ci = 0
            while (ci < k) {
              val dist = sqDist(p, centers(ci), d)
              if (dist < bestD) { bestD = dist; best = ci }
              ci += 1
            }
            val srow = sums(best)
            var j = 0
            while (j < d) { srow(j) += p(j); j += 1 }
            counts(best) += 1
            i += 1
          }
          (sums, counts)
        }
      }), Duration.Inf)
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Long](k)
      partials.foreach { case (ps, pc) =>
        var ci = 0
        while (ci < k) {
          var j = 0
          while (j < d) { sums(ci)(j) += ps(ci)(j); j += 1 }
          counts(ci) += pc(ci)
          ci += 1
        }
      }
      moved = 0.0
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) {
          val nc = new Array[Double](d)
          var j = 0
          while (j < d) { nc(j) = sums(ci)(j) / counts(ci); j += 1 }
          val mv = math.sqrt(sqDist(nc, centers(ci), d))
          if (mv > moved) moved = mv
          centers(ci) = nc
        } // empty cluster: keep the previous center (Spark ML rule)
        ci += 1
      }
      iter += 1
    }
    centers
  }

  private def sqDist(a: Array[Double], b: Array[Double], d: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < d) { val x = a(j) - b(j); acc += x * x; j += 1 }
    acc
  }

  /** Nearest-center index with the strict-< first-index rule — the
    * local twin of [[graft.functions.MiningKernels.nearestCentroidOf]]
    * for driver-side residual computation in the PQ build. */
  def nearest(p: Array[Double], centers: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var ci = 0
    while (ci < centers.length) {
      val dist = sqDist(p, centers(ci), p.length)
      if (dist < bestD) { bestD = dist; best = ci }
      ci += 1
    }
    best
  }
}
