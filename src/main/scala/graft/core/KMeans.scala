package graft.core

/** Deterministic cosine-metric k-means for the IVF coarse codebook
  * (SURVEY §2.11 ANN — the trained replacement for round 2's
  * first-K-vectors stand-in).
  *
  * Scale contract: training runs on a driver-collected SAMPLE — the
  * codebook is tiny (k ≤ 256) and the sample bounded (thousands of
  * vectors), so training cost is constant w.r.t. table size; cell
  * ASSIGNMENT stays a map-only native expression over the full table
  * (graft_ivf_assign). This is the standard IVF recipe (train coarse
  * quantizer on a sample, assign everything).
  *
  * Determinism contract (the dumped codebook is an oracle input, and
  * byte-identical outputs across runs/parallelism are a repo invariant):
  * seeded SplitMix64 k-means++ init over the sample in its given order,
  * fixed Lloyd iteration count, strictly sequential accumulation (no
  * float reduction-order variance), ties → lowest index.
  */
object KMeans {

  private def splitMix(state: Long): (Long, Long) = {
    val s = state + 0x9e3779b97f4a7c15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (s, z ^ (z >>> 31))
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val out = new Array[Double](v.length)
    if (ss == 0.0) return out
    val inv = 1.0 / math.sqrt(ss)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Train `k` unit-norm centroids on `sample` (cosine metric: points are
    * L2-normalized, assignment = argmax dot = argmax cosine, centroid =
    * normalized mean). Returns exactly `k` centroids; a cluster that goes
    * empty keeps its previous centroid (deterministic, no re-seeding). */
  def trainCosine(sample: IndexedSeq[Array[Double]], k: Int,
                  iters: Int = 10, seed: Long = 42L): Array[Array[Double]] = {
    require(sample.nonEmpty && k > 0, "k-means needs a non-empty sample")
    val pts = sample.map(normalize).toArray
    val n = pts.length
    val dim = pts(0).length
    val cents = new Array[Array[Double]](k)

    // k-means++ init: first centroid = first sample point; each next one
    // drawn with probability proportional to (1 - max cosine) distance
    cents(0) = pts(0)
    val best = pts.map(p => dot(p, cents(0))) // running max-sim per point
    var rng = seed
    var c = 1
    while (c < k) {
      var total = 0.0
      var i = 0
      while (i < n) { total += math.max(0.0, 1.0 - best(i)); i += 1 }
      val (s2, r) = splitMix(rng)
      rng = s2
      var pick = 0
      if (total > 0) {
        val target = ((r >>> 11) * (1.0 / (1L << 53))) * total
        var acc = 0.0
        i = 0
        var found = -1
        while (i < n && found < 0) {
          acc += math.max(0.0, 1.0 - best(i))
          if (acc >= target) found = i
          i += 1
        }
        pick = if (found < 0) n - 1 else found
      } else pick = c % n // degenerate sample: all points identical
      cents(c) = pts(pick)
      i = 0
      while (i < n) {
        val d = dot(pts(i), cents(c))
        if (d > best(i)) best(i) = d
        i += 1
      }
      c += 1
    }

    // Lloyd: sequential accumulation in sample order (deterministic sums)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        var bi = 0
        var bs = Double.NegativeInfinity
        var ci = 0
        while (ci < k) {
          val s = dot(pts(i), cents(ci))
          if (s > bs) { bs = s; bi = ci } // strict > : ties keep lowest idx
          ci += 1
        }
        val acc = sums(bi)
        var d = 0
        while (d < dim) { acc(d) += pts(i)(d); d += 1 }
        counts(bi) += 1
        i += 1
      }
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) {
          val m = sums(ci)
          var d = 0
          while (d < dim) { m(d) /= counts(ci); d += 1 }
          val nm = normalize(m)
          // zero mean (cancelled vectors): keep the previous centroid
          var ss = 0.0
          d = 0
          while (d < dim) { ss += nm(d) * nm(d); d += 1 }
          if (ss > 0) cents(ci) = nm
        }
        ci += 1
      }
      it += 1
    }
    cents
  }
}
