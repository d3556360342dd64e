package graft.core

/** The REFERENCE cosine implementation: the driver-side probe-cell
  * ranking in SparkEntry calls it directly, and the two performance
  * forms in graft.expr.Kernels (`cosine` over ArrayData for
  * `graft_cosine`, and the ArrayData-x-primitive `cosineAD` inside
  * `graft_ivf_assign`) replicate EXACTLY this accumulation order —
  * differential-gated in FusedKernelDiffSpec (Kernels.cosine bit-compare
  * and the ivfAssign-vs-argmax property). All call sites must stay
  * bit-identical in accumulation order: the DuckDB oracle recomputes assignment + ranking
  * independently and the dump-time margin guard reasons about near-ties,
  * so a silent divergence between copies (e.g. a changed zero-norm
  * convention in one of them) would desynchronize assignment from
  * ranking in a way no test names. Sequential loop, no SIMD/reduction
  * reordering — deterministic across JVMs.
  *
  * Degenerate-input conventions (documented divergence from DuckDB's
  * `list_cosine_similarity`, which errors on length mismatch and yields
  * NaN on a zero vector): mismatched lengths truncate to the shorter,
  * and a zero-norm side scores 0.0. The oracle comparison is only
  * bit-exact over well-formed inputs — fixed-dimension, nonzero vectors,
  * which the embeddings testdata guarantees; feeding degenerate vectors
  * through an oracled query would surface as a parity diff, not silent
  * wrongness. */
object VecMath {
  def cosine(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i) * y(i)
      nx += x(i) * x(i)
      ny += y(i) * y(i)
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}
