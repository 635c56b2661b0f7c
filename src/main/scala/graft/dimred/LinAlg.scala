package graft.dimred

/**
 * Minimal local dense linear algebra for the dimensionality-reduction
 * transformers: a cyclic Jacobi eigendecomposition of symmetric
 * matrices (classic algorithm, Golub & Van Loan §8.5 / public domain).
 * Used on BOUNDED-dim Gram/covariance matrices (d ≤ a few thousand)
 * that the distributed pass reduces the corpus to — the corpus never
 * flows through here, only d×d aggregates.
 */
object LinAlg {

  /**
   * Eigendecomposition of a symmetric matrix (destroys `a`).
   * @param a d×d symmetric, row arrays
   * @return (eigenvalues, eigenvectors) sorted by eigenvalue DESCENDING;
   *         eigenvectors(i) is the eigenvector (length d) for value i.
   */
  def symEigen(a: Array[Array[Double]],
               maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1e-300, entrywiseL1(a))
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // Jacobi rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i)).toArray
    val vals = order.map(i => a(i)(i))
    val vecs = order.map(c => Array.tabulate(d)(r => v(r)(c)))
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += math.abs(a(i)(j)); j += 1 }
      i += 1
    }
    s
  }

  /** Entrywise L1 norm Σ|x| — the convergence scale for the sweep test
    * above. Deliberately NOT the Frobenius norm (the former name): both
    * sides of `off > tol·scale` are L1-style magnitudes, so the
    * criterion is self-consistent, but anyone tuning `tol` against the
    * Golub & Van Loan sqrt-sum-of-squares definition would be off by up
    * to a factor of d on flat matrices — the name now says what it
    * computes. */
  private def entrywiseL1(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (r <- a; x <- r) s += math.abs(x)
    s
  }
}
