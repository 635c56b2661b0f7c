package graft.verify

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Distance / similarity measures (SURVEY §2.5), as codegen'd Catalyst
 * builtin compositions. References:
 * `/root/reference/measures/pairwise/comparisons.go`.
 */
object Measures {

  /** Exact Jaccard over shingle/element sets (north-rule verify).
    * Two EMPTY sets are 0/0 — NaN by the reference's float contract,
    * produced explicitly because ANSI mode (the Spark 4 default)
    * raises DIVIDE_BY_ZERO on a double divide too (`DivModLike`
    * checks the divisor for every numeric type): one pair of empty
    * arrays from a caller would kill the whole job. The dedup
    * pipeline itself never hits this (`hashedShingles` emits ≥ 1
    * shingle per doc by construction). */
  def jaccard(a: Column, b: Column): Column = {
    val u = size(array_union(a, b))
    when(u === 0, lit(Double.NaN))
      .otherwise(size(array_intersect(a, b)).cast("double") / u)
  }

  /** Hamming distance fraction over 64-bit signatures
    * (`comparisons.go:70-85`): popcount of xor, bit-packed fast path. */
  def hammingDist64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("double") / 64.0

  /** `comparisons.go:90-92`. */
  def hammingSim64(a: Column, b: Column): Column =
    lit(1.0) - hammingDist64(a, b)

  /** MinHash-estimated Jaccard: fraction of agreeing signature slots.
    * Empty signatures are 0/0 — explicit NaN for the same ANSI
    * divide-by-zero reason as [[jaccard]] (pipeline signatures are
    * fixed 128-wide; this is the caller-facing edge). */
  def minhashSim(a: Column, b: Column): Column =
    when(size(a) === 0, lit(Double.NaN))
      .otherwise(size(filter(zip_with(a, b, (x, y) => x === y), p => p))
        .cast("double") / size(a))

  /** Dot product of two dense double arrays (ordered left fold —
    * deterministic summation order for oracle parity). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a dense double array. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Per-ROW stand-in for the per-PAIR undefined-cosine NaN test:
    * cosineDense is NaN exactly when one side's norm — computed THIS
    * way, same cast and same underflow — is 0, NaN, or +Inf. A NaN
    * component (failed encoder) makes the norm NaN, and Spark's total
    * ordering treats `NaN =!= 0.0` as TRUE, so a zero-only check lets
    * such a row through to outrank every real neighbour at rank 1 and
    * pass every `>= tau` threshold; an Inf component (or an
    * overflowed norm) gives Inf/Inf = NaN with the same consequence,
    * and `isnan` alone misses it. For float-cast inputs (every vector
    * surface in this library) a finite positive norm means a finite
    * dot and norm product, so cosine is defined for every pair that
    * passes both sides. Filtering each input side on this predicate
    * (n + q row checks, pushed to the scan) removes precisely the
    * pairs a `!isnan(cos)` filter would. The per-pair form is a
    * measured trap: Catalyst pushes the filter through the scoring
    * projection and re-evaluates the whole cosine (three aggregate()
    * folds) per pair — 2-3× on the ANN paths. */
  def nonZeroNorm(vec: Column): Column = {
    val n = l2norm(transform(vec, x => x.cast("double")))
    !isnan(n) && n > 0.0 && n < Double.PositiveInfinity
  }

  /** Cosine similarity of dense float/double arrays
    * (`comparisons.go:17-29`; NaN when either norm is 0, as reference).
    * The zero-norm NaN is produced EXPLICITLY, not by dividing: under
    * ANSI mode (the Spark 4 default) a bare 0/0 raises
    * DIVIDE_BY_ZERO — one zero vector (a padding row, a failed
    * encoder) would kill the entire top-k/near-dup job instead of
    * scoring as the reference's undefined-similarity NaN.
    * Since the optimization round this is the codegen'd
    * [[VectorKernels.cosineBoxed]] kernel — bit-identical to the
    * previous `when(np === 0, NaN).otherwise(dot/np)` aggregate-fold
    * formulation (VectorKernelsSpec A/B), but inside whole-stage
    * codegen instead of three interpreted higher-order folds per pair
    * (the dominant ANN-path CPU, guide §4). Accepts float arrays
    * directly (reads cast element-wise), so callers no longer pay a
    * per-pair interpreted `transform(_.cast("double"))` either. */
  def cosineDense(a: Column, b: Column): Column =
    VectorFunctions.cosineDenseK(a, b)

  /** Cosine over sorted sparse entry arrays Struct(term, weight):
    * dot via map lookup on the smaller operand. */
  def cosineSparse(a: Column, b: Column): Column = {
    val bMap = map_from_entries(b)
    val d = aggregate(
      transform(a, e => e.getField("weight") *
        coalesce(element_at(bMap, e.getField("term")), lit(0.0))),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a,
      e => e.getField("weight") * e.getField("weight")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b,
      e => e.getField("weight") * e.getField("weight")),
      lit(0.0), (acc, v) => acc + v))
    // explicit zero-norm NaN — same ANSI divide-by-zero guard as
    // cosineDense
    when(na * nb === 0.0, lit(Double.NaN)).otherwise(d / (na * nb))
  }

  /** CosineDistance = 1 − cos (`comparisons.go:39-41`). */
  def cosineDistDense(a: Column, b: Column): Column = lit(1.0) - cosineDense(a, b)

  /** AngularDistance (`comparisons.go:49-56`). Cosine is clamped on
    * BOTH ends: rounding can push near-parallel pairs above +1 and
    * near-antipodal pairs below −1, and acos of either is NaN — but
    * that NaN would rank/compare ABOVE every real value under Spark's
    * NaN ordering, not drop out. The clamp must PRESERVE a zero-norm
    * cosine's NaN (the reference's undefined-similarity contract):
    * `least(NaN, 1.0)` is 1.0 under that same ordering — the naive
    * `greatest(least(..))` clamp silently read a zero vector as
    * IDENTICAL to everything (angular distance 0). Only `greatest`
    * keeps NaN (NaN ranks largest), so both ends clamp through it:
    * lower bound directly, upper bound negated. */
  def angularDist(a: Column, b: Column): Column = {
    val lo = greatest(cosineDense(a, b), lit(-1.0))
    acos(-greatest(-lo, lit(-1.0))) / math.Pi
  }

  /** AngularSimilarity (`comparisons.go:60-62`). */
  def angularSim(a: Column, b: Column): Column = lit(1.0) - angularDist(a, b)

  /** EuclideanDistance (`comparisons.go:97-101`). Codegen'd kernel,
    * fold-order-identical to the previous aggregate/zip_with form. */
  def euclidean(a: Column, b: Column): Column =
    VectorFunctions.euclideanK(a, b)

  /** ManhattanDistance (`comparisons.go:105-109`). Codegen'd kernel,
    * fold-order-identical to the previous aggregate/zip_with form. */
  def manhattan(a: Column, b: Column): Column =
    VectorFunctions.manhattanK(a, b)

  /** VectorLenSimilarity = sqrt(dot) (`comparisons.go:112-118`). */
  def vectorLenSim(a: Column, b: Column): Column = sqrt(dot(a, b))
}
