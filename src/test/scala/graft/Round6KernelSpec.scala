package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Optimization-round (r06) kernel equivalence A/Bs: every codegen'd
 * kernel that replaced an interpreted Column formulation must be
 * VALUE-IDENTICAL to it (bit-identical doubles — the driver hashes
 * results, and ANN ranks tie-break on exact cosine values).
 */
class Round6KernelSpec extends AnyFunSuite with SparkSpec {

  import graft.verify.{Measures, VectorFunctions}
  import graft.hash.ShingleFunctions

  // ---- legacy Column formulations (pre-r06), reproduced verbatim ----
  private def dotL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def l2L(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
  private def cosineL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val np = l2L(a) * l2L(b)
    when(np === 0.0, lit(Double.NaN)).otherwise(dotL(a, b) / np)
  }
  private def euclideanL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
  private def manhattanL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (acc, v) => acc + v)
  private def jaccardL(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val u = size(array_union(a, b))
    when(u === 0, lit(Double.NaN))
      .otherwise(size(array_intersect(a, b)).cast("double") / u)
  }
  private def shingleStrsL(t: org.apache.spark.sql.Column, w: Int) =
    array_distinct(
      when(size(t) >= w,
        transform(sequence(lit(0), size(t) - w),
          i => concat_ws(" ", slice(t, i + 1, lit(w)))))
        .otherwise(array(concat_ws(" ", t))))

  test("cosine/euclidean/manhattan kernels are bit-identical to the " +
    "legacy aggregate folds on adversarial double arrays") {
    import spark.implicits._
    val rows: Seq[(Seq[Double], Seq[Double])] = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),           // zero norm -> NaN cosine
      (Seq(0.0, 0.0), Seq(0.0, 0.0)),           // both zero -> NaN
      (Seq(1e-200, 1e-200), Seq(1e-200, 1e200)),// under/overflow paths
      (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),    // NaN component
      (Seq(Double.PositiveInfinity, 1.0), Seq(1.0, 1.0)),
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),      // length mismatch -> null
      (Seq(0.1, -0.2, 0.30000000000000004, 7e-13), Seq(-0.7, 0.0, 1e13, 2.5)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosineDenseK($"a", $"b"),
      VectorFunctions.euclideanK($"a", $"b"),
      VectorFunctions.manhattanK($"a", $"b"),
      cosineL($"a", $"b"), euclideanL($"a", $"b"), manhattanL($"a", $"b"))
      .collect()
    got.foreach { r =>
      (0 until 3).foreach { i =>
        val k = if (r.isNullAt(i)) null else java.lang.Double.valueOf(r.getDouble(i))
        val l = if (r.isNullAt(i + 3)) null else java.lang.Double.valueOf(r.getDouble(i + 3))
        if (k == null || l == null) assert(k == l, s"null mismatch col $i: $r")
        else assert(
          java.lang.Double.doubleToRawLongBits(k.doubleValue()) ==
            java.lang.Double.doubleToRawLongBits(l.doubleValue()) ||
            (k.isNaN && l.isNaN),
          s"bit mismatch col $i: kernel=$k legacy=$l in $r")
      }
    }
  }

  test("cosine kernel on raw FLOAT arrays equals the legacy " +
    "transform-cast-then-fold formulation") {
    import spark.implicits._
    val rows: Seq[(Seq[Float], Seq[Float])] = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.75f, -1.375f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f, 0.1f)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosineDenseK($"a", $"b").as("k"),
      cosineL(transform($"a", x => x.cast("double")),
        transform($"b", x => x.cast("double"))).as("l")).collect()
    got.foreach { r =>
      val k = r.getDouble(0); val l = r.getDouble(1)
      assert(java.lang.Double.doubleToRawLongBits(k) ==
        java.lang.Double.doubleToRawLongBits(l) || (k.isNaN && l.isNaN),
        s"$k != $l")
    }
  }

  test("jaccardLongK equals the legacy array_union/intersect form on " +
    "long-array sets incl. empty and duplicate-free invariants") {
    import spark.implicits._
    val rows: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq.empty[Long]),        // 0/0 -> NaN
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L), Seq(5L)),
      (Seq(Long.MinValue, -1L, 0L, Long.MaxValue), Seq(0L, Long.MaxValue)),
      ((1L to 200L).toSeq, (101L to 300L).toSeq))
    val df = rows.toDF("a", "b")
    val got = df.select(
      VectorFunctions.jaccardLongK($"a", $"b").as("k"),
      jaccardL($"a", $"b").as("l")).collect()
    got.foreach { r =>
      val k = r.getDouble(0); val l = r.getDouble(1)
      assert((k.isNaN && l.isNaN) || k == l, s"$k != $l")
    }
  }

  test("string shingle kernels are byte-identical to the Column " +
    "formulation (windows, distinct order, short-doc fallback, md5 ids)") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumped over the lazy dog",
      "a b a b a b a b a b a b",   // repeated windows -> distinct dedup
      "one two three four five",    // exactly w tokens
      "one two three four",         // short doc -> whole-text fallback
      "solo",
      "",                           // empty text -> [""] fallback
      "x  y")                       // double space -> empty token kept
    val df = texts.toDF("text").select(split(col("text"), " ").as("t"))
    val got = df.select(
      ShingleFunctions.stringShingles($"t", 5).as("k"),
      shingleStrsL($"t", 5).as("l"),
      ShingleFunctions.stringShingleCount($"t", 5).as("kc"),
      ShingleFunctions.md5Prefix60(ShingleFunctions.stringShingles($"t", 5))
        .as("kid"),
      transform(shingleStrsL($"t", 5),
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")).as("lid"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingle arrays differ: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      assert(r.getInt(2) == r.getSeq[String](1).size)
      assert(r.getSeq[Long](3) == r.getSeq[Long](4),
        s"md5 ids differ: ${r.getSeq[Long](3)} vs ${r.getSeq[Long](4)}")
    }
  }

  test("tokenWindows kernel equals the legacy transform/slice/array_join " +
    "Column form (non-distinct windows, short-doc empty array)") {
    import spark.implicits._
    def legacy(text: org.apache.spark.sql.Column, n: Int) = {
      val toks = split(text, " ")
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    }
    val texts = Seq(
      "a b c d e f g h i j",
      "one two three",            // shorter than n -> empty
      "w w w w w w w w",          // repeats are KEPT (non-distinct)
      "", "x  y z q p r s t u")
    val df = texts.toDF("text")
    val got = df.select(
      graft.ops.TrainingDataOps.tokenWindows(col("text"), 8).as("k"),
      legacy(col("text"), 8).as("l")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("TokenStats kernels equal the legacy aggregate/filter folds " +
    "(length sum, stop/marker membership counts)") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox and a lazy dog", "der hund ist nicht da",
      "", "  double  spaces ", "onetoken",
      "el agua es de los rios y una mas", "the the the the")
    val df = texts.toDF("text").select(split(col("text"), " ").as("t"))
    val stop = graft.ops.TrainingDataOps.qualityStopWords.toArray
    val got = df.select(
      graft.text.TokenStats.sumStrLens($"t").as("ks"),
      aggregate($"t", lit(0.0), (acc, x) => acc + length(x)).as("ls"),
      graft.text.TokenStats.countIn($"t", stop).as("kc"),
      size(filter($"t", x => array_contains(lit(stop), x))).as("lc"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(r.getInt(2) == r.getInt(3))
    }
  }

  test("fused gotokens kernel equals regexp_extract_all(golower, \\p{L}+) " +
    "on reference fold fixtures and adversarial Unicode") {
    import spark.implicits._
    val texts = SparkSpec.trainSet ++ SparkSpec.testSet ++ Seq(
      "İstanbul ile ıspanak IJssel",      // Turkish dotted/dotless I
      "ΣΊΣΥΦΟΣ ΑΘΗΝΑ",                   // final sigma fold
      "STRAẞE Straße",                   // capital sharp s
      "mixed42digits and-hyphens_under", // digit/punct boundaries
      "𝒜𝒷𝒸 math 𝔘𝔫𝔦 letters",        // supplementary-plane letters
      "   ", "", "ⅣⅥ ①②", "a",
      "日本語テキストと漢字", "emoji 🙂 inside")
    val df = texts.toDF("text")
    val got = df.select(
      graft.text.GoTokens.gotokens(col("text")).as("k"),
      regexp_extract_all(graft.text.GoLower.golower(col("text")),
        lit("[\\p{L}]+"), lit(0)).as("l")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("simhash 64-bit Gaussian cache is bit-identical to the uncached " +
    "Box-Muller loop (the pre-r06 inline path, reproduced here)") {
    import graft.hash.HashKernels.mix64
    def uncached(termIds: Array[Long], weights: Array[Double]): Long = {
      val bits = 64
      val acc = new Array[Double](bits)
      val twoPi = 2.0 * math.Pi
      var t = 0
      while (t < termIds.length) {
        val w = weights(t)
        if (w != 0.0) {
          val seed = mix64(termIds(t) ^ 0x51a45ea51a45ea5L)
          var b = 0
          var ctr = 0L
          while (b < bits) {
            val u1 = (mix64(seed + ctr) >>> 11) * 1.1102230246251565e-16
            val u2 = (mix64(seed + ctr + 1) >>> 11) * 1.1102230246251565e-16
            ctr += 2
            val r = math.sqrt(-2.0 * math.log(u1 + 1.1102230246251565e-16))
            val theta = twoPi * u2
            acc(b) += w * (r * math.cos(theta))
            if (b + 1 < bits) acc(b + 1) += w * (r * math.sin(theta))
            b += 2
          }
        }
        t += 1
      }
      var word = 0L
      var b = 0
      while (b < bits) {
        if (acc(b) >= 0.0) word |= (1L << b)
        b += 1
      }
      word
    }
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { i =>
      val n = 1 + rnd.nextInt(40)
      // overlapping term ids across rows exercise cache hits; a few
      // huge ids exercise slot collisions/evictions
      val ids = Array.fill(n)(
        if (rnd.nextBoolean()) rnd.nextInt(30).toLong
        else rnd.nextLong())
      val ws = Array.fill(n)(rnd.nextGaussian())
      if (n > 3) ws(0) = 0.0 // zero-weight skip path
      assert(graft.hash.HashKernels.simhash64(ids, ws) == uncached(ids, ws),
        s"simhash mismatch at row $i")
    }
  }
}
