package graft

/**
 * Pinned golden signatures for the deterministic hash kernels over the
 * fixture corpus (the reference's train set,
 * `/root/reference/vectorisers_test.go:11-27`). All kernel randomness
 * is counter-based (splitmix64 streams keyed by the input), so these
 * values are bit-reproducible on any machine; the driver's DuckDB
 * compare against the literal tables below detects any regression or
 * nondeterminism. Regenerate with `sbt "runMain graft.GoldenGen"`.
 */
object GoldenFixtures {

  // (url, sig_first, sig_last, sig_md5) — MinHash128 over hashed shingles
  val minhashSig: Seq[(String, Long, Long, String)] = Seq(
    ("fix:0", -5282627263680066904L, -389780742931779238L, "6e25cbd3124bc3aedba1e84685d0726b"),
    ("fix:1", -4648089537275430836L, -5956741127960733692L, "68387e49446fa53a31f6eec73d210212"),
    ("fix:2", -5501237411939040398L, -4622092414593472849L, "fadf2ac1742c4be0b9d20bcda59f2fc9"),
    ("fix:3", -2351335954410691293L, 3816144980791142351L, "30a8eee235c670696059c7951e728b63"),
    ("fix:4", -4528514823397908850L, -4334779390415062737L, "3c07c9c3653ce18b00f947bbdeed47cc"),
    ("fix:5", 3758707049709672422L, -3388336515156913371L, "cab6ace90accbea277c0a041c6c5d003"))

  // (url, simhash) — SimHash64 over the tf-idf-weighted hashed-term vector
  val simhash: Seq[(String, Long)] = Seq(
    ("fix:0", -6122931737663140383L),
    ("fix:1", -6986508322968756317L),
    ("fix:2", 6935743748226386470L),
    ("fix:3", -8320193626946480281L),
    ("fix:4", -25407800841987265L),
    ("fix:5", -4570020038042832187L))

  // (url, p1, p2, p3, p4) — k=4 JL random projection, 6dp
  val randomProj: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("fix:0", 0.742697, -0.982367, -1.701938, -0.464776),
    ("fix:1", 2.567038, 0.516369, -1.729744, -0.282638),
    ("fix:2", -0.560393, 1.108902, 1.911172, -0.508425),
    ("fix:3", 0.327099, 0.565822, 0.507627, -0.375902),
    ("fix:4", 1.993533, 0.683019, 0.2572, 1.842577),
    ("fix:5", 0.393887, -0.784704, 0.700631, -0.770249))

  // (doc_id, p1, p2) — TruncatedSVD k=2 FitTransform of the reference
  // 6×4 fixture matrix (dimreduction_test.go:21-29), exact Gram path.
  // |values| match the reference golden S·V_kᵀ within 0.01 (signs are
  // Jacobi's convention; the reference's are gonum's — DimRedSpec
  // asserts the sign-invariant equality)
  val svd: Seq[(Long, Double, Double)] = Seq(
    (0L, 8.0877, -1.889846),
    (1L, 2.21046, 2.521877),
    (2L, 1.693663, 4.647373),
    (3L, 0.951374, 1.932902))

  // (doc_id, p1, p2) — PCA k=2 FitTransform, same fixture
  val pca: Seq[(Long, Double, Double)] = Seq(
    (0L, 7.478296, 2.936976),
    (1L, 0.12843, 2.581046),
    (2L, -1.591261, 4.240047),
    (3L, -0.49573, 1.110301))

  // (url, r1..r4) — RandomIndexing k=8 doc projections, fixture corpus
  val rri: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("fix:0", 3.535534, 7.778175, -7.778175, 0.0),
    ("fix:1", 2.828427, 3.535534, -3.535534, 0.0),
    ("fix:2", 2.12132, 2.12132, -2.12132, 0.0),
    ("fix:3", 0.707107, 0.0, 1.414214, 0.0),
    ("fix:4", 5.656854, 3.535534, -2.828427, 0.0),
    ("fix:5", 0.0, 0.0, 0.0, 2.828427))

  // (url, p1..p4) — sparse-density JL projection (Achlioptas), fixture corpus
  val sparseProj: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("fix:0", 0.707107, -2.12132, -1.414214, 2.828427),
    ("fix:1", 0.707107, -0.707107, 0.707107, 0.707107),
    ("fix:2", 0.0, 0.707107, 0.0, 0.0),
    ("fix:3", 0.707107, -0.707107, 0.0, -0.707107),
    ("fix:4", 1.414214, -3.535534, 1.414214, -0.707107),
    ("fix:5", -0.707107, -0.707107, 0.0, 0.0))

  // (doc_id, t1, t2) — SCVB0 LDA doc-topic posteriors, pinned fixture
  // (docs alternate between the two planted topic blocks — the fit
  // separates them to ~0.999)
  val lda: Seq[(Long, Double, Double)] = Seq(
    (0L, 3.76E-4, 0.999624),
    (1L, 0.999392, 6.08E-4),
    (2L, 3.21E-4, 0.999679),
    (3L, 0.999366, 6.34E-4),
    (4L, 3.9E-4, 0.99961),
    (5L, 0.999579, 4.21E-4),
    (6L, 4.08E-4, 0.999592),
    (7L, 0.999414, 5.86E-4),
    (8L, 3.38E-4, 0.999662),
    (9L, 0.999238, 7.62E-4),
    (10L, 4.13E-4, 0.999587),
    (11L, 0.99947, 5.3E-4),
    (12L, 3.35E-4, 0.999665),
    (13L, 0.999472, 5.28E-4),
    (14L, 3.68E-4, 0.999632),
    (15L, 0.999434, 5.66E-4),
    (16L, 3.46E-4, 0.999654),
    (17L, 0.999364, 6.36E-4),
    (18L, 3.78E-4, 0.999622),
    (19L, 0.999472, 5.28E-4),
    (20L, 3.65E-4, 0.999635),
    (21L, 0.999409, 5.91E-4),
    (22L, 3.76E-4, 0.999624),
    (23L, 0.999093, 9.07E-4),
    (24L, 3.19E-4, 0.999681),
    (25L, 0.999368, 6.32E-4),
    (26L, 3.76E-4, 0.999624),
    (27L, 0.999396, 6.04E-4),
    (28L, 3.1E-4, 0.99969),
    (29L, 0.999162, 8.38E-4))

  private def longDoubles2Sql(rows: Seq[(Long, Double, Double)],
                              c1: String, c2: String): String =
    "SELECT * FROM (VALUES " + rows.map { case (id, a, b) =>
      s"(CAST($id AS BIGINT), CAST($a AS DOUBLE), CAST($b AS DOUBLE))"
    }.mkString(",") + s") t(doc_id, $c1, $c2)"

  private def strDoubles4Sql(rows: Seq[(String, Double, Double, Double, Double)],
                             cols: Seq[String]): String =
    "SELECT * FROM (VALUES " + rows.map { case (u, a, b, c, d) =>
      s"('$u', CAST($a AS DOUBLE), CAST($b AS DOUBLE), " +
        s"CAST($c AS DOUBLE), CAST($d AS DOUBLE))"
    }.mkString(",") + ") t(url, " + cols.mkString(", ") + ")"

  def svdSql: String = longDoubles2Sql(svd, "p1", "p2")
  def pcaSql: String = longDoubles2Sql(pca, "p1", "p2")
  def rriSql: String = strDoubles4Sql(rri, Seq("r1", "r2", "r3", "r4"))
  def sparseProjSql: String = strDoubles4Sql(sparseProj, Seq("p1", "p2", "p3", "p4"))
  def ldaSql: String = longDoubles2Sql(lda, "t1", "t2")

  def minhashSigSql: String =
    "SELECT * FROM (VALUES " + minhashSig.map { case (u, a, b, m) =>
      s"('$u', CAST($a AS BIGINT), CAST($b AS BIGINT), '$m')"
    }.mkString(",") + ") t(url, sig_first, sig_last, sig_md5)"

  def simhashSql: String =
    "SELECT * FROM (VALUES " + simhash.map { case (u, v) =>
      s"('$u', CAST($v AS BIGINT))"
    }.mkString(",") + ") t(url, simhash)"

  def randomProjSql: String =
    "SELECT * FROM (VALUES " + randomProj.map { case (u, a, b, c, d) =>
      s"('$u', CAST($a AS DOUBLE), CAST($b AS DOUBLE), " +
        s"CAST($c AS DOUBLE), CAST($d AS DOUBLE))"
    }.mkString(",") + ") t(url, p1, p2, p3, p4)"
}
