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
