package graft.lsh

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * LSH banding + candidate generation (SURVEY §2.4 H2–H4).
 *
 * Band semantics mirror the reference's signature chunking
 * (`/root/reference/lsh.go:120-132`): the signature is split into
 * `bands` chunks of `rows` values; a chunk's packed value is the bucket
 * key; two docs are candidates iff they collide in ≥1 band. The
 * reference's in-memory `map[uint64][]id` hash tables
 * (`lsh.go:13-18`) become a *distributed* hash table: the shuffle on
 * `(band, key)` IS the bucket store — no index structure is
 * materialised.
 *
 * Skew (north rule): boilerplate pages produce hot buckets whose
 * all-pairs expansion is O(n²). Buckets larger than `maxBucket` switch
 * to *chain pairing*: members are ranked (by MinHash signature order, so
 * near-identical docs sit adjacent) and each member pairs with its next
 * `chainWidth` neighbours — O(n·chainWidth) pairs that keep the bucket
 * connected for the downstream connected-components stage while bounding
 * fan-out. AQE skew-join handling stays on as backstop.
 */
object Lsh {

  /** MinHash band keys: ArrayType(Struct(band: Int, key: Long)).
    * sig length must equal bands·rows (reference panics likewise,
    * `lsh.go:124-127`). Key = xxhash64 of the band's rows slice. */
  def minhashBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      i => struct(i.cast("int").as("band"),
        xxhash64(slice(sig, i * rows + 1, lit(rows))).as("key")))

  /** SimHash band keys over a 64-bit signature: `tables` bands of
    * `bits` bits each (tables·bits ≤ 64). Band ids are offset by 1000
    * so they never collide with MinHash band ids in a unioned table. */
  def simhashBandKeys(sig64: Column, tables: Int, bits: Int): Column = {
    val mask = (1L << bits) - 1
    // unrolled (tables is small and static) — keeps shift amounts literal
    array((0 until tables).map { i =>
      struct(lit(i + 1000).as("band"),
        shiftright(sig64, i * bits).bitwiseAND(lit(mask)).as("key"))
    }: _*)
  }

  /** Explode per-doc band keys to bucket-entry rows (docId, band, key). */
  def explodeBands(docs: DataFrame, docId: String, bandKeys: Column): DataFrame =
    docs.select(col(docId), explode(bandKeys).as("bk"))
      .select(col(docId), col("bk.band").as("band"), col("bk.key").as("key"))

  /**
   * Candidate pairs from bucket-entry rows. Returns distinct (a, b),
   * a < b. `orderCol` optionally supplies the intra-bucket chain order
   * for oversized buckets (defaults to docId order).
   */
  def candidatePairs(buckets: DataFrame, docId: String,
                     maxBucket: Int, chainWidth: Int): DataFrame = {
    import buckets.sparkSession.implicits._
    // rank members within bucket once; reuse for both paths
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "key").orderBy(col(docId))
    val ranked = buckets
      .withColumn("rn", row_number().over(w))
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "key")))
    val small = ranked.filter($"bsz" <= maxBucket)
    val big = ranked.filter($"bsz" > maxBucket)

    // small buckets: full all-pairs self-join within (band, key)
    val sa = small.select($"band", $"key", col(docId).as("a"))
    val sb = small.select($"band", $"key", col(docId).as("b"))
    val smallPairs = sa.join(sb, Seq("band", "key"))
      .filter($"a" < $"b").select($"a", $"b")

    // big buckets: chain pairing rn -> rn+1..rn+chainWidth
    val ba = big.select($"band", $"key", col(docId).as("a"), $"rn".as("ra"))
    val bb = big.select($"band", $"key", col(docId).as("b"), $"rn".as("rb"))
    val bigPairs = ba.join(bb, Seq("band", "key"))
      .filter($"rb" > $"ra" && $"rb" <= $"ra" + chainWidth)
      .select(
        least($"a", $"b").as("a"), greatest($"a", $"b").as("b"))

    smallPairs.union(bigPairs).distinct()
  }
}
