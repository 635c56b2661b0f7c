package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/**
 * Deterministic Common-Crawl-shaped pages table (FIXTURES.md §1): no
 * external data — a seeded splitmix64 stream keyed by row index drives
 * every choice, so the table is identical across runs, partitionings
 * and scales.
 *
 * Planted structure (each pair recorded in the expected-pairs oracle):
 *  - exact dups: identical text under a distinct url ("exact")
 *  - near dups: 1–3 token edits / shuffled tail ("near")
 *  - substring dups: a long verbatim run embedded in otherwise
 *    unrelated text ("substr") — only the suffix-array stage can catch
 *    these. The run is min(60, base-doc tokens) tokens, so its floor
 *    is ~200 chars when the base doc sits at its 40-token minimum
 *    (≈ 310 chars typical): safely above the substrMinRun=60 default,
 *    but anyone raising substrMinRun past ~200 must lengthen subText's
 *    run or planted substr pairs silently stop being caught
 *  - hot-skew block: one boilerplate paragraph on ~5% of rows
 *    (exercises band-bucket capping)
 *
 * Schema per BASELINE.json#input_hint:
 *   pages(url string, warc_ts timestamp, html binary, text string, lang string)
 */
object SyntheticPages {

  private val words: Array[String] = (
    "the quick brown fox jumped over lazy dog cat sat mat little laughed " +
      "see such fun laughing cow ran around spoon dish plate web page crawl " +
      "data spark query batch stream filter join group sort merge hash scan " +
      "table row column key value window agg fast slow big small news site " +
      "article content text html body header footer menu link image video")
    .split(" ")

  private val langs = Array("en", "de", "fr", "es", "zh")

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def rngStream(seed: Long): Iterator[Long] =
    Iterator.iterate(mix(seed))(s => mix(s))

  private def pick(h: Long, n: Int): Int = (((h >>> 1) % n).toInt)

  /** Deterministic base text of ~len tokens for row i. */
  def baseText(i: Long, len: Int): String = {
    val it = rngStream(i * 7919L + 13L)
    (0 until len).map(_ => words(pick(it.next(), words.length))).mkString(" ")
  }

  case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                  text: String, lang: String)
  case class ExpectedPair(urlA: String, urlB: String, kind: String)

  private def urlOf(i: Long, tag: String = ""): String =
    s"https://www.site${i % 997}.example/p/$tag$i"
  private def tsOf(i: Long): Timestamp =
    new Timestamp(1500000000000L + (mix(i) >>> 24))
  private def langOf(i: Long): String = langs(pick(mix(i ^ 0xabcdL), langs.length))
  private def htmlOf(text: String): Array[Byte] =
    s"<html><body>$text</body></html>".getBytes("UTF-8")

  case class GenSpec(n: Int, nExact: Int, nNear: Int, nSub: Int,
                     boilerPromille: Int)

  private def baseDocText(spec: GenSpec, i: Long): String = {
    val t0 = baseText(i, 40 + pick(mix(i ^ 0x1111L), 80))
    if (pick(mix(i ^ 0x2222L), 1000) < spec.boilerPromille)
      t0 + " " + baseText(-999999L, 120) // shared hot paragraph
    else t0
  }

  private def nearText(spec: GenSpec, j: Int): String = {
    val toks = baseDocText(spec, spec.nExact + j).split(" ")
    val it = rngStream(0x4ea4L + j)
    val nEdits = 1 + pick(it.next(), 3)
    (0 until nEdits).foreach { _ =>
      val p = pick(it.next(), toks.length)
      toks(p) = words(pick(it.next(), words.length))
    }
    toks.mkString(" ")
  }

  private def subText(spec: GenSpec, j: Int): String = {
    val toks = baseDocText(spec, spec.nExact + spec.nNear + j).split(" ")
    val run = toks.take(math.min(60, toks.length)).mkString(" ")
    baseText(5000000L + j, 30) + " " + run + " " + baseText(6000000L + j, 30)
  }

  def pageOf(spec: GenSpec, row: Long): Page = {
    val n = spec.n
    if (row < n) {
      val t = baseDocText(spec, row)
      Page(urlOf(row), tsOf(row), htmlOf(t), t, langOf(row))
    } else if (row < n + spec.nExact) {
      val j = (row - n).toInt
      val t = baseDocText(spec, j)
      Page(urlOf(j, "dupx"), tsOf(n.toLong + j), htmlOf(t), t, langOf(j))
    } else if (row < n.toLong + spec.nExact + spec.nNear) {
      val j = (row - n - spec.nExact).toInt
      val t = nearText(spec, j)
      Page(urlOf(j, "dupn"), tsOf(2L * n + j), htmlOf(t), t,
        langOf(spec.nExact + j))
    } else {
      val j = (row - n - spec.nExact - spec.nNear).toInt
      val t = subText(spec, j)
      Page(urlOf(j, "dups"), tsOf(3L * n + j), htmlOf(t), t,
        langOf(spec.nExact + spec.nNear + j))
    }
  }

  /**
   * Build (pages, expectedPairs). `n` base documents; planted rows are
   * appended after the base block with derived urls.
   *
   * Generation is **distributed and index-pure**: `spark.range` over row
   * ids with every field a deterministic function of the id. A
   * driver-side Seq would ride through every downstream plan as a
   * LocalRelation that Catalyst re-hashes on each transform — measured
   * ~35 s of single-threaded driver time per run at 341k rows.
   */
  def generate(spark: SparkSession, n: Int,
               exactFrac: Double = 0.05, nearFrac: Double = 0.05,
               substrFrac: Double = 0.02, boilerFrac: Double = 0.05)
  : (DataFrame, DataFrame) = {
    import spark.implicits._

    val nExact = (n * exactFrac).toInt
    val nNear = (n * nearFrac).toInt
    val nSub = (n * substrFrac).toInt
    val total = n.toLong + nExact + nNear + nSub
    val spec = GenSpec(n, nExact, nNear, nSub, (boilerFrac * 1000).toInt)

    // slice count sized by the DATA, capped by the session parallelism:
    // a 300-doc fixture at 32 slices pays ~56 jobs × 32 near-empty
    // tasks of fixed scheduling overhead through the whole downstream
    // pipeline (measured: most of q_dedup_clusters' 14 s bench floor),
    // exactly as a parquet read of 300 docs would never produce 32
    // splits. Results are slice-count-independent: every field is a
    // pure function of the row id, df counts are integer sums, and
    // signatures are per-row.
    val slices = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, total / 100)).toInt
    val pagesDf = spark.range(0, total, 1, slices)
      .as[Long].map(row => SyntheticPages.pageOf(spec, row)).toDF()

    val pairs =
      (0 until nExact).map(j => ExpectedPair(urlOf(j), urlOf(j, "dupx"), "exact")) ++
      (0 until nNear).map(j => ExpectedPair(urlOf(nExact + j), urlOf(j, "dupn"), "near")) ++
      (0 until nSub).map(j => ExpectedPair(urlOf(nExact + nNear + j), urlOf(j, "dups"), "substr"))
    (pagesDf, spark.createDataset(pairs).toDF())
  }
}
