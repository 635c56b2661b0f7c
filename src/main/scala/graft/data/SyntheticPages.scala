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
 *  - substring dups: a long verbatim run (≥ 300 chars) embedded in
 *    otherwise unrelated text ("substr") — only the suffix-array stage
 *    can catch these
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

  /** Build (pages, expectedPairs). `n` base documents; planted rows are
    * appended after the base block with derived urls. */
  def generate(spark: SparkSession, n: Int,
               exactFrac: Double = 0.05, nearFrac: Double = 0.05,
               substrFrac: Double = 0.02, boilerFrac: Double = 0.05)
  : (DataFrame, DataFrame) = {
    import spark.implicits._

    val boiler = baseText(-999999L, 120) // shared hot paragraph
    val nExact = (n * exactFrac).toInt
    val nNear = (n * nearFrac).toInt
    val nSub = (n * substrFrac).toInt

    def urlOf(i: Long, tag: String = ""): String =
      s"https://www.site${i % 997}.example/p/$tag$i"
    def tsOf(i: Long): Timestamp =
      new Timestamp(1500000000000L + (mix(i) >>> 24))
    def langOf(i: Long): String = langs(pick(mix(i ^ 0xabcdL), langs.length))
    def htmlOf(text: String): Array[Byte] =
      s"<html><body>$text</body></html>".getBytes("UTF-8")

    // base docs; ~boilerFrac of them get the hot paragraph appended
    val base = (0L until n).map { i =>
      val t0 = baseText(i, 40 + pick(mix(i ^ 0x1111L), 80))
      val t = if (pick(mix(i ^ 0x2222L), 1000) < (boilerFrac * 1000).toInt)
        t0 + " " + boiler else t0
      Page(urlOf(i), tsOf(i), htmlOf(t), t, langOf(i))
    }

    val pairs = scala.collection.mutable.ArrayBuffer.empty[ExpectedPair]

    // exact dups of docs 0..nExact
    val exacts = (0 until nExact).map { j =>
      val src = base(j)
      pairs += ExpectedPair(src.url, urlOf(j, "dupx"), "exact")
      Page(urlOf(j, "dupx"), tsOf(n + j), src.html, src.text, src.lang)
    }

    // near dups: 1-3 token substitutions of docs nExact..nExact+nNear
    val nears = (0 until nNear).map { j =>
      val src = base(nExact + j)
      val toks = src.text.split(" ")
      val it = rngStream(0x4ea4L + j)
      val nEdits = 1 + pick(it.next(), 3)
      (0 until nEdits).foreach { _ =>
        val p = pick(it.next(), toks.length)
        toks(p) = words(pick(it.next(), words.length))
      }
      val t = toks.mkString(" ")
      pairs += ExpectedPair(src.url, urlOf(j, "dupn"), "near")
      Page(urlOf(j, "dupn"), tsOf(2 * n + j), htmlOf(t), t, src.lang)
    }

    // substring dups: 60-token verbatim run from doc k inside fresh salad
    val subs = (0 until nSub).map { j =>
      val k = nExact + nNear + j
      val src = base(k)
      val toks = src.text.split(" ")
      val runLen = math.min(60, toks.length)
      val run = toks.take(runLen).mkString(" ")
      val t = baseText(5000000L + j, 30) + " " + run + " " + baseText(6000000L + j, 30)
      pairs += ExpectedPair(src.url, urlOf(j, "dups"), "substr")
      Page(urlOf(j, "dups"), tsOf(3 * n + j), htmlOf(t), t, src.lang)
    }

    val all = base ++ exacts ++ nears ++ subs
    val pagesDf = spark.createDataset(all).toDF()
      .repartition(spark.sparkContext.defaultParallelism)
    val pairsDf = spark.createDataset(pairs.toSeq).toDF()
    (pagesDf, pairsDf)
  }
}
