package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{GoLowerUtil, TextKernel}
import org.apache.spark.unsafe.types.UTF8String

/** Golden fixtures from /root/reference/vectorisers_test.go (FIXTURES.md §3). */
class TextKernelSpec extends AnyFunSuite with SparkSpec {
  import SparkSpec._

  private def vocabSize(docs: Seq[String], stop: Seq[String]): Long = {
    import spark.implicits._
    docs.toDF("text")
      .select(explode(TextKernel.dropStopWords(
        TextKernel.tokenize($"text"), stop)).as("t"))
      .agg(countDistinct($"t")).as[Long].head()
  }

  test("vocab sizes match reference goldens 26/8/18 (vectorisers_test.go:35-37)") {
    assert(vocabSize(trainSet, Nil) === 26L)
    assert(vocabSize(trainSet.take(1), Nil) === 8L)
    assert(vocabSize(trainSet, stopWords) === 18L)
  }

  test("GoLower matches Go simple case fold on edge cases") {
    def lower(s: String): String =
      GoLowerUtil.goLower(UTF8String.fromString(s)).toString
    assert(lower("The. Lazy DOG") === "the. lazy dog")
    // U+0130 İ: Go simple fold -> i (1 cp); Java String.toLowerCase -> i̇ (2 cp)
    assert(lower("İ") === "i")
    assert("İ".toLowerCase === "i̇", "sanity: JDK full fold differs")
    // U+0131 ı dotless i: unchanged
    assert(lower("ı") === "ı")
    // Σ -> σ (simple fold: never final-sigma ς)
    assert(lower("ΣΑΣ") === "σασ")
    // ẞ U+1E9E -> ß U+00DF
    assert(lower("ẞ") === "ß")
    // supplementary plane: DESERET CAPITAL 𐐀 U+10400 -> U+10428
    assert(lower(new String(Character.toChars(0x10400))) ===
      new String(Character.toChars(0x10428)))
  }

  test("tokenize drops digits and punctuation, keeps unicode letters") {
    import spark.implicits._
    val toks = Seq("Héllo, wörld 123 foo_bar!").toDF("text")
      .select(TextKernel.tokenize($"text").as("t")).as[Seq[String]].head()
    assert(toks === Seq("héllo", "wörld", "foo", "bar"))
  }

  test("stop-word filter preserves order and duplicates") {
    import spark.implicits._
    val toks = Seq("the dog and the dog ran").toDF("text")
      .select(TextKernel.dropStopWords(
        TextKernel.tokenize($"text"), stopWords).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("dog", "dog", "ran"))
  }

  test("shingles: w-token windows; short docs fall back to whole-doc shingle") {
    import spark.implicits._
    val df = Seq("a b c d e f g", "a b").toDF("text")
      .select(TextKernel.shingles(split($"text", " "), 5).as("s"))
    val sizes = df.select(size($"s")).as[Int].collect()
    assert(sizes === Array(3, 1)) // 7-5+1 = 3 windows; short doc -> 1
  }
}
