package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._
import graft.text.TextKernel

/**
 * Pipeline combinator (SURVEY §2.6 R6;
 * `/root/reference/vectorisers.go:287-344`): the reference's LSI
 * example — Pipeline(CountVectoriser, TfidfTransformer,
 * TruncatedSVD(4)).FitTransform + Transform(query) —
 * (`example_test.go:24-49`) through the combinator API, fitted state
 * reused on the query path.
 */
class PipelineCombinatorSpec extends AnyFunSuite with SparkSpec {

  private val corpus = Seq(
    "The quick brown fox jumped over the lazy dog",
    "hey diddle diddle, the cat and the fiddle",
    "the cow jumped over the moon",
    "the little dog laughed to see such fun",
    "and the dish ran away with the spoon")

  private def df(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .withColumn("tokens", TextKernel.dropStopWords(
        TextKernel.tokenize(col("text")), SparkSpec.stopWords))
  }

  test("LSI pipeline via combinator reproduces the example match") {
    val docs = df(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val lsi = new Pipeline(
      CountVectorise("tokens"),
      TfIdfStage("doc_id", "entries"),
      VocabEncode("doc_id", "tfidf"),
      SvdStage("doc_id", "encoded", k = 4))
    val (fitted, out) = lsi.fitTransform(docs)
    val docVecs = out.select(col("doc_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(docVecs.size == 5)

    // query path: Transform reuses every stage's fitted state
    val q = fitted.transform(df(Seq((99L, "the brown fox ran around the dog"))))
      .select(col("proj")).collect().head.getSeq[Double](0).toArray

    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val matched = (0 until corpus.size).maxBy(i => cos(q, docVecs(i.toLong)))
    assert(corpus(matched) === "The quick brown fox jumped over the lazy dog")
  }

  test("distributed dense rank == serial rank semantics (A1)") {
    import spark.implicits._
    // vocabulary over the fixture corpus: first-appearance order, sizes
    // from vectorisers_test.go:35-37 already gated by TextKernelSpec —
    // here the DISTRIBUTED rank must equal the rank a single-partition
    // window would give
    val docs = SparkSpec.trainSet.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("tokens", TextKernel.tokenize(col("text")))
    val got = graft.tfidf.Vocabulary.fit(docs, col("doc_id"), col("tokens"))
      .as[(String, Int)].collect().toMap
    // serial oracle
    val toks = SparkSpec.trainSet.flatMap(t =>
      t.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty))
    val serial = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    toks.foreach(t => if (!serial.contains(t)) serial(t) = serial.size)
    assert(got.size == serial.size)
    serial.foreach { case (t, id) =>
      assert(got(t) == id, s"term $t: ${got(t)} vs $id")
    }
  }
}
