package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextKernel
import graft.tfidf.TfIdf
import graft.verify.Measures

/**
 * The reference's runnable-doc e2e (`/root/reference/example_test.go:11-63`):
 * query "the brown fox ran around the dog" must retrieve
 * "The quick brown fox jumped over the lazy dog" from the example
 * corpus. The reference runs an LSI (SVD) pipeline; plain TF-IDF cosine
 * retrieval reproduces the same `// Output:` on this corpus (the SVD is
 * a rank reduction, out of the dedup north rule — SURVEY §2.6).
 */
class RetrievalSpec extends AnyFunSuite with SparkSpec {

  test("example e2e: query retrieves the fox document") {
    import spark.implicits._
    val corpus = Seq(
      "The quick brown fox jumped over the lazy dog",
      "hey diddle diddle, the cat and the fiddle",
      "the cow jumped over the moon",
      "the little dog laughed to see such fun",
      "and the dish ran away with the spoon")
    val query = "the brown fox ran around the dog"

    def entries(c: org.apache.spark.sql.Column) =
      TfIdf.tfEntries(TextKernel.dropStopWords(
        TextKernel.tokenize(c), SparkSpec.stopWords))

    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("e", entries($"text"))
    val dfTable = docs.select(explode($"e").as("x"))
      .select($"x.term".as("term")).groupBy("term").agg(count(lit(1)).as("df"))
    val idf = TfIdf.idf(dfTable, corpus.size.toLong)
    val docVecs = TfIdf.applyIdf(docs, "doc_id", "e", idf)
      .select($"doc_id", $"text", $"tfidf")

    val qVec = TfIdf.applyIdf(
        Seq((99L, query)).toDF("doc_id", "text").withColumn("e", entries($"text")),
        "doc_id", "e", idf)
      .select($"tfidf".as("qv"))

    val best = docVecs.crossJoin(qVec)
      .withColumn("cos", Measures.cosineSparse($"qv", $"tfidf"))
      .orderBy($"cos".desc)
      .select($"text").as[String].head()
    assert(best === "The quick brown fox jumped over the lazy dog")
  }

  /** The reference's ACTUAL pipeline — CountVectoriser → TF-IDF →
    * TruncatedSVD(4) → cosine (`example_test.go:24-45`) — with the SVD
    * rank reduction in the loop (R1), not sidestepped. */
  test("LSI e2e: TF-IDF → TruncatedSVD(4) → cosine retrieves the fox document") {
    import spark.implicits._
    val corpus = Seq(
      "The quick brown fox jumped over the lazy dog",
      "hey diddle diddle, the cat and the fiddle",
      "the cow jumped over the moon",
      "the little dog laughed to see such fun",
      "and the dish ran away with the spoon")
    val query = "the brown fox ran around the dog"

    def entries(c: org.apache.spark.sql.Column) =
      TfIdf.tfEntries(TextKernel.dropStopWords(
        TextKernel.tokenize(c), SparkSpec.stopWords))

    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("e", entries($"text"))
    val dfTable = docs.select(explode($"e").as("x"))
      .select($"x.term".as("term")).groupBy("term").agg(count(lit(1)).as("df"))
    val idf = TfIdf.idf(dfTable, corpus.size.toLong)

    // vocabulary-dense term ids for the exact Gram path (OOV query
    // terms drop out on join — the reference's CountVectoriser drops
    // them identically, vectorisers.go:193-198)
    val vocab = dfTable.select($"term").orderBy($"term").collect()
      .map(_.getString(0)).zipWithIndex.toMap
    val d = vocab.size
    val vocabDf = vocab.toSeq.toDF("term", "tid")

    def denseEntries(df: org.apache.spark.sql.DataFrame) =
      TfIdf.applyIdf(df, "doc_id", "e", idf)
        .select($"doc_id", explode($"tfidf").as("x"))
        .join(vocabDf, $"x.term" === $"term")
        .groupBy($"doc_id")
        .agg(collect_list(struct($"tid".cast("long").as("term"),
          $"x.weight".as("weight"))).as("entries"))

    val docVecs = denseEntries(docs)
    val model = graft.dimred.TruncatedSVD.fit(docVecs, "doc_id", "entries", d, 4)
    val lsi = model.transform(docVecs, "doc_id", "entries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    val qDf = Seq((99L, query)).toDF("doc_id", "text").withColumn("e", entries($"text"))
    val qv = model.transform(denseEntries(qDf), "doc_id", "entries")
      .collect().head.getSeq[Double](1).toArray

    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val matched = (0 until corpus.size).maxBy(i => cos(qv, lsi(i.toLong)))
    assert(corpus(matched) === "The quick brown fox jumped over the lazy dog")
  }
}
