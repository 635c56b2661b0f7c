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
}
