package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tfidf.TfIdf

/** Golden IDF / TF-IDF fixtures from /root/reference/weightings_test.go. */
class TfIdfSpec extends AnyFunSuite with SparkSpec {

  // 6 terms × 4 docs matrix from weightings_test.go:20-38 (rows = terms)
  private val m: Array[Array[Double]] = Array(
    Array(1, 3, 5, 2), Array(8, 1, 0, 0), Array(2, 1, 0, 1),
    Array(0, 0, 0, 0), Array(0, 0, 0, 1), Array(0, 1, 0, 0))

  private def docsDf = {
    import spark.implicits._
    // transpose to one row per doc with sparse (term, cnt) entries
    val docs = (0 until 4).map { d =>
      val entries = (0 until 6).flatMap { t =>
        if (m(t)(d) != 0) Some((t.toLong, m(t)(d).toInt)) else None
      }
      (d.toLong, entries)
    }
    docs.toDF("doc_id", "raw")
      .withColumn("entries", transform($"raw",
        e => struct(e.getField("_1").as("term"), e.getField("_2").as("cnt"))))
      .drop("raw")
  }

  test("idf = ln((1+n)/(1+df)), 16-digit golden (weightings_test.go:30-37)") {
    import spark.implicits._
    val expected = Map(
      0L -> 0.0, 1L -> 0.5108256237659907, 2L -> 0.22314355131420976,
      4L -> 0.9162907318741551, 5L -> 0.9162907318741551)
    // term 3 is all-zero: never appears in entries => df undefined (ref
    // gives ln(5/1)=1.6094... for it; it contributes no tf-idf mass)
    val dfTable = docsDf.select(explode($"entries").as("e"))
      .select($"e.term".as("term")).groupBy("term").agg(count(lit(1)).as("df"))
    val got = TfIdf.idf(dfTable, 4L).as[(Long, Double)].collect().toMap
    expected.foreach { case (t, v) =>
      assert(got(t) === v, s"term $t")
    }
  }

  test("tf-idf transform matches golden matrix ±0.001 (weightings_test.go:66-85)") {
    import spark.implicits._
    val expected: Map[(Long, Long), Double] = Map(
      // (term, doc) -> tfidf ; zeros omitted
      (1L, 0L) -> 4.086604990127925, (1L, 1L) -> 0.5108256237659907,
      (2L, 0L) -> 0.44628710262841953, (2L, 1L) -> 0.22314355131420976,
      (2L, 3L) -> 0.22314355131420976,
      (4L, 3L) -> 0.9162907318741551,
      (5L, 1L) -> 0.9162907318741551)
    val dfTable = docsDf.select(explode($"entries").as("e"))
      .select($"e.term".as("term")).groupBy("term").agg(count(lit(1)).as("df"))
    val idfTable = TfIdf.idf(dfTable, 4L)
    val out = TfIdf.applyIdf(docsDf, "doc_id", "entries", idfTable)
      .select($"doc_id", explode($"tfidf").as("e"))
      .select($"e.term", $"doc_id", $"e.weight").as[(Long, Long, Double)]
      .collect()
    out.foreach { case (t, d, w) =>
      val exp = expected.getOrElse((t, d), 0.0)
      assert(math.abs(w - exp) < 0.001, s"term $t doc $d: $w vs $exp")
    }
    // every expected nonzero is present
    val gotMap = out.map { case (t, d, w) => ((t, d), w) }.toMap
    expected.foreach { case (k, v) =>
      assert(math.abs(gotMap.getOrElse(k, 0.0) - v) < 0.001, s"$k")
    }
  }

  test("fitted model Save/Load round trip (weightings_test.go:123-155)") {
    import spark.implicits._
    val dfTable = docsDf.select(explode($"entries").as("e"))
      .select($"e.term".as("term")).groupBy("term").agg(count(lit(1)).as("df"))
    val model = TfIdf.TfIdfModel(TfIdf.idf(dfTable, 4L), 4L)
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf").toString
    model.save(dir)
    val loaded = TfIdf.TfIdfModel.load(spark, dir)
    assert(loaded.numDocs == 4L)
    // idf table round-trips exactly (reference asserts DIA equality)
    val a = model.idf.as[(Long, Double)].collect().toMap
    val b = loaded.idf.as[(Long, Double)].collect().toMap
    assert(a == b)
    // load-and-reuse: weights from the loaded model match the fitted one
    def weights(m: TfIdf.TfIdfModel) =
      m.transform(docsDf, "doc_id", "entries")
        .select($"doc_id", explode($"tfidf").as("e"))
        .select($"e.term", $"doc_id", $"e.weight").as[(Long, Long, Double)]
        .collect().map { case (t, d, w) => ((t, d), w) }.toMap
    assert(weights(model) == weights(loaded))
  }
}
