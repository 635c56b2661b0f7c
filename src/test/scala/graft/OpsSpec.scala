package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.IncrementalIndex
import graft.tfidf.Vocabulary

class OpsSpec extends AnyFunSuite with SparkSpec {

  test("vocabulary fit: first-appearance order (vectorisers.go:159-181)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick fox"),
      (1L, "the lazy fox ran")).toDF("doc_id", "text")
    val vocab = Vocabulary.fit(docs, $"doc_id", split($"text", " "))
      .as[(String, Int)].collect().toMap
    assert(vocab === Map("the" -> 0, "quick" -> 1, "fox" -> 2,
      "lazy" -> 3, "ran" -> 4))
  }

  test("SQL surface: kernels callable from spark.sql after registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("The quick brown FOX", 1)).toDF("text", "x").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT golower(text) AS low, murmur3go('hello') AS m,
        |  size(minhash128(hashed_shingles(split(golower(text), ' '), 2))) AS k,
        |  size(hashed_tf(split(golower(text), ' '), 260000)) AS nnz
        |FROM t""".stripMargin).head()
    assert(row.getString(0) === "the quick brown fox")
    assert(row.getLong(1) === 613153351L)
    assert(row.getInt(2) === 128)
    assert(row.getInt(3) === 4)
  }

  test("incremental index: put / search / remove (lsh.go:75-80, index.go:119-136)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val idx = new IncrementalIndex(spark, tmp)
    // distinct tokens throughout — a repeated phrase would collapse to
    // ~10 distinct shingles and a 1-word edit would crater Jaccard
    // letter-only words: the tokenizer keeps [\p{L}]+ runs, so a digit
    // suffix would collapse every token to the same word
    def w(prefix: String, i: Int): String =
      prefix + ('a' + i % 26).toChar.toString * (1 + i / 26)
    val t1 = (1 to 60).map(w("alpha", _)).mkString(" ")
    val t2 = (1 to 60).map(w("omega", _)).mkString(" ")
    idx.put(Seq(("u1", t1), ("u2", t2)).toDF("url", "text"))
    assert(idx.all().count() === 2)

    // near-dup of u1 must match; unrelated text must not
    // delimited replace: "alphah" is a prefix of "alphahh"/"alphahhh",
    // a bare replace would edit three tokens and sink Jaccard below tau
    val t1near = t1.replace(" " + w("alpha", 7) + " ", " changed ")
    val matches = idx.search(
        Seq(("q1", t1near), ("q2", "totally different words here now " * 5))
          .toDF("url", "text"))
      .as[(String, String, Double)].collect()
    assert(matches.map(m => (m._1, m._2)).toSet === Set(("q1", "u1")))

    // remove u1 -> no longer findable (index_test.go:98-129 semantics)
    idx.remove(Seq("u1").toDF("url"))
    assert(idx.all().count() === 1)
    assert(idx.search(Seq(("q1", t1near)).toDF("url", "text")).count() === 0)
  }

  test("event-time tumbling windows with watermark (streaming surface)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = graft.streaming.EventWindows.tumbling(
      stream.toDF().toDF("ts", "event_type", "value"),
      "1 hour", watermark = Some("2 hours"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 $h%02d:$m%02d:00")
    stream.addData((ts(10, 5), "click", 1.0), (ts(10, 55), "click", 3.0),
      (ts(11, 10), "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .as[(java.sql.Timestamp, String, Long, Double, Double)].collect().toSet
    assert(rows === Set(
      (ts(10, 0), "click", 2L, 1.0, 3.0),
      (ts(11, 0), "view", 1L, 2.0, 2.0)))
  }

  test("streaming dedup: micro-batches accrete and surface new dups") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val found = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = graft.streaming.StreamingDedup.start(
      spark, stream.toDF().toDF("url", "text"), tmp,
      onMatches = df => found ++=
        df.select("query_url", "match_url").as[(String, String)].collect())
    def w(i: Int): String = "word" + ('a' + i % 26).toChar.toString * (1 + i / 26)
    val base = (1 to 60).map(w).mkString(" ")
    stream.addData(("s1", base))
    q.processAllAvailable()
    stream.addData(("s2", base.replace(" " + w(9) + " ", " edited ")))
    q.processAllAvailable()
    q.stop()
    assert(found.toSet === Set(("s2", "s1")))
  }
}
