package graft.tfidf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Vocabulary fit (SURVEY §2.3 A1) — reference semantics: term → dense
 * int id in **first-appearance order** over the corpus scan
 * (`/root/reference/vectorisers.go:159-181`): doc order first, token
 * position within doc second; a refit discards the old vocabulary.
 *
 * This is the small-scale path; at web scale the stateless hashing
 * trick (P5, [[graft.hash.Murmur3Go]]) replaces it exactly as the
 * reference intends (`vectorisers.go:215-230`) — a 10^12-doc global
 * ordered vocabulary would serialise on the final rank.
 *
 * @param docs    corpus with an ordering column and a tokens column
 * @param docOrd  column giving the corpus scan order of each doc
 */
object Vocabulary {
  def fit(docs: DataFrame, docOrd: Column, tokens: Column): DataFrame = {
    val first = docs
      .select(docOrd.as("d"), posexplode(tokens).as(Seq("p", "term")))
      .groupBy("term")
      .agg(min(struct(col("d"), col("p"))).as("first"))
    // global ordered rank: single-partition window — correct but serial,
    // acceptable for the bounded vocabularies this path is meant for
    first.withColumn("id",
        row_number().over(Window.orderBy(col("first"))) - 1)
      .select(col("term"), col("id"))
  }
}
