package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pipeline combinator (SURVEY §2.6 R6;
 * `/root/reference/vectorisers.go:287-344`): a Vectoriser followed by N
 * Transformers, where Fit runs sequentially — each stage is fitted on
 * the PREVIOUS stage's transformed output (`:315-327`) — and Transform
 * replays the fitted chain on new data with the fitted state reused
 * (the reference's query path, `example_test.go:47-49`).
 *
 * Stages are column-contract functions over DataFrames: each consumes
 * an input column and appends its output column, so the chain is a
 * sequence of narrow/aggregated Spark transforms under ONE logical
 * plan per action — Catalyst sees through the whole composition
 * (predicate pushdown and column pruning cross stage boundaries; no
 * materialisation between stages unless a stage itself persists).
 */
trait Stage {
  /** Fit on `df`, returning the fitted stage (state captured). */
  def fit(df: DataFrame): Fitted
}

trait Fitted {
  def transform(df: DataFrame): DataFrame
}

final class FittedPipeline(val stages: Seq[Fitted]) extends Fitted {
  def transform(df: DataFrame): DataFrame =
    stages.foldLeft(df)((cur, s) => s.transform(cur))
}

final class Pipeline(stages: Stage*) extends Stage {
  def fit(df: DataFrame): FittedPipeline = {
    var cur = df
    val fitted = stages.map { s =>
      val f = s.fit(cur)
      cur = f.transform(cur)
      f
    }
    new FittedPipeline(fitted)
  }

  def fitTransform(df: DataFrame): (FittedPipeline, DataFrame) = {
    val f = fit(df)
    (f, f.transform(df))
  }
}

// ---- stage adapters over the graft operators ----

/** CountVectoriser analogue: tokens → sorted (term, cnt) entries with
  * string terms (`vectorisers.go:159-200`); vocabulary-free per-row
  * counting (OOV semantics live in the idf join downstream). */
final case class CountVectorise(tokensCol: String, outCol: String = "entries")
  extends Stage with Fitted {
  def fit(df: DataFrame): Fitted = this // stateless
  def transform(df: DataFrame): DataFrame =
    df.withColumn(outCol, graft.tfidf.TfIdf.tfEntries(col(tokensCol)))
}

/** TfidfTransformer analogue (`weightings.go:20-92`): fits the idf
  * table + doc count, transform reweights entries. */
final case class TfIdfStage(docIdCol: String, entriesCol: String,
                            outCol: String = "tfidf") extends Stage {
  def fit(df: DataFrame): Fitted = {
    val dfTable = df.select(explode(col(entriesCol)).as("e"))
      .select(col("e.term").as("term")).groupBy("term")
      .agg(count(lit(1)).as("df"))
    val n = df.count()
    val model = graft.tfidf.TfIdf.TfIdfModel(
      graft.tfidf.TfIdf.idf(dfTable, n), n)
    FittedTfIdf(model, docIdCol, entriesCol, outCol)
  }
}

final case class FittedTfIdf(model: graft.tfidf.TfIdf.TfIdfModel,
                             docIdCol: String, entriesCol: String,
                             outCol: String) extends Fitted {
  def transform(df: DataFrame): DataFrame = {
    val out = model.transform(df, docIdCol, entriesCol)
    if (outCol == "tfidf") out else out.withColumnRenamed("tfidf", outCol)
  }
}

/** Vocabulary encoder: maps string-term entries to dense long term ids
  * (fitted state = the vocabulary table; `vectorisers.go:159-181`).
  * Accepts BOTH upstream entry shapes: CountVectorise's (term, cnt)
  * and TfIdfStage's (term, weight) — the value field is resolved from
  * the entry schema at transform time, so either composition the
  * scaladocs describe analyses cleanly (the output is always
  * (term: long, weight: double)). Term permutation leaves SVD/PCA
  * FitTransform outputs invariant (row-permuting A permutes U only),
  * so the deterministic dense rank is used. OOV terms at transform
  * time are DROPPED, matching the reference's CountVectoriser
  * (`vectorisers.go:193-198`). */
final case class VocabEncode(docIdCol: String, entriesCol: String,
                             outCol: String = "encoded") extends Stage {
  def fit(df: DataFrame): Fitted = {
    val terms = df.select(explode(col(entriesCol)).as("e"))
      .select(col("e.term").as("term")).distinct()
    val vocab = graft.tfidf.Vocabulary.denseRank(terms, col("term"))
      .select(col("term"), col("id"))
    val d = vocab.count().toInt
    FittedVocab(vocab, d, docIdCol, entriesCol, outCol)
  }
}

final case class FittedVocab(vocab: DataFrame, d: Int, docIdCol: String,
                             entriesCol: String, outCol: String) extends Fitted {
  def transform(df: DataFrame): DataFrame = {
    // resolve the entry value field from the schema: CountVectorise
    // emits (term, cnt), the tf-idf path (term, weight) — reading a
    // hardcoded `weight` made the CountVectorise → VocabEncode
    // composition fit() fine and then fail analysis in transform()
    val entryFields = df.schema(entriesCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSet
    val valueField =
      if (entryFields.contains("weight")) "weight"
      else if (entryFields.contains("cnt")) "cnt"
      else throw new IllegalArgumentException(
        s"VocabEncode: entries column '$entriesCol' has fields " +
          s"${entryFields.mkString("(", ", ", ")")}; expected a 'weight' " +
          "or 'cnt' value field next to 'term'")
    // array_sort: collect_list order is shuffle/task-arrival order,
    // nondeterministic run to run — downstream per-row kernels fold
    // entries in array order (Double addition is not associative), so
    // an unsorted encoding breaks the library's bit-reproducibility
    // contract (same reason TfIdf.applyIdf sorts). Struct sort orders
    // by the first field: the (unique-per-doc) term id.
    val enc = df.select(col(docIdCol), explode(col(entriesCol)).as("e"))
      .join(vocab, col("e.term") === vocab("term")) // inner: OOV drops
      .groupBy(col(docIdCol))
      .agg(array_sort(collect_list(struct(col("id").cast("long").as("term"),
        col(s"e.$valueField").cast("double").as("weight")))).as(outCol))
    // a doc whose entries are empty or entirely OOV gets the EMPTY
    // encoding, not silently dropped (the reference keeps such docs as
    // zero vectors; an inner join here lost rows from the pipeline
    // output with no signal)
    val outType = enc.schema(outCol).dataType
    df.join(enc, Seq(docIdCol), "left")
      .withColumn(outCol, coalesce(col(outCol), array().cast(outType)))
  }
}

/** TruncatedSVD analogue (`dimreduction.go:34-106`). Input entries must
  * be (term: long, weight: double) with dense term ids; d ≤ 0 derives
  * the dimensionality from the data (max term id + 1). */
final case class SvdStage(docIdCol: String, entriesCol: String, k: Int,
                          d: Int = 0, outCol: String = "proj") extends Stage {
  def fit(df: DataFrame): Fitted = {
    val dd = if (d > 0) d else {
      // max() over zero entry rows returns null — getLong would NPE
      // opaquely; raise the explanatory error this codebase uses for
      // degenerate input everywhere else
      val row = df.select(explode(col(entriesCol)).as("e"))
        .agg(max(col("e.term"))).head()
      if (row.isNullAt(0)) throw new IllegalArgumentException(
        "SvdStage: cannot derive dimensionality (d <= 0) from a corpus " +
          "with no entries — every document's entry array is empty; " +
          "pass d explicitly or fix the upstream encoding")
      row.getLong(0).toInt + 1
    }
    val model = graft.dimred.TruncatedSVD.fit(df, docIdCol, entriesCol, dd, k)
    FittedProjection(model, docIdCol, entriesCol, outCol)
  }
}

/** Shared Fitted for any DimRedModel-backed projection (SVD, PCA). */
final case class FittedProjection(model: graft.dimred.DimRedModel,
                                  docIdCol: String, entriesCol: String,
                                  outCol: String) extends Fitted {
  def transform(df: DataFrame): DataFrame = {
    val proj = model.transform(df, docIdCol, entriesCol)
      .withColumnRenamed("proj", outCol)
    df.join(proj, docIdCol)
  }
}

/** RandomIndexing analogue (`randomprojection.go:183-341`). */
final case class RiStage(docIdCol: String, entriesCol: String,
                         cfg: graft.dimred.RandomIndexing.RiConfig,
                         outCol: String = "rivec") extends Stage {
  def fit(df: DataFrame): Fitted = {
    val model = graft.dimred.RandomIndexing.fit(df, docIdCol, entriesCol, cfg)
    new Fitted {
      def transform(d2: DataFrame): DataFrame =
        d2.join(model.transform(d2, docIdCol, entriesCol)
          .withColumnRenamed("proj", outCol), docIdCol)
    }
  }
}
