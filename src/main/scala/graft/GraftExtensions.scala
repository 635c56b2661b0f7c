package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.hash._
import graft.text.GoLower

/**
 * SQL surface for the custom expressions: register once and every
 * kernel is callable from `spark.sql` / `expr(...)`:
 *
 * {{{
 * spark.sql("SELECT golower(text), minhash128(hashed_shingles(split(text,' '),5)) FROM pages")
 * }}}
 *
 * Usable either programmatically (`GraftFunctions.register(spark)`) or
 * via `--conf spark.sql.extensions=graft.GraftExtensions`.
 */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "golower" -> ((es: Seq[Expression]) => GoLower(es.head)),
    "murmur3go" -> ((es: Seq[Expression]) => Murmur3Go(es.head)),
    "minhash128" -> ((es: Seq[Expression]) => MinHashK(es.head, 128)),
    "minhashk" -> ((es: Seq[Expression]) =>
      MinHashK(es.head, intArg(es(1), "minhashk"))),
    "simhash64" -> ((es: Seq[Expression]) => SimHash64(es.head)),
    "hashed_tf" -> ((es: Seq[Expression]) =>
      HashedTf(es.head, intArg(es(1), "hashed_tf"))),
    "hashed_shingles" -> ((es: Seq[Expression]) =>
      HashedShingles(es.head, intArg(es(1), "hashed_shingles"))),
    "winnow" -> ((es: Seq[Expression]) =>
      Winnow(es.head, intArg(es(1), "winnow"), intArg(es(2), "winnow"))),
    "random_project" -> ((es: Seq[Expression]) =>
      RandomProject(es.head, intArg(es(1), "random_project"))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => builder(es)))
    }
}
