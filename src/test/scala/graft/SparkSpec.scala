package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy). */
trait SparkSpec { self: AnyFunSuite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Reference fixtures (FIXTURES.md §2; /root/reference/vectorisers_test.go). */
  val trainSet: Seq[String] = Seq(
    "The quick brown fox jumped over the. Lazy dog",
    "the brown Cat sat on the mat",
    "the little dog laughed to see such fun",
    "laughing cow",
    "the cow ran around the dog",
    "spoon dish and plate")

  val testSet: Seq[String] = Seq(
    "hey diddle diddle",
    "the cat and the fiddle",
    "the cow jumped over the moon",
    "the quick brown fox jumped over the. Lazy dog",
    "The little dog laughed to see such fun",
    "The dish ran away with the spoon")

  lazy val stopWords: Seq[String] = {
    val in = getClass.getResourceAsStream("/stopwords_en.txt")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
  }
}
