package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the literal bodies of [[GoldenFixtures]] — run with
  * `sbt "runMain graft.GoldenGen"` and paste the output. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mh = SparkEntry.queries("q_minhash_sig")(spark, "").collect()
      .sortBy(_.getString(0))
      .map(r => s"""    ("${r.getString(0)}", ${r.getLong(1)}L, """ +
        s"""${r.getLong(2)}L, "${r.getString(3)}")""")
    println("  val minhashSig: Seq[(String, Long, Long, String)] = Seq(\n" +
      mh.mkString(",\n") + ")")

    val sh = SparkEntry.queries("q_simhash")(spark, "").collect()
      .sortBy(_.getString(0))
      .map(r => s"""    ("${r.getString(0)}", ${r.getLong(1)}L)""")
    println("  val simhash: Seq[(String, Long)] = Seq(\n" +
      sh.mkString(",\n") + ")")

    val rp = SparkEntry.queries("q_random_proj")(spark, "").collect()
      .sortBy(_.getString(0))
      .map(r => s"""    ("${r.getString(0)}", ${r.getDouble(1)}, """ +
        s"${r.getDouble(2)}, ${r.getDouble(3)}, ${r.getDouble(4)})")
    println("  val randomProj: Seq[(String, Double, Double, Double, Double)] = Seq(\n" +
      rp.mkString(",\n") + ")")

    def longDoubles2(q: String, name: String): Unit = {
      val rows = SparkEntry.queries(q)(spark, "").collect()
        .sortBy(_.getLong(0))
        .map(r => s"    (${r.getLong(0)}L, ${r.getDouble(1)}, ${r.getDouble(2)})")
      println(s"  val $name: Seq[(Long, Double, Double)] = Seq(\n" +
        rows.mkString(",\n") + ")")
    }
    def strDoubles4(q: String, name: String): Unit = {
      val rows = SparkEntry.queries(q)(spark, "").collect()
        .sortBy(_.getString(0))
        .map(r => s"""    ("${r.getString(0)}", ${r.getDouble(1)}, """ +
          s"${r.getDouble(2)}, ${r.getDouble(3)}, ${r.getDouble(4)})")
      println(s"  val $name: Seq[(String, Double, Double, Double, Double)] = Seq(\n" +
        rows.mkString(",\n") + ")")
    }
    longDoubles2("q_svd", "svd")
    longDoubles2("q_pca", "pca")
    strDoubles4("q_rri", "rri")
    strDoubles4("q_sparse_proj", "sparseProj")
    longDoubles2("q_lda", "lda")
    spark.stop()
  }
}
