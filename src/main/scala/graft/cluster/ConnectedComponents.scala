package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Iterative DataFrame connected components (SURVEY §2.4 H9; north-rule
 * addition — Kiveris et al. '14 family, min-label propagation variant).
 *
 * Duplicate-pair edges → cluster labels: every node ends with the
 * minimum docId reachable from it. Dedup clusters have tiny diameters
 * (near-dups of a page are near-dups of each other), so label
 * propagation converges in a handful of rounds; `maxIter` bounds
 * pathological chains (which chain-paired hot buckets can produce) and
 * each round is `localCheckpoint`ed to truncate lineage — without this,
 * iteration k replays all k−1 predecessor joins and the plan grows
 * exponentially.
 *
 * Cost model at scale: per round one shuffle (groupBy node) over the
 * edge list + one join; edges ≈ verified duplicate pairs ≪ corpus size.
 */
object ConnectedComponents {

  /**
   * @param edges DataFrame with two long columns `a`, `b` (undirected).
   * @return (id, component) for every node appearing in edges;
   *         component = min reachable id.
   */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val sym = edges.select($"a".as("src"), $"b".as("dst"))
      .union(edges.select($"b".as("src"), $"a".as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("comp", $"id")
      .localCheckpoint()

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbour labels: for each dst, the comp of each src neighbour
      val nbr = sym.join(labels, sym("src") === labels("id"))
        .select($"dst".as("id"), $"comp")
      val next = nbr.union(labels.select($"id", $"comp"))
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("id"))
        .filter($"comp" < $"old").limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
