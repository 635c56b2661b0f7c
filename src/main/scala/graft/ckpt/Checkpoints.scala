package graft.ckpt

import org.apache.spark.sql.DataFrame

/** Lifecycle helpers for `localCheckpoint`-based iteration. */
object Checkpoints {
  /** Free a localCheckpoint's persisted blocks NOW. `Dataset.unpersist`
    * is a NO-OP for checkpointed frames: localCheckpoint persists the
    * internal RDD directly (LocalRDDCheckpointData), not through the
    * cache manager that unpersist talks to — so a superseded iteration
    * snapshot would otherwise stay pinned in executor storage until the
    * driver happens to GC the RDD reference. Shared by the
    * connected-components loop and the LSH Forest expansion. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
