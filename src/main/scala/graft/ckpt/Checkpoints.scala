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
    * connected-components loop and the LSH Forest expansion.
    *
    * Never throws (NonFatal): every caller frees on catch/finally
    * paths too, and `RDD.unpersist` RPCs the block-manager master,
    * which itself throws while the context is tearing down — often
    * the very reason the guarded job failed. A throwing free there
    * would mask the root-cause exception with a cleanup error (and a
    * context that died takes its executor blocks with it anyway). */
  def free(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }
}
