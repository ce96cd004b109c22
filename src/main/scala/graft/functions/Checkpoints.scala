package graft.functions

import org.apache.spark.sql.DataFrame

/** Release helper for iterative localCheckpoint loops (BPE rounds, Lloyd
  * iterations, label propagation): each round checkpoints a new working
  * set, and WITHOUT unpersisting the previous round's blocks executor
  * storage grows linearly with the iteration count. Call
  * [[unpersist]] on the PREVIOUS frame only after the next checkpoint has
  * materialized — a localCheckpoint'd RDD's lineage is truncated, so its
  * blocks must never be dropped while still reachable from live plans.
  */
private[graft] object Checkpoints {

  /** The checkpointed RDD behind a localCheckpoint'd DataFrame, if any. */
  def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  def unpersist(df: DataFrame): Unit = rddOf(df).foreach(_.unpersist(false))
}
