package graft.functions

import org.apache.spark.sql.DataFrame

/** Release helper for iterative localCheckpoint loops (BPE rounds, Lloyd
  * iterations, label propagation): each round checkpoints a new working
  * set, and WITHOUT unpersisting the previous round's blocks executor
  * storage grows linearly with the iteration count. Call
  * [[unpersist]] on the PREVIOUS frame only after the next checkpoint has
  * materialized — a localCheckpoint'd RDD's lineage is truncated, so its
  * blocks must never be dropped while still reachable from live plans.
  *
  * THIS HELPER IS THE ONLY RELEASE THAT WORKS (measured on the shipped
  * Spark 4.1.2, pinned by CheckpointsSpec): `Dataset.unpersist` routes
  * through the CacheManager, which only drops `persist()`/`cache()`
  * entries — on a localCheckpoint'd frame it is a silent NO-OP and the
  * RDD blocks stay resident until driver GC collects the Dataset.
  * Plain `.unpersist()` on a checkpointed frame is therefore always a
  * bug (r17 third review); route through here instead.
  */
private[graft] object Checkpoints {

  /** The checkpointed RDD behind a localCheckpoint'd DataFrame — ONLY
    * when the frame IS the checkpoint (optionally behind one Project,
    * e.g. after a `.drop`). A deep search would also match checkpoints
    * merely REFERENCED further down the plan (a filter over a shared
    * cached working set) and release blocks other frames still need —
    * exactly the bug this strictness prevents (a loop's `prev` on round
    * one is usually a projection over the shared input, not a checkpoint
    * of its own).
    */
  def rddOf(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.child match {
          case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
          case _ => None
        }
      case _ => None
    }

  def unpersist(df: DataFrame): Unit = rddOf(df).foreach(_.unpersist(false))
}
