package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for iterative fixpoint loops (Dedup.clusters, Ivf.fit):
  * each round's eager `localCheckpoint(true)` pins a fresh copy of the
  * iteration state on the executors, and without an explicit release a
  * many-round run holds rounds × state-size in block storage — harmless at
  * test scale, a real leak on a 100 TB dedup (the round-4 verdict's #2).
  */
object Checkpoints {

  /** Release the executor blocks behind `df`'s eager localCheckpoint once a
    * newer round supersedes it. Blocking, so storage is bounded the moment
    * the call returns (and specs can assert `getPersistentRDDs` counts
    * deterministically).
    *
    * Deliberately matches ONLY a frame whose plan root IS the checkpoint
    * (what `localCheckpoint(true)` returns) — walking the whole plan for
    * LogicalRDD leaves would also release checkpoints the CALLER still
    * owns (e.g. a caller-checkpointed input feeding round 0's derived
    * frame), and a truncated-lineage checkpoint cannot be recomputed.
    * No-op for any other frame. */
  def unpersist(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = true)
    case _              => ()
  }
}
