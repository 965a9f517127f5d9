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

  /** Collect a SMALL (bounded-by-a-parameter, e.g. k centers or m×ncodes
    * codebook entries) result to the driver and release the checkpointed
    * frames that produced it, returning a local single-partition frame
    * with identical rows. This is the release contract for loops whose
    * OUTPUT is tiny but whose construction pinned per-round checkpoints:
    * without it the 1-row round frames accumulate executor storage across
    * repeated invocations in one session (e.g. the bench's cold+warm
    * double run). Never call this on a data-sized frame. */
  def drain(out: DataFrame, owned: Seq[DataFrame]): DataFrame = {
    val spark = out.sparkSession
    val schema = out.schema
    val rows = java.util.Arrays.asList(out.collect(): _*)
    owned.foreach(unpersist)
    spark.createDataFrame(rows, schema)
  }
}
