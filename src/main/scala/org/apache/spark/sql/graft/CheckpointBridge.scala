package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-manager blocks behind an eager `localCheckpoint`ed
  * DataFrame.
  *
  * `localCheckpoint(true)` truncates lineage into a [[LogicalRDD]] whose
  * RDD is persisted (MEMORY_AND_DISK) — and `DataFrame.unpersist` does
  * NOT free it (that API only touches cache-manager entries), so every
  * checkpoint leaks until the session dies. Iterative operators (the
  * dedup frontier loop, min-label propagation) supersede a checkpoint
  * each round; without an explicit release a deep run pins O(rounds)
  * copies of its state in the block manager — the accumulation class
  * measured in the bench before between-entry hygiene landed (driver heap
  * 2.0 -> 7.8 GB across rounds).
  *
  * Lives in the sql package tree because [[LogicalRDD]] is
  * `private[sql]`. Releasing is only safe once nothing will read the
  * checkpoint again: a truncated lineage CANNOT be recomputed, so any
  * later action over the released frame fails. Callers release only
  * frames superseded by a newer checkpoint.
  */
object CheckpointBridge {
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => () // not a checkpointed frame: nothing to free
  }
}
