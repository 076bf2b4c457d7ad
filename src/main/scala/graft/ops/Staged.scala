package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persist for intra-query staged intermediates (shingle sets,
  * signatures, dedup inputs): the operators persist narrow DataFrames
  * that several downstream joins reuse, and callers that run MANY
  * distinct pipelines in one session (Verify, a notebook, a service)
  * call [[release]] after consuming each result to bound executor
  * memory — persisted plans otherwise pin cache until session end
  * (CacheManager only dedups repeats of the identical plan, it never
  * expires distinct ones).
  *
  * At cluster scale the same seam is where staged parquet tables
  * replace in-memory persistence (see SCALE.md).
  */
object Staged {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Persist (MEMORY_AND_DISK: spill, don't OOM) and track. */
  def apply(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(p)
    p
  }

  /** Track a checkpointed RDD (e.g. a localCheckpoint'ed result leaf)
    * for the next [[release]]. Unlike persisted DataFrames these CANNOT
    * recompute after release (their lineage is truncated) — callers
    * must have consumed the result first, which is release()'s
    * documented contract anyway.
    */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    trackedRdds.add(rdd): Unit

  /** Unpersist everything staged since the last release. Safe to call
    * while results are still lazily defined — downstream plans simply
    * recompute (checkpointed leaves registered via [[trackRdd]]
    * excepted) — but intended to run after the consuming action.
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case _: Throwable => () }
      rdd = trackedRdds.poll()
    }
  }
}
