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
    * for [[releaseCheckpoints]]. Unlike persisted DataFrames these
    * CANNOT recompute after release (their lineage is truncated), so
    * they live in their own queue: a plain [[release]] from unrelated
    * code between an operator returning its checkpointed result and
    * the caller consuming it must not be able to destroy the result.
    */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    trackedRdds.add(rdd): Unit

  /** `localCheckpoint` + [[trackRdd]] the resulting leaf blocks in one
    * step — for per-epoch driver samples inside monitors: a
    * long-running stream that checkpoints a small frame every
    * micro-batch without tracking it accumulates one unreleasable
    * block set per epoch. Caller contract is [[releaseCheckpoints]]'s:
    * release only after every result built on the frame is consumed
    * (for a monitor, after the epoch's snapshot write).
    */
  def checkpointed(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    c.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(trackRdd)
    c
  }

  /** Unpersist every DataFrame staged since the last release. Safe to
    * call while results are still lazily defined — downstream plans
    * simply recompute — but intended to run after the consuming
    * action. Checkpointed result leaves are NOT touched; callers that
    * own the results call [[releaseCheckpoints]] once done with them.
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = tracked.poll()
    }
  }

  /** Unpersist tracked checkpoint leaves ([[trackRdd]]). IRREVERSIBLE:
    * truncated lineage cannot recompute — only call after every
    * returned result built on them has been fully consumed.
    */
  def releaseCheckpoints(): Unit = {
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case _: Throwable => () }
      rdd = trackedRdds.poll()
    }
  }

  /** [[release]] + [[releaseCheckpoints]] for sweep drivers (Verify,
    * Bench, rehearsals) that fully consume each pipeline's result
    * before moving to the next.
    */
  def releaseAll(): Unit = { release(); releaseCheckpoints() }
}
