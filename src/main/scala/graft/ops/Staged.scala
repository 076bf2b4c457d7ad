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
  * Concurrent pipelines (two streaming monitors, a monitor plus an
  * incremental curation run) must NOT drain each other's handles: a
  * global [[releaseCheckpoints]] from one stream's foreachBatch can
  * destroy another stream's in-flight checkpointed query sample
  * between creation and consumption (truncated lineage cannot
  * recompute — the epoch fails with missing-checkpoint-block errors).
  * [[scoped]] is the discipline for such callers: everything staged
  * or checkpointed on the calling thread inside the body is released
  * when the body completes, and ONLY that — the global queues and any
  * other thread's scopes are untouched.
  *
  * At cluster scale the same seam is where staged parquet tables
  * replace in-memory persistence (see SCALE.md).
  */
object Staged {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** The active scope for this thread, when inside [[scoped]]: frames
    * and checkpoint leaves registered here are owned by the scope and
    * released at its end, invisible to the global release calls. All
    * registration happens driver-side on the constructing thread
    * (foreachBatch bodies, query builders), so thread-locality is
    * exactly pipeline-locality for the monitor callers this exists for.
    */
  private val localScope = new ThreadLocal[
    (java.util.ArrayDeque[DataFrame],
     java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]])]()

  /** Persist (MEMORY_AND_DISK: spill, don't OOM) and track — in the
    * calling thread's [[scoped]] body if one is active, else globally.
    */
  def apply(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val scope = localScope.get()
    if (scope != null) scope._1.add(p) else tracked.add(p)
    p
  }

  /** Track a checkpointed RDD (e.g. a localCheckpoint'ed result leaf)
    * for [[releaseCheckpoints]] (or the enclosing [[scoped]] body).
    * Unlike persisted DataFrames these CANNOT recompute after release
    * (their lineage is truncated), so they live in their own queue: a
    * plain [[release]] from unrelated code between an operator
    * returning its checkpointed result and the caller consuming it
    * must not be able to destroy the result.
    */
  def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    val scope = localScope.get()
    if (scope != null) scope._2.add(rdd): Unit else trackedRdds.add(rdd): Unit
  }

  /** `localCheckpoint` + [[trackRdd]] the resulting leaf blocks in one
    * step — for per-epoch driver samples inside monitors: a
    * long-running stream that checkpoints a small frame every
    * micro-batch without tracking it accumulates one unreleasable
    * block set per epoch. Callers consume the frame before their
    * [[scoped]] body ends (or before calling [[releaseCheckpoints]]).
    */
  def checkpointed(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    c.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(trackRdd)
    c
  }

  /** Run `body` in a private release scope: every frame [[apply]]'d and
    * every checkpoint leaf [[trackRdd]]'d from THIS thread inside the
    * body is unpersisted when the body completes (normally or not),
    * and nothing else is — the seam that lets many concurrent
    * pipelines (streaming monitors' foreachBatch epochs, an
    * incremental curation run) each bound their own footprint without
    * being able to destroy another pipeline's in-flight checkpointed
    * results. Scopes nest: an inner scope releases only its own.
    */
  def scoped[T](body: => T): T = {
    val prev = localScope.get()
    val dfs = new java.util.ArrayDeque[DataFrame]()
    val rdds = new java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]]()
    localScope.set((dfs, rdds))
    try body
    finally {
      if (prev != null) localScope.set(prev) else localScope.remove()
      var df = dfs.poll()
      while (df != null) {
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () } // session may already be stopped
        df = dfs.poll()
      }
      var rdd = rdds.poll()
      while (rdd != null) {
        try rdd.unpersist(blocking = false)
        catch { case _: Throwable => () }
        rdd = rdds.poll()
      }
    }
  }

  /** Unpersist every GLOBALLY tracked DataFrame staged since the last
    * release (scoped frames are invisible here — their scope owns
    * them). Safe to call while results are still lazily defined —
    * downstream plans simply recompute — but intended to run after the
    * consuming action. Checkpointed result leaves are NOT touched;
    * callers that own the results call [[releaseCheckpoints]] once
    * done with them.
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = tracked.poll()
    }
  }

  /** Unpersist GLOBALLY tracked checkpoint leaves ([[trackRdd]] outside
    * any scope). IRREVERSIBLE: truncated lineage cannot recompute —
    * only call from drivers that own every in-flight pipeline in the
    * session (Verify, Bench, rehearsal mains); concurrent pipelines
    * use [[scoped]] instead.
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
    * before moving to the next and own the whole session.
    */
  def releaseAll(): Unit = { release(); releaseCheckpoints() }
}
