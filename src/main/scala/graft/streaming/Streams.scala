package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.load.GraftSink

/** Structured Streaming surface: the reference's rate-limited polling
  * loop (README.md:13) is micro-batch-shaped, so every batch transform
  * in `graft.etl` applies unchanged to a streaming DataFrame — these
  * helpers add the stream-only pieces: watermarks, event-time windows,
  * stateful processing, and sink wiring.
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded by
  * (watermark horizon × key cardinality); dropDuplicates carries its
  * own watermark-scoped state; `flatMapGroupsWithState` state is
  * per-key and explicitly timed out.
  */
object Streams {

  /** Tumbling event-time counts with late-data handling. Works on both
    * batch and streaming inputs (same plan, different incrementalization).
    */
  def tumblingStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Session windows (gap-based) per user. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup by key, state bounded by the watermark. */
  def dedupeStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserRunning(userId: Long, nEvents: Long, totalValue: Double)

  /** Custom keyed state: running per-user totals emitted on every
    * update — the `flatMapGroupsWithState` pattern for logic windows
    * can't express. Pass `idleTimeout = Some("1 hour")` in production to
    * evict idle keys (processing-time timeouts make micro-batches fire
    * continuously, so tests run with no timeout).
    */
  def runningUserTotals(spark: SparkSession, events: Dataset[EventRow],
      idleTimeout: Option[String] = None): Dataset[UserRunning] = {
    import spark.implicits._
    val conf = idleTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](OutputMode.Append, conf) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(last)
          } else {
            val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
            val batch = rows.toSeq
            val next = UserRunning(userId,
              prev.nEvents + batch.size,
              prev.totalValue + batch.map(_.value).sum)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }

  /** Stream-stream inner join with event-time bounds: match rows of two
    * streams on a key within a ± time window. Both sides carry
    * watermarks so the join state is bounded — without the time-range
    * condition the state would grow forever.
    */
  def streamStreamJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String = "ts", rightTs: String = "ts",
      within: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"))
  }

  /** Streaming NEAR-dup suppression: drop events whose content
    * fingerprint (SimHash of the text column) repeats within the
    * watermark horizon — the streaming face of the dedup family.
    * Exact-duplicate and boilerplate-variant suppression at ingest
    * time; state is bounded by (watermark × distinct fingerprints).
    * SimHash collisions conflate only near-identical token streams —
    * precisely the rows an ingest near-dup filter wants to drop.
    */
  def dedupeNearStream(df: DataFrame, textCol: String,
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__fp", graft.ops.Dedup.simHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Streaming as-of join: for every left event, the payload of the
    * LATEST right row with `rTime <= lTime` within `lookback` on the
    * same key — the batch as-of with tolerance
    * ([[graft.ops.AsOfJoin.sortMerge]] t06 semantics; ties on time
    * break by greatest payload, matching the batch operator).
    *
    * A FINITE lookback is mandatory in a stream: it is exactly what
    * bounds the join state (batch's unbounded lookback would mean
    * remembering every right row forever). Formulation: two chained
    * stateful operators — a time-bounded stream-stream LEFT OUTER join
    * (unmatched left rows emit once the watermark closes them), then a
    * per-left-row max_by aggregation selecting the latest matching
    * right row. Append mode is legal because the grouping keys include
    * the watermarked left event time.
    *
    * Contract: left rows must be ROW-UNIQUE (carry an event id) — the
    * per-left-row selection groups by all left columns, so fully
    * identical duplicate left rows collapse into one output row,
    * unlike the batch operator which preserves multiplicity.
    */
  def asOfStream(left: DataFrame, right: DataFrame, key: String,
      timeCol: String, payloadCol: String,
      lookback: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark).alias("l")
    val r = right.withWatermark(timeCol, watermark).alias("r")
    val lTs = col(s"l.$timeCol")
    val rTs = col(s"r.$timeCol")
    val joined = l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        rTs <= lTs && rTs >= lTs - expr(s"INTERVAL $lookback"),
      "left_outer")
    val leftCols = left.columns.toSeq.map(c => col(s"l.$c"))
    // max_by ignores rows whose ordering expression is null, so the
    // left-outer null row (and nothing else) never wins; ordering by
    // (time, payload) reproduces the batch tie-break
    joined
      .groupBy(leftCols: _*)
      .agg(max_by(col(s"r.$payloadCol"),
        when(rTs.isNotNull, struct(rTs, col(s"r.$payloadCol"))))
        .as(s"asof_$payloadCol"))
  }

  /** L1 streaming load: route every micro-batch through a batch
    * [[GraftSink]] — upsert semantics and consistency checks carry over
    * unchanged (exactly-once per sink idempotence).
    */
  /** Continuous-ingest passage dedup against an EPOCH-PARTITIONED
    * passage index. Each micro-batch e:
    *   1. cleans against the index partitions committed strictly
    *      before e ([[graft.ops.Dedup.incrementalPassageDedup]] — one
    *      anti-join; earlier corpus text is never re-chunked),
    *   2. overwrites its own output dir `outPath/epoch=<e>`,
    *   3. overwrites its own index partition `indexPath/epoch=<e>`
    *      with the batch's new-to-index distinct passages (chunked
    *      from the ORIGINAL batch text — a rebuilt text would re-chunk
    *      on shifted window boundaries).
    *
    * Exactly-once without a transactional sink: every step is a pure
    * function of (batch contents, index partitions < e), and both
    * writes target only epoch-e locations with overwrite — so a replay
    * after a crash at ANY point rewrites identical bytes. A flat
    * append-mode index would break this: a crash after the index
    * append would make the replayed batch dedup against its own
    * passages and overwrite its output with an empty epoch.
    */
  def passageDedupStream(docs: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, idCol: String, textCol: String,
      window: Int = 8): StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val idx = indexBefore(batch.sparkSession, indexPath, epoch)
        graft.ops.Dedup
          .incrementalPassageDedup(batch, idx, idCol, textCol, window)
          .write.mode("overwrite").parquet(s"$outPath/epoch=$epoch")
        graft.ops.Dedup.passages(batch, idCol, textCol, window)
          .select(col("chunk_text")).distinct()
          .join(idx, Seq("chunk_text"), "left_anti")
          .write.mode("overwrite").parquet(s"$indexPath/epoch=$epoch")
        graft.ops.Staged.releaseAll()
      }
      .start()

  /** Offline compaction for the epoch-partitioned passage index:
    * merge every partition with epoch ≤ `upToEpoch` into the single
    * partition `epoch=<upToEpoch>`. Semantics-preserving because the
    * merged dir keeps the HIGHEST label it absorbed, so [[indexBefore]]
    * for any later epoch sees exactly the same passage set — and the
    * streaming runtime only ever replays the last uncommitted epoch,
    * never one the checkpoint already passed, so per-epoch attribution
    * below the compaction point is dead state. Run it with the stream
    * DOWN (or past `upToEpoch`+1) when small per-batch partitions
    * accumulate (the classic streaming small-files debt).
    *
    * Crash-RECOVERABLE, x25's versioned-publish spirit: the merged set
    * is first written to a tmp dir whose parquet `_SUCCESS` is the
    * commit point. A re-run after a crash at any step completes the
    * swap — before the commit point the victims are untouched and the
    * merge recomputes; after it, the full merged set lives in tmp and
    * the re-run only finishes deleting victims and renaming. (The tmp
    * dir does not match the `epoch=` prefix, so a mid-swap index is
    * only ever read by [[indexBefore]] during an offline window.)
    */
  def compactPassageIndex(spark: SparkSession, indexPath: String,
      upToEpoch: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    def victims = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch=") &&
        s.getPath.getName.stripPrefix("epoch=").toLong <= upToEpoch)
      .map(_.getPath)
    val tmp = new org.apache.hadoop.fs.Path(root, s"__compact_tmp_$upToEpoch")
    val committed = fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
    if (!committed) {
      val v = victims
      if (v.size < 2) return // nothing to merge, no recovery pending
      spark.read.parquet(v.map(_.toString): _*)
        .select(col("chunk_text")).distinct()
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    }
    victims.foreach(p => fs.delete(p, true))
    fs.rename(tmp, new org.apache.hadoop.fs.Path(root, s"epoch=$upToEpoch")): Unit
  }

  /** The union of index partitions committed before `epoch` (empty
    * 1-column frame when none exist — the first batch's view). Listed
    * through the Hadoop FileSystem API, not java.io.File: at cluster
    * scale the index lives on HDFS/S3, where a local listing would
    * silently see nothing and every batch would dedup against an
    * empty index.
    */
  private[streaming] def indexBefore(spark: SparkSession,
      indexPath: String, epoch: Long): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch=") &&
          s.getPath.getName.stripPrefix("epoch=").toLong < epoch)
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("chunk_text",
            org.apache.spark.sql.types.StringType))))
    else spark.read.parquet(dirs: _*).select(col("chunk_text"))
  }

  def sinkStream(df: DataFrame, sink: GraftSink, checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.write(batch): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
}

/** Typed view of the events stream (see FIXTURES.md §B). */
final case class EventRow(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
