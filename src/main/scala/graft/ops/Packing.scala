package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to
  * fixed-token-budget packs in a deterministic document order. The
  * assignment is a pure function of (shard, order, token counts), so
  * it is reproducible across runs and engines.
  *
  * Two disciplines:
  *  - [[packBy]] — OFFSET-STRIDE packing: pack k owns the token-offset
  *    interval [k·budget, (k+1)·budget); a document belongs to the pack
  *    its start offset falls in. One window computation, fully
  *    declarative (= oracle-portable SQL); a document overflowing the
  *    budget line consumes capacity from the next stride, so pack ids
  *    may skip and packs after an overflow are slightly under-filled.
  *    This is the variant to use at scale.
  *  - [[packByGreedy]] — TRUE greedy fill: the accumulator resets at
  *    each pack boundary, so every pack (except oversized singletons)
  *    is filled to its own budget. The reset makes it a stateful
  *    recurrence no window function expresses — it drops to the typed
  *    API (`flatMapGroups`, sequential per shard), the documented
  *    escape hatch (brief: mapPartitions-style only as a last resort).
  *
  * 100 TB note: packing is inherently sequential WITHIN a pack stream,
  * so both variants pack per shard (`shardCol`) — shards proceed in
  * parallel. A single global stream (shardCol = constant) funnels
  * through one task: correct, but only for small corpora. Shard by
  * language/source/date in production.
  */
object Packing {

  /** Adds (n_tok, pack_id) by offset-stride packing (see object doc). */
  def packBy(df: DataFrame, shardCol: String, orderCol: String,
      tokenCountCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokenCountCol)
      .withColumn("pack_id",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / budget).cast("long"))
  }

  /** Greedy contiguous fill via the typed API: rows of
    * (shard, order, n_tok) in, (shard, order, n_tok, pack_id) out,
    * consecutive pack ids, accumulator reset per pack.
    */
  def packByGreedy(df: DataFrame, shardCol: String, orderCol: String,
      tokenCountCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import df.sparkSession.implicits._
    df.select(col(shardCol).cast("string").as("shard"),
        col(orderCol).cast("long").as("ord"),
        tokenCountCol.cast("long").as("n_tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        // groupByKey gives no intra-group order: sort the shard's rows
        // (a shard must fit one task — the sequential unit by design)
        var packId = 0L
        var filled = 0L
        rows.toSeq.sortBy(_._2).map { case (_, ord, n) =>
          if (filled > 0 && filled + n > budget) { packId += 1; filled = 0L }
          filled += n
          (shard, ord, n, packId)
        }
      }
      .toDF("shard", "ord", "n_tok", "pack_id")
      .withColumnsRenamed(Map("shard" -> shardCol, "ord" -> orderCol))
  }

  /** Per-pack statistics: document count, token total, budget
    * utilization (exact ratio of longs — deterministic).
    */
  def packStats(packed: DataFrame, shardCol: String, budget: Int): DataFrame =
    packed.groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("utilization",
        round(col("n_tokens").cast("double") / budget, 6))
}
