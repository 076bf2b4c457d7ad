package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: assign documents to
  * fixed-token-budget packs by contiguous fill — running token count in
  * a deterministic document order, new pack each time the budget line
  * is crossed. The assignment is a pure function of (shard, order,
  * token counts), so it is reproducible across runs and engines.
  *
  * 100 TB note: packing is inherently sequential WITHIN a pack stream,
  * so the operator packs per shard (`shardCol`) — each shard's window
  * sorts independently in parallel. A single global stream (shardCol =
  * constant) funnels through one task: correct, but only for small
  * corpora. Shard by language/source/date in production.
  */
object Packing {

  /** Adds (n_tok, pack_id) to each row: pack_id counts packs within the
    * shard; a document lands in the pack that was open when it arrived
    * (packs may overflow the budget by at most one document — the
    * greedy contiguous-fill discipline; budget-exceeding docs get a
    * pack of their own).
    */
  def packBy(df: DataFrame, shardCol: String, orderCol: String,
      tokenCountCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokenCountCol)
      .withColumn("pack_id",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / budget).cast("long"))
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
