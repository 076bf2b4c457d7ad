package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic balanced sharding for training-data export — the last
  * step of a curation pipeline: fix a shard count, assign every
  * document to a shard by a content-stable hash, and write each shard
  * as its own sorted file set so downstream loaders can stream shards
  * independently and reproducibly.
  *
  * Why hash assignment and not round-robin / monotonic ids: the shard
  * of a document must not depend on partitioning, task scheduling, or
  * row order — a re-run over the same corpus must produce bit-identical
  * shards (the property the spec pins). md5 is the house portable hash
  * (same bytes in Spark and the DuckDB oracle — the x18 sampling gate
  * idiom); uniformity gives balance within ~√(n/shards) fluctuation.
  *
  * 100 TB shape: assignment is a row-local projection (no shuffle);
  * the write shuffles once on the shard key and sorts within shards.
  * The in-shard position window partitions by shard — one partition
  * per OUTPUT shard, which is the irreducible unit of a sorted shard
  * export (size it with nShards: 100 TB / 4096 shards ≈ 25 GB per
  * sort, a routine spill-sort). Writers that don't need explicit
  * positions skip the window entirely ([[writeShards]]).
  */
object Sharding {

  /** Content-stable shard id in [0, nShards): the first 8 hex chars of
    * md5(id) mod nShards. Uses only hash bits (never ids directly), so
    * sequential ids don't stripe; portable to the SQL oracle as
    * `('0x' || substr(md5(id), 1, 8))::BIGINT % nShards`.
    */
  def shardId(idCol: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    pmod(conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
  }

  /** (row, shard, pos): every input row with its shard and its dense
    * 1-based position in the shard's id order — the fully-specified,
    * verifiable export layout (two rows are in the same file iff same
    * shard; pos is the exact within-file order).
    */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardId(col(idCol), nShards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col(idCol))))

  /** Write the corpus as nShards sorted parquet shard directories
    * (`$outDir/shard=<s>/`). One range shuffle on the shard key — range
    * (not hash) partitioning, because hash(shard) % nShards collides
    * shard values onto shared tasks and leaves others empty, turning
    * the terminal write into a straggler; range boundaries over the
    * evenly-populated shard ids give ~one shard per task. Deterministic
    * in what matters to a loader: shard MEMBERSHIP and in-file row
    * order are pure functions of the corpus (part-file NAMES are not —
    * they embed a per-job UUID).
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
      outDir: String): Unit =
    df.withColumn("shard", shardId(col(idCol), nShards))
      .repartitionByRange(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
