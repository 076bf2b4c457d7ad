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
    * (`$outDir/shard=<s>/`). One shuffle with an EXACT one-shard-per-
    * task mapping: plain hash(shard) % nShards collides shard values
    * onto shared tasks and leaves others empty, and repartitionByRange
    * SAMPLES its boundaries — with exactly nShards distinct keys the
    * sample can merge adjacent shards onto one task and re-create the
    * straggler. Instead each shard id is mapped through a probe value
    * precomputed (driver-side, O(nShards) work) to murmur3-hash onto
    * exactly its own partition — deterministic, no sampling.
    * Deterministic in what matters to a loader: shard MEMBERSHIP and
    * in-file row order are pure functions of the corpus (part-file
    * NAMES are not — they embed a per-job UUID).
    *
    * `orderCol` overrides the WITHIN-shard row order (membership stays
    * the id hash): pass a curriculum position ([[Curriculum.interleave]]
    * `seq`) and every shard streamed front-to-back consumes the
    * schedule's balanced source mix restricted to that shard — the
    * training-loader export shape. `idCol` stays the tiebreak, so the
    * layout is total-ordered even under a non-unique order column.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
      outDir: String, orderCol: Option[String] = None): Unit = {
    val probes = partitionProbes(nShards)
    val ord = orderCol.getOrElse(idCol)
    df.withColumn("shard", shardId(col(idCol), nShards))
      .withColumn("__probe",
        element_at(typedLit(probes.toSeq), col("shard").cast("int") + 1))
      .repartition(nShards, col("__probe"))
      .drop("__probe")
      .sortWithinPartitions(col("shard"), col(ord), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  /** probes(s) = the smallest non-negative long that HashPartitioning
    * (murmur3 seed 42, pmod nShards — exactly Spark's repartition
    * layout) places in partition s. Shuffling by `probes(shard)` gives
    * every shard its own task without trusting a sampler. Coupon-
    * collector expectation: O(nShards · ln nShards) hash evaluations.
    */
  private[ops] def partitionProbes(nShards: Int): Array[Long] = {
    val probes = Array.fill(nShards)(-1L)
    var found = 0
    var v = 0L
    while (found < nShards) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(v, 42)
      val p = ((h % nShards) + nShards) % nShards
      if (probes(p) < 0) { probes(p) = v; found += 1 }
      v += 1
    }
    probes
  }
}
