package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style embedding-space deduplication: partition the corpus
  * into KMeans cells, find exact-cosine near-dup pairs WITHIN cells,
  * connect components, and elect the min-id vector of each component
  * as its representative. Cross-cell near-dups are out of scope BY
  * DESIGN — the cell partition is the candidate blocking, exactly the
  * approximation SemDeDup makes — so the corpus is never crossed with
  * itself.
  *
  * 100 TB shape — two governors keep the within-cell pair join from
  * going quadratic in the CORPUS (not just the cell):
  *  - k scales with the corpus ([[Ivf.kForCells]]): constant expected
  *    cell population regardless of N, so total pair work is
  *    O(N × targetCell), linear in the corpus;
  *  - a hot-cell cap ([[keptCells]], same shape as the LSH
  *    `maxBucket` cap in [[Similarity.lshNearDupBuckets]]): KMeans
  *    balances only in expectation, and a degenerate dense region
  *    (near-identical embeddings, e.g. boilerplate) can swallow a
  *    constant fraction of the corpus into one cell. Cells over
  *    `maxCell` rows are excluded from pairing entirely — visible via
  *    [[droppedCells]], never silent.
  * The index can be (and in the registry is) the SAME persisted
  * cluster-partitioned table the ANN probes use — built once, shared.
  */
object SemanticDedup {

  /** Cells whose population exceeds `maxCell`: (blockCol, n) rows.
    * Computed from a tiny aggregated count (≤ k rows, map-side partial
    * agg) — the accounting face of the cap, so truncation is always
    * observable (log/report this before trusting a drop list).
    */
  def droppedCells(assigned: DataFrame, blockCol: String = "cluster",
      maxCell: Long = DefaultMaxCell): DataFrame =
    assigned.groupBy(col(blockCol)).agg(count(lit(1)).as("n"))
      .where(col("n") > maxCell)

  /** The governed corpus: rows of cells at or under `maxCell`. Hot
    * cells are excluded from BOTH pair roles (mirroring the LSH
    * hot-bucket cap): a cell the clustering can't discriminate is a
    * degenerate region where "within-cell all-pairs" stops being a
    * blocking strategy at all.
    */
  def keptCells(assigned: DataFrame, blockCol: String = "cluster",
      maxCell: Long = DefaultMaxCell): DataFrame =
    assigned.join(
      broadcast(droppedCells(assigned, blockCol, maxCell).select(col(blockCol))),
      Seq(blockCol), "left_anti")

  /** Default hot-cell cap: 8× the [[Ivf.kForCells]] target population —
    * generous headroom for KMeans imbalance, firm bound on the
    * quadratic term (≤ 64× the expected per-cell pair work).
    */
  val DefaultMaxCell: Long = 8L * Ivf.DefaultTargetCell

  /** Vectors that lose to a smaller-id near-duplicate:
    * (idCol, dup_of) rows, one per dropped vector. Keep-set = corpus
    * anti-join on the result. Applies the hot-cell cap; callers that
    * materialize the governed assignment themselves (e.g. to dump it
    * for external verification) use [[dropListFromKept]] so the exact
    * same rows feed both faces.
    */
  def dropList(assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCol: String = "cluster",
      maxCell: Long = DefaultMaxCell): DataFrame =
    dropListFromKept(keptCells(assigned, blockCol, maxCell),
      idCol, vecCol, threshold, blockCol)

  /** [[dropList]] with multi-probe blocking: every vector joins its
    * `probes` nearest cells ([[Ivf.multiAssign]]), so a near-dup pair
    * split by a Voronoi boundary — invisible to single-assignment
    * blocking, the measured recall gap in SCALE.md's x31 section —
    * pairs up in a shared second-choice cell. Candidate pairs
    * deduplicate across shared cells; the hot-cell cap governs the
    * PROBED population (a cell saturated by second choices is just as
    * degenerate for pairing as one saturated by first choices).
    * Within-cell pair work rises by ≤ probes², still linear in the
    * corpus under the constant-population k policy.
    */
  def dropListMultiProbe(index: Ivf.Index, idCol: String, vecCol: String,
      threshold: Double, probes: Int = 2, blockCol: String = "cluster",
      maxCell: Long = DefaultMaxCell): DataFrame = {
    val multi = Ivf.multiAssign(index,
      index.assigned.drop(blockCol), idCol, vecCol, probes)
    // the cap scales by p: the probed population of a cell is up to p×
    // its first-choice population, and a cell legitimate under the
    // single-probe cap must stay legitimate here — an unscaled cap
    // would DROP dense-but-valid cells and return fewer duplicates
    // than plain dropList (spec-pinned)
    dropListFromKept(keptCells(multi, blockCol, maxCell * probes),
      idCol, vecCol, threshold, blockCol, dedupPairs = true)
  }

  /** [[dropList]] over an already-governed assignment. `dedupPairs`
    * distincts the candidate pairs first — required for multi-probe
    * assignments where one pair can share several cells; a no-op (and
    * skipped shuffle) for single assignment.
    */
  def dropListFromKept(kept: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCol: String = "cluster",
      dedupPairs: Boolean = false): DataFrame = {
    // the governed frame feeds BOTH sides of the pair self-join; stage
    // it so the cap's count+anti-join executes once, not once per side
    // (house pattern — released by the caller's Staged.release)
    val stagedKept = Staged(kept)
    val raw = Similarity.cosinePairsBlocked(
      stagedKept, idCol, vecCol, blockCol, threshold)
      .select(col("id_a"), col("id_b"))
    val pairs = if (dedupPairs) raw.distinct() else raw
    Dedup.connectedComponents(pairs)
      .where(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id").as(idCol), col("cluster_rep").as("dup_of"))
  }
}
