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
  * 100 TB shape: the per-cell pair join is quadratic only within a
  * cell (cells are corpus/k and tunable via k); everything downstream
  * runs on the pair list, which is tiny relative to the corpus. The
  * index can be (and in the registry is) the SAME persisted
  * cluster-partitioned table the ANN probes use — built once, shared.
  */
object SemanticDedup {

  /** Vectors that lose to a smaller-id near-duplicate:
    * (idCol, dup_of) rows, one per dropped vector. Keep-set = corpus
    * anti-join on the result.
    */
  def dropList(assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val pairs = Similarity.cosinePairsBlocked(
      assigned, idCol, vecCol, "cluster", threshold)
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .where(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id").as(idCol), col("cluster_rep").as("dup_of"))
  }
}
