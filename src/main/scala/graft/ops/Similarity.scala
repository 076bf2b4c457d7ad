package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: one narrow projection
  * (the dot product fuses into the scan) + TakeOrderedAndProject — no
  * global sort, no shuffle of the corpus. The scale path is
  * random-hyperplane LSH bucketing: candidates come from one equi-join
  * on bucket signature, then exact re-rank — the 100 TB corpus is never
  * crossed with itself.
  */
object Similarity {

  /** Element-wise dot product of two array columns, accumulated in
    * double — a native expression ([[graft.functions.DotProduct]]): the
    * interpreted zip_with+aggregate pair boxes every element; the native
    * loop is the difference between O(pairs·dim) primitive FLOPs and
    * O(pairs·dim) allocations in the pairwise operators.
    */
  def dot(a: Column, b: Column): Column = GraftFunctions.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact cosine top-k of `corpus` against one query vector (given as a
    * 1-row DataFrame, e.g. the corpus row with a chosen id). The query
    * side broadcasts; orderBy+limit plans as TakeOrderedAndProject
    * (per-partition heap + driver merge of k rows, never a full sort).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      roundTo: Int = 6): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(query.select(col(vecCol).as("query_vec")))
    corpus.crossJoin(q)
      .select(col(idCol),
        round(cosine(col(vecCol), col("query_vec")), roundTo).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact cosine near-dup pairs within a blocking key (quadratic per
    * block, embarrassingly parallel across blocks).
    */
  def cosinePairsBlocked(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double,
      roundTo: Int = 6): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // norms computed once per row, not once per pair
    val v = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      col(vecCol).as("v"), l2Norm(col(vecCol)).as("nrm"))
    v.as("x").join(v.as("y"),
      col("x.block") === col("y.block") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")), roundTo)
          .as("cos_sim"))
      .where(col("cos_sim") > threshold)
  }

  /** Deterministic random hyperplanes: nBits × dim doubles from a seeded
    * generator, shipped as one literal (broadcast with the plan).
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id: bit b = sign(v · plane_b), packed
    * into a long. Vectors in the same bucket agree on all nBits signs →
    * small angular distance with high probability.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    aggregate(sequence(lit(0), lit(planes.size - 1)), lit(0L),
      (acc, i) => when(dot(vec, element_at(typedLit(planes), i + 1)) > 0,
        acc.bitwiseOR(call_function("shiftleft", lit(1L), i)))
        .otherwise(acc))

  /** Approximate top-k: LSH-bucket the corpus, probe the query's bucket
    * plus all Hamming-1 neighbor buckets (multi-probe), exact re-rank
    * inside the candidate set. Recall/cost tradeoff via nBits.
    */
  def lshTopK(
      corpus: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8,
      dim: Int = 64,
      seed: Long = 42L,
      roundTo: Int = 6): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val planes = hyperplanes(nBits, dim, seed)
    val bucketed = corpus.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), planes).as("bucket"))
    // query bucket + its nBits hamming-1 neighbors
    val probes = query
      .select(col(vecCol).as("query_vec"), lshBucket(col(vecCol), planes).as("qb"))
      .select(col("query_vec"),
        explode(concat(array(col("qb")),
          transform(sequence(lit(0), lit(nBits - 1)),
            b => col("qb").bitwiseXOR(call_function("shiftleft", lit(1L), b)))))
          .as("bucket"))
    bucketed.join(broadcast(probes), "bucket")
      .select(col(idCol),
        round(cosine(col(vecCol), col("query_vec")), roundTo).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
