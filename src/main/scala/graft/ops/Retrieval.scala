package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-style relevance scoring over the document corpus — the
  * filter a training-data pipeline runs to mine documents relevant to a
  * topic/query mix (quality-targeted upsampling, domain mining).
  *
  * 100 TB shape: for a FIXED query-term list the whole computation is
  * two corpus scans and zero shuffles — one map-side aggregation pass
  * for the collection statistics (N, Σ|d|, per-term document
  * frequencies: O(terms) scalars to the driver), then one projection
  * pass where the per-term contributions are literal-folded into a
  * single fused expression. No explode, no inverted index, no join:
  * the statistics ride with the plan as literals.
  */
object Bm25 {

  /** Okapi BM25 with Lucene's +1 IDF smoothing. Deterministic across
    * partitionings: collection stats are exact integers, per-row double
    * arithmetic is IEEE-fixed, and the per-term contributions sum in
    * fixed (term-list) order inside one row — never across rows.
    * Returns (idCol, bm25) for docs with a positive score.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // staged: the tokenization feeds both the stats pass and the
    // scoring pass — without it the regex scan runs twice
    val withToks = Staged(df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__t")))
    // one aggregation pass: N, Σ|d|, df(t) per term — O(terms) scalars
    val aggs = count(lit(1)).as("n") +:
      sum(size(col("__t")).cast("long")).as("sumdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__t"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val st = withToks.agg(aggs.head, aggs.tail: _*).head()
    val n = st.getLong(0)
    require(n > 0, "BM25 needs a non-empty corpus (collection stats are undefined)")
    val avgdl = st.getLong(1).toDouble / n
    val dl = size(col("__t")).cast("double")
    // term frequency without a per-row HOF loop: |t| - |t \ {term}|
    def tf(t: String): Column =
      (size(col("__t")) - size(array_remove(col("__t"), t))).cast("double")
    val contributions = terms.zipWithIndex.map { case (t, i) =>
      val dfT = st.getLong(2 + i).toDouble
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      lit(idf) * tf(t) * lit(k1 + 1.0) /
        (tf(t) + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }
    val bm25 = round(contributions.reduce(_ + _), roundTo)
    withToks.select(col(idCol), bm25.as("bm25")).where(col("bm25") > 0)
  }
}

/** Hybrid retrieval: fuse a lexical (BM25) candidate list and a vector
  * (embedding-cosine) candidate list with Reciprocal Rank Fusion —
  * `rrf(d) = Σ_lists 1/(k0 + rank_list(d))` — the standard way a
  * curation pipeline mines "relevant to this topic" documents when
  * neither face alone has full recall (lexical misses paraphrases,
  * vector misses rare exact terms).
  *
  * 100 TB shape: the corpus-sized work is the two candidate generators,
  * each with its own scale posture (BM25 = two scans, zero shuffles;
  * vector = ANN probe or TakeOrderedAndProject). What reaches the
  * fusion is two TOP-N lists — O(N) rows by construction — so the
  * rank windows and the full-outer join run on driver-trivial volumes
  * whatever the corpus size. Never fuse unbounded score tables: the
  * `.limit` on each face is the scale contract.
  */
object Rrf {

  /** Fuse two candidate lists on `idCol`. Each input carries
    * (idCol, scoreCol); ranks are assigned by (score desc, id asc) — a
    * total order, so both engines agree whenever the rounded scores
    * match. Docs on one list only get that list's term alone (standard
    * RRF). Returns (idCol, rrf) top-k by (rrf desc, id asc).
    */
  def fuse(lexical: DataFrame, lexScore: String,
      vector: DataFrame, vecScore: String,
      idCol: String, k: Int, k0: Int = 60, roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // single-partition windows are deliberate: the inputs are top-N
    // candidate lists (bounded by contract), not corpus-sized tables
    def ranked(df: DataFrame, score: String, rank: String) =
      df.select(col(idCol), row_number()
        .over(Window.orderBy(col(score).desc, col(idCol))).as(rank))
    val l = ranked(lexical, lexScore, "lex_rank")
    val v = ranked(vector, vecScore, "vec_rank")
    val term: Column => Column =
      r => coalesce(lit(1.0) / (lit(k0.toDouble) + r.cast("double")), lit(0.0))
    l.join(v, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(term(col("lex_rank")) + term(col("vec_rank")), roundTo).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}

/** Sparse TF-IDF document-pair similarity with df-cut blocking — the
  * lexical near-duplicate / template-family miner: which document pairs
  * share distinctive (low-document-frequency) vocabulary, scored by
  * exact cosine over df-pruned TF-IDF vectors.
  *
  * The df cut is the scale contract, not an approximation bolt-on:
  * terms appearing in more than `maxDf` documents are dropped from the
  * VECTORS (their idf weight is lowest and they are what makes the
  * co-term self-join quadratic), so the join fan-out is bounded by
  * Σ_rare df² ≤ maxDf · Σ_rare df ≤ maxDf · corpus-term-instances —
  * LINEAR in corpus size at a fixed absolute cap. The cap must be
  * absolute, not a corpus fraction: a fraction-based threshold grows
  * with N while long-tail dfs don't, so it eventually keeps every
  * term and the join degenerates quadratically (measured: 3.6 s → 255 s
  * across a 20× corpus rehearsal before this was made absolute —
  * SCALE.md round 11). Cosine is EXACT with respect to the pruned
  * representation, so the DuckDB oracle reproduces it bit-for-bit.
  *
  * 100 TB shape: tf (one keyed aggregation), df (one aggregation on
  * term), the df-cut broadcast back onto tf, per-doc norms (keyed
  * aggregation), and the co-term equi-join on the pruned term key —
  * every stage keyed and partial-aggregated, no cartesian anywhere.
  * Skewed terms are impossible by construction (df ≤ maxDfFrac·N).
  *
  * Determinism: weights round onto the 10⁻⁹ decimal grid; dots and
  * norms sum those decimals exactly; the final cosine rounds to 10⁻⁶
  * and ranks with an (id_a, id_b) tiebreak — a total order.
  */
object TfIdf {

  /** Word-bigram terms: distinctive collocations rather than single
    * common words — same gram rule as the oracles.
    */
  private def termsOf(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    val n1 = greatest(size(t) - 1, lit(0))
    zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Top-`k` document pairs by pruned-TF-IDF cosine:
    * (id_a, id_b, cos_sim), id_a < id_b, ranked (cos desc, ids).
    */
  def cosinePairs(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int = 10, k: Int = 100,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tf = Staged(df
      .select(col(idCol).as("id"), explode(termsOf(col(textCol))).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("tf")))
    val n = tf.select(col("id")).distinct().count().toDouble
    val kept = tf.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    // the pruned term table is ≤ vocab-sized: broadcast the idf back
    val w = Staged(tf.join(broadcast(kept), "g")
      .select(col("id"), col("g"),
        round(col("tf").cast("double") *
          log(lit(n) / col("df").cast("double")), 9)
          .cast(DecimalType(18, 9)).as("w")))
    val nrm = w.groupBy(col("id"))
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("nm"))
    val dots = w.as("a")
      .join(w.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).cast("double").as("dot"))
    dots
      .join(nrm.select(col("id").as("id_a"), col("nm").as("__na")), "id_a")
      .join(nrm.select(col("id").as("id_b"), col("nm").as("__nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (col("__na") * col("__nb")), roundTo).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(k)
  }
}
