package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token co-occurrence / PMI statistics over the corpus — the analysis
  * behind vocabulary design, collocation mining, and tokenizer-merge
  * candidates: which token pairs appear together in documents far more
  * often than chance (`pmi = ln(p(a,b) / (p(a)·p(b)))` with document-
  * level co-occurrence probabilities).
  *
  * 100 TB shape: the unbounded quadratic blowup (all token pairs) is
  * cut off BEFORE any join — co-occurrence is computed only over the
  * top-V tokens by document frequency, so the per-doc pair fan-out is
  * ≤ V²/2 however long the document, and the pair aggregation's key
  * space is ≤ V². The pipeline is: one exploded-token aggregation for
  * document frequencies (map-side combine, O(vocab) result), a
  * broadcast semi-join of the exploded tokens against the top-V set,
  * one self-join ON DOC ID of that filtered (V-bounded per doc) frame,
  * and a map-side-combining pair count. The corpus is never
  * self-joined on content — only each doc's ≤V matched tokens meet.
  */
object Cooccur {

  /** Top-`topV` document-frequency tokens' pairwise PMI: pairs of
    * distinct tokens co-occurring in ≥ `minCount` docs, ranked by PMI.
    * Returns (tok_a, tok_b, n_ab, pmi) with tok_a < tok_b; top `k`
    * rows by (pmi desc, tok_a, tok_b) — a total order, and the PMI
    * doubles come from exact long ratios, so both engines agree.
    */
  def pmiTopPairs(df: DataFrame, idCol: String, textCol: String,
      topV: Int = 100, minCount: Int = 5, k: Int = 100,
      roundTo: Int = 6): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("__t"))
      .where(size(col("__t")) > 0)
    val ex = Staged(toks.select(col("id"), explode(col("__t")).as("tok")))
    val n = toks.count().toDouble // one scalar: total docs with ≥1 token
    val topTokens = ex.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(topV)
    // the top-V set broadcasts into the explode stream; everything
    // after this line is bounded by V, not by corpus vocabulary
    val filtered = ex.join(broadcast(topTokens), "tok")
      .select(col("id"), col("tok"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.id") === col("b.id") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(topTokens.select(col("tok").as("tok_a"),
        col("df").as("__dfa"))), "tok_a")
      .join(broadcast(topTokens.select(col("tok").as("tok_b"),
        col("df").as("__dfb"))), "tok_b")
      .where(col("n_ab") >= minCount)
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log(col("n_ab").cast("double") * lit(n) /
          (col("__dfa").cast("double") * col("__dfb").cast("double"))),
          roundTo).as("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(k)
  }
}
