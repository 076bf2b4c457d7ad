package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Unigram language-model scoring — the cheap stand-in for the
  * KenLM-perplexity quality filter production pipelines run (CCNet
  * style): documents whose tokens are improbable under the corpus's
  * own unigram distribution are flagged as noise/outliers.
  *
  * 100 TB shape: two shuffles total — one token-count aggregation to
  * build the unigram table (map-side partial agg; the table is
  * O(vocab), many orders smaller than the corpus) and one (token ⨝
  * vocab) + per-doc re-aggregation pass. The vocab side auto-broadcasts
  * when small; at web scale the join keys are already the exploded
  * token rows, so it degrades gracefully to a shuffle join — never a
  * corpus self-join.
  *
  * Determinism: per-token log-probs are rounded onto a 10⁻⁹ grid and
  * summed exactly in decimal, so the per-doc total is independent of
  * row/partition order; the final average rounds to 10⁻⁶.
  */
object LangModel {

  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      roundTo: Int = 6): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) > 0)
    val exploded = Staged(toks.select(col("id"), explode(col("__t")).as("tok")))
    // unigram distribution of the corpus itself: p(t) = n_t / N
    val total = exploded.count().toDouble
    val vocab = exploded.groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("n_tok"))
    exploded
      .join(vocab, "tok")
      .withColumn("__lp",
        round(log(col("n_tok").cast("double") / lit(total)), 9)
          .cast(DecimalType(28, 9)))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        round((sum(col("__lp")).cast("double") / count(lit(1))), roundTo)
          .as("avg_logp"))
      .select(col("id").as(idCol), col("n_tokens"), col("avg_logp"))
  }

  /** CCNet-style perplexity bucketing: split the corpus into
    * head/middle/tail thirds by LM score — head = most probable under
    * the model (lowest perplexity = highest avg log-prob), the slice
    * CCNet keeps preferentially; tail = the noise candidates. The
    * standard curation move when a binary quality gate is too blunt:
    * downstream sampling draws from the buckets at chosen rates.
    *
    * 100 TB shape: scoring is [[unigramLogProb]]'s two shuffles; the
    * tertile boundaries come from [[Quantiles.exactBanded]] — exact
    * percentile_cont with bounded window state even over an unbounded
    * double domain — and return to the driver as two scalars that
    * literal-fold into the final bucket projection (one more scan, no
    * shuffle). The scored frame is staged so the boundary pass and the
    * bucket pass share one computation of it.
    *
    * Determinism: avg_logp lives on the 10⁻⁶ grid (order-independent by
    * x30's contract), the boundaries interpolate from grid values with
    * the expression [[Quantiles]] pins bit-identically in both engines,
    * and ties at a boundary resolve by the fixed `< t` rule.
    */
  def perplexityBuckets(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val scored = Staged(unigramLogProb(df, idCol, textCol))
    val th = Quantiles.exactBanded(scored, Nil, "avg_logp",
      Seq("t1" -> (1.0 / 3), "t2" -> (2.0 / 3)), bandWidth = 0.25).head()
    val lp = col("avg_logp")
    val bucket =
      if (th.isNullAt(th.fieldIndex("t1"))) lit("head") // empty corpus: no rows anyway
      else when(lp < th.getAs[Double]("t1"), "tail")
        .when(lp < th.getAs[Double]("t2"), "middle")
        .otherwise("head")
    scored.select(col(idCol), col("n_tokens"), col("avg_logp"),
      bucket.as("ppl_bucket"))
  }

  /** Interpolated bigram LM scoring — one Markov order up from
    * [[unigramLogProb]], the KenLM-lite quality signal: per bigram,
    * `P(w2|w1) = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/N` (Jelinek-Mercer
    * interpolation with the unigram model, so unseen continuations
    * never hit log 0), per doc the average bigram log-prob. Docs with
    * fewer than 2 tokens get no row (no bigram evidence).
    *
    * `lambda` must be exactly representable together with `1−lambda`
    * (default 0.75/0.25) so the oracle's literals are bit-identical.
    *
    * 100 TB shape: the model is two count tables — unigram O(V) and
    * bigram O(observed V²) — each one map-side-combining aggregation;
    * scoring joins the exploded doc-bigram stream against them on
    * their own keys (bigram join shuffles at most the exploded stream;
    * the unigram side broadcasts when small). The corpus is never
    * self-joined; per-doc re-aggregation is the only other shuffle.
    * At web scale the bigram table is thresholded upstream (min-count
    * pruning) without changing the join shape.
    *
    * Determinism: per-bigram log-probs round onto the 10⁻⁹ grid and
    * sum in Decimal(28,9); the per-doc average rounds to 10⁻⁶.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75, roundTo: Int = 6): DataFrame = {
    val t = TextAnalysis.tokens(col(textCol))
    val n1 = greatest(size(t) - 1, lit(0))
    val bg = df.select(col(idCol).as("id"),
      zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("bg"))
      .where(size(col("bg")) > 0)
    val exploded = Staged(bg.select(col("id"), explode(col("bg")).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val uni = Staged(df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw")))
    val nTok = uni.agg(sum(col("cw"))).head().getLong(0).toDouble
    val bi = exploded.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))
    exploded
      .join(bi, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
      .withColumn("__lp", round(log(
        lit(lambda) * col("cb").cast("double") / col("c1").cast("double") +
          lit(1.0 - lambda) * col("c2").cast("double") / lit(nTok)), 9)
        .cast(DecimalType(28, 9)))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(sum(col("__lp")).cast("double") / count(lit(1)), roundTo)
          .as("avg_logp2"))
      .select(col("id").as(idCol), col("n_bigrams"), col("avg_logp2"))
  }
}
