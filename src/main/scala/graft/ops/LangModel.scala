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
}
