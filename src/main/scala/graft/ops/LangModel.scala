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
}
