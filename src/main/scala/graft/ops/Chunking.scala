package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the preprocessing step that turns
  * long documents into embedder/context-window-sized pieces (RAG
  * corpora, embedding pipelines, long-doc training splits).
  *
  * Contract: tokens are the shared lowercase-alnum tokenization; chunk
  * i covers tokens [i·stride, i·stride + size); the number of chunks is
  * 1 + ceil(max(|d| − size, 0) / stride) (so every token is covered,
  * the last chunk may be short, and a doc shorter than one window
  * yields exactly one chunk). Empty docs yield nothing.
  *
  * 100 TB shape: a narrow generate-and-project — tokenize, explode the
  * per-doc chunk index range, slice. No shuffle, no state; row growth
  * is the corpus's token count divided by the stride, the same data
  * expansion any chunker must emit. All integer arithmetic (no
  * float-boundary ambiguity at chunk edges).
  */
object Chunking {

  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      size: Int = 50, stride: Int = 30): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__t"))
      .where(org.apache.spark.sql.functions.size(col("__t")) > 0)
    val n = org.apache.spark.sql.functions.size(col("__t"))
    // integer ceil: 1 + (max(n - size, 0) + stride - 1) div stride —
    // the double division is exact for any realistic token count
    // (< 2^53) and the cast truncates, i.e. floors non-negatives
    val nChunks = lit(1) +
      ((greatest(n - lit(size), lit(0)) + lit(stride - 1)) / lit(stride)).cast("int")
    toks
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        array_join(slice(col("__t"), col("chunk_idx") * stride + 1, lit(size)), " ")
          .as("chunk_text"),
        least(lit(size), n - col("chunk_idx") * stride).cast("int").as("n_tokens"))
  }
}
