package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-based PII scrubbing for training corpora: detect and redact
  * emails, URLs, and long digit runs (phone numbers, account ids).
  *
  * Patterns are deliberately RE2-compatible (no backrefs/lookaround) so
  * the same regex runs in Spark (java.util.regex), DuckDB (RE2), and
  * RE2-based scrubbers. Row-local regexp expressions — codegen'd, no
  * shuffle, scan-speed at 100 TB.
  */
object Scrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // whitespace spelled out rather than \s: Java's \s includes vertical
  // tab (\x0B), RE2's does not — the explicit class pins identical
  // match spans in both engines
  val urlRe = "https?://[^ \\t\\n\\x0B\\f\\r]+"
  val longNumRe = "[0-9]{7,}"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0)))
  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(urlRe), lit(0)))
  def longNumCount(text: Column): Column =
    size(regexp_extract_all(text, lit(longNumRe), lit(0)))

  /** Redaction order matters: URLs first (they may embed @ and digit
    * runs), then emails, then bare digit runs.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "[URL]"),
        emailRe, "[EMAIL]"),
      longNumRe, "[NUM]")

  /** Per-document PII report + redacted body. */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      emailCount(col(textCol)).as("n_emails"),
      urlCount(col(textCol)).as("n_urls"),
      longNumCount(col(textCol)).as("n_long_nums"),
      redact(col(textCol)).as("redacted"))

  /** CCNet-style per-source boilerplate stripping: a `window`-token
    * passage is boilerplate in source s when it appears in ≥ `minDocs`
    * AND ≥ `minFrac` of s's documents (nav bars, cookie banners,
    * license footers — template content stamped across a site). Every
    * doc is rebuilt from its surviving passages, in order; docs that
    * were ALL boilerplate survive with empty clean_text (they are a
    * signal, not a silent drop).
    *
    * 100 TB shape: chunking is row-local (the (id, source) key rides
    * in a struct — no join to re-attach source); support counting is
    * one distinct + one keyed aggregation on (source, passage), the
    * same key the anti-join then probes, and the boilerplate side of
    * that anti-join is support-filtered (tiny) while the corpus side
    * streams. Reconstruction state is bounded by one document.
    *
    * Returns (idCol, sourceCol, clean_text, n_kept, n_dropped).
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, window: Int = 3, minFrac: Double = 0.2,
      minDocs: Int = 5): DataFrame = {
    val keyed = docs.select(struct(col(idCol).as("id"),
      col(sourceCol).as("src")).as("__k"), col(textCol))
    val chunked = Staged(Chunking
      .slidingChunks(keyed, "__k", textCol, size = window, stride = window)
      .select(col("__k.id").as("__id"), col("__k.src").as("__src"),
        col("chunk_idx"), col("chunk_text")))
    val srcSizes = chunked.select(col("__src"), col("__id")).distinct()
      .groupBy(col("__src")).agg(count(lit(1)).as("__nsrc"))
    val support = chunked
      .select(col("__src"), col("chunk_text"), col("__id")).distinct()
      .groupBy(col("__src"), col("chunk_text")).agg(count(lit(1)).as("__nd"))
    val boiler = support.join(srcSizes, "__src")
      .where(col("__nd") >= minDocs &&
        col("__nd").cast("double") >= lit(minFrac) * col("__nsrc").cast("double"))
      .select(col("__src"), col("chunk_text"))
    // explicit broadcast: the support-filtered boilerplate set is the
    // small side by construction (distinct template passages, not the
    // corpus) and the hint keeps the corpus passage stream shuffle-free
    // regardless of what size estimates the optimizer has on hand; a
    // corpus whose template set outgrows executor memory drops the hint
    // and degrades to a shuffle anti-join with identical semantics
    val kept = chunked.join(broadcast(boiler),
        Seq("__src", "chunk_text"), "left_anti")
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(
          col("chunk_idx").as("i"), col("chunk_text").as("t")))).as("__ps"),
        count(lit(1)).as("__nkept"))
    chunked.groupBy(col("__id"), col("__src"))
      .agg(count(lit(1)).as("__nall"))
      .join(kept, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("__src").as(sourceCol),
        coalesce(array_join(transform(col("__ps"), x => x.getField("t")), " "),
          lit("")).as("clean_text"),
        coalesce(col("__nkept"), lit(0L)).cast("int").as("n_kept"),
        (col("__nall") - coalesce(col("__nkept"), lit(0L))).cast("int")
          .as("n_dropped"))
  }
}
