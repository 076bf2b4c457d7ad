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
}
