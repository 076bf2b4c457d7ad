package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting.
  *
  * Everything is built from codegen'd `functions._` expressions — no
  * UDFs — so the whole module fuses into the scan stage and scales as a
  * single pass over the corpus.
  */
object TextAnalysis {

  /** Word tokens: lowercased alphanumeric runs. The same regex is used
    * by the DuckDB oracles (RE2/Java-regex-portable subset).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish subword count: alpha runs, digit runs, and individual
    * punctuation marks each count as one token (a cheap stand-in for a
    * trained tokenizer's segmentation).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def nTokens(text: Column): Column = size(tokens(text))
  def nDistinctTokens(text: Column): Column = size(array_distinct(tokens(text)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0)))

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** Heuristic quality score in [0,1] from length / punctuation /
    * stopword / repetition signals — the standard pre-training filters
    * (C4/Gopher-style), all as exact integer ratios so the score is
    * bit-deterministic and oracle-checkable.
    */
  def qualityScore(text: Column): Column = {
    val n  = nTokens(text).cast("double")
    val nd = nDistinctTokens(text).cast("double")
    val lenOk    = when(n >= 10 && n <= 1000, 1.0).otherwise(0.0)
    val diversity = when(n > 0, nd / n).otherwise(0.0)
    val stopRatio = when(n > 0, stopwordCount(text).cast("double") / n).otherwise(0.0)
    val punctOk  = when(length(text) > 0,
      lit(1.0) - least(punctCount(text).cast("double") / length(text) * 5.0, lit(1.0)))
      .otherwise(0.0)
    (lenOk * 0.25) + (diversity * 0.25) + (least(stopRatio * 5.0, lit(1.0)) * 0.25) +
      (punctOk * 0.25)
  }

  /** Tiny per-language function-word profiles for the n-gram/stopword
    * language-ID heuristic. Real pipelines would ship larger profiles;
    * the mechanism (token-overlap argmax, one projection, no shuffle)
    * is what matters at 100 TB.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en", "por", "que"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta", "zai", "you", "he", "bu"))

  /** Predicted language: argmax over profile-overlap scores; "und"
    * (undetermined) when nothing matches. Ties break by profile order.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      (lang, size(array_intersect(toks, typedLit(words))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldLeft(when(best <= 0, "und")) { case (acc, (lang, score)) =>
      acc.when(score === best, lang)
    }.otherwise("und")
  }

  /** Canonical-form fingerprint: md5 of (lowercased, whitespace-collapsed,
    * trimmed) text — exact-dup detection robust to formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling-hash content fingerprint: the k smallest 64-bit hashes of
    * the document's word 3-gram shingles (a winnowing-style sketch).
    * Locality-sensitive for containment: shared shingles → shared mins.
    */
  def minKShingleSketch(text: Column, k: Int = 8): Column =
    slice(array_sort(transform(Shingles(text, 3), s => xxhash64(s))), 1, k)

  /** Corpus snapshot diff — the crawl-drift report between two corpus
    * versions: per token, its count in each snapshot and the
    * add-1-smoothed log-ratio of its relative frequencies, top movers
    * first. The companion to [[zipfFit]]'s one-row health line when
    * the question is WHAT changed, not just whether the shape did.
    *
    * 100 TB shape: one map-side-combining token count per snapshot
    * (O(vocab) each), a full-outer join of the two vocab tables, and a
    * TakeOrderedAndProject — nothing corpus-sized is ever joined or
    * sorted. Totals fall out of the joined table in one action.
    *
    * Returns (token, n_a, n_b, log_ratio) — the top `k` by |log_ratio|
    * (ties by token: total order). Smoothing is add-1 over the UNION
    * vocabulary, so tokens absent from one side rank by how loud they
    * are on the other.
    */
  def corpusDiff(a: DataFrame, b: DataFrame, textCol: String,
      k: Int = 100, roundTo: Int = 6): DataFrame = {
    def counts(df: DataFrame) = df
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val j = Staged(counts(a).withColumnRenamed("n", "n_a")
      .join(counts(b).withColumnRenamed("n", "n_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b")))
    val t = j.agg(count(lit(1)), sum(col("n_a")), sum(col("n_b"))).head()
    val (v, na, nb) = (t.getLong(0).toDouble, t.getLong(1).toDouble,
      t.getLong(2).toDouble)
    j.select(col("token"), col("n_a"), col("n_b"),
      round(log((col("n_a").cast("double") + 1.0) / lit(na + v)) -
        log((col("n_b").cast("double") + 1.0) / lit(nb + v)), roundTo)
        .as("log_ratio"))
      .orderBy(abs(col("log_ratio")).desc, col("token"))
      .limit(k)
  }

  /** Zipf-law fit of the corpus token-frequency distribution: least
    * squares of ln(freq) on ln(rank) over the top `topR` ranks. The
    * single output row (n_ranks, slope, intercept, r2) is the corpus
    * health line — natural text sits near slope ≈ −1; template spam or
    * truncated vocabularies bend it — and is the cheapest drift check
    * between two crawls.
    *
    * 100 TB shape: one map-side-combining token count (O(vocab)
    * result), TakeOrderedAndProject for the top R, and a single-row
    * closed-form aggregate over R rows — the corpus is scanned once
    * and nothing corpus-sized is ever shuffled.
    *
    * Determinism: ln(rank)/ln(freq) land on the 10⁻⁹ decimal grid
    * before any sum or product (Decimal(12,9); products keep scale 18
    * exactly), so Sx/Sy/Sxx/Sxy/Syy are partition-order-independent;
    * the final regression scalars are doubles rounded to 10⁻⁶.
    */
  def zipfFit(df: DataFrame, textCol: String, topR: Int = 100,
      roundTo: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ranked = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(topR)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("f").desc, col("w"))))
    val grid9 = (c: Column) => round(c, 9).cast(DecimalType(12, 9))
    val pts = ranked.select(
      grid9(log(col("r").cast("double"))).as("x"),
      grid9(log(col("f").cast("double"))).as("y"))
    // exact decimal sums (order-independent), then scalar double math
    // — identical in any engine given identical sums
    val s = pts.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = num / den
    s.select(col("n").cast("long").as("n_ranks"),
      round(slope, roundTo).as("slope"),
      round((col("sy") - col("sx") * slope) / col("n"), roundTo)
        .as("intercept"),
      round(num * num /
        (den * (col("n") * col("syy") - col("sy") * col("sy"))),
        roundTo).as("r2"))
  }

  /** Gopher-style rule-based quality gates (Rae et al. 2021, the
    * public document-filter recipe): per-doc surface statistics —
    * word count, mean word length, symbol-to-word ratios ('#' and
    * '...'), alphabetic-word fraction, stopword hits — plus the
    * conjunctive `pass` flag (0/1). The complement to the SCORE-based
    * gate ([[qualityScore]]): rules are auditable per-document (which
    * gate failed), which is what a curation postmortem needs.
    *
    * All closed-form column expressions over one scan — the whole
    * gate fuses into the corpus read. Thresholds are the published
    * defaults where the fixture can exercise them; word-count bounds
    * are parameters because they are corpus-policy, not universal.
    */
  /** Token-budget truncation — the context-window capping pass a
    * training pipeline runs before packing: keep each doc's first
    * `budget` tokens, output (id, n_tokens, n_kept, truncated). The
    * truncated text is the NORMALIZED token join (the passage-rebuild
    * convention — exact byte-offset splicing needs the original-text
    * offsets a trained tokenizer would carry). Row-local projections
    * only: no shuffle, fuses into the scan.
    */
  def truncateTokens(df: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val t = tokens(col(textCol))
    df.select(col(idCol),
      size(t).cast("long").as("n_tokens"),
      least(size(t), lit(budget)).cast("long").as("n_kept"),
      concat_ws(" ", slice(t, 1, budget)).as("truncated"))
  }

  /** Per-doc n-gram novelty against everything EARLIER (lower id —
    * ingestion order's proxy): the fraction of a doc's distinct
    * overlapping `n`-gram shingles whose FIRST occurrence (min id) is
    * this doc. The curriculum/acquisition signal: a crawl whose
    * novelty curve collapses is re-reading the web; a source whose
    * docs score near zero is redundant against what's already held.
    *
    * 100 TB shape: distinct per-doc shingles explode once; the first-
    * occurrence table is ONE map-side-combining min aggregation on the
    * gram key, and the join back is gram-keyed co-partitioned — two
    * shuffles of the exploded gram rows, linear in corpus grams, no
    * self-join (the same budget class as the x52 duplication profile).
    * Docs with fewer than `n` tokens have no shingles and no row.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, roundTo: Int = 6): DataFrame = {
    val gg = Staged(df.select(col(idCol).as("__id"),
      explode(Shingles(col(textCol), n)).as("gram")))
    val firsts = gg.groupBy(col("gram")).agg(min(col("__id")).as("__first"))
    gg.join(firsts, "gram")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("__id").as(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), roundTo)
          .as("novelty"))
  }

  /** Per-doc TOP-n-gram dominance — Gopher's "fraction of n-grams
    * taken by the single most common n-gram" repetition signal, with
    * the winning gram itself reported (the auditable face: a human
    * reads the gram and knows whether it's boilerplate, a nav bar, or
    * legitimate chorus). Complements x22: repetition measures how much
    * of the doc repeats AT ALL; dominance measures whether ONE phrase
    * owns it — SEO keyword-stuffing scores high dominance at modest
    * repetition. Ties break to the lexicographically smallest gram
    * (total order, oracle-replayable). Docs shorter than `n` tokens
    * have no row (x65's convention).
    *
    * 100 TB shape: grams explode once with multiplicity
    * ([[Shingles.grams]] — the zip-of-shifted-slices construction, the
    * dominant cost of this whole query class; see its scaladoc for the
    * 8× measurement); one map-side-combining (doc, gram) count, then
    * ONE doc-keyed window pass computing both the row_number argmax
    * and the sum total (same partition spec → one sort over single-doc
    * partitions). Measured alternatives, all REJECTED: carrying the
    * row-local total (size − n + 1) through the explode makes the
    * Generate's projection ~10× slower (a token-derived column
    * alongside the exploded array re-runs the tokenizer per OUTPUT row
    * under the interpreted HOF fallback); the rk=1 WindowGroupLimit
    * cut inserts an extra map-side sort over all count rows;
    * min_by-over-struct plans SortAggregate. This shape measured 4×
    * faster than the best of them (0.9 s vs 3.5–6 s at sf0.1).
    */
  def topNgramDominance(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2, roundTo: Int = 6): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("__id"))
    df.select(col(idCol).as("__id"),
        explode(Shingles.grams(col(textCol), n)).as("gram"))
      .groupBy(col("__id"), col("gram"))
      .agg(count(lit(1)).as("n_top"))
      .withColumn("__rk", row_number().over(
        byDoc.orderBy(col("n_top").desc, col("gram"))))
      .withColumn("n_ngrams", sum(col("n_top")).over(byDoc))
      .where(col("__rk") === 1)
      .select(col("__id").as(idCol), col("gram").as("top_ngram"),
        col("n_top"), col("n_ngrams"),
        round(col("n_top").cast("double") / col("n_ngrams"), roundTo)
          .as("dominance"))
  }

  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      roundTo: Int = 6, keep: Seq[String] = Nil,
      perGate: Boolean = false): DataFrame = {
    val t = col(textCol)
    val words = regexp_extract_all(t, lit("\\S+"), lit(0))
    // codegen-friendly counts (the x61 lesson): array `filter` lambdas
    // are interpreted (ArrayFilter is CodegenFallback) — both counts
    // restate the per-token predicate as ONE regexp_extract_all, which
    // codegens. Letter-words: a \S+ run containing a letter yields
    // exactly one [A-Za-z]\S* match — the match anchors on the run's
    // FIRST letter and greedy \S* swallows the rest of the run (it
    // can't span whitespace), and every non-letter position fails in
    // O(1) with no quantifier engaged, so a multi-hundred-KB letter-
    // free blob (base64/digit junk — exactly what a quality gate eats)
    // scans linearly. The earlier \S*[A-Za-z]\S* form counted the same
    // runs but backtracked quadratically on long letter-free runs:
    // each start position re-scanned the rest of the run. Stopword
    // occurrences: a token of tokens() equals a stopword iff the
    // maximal [a-z0-9]+ run equals it — the lookaround fence
    // (?<![a-z0-9])…(?![a-z0-9]) on lower(text) matches exactly those
    // runs, with multiplicity, whatever the alternation order.
    val stopRe = "(?<![a-z0-9])(the|a|an|and|or|of|to|in|is|it)(?![a-z0-9])"
    val g = df.select(col(idCol) +: keep.map(col) :+
      size(words).cast("long").as("n_words") :+
      length(regexp_replace(t, "\\s", "")).cast("double").as("__wc") :+
      (length(t) - length(translate(t, "#", ""))).cast("double").as("__nh") :+
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
        .cast("double").as("__ne") :+
      size(regexp_extract_all(t, lit("[A-Za-z]\\S*"), lit(0)))
        .cast("double").as("__na") :+
      size(regexp_extract_all(lower(t), lit(stopRe), lit(0)))
        .cast("long").as("n_stop"): _*)
    def ratio(num: Column): Column =
      round(when(col("n_words") > 0, num / col("n_words")).otherwise(0.0), roundTo)
    val stats = g.select(col(idCol) +: keep.map(col) :+ col("n_words") :+
      ratio(col("__wc")).as("mean_word_len") :+
      ratio(col("__nh")).as("hash_ratio") :+
      ratio(col("__ne")).as("ellipsis_ratio") :+
      ratio(col("__na")).as("alpha_frac") :+
      col("n_stop"): _*)
    // per-gate verdicts, exported as columns when `perGate` (the audit
    // shape a pipeline's stage report needs — WHICH rule ate the crawl,
    // not just how many docs died); the default schema stays exactly
    // x60's oracle-pinned shape
    val gates = Seq(
      "g_words" -> (col("n_words") >= minWords && col("n_words") <= maxWords),
      "g_word_len" -> (col("mean_word_len") >= 3.0 &&
        col("mean_word_len") <= 10.0),
      "g_hash" -> (col("hash_ratio") <= 0.1),
      "g_ellipsis" -> (col("ellipsis_ratio") <= 0.3),
      "g_alpha" -> (col("alpha_frac") >= 0.8),
      "g_stop" -> (col("n_stop") >= 2L))
    val withGates = if (perGate)
      gates.foldLeft(stats) { case (d, (n, c)) => d.withColumn(n, c.cast("int")) }
    else stats
    withGates.withColumn("pass",
      gates.map(_._2).reduce(_ && _).cast("int"))
  }

  /** The gate column names [[gopherRules]] emits under `perGate`, in
    * emission order — the stage-report accounting key set.
    */
  val gopherGateCols: Seq[String] =
    Seq("g_words", "g_word_len", "g_hash", "g_ellipsis", "g_alpha", "g_stop")

  /** Top-`vocabSize` vocabulary coverage — the tokenizer-sizing signal:
    * fit the corpus's own most-frequent-token vocabulary (ties broken
    * lexicographically, so the cut is deterministic) and report each
    * doc's out-of-vocabulary token count WITH multiplicity. The curve
    * of oov_rate vs vocabSize is how a vocabulary budget gets chosen;
    * per-source slices of it expose sources a fixed tokenizer will
    * shred into bytes. Docs with no tokens have no row (x65's rule).
    *
    * 100 TB shape: token counts are ONE map-side-combining aggregation
    * on the token key; the top-V cut is a TakeOrderedAndProject (V is
    * driver-bounded — a vocabulary, not a corpus); the per-doc pass
    * re-joins the exploded tokens against the BROADCAST vocab and
    * re-aggregates on the doc key. Two shuffles of the exploded token
    * rows, linear in corpus tokens, never a self-join.
    */
  /** The top-`vocabSize` vocabulary itself — (tok), deterministic
    * (count desc, then lexicographic at the cut). Persist this to
    * parquet to freeze the vocabulary a training run committed to;
    * [[graft.streaming.Streams.oovMonitorStream]] probes batches
    * against the frozen file.
    */
  def fitVocab(df: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"))
  }

  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, roundTo: Int = 6): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = Staged(df.select(col(idCol).as("__id"),
      explode(tokens(col(textCol))).as("tok")))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("__inv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("__id").as(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), roundTo)
          .as("oov_rate"))
  }

  /** The corpus unigram COUNT table — (tok, cnt), the frozen artifact
    * [[graft.streaming.Streams.klMonitorStream]] watches against (the
    * full-distribution sibling of [[fitVocab]]'s top-V cut: OOV asks
    * "does the vocabulary contain the word", KL asks "do the
    * PROPORTIONS match"). O(vocab) rows, one map-side-combining pass.
    */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))

  /** Per-document Shannon entropy of the doc's own unigram
    * distribution, in nats: H = −Σ_w p_w ln p_w with p_w = c_w/n over
    * the doc's tokens — the classic repetitiveness signal (a doc of
    * one word repeated reads 0; boilerplate and template spam sit far
    * below organic text at equal length), complementing the max-share
    * view ([[topNgramDominance]]) with the whole-distribution view.
    * Every input doc keeps a row (the quality-gate convention):
    * tokenless docs carry n_tokens=0 and NULL entropy — 0 would
    * conflate them with genuinely zero-entropy one-word docs.
    *
    * Engine-portable float discipline (the x30 recipe): each per-word
    * term p·ln p rounds onto a 1e-9 decimal grid and the per-doc sum
    * runs in DECIMAL, so the result is partition-order independent and
    * a DuckDB oracle replays it bit-for-bit.
    *
    * 100 TB shape: explode → two map-side-combining aggregations keyed
    * by doc (+word), one broadcast-back join of per-doc totals — one
    * corpus pass, nothing global.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = Staged(docs
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("__id"), col("tok")).agg(count(lit(1)).as("__c")))
    val ent = cnt
      .join(cnt.groupBy(col("__id")).agg(sum(col("__c")).as("__n")), "__id")
      .select(col("__id"), col("__n"),
        round((col("__c").cast("double") / col("__n")) *
          log(col("__c").cast("double") / col("__n")), 9)
          .cast("decimal(28,9)").as("__t"))
      .groupBy(col("__id"))
      .agg(max(col("__n")).as("n_tokens"),
        round(-sum(col("__t")).cast("double"), 6).as("entropy"))
    docs.select(col(idCol))
      .join(ent, col(idCol) === col("__id"), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("entropy"))
  }

  /** Per-source unigram KL divergence from the corpus distribution, in
    * nats: KL(p_s ‖ q) = Σ_w p_s(w) ln(p_s(w)/q(w)) with p_s the
    * source's token distribution and q the whole corpus's — the
    * DISTRIBUTIONAL drift signal the per-source health table lacks:
    * OOV counts words the vocabulary is missing, novelty counts grams
    * never seen, but a source can be 0-OOV/0-novel and still skew the
    * training mix (all common words, wrong proportions); KL prices
    * exactly that. Terms with p_s(w)=0 contribute 0 and q(w)>0 for
    * every word a source has (the corpus includes the source), so the
    * sum needs no smoothing. Sources with zero tokens keep a row with
    * NULL kl (the x85 convention). Same decimal-grid discipline as
    * [[tokenEntropy]].
    *
    * 100 TB shape: one exploded-token pass → (source,word) and (word)
    * map-side-combining counts, a join on the O(vocab)-sized word key,
    * a #sources-sized output — nothing pairwise, nothing corpus².
    */
  def sourceUnigramKl(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val ex = Staged(docs.select(col(srcCol).cast("string").as("source"),
      explode(tokens(col(textCol))).as("tok")))
    val nTotal = ex.count()
    val globalCnt = ex.groupBy(col("tok")).agg(count(lit(1)).as("__cg"))
    val srcCnt = Staged(ex.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("__cs")))
    val srcTot = srcCnt.groupBy(col("source")).agg(sum(col("__cs")).as("__ns"))
    val kl = srcCnt
      .join(globalCnt, "tok")
      .join(srcTot, "source")
      .select(col("source"), col("__ns"),
        round((col("__cs").cast("double") / col("__ns")) *
          log((col("__cs").cast("double") * nTotal.toDouble) /
            (col("__ns").cast("double") * col("__cg"))), 9)
          .cast("decimal(28,9)").as("__t"))
      .groupBy(col("source"))
      .agg(max(col("__ns")).as("n_tokens"),
        round(sum(col("__t")).cast("double"), 6).as("kl"))
    docs.groupBy(col(srcCol).cast("string").as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .join(kl, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("kl"))
  }

  /** Per-source unigram KL against a FROZEN count table under the
    * renormalized-SHARED-support rule — [[sourceUnigramKl]]'s axis with
    * the streaming KL monitor's semantics (graft.streaming.Streams
    * .klSnapshotFromWords), sliced by source: per source, terms range
    * over the tokens the frozen table knows AND the source emits; both
    * distributions renormalize to that support, so the divergence is a
    * true KL (≥ 0, 0 iff the source's in-vocab proportions match the
    * frozen corpus's over the same words). Out-of-vocab mass is the OOV
    * column's signal, never smoothed into KL. The per-source number
    * equals the global monitor's formula restricted to one source — the
    * same arithmetic (per-term 1e-9 grid, decimal sum, round 6), so a
    * threshold tuned on the global gauge applies per source. A source
    * with no shared support (tokenless, or fully out-of-vocab) carries
    * NULL kl — it cannot be certified, not "perfectly matched".
    *
    * This is the health-row column the global KL monitor structurally
    * lacks: one source drifting its proportions hides behind nine
    * healthy ones in the batch-global number exactly the way novelty
    * does. Cost: one (source, tok) count over the batch, one tok-keyed
    * join against the frozen table, one source-keyed sum — nothing
    * corpus-sized, and nothing O(vocab) BROADCAST (r20): the frozen
    * side joins on the same tok key the batch count is already
    * partitioned on, so a [[graft.ops.Dedup.writeBucketedIndex]]-
    * committed frozen table (the capstone's freeze) scans
    * Exchange-free; a web-scale vocabulary never rides the driver.
    *
    * `frozen` is the committed [[unigramCounts]] table: (tok, cnt).
    */
  def perSourceSharedKl(docs: DataFrame, textCol: String, srcCol: String,
      frozen: DataFrame): DataFrame = {
    val ex = Staged(docs.select(col(srcCol).cast("string").as("source"),
      explode(tokens(col(textCol))).as("tok")))
    val totals = ex.groupBy(col("source"))
      .agg(count(lit(1)).as("__ntok"))
    val stats = perSourceSharedKlFromWords(ex, frozen)
    docs.groupBy(col(srcCol).cast("string").as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .join(totals, Seq("source"), "left")
      .join(stats, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("__ntok"), lit(0L)).as("n_tokens"),
        coalesce(col("n_in_vocab"), lit(0L)).as("n_in_vocab"), col("kl"))
  }

  /** [[perSourceSharedKl]] over a pre-exploded (source, tok) frame —
    * the shared-words-frame face the streaming health snapshot feeds
    * (one tokenization pass serves OOV, fertility, AND KL). Returns
    * one row per source WITH shared support: (source, n_in_vocab, kl);
    * sources without shared support are simply absent (the caller's
    * left join reads them as NULL — uncertifiable).
    */
  private[graft] def perSourceSharedKlFromWords(ex: DataFrame,
      frozen: DataFrame): DataFrame = {
    val bc = Staged(ex.select(col("source"), col("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("__cb")))
    // no broadcast hint on the frozen side (r20): O(vocab) must never
    // be forced onto the driver — Catalyst picks by size at fixture
    // scale, and a bucketed frozen table co-partitions at 100 TB
    val shared = Staged(bc.join(
      frozen.select(col("tok"), col("cnt")), "tok"))
    // per-source shared-support sums: batch mass and frozen mass over
    // exactly the words BOTH sides hold for that source
    val sums = shared.groupBy(col("source"))
      .agg(sum(col("__cb")).as("__ninv"), sum(col("cnt")).as("__qs"))
    val kl = shared
      .join(sums, "source")
      .select(col("source"),
        round((col("__cb").cast("double") / col("__ninv")) *
          log((col("__cb").cast("double") * col("__qs")) /
            (col("__ninv").cast("double") * col("cnt"))), 9)
          .cast("decimal(28,9)").as("__t"))
      .groupBy(col("source"))
      .agg(round(sum(col("__t")).cast("double"), 6).as("kl"))
    sums.select(col("source"), col("__ninv").as("n_in_vocab"))
      .join(kl, Seq("source"), "left")
  }

  /** Per-source Population Stability Index of the [[qualityScore]]
    * distribution vs the corpus-global one, over `nBuckets` fixed
    * equal-width buckets on [0,1]: PSI = Σ_b (p'_b − q'_b) ln(p'_b/q'_b)
    * with the standard ε-floor on empty buckets (p' = max(p, ε)) — the
    * drift-monitoring classic (rule of thumb: <0.1 stable, >0.25
    * shifted), here answering "does this source's QUALITY PROFILE look
    * like the corpus", which the health table's mean-quality column
    * cannot (two sources with equal means, one bimodal junk+gems, read
    * identically there). Bucket = min(⌊score·K⌋, K−1); the score is
    * exact integer ratios, so bucketing is bit-deterministic. Every
    * (source, bucket) cell participates, absent cells at ε — the full
    * grid is #sources × K, a broadcast-sized frame. Same decimal-grid
    * sum discipline as [[tokenEntropy]].
    */
  def qualityPsi(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, nBuckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(eps > 0, s"eps must be positive, got $eps")
    val bucketed = Staged(docs.select(
      col(srcCol).cast("string").as("source"),
      least(floor(qualityScore(col(textCol)) * nBuckets).cast("int"),
        lit(nBuckets - 1)).as("bucket")))
    val nTotal = bucketed.count()
    val globalB = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("__nb"))
    val srcB = bucketed.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("__nsb"))
    val srcN = bucketed.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    // full #sources × K grid so absent cells participate at the ε floor
    val grid = srcN
      .crossJoin(broadcast(bucketed.sparkSession.range(nBuckets)
        .select(col("id").cast("int").as("bucket"))))
      .join(srcB, Seq("source", "bucket"), "left")
      .join(broadcast(globalB), Seq("bucket"), "left")
      .select(col("source"), col("n_docs"),
        greatest(coalesce(col("__nsb"), lit(0L)).cast("double") /
          col("n_docs"), lit(eps)).as("__p"),
        greatest(coalesce(col("__nb"), lit(0L)).cast("double") /
          nTotal.toDouble, lit(eps)).as("__q"))
    grid
      .select(col("source"), col("n_docs"),
        round((col("__p") - col("__q")) * log(col("__p") / col("__q")), 9)
          .cast("decimal(28,9)").as("__t"))
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        round(sum(col("__t")).cast("double"), 6).as("psi"))
  }
}

/** Word n-gram shingles, shared by fingerprinting and MinHash dedup. */
object Shingles {

  /** ALL n-gram strings of a doc (with multiplicity), positions
    * 0 .. size−n; empty when the doc is shorter than n tokens.
    *
    * Construction is a fold of n−1 `zip_with` passes over SHIFTED
    * SLICES of the token array — each pass is one O(len) interpreted
    * lambda over pre-sliced arrays. The obvious alternative
    * (`transform(sequence(0, len−n), i => concat_ws(slice(toks, i+1,
    * n))))`) evaluates an O(n) slice + array allocation inside the
    * per-position lambda and measured 8× slower on the fixture corpus
    * (3.2 s vs 0.4 s for the 265k-gram explode at sf0.1) — this
    * construction is the first UNCACHED pass every dedup/novelty
    * operator pays, so it is the one to keep cheap.
    */
  def grams(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val m = size(toks) - (n - 1) // gram count when >= 1
    val joined = (1 until n).foldLeft(slice(toks, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(1 + j), m),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) >= n, joined).otherwise(array().cast("array<string>"))
  }

  /** DISTINCT n-gram shingle set (the dedup-family contract). */
  def apply(text: Column, n: Int): Column = array_distinct(grams(text, n))
}
