package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * pick raw-corpus documents that look like a (small, high-quality)
  * target corpus, using hashed n-gram bag-of-words models of both.
  *
  * Per document d with hashed-gram counts c_f:
  * `ilw(d) = Σ_f c_f · (ln p_f − ln q_f)` where p/q are the
  * add-1-smoothed bucket distributions of the target/raw corpus, and
  * selection is Gumbel-top-k on `ilw` (sampling ∝ exp(ilw) made
  * deterministic by deriving the Gumbel noise from md5(doc id)).
  *
  * 100 TB shape: the model side is O(buckets) however big either
  * corpus is — one map-side-combining aggregation per corpus collapses
  * all grams to ≤ `buckets` rows, and the resulting log-ratio table
  * broadcasts into the scoring join. The corpus itself is touched by
  * exactly two shuffles (per-doc (id, bucket) counts, then the per-doc
  * sum), both keyed and partial-aggregated; there is no corpus-corpus
  * join anywhere. The target corpus (typically 1e3–1e6× smaller than
  * raw) is scanned once.
  *
  * Determinism: per-bucket log-ratios are rounded onto a 10⁻⁹ grid and
  * summed in Decimal(28,9) (the [[LangModel]] discipline), so `ilw` is
  * partition-order-independent and reproducible bit-for-bit in the
  * DuckDB oracle; the md5-derived Gumbel keys are exact rationals fed
  * through ln twice, with the final score rounded to 10⁻⁶ before
  * ranking (rank ties broken by doc id — a total order).
  */
object Dsir {

  /** Unigrams ++ bigrams (space-joined), NOT distinct: DSIR models use
    * occurrence counts. Same token rule as every oracle
    * ([[TextAnalysis.tokens]]).
    */
  def grams(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    val n1 = greatest(size(t) - 1, lit(0))
    concat(t, zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat_ws(" ", a, b)))
  }

  /** Feature hash: first 16 bits of md5 mod `buckets` — portable to
    * the oracle (`CAST('0x'||substr(md5(g),1,4) AS INT) % B`).
    */
  def bucketOf(g: Column, buckets: Int): Column =
    (conv(substring(md5(g), 1, 4), 16, 10).cast("int") % buckets).as("bucket")

  private def bucketCounts(df: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    df.select(explode(grams(col(textCol))).as("g"))
      .groupBy(bucketOf(col("g"), buckets))
      .agg(count(lit(1)).as("n"))

  /** Model from pre-aggregated bucket counts: per-bucket
    * `round(ln p_f − ln q_f, 9)` with add-1 smoothing over `buckets`
    * cells. Every bucket any raw doc can hit appears (q's support
    * covers raw by construction; target counts are coalesced to 0).
    * The corpus totals fall out of the count tables — no extra scan.
    */
  private def logRatiosFromCounts(qc: DataFrame, pc: DataFrame,
      buckets: Int): DataFrame = {
    val rTot = qc.agg(sum(col("n"))).head().getLong(0).toDouble
    val tTot = pc.agg(coalesce(sum(col("np")), lit(0L)))
      .head().getLong(0).toDouble
    qc.join(pc, Seq("bucket"), "left")
      .select(col("bucket"),
        round(log((coalesce(col("np"), lit(0L)).cast("double") + 1.0) /
            lit(tTot + buckets)) -
          log((col("n").cast("double") + 1.0) / lit(rTot + buckets)),
          // Decimal(12,9), NOT (28,9): the c·lr product must keep
          // scale 9 exactly — two (28,9)s multiply past precision 38
          // and Spark silently drops the product to scale 6
          9).cast(DecimalType(12, 9)).as("lr"))
  }

  /** The O(buckets) log-ratio model on its own (standalone face of the
    * scoring pipeline). */
  def logRatios(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    logRatiosFromCounts(Staged(bucketCounts(raw, textCol, buckets)),
      bucketCounts(target, textCol, buckets).withColumnRenamed("n", "np"),
      buckets)

  /** Per-doc importance log-weights of the raw corpus toward the
    * target: (id, n_grams, ilw). Docs with zero grams get no row (no
    * evidence either way). The raw corpus is tokenized ONCE — the
    * staged (id, bucket) frame feeds both the q-model counts and the
    * per-doc scoring counts; the target is scanned once for its
    * bucket counts (its total falls out of them).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024, roundTo: Int = 6): DataFrame = {
    val rawB = Staged(raw
      .select(col(idCol).as("id"), explode(grams(col(textCol))).as("g"))
      .select(col("id"), bucketOf(col("g"), buckets)))
    val qc = rawB.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val pc = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("n", "np")
    val lr = logRatiosFromCounts(qc, pc, buckets)
    val perDoc = rawB.groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    perDoc.join(broadcast(lr), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_grams"),
        round(sum(col("c").cast(DecimalType(10, 0)) * col("lr"))
          .cast("double"), roundTo).as("ilw"))
      .withColumnRenamed("id", idCol)
  }

  // ---- persisted model: the operational shape. The target corpus and
  // the raw-crawl reference change rarely; batches arrive continuously.
  // Fit the O(buckets) log-ratio table once, commit it behind an _OK
  // marker, and every batch probe is one broadcast join with ZERO
  // model recomputation (the exact analogue of Decontam's bench index).

  private def fsOf(spark: org.apache.spark.sql.SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Persist the DSIR model at `path`: the `_OK` marker is deleted
    * FIRST, `lr/` (bucket → log-ratio decimal) written, `_OK`
    * re-created LAST (Hadoop-FS ops). Delete-first matters on a
    * REBUILD: overwriting `lr/` under a still-present old marker would
    * let the per-micro-batch [[scoreIndexed]] probes read a
    * committed-looking but half-rewritten model — with it, a crashed
    * build (first or rebuild) is simply "not ready" and re-runs.
    * `buckets` must match at probe time and is stored in the table
    * itself for the check.
    */
  def writeModel(raw: DataFrame, target: DataFrame, textCol: String,
      path: String, buckets: Int = 1024): Unit = {
    val spark = raw.sparkSession
    fsOf(spark, path).delete(
      new org.apache.hadoop.fs.Path(s"$path/_OK"), false): Unit
    logRatios(raw, target, textCol, buckets)
      .withColumn("buckets", lit(buckets))
      .repartition(1).write.mode("overwrite").parquet(s"$path/lr")
    fsOf(spark, path).create(
      new org.apache.hadoop.fs.Path(s"$path/_OK"), true).close()
  }

  def modelReady(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    fsOf(spark, path).exists(new org.apache.hadoop.fs.Path(s"$path/_OK"))

  /** Score a batch against a persisted model: same output contract as
    * [[importanceWeights]], pure function of (batch, committed model)
    * — safe to replay, usable from `foreachBatch`. One corpus-side
    * shuffle pair, one broadcast of the O(buckets) table. Batch grams
    * hashing outside the model's support (buckets no raw-corpus gram
    * ever hit) are outside q's domain and drop from both `n_grams`
    * and the score; scoring the fit corpus itself reproduces
    * [[importanceWeights]] exactly.
    */
  def scoreIndexed(docs: DataFrame, modelPath: String, idCol: String,
      textCol: String, roundTo: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    require(modelReady(spark, modelPath),
      s"no committed DSIR model at $modelPath (build with writeModel)")
    val lr = spark.read.parquet(s"$modelPath/lr")
    val bOpt = lr.select(max(col("buckets"))).head()
    if (bOpt.isNullAt(0)) // empty raw corpus: no q support, no scores
      return docs.select(col(idCol)).limit(0)
        .withColumn("n_grams", lit(0L)).withColumn("ilw", lit(0.0))
    val buckets = bOpt.getInt(0)
    val perDoc = docs
      .select(col(idCol).as("id"), explode(grams(col(textCol))).as("g"))
      .groupBy(col("id"), bucketOf(col("g"), buckets))
      .agg(count(lit(1)).as("c"))
    // inner join: a bucket absent from the model means no raw-corpus
    // gram ever hit it; smoothing gave it no q mass either — the model
    // is defined on q's support, as in importanceWeights
    perDoc.join(broadcast(lr.select(col("bucket"), col("lr"))), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_grams"),
        round(sum(col("c").cast(DecimalType(10, 0)) * col("lr"))
          .cast("double"), roundTo).as("ilw"))
      .withColumnRenamed("id", idCol)
  }

  /** Deterministic Gumbel key from the doc id: `g = −ln(−ln(u))` with
    * `u = (h + 0.5) / 2³²`, h the first 32 md5 bits of the id string —
    * exact-rational input, so both engines agree to the 10⁻⁶ grid.
    */
  def gumbelKey(id: Column): Column =
    -log(-log((conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0))

  /** Gumbel-top-k resampling: the k raw docs ranked by
    * `round(ilw + gumbel(id), 6)` (desc, id-tiebreak) — an exact
    * sample ∝ exp(ilw) with replayable noise. Output
    * (id, ilw, score, rk). At scale this is TakeOrderedAndProject over
    * the O(raw-docs) weight frame — no extra shuffle beyond
    * [[importanceWeights]].
    */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024): DataFrame = {
    val w = importanceWeights(raw, target, idCol, textCol, buckets)
    w.withColumn("score", round(col("ilw") + gumbelKey(col(idCol)), 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol))))
      .select(col(idCol), col("ilw"), col("score"), col("rk"))
  }
}
