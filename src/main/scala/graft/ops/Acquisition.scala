package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-source acquisition review table — ONE frame joining the
  * five per-source verdicts the registry already computes separately
  * (x69 novelty, x71 OOV, x74 fertility, x84 dup rate, x62's quality
  * score aggregated as in x73), because the renew/cut decision they
  * exist for reads ONE table per source, not five reports:
  *
  *   - `novelty`   — first-occurrence 3-gram fraction: near zero ⇒ the
  *     source re-crawls what the corpus already holds (content side);
  *   - `dup_rate`  — fraction the near-dup pass SUPPRESSES: the same
  *     signal read from the dedup verdicts themselves;
  *   - `oov_rate`  — micro-averaged OOV against the corpus top-V cut:
  *     what a WORD vocabulary would miss;
  *   - `fertility` — subword tokens per word under the committed BPE:
  *     what the source costs in context-window slots;
  *   - `mean_quality` — the x07 heuristic score, exact decimal mean.
  *
  * No new math: each signal is the registered operator's own staged
  * frame, joined on the source key. Scale shape: five independent
  * source-keyed aggregations (the heaviest, dup_rate, is the verified
  * LSH+CC path with its broadcast suppressed set) joined on a
  * #sources-sized key — the joins are trivia next to the signals.
  * Sources whose docs have no tokens carry NULL token-derived columns
  * (left joins from the all-docs quality frame — a silent inner-join
  * drop would hide exactly the degenerate source a review must see).
  */
object Acquisition {

  def sourceHealth(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, fit: Bpe.Fit, vocabSize: Int = 20,
      dupThreshold: Double = 0.8,
      klFrom: Option[DataFrame] = None): DataFrame = {
    val ids = docs.select(col(idCol), col(srcCol))
    // x62/x73's quality face: per-source exact decimal mean over the
    // per-doc 1e-6-rounded score (partition-order independent)
    val quality = docs
      .select(col(srcCol),
        round(TextAnalysis.qualityScore(col(textCol)), 6).as("__q"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("__q").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_quality"))
    // x69: micro-averaged first-occurrence 3-gram fraction
    val novelty = TextAnalysis.ngramNovelty(docs, idCol, textCol, n = 3)
      .join(ids, idCol)
      .groupBy(col(srcCol))
      .agg(round(sum(col("n_novel")).cast("double") /
        sum(col("n_grams")), 6).as("novelty"))
    // x71: micro-averaged OOV against the corpus's own top-V cut
    val oov = TextAnalysis.vocabCoverage(docs, idCol, textCol, vocabSize)
      .join(ids, idCol)
      .groupBy(col(srcCol))
      .agg(round(sum(col("n_oov")).cast("double") /
        sum(col("n_tokens")), 6).as("oov_rate"))
    // x74's fertility signal via the applyMerges EXTENSION path
    // (Bpe.fertilityByMerges), not the fit-word-table inner join: this
    // table prices corpora the committed tokenizer has NOT seen (a
    // day-2 batch, a candidate source), and the join face silently
    // drops exactly the novel words that make such a source expensive
    // — biasing fertility low (or NULL) for the sources the renew/cut
    // decision most needs priced. For the fit corpus itself the two
    // faces are provably identical (applyMerges reproduces the fit's
    // own segmentation), so the registered oracle replay is unchanged.
    val fert = Bpe.fertilityByMerges(docs.select(col(srcCol), col(textCol)),
        textCol, srcCol, fit.merges.map(m => (m.left, m.right)))
      .select(col(srcCol), col("fertility"))
    // x84: keep-reps suppression verdicts sliced per source
    val clusters = Dedup.connectedComponents(
      Dedup.minHashLsh(docs, idCol, textCol, threshold = dupThreshold))
    val dup = ids
      .join(broadcast(clusters.where(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id").as("__dead"), lit(1).as("__supp"))),
        col(idCol) === col("__dead"), "left")
      .groupBy(col(srcCol))
      .agg(round(count(col("__supp")).cast("double") /
        count(lit(1)), 6).as("dup_rate"))
    val base = quality
      .join(novelty, Seq(srcCol), "left")
      .join(oov, Seq(srcCol), "left")
      .join(fert, Seq(srcCol), "left")
      .join(dup, Seq(srcCol), "left")
    // the DISTRIBUTIONAL drift column (r19, the x91 axis folded into
    // the health row): per-source KL vs a FROZEN unigram table under
    // the shared-support renormalization rule — the failure mode every
    // other column misses (known words in the WRONG proportions reads
    // 0-OOV, mid-novelty, healthy quality). Optional because the
    // verdict needs a committed reference distribution; callers
    // without one (the self-contained x85 table) keep the exact
    // registered schema.
    klFrom match {
      case None => base
      case Some(frozen) =>
        base.join(
          TextAnalysis.perSourceSharedKl(
              docs.select(col(srcCol), col(textCol)), textCol, srcCol,
              frozen)
            .select(col("source").as(srcCol), col("kl")),
          Seq(srcCol), "left")
    }
  }

  /** ACT on the health table: derive a target mix FROM the per-source
    * verdicts and resample the corpus to it — the acquisition verdict
    * feeding the mixing operators instead of a hand-written rate map.
    * The gate zeroes out sources the table indicts: novelty below
    * `noveltyFloorFrac` of the corpus's doc-weighted mean novelty (a
    * RELATIVE floor — absolute novelty falls with corpus size, a
    * re-crawler reads ~0 at every scale), or dup_rate above
    * `dupCeiling` (the keep-reps rule already suppresses a re-crawl's
    * rows; a source losing most of its mass to suppression is billed
    * acquisition for nothing). A source whose novelty is NULL
    * (tokenless) cannot be certified and is cut. Survivors are
    * temperature-flattened ([[Sampling.temperatureSample]], the
    * published n^alpha recipe) so the verdict composes with the same
    * downsampling-only gate every mixing operator shares.
    *
    * Engine-portable gate arithmetic: per-source novelty is a 6-decimal
    * value, so the doc-weighted mean rides EXACT integer sums of
    * micro-units (no order-dependent float accumulation), one
    * correctly-rounded IEEE division, and a half-up 6-decimal rounding
    * — a DuckDB oracle replays the comparison bit-for-bit.
    *
    * Scale shape: the health table is #sources-sized (bounded driver
    * collect — the decision is a per-source scalar read); the resample
    * stays a row-local hash gate on the scan.
    */
  /** The gate's verdict alone: the sources a health table indicts
    * (relative novelty floor + dup ceiling — [[healthGatedMixFrom]]'s
    * exact micro-unit arithmetic, extracted so the day-N acquisition
    * gate and the mix read ONE rule). Returns (healthy, indicted) by
    * source key. A NULL-novelty source cannot be certified and is
    * indicted; the floor is the doc-weighted mean novelty scaled by
    * `noveltyFloorFrac`, in exact integer micro-units.
    */
  def healthVerdicts(health: DataFrame, srcCol: String,
      noveltyFloorFrac: Double = 0.5,
      dupCeiling: Double = 0.5): (Seq[String], Seq[String]) = {
    val rows = health
      .select(col(srcCol).cast("string"), col("n_docs").cast("long"),
        col("novelty").cast("double"), col("dup_rate").cast("double"))
      .collect()
    require(rows.nonEmpty, "health verdict over an empty health table")
    // doc-weighted mean novelty in exact micro-units: novelty is
    // round(·, 6), so round(novelty·1e6) is an exact integer per source
    val scored = rows.filter(!_.isNullAt(2))
    val sumN = scored.map(_.getLong(1)).sum
    val sumWNov = scored.map(r =>
      math.round(r.getDouble(2) * 1e6) * r.getLong(1)).sum
    require(sumN > 0, "health verdict: no source has a novelty verdict")
    val floorMicro = BigDecimal(noveltyFloorFrac * (sumWNov.toDouble / sumN))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val (healthy, indicted) = rows.partition { r =>
      !r.isNullAt(2) &&
        math.round(r.getDouble(2) * 1e6) >= floorMicro &&
        (r.isNullAt(3) || r.getDouble(3) <= dupCeiling)
    }
    (healthy.map(_.getString(0)).toSeq, indicted.map(_.getString(0)).toSeq)
  }

  def healthGatedMixFrom(health: DataFrame, docs: DataFrame, idCol: String,
      srcCol: String, alpha: Double = 0.5, noveltyFloorFrac: Double = 0.5,
      dupCeiling: Double = 0.5): DataFrame = {
    val (healthy, _) = healthVerdicts(health, srcCol, noveltyFloorFrac,
      dupCeiling)
    require(healthy.nonEmpty,
      s"health gate cut every source (floor frac $noveltyFloorFrac, " +
        s"dup ceiling $dupCeiling) — nothing left to mix")
    Sampling.temperatureSample(
      docs.where(col(srcCol).isInCollection(healthy)), idCol, srcCol, alpha)
  }

  /** [[sourceHealth]] + [[healthGatedMixFrom]] in one call — compute
    * the verdict table, gate on it, resample to the temperature mix.
    */
  def healthGatedMix(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, fit: Bpe.Fit, alpha: Double = 0.5,
      noveltyFloorFrac: Double = 0.5, dupCeiling: Double = 0.5,
      vocabSize: Int = 20, dupThreshold: Double = 0.8): DataFrame =
    healthGatedMixFrom(
      Staged(sourceHealth(docs, idCol, textCol, srcCol, fit, vocabSize,
        dupThreshold)),
      docs, idCol, srcCol, alpha, noveltyFloorFrac, dupCeiling)
}
