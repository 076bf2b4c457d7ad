package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` is seed-stable only within one Spark version AND one
  * partitioning of the input — a re-partitioned 100 TB corpus samples a
  * DIFFERENT subset, which silently changes a training set between
  * runs. Hash-gating on a stable record id is reproducible anywhere:
  * the decision depends only on the id, so re-runs, re-partitions,
  * other engines (the DuckDB oracle computes the same md5), and
  * incremental appends all agree. It is also a consistent sampler:
  * the 5% sample is a subset of the 10% sample, so sample-size sweeps
  * don't reshuffle the data.
  *
  * Gate: first 16 bits of md5(id) < rate × 2¹⁶ — row-local expression,
  * no shuffle, codegen'd.
  */
object Sampling {

  /** The 16-bit integer threshold a rate maps to — shared with oracle
    * SQL so both engines compare against the identical literal.
    */
  def gateThreshold(rate: Double): Int = math.round(rate * 65536).toInt

  /** Sampling gate as a Column (16-bit hash threshold). */
  def hashGate(idCol: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("int") < gateThreshold(rate)
  }

  /** Deterministic Bernoulli-by-hash sample of ~rate of the rows. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.where(hashGate(col(idCol), rate))

  /** Stratified variant: a different rate per stratum value (absent
    * strata keep nothing). The rate table rides inline as a when-chain,
    * so this stays a scan-level filter — no join, no shuffle.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    val gate = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      when(col(strataCol) === stratum, hashGate(col(idCol), rate)).otherwise(acc)
    }
    df.where(gate)
  }

  /** Per-stratum keep rates that reshape a corpus toward a target mix
    * of relative weights (domain re-weighting for training data),
    * downsampling only — the output is the LARGEST corpus achieving
    * the exact mix: M = min_s(n_s / w_s), rate_s = w_s·M / n_s.
    * One tiny count aggregation collected to the driver (k strata).
    * Strata absent from `weights` get rate 0 (dropped).
    */
  def mixRates(df: DataFrame, strataCol: String,
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mix weights must be positive")
    val wSum = weights.values.sum
    val w = weights.view.mapValues(_ / wSum).toMap
    val counts = df.where(col(strataCol).isInCollection(w.keys.toSeq))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = w.keySet -- counts.keySet
    require(missing.isEmpty,
      s"mix weights reference empty/absent strata: $missing")
    val m = w.map { case (s, ws) => counts(s) / ws }.min
    // the argmin stratum computes ws*(n/ws)/n, which floating point can
    // round a hair ABOVE 1.0 — clamp, or hashGate's bounds check throws
    w.map { case (s, ws) => s -> math.min(1.0, ws * m / counts(s)) }
  }

  /** Resample to the target mix: [[mixRates]] + [[stratifiedHashSample]]. */
  def resampleToMix(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame =
    stratifiedHashSample(df, idCol, strataCol, mixRates(df, strataCol, weights))

  /** Per-stratum keep rates for TEMPERATURE-scaled mixture sampling —
    * the published multilingual/multi-domain recipe (sample source s
    * with probability ∝ n_s^α, α < 1 flattening the head so the
    * biggest crawl slice stops drowning the tail). Downsampling-only,
    * like [[mixRates]]: the output is the LARGEST corpus realizing the
    * exact n_s^α mix — w_s = n_s^α, M = min_t(n_t / w_t),
    * rate_s = w_s·M / n_s, so the argmin stratum (the SMALLEST source
    * under α < 1) keeps everything and every other source downsamples
    * to match.
    *
    * Engine-portable on purpose: the weights are deliberately left
    * UN-normalized (the normalizer algebraically cancels in
    * w_s·M / n_s), so no cross-stratum floating sum exists anywhere —
    * only sqrt/·/÷/min over per-stratum values, each a correctly
    * rounded IEEE-754 op a DuckDB oracle replays bit-identically from
    * the same integer counts. α = 0.5 routes through `math.sqrt`
    * (correctly rounded, same guarantee in every libm) rather than
    * `pow`, whose last-ulp behavior is library-specific.
    *
    * Scale shape: one k-row count aggregation collected to the driver
    * (k = #strata, bounded); the gate itself stays a row-local
    * scan-level filter via [[stratifiedHashSample]].
    */
  def temperatureRates(df: DataFrame, strataCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    // null strata are excluded like mixRates' explicit weight-key
    // filtering: a null stratum's count would otherwise enter the
    // argmin of n/w (deflating every real stratum's keep rate) while
    // its rows are silently dropped by stratifiedHashSample's
    // when-chain (col === null is never true) — the realized corpus
    // would be smaller than the documented mix AND skewed
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperature sampling over an empty corpus")
    def weight(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble)
      else if (alpha == 1.0) n.toDouble
      else math.pow(n.toDouble, alpha)
    val m = counts.values.map(n => n.toDouble / weight(n)).min
    counts.map { case (s, n) =>
      s -> math.min(1.0, weight(n) * m / n.toDouble)
    }
  }

  /** Temperature-resample in one call: [[temperatureRates]] +
    * [[stratifiedHashSample]].
    */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double): DataFrame =
    stratifiedHashSample(df, idCol, strataCol,
      temperatureRates(df, strataCol, alpha))

  /** [[temperatureRates]] with a per-row WEIGHT column as the mixing
    * unit instead of the row count — for a training mix the budget
    * that matters is TOKENS, not documents: a source of few long docs
    * and a source of many short ones can hold identical token mass,
    * yet doc-count temperature flattening treats the first as "small"
    * and keeps all of it. Here w_s = T_s^α over per-source weight
    * TOTALS T_s (exact integer sums), M = min_t(T_t / w_t),
    * rate_s = w_s·M / T_s; the gate stays the same row-level md5
    * keep-rate, so the EXPECTED kept token mass realizes the T_s^α
    * mix (doc-granular: individual long docs round the realization,
    * deterministically). Zero-total strata cannot be flattened
    * (0^α/0 is undefined) and are dropped from the rate table — the
    * same fate [[stratifiedHashSample]] gives absent strata. The
    * un-normalized-weight algebra and its engine portability are
    * [[temperatureRates]]'s, verbatim, over the weight totals.
    *
    * The weight column must be INTEGRAL (token counts, byte counts,
    * doc counts — the units a budget is billed in): the exact-integer-
    * sum claim above is what makes the rates engine-portable, and a
    * silent per-row floor of a fractional weight column would skew the
    * realized mix with no error. Callers holding fractional weights
    * scale them to an integer grid first (e.g. micro-units).
    */
  def weightedTemperatureRates(df: DataFrame, strataCol: String,
      weightCol: String, alpha: Double): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case t => throw new IllegalArgumentException(
        s"weight column $weightCol is ${t.simpleString}, expected an " +
          "integral type — a fractional weight would be silently floored " +
          "per row, skewing the mix; scale to an integer grid first")
    }
    val totals = df.where(col(strataCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(sum(col(weightCol).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0L)
    require(totals.nonEmpty,
      "weighted temperature sampling: no stratum has positive weight")
    def weight(t: Long): Double =
      if (alpha == 0.5) math.sqrt(t.toDouble)
      else if (alpha == 1.0) t.toDouble
      else math.pow(t.toDouble, alpha)
    val m = totals.values.map(t => t.toDouble / weight(t)).min
    totals.map { case (s, t) =>
      s -> math.min(1.0, weight(t) * m / t.toDouble)
    }
  }

  /** Weighted-temperature resample in one call:
    * [[weightedTemperatureRates]] + [[stratifiedHashSample]].
    */
  def weightedTemperatureSample(df: DataFrame, idCol: String,
      strataCol: String, weightCol: String, alpha: Double): DataFrame =
    stratifiedHashSample(df, idCol, strataCol,
      weightedTemperatureRates(df, strataCol, weightCol, alpha))

  /** Cluster-balanced deterministic sampling: keep the same FRACTION of
    * every cell (quota_c = ⌈fl(rate·n_c)⌉ where fl is the IEEE-double
    * product — both engines compute the identical value; for rates
    * whose true product lands exactly on an integer the double
    * rounding can admit one extra row, e.g. fl(0.07·100) = 7.0000…01 →
    * quota 8 — deterministic, engine-portable, and never zero for a
    * non-empty cell), choosing within a cell by md5-of-id rank — the
    * diversity-preserving subset export (semantic cells from the IVF
    * index, or any partition label): a global hash gate at the same
    * rate would eradicate small cells with probability (1−rate)^n,
    * exactly the rare-topic mass a curated training mix exists to keep.
    *
    * Deterministic and engine-portable: the in-cell order is
    * (md5(id), id) — a total order, so re-runs, re-partitions, and the
    * DuckDB oracle agree row-for-row — and CONSISTENT across rates:
    * the rank order is rate-independent, so the 25% export is a strict
    * subset of the 50% export.
    *
    * Scale shape: one hash shuffle on the cell key, then a per-cell
    * sort for rank — bounded by the largest cell, which the governed
    * IVF build already caps (hot-cell cap); nothing global, no
    * driver-side data.
    */
  def cellQuotaSample(df: DataFrame, idCol: String, cellCol: String,
      rate: Double): DataFrame = {
    require(rate > 0.0 && rate <= 1.0, s"rate must be in (0,1], got $rate")
    import org.apache.spark.sql.expressions.Window
    val byCell = Window.partitionBy(col(cellCol))
    val order = byCell.orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(order))
      .withColumn("__n", count(lit(1)).over(byCell))
      .where(col("__rn") <= ceil(lit(rate) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Deterministic EXACT-size global sample: the n rows with the
    * smallest (md5(id), id) — a rate gate keeps ~rate·N rows with
    * binomial jitter, but eval sets, human-review batches, and fixed
    * token budgets need exactly n. The (md5(id), id) key is a total
    * order, so the sample is reproducible across runs, partitionings,
    * and engines, and NESTS across sizes (the 1k sample is a strict
    * prefix of the 10k sample — grow a review batch without redrawing
    * it).
    *
    * Scale shape: orderBy(...).limit(n) plans TakeOrderedAndProject —
    * per-partition top-n heaps, one driver merge of #partitions·n
    * keys; never a global sort. Driver memory bounds n (a million-row
    * sample is fine; for corpus-fraction sampling use the hash gate).
    */
  def exactSample(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(n)
  }

  /** Leakage-safe train/test split: every near-dup CLUSTER lands
    * wholly on one side. Splitting docs independently leaks — a
    * training doc's near-duplicate sitting in the eval slice inflates
    * scores — so the deterministic md5 gate is applied to each doc's
    * cluster REPRESENTATIVE (its own id for singletons): the whole
    * family moves together, and the assignment stays a pure function
    * of corpus content (re-runs, re-partitions, and engines agree).
    *
    * Output: (idCol, rep, split∈{train,test}).
    *
    * Scale shape: clusters come from the verified MinHash-LSH +
    * connected-components path (bucketed candidate joins, never
    * all-pairs); the rep lookup is one equi-join against the clustered
    * docs only — typically a small fraction of the corpus — and the
    * gate itself is a row-local expression.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, testRate: Double): DataFrame = {
    val clusters = Dedup.connectedComponents(
      Dedup.minHashLsh(docs, idCol, textCol, threshold))
      .withColumnRenamed("doc_id", idCol)
    docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col(idCol)))
      .select(col(idCol), col("rep"),
        when(hashGate(col("rep"), testRate), lit("test"))
          .otherwise(lit("train")).as("split"))
  }
}
