package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scale-safe exact quantiles (percentile_cont semantics: linear
  * interpolation at rank (n-1)*p).
  *
  * Spark's built-in `percentile` / `median` are ImperativeAggregates that
  * buffer every value of the group in a single aggregation buffer
  * (ObjectHashAggregate) — fine at sf0.1, OOM on one task at 100 TB when
  * a group (or, for a global percentile, the whole column) has billions
  * of rows. This helper computes the *same exact value* with bounded
  * state everywhere:
  *
  *  1. histogram pass — `groupBy(keys, value).count()`: O(1) agg state
  *     per distinct value; shuffle volume is O(distinct values), which
  *     for on-grid data (prices on the cent grid) is bounded by the
  *     value DOMAIN, not by row count;
  *  2. rank pass — a running sum over the per-group value-sorted
  *     histogram (WindowExec spills; partition size = distinct values,
  *     again domain-bounded), then one O(distinct) aggregation picks the
  *     bracketing values for each fraction and interpolates.
  *
  * Oracle parity: [[oracleSql]] generates DuckDB SQL that replays the
  * identical two-pass math — same histogram, same running sum, same
  * double expression `lo + d*(hi-lo)` with d = (n-1)*p - floor((n-1)*p).
  * Every floating step is a single non-fused IEEE op on both engines
  * (Spark codegen emits plain Java arithmetic, which may not contract to
  * FMA; DuckDB executes one vectorized op per operator), so results are
  * bit-identical without any approximation tolerance.
  */
object Quantiles {

  /** Exact quantiles of `valueCol` per `keys` group (global when `keys`
    * is empty). Returns one row per group: keys ++ one double column per
    * (name, fraction) ++ `n` (the group's non-null value count).
    *
    * Empty-input contract: nulls are filtered before the histogram, so
    * with NO non-null values a GROUPED call returns an empty frame (no
    * group exists) while a GLOBAL call (empty `keys`) returns the usual
    * single aggregate row with NULL quantiles and NULL n — callers
    * reading doubles out of that row must null-check explicitly.
    *
    * Scale note on the global (no-keys) case: the running sum flows
    * through ONE window partition, but over the HISTOGRAM — O(distinct
    * grid values) rows, a constant of the value domain (a full price
    * domain at cent granularity is ~10^7 rows: one spillable sorted
    * pass), never O(input rows). For an UNBOUNDED value domain (raw
    * doubles), use [[exactBanded]]: it pre-bands the histogram and
    * prefix-sums per-band totals, so no single window partition ever
    * sees O(distinct values) rows.
    */
  def exact(df: DataFrame, keys: Seq[String], valueCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    val kcols = keys.map(col)
    val v = col(valueCol)
    val hist = df.where(v.isNotNull)
      .groupBy((kcols :+ v): _*)
      .agg(count(lit(1)).as("__c"))
    // Both windows share one partitioning → one exchange; the ordered
    // frame is a streaming running sum, the unordered one a whole-
    // partition total. Partition size = distinct values (domain-bounded).
    val wOrd = Window.partitionBy(kcols: _*).orderBy(v)
    val wAll = Window.partitionBy(kcols: _*)
    val ranked = hist
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    interpolate(ranked, kcols, v, fractions)
  }

  /** Shared final pass of [[exact]] and [[exactBanded]]: rows carrying
    * (__cum = 0-indexed-exclusive running count, __n = group total) →
    * one output row per group with the interpolated quantiles. The
    * agg + interpolation expressions are byte-identical between the
    * two entry points, so both share one oracle replay ([[oracleSql]]).
    */
  private def interpolate(ranked: DataFrame, kcols: Seq[Column],
      v: Column, fractions: Seq[(String, Double)]): DataFrame = {
    val aggs = fractions.flatMap { case (nm, p) =>
      val rp = (col("__n") - 1).cast(DoubleType) * lit(p)
      val kLo = floor(rp) // LongType in Spark; numeric compare below
      val kHi = ceil(rp)
      Seq(
        // d is constant within the group (function of n only)
        max(rp - kLo).as(s"__d_$nm"),
        // value at 0-indexed rank k = first value whose cum-count > k
        min(when(col("__cum") > kLo, v)).as(s"__lo_$nm"),
        min(when(col("__cum") > kHi, v)).as(s"__hi_$nm"))
    }
    val grouped = ranked.groupBy(kcols: _*)
      .agg(max(col("__n")).as("n"), aggs: _*)
    val out: Seq[Column] = kcols ++ fractions.map { case (nm, _) =>
      (col(s"__lo_$nm") +
        col(s"__d_$nm") * (col(s"__hi_$nm") - col(s"__lo_$nm"))).as(nm)
    } :+ col("n")
    grouped.select(out: _*)
  }

  /** [[exact]] for UNBOUNDED value domains (raw doubles: cosine scores,
    * log-probs, price products) — same exact percentile_cont result,
    * but the rank pass never puts O(distinct values) rows through one
    * window partition, which is what [[exact]]'s global form does when
    * the domain isn't grid-bounded:
    *
    *  1. histogram pass — as in [[exact]] (distributed, O(1) state);
    *  2. band totals — each value's coarse band `floor(v / bandWidth)`
    *     (monotone in v, so band order = value order); per-group band
    *     counts aggregate distributedly to O(#bands) rows;
    *  3. band rank pass — the running sum over the per-group
    *     band-sorted totals: the only group-wide ordered window, over
    *     O(#bands) rows instead of O(distinct values);
    *  4. refinement — only the ≤ 2·|fractions| bands whose count range
    *     brackets a target rank rejoin the histogram (equi-join on the
    *     band key); the in-band running sum windows over ONE band's
    *     rows, offset by the band's prefix count, and the shared
    *     interpolation pass reads the bracketing values off it.
    *
    * Choose `bandWidth` so #bands ≈ sqrt(distinct values) or simply
    * domain-range/10^4: both window partition sizes (#bands, rows per
    * band) then stay far below O(N). Band ids live in a long —
    * |value| must stay under bandWidth·2^63.
    *
    * Same oracle as [[exact]]: banding changes the execution shape,
    * not the value — lo/hi are data values and d/interpolation are the
    * shared expressions — so [[oracleSql]] replays this result
    * bit-exactly. Empty-input contract matches [[exact]] too.
    */
  def exactBanded(df: DataFrame, keys: Seq[String], valueCol: String,
      fractions: Seq[(String, Double)], bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val kcols = keys.map(col)
    val v = col(valueCol)
    // staged: the histogram feeds BOTH the band-total rank scan and the
    // refinement join — without it the full corpus aggregates twice
    // (house pattern; released by the caller's Staged.release)
    val hist = Staged(df.where(v.isNotNull)
      .groupBy((kcols :+ v): _*)
      .agg(count(lit(1)).as("__c"))
      // NaN sorts ABOVE every double in Spark's ordering (exact's rank
      // window relies on that); floor(NaN/w) would cast to band 0 and
      // misplace it first — pin NaN to the top band instead so banded
      // and unbanded agree on domains where NaN arises (0/0 cosines)
      .withColumn("__band", when(isnan(v), lit(Long.MaxValue))
        .otherwise(floor(v / lit(bandWidth)))))
    val bands = hist.groupBy((kcols :+ col("__band")): _*)
      .agg(sum(col("__c")).as("__bc"))
    val wOrd = Window.partitionBy(kcols: _*).orderBy(col("__band"))
    val wAll = Window.partitionBy(kcols: _*)
    val ranked = bands
      .withColumn("__bcum", sum(col("__bc")).over(wOrd))
      .withColumn("__n", sum(col("__bc")).over(wAll))
    // a band is refined iff some target rank k (0-indexed) falls inside
    // its count range (__bcum - __bc, __bcum]: the value at rank k =
    // first value with cum > k lives exactly there
    val needed = fractions
      .flatMap { case (_, p) =>
        val rp = (col("__n") - 1).cast(DoubleType) * lit(p)
        Seq(floor(rp), ceil(rp))
      }
      .map(rk => col("__bcum") > rk && col("__bcum") - col("__bc") <= rk)
      .reduce(_ || _)
    val selected = ranked.where(needed)
      .select((kcols :+ col("__band") :+
        (col("__bcum") - col("__bc")).as("__before") :+ col("__n")): _*)
    // values in unselected bands can't be bracketing values, and their
    // absence never breaks `min(when(cum > k, v))`: every surviving row
    // of an earlier band has cum ≤ its band's __bcum ≤ k
    val refined = hist
      .join(selected, keys :+ "__band")
      .withColumn("__cum",
        col("__before") + sum(col("__c")).over(
          Window.partitionBy((kcols :+ col("__band")): _*).orderBy(v)))
    interpolate(refined, kcols, v, fractions)
  }

  /** DuckDB replay of [[exact]] — same histogram, running sum, bracket
    * selection, and interpolation expression, so the hash compare is
    * exact. Fraction literals go through CAST('<p>' AS DOUBLE): a
    * correctly-rounded string→double parse, identical to Spark's
    * `lit(p)`.
    */
  def oracleSql(table: String, keys: Seq[String], valueCol: String,
      fractions: Seq[(String, Double)]): String = {
    val kList = keys.mkString(", ")
    val kPrefix = if (keys.isEmpty) "" else s"$kList, "
    val partBy = if (keys.isEmpty) "" else s"PARTITION BY $kList "
    val groupByKeys = if (keys.isEmpty) "" else s"GROUP BY $kList"
    def d(p: Double) = {
      val rp = s"(CAST(__n - 1 AS DOUBLE) * CAST('$p' AS DOUBLE))"
      s"($rp - floor($rp))"
    }
    val aggCols = fractions.map { case (nm, p) =>
      s"""max(${d(p)}) AS __d_$nm,
         |      min(CASE WHEN __cum > floor((CAST(__n - 1 AS DOUBLE) * CAST('$p' AS DOUBLE))) THEN __v END) AS __lo_$nm,
         |      min(CASE WHEN __cum > ceil((CAST(__n - 1 AS DOUBLE) * CAST('$p' AS DOUBLE))) THEN __v END) AS __hi_$nm""".stripMargin
    }.mkString(",\n      ")
    val outCols = fractions.map { case (nm, _) =>
      s"__lo_$nm + __d_$nm * (__hi_$nm - __lo_$nm) AS $nm"
    }.mkString(",\n      ")
    s"""WITH __h AS (
       |    SELECT $kPrefix$valueCol AS __v, count(*) AS __c
       |    FROM $table WHERE $valueCol IS NOT NULL
       |    GROUP BY $kPrefix$valueCol),
       |  __r AS (
       |    SELECT *,
       |      sum(__c) OVER (${partBy}ORDER BY __v) AS __cum,
       |      sum(__c) OVER (${partBy.trim}) AS __n
       |    FROM __h),
       |  __a AS (
       |    SELECT ${kPrefix}CAST(max(__n) AS BIGINT) AS n,
       |      $aggCols
       |    FROM __r $groupByKeys)
       |  SELECT $kPrefix$outCols, n FROM __a""".stripMargin
  }
}
