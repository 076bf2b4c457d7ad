package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mixture interleaving — the curriculum/mixture
  * scheduler of a training-data pipeline: emit the corpus in ONE global
  * order where domain d's documents appear at a rate proportional to
  * its integer weight w_d (stride scheduling: the i-th doc of domain d
  * sits at virtual time (2i−1)/(2w_d)), so a loader that streams the
  * output front-to-back consumes the target mix at every prefix.
  *
  * The global sequence number is computed CLOSED-FORM, not with a
  * global window: seq(d,i) = 1 + Σ_e |{j : key_{e,j} < key_{d,i}}| +
  * (rank ties), where the per-domain counts are O(1) integer formulas.
  * All comparisons are exact integer arithmetic on (2i−1)·w cross
  * products — no floating-point key ever exists, so the order is
  * bit-reproducible in any engine.
  *
  * 100 TB shape: one keyed window per domain for in-domain positions
  * (partitioned by domain — no global ordering bottleneck), one
  * O(domains) aggregate broadcast back as a cross join (fan-out =
  * number of domains, a few hundred at web scale), one map-side-
  * combining re-aggregation. Writing the curriculum is then an
  * `orderBy(seq)` range-sort — fully parallel — or feeds
  * [[Sharding.writeShards]] with seq-range shards.
  */
object Curriculum {

  /** (seq, domainCol, idCol): seq is the 1-based global stride-schedule
    * position; weights default to `defaultW` for unlisted domains; ties
    * (identical virtual times, the norm under equal weights) break by
    * domain-name rank. `seq` is always a permutation of 1..N.
    *
    * Arithmetic envelope: the cross products are (2i−1)·w in Long —
    * exact while max-domain-size × max-weight < 2⁶² (≈4.6e18; a
    * trillion-doc domain with weight 10⁶ still fits), far past any
    * real mixture table.
    */
  def interleave(df: DataFrame, idCol: String, domainCol: String,
      weights: Map[String, Int], defaultW: Int = 1): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultW > 0,
      "mixture weights must be positive integers")
    val pos = Staged(df
      .select(col(domainCol).as("__d"), col(idCol).as("__id"))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col("__d")).orderBy(col("__id"))).cast("long")))
    // O(domains) table: counts, weights, tie-rank by domain name
    val doms = pos.groupBy(col("__d")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", weights.foldLeft(lit(defaultW)) { case (acc, (k, v)) =>
        when(col("__d") === k, lit(v)).otherwise(acc)
      }.cast("long"))
      .withColumn("__rk", row_number().over(Window.orderBy(col("__d"))))
      .select(col("__d").as("__e"), col("__n").as("__ne"),
        col("__w").as("__we"), col("__rk").as("__rke"))
    // each doc's own (w_d, rank_d) comes off the same broadcast table
    val withW = pos.join(broadcast(doms.select(col("__e").as("__d"),
      col("__we").as("__wd"), col("__rke").as("__rkd"))), "__d")
    // strict-before count per other-domain e:
    //   |{j ≤ n_e : (2j−1)·w_d < (2i−1)·w_e}| = min(n_e, (x+y−1) div 2y),
    //   x = (2i−1)·w_e, y = w_d  (for e = d this is exactly i−1)
    // tie: key equal ⟺ y | x with x/y odd; counts iff e ranks before d
    withW.crossJoin(broadcast(doms))
      .withColumn("__x", (lit(2) * col("__i") - 1) * col("__we"))
      .withColumn("__before", expr(
        """least(__ne, (__x + __wd - 1) div (2 * __wd)) +
           (case when __rke < __rkd and __x % __wd = 0
                  and (__x div __wd) % 2 = 1
                  and ((__x div __wd) + 1) div 2 <= __ne
             then 1 else 0 end)"""))
      .groupBy(col("__d"), col("__id"))
      .agg((sum(col("__before")) + 1L).as("seq"))
      .select(col("seq"), col("__d").as(domainCol), col("__id").as(idCol))
  }
}
