package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-space label analytics — the health check run before
  * trusting labels (or cluster assignments) for stratified sampling,
  * dedup gating, or eval splits: how tight is each label's cluster
  * (mean squared radius) and how far does its centroid sit from the
  * corpus centroid (the between/within picture behind a Fisher score).
  *
  * Everything reduces to per-(label, component) moment sums
  * (n, Σv, Σv²) — ONE map-side-combining aggregation over the
  * posexploded vectors; radii and centroid gaps are closed-form in
  * those moments (`Σ(v−μ)² = Σv² − (Σv)²/n`), so no vector ever meets
  * another vector and no second corpus pass exists. Key space =
  * labels × dims.
  *
  * Determinism: components land on a 10⁻⁷ decimal grid (Decimal(10,7)
  * — products keep scale 14 exactly, sums stay inside precision 38);
  * the per-component double terms are rounded onto a 10⁻⁹ grid and
  * decimal-summed across components, so per-label totals are
  * partition-order-independent and oracle-reproducible.
  */
object EmbedStats {

  /** Per label: (label, n_vecs, mean_sq_radius, centroid_gap_sq) —
    * avg ‖x−μ_label‖² and ‖μ_label−μ_corpus‖², rounded to 10⁻⁶.
    */
  def labelSeparation(df: DataFrame, labelCol: String, vecCol: String,
      roundTo: Int = 6): DataFrame = {
    val f = df
      .select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .select(col("label"), col("pos"),
        round(col("col").cast("double"), 7).cast(DecimalType(10, 7)).as("v"))
    val lp = f.groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
    val gp = lp.groupBy(col("pos"))
      .agg(sum(col("s1")).as("gs1"), sum(col("n")).as("gn"))
    val terms = lp.join(gp, "pos")
      .select(col("label"), col("n"),
        round(col("s2").cast("double") / col("n") -
          (col("s1").cast("double") / col("n")) *
          (col("s1").cast("double") / col("n")), 9)
          .cast(DecimalType(16, 9)).as("msr"),
        round((col("s1").cast("double") / col("n") -
            col("gs1").cast("double") / col("gn")) *
          (col("s1").cast("double") / col("n") -
            col("gs1").cast("double") / col("gn")), 9)
          .cast(DecimalType(16, 9)).as("gap"))
    terms.groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        round(sum(col("msr")).cast("double"), roundTo).as("mean_sq_radius"),
        round(sum(col("gap")).cast("double"), roundTo).as("centroid_gap_sq"))
  }
}
