package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation: salted two-stage aggregation.
  *
  * A groupBy on a low-cardinality / skewed key concentrates each key's
  * rows on one reducer. Salting splits every key into `nSalts`
  * sub-groups for the first (partial) aggregation, then combines the
  * partials in a second, tiny aggregation — reducer load is bounded by
  * rows/nSalts instead of the hottest key's count.
  *
  * (Spark's map-side partial aggregation often covers this for algebraic
  * aggregates; explicit salting is the pattern for when the partial
  * layer can't absorb the skew — exact distincts, collect-style
  * aggregates, or AQE-resistant key distributions.)
  *
  * Decimal-exact sums keep the result identical to the unsalted plan.
  */
object Skew {

  /** Exact sum + count per key, computed through a salted first stage.
    * `saltSource` must be a stable per-row column (an id); salt =
    * hash(saltSource) % nSalts keeps the split deterministic.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltSource: Column, nSalts: Int = 32, scale: Int = 2): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts.toLong)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol).cast(DecimalType(18, scale))).as("__psum"),
        count(lit(1)).as("__pn"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pn")).cast("long").as("n"))
  }
}
