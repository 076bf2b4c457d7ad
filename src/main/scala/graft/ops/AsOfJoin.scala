package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * `rightTime <= leftTime` (within the same partition keys).
  *
  * Implementation is the scalable union+window formulation rather than a
  * pairwise join: tag both sides, union them, and run one
  * `last(_, ignoreNulls)` window per key ordered by (time, side). Cost
  * is a single shuffle on the partition keys — no row multiplication,
  * no range-join explosion — which is the formulation that survives
  * 100 TB (a pairwise time-condition join degenerates to
  * broadcast-nested-loop).
  *
  * Tie rule: a right row at exactly leftTime matches (right sorts before
  * left at equal timestamps); ties among right rows break by the last
  * payload column's order position.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param timeCol    event-time column name present on both sides
    * @param keys       equality partition keys present on both sides
    * @param payload    right-side columns to attach (prefixed `asof_`)
    */
  def apply(left: DataFrame, right: DataFrame, timeCol: String,
      keys: Seq[String], payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // union-compatible shape: left carries null payload, right carries
    // null left-extras
    val leftExtras = leftCols.filterNot(c => keys.contains(c) || c == timeCol)
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select((keys ++ Seq(timeCol, "__side")).map(col) ++
        leftExtras.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .select((keys ++ Seq(timeCol, "__side")).map(col) ++
        leftExtras.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = taggedLeft.unionByName(taggedRight)
      .select(Seq(col("*")) ++
        payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c")): _*)
      .where(col("__side") === 1)
      .drop("__side")
      .drop(payload.map(c => s"__p_$c"): _*)
    joined
  }
}
