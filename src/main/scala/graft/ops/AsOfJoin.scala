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
  * Semantics:
  *  - the payload is carried as ONE struct, so the attached values always
  *    come from a single right row (per-column `last` would stitch
  *    together a row that never existed whenever a payload field is null);
  *  - a right row at exactly leftTime matches (right sorts before left at
  *    equal timestamps);
  *  - ties among right rows at the same (keys, time) break
  *    deterministically by the packed payload struct's ordering (max
  *    wins).
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
    val leftExtras = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == timeCol)
    val payloadStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))

    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select((keys ++ Seq(timeCol, "__side")).map(col) ++
        leftExtras.map(col) :+
        lit(null).cast(payloadStructType).as("__p"): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .select((keys ++ Seq(timeCol, "__side")).map(col) ++
        leftExtras.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p"): _*)

    // __p in the sort order makes right-row ties deterministic (max
    // payload struct wins); left rows (__p null) sort before right rows
    // with equal (time, side) never happen since sides differ.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select((keys ++ Seq(timeCol)).map(col) ++ leftExtras.map(col) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
