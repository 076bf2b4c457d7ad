package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's Transform stage as composable `DataFrame => DataFrame`
  * steps (README.md:23 "Clean or reformat", :29 "Store ingestion
  * timestamps", :32-33 validation of invalid/empty payloads).
  *
  * Each step is a declarative projection/filter so the whole pipeline
  * fuses into one whole-stage-codegen'd pass over the data.
  */
object Transforms {

  type Stage = DataFrame => DataFrame

  /** T1 — parse a raw JSON string column into a typed struct.
    * PERMISSIVE mode: malformed input yields a null struct instead of
    * failing the job; pair with [[dropCorrupt]] or route to quarantine.
    */
  def parseJson(col: String, schema: DataType, out: String = "parsed"): Stage =
    df => df.withColumn(out,
      from_json(df.col(col), schema, Map("mode" -> "PERMISSIVE")))

  /** T2 — normalize string fields: trim + collapse internal whitespace. */
  def normalizeStrings(cols: String*): Stage = df =>
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, regexp_replace(trim(d.col(c)), "\\s+", " ")))

  /** T3 — drop rows where any of the given required fields is null. */
  def requireNonNull(cols: String*): Stage = df => df.na.drop(cols)

  /** T3b — fill defaults for optional numeric fields. */
  def fillDefaults(defaults: Map[String, Any]): Stage = df => df.na.fill(defaults)

  /** T4 — BSON-compat field sanitation (see [[Sanitize]]). */
  def sanitizeFields: Stage = Sanitize.apply

  /** T5 — flatten one level of a struct column into top-level columns. */
  def flattenStruct(col: String, prefix: String = ""): Stage = df => {
    val st = df.schema(col).dataType.asInstanceOf[StructType]
    val flat = st.fields.map(f => df.col(s"$col.${f.name}").as(prefix + f.name))
    df.select((df.columns.filter(_ != col).map(df.col) ++ flat).toSeq: _*)
  }

  /** T6 — stamp every record with load time (README.md:29). */
  def addIngestionTimestamp(col: String = "ingested_at"): Stage =
    df => df.withColumn(col, current_timestamp())

  /** V1 — keep only rows satisfying a validity predicate. */
  def validate(pred: Column): Stage = df => df.filter(pred)

  /** V1b — split a frame into (valid, quarantine) on a predicate: the
    * reject path keeps the offending rows (plus a reason column) for a
    * dead-letter sink instead of silently dropping them.
    */
  def quarantine(df: DataFrame, pred: Column, reason: String): (DataFrame, DataFrame) =
    (df.filter(pred),
     df.filter(!pred || pred.isNull).withColumn("reject_reason", lit(reason)))

  /** Compose stages left-to-right. */
  def pipeline(stages: Stage*): Stage = df => stages.foldLeft(df)((d, s) => s(d))
}
