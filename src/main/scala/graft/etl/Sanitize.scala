package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink-compat field sanitation (reference README.md:23 — "Clean or
  * reformat the data for MongoDB compatibility").
  *
  * BSON field-name rules: names must not contain `.` and must not start
  * with `$`. This rewrites an arbitrarily nested schema — structs, arrays
  * of structs, maps with dynamic string keys — into a BSON-legal one.
  *
  * The rewrite is a pure schema-to-expression transformation: it produces
  * one `Column` per top-level field, so Catalyst sees a plain projection
  * (codegen-friendly, no UDFs, fully column-prunable).
  */
object Sanitize {

  /** BSON-legalize one field name. Idempotent: a second application is
    * the identity (property-tested in SanitizeSpec).
    */
  def sanitizeName(name: String): String = {
    val dotless = name.replace(".", "_")
    val deDollared = if (dotless.startsWith("$")) "_" + dotless.tail else dotless
    if (deDollared.isEmpty) "_" else deDollared
  }

  /** Runtime equivalent of [[sanitizeName]] for dynamic map keys. */
  private def sanitizeKeyExpr(k: Column): Column = {
    val dotless = regexp_replace(k, "\\.", "_")
    when(dotless.startsWith("$"), concat(lit("_"), substring(dotless, 2, Int.MaxValue)))
      .otherwise(dotless)
  }

  /** Recursively rebuild a column so every nested field name is
    * BSON-legal. Arrays recurse through `transform`, maps through
    * `transform_keys` — all codegen'd built-ins.
    */
  private def sanitizeColumn(c: Column, dt: DataType): Column = dt match {
    case st: StructType =>
      struct(st.fields.map { f =>
        sanitizeColumn(c.getField(f.name), f.dataType).as(sanitizeName(f.name))
      }.toSeq: _*)
    case ArrayType(et, _) =>
      transform(c, x => sanitizeColumn(x, et))
    case MapType(StringType, vt, _) =>
      transform_keys(transform_values(c, (_, v) => sanitizeColumn(v, vt)),
        (k, _) => sanitizeKeyExpr(k))
    case _ => c
  }

  /** Sanitize every field name in `df`, at every nesting level. */
  def apply(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      sanitizeColumn(df.col("`" + f.name.replace("`", "``") + "`"), f.dataType)
        .as(sanitizeName(f.name))
    }.toSeq
    df.select(cols: _*)
  }

  /** Pure schema-level preview of the rewrite (used by tests). */
  def sanitizeSchema(schema: StructType): StructType = {
    def go(dt: DataType): DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map(f => f.copy(name = sanitizeName(f.name), dataType = go(f.dataType))))
      case ArrayType(et, n)      => ArrayType(go(et), n)
      case MapType(k, v, n)      => MapType(k, go(v), n)
      case other                 => other
    }
    go(schema).asInstanceOf[StructType]
  }
}
