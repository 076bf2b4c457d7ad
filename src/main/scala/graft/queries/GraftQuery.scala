package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named engine capability: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Oracle-parity rules (the driver hash-compares values column-by-column):
  *  - column names must match exactly on both sides;
  *  - floating aggregation must be order-independent → sums go through
  *    DECIMAL (exact) and come back as DOUBLE (see [[Q.dsum]]);
  *  - per-row double arithmetic (mul/sub/div) is bit-deterministic in
  *    IEEE-754 and needs no special handling;
  *  - top-k must carry a total tie-break order.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    notes: String = "")

/** Shared helpers for oracle-deterministic aggregation. */
object Q {
  /** Order-independent sum of a double column that lives on a 10^-scale
    * decimal grid: cast each value to DECIMAL (exact), sum exactly, cast
    * back to DOUBLE. Identical bits in Spark and DuckDB regardless of
    * partitioning / accumulation order.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average built from the exact decimal sum. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** SQL-side mirror of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlDavg(expr: String, scale: Int = 2): String =
    s"(${sqlDsum(expr, scale)} / count(*))"
}
