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

/** Side-channel tables for the DuckDB oracle. Some operators' only
  * non-SQL-portable part is a fitted or seeded ARTIFACT — KMeans cells,
  * hyperplane bucket signatures, xxhash fingerprints. Once computed,
  * that artifact is plain data: Verify materializes it as parquet so
  * the oracle can replay the portable math (candidate join, re-rank,
  * exact verify) in SQL and hash-compare the full result.
  *
  * Dumps are gated on a system property that only Verify sets: bench
  * runs execute the identical result plan without the side writes, so
  * timings stay comparable round-over-round.
  */
object OracleDump {
  val prop = "graft.oracle.dump"
  def enabled: Boolean = sys.props.get(prop).contains("true")
  def sfTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9.]", "_")
  def scratchRoot(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-oracle-${sfTag(dir)}"
  def dump(df: DataFrame, dir: String, name: String): Unit =
    if (enabled)
      df.write.mode("overwrite").parquet(s"${scratchRoot(dir)}/$name")
  /** Builder-authored oracle SQL can't know the sfDir it will run
    * against, so scratch/index paths are written with these tokens and
    * Verify substitutes the concrete per-sfDir values before dumping
    * oracle_sql.json.
    */
  def substitute(sql: String, dir: String): String =
    sql.replace("__SCRATCH__", scratchRoot(dir))
      .replace("__TMP__", sys.props("java.io.tmpdir"))
      .replace("__SFTAG__", sfTag(dir))

  /** The persisted IVF index path. ONE definition: a04 and x31 share
    * the index (built once per sfDir), and their oracles read it back
    * through the `__TMP__/graft-ivf-__SFTAG__-k<k>` substitution —
    * three hand-rolled copies of this scheme could silently drift.
    */
  def ivfPath(dir: String, k: Int): String =
    s"${sys.props("java.io.tmpdir")}/graft-ivf-${sfTag(dir)}-k$k"

  /** The persisted BPE tokenizer artifact path (fit once per sfDir,
    * shared by x72/x74/x77/x80 — the real fit-once/serve-everywhere
    * lifecycle). The corpus fingerprint goes into the MARKER (via
    * Bpe.fitCached's corpusTag), not the path, so a regenerated
    * fixture rebuilds in place.
    */
  def bpePath(dir: String, nMerges: Int): String =
    s"${sys.props("java.io.tmpdir")}/graft-bpe-${sfTag(dir)}-m$nMerges"

  /** Filesystem-metadata fingerprint of a source table (file names +
    * lengths + mtimes — NO Spark job). Goes into persisted-index
    * marker names so a regenerated fixture invalidates the cached
    * index instead of silently serving stale data: a marker that only
    * versions the index FORMAT survives a testdata refresh and makes
    * the oracle (which reads the live table) hash-mismatch in a way
    * that looks like a code bug.
    */
  def tableFingerprint(dir: String, table: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    val files =
      if (src.isDirectory)
        Option(src.listFiles()).toSeq.flatten
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      else Seq(src)
    val sig = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    // hash over the BYTE length, not the char count: for non-ASCII file
    // names the UTF-8 encoding is longer than the string, and a char
    // count would hash a truncated prefix (a tail-only change — e.g.
    // the last file's mtime — would not invalidate the index)
    val bytes = sig.getBytes("UTF-8")
    java.lang.Long.toHexString(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42).toLong & 0xffffffffL)
  }
}

/** Shared helpers for oracle-deterministic aggregation. */
object Q {
  /** Order-independent sum of a double column that lives on a 10^-scale
    * decimal grid: round each value onto the grid (exact), sum exactly,
    * cast back to DOUBLE. Identical bits in Spark and DuckDB regardless
    * of partitioning / accumulation order.
    *
    * NOT implemented as `sum(cast(c as decimal(18,s)))`: Sum widens the
    * buffer to decimal(28,s), past the long-backed 18-digit range, so
    * every row pays a BigDecimal add (and the double→decimal cast
    * allocates another BigDecimal per row) — measured 10× over a double
    * sum. Instead this extends Spark's own DecimalAggregates rewrite
    * (which requires precision ≤ 8) overflow-safely to wide values:
    *  - recover the exact scaled integer v = value·10^s in pure FP:
    *    c·10^s is a correctly-rounded product, so for on-grid values
    *    with |v| < ~4.5e15 its error is strictly < 0.5 and
    *    floor(c·10^s + 0.5) = v exactly (sign-independent — no
    *    half-boundary exists on-grid);
    *  - split v = hi·2²⁰ + lo and sum hi/lo as plain longs (codegen'd,
    *    exact, order-independent);
    *  - recombine per GROUP in decimal(38) and divide back.
    * Every step is exact until the single final decimal→double
    * rounding — bit-identical to the naive decimal sum for on-grid
    * input. Overflow headroom is 2²⁰× a plain long sum
    * (Σ|v| < 2⁸³ ≈ 9.7e24), far past 100 TB on cent/basis-point grids.
    */
  def dsum(c: Column, scale: Int = 2): Column = {
    val v = floor(c * lit(math.pow(10, scale)) + lit(0.5)).cast(LongType)
    val hi = shiftright(v, 20)
    val lo = v - hi * lit(1L << 20) // 0 <= lo < 2^20 (arithmetic shift floors)
    val total = sum(hi).cast(DecimalType(38, 0)) * lit(1L << 20) +
      sum(lo).cast(DecimalType(38, 0))
    (total / lit(math.pow(10, scale).toLong)).cast(DoubleType)
  }

  /** Deterministic average built from the exact decimal sum. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** SQL-side mirror of [[dsum]] for the DuckDB oracle. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlDavg(expr: String, scale: Int = 2): String =
    s"(${sqlDsum(expr, scale)} / count(*))"
}
