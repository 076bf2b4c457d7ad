package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's Load stage (README.md:24, :27-29): insert transformed
  * documents into a named collection, with idempotent re-load (L2) and a
  * post-write consistency check (V2, README.md:34).
  *
  * In production this would be `df.write.format("mongodb")` (one
  * collection per connector); offline, the sink abstraction writes
  * parquet so the rest of the pipeline is identical.
  */
trait GraftSink {
  /** Write a batch; returns the number of rows written. */
  def write(df: DataFrame): Long
}

/** Append/overwrite a parquet "collection" ([[FormatSink]] fixed to
  * parquet — kept as the named default sink of the load stage).
  */
final case class ParquetSink(path: String, mode: SaveMode = SaveMode.Append)
    extends GraftSink {
  def write(df: DataFrame): Long = FormatSink(path, "parquet", mode).write(df)
}

/** [[ParquetSink]]'s contract in any Spark file format — `format` is
  * the DataSource name ("orc", "csv", "json", "parquet"). ORC is the
  * case that matters for 100 TB parity: columnar, splittable, and —
  * like parquet — predicate pushdown and column pruning reach the scan
  * (SinksSpec pins PushedFilters + pruned ReadSchema on the
  * read-back), so a warehouse standardized on ORC keeps the scan
  * behavior every plan spec in this repo asserts for parquet. The
  * row-based formats (csv/json) ride the same code path for
  * interchange use; they trade the columnar properties away.
  */
final case class FormatSink(path: String, format: String,
    mode: SaveMode = SaveMode.Append,
    options: Map[String, String] = Map.empty) extends GraftSink {
  def write(df: DataFrame): Long = {
    val n = df.count()
    df.write.mode(mode).options(options).format(format).save(path)
    n
  }
}

/** L2 — idempotent keyed upsert: incoming rows win over existing rows
  * with the same key; re-running the same load leaves the collection
  * unchanged. The anti-join touches only the key column of the incoming
  * side, so at scale the build side stays small enough to broadcast.
  */
final case class UpsertParquetSink(path: String, keys: Seq[String])
    extends GraftSink {
  def write(incoming: DataFrame): Long = {
    val spark = incoming.sparkSession
    val exists = new java.io.File(path).exists()
    val merged =
      if (!exists) incoming
      else {
        val existing = spark.read.parquet(path)
        existing.join(
          broadcast(incoming.select(keys.map(incoming.col): _*).distinct()),
          keys, "left_anti")
          .unionByName(incoming)
      }
    // Self-referential overwrite: materialize to a staging dir first.
    val staging = path + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val out = spark.read.parquet(staging)
    val n = out.count()
    out.write.mode(SaveMode.Overwrite).parquet(path)
    deleteRecursively(new java.io.File(staging))
    n
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }
}

/** V2 — insertion-consistency check (README.md:34): count + two
  * order-independent content checksums over per-row xxhash64 — XOR and
  * exact decimal SUM. XOR alone is blind to even-multiplicity changes
  * ({A,A} vs {B,B} both xor to 0); the sum breaks that symmetry, so the
  * triple detects any multiset difference short of an engineered hash
  * collision.
  */
object Consistency {
  final case class Check(rows: Long, xor: Long, sum: BigDecimal)

  def of(df: DataFrame): Check = {
    val hashed = df.select(xxhash64(df.columns.map(df.col): _*).as("h"))
    val row = hashed.agg(count(lit(1)).as("n"),
      // bit_xor and decimal sum are order- and partitioning-independent
      coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
      coalesce(sum(col("h").cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)"))
        .as("s")).head()
    Check(row.getLong(0), row.getLong(1), BigDecimal(row.getDecimal(2)))
  }

  /** True iff the sink contains exactly the rows of `source`. */
  def verify(source: DataFrame, sinkContents: DataFrame): Boolean =
    of(source) == of(sinkContents.select(source.columns.map(sinkContents.col): _*))
}
