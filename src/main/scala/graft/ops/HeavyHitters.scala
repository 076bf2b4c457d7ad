package graft.ops

import org.apache.spark.sql.{Dataset, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters: a MERGEABLE k-counter frequency summary.
  *
  * Guarantees (Misra & Gries 1982; merge form Agarwal et al. 2012):
  * with capacity k, every item whose true frequency exceeds N/(k+1) is
  * present in the summary, and each reported count under-estimates the
  * truth by at most N/(k+1). Both properties survive arbitrary
  * partitioning/merge order — the summary is a commutative monoid up
  * to its error bound, which is what makes it a valid distributed
  * aggregation at 100 TB: each partition keeps k counters, the shuffle
  * carries k rows per partition, and merges never revisit data.
  */
object HeavyHitters {

  type Counters = Map[String, Long]

  final class MisraGries(k: Int)
      extends Aggregator[String, Counters, Seq[(String, Long)]] {
    require(k > 0, "capacity must be positive")

    override def zero: Counters = Map.empty

    override def reduce(b: Counters, item: String): Counters =
      if (b.contains(item)) b.updated(item, b(item) + 1L)
      else if (b.size < k) b.updated(item, 1L)
      else {
        // decrement-all step: every counter gives up one unit (the
        // incoming item's single unit annihilates with them)
        b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
      }

    override def merge(b1: Counters, b2: Counters): Counters = {
      val combined = b2.foldLeft(b1) { case (acc, (item, n)) =>
        acc.updated(item, acc.getOrElse(item, 0L) + n)
      }
      if (combined.size <= k) combined
      else {
        // keep the k largest; subtracting the (k+1)-th largest value
        // from the survivors preserves the under-estimate bound
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }

    override def finish(b: Counters): Seq[(String, Long)] =
      b.toSeq.sortBy { case (item, n) => (-n, item) }

    override def bufferEncoder: Encoder[Counters] = Encoders.kryo[Counters]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Approximate top-k frequent values of a string Dataset. */
  def topK(items: Dataset[String], k: Int): Seq[(String, Long)] = {
    import items.sparkSession.implicits._
    items.select(new MisraGries(k).toColumn).as[Seq[(String, Long)]].head()
  }

  /** Heavy-hitter tokens of a text column as a LAZY DataFrame
    * (token, est_count) — est_count is a lower bound within N/(k+1).
    *
    * No job runs until the result is consumed (building a query around
    * the sketch costs nothing); callers that feed the sketch into
    * several downstream joins stage it ([[Staged]]) so the corpus
    * aggregation executes once, not once per consumer.
    */
  def frequentTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .as[String]
      .select(new MisraGries(k).toColumn.name("sk"))
      .select(explode(col("sk")).as("kv"))
      .select(col("kv._1").as("token"), col("kv._2").as("est_count"))
  }
}
