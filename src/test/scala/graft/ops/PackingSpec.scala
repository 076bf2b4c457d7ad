package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("contiguous fill: packs close when the budget line is crossed") {
    val docs = Seq(
      (1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L), // 1800 → pack 0
      (4L, "a", 600L),                                   // crosses → still pack 0? no: starts at 1800 < 2048 → pack 0 (overflow)
      (5L, "a", 600L),                                   // starts at 2400 → pack 1
      (6L, "b", 5000L),                                  // oversized → own pack
      (7L, "b", 100L)
    ).toDF("doc_id", "shard", "n")
    val packed = Packing.packBy(docs, "shard", "doc_id", col("n"), budget = 2048)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(packed(1L) == 0 && packed(2L) == 0 && packed(3L) == 0)
    assert(packed(4L) == 0, "doc starting under budget joins the open pack")
    assert(packed(5L) == 1, "doc starting past budget opens the next pack")
    assert(packed(6L) == 0 && packed(7L) == 2,
      "oversized doc fills packs 0-1 by itself; next doc starts pack 2")
  }

  test("pack assignment is layout-independent and stats are exact") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text")
    val n = size(graft.ops.TextAnalysis.tokens($"text")).cast("long")
    val a = Packing.packBy(docs, "lang", "doc_id", n, 2048)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().sorted.toSeq
    val b = Packing.packBy(docs.repartition(17), "lang", "doc_id", n, 2048)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().sorted.toSeq
    assert(a == b, "packing must not depend on physical layout")
    val stats = Packing.packStats(
      Packing.packBy(docs, "lang", "doc_id", n, 2048), "lang", 2048)
    val tokTotal = stats.agg(sum($"n_tokens")).as[Long].head()
    val docTotal = stats.agg(sum($"n_docs")).as[Long].head()
    assert(docTotal == docs.count(), "every doc lands in exactly one pack")
    assert(tokTotal == docs.select(n.as("n")).agg(sum($"n")).as[Long].head())
  }
}
