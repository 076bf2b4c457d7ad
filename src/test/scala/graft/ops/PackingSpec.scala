package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("offset-stride: a doc belongs to the stride its start offset hits") {
    val docs = Seq(
      (1L, "a", 600L), (2L, "a", 600L), (3L, "a", 600L), // starts 0/600/1200
      (4L, "a", 600L),                                   // starts 1800 < 2048 → pack 0 (overflows the line)
      (5L, "a", 600L),                                   // starts 2400 → pack 1
      (6L, "b", 5000L),                                  // oversized: spans strides 0-2
      (7L, "b", 100L)
    ).toDF("doc_id", "shard", "n")
    val packed = Packing.packBy(docs, "shard", "doc_id", col("n"), budget = 2048)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(packed(1L) == 0 && packed(2L) == 0 && packed(3L) == 0)
    assert(packed(4L) == 0, "doc starting under the line joins the stride")
    assert(packed(5L) == 1, "doc starting past the line takes the next stride")
    assert(packed(6L) == 0 && packed(7L) == 2,
      "oversized doc owns its span; next doc's offset lands in stride 2")
  }

  test("greedy fill: accumulator resets per pack, ids are consecutive") {
    val docs = Seq(
      (1L, "a", 1500L), (2L, "a", 500L), (3L, "a", 1500L), (4L, "a", 500L),
      (5L, "b", 5000L), (6L, "b", 100L)
    ).toDF("doc_id", "shard", "n")
    // greedy: 1500+500=2000 fits; d3 would overflow → closes pack 0 full
    val greedy = Packing.packByGreedy(docs, "shard", "doc_id", col("n"), 2048)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(greedy(1L) == 0 && greedy(2L) == 0 && greedy(3L) == 1 && greedy(4L) == 1,
      s"greedy must close a pack rather than overflow it: $greedy")
    assert(greedy(5L) == 0 && greedy(6L) == 1,
      "oversized doc is a singleton pack; ids stay consecutive")
    // same data, offset-stride: the overflow carries into stride 1, and
    // an oversized doc makes ids skip
    val stride = Packing.packBy(docs, "shard", "doc_id", col("n"), 2048)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(stride(3L) == 0, "stride keeps the doc whose offset is under the line")
    assert(stride(6L) == 2, "stride skips the ids an oversized doc spans")
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
