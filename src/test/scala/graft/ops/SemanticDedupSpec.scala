package graft.ops

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted semantic duplicates lose to their min-id original, per cell") {
    // two well-separated cells; vectors 11/12 are near-copies of 10
    // (same direction, scaled/perturbed), 21 of 20; 30 is alone.
    // Cell assignment is given explicitly — dropList's contract starts
    // from an assigned table, matching the persisted-index usage.
    val assigned = Seq(
      (10L, Seq(1.0, 0.0, 0.0), 0),
      (11L, Seq(0.99, 0.01, 0.0), 0),
      (12L, Seq(2.0, 0.02, 0.0), 0),
      (30L, Seq(0.0, 0.0, -1.0), 0), // same cell, opposite space: kept
      (20L, Seq(0.0, 1.0, 0.0), 1),
      (21L, Seq(0.0, 0.98, 0.03), 1)
    ).toDF("vec_id", "embedding", "cluster")
    val dropped = SemanticDedup.dropList(assigned, "vec_id", "embedding",
      threshold = 0.9)
      .as[(Long, Long)].collect().toMap
    assert(dropped == Map(11L -> 10L, 12L -> 10L, 21L -> 20L))
  }

  test("near-dups split across cells survive (the documented blocking tradeoff)") {
    val assigned = Seq(
      (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(0.99, 0.01), 1) // a near-copy, but in another cell
    ).toDF("vec_id", "embedding", "cluster")
    val dropped = SemanticDedup.dropList(assigned, "vec_id", "embedding",
      threshold = 0.9).count()
    assert(dropped == 0, "cross-cell pairs are out of scope by design")
  }
}
