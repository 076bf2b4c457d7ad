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

  test("hot cells over maxCell are excluded from pairing, with visible accounting") {
    // cell 0: 6 near-identical vectors (a degenerate dense region);
    // cell 1: a well-behaved pair. With maxCell = 5 the hot cell's
    // pairs must vanish entirely while cell 1 still dedups.
    val hot = (0 until 6).map(i => (100L + i, Seq(1.0, i * 1e-4), 0))
    val ok = Seq((20L, Seq(0.0, 1.0), 1), (21L, Seq(0.001, 0.99), 1))
    val assigned = (hot ++ ok).toDF("vec_id", "embedding", "cluster")

    val acct = SemanticDedup.droppedCells(assigned, maxCell = 5)
      .as[(Int, Long)].collect()
    assert(acct.toSeq == Seq((0, 6L)), "the hot cell must be reported")

    val dropped = SemanticDedup.dropList(assigned, "vec_id", "embedding",
      threshold = 0.9, maxCell = 5).as[(Long, Long)].collect().toMap
    assert(dropped == Map(21L -> 20L),
      "hot-cell rows must leave both pair roles; healthy cells unaffected")

    // no cap crossed → identical to the ungoverned result
    val uncapped = SemanticDedup.dropList(assigned, "vec_id", "embedding",
      threshold = 0.9, maxCell = 100).as[(Long, Long)].collect().toMap
    assert(uncapped.contains(101L) && uncapped(21L) == 20L)
  }

  test("kForCells: constant expected cell population, clamped at both ends") {
    assert(Ivf.kForCells(500) == 16, "small corpora clamp to kMin (shared test index)")
    assert(Ivf.kForCells(65536) == 16)
    assert(Ivf.kForCells(1 << 20) == 256, "1M vecs / 4096 per cell")
    assert(Ivf.kForCells(1L << 33) == (1 << 18), "huge corpora clamp to kMax")
    // the policy property: expected population stays ~targetCell
    val n = 123456789L
    val k = Ivf.kForCells(n)
    val pop = n.toDouble / k
    assert(pop <= Ivf.DefaultTargetCell && pop > Ivf.DefaultTargetCell / 2.0)
  }
}
