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

  test("multi-probe blocking recovers a boundary-straddling near-dup pair") {
    // two angular fans around ±x, members 15° apart (adjacent cos
    // 0.966 < threshold — no intra-fan near-dups); the near-dup pair
    // (±0.02, 1.0) at ~±89° straddles the Voronoi boundary (pair cos
    // ≈ 0.9992). Centroids/assignment are explicit (the Euclidean
    // argmin for these points — KMeans init noise would make the
    // boundary, and hence the spec, nondeterministic).
    val mass = (0 until 8).flatMap { i =>
      val t = -0.91 + 0.26 * i
      Seq((100L + i, Seq(math.cos(t), math.sin(t))),
        (200L + i, Seq(-math.cos(t), -math.sin(t))))
    }
    val pairA = Seq((1L, Seq(0.02, 1.0)), (2L, Seq(-0.02, 1.0)))
    val assigned = (mass ++ pairA)
      .map { case (id, v) => (id, v, if (v.head >= 0) 0 else 1) }
      .toDF("vec_id", "embedding", "cluster")
    val idx = Ivf.Index(Array(Array(0.83, 0.0), Array(-0.83, 0.0)), assigned)
    // single assignment: the pair lands in different cells and survives
    val single = SemanticDedup.dropList(idx.assigned, "vec_id", "embedding",
      threshold = 0.99).count()
    assert(single == 0, "boundary pair must be invisible to single-probe blocking")
    // p=2: both vectors also join their second-nearest cell → pair found
    val multi = SemanticDedup.dropListMultiProbe(idx, "vec_id", "embedding",
      threshold = 0.99, probes = 2)
      .as[(Long, Long)].collect().toMap
    assert(multi == Map(2L -> 1L), s"p=2 must recover the straddling pair: $multi")
    Staged.releaseAll()
  }

  test("multi-probe scales the hot-cell cap: a dense-but-valid cell keeps its pairs") {
    // cell A: 6 near-identical vectors (cap 8 admits them at p=1);
    // cell B: 4 angularly-spread fillers. Under p=2 every vector joins
    // both cells, so A's probed population is 10 — an UNSCALED cap of 8
    // would drop the whole cell and lose all 5 legitimate drops
    val dense = (0 until 6).map(i => (10L + i, Seq(1.0, i * 0.001)))
    val fillers = (0 until 4).map { i =>
      val t = math.Pi + 0.3 * (i - 1.5)
      (20L + i, Seq(math.cos(t), math.sin(t)))
    }
    val assigned = (dense ++ fillers)
      .map { case (id, v) => (id, v, if (v.head >= 0) 0 else 1) }
      .toDF("vec_id", "embedding", "cluster")
    val idx = Ivf.Index(Array(Array(1.0, 0.0), Array(-1.0, 0.0)), assigned)
    val single = SemanticDedup.dropList(idx.assigned, "vec_id", "embedding",
      threshold = 0.99, maxCell = 8L).as[(Long, Long)].collect().toMap
    assert(single == (11 to 15).map(_.toLong -> 10L).toMap)
    val multi = SemanticDedup.dropListMultiProbe(idx, "vec_id", "embedding",
      threshold = 0.99, probes = 2, maxCell = 8L)
      .as[(Long, Long)].collect().toMap
    assert(multi == single,
      s"the scaled cap must keep the dense cell's pairs at p=2: $multi")
    Staged.releaseAll()
  }

  test("multiAssign: p=1 equals the build assignment; p=2 is a superset") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i * 0.7), math.sin(i * 0.7), i * 0.1)))
      .toDF("vec_id", "embedding")
    val idx = Ivf.build(vecs, "vec_id", "embedding", k = 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster").as[(Long, Int)].collect().toSet
    val built = pairs(idx.assigned)
    val p1 = pairs(Ivf.multiAssign(idx, vecs, "vec_id", "embedding", 1))
    assert(p1 == built, "p=1 multi-assign must reproduce the KMeans assignment")
    val p2 = pairs(Ivf.multiAssign(idx, vecs, "vec_id", "embedding", 2))
    assert(built.subsetOf(p2) && p2.size == 2 * built.size,
      "p=2 must add exactly one extra cell per vector")
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
