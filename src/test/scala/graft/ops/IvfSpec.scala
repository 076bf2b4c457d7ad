package graft.ops

import graft.SparkSpec
import graft.sources.Tables

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF index partitions the corpus and search beats its cost model") {
    val e = Tables(spark, sf, "embeddings")
    val index = Ivf.build(e, "vec_id", "embedding", k = 8)
    assert(index.centroids.length == 8)
    assert(index.assigned.count() == e.count())
    val clusters = index.assigned.select("cluster").distinct().count()
    assert(clusters > 1, "KMeans must produce multiple non-empty cells")
  }

  test("IVF top-k recall vs brute force with generous nprobe") {
    val e = Tables(spark, sf, "embeddings")
    val query = e.filter($"vec_id" === 0L)
    val k = 20
    val exact = Similarity.bruteForceTopK(e, query, "vec_id", "embedding", k)
      .select("vec_id").as[Long].collect().toSet
    val index = Ivf.build(e, "vec_id", "embedding", k = 8)
    val approx = Ivf.topK(index, query, "vec_id", "embedding", k, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / k
    assert(approx.contains(0L), "query must find itself")
    assert(recall >= 0.4, s"recall $recall too low for nprobe=half the cells")
  }

  test("persisted index round-trips and the probe scan partition-prunes") {
    val e = Tables(spark, sf, "embeddings")
    val query = e.filter($"vec_id" === 3L)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    val mem = Ivf.build(e, "vec_id", "embedding", k = 8)
    val disk = Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 8)
    // identical centroids and identical search results after reload
    assert(disk.centroids.map(_.toSeq).toSeq == mem.centroids.map(_.toSeq).toSeq)
    val memTop = Ivf.topK(mem, query, "vec_id", "embedding", 20, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    val diskTop = Ivf.topK(disk, query, "vec_id", "embedding", 20, nprobe = 3)
      .as[(Long, Double)].collect().toSeq
    assert(diskTop == memTop)
    // the probe reads only the nprobe matching partitions: the scan
    // carries a cluster partition filter and selects <= nprobe dirs
    val probePlan = Ivf.topK(disk, query, "vec_id", "embedding", 20, nprobe = 3)
      .queryExecution.executedPlan match {
        // AQE wraps the real plan in a leaf-like adaptive node
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
    val scans = probePlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val indexScan = scans.find(_.partitionFilters.exists(_.references.exists(_.name == "cluster")))
    assert(indexScan.isDefined, s"no partition-pruned index scan in:\n$probePlan")
    assert(indexScan.get.selectedPartitions.partitionCount <= 3,
      "scan must touch at most nprobe partitions")
    // second build call must reuse the on-disk index, not refit
    val again = Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 8)
    assert(again.centroids.map(_.toSeq).toSeq == mem.centroids.map(_.toSeq).toSeq)
  }

  test("append assigns new vectors to existing centroids without refit") {
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 8)
    // re-ingest vector 5 under a new id: same cell as the original,
    // and a search for vector 5 must now surface the copy at cos 1.0
    val v5 = e.filter($"vec_id" === 5L)
      .select(org.apache.spark.sql.functions.lit(777777L).as("vec_id"), $"embedding")
    val after = Ivf.appendToIndex(v5, dir, "vec_id", "embedding")
    assert(after.centroids.length == 8, "append must not refit centroids")
    val cellOf = after.assigned
      .where($"vec_id".isin(5L, 777777L))
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(cellOf(777777L) == cellOf(5L),
      "the copy must land in the original's Voronoi cell")
    val top = Ivf.topK(after, e.filter($"vec_id" === 5L),
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect()
    assert(top.take(2).toSet == Set(5L, 777777L),
      s"both copies must lead the ranking, got ${top.toSeq}")
  }
}
