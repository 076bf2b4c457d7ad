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

  test("append preserves the built index's schema (no mixed-schema parquet)") {
    import org.apache.spark.sql.functions.{col, lit}
    val e = Tables(spark, sf, "embeddings")
    // build from an array<double> corpus — append once hardcoded a
    // float cast, interleaving mixed-schema files under assigned/
    val dbl = e.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-schema").toString
    Ivf.buildPersistent(dbl, dir, "vec_id", "embedding", k = 4)
    val n = dbl.count()
    // the batch arrives as array<float> (the raw table type) and must be
    // widened to the index's double, not the other way around
    val batch = e.filter($"vec_id" === 7L)
      .select(lit(888888L).as("vec_id"), $"embedding")
    Ivf.appendToIndex(batch, dir, "vec_id", "embedding")
    val back = spark.read.parquet(s"$dir/assigned")
    assert(back.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, true),
      s"appended files changed the element type: ${back.schema}")
    assert(back.count() == n + 1)
    // every row's vector is readable (a mixed-schema dir would throw or
    // NULL out one side depending on which file wins inference)
    assert(back.where(col("embedding").isNull).count() == 0)
    // incompatible element types are rejected, never silently cast
    val bad = Seq((1L, Seq("a", "b"))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Ivf.appendToIndex(bad, dir, "vec_id", "embedding")
    }
  }

  test("append assigns by the build metric (Euclidean), not cosine") {
    // two KMeans cells: A near (10,0), B near (0,1) ∪ the outlier (2,0).
    // For v=(2,0) the two argmins genuinely differ: Euclidean picks B
    // (dist ~1.8 vs 8), cosine picks A (cos 1.0 vs ~0.45) — assigning
    // appends by cosine would separate an appended copy from its
    // original, and a probe of the original's cell would miss it.
    val pts = Seq(
      (1L, Seq(10.0, 0.1)), (2L, Seq(10.0, -0.1)), (3L, Seq(9.9, 0.0)),
      (4L, Seq(10.1, 0.0)),
      (5L, Seq(0.0, 0.9)), (6L, Seq(0.0, 1.1)), (7L, Seq(-0.1, 1.0)),
      (8L, Seq(0.1, 1.0)), (9L, Seq(2.0, 0.0))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-metric").toString
    Ivf.buildPersistent(pts, dir, "vec_id", "embedding", k = 2)
    val copy = Seq((99L, Seq(2.0, 0.0))).toDF("vec_id", "embedding")
    val after = Ivf.appendToIndex(copy, dir, "vec_id", "embedding")
    val cellOf = after.assigned.select("vec_id", "cluster")
      .as[(Long, Int)].collect().toMap
    assert(cellOf(99L) == cellOf(9L),
      "the appended copy must land in its original's Voronoi cell " +
        s"(got ${cellOf(99L)} vs ${cellOf(9L)})")
  }

  test("probe ranking matches the cell geometry: Euclidean, not cosine") {
    // Deliberately unnormalized vectors. Cells are Euclidean Voronoi:
    //   cell 0 centroid (2, 0.5) — the small-norm region, CONTAINS the
    //     query's near-copy v*=(2.2, 1.1);
    //   cell 1 centroid (40, 20) — exactly the query's direction but
    //     Euclidean-far; members are large-norm, cos ≈ 0.9999 < 1.
    // For query (2, 1): cos(c1) = 1.0 > cos(c0) ≈ 0.976, so a COSINE
    // probe rule with nprobe=1 picks cell 1 and misses v* entirely;
    // the Euclidean rule (dist 0.5 vs ~42.4) picks cell 0 and finds it.
    val c0 = Array(2.0, 0.5)
    val c1 = Array(40.0, 20.0)
    val assigned = Seq(
      (10L, Seq(2.2, 1.1), 0),  // v*: cosine 1.0 with the query
      (11L, Seq(1.8, 0.2), 0),
      (20L, Seq(40.0, 21.0), 1),
      (21L, Seq(39.0, 19.0), 1)
    ).toDF("vec_id", "embedding", "cluster")
    // sanity: the constructed case really discriminates the two rules
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = Array(2.0, 1.0)
    assert(cos(c1, q) > cos(c0, q), "cosine rule would probe the wrong cell")

    val idx = Ivf.Index(Array(c0, c1), assigned)
    val query = Seq((0L, Seq(2.0, 1.0))).toDF("vec_id", "embedding")
    val top = Ivf.topK(idx, query, "vec_id", "embedding", k = 1, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(top.toSeq == Seq(10L),
      s"nprobe=1 must probe the query's own Voronoi cell, got ${top.toSeq}")
  }

  test("append rejects a precision-narrowing double batch into a float index") {
    val e = Tables(spark, sf, "embeddings") // raw table is array<float>
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-narrow").toString
    Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 4)
    val dblBatch = e.filter($"vec_id" === 3L)
      .select(org.apache.spark.sql.functions.lit(333333L).as("vec_id"),
        $"embedding".cast("array<double>").as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Ivf.appendToIndex(dblBatch, dir, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("narrowing"))
    // integer-typed (e.g. quantized) batches narrow too: int→float
    // loses precision past 2^24
    val intBatch = e.filter($"vec_id" === 4L)
      .select(org.apache.spark.sql.functions.lit(444444L).as("vec_id"),
        $"embedding".cast("array<int>").as("embedding"))
    val ex2 = intercept[IllegalArgumentException] {
      Ivf.appendToIndex(intBatch, dir, "vec_id", "embedding")
    }
    assert(ex2.getMessage.contains("narrowing"))
  }

  test("append fails descriptively on a null vector element") {
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-nullel").toString
    Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 4)
    val holey = Seq((444444L, Seq[java.lang.Float](1.0f, null, 3.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[org.apache.spark.SparkException] {
      Ivf.appendToIndex(holey, dir, "vec_id", "embedding")
    }
    val root = Option(ex.getCause).getOrElse(ex)
    assert(root.getMessage.contains("null element"),
      s"want the descriptive error, got: ${root.getMessage}")
  }

  test("a cached persistent index sees appended rows in the same session") {
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-cache").toString
    val before = Ivf.buildPersistentCached(e, dir, "vec_id", "embedding", k = 8)
    val n = before.assigned.count()
    // materialize a probe through the cached index first (snapshots the
    // pre-append file listing)
    Ivf.topK(before, e.filter($"vec_id" === 5L), "vec_id", "embedding", 5).count()
    val v5 = e.filter($"vec_id" === 5L)
      .select(org.apache.spark.sql.functions.lit(555555L).as("vec_id"), $"embedding")
    Ivf.appendToIndex(v5, dir, "vec_id", "embedding")
    // the memoized entry must have been invalidated: the re-fetched
    // index and its probes see the appended file set
    val after = Ivf.buildPersistentCached(e, dir, "vec_id", "embedding", k = 8)
    assert(after.assigned.count() == n + 1,
      "cached index still probes the pre-append file listing")
    val top = Ivf.topK(after, e.filter($"vec_id" === 5L),
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select("vec_id").as[Long].collect()
    assert(top.take(2).toSet == Set(5L, 555555L),
      s"post-append probe must surface the appended copy, got ${top.toSeq}")
  }

  test("int8 probe face: smaller scan, same pruning, faithful ranking") {
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-int8").toString
    Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 8)
    Ivf.quantizeAssigned(spark, dir, "vec_id", "embedding")
    val query = e.filter($"vec_id" === 0L)
    val floatTop = Ivf.topK(Ivf.readIndex(spark, dir), query,
      "vec_id", "embedding", k = 20, nprobe = 4)
      .select("vec_id").as[Long].collect()
    val int8Top = Ivf.topKInt8(spark, dir, query,
      "vec_id", "embedding", k = 20, nprobe = 4)
      .select("vec_id").as[Long].collect()
    // same probe cells by construction (shared probeCells); ranking
    // agreement limited only by the rounding error
    assert(int8Top.head == 0L, "query must find itself at cos 1.0")
    val agree = (floatTop.toSet intersect int8Top.toSet).size
    assert(agree >= 16, s"int8 ranking diverged from float: $agree/20 agree")
    // the stored face is genuinely smaller: int8 dictionary/bit-packed
    // columns vs PLAIN float32
    def bytes(sub: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .map(_.length).sum
    }
    assert(bytes("assigned_int8") < (bytes("assigned") * 0.6).toLong,
      s"int8 face not smaller: ${bytes("assigned_int8")} vs ${bytes("assigned")}")
    // idempotent: the marker short-circuits a rebuild
    Ivf.quantizeAssigned(spark, dir, "vec_id", "embedding")
    assert(spark.read.parquet(s"$dir/assigned_int8").count() == e.count())
    // the batched int8 face restricted to one query ≡ the single-query
    // probe (shared batchProbe cells, same ranking rule)
    val batched = Ivf.topKInt8Batch(Ivf.readIndex(spark, dir), dir, query,
      "vec_id", "embedding", "vec_id", k = 20, nprobe = 4)
      .orderBy($"cos_sim".desc, $"vec_id")
      .select("vec_id").as[Long].collect()
    assert(batched.toSeq == int8Top.toSeq,
      s"batched int8 probe diverged from single-query: ${batched.toSeq} vs ${int8Top.toSeq}")
    // the int8 probe partition-prunes exactly like the float probe
    val plan = Ivf.topKInt8(spark, dir, query,
      "vec_id", "embedding", k = 20, nprobe = 3)
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
    val scan = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.find(_.partitionFilters.exists(_.references.exists(_.name == "cluster")))
    assert(scan.isDefined, s"no partition-pruned int8 scan in:\n$plan")
    assert(scan.get.selectedPartitions.partitionCount <= 3,
      "int8 scan must touch at most nprobe partitions")
  }

  test("append maintains the int8 face; compaction covers both tables") {
    import org.apache.spark.sql.functions.lit
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-int8-app").toString
    Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 8)
    Ivf.quantizeAssigned(spark, dir, "vec_id", "embedding")
    (0 until 3).foreach { i =>
      Ivf.appendToIndex(
        e.filter($"vec_id" === 5L)
          .select(lit(910000L + i).as("vec_id"), $"embedding"),
        dir, "vec_id", "embedding")
    }
    // the appended copies are visible to the int8 probe (an int8 face
    // that missed appends would silently lose new corpus data on the
    // production probe path)
    assert(spark.read.parquet(s"$dir/assigned_int8").count() == e.count() + 3)
    def probe() = Ivf.topKInt8(spark, dir, e.filter($"vec_id" === 5L),
      "vec_id", "embedding", k = 6, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    val probeBefore = probe()
    assert(probeBefore.map(_._1).take(4).toSet ==
      Set(5L, 910000L, 910001L, 910002L),
      s"appended copies must rank first in the int8 probe: $probeBefore")
    def dataFiles(sub: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    }
    val before = dataFiles("assigned_int8")
    Ivf.compactIndex(spark, dir)
    assert(dataFiles("assigned_int8") < before,
      s"compaction must shrink the int8 tail: $before -> ${dataFiles("assigned_int8")}")
    assert(dataFiles("assigned_int8") <= 8,
      "expected <= one int8 file per nonempty cell")
    assert(probe() == probeBefore, "compaction must not change the int8 probe")
  }

  test("assigned-table compaction shrinks append tails; probe invariant; recovers") {
    import org.apache.spark.sql.functions.lit
    val e = Tables(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    Ivf.buildPersistent(e, dir, "vec_id", "embedding", k = 8)
    // three single-vector appends: each adds one file to its cell dir
    (0 until 3).foreach { i =>
      Ivf.appendToIndex(
        e.filter($"vec_id" === 5L)
          .select(lit(900000L + i).as("vec_id"), $"embedding"),
        dir, "vec_id", "embedding")
    }
    def dataFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$dir/assigned"))
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    }
    def probe() = Ivf.topK(Ivf.readIndex(spark, dir),
      e.filter($"vec_id" === 5L), "vec_id", "embedding", k = 6, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    val before = dataFiles
    val probeBefore = probe()
    assert(probeBefore.map(_._1).take(4).toSet ==
      Set(5L, 900000L, 900001L, 900002L), "appended copies must rank first")
    Ivf.compactIndex(spark, dir)
    val after = dataFiles
    assert(after < before, s"compaction must shrink the table: $before -> $after")
    assert(after <= 8, s"expected <= one file per nonempty cell, got $after")
    assert(probe() == probeBefore, "compaction must not change the probe")
    // partition layout survives: cluster= dirs, so pruning still works
    assert(Option(new java.io.File(s"$dir/assigned").listFiles()).toSeq.flatten
      .exists(_.getName.startsWith("cluster=")))
    // crash mid rename-swap (old present, dir gone, committed tmp):
    // recovery must finish the swap, never resurrect old
    val assigned = new java.io.File(s"$dir/assigned")
    val oldDir = new java.io.File(s"$dir/assigned__compact_old")
    assert(oldDir.mkdir())
    java.nio.file.Files.write(new java.io.File(oldDir, "stale").toPath,
      Array[Byte](1)): Unit
    assert(assigned.renameTo(new java.io.File(s"$dir/assigned__compact_tmp")))
    Ivf.compactIndex(spark, dir)
    assert(assigned.exists() && !oldDir.exists() &&
      !new java.io.File(s"$dir/assigned__compact_tmp").exists(),
      "mid-swap recovery must finish the swap")
    assert(probe() == probeBefore, "mid-swap recovery must keep the index")
    // crash between rename(tmp->dir) and delete(old): old dropped, dir kept
    assert(oldDir.mkdir())
    Ivf.compactIndex(spark, dir)
    assert(assigned.exists() && !oldDir.exists())
    assert(probe() == probeBefore, "post-commit recovery must keep the index")
  }

  test("batched top-k equals one single-query probe per query") {
    val e = graft.sources.Tables(spark, sf, "embeddings")
    val index = Ivf.build(e, "vec_id", "embedding", k = 8)
    val qids = Seq(0L, 7L, 23L)
    val batch = Ivf.topKBatch(index,
      e.where($"vec_id".isin(qids: _*)), "vec_id", "embedding", "vec_id",
      k = 5, nprobe = 3)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(batch.keySet == qids.toSet, "every query must answer")
    qids.foreach { qid =>
      val single = Ivf.topK(index, e.where($"vec_id" === qid),
        "vec_id", "embedding", k = 5, nprobe = 3)
        .as[(Long, Double)].collect().toSet
      assert(batch(qid) == single, s"query $qid drifted from single-probe")
      assert(batch(qid).size == 5)
    }
  }
}
