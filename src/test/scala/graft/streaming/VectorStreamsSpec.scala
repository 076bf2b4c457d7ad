package graft.streaming

import graft.SparkSpec
import graft.ops.Ivf
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class VecEvent(vec_id: Long, embedding: Seq[Float])

class VectorStreamsSpec extends SparkSpec {
  import spark.implicits._

  // Handcrafted dim-4 corpus: four orthogonal unit vectors, so every
  // planted cosine below is exact arithmetic, not fixture luck.
  private val v1 = Seq(1f, 0f, 0f, 0f)
  private val v2 = Seq(0f, 1f, 0f, 0f)
  private val v3 = Seq(0f, 0f, 1f, 0f)
  private val v4 = Seq(0f, 0f, 0f, 1f)
  // rotation chain in the (v1, v2) plane: cos(v1, v1p) = 0.95 > t,
  // cos(v1p, v1pp) = 0.95 > t, but cos(v1, v1pp) = 2·0.95²−1 = 0.805 < t
  private val c = 0.95f
  private val s = math.sqrt(1 - 0.95 * 0.95).toFloat
  private val v1p = Seq(c, s, 0f, 0f)
  private val v1pp = Seq((2 * c * c - 1).toFloat,
    (2 * c * s).toFloat, 0f, 0f)
  private val u = Seq(0f, 0f, 0.6f, 0.8f)
  private val w = Seq(0.5f, 0.5f, 0.5f, 0.5f)
  private val w2 = w.map(_ * 2) // same direction: cos 1.0, different norm

  private def buildBase(dir: String): Unit = {
    val base = Seq((1L, v1), (2L, v2), (3L, v3), (4L, v4))
      .toDF("vec_id", "embedding")
    Ivf.buildPersistent(base, dir, "vec_id", "embedding", k = 2): Unit
  }

  private def runEpochs(root: String, maxChain: Int,
      epochs: Seq[Seq[VecEvent]]): Unit = {
    buildBase(s"$root/base")
    val input = MemoryStream[VecEvent](spark)
    val q = VectorStreams.semanticDedupStream(input.toDF(),
      s"$root/base", s"$root/index", s"$root/out", s"$root/cp",
      "vec_id", "embedding", threshold = 0.9, maxChain = maxChain)
    try epochs.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("streaming semantic dedup: cross-epoch suppression, survivors-only registration") {
    val root = java.nio.file.Files.createTempDirectory("graft-vstream").toString
    runEpochs(root, maxChain = 0, Seq(
      // epoch 0: near-dup of base v1 dies; novel u survives; exact v2
      // copy dies
      Seq(VecEvent(101L, v1p), VecEvent(102L, u), VecEvent(103L, v2)),
      // epoch 1: v1'' is within t of the DEAD 101 but not of anything
      // kept — it must SURVIVE (dead vectors are not dedup anchors);
      // w survives, its double-norm copy dies within-batch (min id
      // wins); a copy of epoch-0 survivor u dies against the stream
      // index
      Seq(VecEvent(201L, v1pp), VecEvent(202L, w), VecEvent(203L, w2),
        VecEvent(204L, u)),
      // epoch 2: copy of epoch-1 survivor v1'' dies; exact base v1
      // copy still dies; a fresh direction survives
      Seq(VecEvent(301L, v1pp), VecEvent(302L, v1),
        VecEvent(303L, Seq(0.7071f, 0f, -0.7071f, 0f)))))
    val out = spark.read.parquet(s"$root/out")
      .select($"epoch".cast("long"), $"vec_id")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 102L), (1L, 201L), (1L, 202L), (2L, 303L)),
      s"survivor set drifted: $out")
    // the stream index holds exactly the survivors, epoch-attributed,
    // cell-partitioned
    val idx = spark.read.parquet(s"$root/index")
      .select($"epoch".cast("long"), $"vec_id")
      .as[(Long, Long)].collect().toSet
    assert(idx == Set((0L, 102L), (1L, 201L), (1L, 202L), (2L, 303L)),
      s"index registration drifted: $idx")
    // replay idempotence: every epoch is a pure function of (batch,
    // committed prefix) — re-running the last epoch's body rewrites
    // identical content
    val before = spark.read.parquet(s"$root/out/epoch=2")
      .as[(Long, Seq[Float])].collect().toSet
    VectorStreams.processVectorBatch(
      Seq((301L, v1pp), (302L, v1), (303L, Seq(0.7071f, 0f, -0.7071f, 0f)))
        .toDF("vec_id", "embedding"),
      epoch = 2L, s"$root/base", s"$root/index", s"$root/out",
      "vec_id", "embedding", threshold = 0.9, maxChain = 0)
    val after = spark.read.parquet(s"$root/out/epoch=2")
      .as[(Long, Seq[Float])].collect().toSet
    assert(after == before, "replay must rewrite identical content")
  }

  test("multi-probe batch side: a boundary-straddling near-dup of an " +
    "indexed vector is missed at probes=1 and caught at probes=2") {
    // handcrafted index (no KMeans luck): centroids e1/e2, so the
    // Voronoi boundary is the x=y diagonal. Indexed a sits just on the
    // e1 side; the streamed mirror copy b lands primary on the e2 side.
    // cos(a,b) = 0.99992 > t, but the two share NO cell at probes=1.
    val a = Seq(0.80f, 0.79f, 0f, 0f)
    val b = Seq(0.79f, 0.80f, 0f, 0f)
    val cents = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    def plant(root: String, probes: Int): Set[Long] = {
      val assigned = Seq((1L, a)).toDF("vec_id", "embedding")
        .withColumn("cluster", lit(0))
      Ivf.writeIndex(Ivf.Index(cents, assigned), s"$root/base")
      VectorStreams.processVectorBatch(
        Seq((101L, b), (102L, v3)).toDF("vec_id", "embedding"),
        epoch = 0L, s"$root/base", s"$root/index", s"$root/out",
        "vec_id", "embedding", threshold = 0.9, maxChain = 0,
        probes = probes)
      spark.read.parquet(s"$root/out/epoch=0")
        .select($"vec_id").as[Long].collect().toSet
    }
    val root1 = java.nio.file.Files.createTempDirectory("graft-vprobe1").toString
    assert(plant(root1, probes = 1) == Set(101L, 102L),
      "precondition: single-assignment blocking misses the straddling pair")
    val root2 = java.nio.file.Files.createTempDirectory("graft-vprobe2").toString
    assert(plant(root2, probes = 2) == Set(102L),
      "probes=2 must recover the boundary-straddling near-dup")
    // the index side stays single-assigned: the survivor registers in
    // exactly ONE cell even though it probed two
    val reg = spark.read.parquet(s"$root2/index/epoch=0")
      .where($"vec_id" === 102L).count()
    assert(reg == 1L, s"survivor must register once, got $reg rows")
  }

  test("auto-compaction bounds the vector epoch chain with suppression unchanged") {
    def epochDirs(root: String): Seq[String] = {
      val f = new java.io.File(s"$root/index")
      Option(f.listFiles()).toSeq.flatten.map(_.getName)
        .filter(_.startsWith("epoch=")).sorted
    }
    // 6 epochs: each has one copy of a base vector (dies) and one
    // novel vector (survives); epoch e also re-sends epoch e-1's
    // novel vector (dies against the stream index — the suppression
    // that BREAKS if compaction ever loses a survivor). Novels live in
    // the (v3, v4) plane at angles ≥36° apart (pairwise cos ≤ 0.809)
    // and ≥27° off both axes (cos ≤ 0.891 vs base) — nothing crosses
    // the 0.9 threshold except the literal re-sends
    def novel(e: Int): Seq[Float] = {
      val theta = math.toRadians(Seq(27, 63, 117, 153, 207, 243)(e))
      Seq(0f, 0f, math.cos(theta).toFloat, math.sin(theta).toFloat)
    }
    val epochs = (0 until 6).map { e =>
      Seq(VecEvent(1000L + e * 10, v1),
        VecEvent(1001L + e * 10, novel(e))) ++
        (if (e > 0) Seq(VecEvent(1002L + e * 10, novel(e - 1))) else Nil)
    }
    val rootA = java.nio.file.Files.createTempDirectory("graft-vchainA").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-vchainB").toString
    runEpochs(rootA, maxChain = 0, epochs)
    runEpochs(rootB, maxChain = 2, epochs)
    assert(epochDirs(rootA).size == 6, s"uncompacted run: ${epochDirs(rootA)}")
    assert(epochDirs(rootB).size <= 3,
      s"chain must stay bounded: ${epochDirs(rootB)}")
    def survivors(root: String) = spark.read.parquet(s"$root/out")
      .select($"epoch".cast("long"), $"vec_id")
      .as[(Long, Long)].collect().toSet
    assert(survivors(rootA) == survivors(rootB),
      "compaction must not change suppression")
    // novels really did survive and re-sends really did die, so the
    // equality above is not vacuous
    assert(survivors(rootA).map(_._2).count(id => id % 10 == 1) == 6)
    assert(survivors(rootA).map(_._2).forall(id => id % 10 != 2))
  }

  test("vector index compaction preserves content and recovers a crashed swap") {
    val root = java.nio.file.Files.createTempDirectory("graft-vcompact").toString
    val idxP = s"$root/index"
    def writeEpoch(e: Long, rows: Seq[(Long, Seq[Float], Int)]): Unit =
      rows.toDF("vec_id", "embedding", "cluster")
        .repartition(col("cluster"))
        .write.mode("overwrite").partitionBy("cluster")
        .parquet(s"$idxP/epoch=$e")
    writeEpoch(0L, Seq((10L, v1, 0), (11L, v3, 1)))
    writeEpoch(1L, Seq((12L, v2, 0)))
    writeEpoch(2L, Seq((13L, v4, 1)))
    writeEpoch(3L, Seq((14L, u, 1)))
    def content(): Set[(Long, Long)] = spark.read.parquet(idxP)
      .select($"epoch".cast("long"), $"vec_id")
      .as[(Long, Long)].collect().toSet
    val before = spark.read.parquet(idxP)
      .select($"vec_id").as[Long].collect().toSet
    VectorStreams.compactVectorIndex(spark, idxP, upToEpoch = 2L)
    // epochs 0-2 merged under the highest absorbed label; newest intact
    assert(content() == Set((2L, 10L), (2L, 11L), (2L, 12L),
      (2L, 13L), (3L, 14L)), s"merged view drifted: ${content()}")
    assert(spark.read.parquet(idxP).select($"vec_id").as[Long]
      .collect().toSet == before, "compaction must preserve every vector")
    // the merged partition keeps the cluster= layout (pruning survives)
    assert(Option(new java.io.File(s"$idxP/epoch=2").listFiles()).toSeq
      .flatten.exists(_.getName.startsWith("cluster=")))
    // crashed swap: a COMMITTED tmp whose victims are still on disk —
    // the next invocation must finish the swap (victims out, tmp in)
    val fs = new org.apache.hadoop.fs.Path(idxP)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$idxP/epoch=2"),
      new org.apache.hadoop.fs.Path(s"$idxP/__compact_tmp_2")))
    VectorStreams.compactVectorIndex(spark, idxP, upToEpoch = -1L)
    assert(content() == Set((2L, 10L), (2L, 11L), (2L, 12L),
      (2L, 13L), (3L, 14L)), s"recovery drifted: ${content()}")
    // an UNCOMMITTED tmp is debris: discarded, nothing else touched
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idxP/__compact_tmp_1"))
    VectorStreams.compactVectorIndex(spark, idxP, upToEpoch = -1L)
    assert(content() == Set((2L, 10L), (2L, 11L), (2L, 12L),
      (2L, 13L), (3L, 14L)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idxP/__compact_tmp_1")))
  }

  test("ANN recall monitor: planted corpus drift drops recall and fires the alert") {
    val root = java.nio.file.Files.createTempDirectory("graft-vrecall").toString
    // index AND corpus start identical: four orthogonal unit vectors
    val base = Seq((1L, v1), (2L, v2), (3L, v3), (4L, v4))
      .toDF("vec_id", "embedding")
    Ivf.buildPersistent(base, s"$root/base", "vec_id", "embedding", k = 2): Unit
    base.write.mode("overwrite").parquet(s"$root/corpus")
    val input = MemoryStream[VecEvent](spark)
    // nprobe=2 covers BOTH cells, so while corpus ≡ index the probe IS
    // exhaustive: recall must be exactly 1.0, not fixture luck
    val q = VectorStreams.annRecallStream(input.toDF(), s"$root/base",
      s"$root/corpus", s"$root/out", s"$root/cp", "vec_id", "embedding",
      k = 2, nprobe = 2, alertBelow = 0.9)
    try {
      input.addData(VecEvent(901L, v1), VecEvent(902L, v3))
      q.processAllAvailable()
      // drift: exact copies of the query directions land in the CORPUS
      // but not the index — the truth's top-k changes under the index
      val drift = Seq((11L, v1), (13L, v3)).toDF("vec_id", "embedding")
      drift.write.mode("append").parquet(s"$root/corpus")
      input.addData(VecEvent(903L, v1), VecEvent(904L, v3))
      q.processAllAvailable()
    } finally q.stop()
    val e0 = spark.read.parquet(s"$root/out/epoch=0")
      .select($"n_queries", $"n_truth", $"n_hit", $"recall", $"alert")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(e0 == ((2L, 4L, 4L, 1.0, false)),
      s"pre-drift recall must be exactly 1.0: $e0")
    // per query: BF top-2 = {original, appended copy (both cos 1.0)};
    // ANN still returns the index's two — one hit of two per query
    val e1 = spark.read.parquet(s"$root/out/epoch=1")
      .select($"n_queries", $"n_truth", $"n_hit", $"recall", $"alert")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(e1 == ((2L, 4L, 2L, 0.5, true)),
      s"post-drift recall must drop to 0.5 and alert: $e1")
    // replay idempotence: the snapshot is a pure function of (batch,
    // index files, corpus files) — recomputing epoch 1's row off-stream
    // yields the committed row
    val replay = VectorStreams.recallSnapshot(
      Seq((903L, v1), (904L, v3)).toDF("vec_id", "embedding"),
      s"$root/base", s"$root/corpus", "vec_id", "embedding",
      k = 2, nprobe = 2, maxQueries = 32, alertBelow = 0.9)
      .select($"n_queries", $"n_truth", $"n_hit", $"recall", $"alert")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(replay == e1, s"replay drifted: $replay vs $e1")
    // idle epoch: no queries → nothing degraded, recall holds, no alert
    val idle = VectorStreams.recallSnapshot(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      s"$root/base", s"$root/corpus", "vec_id", "embedding",
      k = 2, nprobe = 2, maxQueries = 32, alertBelow = 0.9)
      .select($"n_queries", $"n_truth", $"n_hit", $"recall", $"alert")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(idle == ((0L, 0L, 0L, 1.0, false)), s"idle snapshot drifted: $idle")
    // queries arrived but the corpus path is EMPTY (mispointed monitor):
    // truth is empty — must read as broken (recall 0.0 + alert), never
    // as the healthy 1.0 idle convention
    val emptyCorpus = s"$root/empty_corpus"
    Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
      .write.parquet(emptyCorpus)
    val broken = VectorStreams.recallSnapshot(
      Seq((903L, v1)).toDF("vec_id", "embedding"),
      s"$root/base", emptyCorpus, "vec_id", "embedding",
      k = 2, nprobe = 2, maxQueries = 32, alertBelow = 0.9)
      .select($"n_queries", $"n_truth", $"n_hit", $"recall", $"alert")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(broken == ((1L, 0L, 0L, 0.0, true)),
      s"empty-truth epoch must alert, not read healthy: $broken")
  }

  test("PQ agreement monitor: exhaustive staging reads 1.0; snapshot is replay-pure; idle/broken conventions hold") {
    val root = java.nio.file.Files.createTempDirectory("graft-vpq").toString
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq(math.sin(i * 1.0).toFloat, math.cos(i * 1.0).toFloat,
        math.sin(i * 0.7).toFloat, math.cos(i * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
    val index = graft.ops.Ivf.buildPersistent(corpus, s"$root/base",
      "vec_id", "embedding", k = 2)
    graft.ops.Pq.pqAssign(spark, s"$root/base", "vec_id", "embedding",
      m = 2, ksub = 4)
    val input = MemoryStream[VecEvent](spark)
    // kCand = corpus size ⇒ stage 1's candidates cover every probed
    // row, so the staged top-k EQUALS the float probe's — agreement
    // exactly 1.0, structurally (the exact top-k of a superset of the
    // float probe's scored rows is the float answer itself)
    val q = VectorStreams.pqAgreementStream(input.toDF(), s"$root/base",
      s"$root/out", s"$root/cp", "vec_id", "embedding",
      k = 5, kCand = 60, alertBelow = 0.9)
    try {
      input.addData(VecEvent(0L, Seq(math.sin(0.0).toFloat,
        math.cos(0.0).toFloat, math.sin(0.0).toFloat, math.cos(0.0).toFloat)),
        VecEvent(17L, Seq(math.sin(17.0).toFloat, math.cos(17.0).toFloat,
          math.sin(11.9).toFloat, math.cos(11.9).toFloat)))
      q.processAllAvailable()
    } finally q.stop()
    val e0 = spark.read.parquet(s"$root/out/epoch=0")
      .select($"n_queries", $"n_float", $"n_pq", $"n_staged",
        $"pq_agreement", $"staged_agreement", $"alert")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].head()
    assert(e0._1 == 2L && e0._2 == 10L, s"2 queries × k=5 float rows: $e0")
    assert(e0._6 == 1.0 && !e0._7,
      s"exhaustive staging must reproduce the float probe exactly: $e0")
    assert(e0._5 <= e0._6, s"staged must dominate raw ADC: $e0")
    // replay purity: the committed row ≡ the snapshot recomputed
    // off-stream from the same (batch, persisted artifacts)
    val batch = Seq((0L, Seq(math.sin(0.0).toFloat, math.cos(0.0).toFloat,
        math.sin(0.0).toFloat, math.cos(0.0).toFloat)),
      (17L, Seq(math.sin(17.0).toFloat, math.cos(17.0).toFloat,
        math.sin(11.9).toFloat, math.cos(11.9).toFloat)))
      .toDF("vec_id", "embedding")
    val replay = VectorStreams.pqAgreementSnapshot(batch, s"$root/base",
      "vec_id", "embedding", k = 5, kCand = 60, maxQueries = 32,
      alertBelow = 0.9)
      .select($"n_queries", $"n_float", $"n_pq", $"n_staged",
        $"pq_agreement", $"staged_agreement", $"alert")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].head()
    assert(replay == e0, s"replay drifted: $replay vs $e0")
    // a TIGHT stage (kCand = k) can only lose agreement, never gain —
    // and its staged face still dominates its own raw face
    val tight = VectorStreams.pqAgreementSnapshot(batch, s"$root/base",
      "vec_id", "embedding", k = 5, kCand = 5, maxQueries = 32,
      alertBelow = 0.9)
      .select($"pq_agreement", $"staged_agreement")
      .as[(Double, Double)].head()
    assert(tight._2 <= e0._6 && tight._1 <= tight._2,
      s"tight staging must sit between raw and exhaustive: $tight vs $e0")
    // idle epoch: no queries → healthy by convention
    val idle = VectorStreams.pqAgreementSnapshot(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      s"$root/base", "vec_id", "embedding", k = 5, kCand = 60,
      maxQueries = 32, alertBelow = 0.9)
      .select($"n_queries", $"pq_agreement", $"staged_agreement", $"alert")
      .as[(Long, Double, Double, Boolean)].head()
    assert(idle == ((0L, 1.0, 1.0, false)), s"idle snapshot drifted: $idle")
    // queries against an EMPTY float face (mispointed/torn index) must
    // read broken — 0.0 + alert — never the healthy idle convention
    val root2 = java.nio.file.Files.createTempDirectory("graft-vpq2").toString
    graft.ops.Ivf.buildPersistent(corpus, s"$root2/base",
      "vec_id", "embedding", k = 2): Unit
    graft.ops.Pq.pqAssign(spark, s"$root2/base", "vec_id", "embedding",
      m = 2, ksub = 4)
    spark.read.parquet(s"$root/base/assigned").limit(0)
      .write.mode("overwrite").parquet(s"$root2/base/assigned")
    val broken = VectorStreams.pqAgreementSnapshot(batch, s"$root2/base",
      "vec_id", "embedding", k = 5, kCand = 60, maxQueries = 32,
      alertBelow = 0.9)
      .select($"n_float", $"pq_agreement", $"staged_agreement", $"alert")
      .as[(Long, Double, Double, Boolean)].head()
    assert(broken == ((0L, 0.0, 0.0, true)),
      s"empty-float-face epoch must alert, not read healthy: $broken")
    index.hashCode(): Unit
  }

  test("staged serving stream: per-epoch ≡ topKStagedBatch, replay-pure, maintenance lands at the epoch boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-vserve").toString
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq(math.sin(i * 1.0).toFloat, math.cos(i * 1.0).toFloat,
        math.sin(i * 0.7).toFloat, math.cos(i * 0.7).toFloat)))
      .toDF("vec_id", "embedding")
    graft.ops.Ivf.buildPersistent(corpus, s"$root/base",
      "vec_id", "embedding", k = 2): Unit
    graft.ops.Pq.pqAssign(spark, s"$root/base", "vec_id", "embedding",
      m = 2, ksub = 4)
    def ev(i: Long) = VecEvent(i, Seq(math.sin(i * 1.0).toFloat,
      math.cos(i * 1.0).toFloat, math.sin(i * 0.7).toFloat,
      math.cos(i * 0.7).toFloat))
    val input = MemoryStream[VecEvent](spark)
    val q = VectorStreams.stagedServeStream(input.toDF(), s"$root/base",
      s"$root/out", s"$root/cp", "vec_id", "embedding",
      k = 5, kCand = 10, nprobe = 2)
    try {
      input.addData(ev(3), ev(41))
      q.processAllAvailable()
      // maintenance between epochs: append a new vector, then query
      // FOR it — the next epoch serves it with no restart
      graft.ops.Ivf.appendToIndex(
        Seq((1000L, Seq(math.sin(3.0).toFloat + 0.001f,
          math.cos(3.0).toFloat, math.sin(2.1).toFloat,
          math.cos(2.1).toFloat))).toDF("vec_id", "embedding"),
        s"$root/base", "vec_id", "embedding"): Unit
      input.addData(ev(3))
      q.processAllAvailable()
    } finally q.stop()
    // epoch 0 ≡ the batch face over the SAME persisted faces... but the
    // index has since been appended to — so the differential replays
    // epoch 1 (the current face) and pins epoch 0's structure instead
    val e0 = spark.read.parquet(s"$root/out/epoch=0")
      .select($"query_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(e0.map(_._1) == Set(3L, 41L) &&
      e0.count(_._1 == 3L) == 5 && e0.count(_._1 == 41L) == 5,
      s"epoch 0 must hold top-5 per query: $e0")
    // each query's own vector is its best hit (cos 1.0, id tiebreak)
    assert(e0.contains((3L, 3L, 1.0)) && e0.contains((41L, 41L, 1.0)),
      s"self-hit missing: $e0")
    val e1 = spark.read.parquet(s"$root/out/epoch=1")
      .select($"query_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(e1.exists(r => r._2 == 1000L),
      s"the appended vector must be servable next epoch: $e1")
    // stream ≡ batch: replay epoch 1 off-stream from the same faces
    val batch = Seq((3L, Seq(math.sin(3.0).toFloat, math.cos(3.0).toFloat,
      math.sin(2.1).toFloat, math.cos(2.1).toFloat)))
      .toDF("vec_id", "embedding")
    val index = graft.ops.Ivf.readIndex(spark, s"$root/base")
    val want = graft.ops.Pq.topKStagedBatch(spark, s"$root/base", index,
        batch, "vec_id", "embedding", "vec_id", k = 5, kCand = 10,
        nprobe = 2)
      .select($"query_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(e1 == want, s"stream diverged from the batch face: $e1 vs $want")
    // replay purity: re-running the epoch rewrites identical rows
    VectorStreams.stagedServeBatch(batch, 1L, s"$root/base", s"$root/out",
      "vec_id", "embedding", k = 5, kCand = 10, nprobe = 2)
    val again = spark.read.parquet(s"$root/out/epoch=1")
      .select($"query_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(again == e1, s"epoch replay drifted: $again vs $e1")
    // an empty epoch commits an empty, schema-complete result
    VectorStreams.stagedServeBatch(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      99L, s"$root/base", s"$root/out", "vec_id", "embedding",
      k = 5, kCand = 10, nprobe = 2)
    val e99 = spark.read.parquet(s"$root/out/epoch=99")
    assert(e99.isEmpty && e99.columns.toSeq ==
      Seq("query_id", "vec_id", "cos_sim"),
      s"empty epoch must commit schema-complete: ${e99.columns.toSeq}")
    graft.ops.Staged.releaseAll()
  }

  test("cross-pair probe: index side partition-prunes and never shuffles") {
    val root = java.nio.file.Files.createTempDirectory("graft-vplan").toString
    buildBase(s"$root/base")
    val index = Ivf.readIndex(spark, s"$root/base")
    val probe = Seq((100L, v1p, 0), (101L, u, 1))
      .toDF("vec_id", "embedding", "cluster")
    val pruned = index.assigned.where(col("cluster").isInCollection(Seq(0)))
    val plan = VectorStreams.crossPairs(pruned, probe,
      "vec_id", "embedding", threshold = 0.9)
      .queryExecution.executedPlan
    def flat(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flat(a.executedPlan)
      case other => other +: other.children.flatMap(flat)
    }
    val nodes = flat(plan)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"index side must not shuffle:\n$plan")
    val scan = nodes.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.partitionFilters.exists(_.references.exists(_.name == "cluster")) => f
    }
    assert(scan.isDefined, s"no partition-pruned index scan in:\n$plan")
    assert(scan.get.selectedPartitions.partitionCount <= 1,
      "scan must read only the probed cells")
  }

  // ---- the refit maintenance loop: IvfRefitSpec's planted-drift
  // fixture driven through the STREAMING consumer. Base = two tight
  // unit-jitter blobs the codebooks were fit on; drift = a far blob
  // appended under frozen centroids, whose reconstructions collapse
  // the ADC ranking. Assertions are DIFFERENTIALS (the refit-spec
  // doctrine): repaired agreement must clear the drifted value by a
  // wide gap, residuals must return to unit scale.
  private def driftBase = (0 until 80).map { i =>
    val c = if (i % 2 == 0) 0.0 else 5.0
    (i.toLong, Seq(c + math.sin(i * 1.7) * 0.3, c + math.cos(i * 1.3) * 0.3,
      c + math.sin(i * 0.9) * 0.3, c + math.cos(i * 0.5) * 0.3))
  }.toDF("vec_id", "embedding")

  private def driftBlob = (0 until 80).map { i =>
    (1000L + i, Seq(50.0 + math.sin(i * 2.1) * 0.3,
      -50.0 + math.cos(i * 1.9) * 0.3, 50.0 + math.sin(i * 1.1) * 0.3,
      -50.0 + math.cos(i * 0.7) * 0.3))
  }.toDF("vec_id", "embedding")

  test("refit maintenance loop: debounced detect → repair mid-stream → healthy epochs, no double-fire") {
    val root = java.nio.file.Files.createTempDirectory("graft-vmaint").toString
    val dir = s"$root/index"
    Ivf.buildPersistent(driftBase, dir, "vec_id", "embedding", k = 3): Unit
    Ivf.quantizeAssigned(spark, dir, "vec_id", "embedding")
    graft.ops.Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    Ivf.appendToIndex(driftBlob, dir, "vec_id", "embedding"): Unit
    val mon = s"$root/mon"
    val ref = s"$root/ref"
    // the whole drift blob arrives as queries; the snapshot's own
    // deterministic sample (lowest 8 ids) is what gets measured
    val queryBatch = driftBlob
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .as[VecEvent].collect().toSeq
    val input = MemoryStream[VecEvent](spark)
    val q = VectorStreams.refitMaintenanceStream(input.toDF(), dir, mon,
      ref, s"$root/cp", "vec_id", "embedding", k = 10, kCand = 20,
      maxQueries = 8, alertBelow = 0.5, debounce = 2)
    try (0 until 3).foreach { _ =>
      input.addData(queryBatch: _*); q.processAllAvailable()
    } finally q.stop()
    def row(path: String) = spark.read.parquet(path)
      .select($"staged_agreement", $"alert")
      .as[(Double, Boolean)].head()
    val e0 = row(s"$mon/epoch=0")
    val e1 = row(s"$mon/epoch=1")
    val e2 = row(s"$mon/epoch=2")
    assert(e0._2 && e1._2, s"drift epochs must alert: $e0 / $e1")
    // debounce: one alerting epoch must not fire — the repair record
    // starts exactly at epoch 1 (the second consecutive alert)
    assert(VectorStreams.epochsBefore(spark, ref, Long.MaxValue) == Seq(1L),
      "the refit must fire at epoch 1 and only there")
    val qc = row(s"$ref/epoch=1")
    assert(qc._1 >= e1._1 + 0.3,
      s"the repair must clear the drifted agreement by a wide gap: " +
        s"${qc._1} vs ${e1._1}")
    // post-repair epochs read the promoted faces (the stream re-reads
    // the index per epoch) and come back healthy — and their alerts
    // are fresh evidence, so the guard kept the loop from re-firing
    assert(!e2._2 && e2._1 >= e1._1 + 0.3,
      s"post-repair epoch must read healthy: $e2 vs drifted $e1")
    assert(Ivf.cellResidualProfile(spark, dir, "embedding")
      .agg(max($"mean_res_norm")).as[Double].head() < 2.0,
      "the promoted index must be the repaired one")
    assert(Ivf.readIndex(spark, dir).assigned.count() == 160L,
      "the repair must keep every vector")
    // crash-replay of the firing epoch AFTER the repair: the rewritten
    // monitor row reads the repaired index (healthy), the committed
    // refit record guards the window — the actuator never double-fires
    assert(!VectorStreams.maintainEpoch(driftBlob, 1L, dir, mon, ref,
      "vec_id", "embedding", k = 10, kCand = 20, maxQueries = 8,
      alertBelow = 0.5, debounce = 2),
      "replaying the firing epoch must not re-fire the repair")
    graft.ops.Staged.releaseAll()
  }

  // ---- the unified trigger table (r18): geometry axes that must
  // repair even while the serving-agreement gate stays green. Base =
  // four 10-vector clusters on the ±100 axes of dims 1/2; the hot blob
  // is a 360-point grid spread over dims 3/4 — orthogonal DIRECTIONS,
  // so base queries' cosine top-10 never meets a blob row and the
  // agreement gate cannot be the cause of the fire.
  private def balanceBase = (0 until 40).map { i =>
    val axis = i % 4
    val c = Seq.tabulate(4)(d =>
      (if (d == axis / 2) (if (axis % 2 == 0) 100.0 else -100.0) else 0.0) +
        math.sin(i * 1.3 + d) * 0.3)
    (i.toLong, c)
  }.toDF("vec_id", "embedding")

  private def balanceBlob = (0 until 360).map { i =>
    // dim-0 biased +0.5 so EVERY blob point's nearest centroid is the
    // +100-axis cell (a symmetric jitter would spread it 4 ways)
    (1000L + i, Seq(0.5 + math.sin(i * 0.7) * 0.1, math.cos(i * 1.1) * 0.2,
      (i % 19) * 0.5, ((i * 7) % 19) * 0.5))
  }.toDF("vec_id", "embedding")

  test("balance trigger: a hot-cell blob repairs mid-stream while agreement stays green; post-refit reads balanced") {
    val root = java.nio.file.Files.createTempDirectory("graft-vbal").toString
    val dir = s"$root/index"
    Ivf.buildPersistent(balanceBase, dir, "vec_id", "embedding", k = 4): Unit
    graft.ops.Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    // the blob lands whole in ONE Voronoi cell (every centroid is ~100
    // away): 370/400 vectors through one cell — the latency-tail skew
    // a20 exists for, invisible to drift (residuals small) and to the
    // serving gate (no base query ranks a blob row)
    Ivf.appendToIndex(balanceBlob, dir, "vec_id", "embedding"): Unit
    val (mon, ref) = (s"$root/mon", s"$root/ref")
    val queryBatch = balanceBase
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .as[VecEvent].collect().toSeq
    val input = MemoryStream[VecEvent](spark)
    val q = VectorStreams.refitMaintenanceStream(input.toDF(), dir, mon,
      ref, s"$root/cp", "vec_id", "embedding", k = 10, kCand = 20,
      maxQueries = 8, alertBelow = 0.2, debounce = 2,
      // 400 vectors at targetCell=20 want k=20 — the size policy rides
      // the fired repair, splitting the hot mass across ~16 cells
      resizePolicy = Some((20, 4)), balanceCeiling = Some(2.5))
    try (0 until 3).foreach { _ =>
      input.addData(queryBatch: _*); q.processAllAvailable()
    } finally q.stop()
    def row(path: String) = spark.read.parquet(path)
      .select($"alert", $"balance_alert", $"max_over_mean")
      .as[(Boolean, Boolean, Double)].head()
    val e0 = row(s"$mon/epoch=0")
    val e1 = row(s"$mon/epoch=1")
    assert(!e0._1 && !e1._1,
      s"the agreement gate must stay green — the fire is balance-owned: $e0 / $e1")
    assert(e0._2 && e1._2 && e0._3 > 2.5,
      s"the hot cell must alert the balance gauge: $e0 / $e1")
    assert(VectorStreams.epochsBefore(spark, ref, Long.MaxValue) == Seq(1L),
      "the repair must fire at the second consecutive balance alert")
    val qc = row(s"$ref/epoch=1")
    assert(qc._3 < e1._3 && !qc._2,
      s"post-refit the index must read balanced: ${qc._3} vs planted ${e1._3}")
    assert(Ivf.readIndex(spark, dir).centroids.length == 20,
      "the size policy must ride the balance-triggered repair")
    // post-repair epoch reads the promoted geometry and stays quiet
    val e2 = row(s"$mon/epoch=2")
    assert(!e2._1 && !e2._2, s"post-repair epoch must read healthy: $e2")
    graft.ops.Staged.releaseAll()
  }

  test("residual trigger: drift the agreement gate can't see repairs mid-stream") {
    // the drifted blob inflates its cell's residuals (frozen centroids),
    // but the QUERY stream is the in-fit base sample whose cosine
    // neighborhoods never meet blob rows — agreement green, residual red
    val root = java.nio.file.Files.createTempDirectory("graft-vres").toString
    val dir = s"$root/index"
    Ivf.buildPersistent(driftBase, dir, "vec_id", "embedding", k = 3): Unit
    graft.ops.Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    Ivf.appendToIndex(driftBlob, dir, "vec_id", "embedding"): Unit
    val (mon, ref) = (s"$root/mon", s"$root/ref")
    val queryBatch = driftBase
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .as[VecEvent].collect().toSeq
    val input = MemoryStream[VecEvent](spark)
    val q = VectorStreams.refitMaintenanceStream(input.toDF(), dir, mon,
      ref, s"$root/cp", "vec_id", "embedding", k = 10, kCand = 20,
      maxQueries = 8, alertBelow = 0.2, debounce = 2,
      residualCeiling = Some(2.0))
    try (0 until 3).foreach { _ =>
      input.addData(queryBatch: _*); q.processAllAvailable()
    } finally q.stop()
    def row(path: String) = spark.read.parquet(path)
      .select($"alert", $"residual_alert", $"max_mean_residual")
      .as[(Boolean, Boolean, Double)].head()
    val e0 = row(s"$mon/epoch=0")
    val e1 = row(s"$mon/epoch=1")
    assert(!e0._1 && !e1._1,
      s"the agreement gate must stay green — the fire is residual-owned: $e0 / $e1")
    assert(e0._2 && e1._2 && e0._3 > 2.0,
      s"the planted drift must alert the residual gauge: $e0 / $e1")
    assert(VectorStreams.epochsBefore(spark, ref, Long.MaxValue) == Seq(1L),
      "the repair must fire at the second consecutive residual alert")
    val qc = row(s"$ref/epoch=1")
    assert(qc._3 < 2.0 && !qc._2,
      s"post-refit residuals must return to unit scale: ${qc._3}")
    val e2 = row(s"$mon/epoch=2")
    assert(!e2._2, s"post-repair epoch must read undrifted: $e2")
    graft.ops.Staged.releaseAll()
  }

  test("maintenance lease: a second loop refuses loudly; takeover recovers a crashed owner; the fence retires it") {
    val root = java.nio.file.Files.createTempDirectory("graft-vlease").toString
    val dir = s"$root/index"
    Ivf.buildPersistent(driftBase, dir, "vec_id", "embedding", k = 3): Unit
    graft.ops.Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    // first caller commits the lease
    VectorStreams.requireMaintLease(spark, dir, "loop-a")
    assert(VectorStreams.maintLease(spark, dir) == Some((1L, "loop-a")))
    // the committed owner re-enters freely (every epoch re-verifies)
    VectorStreams.requireMaintLease(spark, dir, "loop-a")
    // an accidental second loop refuses loudly — including through the
    // real epoch body
    intercept[IllegalStateException] {
      VectorStreams.requireMaintLease(spark, dir, "loop-b")
    }
    val ex = intercept[IllegalStateException] {
      VectorStreams.maintainEpoch(driftBase, 0L, dir, s"$root/mon",
        s"$root/ref", "vec_id", "embedding", k = 10, kCand = 20,
        maxQueries = 8, alertBelow = 0.5, debounce = 2,
        owner = Some("loop-b"))
    }
    assert(ex.getMessage.contains("loop-a") &&
      ex.getMessage.contains("takeoverMaintLease"),
      s"the refusal must name the owner and the recovery path: ${ex.getMessage}")
    // loop-a crashes; the operator recovers the lease for loop-b with a
    // bumped fence...
    assert(VectorStreams.takeoverMaintLease(spark, dir, "loop-b") == 2L)
    VectorStreams.requireMaintLease(spark, dir, "loop-b")
    // ...after which the RESUMED old owner is the one that refuses —
    // the fence moves only through takeovers, never silently back
    intercept[IllegalStateException] {
      VectorStreams.requireMaintLease(spark, dir, "loop-a")
    }
    // a TORN lease file (crash mid-write) must refuse every loop but
    // never brick its own recovery: takeover bumps past it
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_MAINT_OWNER"), true)
    out.write("garb".getBytes("UTF-8")); out.close()
    assert(VectorStreams.maintLease(spark, dir) == Some((0L, "")),
      "a torn lease must parse to the unownable sentinel")
    intercept[IllegalStateException] {
      VectorStreams.requireMaintLease(spark, dir, "loop-b")
    }
    assert(VectorStreams.takeoverMaintLease(spark, dir, "loop-c") == 1L)
    VectorStreams.requireMaintLease(spark, dir, "loop-c")
    graft.ops.Staged.releaseAll()
  }

  test("maintenance resize policy: a fired repair lands the kForCells k in the same swap") {
    val root = java.nio.file.Files.createTempDirectory("graft-vresize").toString
    val dir = s"$root/index"
    Ivf.buildPersistent(driftBase, dir, "vec_id", "embedding", k = 3): Unit
    Ivf.quantizeAssigned(spark, dir, "vec_id", "embedding")
    graft.ops.Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    Ivf.appendToIndex(driftBlob, dir, "vec_id", "embedding"): Unit
    // policy (targetCell=16, kMin=4): 160 vectors want k=10, a >2x gap
    // from the committed k=3 — the fired repair must ride the resize
    val policy = Some((16, 4))
    assert(!VectorStreams.maintainEpoch(driftBlob, 0L, dir, s"$root/mon",
      s"$root/ref", "vec_id", "embedding", k = 10, kCand = 20,
      maxQueries = 8, alertBelow = 0.5, debounce = 2, policy),
      "one alerting epoch must not fire under debounce 2")
    assert(Ivf.readIndex(spark, dir).centroids.length == 3,
      "no repair, no resize")
    assert(VectorStreams.maintainEpoch(driftBlob, 1L, dir, s"$root/mon",
      s"$root/ref", "vec_id", "embedding", k = 10, kCand = 20,
      maxQueries = 8, alertBelow = 0.5, debounce = 2, policy),
      "the second consecutive alert must fire")
    val idx = Ivf.readIndex(spark, dir)
    assert(idx.centroids.length == 10,
      s"the repair must land the policy k: ${idx.centroids.length}")
    assert(idx.assigned.count() == 160L, "resize must keep every vector")
    assert(spark.read.parquet(s"$dir/assigned_pq").count() == 160L,
      "the PQ face must re-encode under the resized geometry")
    assert(VectorStreams.epochsBefore(spark, s"$root/ref", Long.MaxValue)
      == Seq(1L), "exactly one repair record")
    graft.ops.Staged.releaseAll()
  }
}
