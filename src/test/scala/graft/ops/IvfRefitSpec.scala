package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The detect→repair differential for [[Ivf.refitIndex]]: a planted
  * drift batch degrades BOTH alarms (a15's residual profile, the
  * serving gate's staged agreement), the refit restores both, and a
  * crash at any point of the swap leaves a recoverable state with the
  * old face serving until the commit rolls forward.
  *
  * Numbers are asserted as DIFFERENTIALS (degrade, then recover past
  * the degraded value), never as exact constants: KMeans centroids are
  * not cross-session deterministic, but the fixture's geometry gap
  * (drift blob 50 units away vs unit-scale jitter) dwarfs fit noise.
  */
class IvfRefitSpec extends SparkSpec {
  import spark.implicits._

  // two tight unit-jitter blobs around (0,…) and (5,…): the fit corpus
  private def baseCorpus = (0 until 80).map { i =>
    val c = if (i % 2 == 0) 0.0 else 5.0
    (i.toLong, Seq(c + math.sin(i * 1.7) * 0.3, c + math.cos(i * 1.3) * 0.3,
      c + math.sin(i * 0.9) * 0.3, c + math.cos(i * 0.5) * 0.3))
  }.toDF("vec_id", "embedding")

  // the drift: a third blob FAR from the fit distribution, appended
  // under frozen centroids (ids above every indexed id)
  private def driftBatch = (0 until 80).map { i =>
    (1000L + i, Seq(50.0 + math.sin(i * 2.1) * 0.3,
      -50.0 + math.cos(i * 1.9) * 0.3, 50.0 + math.sin(i * 1.1) * 0.3,
      -50.0 + math.cos(i * 0.7) * 0.3))
  }.toDF("vec_id", "embedding")

  private def buildDriftedIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-refit").toString
    Ivf.buildPersistent(baseCorpus, dir, "vec_id", "embedding", k = 3): Unit
    Ivf.quantizeAssigned(spark, dir, "vec_id", "embedding")
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    Ivf.appendToIndex(driftBatch, dir, "vec_id", "embedding"): Unit
    dir
  }

  private def maxMeanResidual(dir: String): Double =
    Ivf.cellResidualProfile(spark, dir, "embedding")
      .agg(max($"mean_res_norm")).as[Double].head()

  private def stagedAgreement(dir: String): Double =
    graft.streaming.VectorStreams.pqAgreementSnapshot(
      driftBatch, dir, "vec_id", "embedding", k = 10, kCand = 20,
      maxQueries = 8, alertBelow = 0.5)
      .select($"staged_agreement").as[Double].head()

  test("planted drift degrades a15 residuals + staged agreement; refitIndex restores both") {
    val dir = buildDriftedIndex()
    // both alarms fire on the drifted index: the drift blob sits ~78
    // units from its frozen centroid (unit-scale residuals before),
    // and the pre-drift codebooks reconstruct it so poorly that the
    // ADC ranking collapses to near-ties
    val resDrifted = maxMeanResidual(dir)
    val agreeDrifted = stagedAgreement(dir)
    assert(resDrifted > 50.0,
      s"planted drift must inflate residual norms, got $resDrifted")
    // under the pre-drift codebooks the drift blob's reconstructions
    // are near-random among its 80 members: candidate membership ≈
    // hypergeometric 20-of-80 covering the float top-10 (mean 0.25,
    // sd ~0.05 over the 8-query micro-average) — 0.5 is a >4σ bound
    assert(agreeDrifted < 0.5,
      s"planted drift must degrade staged agreement, got $agreeDrifted")

    Ivf.refitIndex(spark, dir, "vec_id", "embedding")

    // repaired: centroids cover the drift blob (unit-scale residuals
    // everywhere), codebooks refit over the new residuals serve a
    // faithful compressed face again
    val resRefit = maxMeanResidual(dir)
    val agreeRefit = stagedAgreement(dir)
    assert(resRefit < 2.0,
      s"refit must restore residual norms, got $resRefit (was $resDrifted)")
    // DIFFERENTIAL bar, per the spec's own doctrine: the drift blob's
    // vectors are near-parallel (pairwise cosines ≈ 1), so the float
    // top-10's stage-1 candidate membership flips on float-reduction
    // ordering under load — an absolute high bar on agreeRefit was
    // observed flaky at 0.7875 in a loaded full-suite run while the
    // repair itself held (residuals 156 → <2, agreement 0.225 →
    // 0.79-1.0). Repaired-vs-drifted must clear a wide gap; the cap
    // keeps the bar below every observed repaired value while staying
    // far above every observed drifted one.
    assert(agreeRefit >= math.min(agreeDrifted + 0.4, 0.75),
      s"refit must restore staged agreement by a wide differential, " +
        s"got $agreeRefit (was $agreeDrifted)")

    // the refit kept every vector (base + append) and the committed
    // parameters: same markers, k centroids, all three faces aligned
    val idx = Ivf.readIndex(spark, dir)
    assert(idx.centroids.length == 3, "refit must keep the committed k")
    assert(idx.assigned.count() == 160L, "refit must keep every vector")
    assert(spark.read.parquet(s"$dir/assigned_int8").count() == 160L,
      "the int8 face must be re-derived over the refit assignment")
    assert(spark.read.parquet(s"$dir/assigned_pq").count() == 160L,
      "the PQ face must be re-encoded over the refit assignment")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    for (m <- Seq("_INDEX_OK_k3_s42_embedding", "_INT8_OK_embedding",
        "_PQ_OK_v3_embedding_m2_k4_s42_r1.0"))
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$m")),
        s"marker $m must survive the refit unchanged")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/__refit_tmp")) &&
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$dir/__refit_old_*"))).toSeq.flatten.isEmpty,
      "no refit debris may remain")
    // a post-refit probe serves appended vectors from the new geometry
    val hits = Ivf.topK(idx, driftBatch.filter($"vec_id" === 1000L),
      "vec_id", "embedding", k = 5).select($"vec_id").as[Long].collect()
    assert(hits.contains(1000L), s"post-refit probe must find the query: ${hits.toSeq}")
    Staged.releaseAll()
  }

  test("refit with resizeTo grows the index; the param marker swaps atomically with the faces") {
    val dir = buildDriftedIndex() // k=3, 160 vectors, int8 + PQ faces
    Ivf.refitIndex(spark, dir, "vec_id", "embedding", resizeTo = Some(5))
    val idx = Ivf.readIndex(spark, dir)
    assert(idx.centroids.length == 5, "resize must take effect")
    assert(idx.assigned.count() == 160L)
    assert(spark.read.parquet(s"$dir/assigned_pq").count() == 160L,
      "the PQ face must re-encode under the resized geometry")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_INDEX_OK_k5_s42_embedding")), "new param marker must commit")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_INDEX_OK_k3_s42_embedding")), "old param marker must retire")
    // readers' param checks hold against the new marker: a k=5 request
    // is a no-op serve, a k=3 request fails loudly (stale-params rule)
    assert(Ivf.buildPersistent(baseCorpus, dir, "vec_id", "embedding",
      k = 5).centroids.length == 5)
    // a resize staged mid-crash promotes with the faces: build a second
    // resize tmp, 'crash', recover — marker and centroids flip together
    Ivf.buildRefitTmp(spark, dir, "vec_id", "embedding", resizeTo = Some(4))
    assert(Ivf.readIndex(spark, dir).centroids.length == 5,
      "pre-recovery the old face (and marker) must still serve")
    assert(Ivf.recoverRefit(spark, dir))
    assert(Ivf.readIndex(spark, dir).centroids.length == 4)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_INDEX_OK_k4_s42_embedding")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(
        s"$dir/_INDEX_OK_k5_s42_embedding")),
      "recovery must promote the staged marker with the faces")
    Staged.releaseAll()
  }

  test("a policy-resized index survives a warm re-run: ensurePersistent serves it, buildPersistent refuses") {
    val dir = buildDriftedIndex() // birth k=3, 160 vectors, all faces
    Ivf.refitIndex(spark, dir, "vec_id", "embedding", resizeTo = Some(5))
    // the daily pipeline's warm day-1 call with its DEFAULT birth k
    // must serve the committed k=5 index untouched — this exact call
    // shipped as buildPersistent once and rebuilt at the birth k on
    // warm replay, tearing the PQ face (still keyed to the k=5 cells)
    // and crashing the NEXT refit on dual _INDEX_OK markers
    val idx = Ivf.ensurePersistent(baseCorpus, dir, "vec_id", "embedding",
      k = 3)
    assert(idx.centroids.length == 5,
      "ensurePersistent must accept the committed policy k")
    assert(idx.assigned.count() == 160L,
      "the appended vectors must survive the warm call")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val markers = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$dir/_INDEX_OK_k*"))).toSeq.flatten.map(_.getPath.getName)
    assert(markers == Seq("_INDEX_OK_k5_s42_embedding"),
      s"exactly the resized marker must remain: $markers")
    // the strict per-parameter face refuses instead of clobbering
    val e = intercept[IllegalArgumentException] {
      Ivf.buildPersistent(baseCorpus, dir, "vec_id", "embedding", k = 3)
    }
    assert(e.getMessage.contains("policy-resized"),
      s"buildPersistent must name the resize hazard: ${e.getMessage}")
    // and the next maintenance refit still parses a single marker —
    // the dual-marker crash this regression shipped as
    Ivf.refitIndex(spark, dir, "vec_id", "embedding")
    assert(Ivf.readIndex(spark, dir).centroids.length == 5)
    Staged.releaseAll()
  }

  test("crash BEFORE commit: the partial build is discarded, the old face never moves") {
    val dir = buildDriftedIndex()
    val pre = Ivf.readIndex(spark, dir).centroids.map(_.toSeq).toSeq
    Ivf.buildRefitTmp(spark, dir, "vec_id", "embedding")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate the crash one write earlier: the commit file never landed
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/__refit_tmp/_REFIT_COMMIT"), false))
    assert(!Ivf.recoverRefit(spark, dir), "an uncommitted refit must be discarded")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/__refit_tmp")))
    assert(Ivf.readIndex(spark, dir).centroids.map(_.toSeq).toSeq == pre,
      "the old face must be byte-identical after discarding an uncommitted refit")
    Staged.releaseAll()
  }

  test("crash AFTER commit: the old face serves until recovery rolls the swap forward") {
    val dir = buildDriftedIndex()
    val pre = Ivf.readIndex(spark, dir).centroids.map(_.toSeq).toSeq
    val preRes = maxMeanResidual(dir)
    Ivf.buildRefitTmp(spark, dir, "vec_id", "embedding")
    // crash point: commit written, swap never ran — every live face is
    // still the old one (probes keep serving it)
    assert(Ivf.readIndex(spark, dir).centroids.map(_.toSeq).toSeq == pre,
      "between commit and swap the OLD face must still serve")
    assert(maxMeanResidual(dir) == preRes)
    // recovery (what any later maintenance call runs first) finishes it
    assert(Ivf.recoverRefit(spark, dir), "a committed refit must roll forward")
    val post = Ivf.readIndex(spark, dir)
    assert(post.centroids.map(_.toSeq).toSeq != pre,
      "recovery must promote the refit centroids")
    assert(post.assigned.count() == 160L)
    assert(maxMeanResidual(dir) < 2.0,
      "the promoted face must be the repaired one")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/__refit_tmp")) &&
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$dir/__refit_old_*"))).toSeq.flatten.isEmpty,
      "recovery must leave no debris")
    // recovery is idempotent: a second call is a no-op
    assert(!Ivf.recoverRefit(spark, dir))
    Staged.releaseAll()
  }

  test("generation seqlock: even when stable, +2 across a refit, readers retry a mid-body flip, stuck-odd fails loudly") {
    val dir = buildDriftedIndex()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def putGen(v: Long): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_IVF_GEN"), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    }
    // a never-refit index is generation 0 (no file) — trivially stable
    assert(Ivf.readGen(fs, dir) == 0L)
    Ivf.refitIndex(spark, dir, "vec_id", "embedding")
    assert(Ivf.readGen(fs, dir) == 2L,
      "a refit must advance the generation by exactly one odd/even cycle")
    // a swap completing between a reader's two fence reads forces the
    // body to re-run against the new committed generation
    var runs = 0
    val out = Ivf.withStableGen(spark, dir) {
      runs += 1
      if (runs == 1) putGen(4L) // simulate a concurrent swap landing mid-body
      runs
    }
    assert(out == 2 && runs == 2,
      s"a generation flip mid-body must retry the body once, ran $runs")
    // a generation stuck ODD (refit crashed mid-swap, recovery not yet
    // run) must fail the reader loudly, never serve a torn face
    putGen(5L)
    val e = intercept[IllegalStateException] {
      Ivf.withStableGen(spark, dir, maxRetries = 2)(1)
    }
    assert(e.getMessage.contains("recoverRefit"), e.getMessage)
    // recovery repairs the odd generation (crash after the swap's last
    // cleanup, before its even-generation write): live faces are
    // authoritative, readers unblock
    assert(!Ivf.recoverRefit(spark, dir))
    assert(Ivf.readGen(fs, dir) == 6L)
    assert(Ivf.withStableGen(spark, dir)(7) == 7)
    Staged.releaseAll()
  }

  test("a marker-less PQ face fails the refit loudly instead of surviving keyed to retired cells") {
    val dir = buildDriftedIndex()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate a pre-v3/crashed face: assigned_pq present, marker gone
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$dir/_PQ_OK_v3_embedding_*"))).toSeq.flatten
      .foreach(st => assert(fs.delete(st.getPath, false)))
    val pre = Ivf.readIndex(spark, dir).centroids.map(_.toSeq).toSeq
    val e = intercept[IllegalArgumentException] {
      Ivf.refitIndex(spark, dir, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("_PQ_OK_v3"), e.getMessage)
    // the refusal is free and clean: no tmp staged, no face moved —
    // pqScoredBatch reads assigned_pq without a marker check, so a
    // swap that silently skipped the face would serve wrong rankings
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/__refit_tmp")),
      "a refused refit must not leave a staged tmp")
    assert(Ivf.readIndex(spark, dir).centroids.map(_.toSeq).toSeq == pre,
      "a refused refit must leave the index untouched")
    // Pq.pqAssign rebuilds the face (marker restored) and the refit
    // then proceeds normally
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    Ivf.refitIndex(spark, dir, "vec_id", "embedding")
    assert(maxMeanResidual(dir) < 2.0)
    Staged.releaseAll()
  }
}
