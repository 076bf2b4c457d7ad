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
    assert(agreeDrifted < 0.9,
      s"planted drift must degrade staged agreement, got $agreeDrifted")

    Ivf.refitIndex(spark, dir, "vec_id", "embedding")

    // repaired: centroids cover the drift blob (unit-scale residuals
    // everywhere), codebooks refit over the new residuals serve a
    // faithful compressed face again
    val resRefit = maxMeanResidual(dir)
    val agreeRefit = stagedAgreement(dir)
    assert(resRefit < 2.0,
      s"refit must restore residual norms, got $resRefit (was $resDrifted)")
    assert(agreeRefit > agreeDrifted && agreeRefit >= 0.9,
      s"refit must restore staged agreement, got $agreeRefit (was $agreeDrifted)")

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
}
