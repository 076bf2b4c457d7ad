package graft.ops

import graft.SparkSpec

class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  test("label separation matches hand-computed moments") {
    // 2-dim toy: label 0 at (0,0)/(2,0) -> mu=(1,0), msr=(1+1)/2=1
    //           label 1 at (4,4)/(4,6) -> mu=(4,5), msr=(1+1)/2=1
    // corpus mu=(2.5, 2.5); gaps: |(1,0)-(2.5,2.5)|²=8.5, |(4,5)-..|²=8.5
    val df = Seq(
      (0, Seq(0f, 0f)), (0, Seq(2f, 0f)),
      (1, Seq(4f, 4f)), (1, Seq(4f, 6f))).toDF("label", "embedding")
    val out = EmbedStats.labelSeparation(df, "label", "embedding")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(0) == ((2L, 1.0, 8.5)))
    assert(out(1) == ((2L, 1.0, 8.5)))
  }

  test("a tight far-away label shows small radius, large gap") {
    val near = (1 to 20).map(i => (0, Seq((i % 5).toFloat, 0f)))
    val far = (1 to 5).map(_ => (1, Seq(100f, 100f)))
    val out = EmbedStats.labelSeparation(
      (near ++ far).toDF("label", "embedding"), "label", "embedding")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1)._2 == 0.0, "identical vectors have zero radius")
    assert(out(1)._3 > out(0)._3, "far label's centroid gap dominates")
    assert(out(0)._2 > 0.0)
  }

  test("deterministic across repartitionings") {
    val df = graft.sources.Tables(spark, sf, "embeddings")
    val a = EmbedStats.labelSeparation(df, "label", "embedding")
      .as[(Int, Long, Double, Double)].collect().toSet
    val b = EmbedStats.labelSeparation(df.repartition(13), "label", "embedding")
      .as[(Int, Long, Double, Double)].collect().toSet
    assert(a == b)
  }

  test("gramCov matches hand-computed moments on a 2-dim toy") {
    // vectors (1,2), (3,4): E[x0x0]=(1+9)/2=5, E[x0x1]=(2+12)/2=7,
    // E[x1x1]=(4+16)/2=10; means (2,3);
    // cov00=5-4=1, cov01=7-6=1, cov11=10-9=1
    val df = Seq(Tuple1(Seq(1f, 2f)), Tuple1(Seq(3f, 4f))).toDF("embedding")
    val out = EmbedStats.gramCov(df, "embedding")
      .as[(Int, Int, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out.keySet == Set((0, 0), (0, 1), (1, 1)), "upper triangle only")
    assert(out((0, 0)) == ((2L, 5.0, 1.0)))
    assert(out((0, 1)) == ((2L, 7.0, 1.0)))
    assert(out((1, 1)) == ((2L, 10.0, 1.0)))
  }

  test("standardize: hand-computed z-scores; constant component yields NULL") {
    // dims: (1,3) -> mu=2, sigma=1 -> z = -1, +1; (2,4) -> same shape;
    // third component constant -> zero variance -> NULL, never +-Inf
    val df = Seq((1L, Seq(1f, 2f, 7f)), (2L, Seq(3f, 4f, 7f)))
      .toDF("vec_id", "embedding")
    val out = EmbedStats.standardize(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out((1L, 0)) == Some(-1.0) && out((2L, 0)) == Some(1.0))
    assert(out((1L, 1)) == Some(-1.0) && out((2L, 1)) == Some(1.0))
    assert(out((1L, 2)).isEmpty && out((2L, 2)).isEmpty,
      "zero-variance component must be NULL")
  }

  test("pca: planted dominant axis recovered, orthonormal, sign-fixed, Av=λv") {
    // 2-d cloud stretched along (1,1)/√2 with small (1,-1)/√2 noise:
    // the top component must be the diagonal, the second its orthogonal
    val pts = Seq(
      (1L, Seq(3.0f, 3.2f)), (2L, Seq(-3.0f, -2.8f)),
      (3L, Seq(2.0f, 1.9f)), (4L, Seq(-2.0f, -2.1f)),
      (5L, Seq(1.0f, 1.1f)), (6L, Seq(-1.0f, -0.9f)))
      .toDF("vec_id", "embedding")
    val p = EmbedStats.pca(pts, "embedding", k = 2)
    assert(p.eigenvalues(0) > p.eigenvalues(1) && p.eigenvalues(1) >= 0,
      s"eigenvalues must sort descending, non-negative: ${p.eigenvalues.toSeq}")
    val c0 = p.components(0); val c1 = p.components(1)
    val inv = math.sqrt(0.5)
    assert(math.abs(c0(0) - inv) < 1e-2 && math.abs(c0(1) - inv) < 1e-2,
      s"dominant axis must be the (1,1) diagonal: ${c0.toSeq}")
    // orthonormal
    assert(math.abs(c0.zip(c1).map { case (a, b) => a * b }.sum) < 1e-9)
    assert(math.abs(c0.map(x => x * x).sum - 1.0) < 1e-9)
    // sign convention: largest-|entry| positive
    assert(c0(c0.indices.maxBy(i => math.abs(c0(i)))) > 0)
    assert(c1(c1.indices.maxBy(i => math.abs(c1(i)))) > 0)
    // eigen residual ‖Av − λv‖ against the same covariance pca consumed
    val cov = EmbedStats.gramCov(pts, "embedding", roundTo = 9)
      .select($"i", $"j", $"cov").as[(Int, Int, Double)].collect()
    val a = Array.ofDim[Double](2, 2)
    cov.foreach { case (i, j, c) => a(i)(j) = c; a(j)(i) = c }
    (0 until 2).foreach { e =>
      val v = p.components(e)
      val av = Array.tabulate(2)(i => a(i)(0) * v(0) + a(i)(1) * v(1))
      val res = math.sqrt(av.zip(v).map { case (x, y) =>
        val r = x - p.eigenvalues(e) * y; r * r }.sum)
      assert(res < 1e-9, s"eigen residual $res for component $e")
    }
  }

  test("pca projection: hand-computed values, deterministic across partitionings") {
    val pts = Seq(
      (1L, Seq(3.0f, 3.2f)), (2L, Seq(-3.0f, -2.8f)),
      (3L, Seq(2.0f, 1.9f)), (4L, Seq(-2.0f, -2.1f)),
      (5L, Seq(1.0f, 1.1f)), (6L, Seq(-1.0f, -0.9f)))
      .toDF("vec_id", "embedding")
    val p = EmbedStats.pca(pts, "embedding", k = 2)
    val got = EmbedStats.pcaProject(pts, "vec_id", "embedding", p)
      .as[(Long, Int, Double)].collect()
      .map { case (id, c, v) => (id, c) -> v }.toMap
    // hand-replay: value = Σ x_i c_i − offset, rounded half-up to 6
    val raw = pts.as[(Long, Seq[Float])].collect()
    raw.foreach { case (id, x) =>
      p.components.zipWithIndex.foreach { case (c, j) =>
        val want = BigDecimal(
          x.zip(c).foldLeft(0.0) { case (a, (xi, ci)) => a + xi.toDouble * ci }
            - p.offsets(j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got((id, j)) - want) < 1e-12,
          s"projection drifted at ($id, $j): ${got((id, j))} vs $want")
      }
    }
    // centered projections sum to ~0 per component (Σ(x−μ) = 0)
    (0 until 2).foreach { j =>
      val s = got.collect { case ((_, c), v) if c == j => v }.sum
      assert(math.abs(s) < 1e-4, s"component $j projections must center: $s")
    }
    val p2 = EmbedStats.pca(pts.repartition(5), "embedding", k = 2)
    assert(p2.eigenvalues.toSeq == p.eigenvalues.toSeq &&
      p2.components.map(_.toSeq).toSeq == p.components.map(_.toSeq).toSeq &&
      p2.means.toSeq == p.means.toSeq,
      "the fitted artifact must be partitioning-independent")
  }

  test("pca whitening: unit variance per live component, degenerate axis NULL") {
    val pts = Seq(
      (1L, Seq(3.0f, 3.2f)), (2L, Seq(-3.0f, -2.8f)),
      (3L, Seq(2.0f, 1.9f)), (4L, Seq(-2.0f, -2.1f)),
      (5L, Seq(1.0f, 1.1f)), (6L, Seq(-1.0f, -0.9f)))
      .toDF("vec_id", "embedding")
    val p = EmbedStats.pca(pts, "embedding", k = 2)
    val w = EmbedStats.pcaWhiten(pts, "vec_id", "embedding", p, roundTo = 9)
      .as[(Long, Int, Option[Double])].collect()
    assert(w.forall(_._3.isDefined), "both axes are live here")
    // whitening is DEFINED by var(⟨x−μ,cⱼ⟩)/λⱼ = 1: the population
    // variance of each whitened component must be 1
    (0 until 2).foreach { j =>
      val vs = w.collect { case (_, c, Some(v)) if c == j => v }
      val mean = vs.sum / vs.size
      val variance = vs.map(v => (v - mean) * (v - mean)).sum / vs.size
      assert(math.abs(variance - 1.0) < 1e-4,
        s"whitened component $j variance must be 1: $variance")
    }
    // hand-replay one value: whiten = (project − offset)/√λ
    val proj = EmbedStats.pcaProject(pts, "vec_id", "embedding", p,
      roundTo = 9)
      .as[(Long, Int, Double)].collect()
      .map { case (id, c, v) => (id, c) -> v }.toMap
    val wm = w.map { case (id, c, v) => (id, c) -> v.get }.toMap
    wm.foreach { case ((id, j), v) =>
      assert(math.abs(v - proj((id, j)) / math.sqrt(p.eigenvalues(j))) < 1e-6,
        s"whiten/project mismatch at ($id,$j)")
    }
    // a DEGENERATE direction (rank-1 data: second eigenvalue 0) must
    // whiten to NULL, never ±Inf — the x63 zero-variance convention
    val flat = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(2.0f, 4.0f)),
      (3L, Seq(3.0f, 6.0f))).toDF("vec_id", "embedding")
    val pf = EmbedStats.pca(flat, "embedding", k = 2)
    assert(math.abs(pf.eigenvalues(1)) < 1e-6, "rank-1 data: λ2 ≈ 0")
    val wf = EmbedStats.pcaWhiten(flat, "vec_id", "embedding", pf)
      .where($"component" === 1).as[(Long, Int, Option[Double])].collect()
    assert(wf.nonEmpty && wf.forall(_._3.isEmpty),
      s"degenerate axis must be NULL: ${wf.toSeq}")
  }

  test("gramCov is deterministic across repartitionings (decimal grid)") {
    val df = graft.sources.Tables(spark, sf, "embeddings")
    val a = EmbedStats.gramCov(df, "embedding")
      .as[(Int, Int, Long, Double, Double)].collect().toSet
    val b = EmbedStats.gramCov(df.repartition(13), "embedding")
      .as[(Int, Int, Long, Double, Double)].collect().toSet
    assert(a == b && a.size == 64 * 65 / 2)
  }
}
