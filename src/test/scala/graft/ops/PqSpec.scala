package graft.ops

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._
  GraftFunctions.register(spark)

  // planted 2-subspace model over 4-dim vectors: codebooks chosen so
  // every argmin is hand-checkable, including an exact tie
  private def planted = Pq.Model(m = 2, ksub = 3, dsub = 2,
    codebooks = Array(
      Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(2.0, 2.0), Array(-1.0, 0.0), Array(2.0, 2.0)))) // 0 ≡ 2: tie

  test("pq_encode: exact nearest-centroid codes; exact tie takes the lower code") {
    val df = Seq(
      (1L, Seq(0.9, 0.1, 2.1, 1.9)), // sub0 → code 1 (closest to (1,0)); sub1 → tie(0,2) → 0
      (2L, Seq(0.0, 1.2, -0.9, 0.1)) // sub0 → code 2; sub1 → code 1
    ).toDF("id", "v")
    val out = df.select($"id", GraftFunctions.pqEncode($"v".cast("array<double>"),
        typedLit(planted.flat.toSeq), 2, 3).as("codes"))
      .as[(Long, Seq[Byte])].collect().toMap
    assert(out(1L) == Seq[Byte](1, 0), s"row 1 codes: ${out(1L)}")
    assert(out(2L) == Seq[Byte](2, 1), s"row 2 codes: ${out(2L)}")
  }

  test("pq_lookup_sum: exact LUT sum in subspace order") {
    val lut = Seq(10.0, 20.0, 30.0, 1.0, 2.0, 4.0) // m=2, ksub=3
    val out = Seq((1L, Seq(2.toByte, 1.toByte)))
      .toDF("id", "codes")
      .select(GraftFunctions.pqLookupSum($"codes", typedLit(lut), 3))
      .head().getDouble(0)
    assert(out == 32.0, s"lut[0·3+2] + lut[1·3+1] = 30 + 2, got $out") // 30 + 2
  }

  test("model LUTs match hand math; ADC cosine is exact on reconstructions") {
    // query (1,0 | 0,1): dot LUTs against the planted books
    val q = Array(1.0, 0.0, 0.0, 1.0)
    val dot = planted.lutDot(q)
    assert(dot.toSeq == Seq(0.0, 1.0, 0.0, 2.0, 0.0, 2.0), dot.toSeq)
    val n2 = planted.lutN2
    assert(n2.toSeq == Seq(0.0, 1.0, 1.0, 8.0, 1.0, 8.0), n2.toSeq)
    // a vector that IS a reconstruction (codes 1,1 → (1,0,-1,0)):
    // ADC cosine must equal the exact cosine(q, (1,0,-1,0)) = 1/(√2·√2)
    val adc = (dot(0 * 3 + 1) + dot(1 * 3 + 1)) /
      (math.sqrt(2.0) * math.sqrt(n2(0 * 3 + 1) + n2(1 * 3 + 1)))
    val exact = (1.0 * 1 + 0 + 0 + 1.0 * 0) / (math.sqrt(2.0) * math.sqrt(2.0))
    assert(math.abs(adc - exact) < 1e-15, s"adc $adc vs exact $exact")
  }

  test("fitCodebooks: shapes, dim divisibility guard, byte-code cap") {
    val vecs = (0 until 60).map(i =>
      (i.toLong, Seq(i % 5 * 1.0, i % 3 * 1.0, i % 7 * 1.0, i % 2 * 1.0)))
      .toDF("id", "v")
    val m = Pq.fitCodebooks(vecs, "id", "v", m = 2, ksub = 4)
    assert(m.m == 2 && m.ksub == 4 && m.dsub == 2)
    assert(m.codebooks.length == 2 && m.codebooks.forall(_.length == 4))
    assert(m.codebooks.forall(_.forall(_.length == 2)))
    intercept[IllegalArgumentException] {
      Pq.fitCodebooks(vecs, "id", "v", m = 3, ksub = 4) // 4 % 3 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.fitCodebooks(vecs, "id", "v", m = 2, ksub = 300) // > byte range
    }
  }

  test("encodeRows excludes zero-norm vectors; codes land in cluster layout") {
    val assigned = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 1.0), 0),
      (2L, Seq(0.0, 0.0, 0.0, 0.0), 0), // zero-norm: dropped
      (3L, Seq(2.0, 2.0, 2.0, 2.0), 1)
    ).toDF("vec_id", "embedding", "cluster")
    val out = Pq.encodeRows(assigned, "vec_id", "embedding", planted)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(out.keySet == Set(1L, 3L), s"zero-norm row must drop: $out")
    assert(out(3L) == 1, "cluster column must ride through encode")
  }

  test("topKPq end-to-end: exact reconstructions rank exactly as brute-force cosine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-spec").toString
    // corpus = exact codebook reconstructions under a fitted model, so
    // ADC == exact cosine and the PQ top-k must equal brute force.
    // Fit on a grid-shaped corpus first, then rebuild that corpus FROM
    // the fitted codebooks so every vector is exactly representable.
    val raw = (0 until 48).map { i =>
      (i.toLong, Seq((i % 4).toDouble, ((i / 4) % 2).toDouble,
        (i % 3).toDouble, ((i / 3) % 2).toDouble))
    }.toDF("vec_id", "embedding")
    val fitted = Pq.fitCodebooks(raw, "vec_id", "embedding", m = 2, ksub = 4)
    val recon = (0 until 16).map { i =>
      val c0 = fitted.codebooks(0)(i % 4)
      val c1 = fitted.codebooks(1)(i / 4)
      (i.toLong, (c0 ++ c1).toSeq)
    }.filter(_._2.exists(_ != 0.0))
    val corpus = recon.toDF("vec_id", "embedding")
    Ivf.buildPersistent(corpus, dir, "vec_id", "embedding", k = 2): Unit
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    val q = corpus.filter($"vec_id" === recon.head._1)
    val got = Pq.topKPq(spark, dir, q, "vec_id", "embedding",
      k = recon.size, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    // brute force over the same corpus, identical rounding + tie rule
    val qv = recon.head._2.toArray
    val qn = math.sqrt(qv.map(x => x * x).sum)
    def cos(v: Seq[Double]): Double = {
      val d = v.toArray.zip(qv).map { case (a, b) => a * b }.sum
      val n = math.sqrt(v.map(x => x * x).sum)
      BigDecimal(d / (qn * n)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = recon.map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }
    assert(got == want, s"PQ over exact reconstructions must equal brute force\n" +
      s"got:  $got\nwant: $want")
  }

  test("topKPqBatch ≡ the single-query probe, per query of the batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-batch").toString
    val corpus = (0 until 60).map(i =>
      (i.toLong, Seq(math.sin(i * 1.0), math.cos(i * 1.0),
        math.sin(i * 0.7), math.cos(i * 0.7)))).toDF("vec_id", "embedding")
    val index = Ivf.buildPersistent(corpus, dir, "vec_id", "embedding", k = 2)
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    val qids = Seq(0L, 17L, 41L)
    val batch = Pq.topKPqBatch(spark, dir, index,
      corpus.filter($"vec_id".isin(qids: _*)), "vec_id", "embedding",
      "vec_id", k = 5, nprobe = 2)
      .select($"query_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    qids.foreach { qid =>
      val single = Pq.topKPq(spark, dir,
        corpus.filter($"vec_id" === qid), "vec_id", "embedding",
        k = 5, nprobe = 2).as[(Long, Double)].collect().toSeq
      assert(batch(qid).sortBy(t => (-t._2, t._1)) == single,
        s"batched face diverged from single-query on q=$qid")
    }
  }

  test("appendToIndex keeps the pq face in step under the FROZEN codebooks; compaction covers it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-append").toString
    val corpus = (0 until 40).map(i =>
      (i.toLong, Seq(math.sin(i * 1.0), math.cos(i * 1.0),
        math.sin(i * 0.5), math.cos(i * 0.5)))).toDF("vec_id", "embedding")
    Ivf.buildPersistent(corpus, dir, "vec_id", "embedding", k = 2): Unit
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    val booksBefore = spark.read.parquet(s"$dir/pq_codebooks")
      .orderBy("sub", "code").collect().toSeq
    val batch = (100L until 110L).map(i =>
      (i, Seq(math.sin(i * 1.0), math.cos(i * 1.0),
        math.sin(i * 0.5), math.cos(i * 0.5)))).toDF("vec_id", "embedding")
    Ivf.appendToIndex(batch, dir, "vec_id", "embedding"): Unit
    // appended ids present in the pq face, encoded by the SAME model
    val face = spark.read.parquet(s"$dir/assigned_pq")
    assert(face.where($"vec_id" >= 100L).count() == 10,
      "appended vectors must be visible to the pq probe")
    val model = Pq.readCodebooks(spark, dir)
    val expect = Pq.encodeRows(
      face.where($"vec_id" >= 100L).select($"vec_id", $"cluster")
        .join(batch, "vec_id"), "vec_id", "embedding", model)
      .select($"vec_id", $"codes").as[(Long, Seq[Byte])].collect().toMap
    val got = face.where($"vec_id" >= 100L)
      .select($"vec_id", $"codes").as[(Long, Seq[Byte])].collect().toMap
    assert(got == expect, "appended codes must replay under the frozen codebooks")
    assert(spark.read.parquet(s"$dir/pq_codebooks")
      .orderBy("sub", "code").collect().toSeq == booksBefore,
      "append must never refit codebooks")
    // compaction covers the face: contents invariant, files per cell = 1
    val before = face.orderBy("vec_id").collect().toSeq
    Ivf.compactIndex(spark, dir)
    val after = spark.read.parquet(s"$dir/assigned_pq")
      .orderBy("vec_id").collect().toSeq
    assert(after == before, "compaction must not change the pq face contents")
  }

  test("pqAssign is build-once: the marker makes the second call a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-marker").toString
    val corpus = (0 until 40).map(i =>
      (i.toLong, Seq(math.sin(i * 1.0), math.cos(i * 1.0),
        math.sin(i * 0.5), math.cos(i * 0.5)))).toDF("vec_id", "embedding")
    Ivf.buildPersistent(corpus, dir, "vec_id", "embedding", k = 2): Unit
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    val before = spark.read.parquet(s"$dir/assigned_pq")
      .orderBy("vec_id").collect().toSeq
    Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 4)
    val after = spark.read.parquet(s"$dir/assigned_pq")
      .orderBy("vec_id").collect().toSeq
    assert(before == after, "second pqAssign must not rewrite the face")
    // different params must fail loudly, never overwrite under the
    // surviving old marker
    val e = intercept[IllegalArgumentException] {
      Pq.pqAssign(spark, dir, "vec_id", "embedding", m = 2, ksub = 8)
    }
    assert(e.getMessage.contains("different parameters"), e.getMessage)
  }
}
