package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("cosine of a vector with itself is 1") {
    val self = emb.limit(5)
      .select(Similarity.cosine($"embedding", $"embedding").as("c"))
      .as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
  }

  test("dot product matches a hand-computed value") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val d = df.select(Similarity.dot($"a", $"b").as("d")).as[Double].head()
    assert(d == 32.0)
  }

  test("brute-force top-k: query vector ranks itself first") {
    val top = Similarity.bruteForceTopK(
      emb, emb.filter($"vec_id" === 7L), "vec_id", "embedding", k = 10)
      .select("vec_id").as[Long].collect()
    assert(top.head == 7L)
    assert(top.length == 10)
  }

  test("batched brute-force top-k equals one bruteForceTopK per query") {
    val queries = emb.filter($"vec_id" % 200 === 0L)
    val batch = Similarity.bruteForceTopKBatch(emb, queries,
      "vec_id", "embedding", "vec_id", k = 5)
      .select($"query_id", $"vec_id", $"cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    val qids = queries.select($"vec_id").as[Long].collect()
    assert(qids.length >= 2, "need a real work list")
    val singles = qids.flatMap { q =>
      Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === q),
        "vec_id", "embedding", k = 5)
        .as[(Long, Double)].collect().map { case (id, cs) => (q, id, cs) }
    }.toSet
    assert(batch == singles, "batch must replay the per-query probe exactly")
  }

  test("LSH top-k recall vs brute force") {
    val k = 20
    val query = emb.filter($"vec_id" === 0L)
    val exact = Similarity.bruteForceTopK(emb, query, "vec_id", "embedding", k)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(emb, query, "vec_id", "embedding", k, nBits = 6)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / k
    // near-random vectors are the worst case for sign-LSH; require the
    // bucketing to beat random candidate selection by a wide margin
    assert(approx.contains(0L), "query's own bucket must contain itself")
    assert(recall >= 0.2, s"recall $recall too low")
  }

  test("zero-norm corpus vectors never reach top-k (NaN guard)") {
    // cosine(zero, q) = 0/0 = NaN, which Spark orders ABOVE every number:
    // without the norm guard the zero vector would lead the ranking
    val dim = 64
    val zero = Seq((9999L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    val poisoned = emb.select("vec_id", "embedding").unionByName(zero)
    val query = emb.filter($"vec_id" === 7L)
    val bf = Similarity.bruteForceTopK(poisoned, query, "vec_id", "embedding", k = 10)
      .select("vec_id").as[Long].collect()
    assert(bf.length == 10 && !bf.contains(9999L))
    assert(bf.head == 7L, "self-similarity must still rank first")
    val lsh = Similarity.lshTopK(poisoned, query, "vec_id", "embedding", k = 10, nBits = 6)
      .select("vec_id").as[Long].collect()
    assert(!lsh.contains(9999L))
  }

  test("blocked cosine pairs are symmetric-free and above threshold") {
    val pairs = Similarity.cosinePairsBlocked(
      emb, "vec_id", "embedding", "label", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2 && p._3 > 0.3))
  }

  test("lsh bucket is deterministic and respects the bit width") {
    val planes = Similarity.hyperplanes(nBits = 8, dim = 64)
    val b1 = emb.select(Similarity.lshBucket($"embedding", planes).as("b"))
      .as[Long].collect()
    val b2 = emb.repartition(5).select(Similarity.lshBucket($"embedding", planes).as("b"))
      .as[Long].collect()
    assert(b1.sorted.toSeq == b2.sorted.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("LSH near-dup pairs: precision 1.0, recall vs blocked-exact") {
    // ground truth: all pairs above 0.3 (exact O(n^2) on the small fixture)
    val exact = Similarity.cosinePairsBlocked(
      emb.withColumn("all", org.apache.spark.sql.functions.lit(1)),
      "vec_id", "embedding", "all", threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.3, nBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), "every reported pair must be a true pair")
    if (exact.nonEmpty) {
      val recall = (exact intersect approx).size.toDouble / exact.size
      assert(recall >= 0.1, s"recall $recall: multi-probe must find some pairs")
    }
  }

  test("nBitsForCorpus holds expected bucket occupancy ~constant") {
    assert(Similarity.nBitsForCorpus(500) == 8, "fixture lands on the floor")
    assert(Similarity.nBitsForCorpus(40000) == 14)
    assert(Similarity.nBitsForCorpus(1L << 40) == 32, "cap")
    // below the cap, expected occupancy never exceeds the target after
    // the ceil (the linearity guarantee the policy exists for)
    for (n <- Seq(10000L, 1000000L, 100000000L, 1000000000L)) {
      val bits = Similarity.nBitsForCorpus(n)
      assert(n.toDouble / (1L << bits) <= 4.0,
        s"n=$n bits=$bits occupancy ${n.toDouble / (1L << bits)}")
    }
  }

  test("kNN graph: rank invariants hold for every source") {
    val k = 5
    val g = Similarity.lshKnnGraph(emb, "vec_id", "embedding", k = k, nBits = 8)
      .select("src_id", "nbr_id", "cos_sim", "rk")
      .as[(Long, Long, Double, Int)].collect()
    val bySrc = g.groupBy(_._1)
    assert(bySrc.nonEmpty && bySrc.values.forall(_.length <= k))
    bySrc.values.foreach { rows =>
      val sorted = rows.sortBy(_._4).toSeq
      assert(sorted.map(_._4) == (1 to sorted.length), "rk must be dense from 1")
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a._3 >= b._3 },
        "cos_sim must be non-increasing in rk")
      assert(rows.forall(r => r._2 != r._1), "no self-edges")
    }
  }

  test("kNN graph is EXACT over its candidate set, with measured recall") {
    // driver-side differential replay on the tiny fixture: from the
    // dumped (id, bucket, vec) signatures, the graph must equal the
    // exact per-source top-k over the directed Hamming<=1 candidates —
    // same rounded-cosine ranking, same nbr_id tie-break
    val k = 5
    val kept = Similarity.lshNearDupBuckets(emb, "vec_id", "embedding", nBits = 8)
    val sigs = kept.select($"id", $"bucket", $"v")
      .as[(Long, Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = sigs.flatMap { case (id, bkt, v) =>
      sigs.filter { case (id2, bkt2, _) =>
        id2 != id && java.lang.Long.bitCount(bkt ^ bkt2) <= 1 }
        .map { case (id2, _, v2) => (id2, cos(v, v2)) }
        .sortBy { case (id2, c) => (-c, id2) }
        .take(k).zipWithIndex
        .map { case ((id2, c), i) => (id, id2, c, i + 1) }
    }.toSet
    val got = Similarity.lshKnnGraphFrom(kept, k = k, nBits = 8)
      .select("src_id", "nbr_id", "cos_sim", "rk")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == expected, s"graph drifted: ${(got diff expected).take(3)} vs ${(expected diff got).take(3)}")
    // usefulness floor: fraction of TRUE top-k neighbors (exact over the
    // whole corpus, no bucketing) that the graph recovers
    val ids = sigs.map(_._1)
    val vecs = sigs.map(s => s._1 -> s._3).toMap
    val truth = ids.flatMap { id =>
      ids.filter(_ != id).map(j => (id, j, cos(vecs(id), vecs(j))))
        .sortBy { case (_, j, c) => (-c, j) }.take(k)
        .map { case (i2, j, _) => (i2, j) }
    }.toSet
    // near-random vectors are sign-LSH's worst case (same rationale as
    // the near-dup floor above); measured 0.114 on the fixture
    val recall = got.map(r => (r._1, r._2)).count(truth).toDouble / truth.size
    assert(recall >= 0.1, s"corpus-wide recall $recall too low for a useful graph")
  }
}
