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
}
