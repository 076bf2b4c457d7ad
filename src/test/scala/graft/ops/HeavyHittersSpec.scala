package graft.ops

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 1000 items: "hot" 400x, "warm" 250x, then 350 distinct singletons
  private def corpus: Seq[String] =
    Seq.fill(400)("hot") ++ Seq.fill(250)("warm") ++
      (0 until 350).map(i => s"cold_$i")

  test("every item above N/(k+1) survives, with counts within the bound") {
    val n = corpus.size.toLong
    val k = 10
    val est = HeavyHitters.topK(spark.createDataset(corpus), k).toMap
    val bound = n / (k + 1) // = 90
    assert(est.contains("hot") && est.contains("warm"),
      s"items above $bound must survive, got ${est.keySet}")
    // under-estimates only, by at most the bound
    assert(est("hot") <= 400 && est("hot") >= 400 - bound, s"hot=${est("hot")}")
    assert(est("warm") <= 250 && est("warm") >= 250 - bound, s"warm=${est("warm")}")
    assert(est.size <= k)
  }

  test("guarantee holds under any partitioning (mergeable summary)") {
    val ds = spark.createDataset(scala.util.Random.shuffle(corpus))
    for (parts <- Seq(1, 4, 16)) {
      val est = HeavyHitters.topK(ds.repartition(parts), 10).toMap
      assert(est.contains("hot") && est.contains("warm"),
        s"partitioning $parts lost a heavy hitter: ${est.keySet}")
    }
  }

  test("frequentTokens surfaces stopword-grade tokens from real docs") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val exact = docs
      .select(org.apache.spark.sql.functions.explode(
        TextAnalysis.tokens($"text")).as("token"))
      .groupBy("token").count()
      .orderBy($"count".desc).limit(3)
      .as[(String, Long)].collect().map(_._1).toSet
    val est = HeavyHitters.frequentTokens(docs, "text", k = 40)
      .as[(String, Long)].collect().map(_._1).toSet
    assert(exact.subsetOf(est),
      s"the top-3 exact tokens $exact must appear in the k=40 summary")
  }
}
