package graft.ops

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("unigram log-prob matches the hand-computed distribution") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = LangModel.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // N=4: p(a)=1/2, p(b)=p(c)=1/4
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (2 * math.log(0.5) + math.log(0.25)) / 3) < 1e-6)
    assert(out(2L)._1 == 1L)
    assert(math.abs(out(2L)._2 - math.log(0.25)) < 1e-6)
  }

  test("common-token documents score above rare-token documents") {
    val docs = (1 to 20).map(i => (i.toLong, "common tokens repeated here")) ++
      Seq((99L, "zxqj vvwk unusual glyph"))
    val out = LangModel.unigramLogProb(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) > out(99L),
      s"common ${out(1L)} must beat rare ${out(99L)}")
  }

  test("score is invariant to partitioning") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val a = LangModel.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val b = LangModel.unigramLogProb(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b, "result must not depend on input partitioning")
  }

  test("perplexity buckets split the corpus into ordered thirds") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val out = LangModel.perplexityBuckets(docs, "doc_id", "text")
      .as[(Long, Long, Double, String)].collect()
    val byBucket = out.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // thirds: no bucket more than a few docs off n/3 (ties move whole
    // grid values together, but avg_logp on the 1e-6 grid rarely ties)
    val n = out.length
    byBucket.values.foreach(v =>
      assert(math.abs(v.length - n / 3.0) < n * 0.05 + 2,
        s"buckets ${byBucket.view.mapValues(_.length).toMap}"))
    // strict ordering: every head score >= every middle >= every tail
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
  }

  test("perplexity buckets on an empty corpus return no rows") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LangModel.perplexityBuckets(empty, "doc_id", "text").count() == 0)
  }

  test("bigram log-prob matches the hand-computed interpolated model") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // unigrams: c(a)=3 c(b)=3 c(c)=1 c(z)=1, N=8
    // bigrams: (a,b)=3 (b,a)=1 (b,c)=1; lambda=0.75
    val pAB = 0.75 * 3 / 3 + 0.25 * 3 / 8   // 0.84375
    val pBA = 0.75 * 1 / 3 + 0.25 * 3 / 8   // 0.34375
    val pBC = 0.75 * 1 / 3 + 0.25 * 1 / 8   // 0.28125
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 -
      (2 * math.log(pAB) + math.log(pBA)) / 3) < 1e-5)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 -
      (math.log(pAB) + math.log(pBC)) / 2) < 1e-5)
    assert(!out.contains(3L), "a 1-token doc has no bigram evidence")
  }

  test("bigram model separates phrase-coherent docs from shuffled ones") {
    // corpus where "spark shuffle" is a fixed collocation; a doc using
    // the same tokens in an unseen order scores lower
    val docs = (1 to 10).map(i => (i.toLong, "the spark shuffle moves data")) ++
      Seq((99L, "shuffle the data spark moves"))
    val out = LangModel.bigramLogProb(docs.toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) > out(99L),
      s"coherent doc must outscore shuffled doc: $out")
  }
}
