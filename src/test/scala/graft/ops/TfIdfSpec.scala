package graft.ops

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = ((1 to 8).map(i =>
    (i.toLong, s"common phrase filler$i")) ++ Seq(
    (9L, "rare gem alpha"),
    (10L, "rare gem beta"))).toDF("doc_id", "text")

  test("df cut prunes common terms; cosine matches hand computation") {
    // bigram 'common phrase' has df=8 > maxDf=5 -> pruned, so docs 1..8
    // share no kept term; (9,10) share 'rare gem' (df=2)
    val out = TfIdf.cosinePairs(docs, "doc_id", "text",
      maxDf = 5, k = 100)
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSeq == Seq((9L, 10L)),
      s"only the rare-term pair may survive, got ${out.toSeq}")
    val w = math.log(10.0 / 2)   // shared 'rare gem', tf=1
    val wa = math.log(10.0 / 1)  // each doc's unique 'gem alpha/beta'
    val exp = w * w / (math.sqrt(w * w + wa * wa) * math.sqrt(w * w + wa * wa))
    assert(math.abs(out.head._3 - exp) < 1e-5)
  }

  test("identical rare-vocab docs hit cosine 1 and outrank partial overlaps") {
    val d = (docs.as[(Long, String)].collect().toSeq ++ Seq(
      (11L, "unique snowflake token run"),
      (12L, "unique snowflake token run"))).toDF("doc_id", "text")
    val out = TfIdf.cosinePairs(d, "doc_id", "text", maxDf = 6, k = 10)
      .as[(Long, Long, Double)].collect()
    assert(out.head._1 == 11L && out.head._2 == 12L && out.head._3 == 1.0,
      s"verbatim pair must rank first at cos 1.0: ${out.toSeq}")
    assert(out.map(_._3).toSeq == out.map(_._3).toSeq.sorted.reverse)
  }

  test("a doc made only of common terms creates no pair") {
    val d = (docs.as[(Long, String)].collect().toSeq ++ Seq(
      (13L, "common phrase"))).toDF("doc_id", "text")
    val out = TfIdf.cosinePairs(d, "doc_id", "text", maxDf = 5, k = 100)
      .as[(Long, Long, Double)].collect()
    assert(!out.exists(p => p._1 == 13L || p._2 == 13L))
  }
}
