package graft.ops

import graft.SparkSpec

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("PMI matches the hand-computed document co-occurrence") {
    val docs = Seq(
      (1L, "a b x"), (2L, "a b y"), (3L, "a b z"),
      (4L, "a c"), (5L, "b c")).toDF("doc_id", "text")
    val out = Cooccur.pmiTopPairs(docs, "doc_id", "text",
      topV = 3, minCount = 2, k = 10)
      .as[(String, String, Long, Double)].collect()
    // top-3 by df: a(4), b(4), c(2); x/y/z (df 1) are cut off BEFORE
    // pairing. Pairs: (a,b)×3, (a,c)×1, (b,c)×1 → only (a,b) ≥ 2.
    assert(out.length == 1)
    val (ta, tb, nab, pmi) = out.head
    assert((ta, tb, nab) == ("a", "b", 3L))
    assert(math.abs(pmi - math.log(3.0 * 5 / (4 * 4))) < 1e-6)
  }

  test("a planted collocation outranks independent common tokens") {
    val filler = (1 to 20).map(i => (i.toLong, s"common words here w$i"))
    val planted = (21 to 26).map(i => (i.toLong, "qqql zzzx common"))
    val docs = (filler ++ planted).toDF("doc_id", "text")
    val out = Cooccur.pmiTopPairs(docs, "doc_id", "text",
      topV = 10, minCount = 2, k = 5)
      .as[(String, String, Long, Double)].collect()
    // qqql+zzzx co-occur in all 6 of their docs and nowhere else —
    // maximal PMI; common/words/here co-occur but each is everywhere
    assert(out.nonEmpty)
    assert(Set(out.head._1, out.head._2) == Set("qqql", "zzzx"))
    assert(out.head._4 > out.last._4 || out.length == 1)
  }
}
