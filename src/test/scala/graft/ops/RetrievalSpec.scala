package graft.ops

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("BM25 matches the hand-computed score on a tiny fixture") {
    val docs = Seq(
      (1L, "spark spark join"),
      (2L, "data only here"),
      (3L, "nothing relevant at all")).toDF("doc_id", "text")
    val out = Bm25.score(docs, "doc_id", "text", terms = Seq("spark", "join"))
      .as[(Long, Double)].collect().toMap
    // N=3, Σdl=10, avgdl=10/3; df(spark)=df(join)=1 →
    // idf = ln((3-1+0.5)/(1+0.5)+1) = ln(8/3); d1: dl=3, tf=(2,1):
    // 4.4·idf/(2+1.2·(0.25+0.75·0.9)) + 2.2·idf/(1+1.2·(0.25+0.75·0.9))
    assert(out.keySet == Set(1L), "only d1 contains a query term")
    assert(math.abs(out(1L) - 2.410334) < 1e-6, s"got ${out(1L)}")
  }

  test("BM25 orders by tf and penalizes length") {
    val docs = Seq(
      (1L, "spark spark alpha beta"),   // tf 2, dl 4
      (2L, "spark alpha beta gamma"),   // tf 1, dl 4
      (3L, "spark " + (1 to 50).map(i => s"w$i").mkString(" "))) // tf 1, dl 51
      .toDF("doc_id", "text")
    val out = Bm25.score(docs, "doc_id", "text", terms = Seq("spark"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L), "higher tf must score higher")
    assert(out(2L) > out(3L), "longer doc with same tf must score lower")
  }

  test("RRF fuses two ranked lists with the 1/(k0+rank) rule") {
    val lex = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "s_lex")
    val vec = Seq((2L, 0.9), (4L, 0.8)).toDF("id", "s_vec")
    val out = Rrf.fuse(lex, "s_lex", vec, "s_vec", "id", k = 10)
      .as[(Long, Double)].collect().toMap
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    // doc2 is on both lists: lex rank 2, vec rank 1
    assert(out(2L) == r(1.0 / 62 + 1.0 / 61))
    assert(out(1L) == r(1.0 / 61)) // lex-only, rank 1
    assert(out(4L) == r(1.0 / 62)) // vec-only, rank 2
    assert(out(3L) == r(1.0 / 63))
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("RRF ranks break score ties by ascending id, and k caps the output") {
    val lex = Seq((7L, 5.0), (3L, 5.0), (9L, 5.0)).toDF("id", "s")
    val vec = spark.emptyDataset[(Long, Double)].toDF("id", "s2")
    val out = Rrf.fuse(lex, "s", vec, "s2", "id", k = 2)
      .as[(Long, Double)].collect()
    // tie on score → rank by id: 3 < 7 < 9; k=2 keeps the best two
    assert(out.map(_._1).toSeq == Seq(3L, 7L))
    assert(out.head._2 > out.last._2)
  }
}
