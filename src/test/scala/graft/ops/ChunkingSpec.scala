package graft.ops

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (1 to n).map(i => s"t$i").mkString(" "))

  test("sliding chunks cover every token with the declared overlap") {
    val docs = Seq(doc(1L, 80), doc(2L, 50), doc(3L, 51), doc(4L, 10),
      (5L, "")).toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs, "doc_id", "text",
      size = 50, stride = 30)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // 80 tokens → chunks [0,50) and [30,80)
    assert(out(1L).map(c => (c._2, c._4)).toSeq == Seq((0, 50), (1, 50)))
    assert(out(1L)(0)._3 == (1 to 50).map(i => s"t$i").mkString(" "))
    assert(out(1L)(1)._3 == (31 to 80).map(i => s"t$i").mkString(" "))
    // exactly one window → one chunk
    assert(out(2L).map(c => (c._2, c._4)).toSeq == Seq((0, 50)))
    // one token past the window → short tail chunk from the stride point
    assert(out(3L).map(c => (c._2, c._4)).toSeq == Seq((0, 50), (1, 21)))
    assert(out(3L)(1)._3 == (31 to 51).map(i => s"t$i").mkString(" "))
    // shorter than one window → the whole doc, once
    assert(out(4L).map(c => (c._2, c._4)).toSeq == Seq((0, 10)))
    // empty docs emit nothing
    assert(!out.contains(5L))
  }

  test("every token position is covered at any length") {
    val docs = (1 to 30).map(n => doc(n.toLong, n * 7)).toDF("doc_id", "text")
    val chunks = Chunking.slidingChunks(docs, "doc_id", "text",
      size = 50, stride = 30)
      .as[(Long, Int, String, Int)].collect()
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = (id * 7).toInt
      val covered = cs.flatMap(c => c._2 * 30 until (c._2 * 30 + c._4)).toSet
      assert(covered == (0 until n).toSet, s"doc $id: gap in coverage")
    }
  }
}
