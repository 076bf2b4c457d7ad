package graft.ops

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // brute force: sort all (domain, i) by exact rational key
  // (2i−1)/(2w) with domain-name tiebreak, then number 1..N
  private def brute(docs: Seq[(String, Long)],
      w: Map[String, Int], defaultW: Int = 1): Map[(String, Long), Long] = {
    val byDom = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val keyed = byDom.toSeq.flatMap { case (d, ids) =>
      ids.zipWithIndex.map { case (id, i0) =>
        val i = i0 + 1L
        val wd = w.getOrElse(d, defaultW).toLong
        // key = (2i−1)/(2wd); compare via BigInt cross products
        ((d, id), (BigInt(2 * i - 1), BigInt(2 * wd)))
      }
    }
    keyed.sortWith { case (((d1, id1), (n1, q1)), ((d2, id2), (n2, q2))) =>
      val c = (n1 * q2).compare(n2 * q1)
      if (c != 0) c < 0 else if (d1 != d2) d1 < d2 else id1 < id2
    }.zipWithIndex.map { case (((d, id), _), s) => (d, id) -> (s + 1L) }.toMap
  }

  private def interleaved(docs: Seq[(String, Long)], w: Map[String, Int]) = {
    val out = Curriculum.interleave(
      docs.map { case (d, id) => (id, d) }.toDF("doc_id", "domain"),
      "doc_id", "domain", w)
      .as[(Long, String, Long)].collect()
    out.map { case (seq, d, id) => (d, id) -> seq }.toMap
  }

  test("equal weights: round-robin across domains, seq is a permutation") {
    val docs = for (d <- Seq("a", "b", "c"); i <- 1 to 4)
      yield (d, (i * 10 + d.head.toInt).toLong)
    val got = interleaved(docs, Map.empty[String, Int])
    assert(got.values.toSeq.sorted == (1L to 12L).toList)
    assert(got == brute(docs, Map.empty[String, Int]))
    // prefix property: the first 3 slots hold one doc of each domain
    val firstThree = got.filter(_._2 <= 3).keys.map(_._1).toSet
    assert(firstThree == Set("a", "b", "c"))
  }

  test("weighted: 3:1 mix holds at every prefix; matches brute force") {
    val docs = (1 to 30).map(i => ("heavy", i.toLong)) ++
      (1 to 10).map(i => ("light", 1000L + i))
    val w = Map("heavy" -> 3, "light" -> 1)
    val got = interleaved(docs, w)
    assert(got == brute(docs, w))
    // every prefix of length 4k holds 3k heavy + k light
    val ordered = got.toSeq.sortBy(_._2).map(_._1._1)
    for (k <- 1 to 10) {
      val p = ordered.take(4 * k)
      assert(p.count(_ == "heavy") == 3 * k && p.count(_ == "light") == k,
        s"prefix ${4 * k} drifted from the 3:1 mix")
    }
  }

  test("uneven domain sizes: exhausted domains cede their slots") {
    val docs = (1 to 8).map(i => ("big", i.toLong)) ++
      (1 to 2).map(i => ("small", 100L + i))
    val got = interleaved(docs, Map.empty[String, Int])
    assert(got == brute(docs, Map.empty[String, Int]))
    assert(got.values.toSeq.sorted == (1L to 10L).toList)
    // after small runs dry (virtual time 1.5), only big remains
    val tail = got.toSeq.sortBy(_._2).drop(4).map(_._1._1)
    assert(tail.forall(_ == "big"))
  }
}
