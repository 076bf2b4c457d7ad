package graft.ops

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // the spec's independent re-derivation of the feature hash: first 16
  // md5 bits of the gram mod B (what both Dsir and the DuckDB oracle use)
  private def bucket(g: String, b: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8"))
    ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % b + b) % b
  }

  private def gramsOf(text: String): Seq[String] = {
    val t = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
  }

  test("grams = unigrams ++ bigrams, occurrence counts kept") {
    val out = Seq((1L, "A b c"), (2L, "solo"), (3L, "x x"))
      .toDF("doc_id", "text")
      .select($"doc_id", Dsir.grams($"text").as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a", "b", "c", "a b", "b c"))
    assert(out(2L) == Seq("solo"), "single token has no bigram")
    assert(out(3L) == Seq("x", "x", "x x"), "repeats are not deduped")
  }

  private lazy val target = Seq(
    (100L, "alpha beta gamma alpha beta"),
    (101L, "alpha beta delta")).toDF("doc_id", "text")
  private lazy val raw = Seq(
    (1L, "alpha beta gamma"),   // target-like
    (2L, "zulu yankee xray"),   // disjoint from target
    (3L, "alpha beta zulu"),    // mixed
    (4L, "!!! ???")             // zero grams -> no row
  ).toDF("doc_id", "text")

  test("importance weights match an independent brute-force computation") {
    val b = 64
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text",
      buckets = b).as[(Long, Long, Double)].collect()
      .map { case (id, n, w) => id -> (n, w) }.toMap
    // brute force: exact rational model, decimal-grid sum like the op
    val tCnt = Seq("alpha beta gamma alpha beta", "alpha beta delta")
      .flatMap(gramsOf).groupBy(bucket(_, b)).view.mapValues(_.size).toMap
    val rawTexts = Map(1L -> "alpha beta gamma", 2L -> "zulu yankee xray",
      3L -> "alpha beta zulu")
    val rCnt = rawTexts.values.flatMap(gramsOf)
      .groupBy(bucket(_, b)).view.mapValues(_.size).toMap
    val tTot = tCnt.values.sum.toDouble
    val rTot = rCnt.values.sum.toDouble
    // mirror Spark's round(): BigDecimal.valueOf(double) (shortest
    // decimal repr), HALF_UP — not the raw binary expansion
    def lr(f: Int): BigDecimal = BigDecimal(java.math.BigDecimal.valueOf(
      math.log((tCnt.getOrElse(f, 0) + 1.0) / (tTot + b)) -
        math.log((rCnt(f) + 1.0) / (rTot + b))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    rawTexts.foreach { case (id, text) =>
      val gs = gramsOf(text)
      val sumDec = gs.groupBy(bucket(_, b))
        .map { case (f, g) => lr(f) * g.size }.sum
      val exp = BigDecimal(java.math.BigDecimal.valueOf(sumDec.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(id)._1 == gs.size.toLong, s"gram count for doc $id")
      assert(math.abs(out(id)._2 - exp) < 1e-9, s"ilw for doc $id")
    }
    assert(!out.contains(4L), "zero-gram doc must get no row")
  }

  test("target-like raw docs outrank target-disjoint ones") {
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text",
      buckets = 64).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(1L) > out(3L) && out(3L) > out(2L),
      s"expected ilw(copy) > ilw(mixed) > ilw(disjoint), got $out")
  }

  test("persisted model: indexed scoring equals the inline path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    assert(!Dsir.modelReady(spark, dir))
    Dsir.writeModel(raw, target, "text", dir, buckets = 64)
    assert(Dsir.modelReady(spark, dir))
    val inline = Dsir.importanceWeights(raw, target, "doc_id", "text",
      buckets = 64).as[(Long, Long, Double)].collect().toSet
    val indexed = Dsir.scoreIndexed(raw, dir, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed == inline)
    // a NEW batch scores against the committed model without refit
    val batch = Seq((50L, "alpha beta gamma fresh"))
      .toDF("doc_id", "text")
    val out = Dsir.scoreIndexed(batch, dir, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._1 == 50L && out.head._2 > 0)
  }

  test("an uncommitted model (no _OK) is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-raw").toString
    intercept[IllegalArgumentException] {
      Dsir.scoreIndexed(raw, dir, "doc_id", "text").count()
    }
  }

  test("gumbel resampling is a deterministic top-k with a total order") {
    val a = Dsir.resample(raw, target, "doc_id", "text", k = 2, buckets = 64)
      .as[(Long, Double, Double, Int)].collect().toSeq
    val b = Dsir.resample(raw, target, "doc_id", "text", k = 2, buckets = 64)
      .as[(Long, Double, Double, Int)].collect().toSeq
    assert(a == b, "resample must replay identically")
    assert(a.map(_._4) == Seq(1, 2), "rk must rank 1..k")
    assert(a.head._3 >= a.last._3, "ranked by score desc")
    // scores = ilw + gumbel(id), on the 1e-6 grid
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    a.foreach { case (id, ilw, score, _) =>
      assert(math.abs(ilw - w(id)) < 1e-9)
      assert(math.abs(score - ilw) < 25.0, "gumbel noise is bounded by the 32-bit grid")
    }
  }
}
