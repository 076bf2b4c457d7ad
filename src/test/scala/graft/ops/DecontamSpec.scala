package graft.ops

import graft.SparkSpec

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "the capital of france is paris and the capital " +
    "of italy is rome while the capital of spain is madrid"

  private lazy val bench = Seq((100L, benchText)).toDF("doc_id", "text")

  private lazy val docs = Seq(
    // verbatim leak of a benchmark span (> 5 shared tokens)
    (1L, "trivia corner the capital of france is paris which tourists love"),
    // paraphrase sharing no 5-gram
    (2L, "paris serves as the french capital and rome as the italian one"),
    // unrelated
    (3L, "spark shuffles partition data across executors during wide stages"),
    // full benchmark copy
    (4L, benchText)
  ).toDF("doc_id", "text")

  test("overlaps flags leaked docs with their n-gram counts, not paraphrases") {
    val out = Decontam.overlaps(docs, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(out.contains(1L), "verbatim span must be flagged")
    assert(out.contains(4L), "full copy must be flagged")
    assert(!out.contains(2L), "paraphrase shares no 5-gram")
    assert(!out.contains(3L), "unrelated doc must not be flagged")
    // the full copy shares every benchmark 5-gram; the span leak only some
    assert(out(4L) > out(1L))
    // doc 1 shares exactly the 5-grams inside "the capital of france is
    // paris": 2 windows of 5 consecutive shared tokens (6 shared tokens)
    assert(out(1L) == 2L)
  }

  test("removeContaminated keeps exactly the clean docs") {
    val clean = Decontam.removeContaminated(docs, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(2L, 3L))
  }

  test("empty benchmark removes nothing") {
    val clean = Decontam.removeContaminated(
      docs, bench.limit(0), "doc_id", "text", n = 5)
    assert(clean.count() == 4)
  }

  test("contaminationScore: graded fraction; clean docs score 0; short docs absent") {
    val withShort = docs.union(Seq((5L, "too short text")).toDF("doc_id", "text"))
    val out = Decontam.contaminationScore(withShort, bench, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(4L)._4 == 1.0, "the full benchmark copy is fully contained")
    // doc 1: 11 tokens -> 7 windows, 2 of them inside the leaked span
    assert(out(1L)._2 == 7L && out(1L)._3 == 2L)
    assert(math.abs(out(1L)._4 - 2.0 / 7) < 1e-6)
    // unlike overlaps (inner join), the graded score KEEPS clean docs
    assert(out(2L)._4 == 0.0 && out(3L)._4 == 0.0)
    assert(!out.contains(5L), "fewer than n tokens: no denominator, no row")
  }

  test("overlapsBloom is bit-identical to overlaps, even with a tiny saturated bloom") {
    val exact = Decontam.overlaps(docs, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontam.overlapsBloom(docs, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact)
    // undersized bloom (1 bit/item → near-total saturation): false
    // positives flood the prefilter, the exact verify must absorb them
    val saturated = Decontam.overlapsBloom(
      docs, bench, "doc_id", "text", n = 5, bitsPerItem = 1)
      .as[(Long, Long)].collect().toMap
    assert(saturated == exact)
  }

  test("overlapsBloom plans the might_contain prefilter before the verify join") {
    val plan = Decontam.overlapsBloom(docs, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in plan:\n$plan")
  }

  test("overlapsBloom on an empty benchmark returns the empty report") {
    val out = Decontam.overlapsBloom(docs, bench.limit(0), "doc_id", "text", n = 5)
    assert(out.columns.toSeq == Seq("doc_id", "n_overlap"))
    assert(out.count() == 0)
  }

  test("persisted bench index: probe equals the exact path; no re-hash of the benchmark") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx").toString
    assert(!Decontam.benchIndexReady(spark, dir))
    Decontam.writeBenchIndex(bench, "text", dir)
    assert(Decontam.benchIndexReady(spark, dir))
    val exact = Decontam.overlaps(docs, bench, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    val indexed = Decontam.overlapsIndexed(docs, dir, "doc_id", "text", n = 5)
      .as[(Long, Long)].collect().toMap
    assert(indexed == exact)
    val clean = Decontam.removeContaminatedIndexed(docs, dir, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(2L, 3L))
    // probing must not read the benchmark TEXT — only the index files
    val plan = Decontam.overlapsIndexed(docs, dir, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashes") && plan.contains("might_contain"))
  }

  test("persisted bench index: empty benchmark commits and probes to empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-empty").toString
    Decontam.writeBenchIndex(bench.limit(0), "text", dir)
    val out = Decontam.overlapsIndexed(docs, dir, "doc_id", "text", n = 5)
    assert(out.columns.toSeq == Seq("doc_id", "n_overlap") && out.count() == 0)
    assert(Decontam.removeContaminatedIndexed(docs, dir, "doc_id", "text")
      .count() == 4)
  }

  test("bloom build raises session caps past a small limit, then restores them") {
    // lower the caps far below what this benchmark needs: a silent
    // Spark clamp would build a ~128-byte filter; the builder must
    // instead raise the caps for the build and persist the full-size
    // filter, leaving the session confs exactly as it found them
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val oldItems = spark.conf.get(itemsKey, "4000000")
    val oldBits = spark.conf.get(bitsKey, "67108864")
    spark.conf.set(itemsKey, "10")
    spark.conf.set(bitsKey, "1024")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-didx-cap").toString
      Decontam.writeBenchIndex(bench, "text", dir, bitsPerItem = 16)
      val nGrams = spark.read.parquet(s"$dir/hashes").count()
      assert(nGrams > 10, s"fixture benchmark must exceed the lowered cap: $nGrams")
      val bloomBytes = new java.io.File(s"$dir/bloom.bin").length()
      // the filter must be sized for est*16 bits, not clamped to 1024
      assert(bloomBytes >= nGrams * 16 / 8,
        s"bloom.bin is $bloomBytes bytes for $nGrams n-grams — clamped?")
      assert(spark.conf.get(itemsKey) == "10" && spark.conf.get(bitsKey) == "1024",
        "builder must restore the session caps it raised")
      // and the probe over the full-size filter still matches exact
      val exact = Decontam.overlaps(docs, bench, "doc_id", "text", n = 5)
        .as[(Long, Long)].collect().toMap
      val indexed = Decontam.overlapsIndexed(docs, dir, "doc_id", "text", n = 5)
        .as[(Long, Long)].collect().toMap
      assert(indexed == exact)
    } finally {
      spark.conf.set(itemsKey, oldItems)
      spark.conf.set(bitsKey, oldBits)
    }
  }

  test("an uncommitted index (no _OK) is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft-didx-raw").toString
    intercept[IllegalArgumentException] {
      Decontam.overlapsIndexed(docs, dir, "doc_id", "text", n = 5).count()
    }
  }

  test("cross-source overlap counts distinct shared passages per pair") {
    val p1 = "shared passage tokens here now"
    val p2 = "another mutual overlap chunk text"
    val corpus = Seq(
      ("s1", p1), ("s2", p1), ("s3", p1),        // P1 in all three
      ("s1", p2), ("s3", p2),                    // P2 in s1+s3 only
      ("s2", "entirely private content lives here"),
      ("s1", p1)                                 // same-source repeat: no effect
    ).toDF("source", "text")
    val out = Decontam.crossSourceOverlap(corpus, "source", "text", window = 5)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("s1", "s2", 1L), ("s2", "s3", 1L), ("s1", "s3", 2L)),
      s"matrix drifted: $out")
  }

  test("a passage unique to one source creates no pair") {
    val corpus = Seq(("s1", "only here alpha beta gamma"),
      ("s2", "totally different words exist here")).toDF("source", "text")
    assert(Decontam.crossSourceOverlap(corpus, "source", "text").count() == 0)
  }
}
