package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokenization and counts") {
    val df = one("Hello, World! 42 foo-bar")
    val row = df.select(
      TextAnalysis.nTokens($"text"),
      TextAnalysis.bpeishTokenCount($"text"),
      TextAnalysis.punctCount($"text"),
      TextAnalysis.digitCount($"text")).head()
    assert(row.getInt(0) == 5)       // hello world 42 foo bar
    assert(row.getInt(1) == 8)       // Hello , World ! 42 foo - bar
    assert(row.getInt(2) == 2)       // , !
    assert(row.getInt(3) == 2)       // 4 2
  }

  test("language id picks the profile with most overlap") {
    val cases = Seq(
      "the cat sat of the mat and it is that for with" -> "en",
      "der hund ist nicht mit der katze und das haus von zu" -> "de",
      "le chat est dans la maison pour les amis et une chose que" -> "fr",
      "el perro es un animal y los gatos en una casa por que" -> "es",
      "xyzzy qwerty plugh" -> "und")
    cases.foreach { case (text, expected) =>
      val got = one(text).select(TextAnalysis.langId($"text")).as[String].head()
      assert(got == expected, s"for '$text'")
    }
  }

  test("quality score is in [0,1] and penalizes junk") {
    val good = "the quick brown fox jumps over the lazy dog and it is a fine day " +
      "for running in the green field with many other happy animals around"
    val junk = "!!! ??? ... ,,, ;;; ::: !!!"
    val scores = Seq(good, junk).toDF("text")
      .select(TextAnalysis.qualityScore($"text").as("q")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1) + 0.3)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val fps = Seq("Hello   World", "hello world", "  HELLO WORLD ", "hello there")
      .toDF("text").select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(3) != fps(0))
  }

  test("min-k shingle sketch overlaps for near-dup docs") {
    val a = "one two three four five six seven eight nine ten eleven twelve"
    val b = a.replace("seven", "zeven")
    val c = "totally different words appear here in this other document text body"
    val sk = Seq(a, b, c).toDF("text")
      .select(TextAnalysis.minKShingleSketch($"text", 8).as("s"))
      .as[Seq[Long]].collect()
    def overlap(x: Seq[Long], y: Seq[Long]) = (x.toSet intersect y.toSet).size
    assert(overlap(sk(0), sk(1)) >= 4)
    assert(overlap(sk(0), sk(2)) == 0)
  }

  test("shingles: fewer tokens than n yields empty array") {
    val out = Seq("one two", "").toDF("text")
      .select(Shingles($"text", 3).as("s")).as[Seq[String]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("corpus diff surfaces the planted drift, both directions") {
    val a = Seq((1L, "stable words here"), (2L, "stable words gone soon"))
      .toDF("doc_id", "text")
    val b = Seq((3L, "stable words here"), (4L, "stable words new arrival"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.corpusDiff(a, b, "text")
      .as[(String, Long, Long, Double)].collect()
    val m = out.map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // Na=7, Nb=7, V=8: vanished tokens positive, arrivals negative
    assert(m("gone") == ((1L, 0L,
      BigDecimal(java.math.BigDecimal.valueOf(
        math.log(2.0 / 15) - math.log(1.0 / 15)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(m("new")._3 < 0 && m("arrival")._3 < 0)
    assert(m("stable")._3 == 0.0, "unchanged tokens sit at log-ratio 0")
    // top movers first: |log_ratio| is non-increasing
    val absSeq = out.map(r => math.abs(r._4)).toSeq
    assert(absSeq == absSeq.sorted.reverse)
  }

  test("zipf fit recovers an exact power law: slope -1, r2 1") {
    // counts 12, 6, 4, 3 = 12/rank — a perfect f = C/r law
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text")
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 == 4L)
    assert(math.abs(out._2 - (-1.0)) < 1e-5, s"slope ${out._2}")
    assert(math.abs(out._3 - math.log(12.0)) < 1e-5, s"intercept ${out._3}")
    assert(math.abs(out._4 - 1.0) < 1e-6, s"r2 ${out._4}")
  }

  test("zipf fit matches a local least-squares on the same grid") {
    val text = "w w w w w x x x y y z"
    val out = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text")
      .as[(Long, Double, Double, Double)].head()
    def g9(d: Double) = BigDecimal(java.math.BigDecimal.valueOf(d))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val pts = Seq((1, 5), (2, 3), (3, 2), (4, 1)).map { case (r, f) =>
      (g9(math.log(r.toDouble)), g9(math.log(f.toDouble)))
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out._1 == 4L)
    assert(math.abs(out._2 - slope) < 1e-6)
    assert(math.abs(out._3 - (sy - sx * slope) / n) < 1e-6)
    assert(out._2 < 0, "frequency must fall with rank")
  }

  test("truncateTokens: budget boundary, short docs untouched, empty docs empty") {
    val docs = Seq((1L, "Alpha, beta GAMMA delta epsilon"), (2L, "one two"),
      (3L, ",,,")).toDF("doc_id", "text")
    val out = TextAnalysis.truncateTokens(docs, "doc_id", "text", budget = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((5L, 3L, "alpha beta gamma")))
    assert(out(2L) == ((2L, 2L, "one two")))
    assert(out(3L) == ((0L, 0L, "")), "token-less doc truncates to empty")
  }

  test("ngram novelty: first occurrence wins, exact repeats score zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),         // both 3-grams first seen here
      (2L, "alpha beta gamma delta"),          // exact repeat: novelty 0
      (3L, "alpha beta gamma zeta eta theta"), // 1 of 4 grams repeated
      (4L, "xy")                               // < 3 tokens: no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((2L, 2L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(3L) == ((4L, 3L, 0.75)))
    assert(!out.contains(4L), "docs below the gram size have no row")
  }

  test("top-ngram dominance: hand-computed argmax, smallest-gram tie, short docs absent") {
    val docs = Seq(
      // "buy now" ×3 of 6 grams → dominance 0.5, beats "now buy" ×2
      (1L, "buy now buy now buy now cheap"),
      // all four 2-grams distinct and count 1 → tie → smallest gram
      // "a b" wins at 1/4
      (2L, "a b c a e"),
      (3L, "single"), // 1 token: no 2-grams, no row
      (4L, "")        // tokenless: no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topNgramDominance(docs, "doc_id", "text", n = 2)
      .select($"doc_id", $"top_ngram", $"n_top", $"n_ngrams", $"dominance")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(1L, 2L), s"short/tokenless docs must be absent: $out")
    assert(out(1L) == (("buy now", 3L, 6L, 0.5)), s"doc 1: ${out(1L)}")
    assert(out(2L) == (("a b", 1L, 4L, 0.25)), s"doc 2 tie: ${out(2L)}")
  }

  test("gopher rules: each gate fails for exactly its planted violation") {
    val good = ("the quick brown fox is a fine animal and it runs " +
      "to the forest in the morning light of an autumn day it " +
      "is a good day for the hunt and the pack runs fast over " +
      "the hills to the river where it drinks in peace " +
      "under the bright warm summer stars") // 52 words, clean
    val docs = Seq(
      (1L, good),
      (2L, "short text"), // word count below the floor
      (3L, ("#tag " * 25) + ("the of is " * 9).trim), // hash ratio 25/52 > 0.1
      (4L, ("wait... " * 20).trim + " " +
        ("the of is a big story " * 5).trim), // ellipsis ratio 20/50 > 0.3
      (5L, ("42 17 99 east 23 " * 12).trim + " the of") // alpha frac 12/62 < 0.8
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 50L)
      .select($"doc_id", $"pass").as[(Long, Int)].collect().toMap
    assert(out(1L) == 1, "the clean doc must pass")
    assert(out(2L) == 0, "word-count gate")
    assert(out(3L) == 0, "hash-ratio gate")
    assert(out(4L) == 0, "ellipsis-ratio gate")
    assert(out(5L) == 0, "alpha-fraction gate")
    // metric sanity on the planted hash doc
    val m = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 1L)
      .where($"doc_id" === 3L).head()
    assert(m.getAs[Double]("hash_ratio") > 0.1)
  }

  test("gopher alpha count: letter-run semantics exact; linear on a " +
      "letter-free megablob (the r13 backtracking trap)") {
    // mixed runs: alpha words are the \S+ runs containing >= 1 letter,
    // wherever the letter sits in the run
    val tricky = Seq(
      (1L, "12ab cd12 1a2b3 123 45,6 ... a"), // 4 alpha of 7 runs
      (2L, "$$$ ### 123 9.99"),               // 0 alpha of 4 runs
      (3L, "x")                                // 1 of 1
    ).toDF("doc_id", "text")
    val fr = TextAnalysis.gopherRules(tricky, "doc_id", "text", minWords = 1L)
      .select($"doc_id", $"n_words", $"alpha_frac")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fr(1L) == ((7L, 0.571429)), s"mixed-run alpha drifted: ${fr(1L)}")
    assert(fr(2L) == ((4L, 0.0)))
    assert(fr(3L) == ((1L, 1.0)))
    // a 400 KB letter-free blob — base64/digit junk, exactly what a
    // quality gate exists to chew through. The pre-r14 \S*[A-Za-z]\S*
    // pattern backtracked quadratically here (~minutes per row); the
    // anchored [A-Za-z]\S* form fails each position in O(1). The spec's
    // assertion is semantic; its completing at all is the perf guard.
    val blob = ("0123456789" * 40000) + " the of is a"
    val big = TextAnalysis.gopherRules(
      Seq((9L, blob)).toDF("doc_id", "text"), "doc_id", "text", minWords = 1L)
      .select($"n_words", $"alpha_frac").as[(Long, Double)].head()
    assert(big == ((5L, 0.8)), s"megablob stats drifted: $big")
  }

  test("vocab coverage: hand-checked OOV with multiplicity; lexicographic tie at the cut") {
    // counts: cat=4, dog=3, ant=2, bee=2, fox=1 — at vocabSize=3 the
    // (ant, bee) tie breaks lexicographically: vocab = {cat, dog, ant}
    val docs = Seq(
      (1L, "cat cat dog ant"),        // oov: 0/4
      (2L, "cat dog bee bee fox"),    // oov: bee, bee, fox = 3/5
      (3L, "cat cat dog ant"),        // oov: 0/4
      (4L, "")                        // tokenless: no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> ((4L, 0L, 0.0)),
      2L -> ((5L, 3L, 0.6)),
      3L -> ((4L, 0L, 0.0))), s"coverage drifted: $out")
    // deterministic across partitionings (the cut must not depend on
    // which partition a tied token's partial count lands in)
    val again = TextAnalysis.vocabCoverage(docs.repartition(4), "doc_id",
      "text", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(again == out.map { case (id, (a, b, c)) => (id, a, b, c) }.toSet)
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocabSize = 0)
    }
  }

  test("token entropy: uniform reads ln k, repetition reads 0, tokenless reads NULL") {
    val docs = Seq(
      (1L, "a a b b"),        // H = ln 2
      (2L, "a a a a"),        // one word → 0
      (3L, "!!! ???"),        // tokenless → NULL entropy, row kept
      (4L, "a b c d"))        // uniform over 4 → ln 4
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(out(1L) == ((4L, Some(0.693147))), s"ln2 drifted: ${out(1L)}")
    assert(out(2L) == ((4L, Some(0.0))), s"one-word doc: ${out(2L)}")
    assert(out(3L) == ((0L, None)), s"tokenless doc must keep a NULL row: ${out(3L)}")
    assert(out(4L) == ((4L, Some(1.386294))), s"ln4 drifted: ${out(4L)}")
    // partition-order independence (the decimal-grid discipline)
    val again = TextAnalysis.tokenEntropy(docs.repartition(4), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(again == out.map { case (id, (n, h)) => (id, n, h) }.toSet)
    Staged.releaseAll()
  }

  test("source unigram KL: lone source reads 0, disjoint vocab reads ln 2, tokenless NULL") {
    // one source == the corpus → p = q → KL exactly 0
    val lone = TextAnalysis.sourceUnigramKl(
      Seq((1L, "x y z", "s1"), (2L, "x y", "s1")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(lone == Seq(("s1", 2L, 5L, Some(0.0))), s"lone-source KL: $lone")
    // disjoint half-half vocab: each source's only word has p=1,
    // q=1/2 → KL = ln 2; the tokenless source keeps a NULL row
    val out = TextAnalysis.sourceUnigramKl(
      Seq((1L, "a a", "s1"), (2L, "b b", "s2"), (3L, "!!!", "s3"))
        .toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out("s1") == ((1L, 2L, Some(0.693147))), s"s1 KL: ${out("s1")}")
    assert(out("s2") == ((1L, 2L, Some(0.693147))), s"s2 KL: ${out("s2")}")
    assert(out("s3") == ((1L, 0L, None)), s"tokenless source: ${out("s3")}")
    Staged.releaseAll()
  }

  test("quality PSI: identical profiles read exactly 0; a shifted source reads > 0") {
    val good = "the quick brown fox jumps over the lazy dog and it is a " +
      "fine day for running in the green field with many other animals"
    val junk = "zz zz zz zz zz zz zz zz zz zz zz zz"
    // two sources with IDENTICAL doc sets: every (p - q) term is 0 and
    // every absent cell sits at the shared eps floor → PSI exactly 0.0
    val same = TextAnalysis.qualityPsi(
      Seq((1L, good, "s1"), (2L, junk, "s1"), (3L, good, "s2"), (4L, junk, "s2"))
        .toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
      .as[(String, Long, Double)].collect()
      .map { case (s, n, p) => s -> ((n, p)) }.toMap
    assert(same == Map("s1" -> ((2L, 0.0)), "s2" -> ((2L, 0.0))),
      s"identical profiles must read exactly 0: $same")
    // a source concentrated in a different bucket than the global mix
    val shifted = TextAnalysis.qualityPsi(
      Seq((1L, good, "hi"), (2L, good, "hi"), (3L, junk, "lo"), (4L, junk, "lo"))
        .toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
      .as[(String, Long, Double)].collect()
      .map { case (s, n, p) => s -> ((n, p)) }.toMap
    assert(shifted("hi")._2 > 1.0 && shifted("lo")._2 > 1.0,
      s"fully separated sources must read far above the 0.25 bar: $shifted")
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityPsi(Seq((1L, good, "s")).toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", nBuckets = 0)
    }
    Staged.releaseAll()
  }
}
