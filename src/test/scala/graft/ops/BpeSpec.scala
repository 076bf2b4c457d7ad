package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic fit fixture (Sennrich et al.'s shape): word
  // frequencies low×5, lower×2, newest×6, widest×3. Hand-computed
  // merge sequence under the (count desc, left asc, right asc)
  // tie-break:
  //   step 0: e-s 9 ties s-t 9 → "e" < "s" → (e, s, 9)
  //   step 1: (es, t, 9)
  //   step 2: l-o 7 ties o-w 7 → (l, o, 7)
  //   step 3: (lo, w, 7)
  private def corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("fit reproduces the hand-computed merge sequence with deterministic ties") {
    val f = Bpe.fit(corpus, "text", nMerges = 4)
    assert(f.merges == Seq(
      Bpe.Merge(0, "e", "s", 9L), Bpe.Merge(1, "es", "t", 9L),
      Bpe.Merge(2, "l", "o", 7L), Bpe.Merge(3, "lo", "w", 7L)),
      s"merge sequence drifted: ${f.merges}")
    val syms = f.words.collect().map(r => r._1 -> r._2).toMap
    assert(syms == Map(
      "low" -> Seq("low"),
      "lower" -> Seq("low", "e", "r"),
      "newest" -> Seq("n", "e", "w", "est"),
      "widest" -> Seq("w", "i", "d", "est")),
      s"final symbolization drifted: $syms")
    Staged.releaseAll()
  }

  test("fit is independent of input partitioning") {
    val a = Bpe.fit(corpus, "text", nMerges = 4)
    val b = Bpe.fit(corpus.repartition(7), "text", nMerges = 4)
    assert(a.merges == b.merges, "merge sequence must not depend on layout")
    assert(a.words.collect().toSet == b.words.collect().toSet)
    Staged.releaseAll()
  }

  test("l==r overlap resolves leftmost-first; fit stops when no pair is left") {
    // word freqs: aaaa×1, aaa×2. Step 0: a-a occurs 3× in aaaa (freq 1)
    // + 2× in aaa (freq 2) = 7 → (a, a, 7); leftmost-first application:
    // aaaa → [aa, aa] (never [a, aa, a]), aaa → [aa, a].
    // Step 1: aa-aa 1 vs aa-a 2 → (aa, a, 2); aaa → [aaa].
    // Step 2: (aa, aa, 1); aaaa → [aaaa]. Step 3: no pairs → stop.
    val docs = Seq((1L, "aaaa"), (2L, "aaa aaa")).toDF("doc_id", "text")
    val f = Bpe.fit(docs, "text", nMerges = 10)
    assert(f.merges.head == Bpe.Merge(0, "a", "a", 7L),
      s"overlap weighting drifted: ${f.merges.head}")
    assert(f.merges(1) == Bpe.Merge(1, "aa", "a", 2L),
      s"second merge drifted: ${f.merges(1)}")
    // merges exhaust long before 10: the fit must stop, not loop
    assert(f.merges.size < 10, s"fit failed to stop: ${f.merges}")
    val syms = f.words.collect().map(r => r._1 -> r._2).toMap
    assert(syms("aaa") == Seq("aaa"), s"aaa symbolization: ${syms("aaa")}")
    Staged.releaseAll()
  }

  test("applyMerges reproduces the fit's own segmentation for every fitted word") {
    val f = Bpe.fit(corpus, "text", nMerges = 4)
    val pairs = f.merges.map(m => (m.left, m.right))
    f.words.collect().foreach { case (w, syms, _) =>
      assert(Bpe.applyMerges(w, pairs) == syms,
        s"sequential application diverged from the fit on '$w'")
    }
    // unseen words extend deterministically: shared prefixes merge,
    // foreign material stays at characters
    assert(Bpe.applyMerges("lowest", pairs) == Seq("low", "est"))
    assert(Bpe.applyMerges("zzz", pairs) == Seq("z", "z", "z"))
    Staged.releaseAll()
  }

  test("fertilityBy: per-group tokens-per-word, hand-computed; tokenless groups absent") {
    // fit over the group fixture itself so the vocab join is lossless
    // (the x74 contract). Symbolizations under the corpus fit:
    //   low→1, lower→3 (low e r), newest→4 (n e w est),
    //   widest→4 (w i d est)
    val docs = Seq(
      ("clean", "low low lower"),      // 3 words, 1+1+3 = 5 subwords
      ("shredded", "widest newest"),   // 2 words, 4+4 = 8 subwords
      ("silent", "!!!")                // tokenless: no row
    ).toDF("source", "text")
    val f = Bpe.fit(corpus.unionByName(
      docs.withColumn("doc_id", lit(99L)).select($"doc_id", $"text")),
      "text", nMerges = 4)
    val out = Bpe.fertilityBy(docs, "text", "source", f)
      .select($"source", $"n_words", $"n_bpe_tokens", $"fertility")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet == Set("clean", "shredded"), s"groups drifted: $out")
    assert(out("clean") == ((3L, 5L, 1.666667)), s"clean: ${out("clean")}")
    assert(out("shredded") == ((2L, 8L, 4.0)), s"shredded: ${out("shredded")}")
    Staged.releaseAll()
  }

  test("tokenize: word-ordered subword stream, counts exact, tokenless docs absent") {
    val f = Bpe.fit(corpus, "text", nMerges = 4)
    val docs = Seq(
      (10L, "lower newest low"),
      (11L, "low low"),
      (12L, "!!!") // tokenless: no row
    ).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", f)
      .select($"doc_id", $"n_words", $"n_bpe_tokens", $"bpe_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      10L -> ((3L, 8L, "low e r n e w est low")),
      11L -> ((2L, 2L, "low low"))),
      s"tokenization drifted: $out")
    Staged.releaseAll()
  }

  test("fitCached: builds once, serves the artifact, rebuilds on a param change") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-cache").toString
    val f1 = Bpe.fitCached(corpus, "text", nMerges = 4, dir, corpusTag = "t1")
    assert(f1.merges == Bpe.fit(corpus, "text", nMerges = 4).merges,
      "the persisted fit must equal a direct fit")
    assert(new java.io.File(s"$dir/_BPE_OK_v1_text_m4_ft1").exists(),
      "param-complete marker must be committed")
    // second call with a DIFFERENT corpus but the same marker must serve
    // the persisted artifact — proof that no re-fit happened
    val other = Seq((1L, "zz zz zz")).toDF("doc_id", "text")
    val f2 = Bpe.fitCached(other, "text", nMerges = 4, dir, corpusTag = "t1")
    assert(f2.merges == f1.merges, "a matching marker must skip the fit")
    assert(f2.words.collect().sortBy(_._1).toSeq ==
      f1.words.collect().sortBy(_._1).toSeq,
      "the served symbolization must be the persisted one")
    // a param change (nMerges) invalidates: stale marker deleted, new
    // artifact fit from THIS call's corpus
    val f3 = Bpe.fitCached(corpus, "text", nMerges = 2, dir, corpusTag = "t1")
    assert(f3.merges == f1.merges.take(2), s"rebuilt fit drifted: ${f3.merges}")
    assert(!new java.io.File(s"$dir/_BPE_OK_v1_text_m4_ft1").exists(),
      "the stale marker must be gone")
    assert(new java.io.File(s"$dir/_BPE_OK_v1_text_m2_ft1").exists())
    // a corpus-fingerprint change invalidates the same way
    val f4 = Bpe.fitCached(other, "text", nMerges = 2, dir, corpusTag = "t2")
    assert(f4.merges == Seq(Bpe.Merge(0, "z", "z", 3L)),
      s"regenerated-corpus refit drifted: ${f4.merges}")
    Staged.releaseAll()
  }

  test("fitLocal ≡ fit: identical merge sequence and symbolization (both fixtures)") {
    // the driver-local merge loop must be indistinguishable from the
    // distributed one — exact integer counts + the (count desc, left
    // asc, right asc) total order make the identity exact, including
    // the tie at step 0 and the l==r overlap fixture
    for (docs <- Seq(corpus,
        Seq((1L, "aaaa"), (2L, "aaa aaa")).toDF("doc_id", "text"),
        graft.sources.Tables(spark, sf, "documents")
          .select($"doc_id", $"text"))) {
      val d = Bpe.fit(docs, "text", nMerges = 10)
      val l = Bpe.fitLocal(docs, "text", nMerges = 10)
      assert(l.merges == d.merges,
        s"local merge sequence drifted: ${l.merges} != ${d.merges}")
      assert(l.words.collect().toSet == d.words.collect().toSet,
        "local symbolization table drifted")
    }
    Staged.releaseAll()
  }

  test("fitLocal bounds the collect; fitAuto picks the local path under the bound") {
    // vocabulary = 7 distinct words > maxVocab=4 → loud failure, and
    // the failure happens off a LIMITed collect (never an unbounded one)
    val ex = intercept[IllegalArgumentException] {
      Bpe.fitLocal(corpus.unionByName(
        Seq((9L, "alpha beta gamma")).toDF("doc_id", "text")),
        "text", nMerges = 2, maxVocab = 4)
    }
    assert(ex.getMessage.contains("maxVocab"), ex.getMessage)
    // fitAuto under the bound ≡ fit; over the bound it falls back to
    // the distributed loop and still produces the identical artifact
    val d = Bpe.fit(corpus, "text", nMerges = 4)
    val auto = Bpe.fitAuto(corpus, "text", nMerges = 4)
    val fallback = Bpe.fitAuto(corpus, "text", nMerges = 4, maxLocalVocab = 2)
    assert(auto.merges == d.merges && fallback.merges == d.merges,
      s"fitAuto drifted: ${auto.merges} / ${fallback.merges}")
    assert(auto.words.collect().toSet == d.words.collect().toSet)
    assert(fallback.words.collect().toSet == d.words.collect().toSet)
    Staged.releaseAll()
  }

  test("fitCached requires a corpus fingerprint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-notag").toString
    val ex = intercept[IllegalArgumentException] {
      Bpe.fitCached(corpus, "text", nMerges = 2, dir, corpusTag = "")
    }
    assert(ex.getMessage.contains("corpusTag"), ex.getMessage)
  }

  test("tokenizeWith ≡ tokenize on the fit corpus; extends to unseen words") {
    val f = Bpe.fit(corpus, "text", nMerges = 4)
    val merges = f.merges.map(m => (m.left, m.right))
    // identity on the fit corpus: both faces produce identical rows
    val a = Bpe.tokenize(corpus, "doc_id", "text", f)
      .orderBy($"doc_id").collect().toSeq
    val b = Bpe.tokenizeWith(corpus, "doc_id", "text", merges)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b, s"merge-list tokenization diverged on the fit corpus:\n$a\n$b")
    // unseen words segment by applyMerges, never drop: "lowest" was
    // never fit but its pieces were — merges give low + est
    val incoming = Seq((20L, "lowest low zzz")).toDF("doc_id", "text")
    val out = Bpe.tokenizeWith(incoming, "doc_id", "text", merges)
      .select($"doc_id", $"n_words", $"n_bpe_tokens", $"bpe_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((20L, 3L, 6L, "low est low z z z")),
      s"unseen-word tokenization drifted: $out")
    // ...while the symbolization-join face silently DROPS the unseen
    // words — the gap this operator exists to close
    val dropped = Bpe.tokenize(incoming, "doc_id", "text", f)
      .select($"n_words").as[Long].head()
    assert(dropped == 1L, "tokenize keeps only fit-corpus words (documented)")
    Staged.releaseAll()
  }

  test("fertilityByMerges ≡ fertilityBy on the fit corpus; prices unseen words instead of dropping them") {
    // same fixture as fertilityBy's hand-computed case
    val docs = Seq(
      ("clean", "low low lower"),      // 3 words, 1+1+3 = 5 subwords
      ("shredded", "widest newest"),   // 2 words, 4+4 = 8 subwords
      ("silent", "!!!")                // tokenless: no row
    ).toDF("source", "text")
    val f = Bpe.fit(corpus.unionByName(
      docs.withColumn("doc_id", lit(99L)).select($"doc_id", $"text")),
      "text", nMerges = 4)
    val merges = f.merges.map(m => (m.left, m.right))
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"source", $"n_words", $"n_bpe_tokens", $"fertility")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // identity on the fit corpus: applyMerges reproduces the fit's own
    // segmentation, so both faces agree row-for-row
    assert(key(Bpe.fertilityByMerges(docs, "text", "source", merges)) ==
      key(Bpe.fertilityBy(docs, "text", "source", f)),
      "merge-list fertility diverged from the fit-table face on the fit corpus")
    // a NOVEL source (words the fit never saw) is exactly what
    // acquisition pricing must cost correctly: the join face drops its
    // unseen words (biased low), the merge face segments them
    val novel = Seq(("novel", "lowest zzz zzz")).toDF("source", "text")
    val ext = key(Bpe.fertilityByMerges(novel, "text", "source", merges))
    // lowest → low + est (2), zzz → z z z (3): 3 words, 8 subwords
    assert(ext("novel") == ((3L, 8L, 2.666667)), s"novel source: $ext")
    val joined = key(Bpe.fertilityBy(novel, "text", "source", f))
    assert(joined.get("novel").forall(_._1 < 3L),
      s"the fit-table face drops unseen words (documented): $joined")
    Staged.releaseAll()
  }
}
