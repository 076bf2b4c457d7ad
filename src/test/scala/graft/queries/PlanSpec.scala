package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression tests: the scale properties claimed in the
  * README must be visible in the physical plans, not just true once.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = Registry.byName(name).run(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02: filters and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull"), "filters must push down")
    assert(p.contains("GreaterThan(l_discount,0.05)"), "comparison filters push down")
    // pruned read schema: only the 6 needed columns, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_returnflag") && readSchema.contains("l_orderkey"))
  }

  test("q04: small dimension join broadcasts") {
    assert(plan("q04_brand_revenue").contains("BroadcastHashJoin"))
  }

  test("q03: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q03_top_unshipped_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q09: per-group top-k uses WindowGroupLimit pushdown") {
    assert(plan("q09_topk_per_customer").contains("WindowGroupLimit"))
  }

  test("x98: the span shuffle key is the 8-byte hash, never span text") {
    // long attributes print with an L suffix (__gram#12L) — the keying
    // is visible in the exchange arguments. x95 keeps the string key
    // for oracle parity (sanity leg: the instrument can tell them apart)
    val re = raw"hashpartitioning\(__gram#(\d+)(L?)".r
    val hashed = re.findAllMatchIn(plan("x98_substring_dedup_hashed")).toSeq
    assert(hashed.nonEmpty, "x98 must shuffle on the span key")
    assert(hashed.forall(_.group(2) == "L"),
      s"every x98 span exchange must move 8-byte keys: ${hashed.map(_.matched)}")
    val strings = re.findAllMatchIn(plan("x95_substring_dedup")).toSeq
    assert(strings.exists(_.group(2) != "L"),
      "sanity: x95's span exchanges carry the string key")
  }

  test("x99: the PERSISTED index probe exchanges 8-byte span keys") {
    // the hashed index family: both the batch-side span frame (__gram)
    // and the registration frame (gram) must shuffle longs — if any
    // exchange key prints without the L suffix, span text leaked onto
    // the wire. x97 (text-keyed, oracle parity) is the sanity leg.
    val re = raw"hashpartitioning\((__)?gram#(\d+)(L?)".r
    val hashed = re.findAllMatchIn(plan("x99_incremental_substring_hashed"))
      .toSeq
    assert(hashed.nonEmpty, "x99 must shuffle on the span key")
    assert(hashed.forall(_.group(3) == "L"),
      s"every x99 span exchange must move 8-byte keys: ${hashed.map(_.matched)}")
    val strings = re.findAllMatchIn(
      plan("x97_incremental_substring_dedup")).toSeq
    assert(strings.exists(_.group(3) != "L"),
      "sanity: x97's span exchanges carry the string key")
  }

  test("KL family: the frozen O(vocab) table is never hint-broadcast; the bucketed freeze joins Exchange-free") {
    // r20 (the r19 verdict's ask #2): the KL monitors used to force
    // broadcast(frozen) — trivially right at fixture scale, wrong at a
    // web-scale vocabulary (10⁸–10⁹ token types). The pin: (a) nothing
    // forces the broadcast (no hint survives analysis — Catalyst may
    // still CHOOSE one from observed sizes, which is the correct
    // size-based call); (b) in the no-broadcast regime (threshold -1,
    // how the 100 TB plan must work) the frozen side scans from its
    // bucketed layout with no Exchange — only the batch-sized count
    // frame moves.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (1 to 40).map(i =>
      (i.toLong, "alpha beta gamma delta " + ("w" + i % 7), "s" + i % 3))
      .toDF("doc_id", "text", "source")
    val root = java.nio.file.Files
      .createTempDirectory("graft-klpin").toString
    graft.ops.Dedup.writeBucketedIndex(
      graft.ops.TextAnalysis.unigramCounts(docs, "text"),
      root, Seq("tok"), 32)
    val frozen = graft.ops.Dedup.readIndexTable(spark, root)
    val df = graft.ops.TextAnalysis.perSourceSharedKl(
      docs, "text", "source", frozen)
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no broadcast hint may survive analysis on the KL join")
    // the operator Stages its count frames: drop them before the
    // no-broadcast re-plan, or the cached physical fragments (planned
    // under the default threshold) ride into the second measurement
    graft.ops.Staged.releaseAll()
    val sqlConf = spark.conf
    val thr = sqlConf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeThr = sqlConf.get(
      "spark.sql.adaptive.autoBroadcastJoinThreshold", thr)
    try {
      sqlConf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sqlConf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = graft.ops.TextAnalysis.perSourceSharedKl(
          docs, "text", "source",
          graft.ops.Dedup.readIndexTable(spark, root))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("BroadcastExchange"),
        s"the no-broadcast regime must not plan a broadcast:\n$p")
      // the frozen side's bucketed scan advertises tok-partitioning, so
      // the tok equi-join exchanges ONLY the batch-side count frame
      val tokEx = raw"Exchange hashpartitioning\(tok#\d+(?:, *\w+#\d+L?)*, 32\)".r
        .findAllIn(p).size
      assert(tokEx <= 1,
        s"the frozen side must join Exchange-free from its bucket " +
          s"layout ($tokEx tok-exchanges):\n$p")
    } finally {
      sqlConf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      sqlConf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqeThr)
    }
    graft.ops.Staged.releaseAll()
  }

  test("x34: kNN graph pushes the per-source rank filter (WindowGroupLimit)") {
    // the per-source top-k must keep only k rows per partition in the
    // rank sort — at 100 TB the candidate set is the big intermediate
    assert(plan("x34_knn_graph").contains("WindowGroupLimit"))
  }

  test("a10: pq probe prunes cluster partitions and plans a top-k, not a sort") {
    val p = plan("a10_pq_adc_topk")
    assert(p.contains("assigned_pq"), s"probe must scan the pq face:\n$p")
    assert(p.contains("PartitionFilters") && p.contains("cluster"),
      "the cluster predicate must prune partitions on the scan")
    assert(p.contains("TakeOrderedAndProject"),
      "k-of-cell ranking must be a top-k, never a global sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "ADC scoring is lookup-only: no join anywhere in the probe")
  }

  test("x79: dominance = one hash-agg + one doc-keyed window, no extra sort") {
    val p = plan("x79_top_ngram_dominance")
    // the count agg keeps its map-side partial; the argmax window sorts
    // only within doc partitions (one Window node, no WindowGroupLimit
    // partial sort, no SortAggregate — both measured slower here)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final count aggregation:\n$p")
    assert(p.contains("Window") && !p.contains("SortAggregate"),
      s"argmax must be the plain window, never a SortAggregate:\n$p")
  }

  test("a12: BOTH staged stages prune cluster partitions; no corpus-table scan") {
    val p = plan("a12_ann_staged_rerank")
    // stage 1 scans the pq face, stage 2 the float face — each pruned
    // to the probed cells (the re-rank must never pay a full-corpus
    // float scan: that is what the compressed face exists to avoid)
    assert(p.contains("assigned_pq"), s"stage 1 must scan the pq face:\n$p")
    val pruned = p.linesIterator
      .filter(_.contains("PartitionFilters: [cluster")).size
    assert(pruned >= 3, // stage 1 (pq), stage 2 (float), direct leg (float)
      s"expected >=3 cluster-pruned scans, saw $pruned:\n$p")
    // the base embeddings table appears ONLY as the direct leg's 1-row
    // query-vector fetch (vec_id = 7 pushed to the scan) — the staged
    // legs themselves read index faces exclusively, so the re-rank
    // never pays a corpus-table scan
    val embScans = p.linesIterator.count(l =>
      l.contains("Location") && l.contains("embeddings.parquet"))
    assert(embScans <= 1 && p.contains("EqualTo(vec_id,7)"),
      s"corpus table may only serve the pushed 1-row query fetch:\n$p")
  }

  test("a13: staged stage-2 reads the pruned float face; ranking is keyed windows") {
    val p = plan("a13_ann_staged_recall")
    assert(p.contains("assigned_pq"), s"stage 1 must scan the pq face:\n$p")
    val pruned = p.linesIterator
      .filter(_.contains("PartitionFilters: [cluster")).size
    assert(pruned >= 3, // float probe, pq probe, staged stage 2 (+ stage 1)
      s"expected >=3 cluster-pruned scans, saw $pruned:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "per-query ranking must be a keyed window, never a global sort")
  }

  test("t03: as-of join plans the custom sort-merge operator, not a join") {
    val p = plan("t03_asof_join")
    assert(p.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoop"),
      "as-of must not plan a pairwise join")
  }

  test("no query plans a cartesian or nested-loop join") {
    Registry.all.filterNot(_.name == "a04_sim_ivf_topk") // KMeans is slow; skip
      .foreach { q =>
        val p = plan(q.name)
        assert(!p.contains("CartesianProduct"),
          s"${q.name} plans a cartesian product")
        // BroadcastNestedLoopJoin is only acceptable for deliberate
        // 1-row broadcast cross joins (query vectors, scalar aggregates)
        val nlOk = Set("x10_sim_bruteforce_topk", "x12_sim_lsh_topk",
          "x40_hybrid_rrf", // vector face = x10's 1-row query broadcast
          "a05_sim_ivfpq_topk", // 1-row int8 query vector broadcast
          "a12_ann_staged_rerank", // direct leg = topK's 1-row query broadcast
          "q15_above_avg_balance",
          // deliberate broadcast cross joins of generated/scalar sides:
          // dense month axis (~80 rows), funnel step counts (1 row),
          // corpus token total + missing-heavy count (1 row each, the
          // lazy replacements for x26's old construction-time actions)
          "q30_gap_fill_months", "q37_event_funnel", "x26_heavy_hitters",
          // stride-schedule closed form: every doc meets the O(domains)
          // broadcast table by design (fan-out = |domains|, bounded)
          "x51_mixture_interleave",
          // brute-force ground truth: the driver-small query LIST
          // broadcasts into one corpus pass by design (the corpus is
          // never shuffled; per-query rank is a keyed window) — the
          // baseline an ANN recall report is DEFINED against
          "a07_ann_recall", "a08_ann_nprobe_sweep", "a13_ann_staged_recall",
          "a14_staged_kcand_sweep", "a16_staged_nprobe_grid",
          // per-setting 1-row scalar aggregates cross-joined (q37's class)
          "a17_semdedup_threshold_sweep",
          // PSI's full #sources x K grid: a broadcast cross of the
          // 10-row bucket axis against the #sources frame (q30's class)
          "x92_quality_psi")
        if (!nlOk(q.name))
          assert(!p.contains("BroadcastNestedLoopJoin"),
            s"${q.name} plans a nested-loop join")
      }
  }

  test("aggregations keep map-side partial aggregation") {
    val p = plan("q01_pricing_summary")
    // two HashAggregate nodes (partial + final) around one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("x21: the benchmark n-gram set broadcasts; the corpus side streams") {
    val p = plan("x21_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "decontamination must broadcast the benchmark hash set")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle on n-gram hashes")
  }

  test("x25: incremental dedup reads the persisted band index, not corpus text") {
    val p = plan("x25_incremental_neardup")
    // the index side must be a parquet scan of the bands table
    assert(p.contains("graft-lsh-") && p.contains("/bands"),
      s"expected a persisted band-table scan in:\n$p")
    // exactly the new batch gets signatures: minhash_sig appears for the
    // odd-batch scans, never over the index side (which has none to do)
    assert(p.contains("minhash_sig"), "the new batch computes signatures")
  }

  test("x23: the stratified gate stays a row-local filter (no shuffle before agg)") {
    val p = plan("x23_stratified_resample")
    assert(p.contains("md5"), "the deterministic gate must be in the plan")
    // one exchange: the final group-by; sampling itself must not shuffle
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"sampling should not add shuffles, saw $exchanges:\n$p")
  }

  test("x27/x28/x29: scan-local pipelines plan zero shuffles") {
    // BM25's collection stats ride as literals (the agg pass happens at
    // build time, driver-side); chunking and quantization are
    // generate-and-project. None of the three may introduce an Exchange.
    Seq("x27_bm25_score", "x28_chunk_sliding", "x29_quantize_int8")
      .foreach { name =>
        val p = plan(name)
        assert(!p.contains("Exchange"),
          s"$name must stay a scan-local pipeline:\n$p")
      }
  }

  test("q25/q31: exact quantiles plan no buffer-the-group aggregate") {
    // the two-pass Quantiles form replaced percentile/median precisely
    // so that no ObjectHashAggregate holds O(group) state
    Seq("q25_median", "q31_percentiles").foreach { name =>
      val p = plan(name)
      assert(!p.contains("ObjectHashAggregate"),
        s"$name must use the two-pass quantile, not a buffering agg:\n$p")
      assert(p.contains("Window"), s"$name should rank via a running sum:\n$p")
    }
  }

  test("q45: banded quantile windows only over band totals / single bands") {
    val p = plan("q45_banded_quantiles")
    assert(!p.contains("ObjectHashAggregate"),
      s"banded quantile must never buffer a group:\n$p")
    // exactly the two-pass shape: a global-partition window over the
    // BAND totals (the O(#bands) rank scan) and a per-band-partitioned
    // window for refinement — never a global window over the histogram
    val windows = p.linesIterator.filter(_.contains("Window")).toList
    assert(windows.nonEmpty, s"banded rank pass must plan windows:\n$p")
    // the refinement window partitions by the band key, so the full
    // histogram never flows through one partition
    assert(p.contains("__band"), s"band key must appear in the plan:\n$p")
  }

  test("x33: batch split pushes to the scan; the persisted index rides a plain parquet scan") {
    val p = plan("x33_incremental_passage_dedup")
    assert(p.contains("GreaterThanOrEqual(doc_id,250)"),
      s"the batch split must push down to the documents scan:\n$p")
    assert(p.contains("graft-passidx"),
      "the index side must be the persisted passages table, not re-chunked corpus text")
  }

  test("dsum sums plain longs, not wide decimals, per row") {
    val p = plan("q27_stat_moments")
    assert(p.contains("sum("), "aggregation present")
    assert(!p.toLowerCase.contains("sum(cast") ||
      !p.contains("decimal(28"),
      "per-row decimal(28) accumulation must not reappear")
  }

  test("x47: the DSIR log-ratio model broadcasts into the scoring join") {
    val p = plan("x47_dsir_weights")
    // the model side is O(buckets): it must ride a BroadcastExchange,
    // never shuffle the corpus on the model join
    assert(p.contains("BroadcastHashJoin"), "model join must broadcast")
  }

  test("x50: the df-cut term table broadcasts back onto tf") {
    val p = plan("x50_tfidf_cosine_pairs")
    assert(p.contains("BroadcastHashJoin"), "kept-term join must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k pairs must not globally sort")
  }

  test("x51: in-domain positions use a keyed window, not a global one") {
    val p = plan("x51_mixture_interleave")
    // the corpus-sized window must be partitioned by domain; the only
    // unpartitioned window runs over the O(domains) table
    val corpusWin = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .filter(_.contains("__id"))
    assert(corpusWin.forall(_.contains("__d")),
      "per-doc row_number must be partitioned by domain")
    assert(!p.contains("SortMergeJoin"),
      "the domain table must broadcast, never shuffle the corpus")
  }

  test("x53: zipf fit plans one TakeOrderedAndProject and no joins") {
    val p = plan("x53_zipf_fit")
    assert(p.contains("TakeOrderedAndProject"), "top-R must not globally sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "nothing corpus-sized may join")
  }

  test("x55: the boilerplate anti-join's build side is the filtered support table") {
    val p = plan("x55_boilerplate_removal")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      "boilerplate set must broadcast; the corpus passage stream stays put")
  }

  test("x57: the persisted model rides a plain parquet scan + broadcast") {
    val p = plan("x57_dsir_indexed")
    assert(p.contains("Scan parquet"), "model must come off its committed files")
    assert(p.contains("BroadcastHashJoin"), "model join must broadcast")
  }

  test("x60: the Gopher gate is one codegen'd projection — no interpreted HOF") {
    val p = plan("x60_gopher_rules")
    // ArrayFilter lambdas are CodegenFallback (interpreted per element,
    // per row) — the gate's counts must restate them as
    // regexp_extract_all so the whole row stays in WholeStageCodegen
    assert(!p.contains("lambdafunction"),
      s"x60 must not plan an interpreted HOF lambda:\n$p")
    assert(!p.contains("Exchange"),
      s"the gate is row-local and must fuse into the scan:\n$p")
    assert(p.contains("[codegen id"), "projection must codegen")
  }

  test("x61: gram/cov never self-joins the corpus; only the d²/2 agg shuffles") {
    // earlier tests in this suite execute queries (x67's pca fit) that
    // leave Staged frames cached; a matching cached subtree changes
    // which aggregations CacheManager absorbs and the exchange count
    // with it — pin the CLEAN-session plan, which is the shape any
    // fresh pipeline gets
    graft.ops.Staged.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    val p = plan("x61_embedding_gram")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the corpus must never be self-joined or shuffled for a join:\n$p")
    assert(!p.contains("lambdafunction"),
      s"the two-generator product build must stay codegen'd (no HOF):\n$p")
    // the only hash shuffles: the (i,j) product agg (key space d²/2)
    // and the per-dim moment agg (key space d, staged so it runs ONCE
    // for both join sides) — never corpus-keyed. Formatted mode names
    // shuffles "(n) Exchange" and broadcasts "(n) BroadcastExchange",
    // so anchor on the word boundary.
    val shuffles = """\(\d+\) Exchange\b""".r.findAllIn(p).size
    assert(shuffles == 2, s"expected the 2 bounded-key shuffles, saw $shuffles:\n$p")
    // per-dim means ride BroadcastExchanges into the final d²/2 join
    assert(p.contains("BroadcastHashJoin"), "dim-stats joins must broadcast")
  }

  test("x67: the PCA projection fuses into the scan — no exchange, no join") {
    val p = plan("x67_pca_project")
    assert(!"""\(\d+\) Exchange\b""".r.findFirstIn(p).isDefined &&
      !p.contains("Join"),
      s"projection must be scan-local:\n$p")
    assert(p.contains("dot_product") && p.contains("[codegen id"),
      "native dot products against literal components, codegen'd")
  }

  test("x68: the vocab cut is TakeOrderedAndProject and broadcasts back") {
    val p = plan("x68_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-V cut must not globally sort")
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "the vocabulary must broadcast onto the token stream")
    assert(!p.contains("SortMergeJoin"),
      "corpus tokens must never shuffle for the vocab join")
  }

  test("x70: the whitened projection keeps x67's scan-local shape") {
    // the 1/√λ scale folds driver-side, so whitening must not add a
    // single plan node class over x67: no exchange, no join, native
    // dot products, whole-stage codegen
    val p = plan("x70_pca_whiten")
    assert(!"""\(\d+\) Exchange\b""".r.findFirstIn(p).isDefined &&
      !p.contains("Join"),
      s"whitened projection must be scan-local:\n$p")
    assert(p.contains("dot_product") && p.contains("[codegen id"),
      "native dot products against literal components, codegen'd")
  }

  test("x71: the source slice adds one bounded groupBy over x68's shape") {
    val p = plan("x71_source_oov")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-V cut must not globally sort")
    assert(!p.contains("CartesianProduct"), s"no unbounded product:\n$p")
    // the V-row vocabulary is the one genuinely bounded side: it must
    // broadcast onto the token stream (corpus tokens never shuffle for
    // THIS join). The doc→source attachment joins two O(docs) sides on
    // the doc key — SMJ or BHJ is legitimately stats-dependent there
    // (at 100 TB documents is corpus-sized and broadcast would be the
    // WRONG pin), so the strategy is deliberately not asserted.
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "the vocabulary must broadcast onto the token stream")
  }
}
