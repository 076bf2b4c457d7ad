package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic bounded-merge byte-pair-encoding (BPE) tokenizer fit —
  * completing the tokenizer-sizing family: x68 sizes a WORD vocabulary,
  * but real pipelines commit a SUBWORD tokenizer, and the artifact that
  * gets committed is an ordered merge list (Sennrich et al. 2016, the
  * public BPE recipe).
  *
  * 100 TB shape (why this fits a Spark pipeline at all): the corpus is
  * scanned exactly ONCE — the word-frequency aggregation — and every
  * merge iteration runs over the VOCABULARY table (one row per distinct
  * word: symbol array + corpus frequency), bounded by vocabulary size,
  * not corpus size. Per iteration: one row-local adjacent-pair explode,
  * one map-side-combining (left, right)-keyed count whose key space is
  * the live pair vocabulary, one driver argmax of a single row, one
  * row-local merge application. No joins, no corpus re-reads, nothing
  * corpus-sized ever shuffles.
  *
  * Determinism: pair counts are exact integers over exact word
  * frequencies; the argmax tie-break is (count desc, left asc, right
  * asc) — a total order — so the fitted merge sequence is independent
  * of partitioning (spec-pinned); the per-word application is the
  * published left-to-right greedy rule (only l==r pairs can overlap,
  * resolved leftmost-first).
  *
  * The per-word symbol rewrite is a typed map — a deliberate use of
  * the imperative-per-row-logic exception: applying one merge to a
  * symbol array is inherently sequential per word, and the frame it
  * runs over is vocabulary-sized. Each generation is
  * `localCheckpoint`ed (the CC lesson: the plan otherwise re-embeds
  * every earlier generation's map and re-analysis dominates) with the
  * retired generation's blocks released immediately and the final one
  * registered for `Staged.releaseCheckpoints`.
  */
object Bpe {

  /** One fitted merge rule: at `step`, the adjacent pair (left, right)
    * was the corpus's most frequent (weighted by word frequency) and
    * every occurrence was fused into the symbol `left+right`.
    */
  final case class Merge(step: Int, left: String, right: String, freq: Long)

  /** The fitted artifact: the ordered merge list (driver-bounded by
    * `nMerges` — this IS the tokenizer) plus the final per-word
    * symbolization table (word, syms, freq), vocabulary-sized, which
    * [[tokenize]] joins against and the oracle replays from.
    */
  final case class Fit(merges: Seq[Merge],
      words: Dataset[(String, Seq[String], Long)]) {
    /** (word, syms "a b c", n_syms) — the dumpable/joinable view. */
    def wordTable: DataFrame = {
      val spark = words.sparkSession
      import spark.implicits._
      words.toDF("word", "__syms", "freq")
        .select($"word", concat_ws(" ", $"__syms").as("syms"),
          size($"__syms").cast("long").as("n_syms"))
    }
    def mergeTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      merges.toDF("step", "left", "right", "freq")
    }
  }

  /** Left-to-right greedy application of one merge to one word's
    * symbols — the published BPE rule. Only l==r can self-overlap
    * ("aaa" under (a,a) → "aa a", never "a aa").
    */
  private[graft] def mergePair(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize ONE word under a committed merge list: sequential
    * application in fit order — which reproduces the fit's own
    * segmentation exactly for every in-fit word (each rule's
    * constituents were formed before the rule, so an earlier rule's
    * pair can never re-appear after a later one fires; BpeSpec pins
    * the identity over a whole fitted vocabulary) and extends
    * deterministically to unseen words. This is the driver/executor
    * shared primitive the streaming fertility monitor applies to
    * arriving batch vocabularies.
    */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (l, r)) => if (syms.length < 2) syms else mergePair(syms, l, r)
    }

  private def checkpointRdds(ds: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** THE one corpus pass shared by every fit path: distinct words +
    * exact frequencies. Everything downstream is vocabulary-sized.
    */
  private[graft] def wordFreqs(df: DataFrame, textCol: String)
      : Dataset[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
  }

  def fit(df: DataFrame, textCol: String, nMerges: Int): Fit = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    // seed the word table with single-character symbols
    val seed: Dataset[(String, Seq[String], Long)] =
      wordFreqs(df, textCol)
      .map { case (w, f) => (w, w.map(_.toString): Seq[String], f) }
      .localCheckpoint()
    fitLoop(seed, nMerges)
  }

  /** The distributed merge loop over a seeded (word, syms, freq)
    * generation — one Spark job per merge; [[fit]] and [[fitAuto]]'s
    * fallback both land here.
    */
  private def fitLoop(seed: Dataset[(String, Seq[String], Long)],
      nMerges: Int): Fit = {
    val spark = seed.sparkSession
    import spark.implicits._
    var words = seed
    var prevRdds = checkpointRdds(words)
    val merges = Seq.newBuilder[Merge]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      // adjacent pairs weighted by word frequency; vocabulary-sized
      val top = words.flatMap { case (_, syms, f) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1))
          .map { case (a, b) => (a, b, f) }
      }.toDF("l", "r", "f")
        .groupBy($"l", $"r").agg(sum($"f").as("n"))
        .orderBy($"n".desc, $"l", $"r").limit(1)
        .as[(String, String, Long)].collect()
      top.headOption match {
        case None => exhausted = true // every word is one symbol
        case Some((l, r, n)) =>
          merges += Merge(step, l, r, n)
          val next = words
            .map { case (w, syms, f) => (w, mergePair(syms, l, r), f) }
            .localCheckpoint()
          val nextRdds = checkpointRdds(next)
          prevRdds.foreach(rdd =>
            try rdd.unpersist(blocking = false)
            catch { case _: Throwable => () })
          words = next
          prevRdds = nextRdds
          step += 1
      }
    }
    // the surviving generation backs the returned Fit: its truncated
    // lineage cannot recompute, so it lives in the checkpoint queue —
    // released only by the caller's post-consumption releaseCheckpoints
    prevRdds.foreach(Staged.trackRdd)
    Fit(merges.result(), words)
  }

  /** Default driver-side vocabulary bound for [[fitLocal]]/[[fitAuto]]:
    * 2^20 distinct words ≈ tens of MB of driver state — the same class
    * of bounded collect as the PQ codebook fit. Web-scale tokenizer
    * fits already frequency-floor/sample the word table to this order
    * (a tokenizer is a property of the distribution, not the corpus),
    * so the bound is a policy statement, not a capability limit; an
    * unboundable vocabulary takes the distributed path.
    */
  val DefaultMaxLocalVocab: Int = 1 << 20

  /** Unsigned-UTF-8-byte string order — EXACTLY the order Spark's
    * `orderBy` puts on a string column (UTF8String compares bytes
    * unsigned), so the local argmax tie-break cannot drift from the
    * distributed one even off ASCII.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The sequential Sennrich merge loop over a DRIVER-HELD word table —
    * the identical recipe as [[fit]]'s per-iteration Spark jobs
    * (adjacent-pair counts weighted by word frequency, argmax with the
    * (count desc, left asc, right asc) total-order tie-break, leftmost-
    * first merge application), so the fitted merge SEQUENCE is exactly
    * the distributed fit's (BpeSpec pins the identity; exact integer
    * counts + a total order make it provable, not probabilistic).
    *
    * Cost shape — why this collapses the 32k-merge bill: pair counts
    * update INCREMENTALLY (only words containing the merged pair are
    * re-counted, via a pair → affected-words index), so a merge costs
    * O(affected symbols), not O(vocabulary); the per-merge argmax scans
    * the live pair table. The distributed fit schedules one Spark job
    * per merge (~0.3 s of driver-sequenced latency each — SCALE.md's
    * measured constant, a ~2.2 h bill at 32k merges); here the same
    * 32k merges are pure driver compute over the bounded table,
    * seconds-to-minutes total.
    */
  private[graft] def fitWords(table: Array[(String, Long)], nMerges: Int)
      : (Seq[Merge], Array[(String, Seq[String], Long)]) = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val syms = table.map { case (w, _) => w.map(_.toString).toArray }
    val freqs = table.map(_._2)
    // stats: live adjacent-pair counts (overlap-inclusive, matching the
    // distributed zip(drop(1)) count); index: pair -> words holding it
    val stats = new java.util.HashMap[(String, String), Long]()
    val index =
      new java.util.HashMap[(String, String), java.util.HashSet[Int]]()
    def addWord(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        val n = stats.getOrDefault(p, 0L) + sign * freqs(i)
        if (n == 0L) stats.remove(p) else stats.put(p, n)
        if (sign > 0)
          index.computeIfAbsent(p, _ => new java.util.HashSet[Int]()).add(i)
        j += 1
      }
      // stale index entries (words that no longer hold a pair) are
      // dropped lazily when the pair is merged — cheaper than eager
      // removal and harmless: a stale word contributes zero occurrences
    }
    var i = 0
    while (i < syms.length) { addWord(i, 1L); i += 1 }
    val merges = Seq.newBuilder[Merge]
    var step = 0
    while (step < nMerges && !stats.isEmpty) {
      // argmax under the distributed total order
      var bestP: (String, String) = null
      var bestN = Long.MinValue
      val it = stats.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val better = e.getValue > bestN ||
          (e.getValue == bestN && (utf8Lt(e.getKey._1, bestP._1) ||
            (e.getKey._1 == bestP._1 && utf8Lt(e.getKey._2, bestP._2))))
        if (better) { bestP = e.getKey; bestN = e.getValue }
      }
      merges += Merge(step, bestP._1, bestP._2, bestN)
      val holders = index.remove(bestP)
      if (holders != null) {
        val hit = holders.iterator()
        while (hit.hasNext) {
          val w = hit.next()
          val before = syms(w)
          // re-count exactly like one distributed iteration: remove the
          // word's old adjacent pairs, apply the merge, add the new ones
          var j = 0
          var holds = false
          while (!holds && j + 1 < before.length) {
            holds = before(j) == bestP._1 && before(j + 1) == bestP._2
            j += 1
          }
          if (holds) {
            addWord(w, -1L)
            syms(w) = mergePair(before.toSeq, bestP._1, bestP._2).toArray
            addWord(w, 1L)
          }
        }
      }
      stats.remove(bestP) // merged away; defensive (addWord removed it)
      step += 1
    }
    (merges.result(),
      table.indices.map(j => (table(j)._1, syms(j).toSeq, freqs(j))).toArray)
  }

  /** [[fit]] with the merge loop run DRIVER-SIDE over the collected
    * word-frequency table — identical merge sequence and symbolization
    * (spec-pinned), at none of the one-Spark-job-per-merge latency.
    * The collect is bounded: at most `maxVocab + 1` rows ever reach the
    * driver (a `limit`, not a full collect), and a vocabulary over the
    * bound fails loudly — callers with unboundable vocabularies use
    * [[fit]] (or [[fitAuto]], which falls back automatically).
    */
  def fitLocal(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = DefaultMaxLocalVocab): Fit = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = wordFreqs(df, textCol).limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab distinct words — use fit() " +
        "(distributed merge loop) or raise the bound")
    val (merges, words) = fitWords(rows, nMerges)
    Fit(merges, spark.createDataset(words.toSeq))
  }

  /** Vocabulary-adaptive fit: ONE corpus pass computes the word table;
    * if it fits the driver bound the merge loop runs locally
    * ([[fitWords]] — seconds at 32k merges), else the distributed
    * per-merge jobs take over from the SAME checkpointed table (no
    * second corpus scan). Both paths produce the identical artifact.
    */
  def fitAuto(df: DataFrame, textCol: String, nMerges: Int,
      maxLocalVocab: Int = DefaultMaxLocalVocab): Fit = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val wf = wordFreqs(df, textCol).localCheckpoint()
    val wfRdds = checkpointRdds(wf)
    val rows = wf.limit(maxLocalVocab + 1).collect()
    if (rows.length <= maxLocalVocab) {
      wfRdds.foreach(rdd =>
        try rdd.unpersist(blocking = false)
        catch { case _: Throwable => () })
      val (merges, words) = fitWords(rows, nMerges)
      Fit(merges, spark.createDataset(words.toSeq))
    } else {
      // unboundable vocabulary: distributed merge loop, seeded from the
      // already-computed word table
      var words: Dataset[(String, Seq[String], Long)] = wf
        .map { case (w, f) => (w, w.map(_.toString): Seq[String], f) }
        .localCheckpoint()
      wfRdds.foreach(rdd =>
        try rdd.unpersist(blocking = false)
        catch { case _: Throwable => () })
      fitLoop(words, nMerges)
    }
  }

  /** [[fit]] persisted as a BUILD-ONCE artifact — the real tokenizer
    * lifecycle: a pipeline fits ONCE and every consumer (per-doc
    * tokenization, fertility slices, packing, streaming monitors)
    * reads the committed artifact; re-running the fit per consumer
    * both wastes a corpus scan each time and risks serving two
    * different tokenizers if the corpus moved between fits.
    *
    * Layout under `path`: `merges/` (step, left, right, freq — the
    * tokenizer itself, the oracle's replay source) and `words/`
    * (word, syms, freq — the fit corpus's symbolization table
    * [[tokenize]] joins). Build-once via a PARAM-COMPLETE versioned
    * marker (the PQ face's discipline): the marker carries textCol and
    * nMerges plus the caller's `corpusTag` (a fingerprint of the fit
    * corpus — a regenerated corpus must invalidate the artifact, or
    * both engines would replay the same STALE symbolization and
    * hash-agree on wrong data; the tag is REQUIRED non-empty for
    * exactly that reason — an untagged marker would be param-complete
    * for textCol/nMerges but blind to the corpus itself). A marker
    * mismatch deletes every stale marker and rebuilds both tables —
    * unlike the PQ face there is no mixed-state hazard to fail loudly
    * over, because the artifact is rewritten whole (mode overwrite)
    * and nothing appends to it.
    *
    * SINGLE-WRITER assumption (shared with [[Ivf.buildPersistent]] /
    * `Pq.pqAssign`): the check-delete-fit-write-mark sequence is not
    * safe against two concurrent drivers sharing one artifact path —
    * both can miss the marker and interleave overwrites with the
    * other's [[readFit]]. One pipeline owns an artifact directory;
    * concurrent READERS of a committed artifact are fine.
    */
  def fitCached(df: DataFrame, textCol: String, nMerges: Int, path: String,
      corpusTag: String): Fit = {
    require(corpusTag.nonEmpty,
      "corpusTag must be a non-empty fingerprint of the fit corpus — " +
        "an untagged marker would serve a stale tokenizer after the " +
        "corpus at the same path is regenerated")
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/_BPE_OK_v1_${textCol}_m${nMerges}_f$corpusTag")
    if (!fs.exists(marker)) {
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/_BPE_OK_*")))
        .toSeq.flatten.foreach(st => fs.delete(st.getPath, false))
      // vocabulary-adaptive: the driver-local merge loop when the word
      // table fits the bound (identical artifact, spec-pinned — so the
      // committed marker/hashes are path-independent), distributed jobs
      // otherwise
      val f = fitAuto(df, textCol, nMerges)
      f.mergeTable(spark).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/merges")
      f.words.toDF("word", "syms", "freq")
        .write.mode("overwrite").parquet(s"$path/words")
      fs.create(marker, true).close()
      // the fit's checkpointed generation is now safely on disk; its
      // blocks are released with the caller's next releaseCheckpoints
    }
    readFit(spark, path)
  }

  /** The two faces a tokenizer refit rebuilds/swaps, in swap order. */
  private val RefitFaces = Seq("merges", "words")

  /** REPAIR the drift the fertility/OOV monitors detect — the tokenizer
    * half of the detect→decide→repair loop the index family already
    * closed: a committed [[fitCached]] artifact shreds drifted ingest
    * into near-characters ([[graft.streaming.Streams
    * .fertilityMonitorStream]] is the gauge), and the answer so far was
    * "delete the path and re-fit by hand". This re-fits the SAME
    * textCol/nMerges parameters (parsed from the committed `_BPE_OK_v1`
    * marker) over the caller's CURRENT corpus and promotes the new
    * `merges/` + `words/` under a fresh `corpusTag` through a
    * crash-recoverable versioned swap — [[graft.ops.Ivf.refitIndex]]'s
    * discipline on the two-face artifact: everything builds under
    * `__refit_tmp/` (staged marker included), the commit point is the
    * `_REFIT_COMMIT` file written LAST, and [[recoverRefit]] rolls a
    * torn swap forward (or discards an uncommitted build) on the next
    * maintenance call. Single-writer, like [[fitCached]]: one
    * maintenance loop owns a tokenizer artifact; consumers holding a
    * [[Fit]] keep serving the retired generation (the merge list is a
    * driver-side snapshot), new [[readFit]] calls see the promoted one.
    */
  def refitCommitted(spark: SparkSession, path: String, df: DataFrame,
      textCol: String, corpusTag: String): Unit = {
    recoverRefit(spark, path)
    buildRefitTmp(spark, path, df, textCol, corpusTag)
    swapRefit(spark, path)
  }

  /** [[refitCommitted]]'s build phase, up to and including the
    * `_REFIT_COMMIT` file — exposed to the spec as the crash point
    * (after this, the old faces are still fully live on disk; the next
    * [[recoverRefit]] rolls the swap forward).
    */
  private[graft] def buildRefitTmp(spark: SparkSession, path: String,
      df: DataFrame, textCol: String, corpusTag: String): Unit = {
    require(corpusTag.nonEmpty, "corpusTag must be non-empty (see fitCached)")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Re = ("_BPE_OK_v1_" + java.util.regex.Pattern.quote(textCol) +
      """_m(\d+)_f(.+)$""").r
    val committed = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$path/_BPE_OK_v1_${textCol}_*"))).toSeq.flatten
      .map(_.getPath.getName).collect { case Re(m, tag) => (m.toInt, tag) }
    require(committed.length == 1,
      s"tokenizer at $path needs exactly one committed _BPE_OK_v1_${textCol} " +
        s"marker to refit under its own parameters; found: $committed")
    val nMerges = committed.head._1
    val tmp = s"$path/__refit_tmp"
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp))
    val f = fitAuto(df, textCol, nMerges)
    f.mergeTable(spark).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/merges")
    f.words.toDF("word", "syms", "freq")
      .write.mode("overwrite").parquet(s"$tmp/words")
    fs.create(new org.apache.hadoop.fs.Path(
      s"$tmp/_BPE_OK_v1_${textCol}_m${nMerges}_f$corpusTag"), true).close()
    // the commit point: everything above is invisible until this file
    fs.create(new org.apache.hadoop.fs.Path(s"$tmp/_REFIT_COMMIT"), true)
      .close()
  }

  /** Finish (committed) or discard (uncommitted) a tokenizer refit a
    * crashed run left behind — called first by [[refitCommitted]] and
    * safe any time; a no-op without refit debris. Returns true when a
    * committed swap was rolled forward.
    */
  def recoverRefit(spark: SparkSession, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/__refit_tmp")
    if (fs.exists(tmp)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(tmp, "_REFIT_COMMIT"))) {
        swapRefit(spark, path); true
      } else {
        require(fs.delete(tmp, true), s"bpe refit: delete failed for $tmp")
        false
      }
    } else {
      // stray per-face debris without a tmp: crash inside the
      // post-commit swap's cleanup — live faces are authoritative
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$path/__refit_old_*"))).toSeq.flatten.foreach { st =>
        val live = new org.apache.hadoop.fs.Path(path,
          st.getPath.getName.stripPrefix("__refit_old_"))
        if (fs.exists(live))
          require(fs.delete(st.getPath, true),
            s"bpe refit: delete failed for ${st.getPath}")
        else require(fs.rename(st.getPath, live),
          s"bpe refit: rollback rename ${st.getPath} -> $live failed")
      }
      false
    }
  }

  /** The idempotent post-commit swap (the Ivf discipline on two faces
    * plus the marker): every crash state maps to one resume action.
    */
  private def swapRefit(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    RefitFaces.foreach { face =>
      val tmpSub = new org.apache.hadoop.fs.Path(s"$path/__refit_tmp/$face")
      val live = new org.apache.hadoop.fs.Path(s"$path/$face")
      val old = new org.apache.hadoop.fs.Path(s"$path/__refit_old_$face")
      if (fs.exists(tmpSub)) {
        if (fs.exists(live) && !fs.exists(old))
          require(fs.rename(live, old),
            s"bpe refit: rename $live -> $old failed")
        if (!fs.exists(live))
          require(fs.rename(tmpSub, live),
            s"bpe refit: rename $tmpSub -> $live failed")
        else require(fs.delete(tmpSub, true),
          s"bpe refit: delete failed for $tmpSub")
      }
    }
    RefitFaces.foreach { face =>
      val old = new org.apache.hadoop.fs.Path(s"$path/__refit_old_$face")
      if (fs.exists(old))
        require(fs.delete(old, true), s"bpe refit: delete failed for $old")
      spark.catalog.refreshByPath(s"$path/$face")
    }
    // promote the staged marker, retiring every differing committed one
    // (crash-safe in both directions, the Ivf marker rule verbatim)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$path/__refit_tmp/_BPE_OK_*"))).toSeq.flatten.foreach { st =>
      val name = st.getPath.getName
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$path/_BPE_OK_*"))).toSeq.flatten
        .filter(_.getPath.getName != name)
        .foreach(o => require(fs.delete(o.getPath, false),
          s"bpe refit: delete failed for ${o.getPath}"))
      val dest = new org.apache.hadoop.fs.Path(path, name)
      if (fs.exists(dest))
        require(fs.delete(st.getPath, false),
          s"bpe refit: delete failed for ${st.getPath}")
      else require(fs.rename(st.getPath, dest),
        s"bpe refit: rename ${st.getPath} -> $dest failed")
    }
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$path/__refit_tmp"), true),
      s"bpe refit: delete failed for $path/__refit_tmp")
  }

  /** Reload a persisted fit. The merge list is driver-bounded
    * (nMerges rows); the symbolization table stays a lazy scan.
    */
  def readFit(spark: SparkSession, path: String): Fit = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$path/merges")
      .select(col("step").cast("int"), col("left"), col("right"),
        col("freq").cast("long"))
      .as[Merge].collect().toSeq.sortBy(_.step)
    val words = spark.read.parquet(s"$path/words")
      .select(col("word"), col("syms"), col("freq"))
      .as[(String, Seq[String], Long)]
    Fit(merges, words)
  }

  /** Tokenize documents under a fitted BPE: (id, n_words, n_bpe_tokens,
    * bpe_text) with bpe_text the word-ordered space-joined subword
    * stream — the context-length planning signal (n_bpe_tokens is what
    * a context window actually holds; n_words is what x68 counts).
    * Docs with no tokens have no row (x65's rule). One explode + one
    * word-keyed join against the vocabulary-sized symbolization table
    * (broadcast when small — AQE's call) + one doc-keyed re-agg.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      fit: Fit): DataFrame = {
    val m = fit.wordTable
    df.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "word")))
      .join(m, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        array_join(sort_array(collect_list(struct(col("__pos"), col("syms"))))
          .getField("syms"), " ").as("bpe_text"))
  }

  /** Tokenize an ARBITRARY corpus under a committed merge list — the
    * batch face of what the streaming fertility monitor already does
    * per batch. [[tokenize]] joins the FIT corpus's symbolization
    * table, so words the fit never saw silently vanish — lossless by
    * construction for the fit corpus, wrong for the committed
    * tokenizer's main consumer: NEW data. Here each distinct word of
    * THIS corpus is segmented from the merge list itself
    * ([[applyMerges]] — which reproduces the fit's own segmentation
    * exactly for in-fit words and extends deterministically to unseen
    * ones), so no word can drop.
    *
    * Scale shape: one distinct over the corpus's words (vocabulary-
    * sized output; the per-word rewrite is the documented
    * imperative-per-row exception over that bounded frame, with the
    * driver-bounded merge list riding the closure), Staged so the
    * join side never recomputes the segmentation, then x72's
    * explode + word-keyed join + doc-keyed re-agg. Two corpus passes
    * total (distinct-words + join) — the price of not having a
    * precomputed symbolization for this corpus.
    */
  def tokenizeWith(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "word")))
    val vocab = Staged(toks.select($"word").distinct().as[String]
      .map(w => (w, applyMerges(w, merges)))
      .toDF("word", "__syms")
      .select($"word", concat_ws(" ", $"__syms").as("syms"),
        size($"__syms").cast("long").as("n_syms")))
    toks.join(vocab, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"),
        array_join(sort_array(collect_list(struct(col("__pos"), col("syms"))))
          .getField("syms"), " ").as("bpe_text"))
  }

  /** Per-group subword fertility (tokens per word under a committed
    * fit) — the batch face of the streaming fertility monitor, sliced
    * the way acquisition decisions are made (per source, per lang):
    * fertility prices a source in the units that bill compute, context-
    * window slots. A source the committed tokenizer shreds to
    * near-characters costs 2-4× its word count to train on.
    *
    * One token explode + one word-keyed join against the vocabulary-
    * sized symbolization table (broadcast-sized for any committed
    * tokenizer) + one group-keyed agg — no doc-level intermediate, so
    * the group agg is the only shuffle and its key space is the slice
    * cardinality. Fertility rides exact integer sums (partition-order
    * independent); groups whose docs have no tokens have no row (x65's
    * rule). Lossless when `df` is the fit corpus (every word is in the
    * table by construction); for OTHER corpora use the streaming
    * monitor's applyMerges path, which extends to unseen words.
    */
  def fertilityBy(df: DataFrame, textCol: String, groupCol: String,
      fit: Fit): DataFrame =
    df.select(col(groupCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(fit.wordTable.select(col("word"), col("n_syms")), "word")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6))

  /** [[fertilityBy]] for corpora the fit has NOT necessarily seen —
    * the [[applyMerges]] extension path ([[tokenizeWith]]'s rule,
    * sliced per group): each distinct word of THIS corpus is segmented
    * from the merge list itself, identical to the fit's own
    * segmentation for in-fit words and deterministic for unseen ones,
    * so no word silently drops out of the average. This is the face
    * acquisition pricing must use — the novel sources a renew/cut
    * table exists to price are exactly the ones whose words the fit
    * never saw, and the inner-join face would bias their fertility low
    * (or NULL them entirely).
    *
    * Scale shape: one distinct over the corpus's words (vocabulary-
    * sized; the per-word rewrite is the documented imperative-per-row
    * exception over that bounded frame, the driver-bounded merge list
    * riding the closure, Staged so the join side computes once), then
    * the token explode + word-keyed join + group-keyed agg — the group
    * agg is the only corpus-sized shuffle and its key space is the
    * slice cardinality.
    */
  def fertilityByMerges(df: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(groupCol),
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val nSyms = Staged(toks.select($"word").distinct().as[String]
      .map(w => (w, applyMerges(w, merges).size.toLong))
      .toDF("word", "n_syms"))
    toks.join(nSyms, "word")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"))
      .withColumn("fertility",
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6))
  }
}
