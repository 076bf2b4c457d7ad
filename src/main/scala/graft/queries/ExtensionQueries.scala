package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.ops.{Dedup, Ivf, Layout, Multimodal, Scrub, Similarity, TextAnalysis}
import graft.sources.Tables

/** [EXTENSION] operators (SURVEY §2.2): dedup, similarity search,
  * text analysis, multimodal columns — the LLM-training-data surface.
  *
  * Where the algorithm is portable (same tokenization/arithmetic
  * expressible in DuckDB SQL) the query carries a full oracle — including
  * MinHash-LSH, whose verified output provably equals the exact pairwise
  * join above the threshold (candidate recall ≈ 1-5e-8). Approximate ops
  * whose internals hinge on xxhash64 (SimHash, LSH buckets) are
  * rows-only here and accuracy-tested in ScalaTest instead.
  */
object ExtensionQueries {

  /** DuckDB-side 3-gram shingle CTE, kept in lockstep with
    * [[graft.ops.Shingles]] (same regex, same n, same distinct).
    */
  private val shingleCte =
    """WITH toks AS (
         SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
         FROM documents),
       sh AS (
         SELECT doc_id, list_distinct(
           [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
            FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s
         FROM toks),
       nz AS (SELECT * FROM sh WHERE len(s) > 0)"""

  /** x26's Misra-Gries capacity — ONE definition feeding both the
    * Scala sketch and the oracle SQL's N/(k+1) bound (a hardcoded 31
    * in the SQL would silently diverge when k changes).
    */
  private val HeavyHitterK = 30

  /** x31 calls [[Ivf.kForCells]] on the corpus row count every
    * execution; memoized per (session, dir) so bench runs don't pay a
    * count scan per timed run (the count is a constant of the sfDir).
    */
  private val corpusCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def embeddingsCount(s: org.apache.spark.sql.SparkSession,
      dir: String): Long =
    corpusCounts.computeIfAbsent(s"${System.identityHashCode(s)}|$dir",
      _ => Tables(s, dir, "embeddings").count())

  val all: Seq[GraftQuery] = Seq(

    // ---- exact dedup: one shuffle on the content key.
    GraftQuery(
      "x01_dedup_exact",
      (s, dir) => Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""SELECT text, min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text""")),

    // ---- canonical-form fingerprint dedup (formatting-robust exact).
    GraftQuery(
      "x02_dedup_fingerprint",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .withColumn("fp", TextAnalysis.fingerprint($"text"))
          .groupBy($"fp")
          .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      },
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY 1""")),

    // ---- MinHash-LSH near-dup, exact-Jaccard-verified. The oracle is
    // the exact O(n²) pairwise join — equality holds because LSH recall
    // above τ=0.8 is 1-(1-0.8⁴)³² ≈ 1-5e-8.
    GraftQuery(
      "x03_dedup_minhash_lsh",
      (s, dir) => Dedup.minHashLsh(
        Tables(s, dir, "documents"), "doc_id", "text", threshold = 0.8),
      Some(s"""$shingleCte
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""")),

    // ---- exact n-gram Jaccard join within a blocking key (lang).
    GraftQuery(
      "x04_dedup_ngram_blocked",
      (s, dir) => Dedup.ngramJaccardBlocked(
        Tables(s, dir, "documents"), "doc_id", "text", "lang", n = 3, threshold = 0.5),
      Some(s"""WITH toks AS (
          SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, lang, list_distinct(
            [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s
          FROM toks),
        nz AS (SELECT * FROM sh WHERE len(s) > 0)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM nz a JOIN nz b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.5""")),

    // ---- SimHash near-dup. The xxhash64 fingerprint itself has no
    // DuckDB equivalent, but once dumped it is DATA: the pigeonhole
    // block join is complete by construction (a pair within the
    // Hamming bound must agree on one whole block), so the operator's
    // result must equal the oracle's exact pairwise Hamming
    // recomputation over the dumped fingerprints.
    GraftQuery(
      "x05_dedup_simhash",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        OracleDump.dump(
          docs.select($"doc_id", Dedup.simHash($"text").as("sim")),
          dir, "x05_simhash")
        Dedup.simHashNearDup(docs, "doc_id", "text", maxHamming = 6)
      },
      Some("""WITH s AS (SELECT doc_id, sim
          FROM read_parquet('__SCRATCH__/x05_simhash/*.parquet'))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= 6"""),
      notes = "oracle = exact pairwise Hamming over the dumped fingerprints"),

    // ---- per-document text statistics (token counting incl. BPE-ish).
    GraftQuery(
      "x06_text_stats",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents").select(
          $"doc_id",
          length($"text").as("n_chars"),
          TextAnalysis.nTokens($"text").as("n_tokens"),
          TextAnalysis.nDistinctTokens($"text").as("n_distinct"),
          TextAnalysis.bpeishTokenCount($"text").as("n_bpeish"),
          TextAnalysis.punctCount($"text").as("n_punct"),
          TextAnalysis.digitCount($"text").as("n_digits"))
      },
      Some("""SELECT doc_id, length(text) AS n_chars,
        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_tokens,
        CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS INT) AS n_distinct,
        CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpeish,
        CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS n_punct,
        CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits
        FROM documents""")),

    // ---- heuristic quality score (C4/Gopher-style filters).
    GraftQuery(
      "x07_quality_score",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select($"doc_id", TextAnalysis.qualityScore($"text").as("quality"))
      },
      Some("""WITH q AS (SELECT doc_id, text,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n,
          CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) AS nd,
          CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
            x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                       'for','on','with','as','at','by','from','that','this'))) AS DOUBLE) AS stop,
          CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
          CAST(length(text) AS DOUBLE) AS chars
        FROM documents)
        SELECT doc_id,
          (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
          + (CASE WHEN n > 0 THEN nd / n ELSE 0.0 END) * 0.25
          + least(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END * 5.0, 1.0) * 0.25
          + (CASE WHEN chars > 0 THEN 1.0 - least(punct / chars * 5.0, 1.0) ELSE 0.0 END) * 0.25
          AS quality
        FROM q""")),

    // ---- language-ID heuristic vs the labeled lang column (confusion
    // counts). The oracle replicates the profile-overlap argmax.
    GraftQuery(
      "x08_lang_id",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select($"lang", TextAnalysis.langId($"text").as("lang_pred"))
          .groupBy($"lang", $"lang_pred")
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH sc AS (SELECT lang,
          list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
          FROM documents),
        scores AS (SELECT lang,
          len(list_intersect(t, ['der','die','das','und','ist','nicht','ein','mit','von','zu'])) AS s_de,
          len(list_intersect(t, ['the','and','of','to','in','is','that','it','for','with'])) AS s_en,
          len(list_intersect(t, ['el','la','los','y','es','un','una','en','por','que'])) AS s_es,
          len(list_intersect(t, ['le','la','les','et','est','un','une','dans','pour','que'])) AS s_fr,
          len(list_intersect(t, ['de','shi','le','wo','ni','ta','zai','you','he','bu'])) AS s_zh
          FROM sc)
        SELECT lang,
          CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) <= 0 THEN 'und'
               WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
               WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
               WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
               WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
               ELSE 'zh' END AS lang_pred,
          count(*) AS n
        FROM scores GROUP BY 1, 2""")),

    // ---- token histogram: explode + count + total-order top-50.
    GraftQuery(
      "x09_token_histogram",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(explode(TextAnalysis.tokens($"text")).as("token"))
          .groupBy($"token")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token")
          .limit(50)
      },
      Some("""SELECT token, count(*) AS n FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
          FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 50""")),

    // ---- brute-force cosine top-k against the vec_id=0 query vector.
    GraftQuery(
      "x10_sim_bruteforce_topk",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          e, e.filter($"vec_id" === 0L), "vec_id", "embedding", k = 50)
      },
      Some("""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cos_sim
        FROM e, q ORDER BY cos_sim DESC, vec_id LIMIT 50""")),

    // ---- embedding-cosine near-dup pairs within a label block.
    GraftQuery(
      "x11_sim_pairs_blocked",
      (s, dir) => Similarity.cosinePairsBlocked(
        Tables(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.3),
      Some("""WITH e AS (SELECT vec_id, label,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) > 0.3""")),

    // ---- LSH-bucketed approximate top-k (the 100 TB path; recall
    // measured against brute force in SimilaritySpec). The seeded
    // hyperplane signatures are dumped as data; the oracle replays the
    // candidate equi-join + exact cosine re-rank in SQL.
    GraftQuery(
      "x12_sim_lsh_topk",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val q = e.filter($"vec_id" === 0L)
        if (OracleDump.enabled) {
          // dump AND score from the same tables — the signatures are
          // computed once, and the oracle reads exactly what was joined
          val (bucketed, probes) =
            Similarity.lshTopKTables(e, q, "vec_id", "embedding")
          OracleDump.dump(bucketed.select($"vec_id", $"bucket"), dir, "x12_buckets")
          OracleDump.dump(probes.select($"bucket"), dir, "x12_probes")
          Similarity.lshTopKFrom(bucketed, probes, "vec_id", "embedding", k = 50)
        } else Similarity.lshTopK(e, q, "vec_id", "embedding", k = 50)
      },
      Some("""WITH b AS (SELECT vec_id, bucket
          FROM read_parquet('__SCRATCH__/x12_buckets/*.parquet')),
        p AS (SELECT DISTINCT bucket
          FROM read_parquet('__SCRATCH__/x12_probes/*.parquet')),
        q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id,
          round(list_cosine_similarity(
            list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) AS cos_sim
        FROM embeddings e
        JOIN b ON e.vec_id = b.vec_id
        JOIN p ON b.bucket = p.bucket
        CROSS JOIN q
        ORDER BY cos_sim DESC, e.vec_id LIMIT 50"""),
      notes = "oracle replays the bucket join + exact re-rank over dumped signatures"),

    // ---- unblocked embedding near-dup via sign-LSH bucket join +
    // Hamming-1 multi-probe + exact cosine verify — the 100 TB path
    // when no natural blocking key exists. Recall measured in
    // SimilaritySpec; precision 1.0 by construction.
    GraftQuery(
      "x15_sim_lsh_neardup",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        if (OracleDump.enabled) {
          // staged: the dump write + both sides of the candidate join
          // consume the signatures — unstaged that is three corpus scans
          val kept = graft.ops.Staged(
            Similarity.lshNearDupBuckets(e, "vec_id", "embedding"))
          OracleDump.dump(kept.select(col("id"), col("bucket")), dir, "x15_buckets")
          Similarity.lshNearDupPairsFrom(kept, threshold = 0.3)
        } else Similarity.lshNearDupPairs(e, "vec_id", "embedding", threshold = 0.3)
      },
      // candidate predicate given the dumped signatures: buckets within
      // Hamming distance 1 (home + Hamming-1 multi-probe, matched in
      // exactly one orientation) — then the exact cosine verify
      Some("""WITH kb AS (SELECT id, bucket
          FROM read_parquet('__SCRATCH__/x15_buckets/*.parquet')),
        e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
        SELECT a.id AS id_a, b.id AS id_b,
          round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
        FROM kb a
        JOIN kb b ON a.id < b.id AND bit_count(xor(a.bucket, b.bucket)) <= 1
        JOIN e ea ON a.id = ea.vec_id
        JOIN e eb ON b.id = eb.vec_id
        WHERE round(list_cosine_similarity(ea.v, eb.v), 6) > 0.3"""),
      notes = "oracle = Hamming<=1 candidate predicate + exact cosine over dumped signatures"),

    // ---- directed kNN graph over the whole corpus: every vector's
    // top-k cosine neighbors among sign-LSH candidates (home +
    // Hamming-1 buckets), exact re-rank per source. nBits comes from
    // the occupancy policy (x31's kForCells pattern): constant
    // expected bucket population as the corpus grows keeps candidate
    // volume linear — at the fixture's 500 vectors it resolves to the
    // 8-bit floor (~2 vectors/bucket). Recall vs brute force measured
    // in SimilaritySpec.
    GraftQuery(
      "x34_knn_graph",
      (s, dir) => {
        val e = Tables(s, dir, "embeddings")
        val bits = Similarity.nBitsForCorpus(embeddingsCount(s, dir))
        if (OracleDump.enabled) {
          // staged for the same three-consumer reason as x15
          val kept = graft.ops.Staged(Similarity.lshNearDupBuckets(
            e, "vec_id", "embedding", nBits = bits))
          OracleDump.dump(kept.select(col("id"), col("bucket")), dir, "x34_buckets")
          Similarity.lshKnnGraphFrom(kept, k = 5, nBits = bits)
        } else Similarity.lshKnnGraph(e, "vec_id", "embedding", k = 5, nBits = bits)
      },
      // candidate predicate over the dumped signatures is the DIRECTED
      // Hamming<=1 relation (both orientations, no self), then the
      // exact cosine re-rank and per-source rank window — rank on the
      // rounded cosine with a neighbor-id tie-break, a total order
      Some("""WITH kb AS (SELECT id, bucket
          FROM read_parquet('__SCRATCH__/x34_buckets/*.parquet')),
        e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        cand AS (SELECT a.id AS src_id, b.id AS nbr_id,
            round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
          FROM kb a
          JOIN kb b ON a.id <> b.id AND bit_count(xor(a.bucket, b.bucket)) <= 1
          JOIN e ea ON a.id = ea.vec_id
          JOIN e eb ON b.id = eb.vec_id)
        SELECT src_id, nbr_id, cos_sim, rk FROM (
          SELECT src_id, nbr_id, cos_sim,
            row_number() OVER (PARTITION BY src_id
              ORDER BY cos_sim DESC, nbr_id) AS rk
          FROM cand) WHERE rk <= 5"""),
      notes = "oracle replays directed Hamming<=1 candidates + per-source rank over dumped signatures"),

    // ---- capstone: the full training-corpus cleaning pipeline —
    // quality filter → exact dedup (min id per text) → near-dup removal
    // (drop every doc with a smaller-id near-dup at jaccard ≥ 0.8).
    // End-to-end oracle: the LSH candidate stage has recall ≈ 1-5e-8
    // above the threshold, so the survivor set equals the exact
    // pairwise formulation.
    GraftQuery(
      "x16_corpus_clean",
      (s, dir) => {
        import s.implicits._
        val quality = Tables(s, dir, "documents")
          .withColumn("quality", TextAnalysis.qualityScore($"text"))
          .where($"quality" >= 0.5)
        // staged: feeds the LSH pass and the final anti-join — without
        // it the quality-score scan and text groupBy run twice
        val exactDeduped = graft.ops.Staged(quality.groupBy($"text")
          .agg(min($"doc_id").as("doc_id")))
        val nearDupPairs = Dedup.minHashLsh(
          exactDeduped, "doc_id", "text", threshold = 0.8)
        exactDeduped
          .join(nearDupPairs.select($"id_b".as("doc_id")), Seq("doc_id"), "left_anti")
          .select($"doc_id")
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        q AS (SELECT doc_id, text,
          (CASE WHEN len(t) >= 10 AND len(t) <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
          + (CASE WHEN len(t) > 0 THEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) ELSE 0.0 END) * 0.25
          + least((CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t,
              x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                         'for','on','with','as','at','by','from','that','this'))) AS DOUBLE)
              / len(t) ELSE 0.0 END) * 5.0, 1.0) * 0.25
          + (CASE WHEN length(text) > 0 THEN
              1.0 - least(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                          / length(text) * 5.0, 1.0) ELSE 0.0 END) * 0.25
          AS quality FROM toks),
        ed AS (SELECT text, min(doc_id) AS doc_id FROM q
               WHERE quality >= 0.5 GROUP BY text),
        edt AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM ed),
        sh AS (SELECT doc_id, list_distinct(
            [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s FROM edt),
        nz AS (SELECT * FROM sh WHERE len(s) > 0),
        dupped AS (SELECT b.doc_id FROM nz a JOIN nz b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8)
        SELECT doc_id FROM ed
        WHERE doc_id NOT IN (SELECT doc_id FROM dupped)""")),

    // ---- multimodal: binary payload + portable metadata extraction.
    GraftQuery(
      "x13_media_metadata",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("media"))
          .select($"doc_id",
            length($"media").as("n_bytes"),
            sha2($"media", 256).as("content_sha"))
      },
      Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        sha256(text) AS content_sha FROM documents""")),

    // ---- multimodal decode plumbing (stubbed codec, real partition-wise
    // Dataset pipeline). Oracle-paired t05-style: only the byte-hash at
    // the stub's core is engine-specific — it is dumped as data, and the
    // oracle re-derives EVERYTHING else and hash-compares it: n_bytes
    // against the true blob length from the raw table, and every fake
    // meta field (format/width/height/frames/duration) by replaying the
    // stub's integer derivation from the dumped hash. The decode
    // pipeline, row coverage, and meta math are verified; only
    // Arrays.hashCode itself is trusted as data — exactly the seam a
    // real codec would occupy.
    GraftQuery(
      "x14_media_decode",
      (s, dir) => {
        import s.implicits._
        // flatten the typed metadata struct to scalar columns: the
        // harness compare can't hash struct cells, and downstream
        // relational filters want flat columns anyway
        val decoded = Multimodal.decode(s,
          Tables(s, dir, "documents").select($"doc_id", $"text".cast("binary").as("media")),
          "doc_id", "media").toDF()
          .select($"id", $"nBytes".as("n_bytes"),
            $"contentHash".as("content_hash"),
            $"meta.format".as("format"), $"meta.width".as("width"),
            $"meta.height".as("height"), $"meta.nFrames".as("n_frames"),
            $"meta.durationMs".as("duration_ms"))
        if (OracleDump.enabled) OracleDump.dump(decoded, dir, "x14_decoded")
        decoded
      },
      Some("""WITH d AS (SELECT id, content_hash
            FROM read_parquet('__SCRATCH__/x14_decoded/*.parquet')),
          docs AS (SELECT doc_id,
              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS true_bytes
            FROM documents),
          -- row set driven by the RAW table, not the dump: if the decode
          -- stage ever silently DROPS rows, the dump shrinks with the
          -- Spark output but this side keeps one row per document (with
          -- NULL hash-derived columns) and the row-count/hash compare
          -- fails — coverage is verified, not assumed
          f AS (SELECT docs.doc_id AS id, docs.true_bytes, d.content_hash,
              (d.content_hash & 2147483647) AS pos
            FROM docs LEFT JOIN d ON docs.doc_id = d.id)
        SELECT f.id, f.true_bytes AS n_bytes, f.content_hash,
          ['png','jpeg','wav','mp4'][CAST(pos % 4 AS INT) + 1] AS format,
          CAST(16 + pos % 4096 AS INT) AS width,
          CAST(16 + (pos // 7) % 4096 AS INT) AS height,
          CAST(1 + (pos // 11) % 300 AS INT) AS n_frames,
          CAST((pos // 13) % 600000 AS BIGINT) AS duration_ms
        FROM f"""),
      notes = "decode plumbing + meta derivation hash-verified; only the stub's byte-hash rides as dumped data (the real-codec seam)"),

    // ---- multimodal frame sampling + per-frame feature extraction:
    // the generator plumbing a video pipeline runs (one row per sampled
    // frame, no shuffle, frames never leave their task) with the
    // byte-slice stub standing in for key-frame seeks and the mean
    // unsigned-byte value standing in for a per-frame feature. Fully
    // closed-form oracle — frame boundaries are integer arithmetic,
    // the slice is a blob substring, and the feature re-derives from
    // the hex dump of the same bytes: sampling coverage, slicing,
    // hashing, and the feature math are all hash-verified with no
    // dumped side data at all.
    GraftQuery(
      "x38_frame_sample",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("media"))
        Multimodal.frameFeatures(s, media, "doc_id", "media", framesPerDoc = 4)
          .select($"id", $"frame_idx",
            length($"frame").as("n_bytes"),
            // hash the HEX of the frame, not the blob: DuckDB 1.0's
            // sha256 is VARCHAR-only and has no blob substring, so the
            // portable byte-exact content witness is the hex dump —
            // frame i's hex is exactly substring(hex(media), 2s+1, 2(e−s))
            sha2(hex($"frame"), 256).as("frame_sha"),
            round($"mean_byte", 6).as("mean_byte"))
      },
      Some("""WITH docs AS (SELECT doc_id, CAST(text AS BLOB) AS media,
            octet_length(CAST(text AS BLOB)) AS len FROM documents),
          n AS (SELECT doc_id, len, hex(media) AS h,
            LEAST(4, GREATEST(1, len)) AS k FROM docs),
          f AS (SELECT doc_id AS id, i AS frame_idx,
              CAST((i * len) // k AS INTEGER) AS s,
              CAST(((i + 1) * len) // k AS INTEGER) AS e, h
            FROM n, unnest(generate_series(0, k - 1)) AS t(i))
        SELECT id, CAST(frame_idx AS INTEGER) AS frame_idx,
          CAST(e - s AS INTEGER) AS n_bytes,
          sha256(substring(h, 2*s + 1, 2*(e - s))) AS frame_sha,
          round(CASE WHEN e > s THEN list_aggregate(list_transform(
              range(s, e), j ->
                (strpos('0123456789ABCDEF', substring(h, 2*j + 1, 1)) - 1) * 16
                + (strpos('0123456789ABCDEF', substring(h, 2*j + 2, 1)) - 1)),
            'avg') END, 6) AS mean_byte
        FROM f"""),
      notes = "frame boundaries, slice content (via hex), and the byte-mean feature all re-derived in SQL — no dumped side data"),

    // ---- multimodal resize (nearest-neighbor byte resample): the
    // index rule a real NN image resize applies per axis —
    // out(i) = in(⌊i·len/n⌋) — over the payload as a 1-D byte signal.
    // Fully closed-form oracle like x38: the selected bytes re-derive
    // from the hex dump by the same integer arithmetic, and the
    // resized content is witnessed by hashing the reassembled hex.
    GraftQuery(
      "x39_media_resize",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("media"))
        Multimodal.resizeStub(s, media, "doc_id", "media", targetBytes = 64)
          .select($"id", $"n_in", $"n_out",
            sha2(hex($"resized"), 256).as("resized_sha"))
      },
      Some("""WITH docs AS (SELECT doc_id AS id,
            octet_length(CAST(text AS BLOB)) AS len,
            hex(CAST(text AS BLOB)) AS h FROM documents)
        SELECT id, CAST(len AS INTEGER) AS n_in,
          CAST(CASE WHEN len = 0 THEN 0 ELSE 64 END AS INTEGER) AS n_out,
          sha256(CASE WHEN len = 0 THEN '' ELSE array_to_string(
            list_transform(range(0, 64), i ->
              substring(h, 2 * CAST((i * len) // 64 AS INTEGER) + 1, 2)),
            '') END) AS resized_sha
        FROM docs"""),
      notes = "NN-resample index rule + resized content re-derived from hex in SQL — no dumped side data"),

    // ---- embedding component statistics: array element access + exact
    // decimal aggregation over float-derived doubles (the embeddings are
    // unit-normalized, so norms are degenerate — components are not).
    // One narrow projection + tiny grouped agg; never shuffles vectors.
    GraftQuery(
      "x17_embedding_component_stats",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "embeddings")
          .select($"label",
            round(element_at($"embedding", 1).cast("double"), 6).as("c0"),
            round(element_at($"embedding", 33).cast("double"), 6).as("c32"))
          .groupBy($"label")
          .agg(count(lit(1)).as("n"),
            (sum($"c0".cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1))).as("avg_c0"),
            min($"c0").as("min_c0"), max($"c0").as("max_c0"),
            (sum($"c32".cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1))).as("avg_c32"))
      },
      Some("""WITH e AS (SELECT label,
          round(CAST(embedding[1] AS DOUBLE), 6) AS c0,
          round(CAST(embedding[33] AS DOUBLE), 6) AS c32 FROM embeddings)
        SELECT label, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(c0 AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_c0,
          min(c0) AS min_c0, max(c0) AS max_c0,
          CAST(sum(CAST(c32 AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_c32
        FROM e GROUP BY label""")
    ),

    // ---- deterministic hash-gated sampling (ops/Sampling): the
    // reproducible-training-subset primitive. The gate is md5-based and
    // engine-portable, so the oracle computes the identical sample —
    // per-language totals, ~10% sample counts, and the stable sampled-id
    // checksum all hash-match.
    GraftQuery(
      "x18_hash_sample",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Sampling.hashSample(docs, "doc_id", 0.1)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_sampled"),
            sum($"doc_id").as("id_sum"))
          .join(docs.groupBy($"lang").agg(count(lit(1)).as("n_total")), Seq("lang"))
          .select($"lang", $"n_total", $"n_sampled", $"id_sum")
      },
      Some("""WITH sampled AS (SELECT lang,
            CAST(count(*) AS BIGINT) AS n_sampled,
            CAST(sum(doc_id) AS BIGINT) AS id_sum
          FROM documents
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                < 6554
          GROUP BY lang),
          tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total
                  FROM documents GROUP BY lang)
        SELECT lang, n_total, n_sampled, id_sum
        FROM sampled JOIN tot USING (lang)""")
    ),

    // ---- sequence packing (ops/Packing): offset-stride token-budget
    // packs per language shard — parallel across shards, sequential
    // only within one (see SCALE.md); the greedy-fill variant is the
    // typed-API escape hatch, spec-covered. Deterministic assignment →
    // exact oracle.
    GraftQuery(
      "x19_sequence_packing",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
          .select($"doc_id", $"lang", $"text")
        val packed = graft.ops.Packing.packBy(docs, "lang", "doc_id",
          size(TextAnalysis.tokens($"text")).cast("long"), budget = 2048)
        graft.ops.Packing.packStats(packed, "lang", 2048)
      },
      Some("""WITH toks AS (SELECT doc_id, lang,
            CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
              AS n_tok FROM documents),
          packed AS (SELECT lang, n_tok,
            CAST(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
              / 2048) AS BIGINT) AS pack_id
            FROM toks)
        SELECT lang, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          round(CAST(sum(n_tok) AS DOUBLE) / 2048, 6) AS utilization
        FROM packed GROUP BY lang, pack_id""")
    ),

    // ---- near-dup clustering: MinHash-LSH pairs → connected
    // components → one representative per transitive cluster. The
    // oracle recomputes the same exact-Jaccard pair set (as x03) and
    // closes it with a recursive CTE.
    GraftQuery(
      "x20_dedup_clusters",
      (s, dir) => {
        val pairs = Dedup.minHashLsh(
          Tables(s, dir, "documents"), "doc_id", "text", threshold = 0.8)
        Dedup.connectedComponents(pairs)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s FROM toks),
          nz AS (SELECT * FROM sh WHERE len(s) > 0),
          pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM nz a JOIN nz b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION ALL SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (
            WITH RECURSIVE r(id, lab) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.v, r.lab FROM r JOIN edges e ON e.u = r.id
            ) SELECT * FROM r)
        SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY id""")
    ),

    // ---- leakage-safe train/test split: the md5 gate is applied to
    // each doc's near-dup cluster REPRESENTATIVE (own id for
    // singletons), so a whole near-dup family lands on one side — the
    // standard guard against eval leakage. Composes the verified
    // LSH+CC path with the x18 gate; oracle = x20's recursive-CTE
    // clusters + the identical gate arithmetic.
    GraftQuery(
      "x37_leakage_safe_split",
      (s, dir) => graft.ops.Sampling.leakageSafeSplit(
        Tables(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, testRate = 0.1),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s FROM toks),
          nz AS (SELECT * FROM sh WHERE len(s) > 0),
          pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM nz a JOIN nz b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION ALL SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (
            WITH RECURSIVE r(id, lab) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.v, r.lab FROM r JOIN edges e ON e.u = r.id
            ) SELECT * FROM r),
          cl AS (SELECT id AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_rep
                 FROM reach GROUP BY id)
        SELECT d.doc_id, COALESCE(cl.cluster_rep, d.doc_id) AS rep,
          CASE WHEN CAST(('0x' || substr(md5(CAST(
                 COALESCE(cl.cluster_rep, d.doc_id) AS VARCHAR)), 1, 4)) AS INT)
               < 6554
            THEN 'test' ELSE 'train' END AS split
        FROM documents d LEFT JOIN cl USING (doc_id)"""),
      notes = "cluster-rep-gated split: near-dup families move together; oracle replays CC + gate"),

    // ---- benchmark decontamination: training docs sharing any token
    // 5-gram with the benchmark subset (doc_id % 11 == 0 stands in for
    // an eval suite). The op joins on 64-bit n-gram hashes against a
    // broadcast benchmark set; the oracle recomputes with string
    // n-grams — identical counts modulo 64-bit collisions (~1e-9).
    GraftQuery(
      "x21_decontaminate",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Decontam.overlaps(
          docs.filter($"doc_id" % 11 =!= 0),
          docs.filter($"doc_id" % 11 === 0),
          "doc_id", "text", n = 5)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' ||
                 t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                 FOR i IN range(1, greatest(len(t) - 3, 1))]) AS s FROM toks),
          bn AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 11 = 0),
          dn AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 11 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM dn JOIN bn USING (g) GROUP BY doc_id""")
    ),

    // ---- graded contamination score: x21's binary any-overlap gate
    // generalized to the fraction of each doc's distinct 5-grams found
    // in the benchmark — the tunable-threshold form used when common-
    // phrase collisions make any-overlap removal too aggressive. One
    // corpus scan; numerator and denominator ride the same broadcast
    // LEFT join + map-side-combining agg.
    GraftQuery(
      "x35_contamination_score",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Decontam.contaminationScore(
          docs.filter($"doc_id" % 11 =!= 0),
          docs.filter($"doc_id" % 11 === 0),
          "doc_id", "text", n = 5)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' ||
                 t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                 FOR i IN range(1, greatest(len(t) - 3, 1))]) AS s FROM toks),
          bn AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 11 = 0),
          dn AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 11 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
          CAST(count(bn.g) AS BIGINT) AS n_overlap,
          round(CAST(count(bn.g) AS DOUBLE) / count(*), 6) AS contamination
        FROM dn LEFT JOIN bn ON dn.g = bn.g GROUP BY doc_id"""),
      notes = "graded decontam: per-doc fraction of distinct n-grams present in the benchmark"),

    // ---- deterministic balanced shard export layout: every doc's
    // (shard, in-shard position) under content-stable md5 assignment —
    // the reproducible-training-export contract (re-runs give
    // bit-identical shards regardless of partitioning). Assignment is
    // row-local; the position window partitions by OUTPUT shard, the
    // irreducible unit of a sorted shard file.
    GraftQuery(
      "x36_shard_layout",
      (s, dir) => graft.ops.Sharding.assign(
        Tables(s, dir, "documents").select(col("doc_id")),
        "doc_id", nShards = 8),
      Some("""SELECT doc_id, shard,
          CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id)
               AS INTEGER) AS pos
        FROM (SELECT doc_id,
            CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 8 AS shard
          FROM documents)"""),
      notes = "md5 shard assignment + in-shard order, replayed verbatim by the oracle"),

    // ---- intra-document repetition score (Gopher-style repetition
    // filter): fraction of a doc's token trigrams that are repeats.
    // One narrow projection, no shuffle; the distinct count rides the
    // same native shingle expression the dedup family uses.
    GraftQuery(
      "x22_repetition",
      (s, dir) => {
        import s.implicits._
        val t = TextAnalysis.tokens($"text")
        val total = greatest(size(t) - 2, lit(0))
        val dist = size(Dedup.shingleHashSet($"text", 3))
        Tables(s, dir, "documents").select(
          $"doc_id",
          total.as("n_ngrams"),
          dist.as("n_distinct"),
          round(when(total > 0,
            lit(1.0) - dist.cast("double") / total.cast("double"))
            .otherwise(0.0), 6).as("repetition"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, greatest(len(t) - 2, 0) AS n_ngrams,
            len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              FOR i IN range(1, greatest(len(t) - 1, 1))])) AS n_distinct
            FROM toks)
        SELECT doc_id, CAST(n_ngrams AS INT) AS n_ngrams,
          CAST(n_distinct AS INT) AS n_distinct,
          round(CASE WHEN n_ngrams > 0
            THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_ngrams
            ELSE 0.0 END, 6) AS repetition
        FROM sh""")
    ),

    // ---- stratified domain resampling: per-language keep rates over
    // the deterministic md5 gate (the domain re-weighting primitive;
    // ops/Sampling.mixRates derives rates from a target mix —
    // spec-covered — while this query pins explicit rates so the
    // oracle can mirror the exact gate thresholds).
    GraftQuery(
      "x23_stratified_resample",
      (s, dir) => {
        import s.implicits._
        graft.ops.Sampling.stratifiedHashSample(
          Tables(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.3, "zh" -> 0.8, "fr" -> 1.0))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("id_sum"))
      }, {
        def gate(rate: Double): String =
          "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) < " +
            graft.ops.Sampling.gateThreshold(rate)
        Some(s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
            CAST(sum(doc_id) AS BIGINT) AS id_sum
          FROM documents
          WHERE (lang = 'en' AND ${gate(0.3)})
             OR (lang = 'zh' AND ${gate(0.8)})
             OR (lang = 'fr' AND ${gate(1.0)})
          GROUP BY lang""")
      }
    ),

    // ---- incremental near-dup: the daily-ingest shape — dedup a new
    // batch (odd doc_ids) against a PERSISTED LSH band index of the
    // existing corpus (even doc_ids) without recomputing corpus
    // signatures. Oracle = exact pairwise jaccard restricted to pairs
    // involving at least one new doc; the Spark side must reproduce it
    // from one band-table equi-join + verify.
    GraftQuery(
      "x25_incremental_neardup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val path = s"${sys.props("java.io.tmpdir")}/graft-lsh-${OracleDump.sfTag(dir)}"
        // versioned marker: an index written by an older format (e.g.
        // before the bucketed-table layout) must rebuild, not half-load;
        // the corpus fingerprint additionally invalidates it when the
        // fixture itself is regenerated (stale-index hazard)
        val marker = new java.io.File(
          s"$path/_INDEX_OK_v3_${OracleDump.tableFingerprint(dir, "documents")}")
        if (!marker.exists()) {
          Dedup.writeLshIndex(docs.filter($"doc_id" % 2 === 0),
            "doc_id", "text", path, threshold = 0.8)
          marker.createNewFile(): Unit
        }
        Dedup.incrementalNearDup(docs.filter($"doc_id" % 2 === 1),
          path, "doc_id", "text", threshold = 0.8)
      },
      Some(s"""$shingleCte
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM nz a JOIN nz b ON a.doc_id < b.doc_id
        WHERE (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
          AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8""")),

    // ---- mergeable Misra-Gries heavy hitters over document tokens.
    // The estimates vary with merge order, but the GUARANTEES don't:
    // every count under-estimates truth by at most N/(k+1), and every
    // token with true frequency > N/(k+1) is present in the summary.
    // t05's pattern: the sketch output is dumped as data, and both
    // engines verify the contracts in pure integer arithmetic
    // ((true−est)·(k+1) ≤ N etc.) over exact token counts — the
    // tokenization regex is already cross-engine-proven (x09/x28/x30).
    GraftQuery(
      "x26_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val k = HeavyHitterK
        // Fully lazy: building this query runs no Spark jobs, so bench
        // times the work itself, and the staged sketch + staged exact
        // counts each execute ONCE (Verify's dump populates the cache;
        // the coverage anti-join and the final join reuse it) — not
        // once per consumer as the old eager form did.
        val sk = graft.ops.Staged(
          graft.ops.HeavyHitters.frequentTokens(docs, "text", k))
        if (OracleDump.enabled) OracleDump.dump(sk, dir, "x26_sketch")
        val ex = graft.ops.Staged(docs
          .select(explode(graft.ops.TextAnalysis.tokens($"text")).as("token"))
          .groupBy($"token").agg(count(lit(1)).as("true_count")))
        val total = ex.agg(sum($"true_count").as("__n"))
        // coverage guarantee: no heavy token (freq > N/(k+1)) missing
        val missing = ex.crossJoin(broadcast(total))
          .where($"true_count" * (k + 1) > $"__n")
          .join(sk, Seq("token"), "left_anti")
          .agg(count(lit(1)).as("__missing"))
        sk.join(ex, Seq("token"))
          .crossJoin(broadcast(total))
          .crossJoin(broadcast(missing))
          .select($"token", $"est_count",
            ($"est_count" <= $"true_count" &&
              ($"true_count" - $"est_count") * (k + 1) <= $"__n")
              .as("bound_ok"),
            ($"__missing" === 0L).as("all_heavy_present"))
      },
      Some(s"""WITH sk AS (SELECT token, est_count
            FROM read_parquet('__SCRATCH__/x26_sketch/*.parquet')),
          ex AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
            FROM documents),
          tc AS (SELECT token, CAST(count(*) AS BIGINT) AS true_count
            FROM ex GROUP BY token),
          n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM ex),
          hm AS (SELECT count(*) AS missing FROM tc CROSS JOIN n
            WHERE tc.true_count * ${HeavyHitterK + 1} > n.total
              AND tc.token NOT IN (SELECT token FROM sk))
        SELECT sk.token, sk.est_count,
          (sk.est_count <= tc.true_count
            AND (tc.true_count - sk.est_count) * ${HeavyHitterK + 1} <= n.total) AS bound_ok,
          (hm.missing = 0) AS all_heavy_present
        FROM sk JOIN tc USING (token) CROSS JOIN n CROSS JOIN hm"""),
      notes = "sketch dumped as data; both engines verify the Misra-Gries bound + coverage contracts in integer arithmetic"),

    // ---- PII scrubbing report: RE2-compatible patterns run
    // identically in Spark and DuckDB; redaction correctness is pinned
    // by the redacted length (the full redacted text also hash-matches
    // but lengths keep the oracle readable). Fixture docs are synthetic
    // prose, so most counts are 0 — planted-PII behavior is ScrubSpec's
    // job; this query gates the cross-engine regex semantics.
    GraftQuery(
      "x24_pii_scrub",
      (s, dir) => {
        import s.implicits._
        graft.ops.Scrub.scrub(Tables(s, dir, "documents"), "doc_id", "text")
          .select($"doc_id", $"n_emails", $"n_urls", $"n_long_nums",
            length($"redacted").as("len_redacted"))
      },
      Some(s"""SELECT doc_id,
          CAST(len(regexp_extract_all(text, '${Scrub.emailRe}')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(text, '${Scrub.urlRe}')) AS INT) AS n_urls,
          CAST(len(regexp_extract_all(text, '${Scrub.longNumRe}')) AS INT) AS n_long_nums,
          length(regexp_replace(regexp_replace(regexp_replace(text,
            '${Scrub.urlRe}', '[URL]', 'g'),
            '${Scrub.emailRe}', '[EMAIL]', 'g'),
            '${Scrub.longNumRe}', '[NUM]', 'g')) AS len_redacted
        FROM documents""")),

    // ---- BM25 relevance scoring against a fixed query — topic/domain
    // mining over the corpus. Two scan passes, zero shuffles: the
    // collection stats (N, Σ|d|, per-term df) are one map-side agg to
    // the driver, then the per-term contributions literal-fold into a
    // single fused projection (see ops/Retrieval.scala). Both engines
    // sum the term contributions in the same fixed order.
    GraftQuery(
      "x27_bm25_score",
      (s, dir) => graft.ops.Bm25.score(
        Tables(s, dir, "documents"), "doc_id", "text",
        terms = Seq("spark", "join", "data")),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        st AS (SELECT count(*) AS n,
            CAST(sum(len(t)) AS BIGINT) AS sumdl,
            CAST(sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
            CAST(sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
            CAST(sum(CASE WHEN list_contains(t, 'data') THEN 1 ELSE 0 END) AS BIGINT) AS df2
          FROM toks),
        tf AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
            CAST(len(t) - len(list_filter(t, x -> x <> 'spark')) AS DOUBLE) AS tf0,
            CAST(len(t) - len(list_filter(t, x -> x <> 'join')) AS DOUBLE) AS tf1,
            CAST(len(t) - len(list_filter(t, x -> x <> 'data')) AS DOUBLE) AS tf2
          FROM toks)
        SELECT doc_id, round(
            ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * 2.2
              / (tf0 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * 2.2
              / (tf1 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * 2.2
              / (tf2 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n))), 6)
          AS bm25
        FROM tf, st
        WHERE round(
            ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * 2.2
              / (tf0 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * 2.2
              / (tf1 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * 2.2
              / (tf2 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n))), 6) > 0"""),
      notes = "fixed term-order summation keeps the double sum deterministic"),

    // ---- sliding-window chunking: size-50/stride-30 token windows,
    // all-integer boundary arithmetic (no float chunk edges).
    GraftQuery(
      "x28_chunk_sliding",
      (s, dir) => graft.ops.Chunking.slidingChunks(
        Tables(s, dir, "documents"), "doc_id", "text", size = 50, stride = 30),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (SELECT doc_id, t, n,
            unnest(range(0, 1 + (greatest(n - 50, 0) + 29) // 30)) AS ci
          FROM nz)
        SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
          array_to_string(t[ci * 30 + 1 : ci * 30 + 50], ' ') AS chunk_text,
          CAST(least(50, n - ci * 30) AS INT) AS n_tokens
        FROM c"""),
      notes = "integer chunk-boundary math mirrors exactly across engines"),

    // ---- symmetric int8 embedding quantization (the ANN memory cut):
    // per-vector scale 127/max|x|, flattened to (vec, dim) rows so the
    // result hashes portably.
    GraftQuery(
      "x29_quantize_int8",
      (s, dir) => graft.ops.Quantize.int8(
        Tables(s, dir, "embeddings"), "vec_id", "embedding"),
      Some("""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        m AS (SELECT vec_id, v,
            list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        nz AS (SELECT * FROM m WHERE maxabs > 0),
        f AS (SELECT vec_id, maxabs,
            CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
            unnest(v) AS x
          FROM nz)
        SELECT vec_id, dim,
          CAST(greatest(-127.0, least(127.0, round(x * (127.0 / maxabs), 0))) AS INT) AS q,
          round(abs(CAST(CAST(greatest(-127.0, least(127.0,
              round(x * (127.0 / maxabs), 0))) AS INT) AS DOUBLE)
            / (127.0 / maxabs) - x), 6) AS err
        FROM f"""),
      notes = "round-half-away matches Spark's HALF_UP on doubles"),

    // ---- unigram LM scoring (the KenLM-perplexity quality-filter
    // stand-in): per-doc average log-prob under the corpus's own
    // unigram distribution. Per-token log-probs round onto a 1e-9 grid
    // and sum exactly in decimal, so the result is partition-order
    // independent on both engines.
    GraftQuery(
      "x30_unigram_logprob",
      (s, dir) => graft.ops.LangModel.unigramLogProb(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
        ex AS (SELECT doc_id, unnest(t) AS tok FROM nz),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM ex),
        vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
          FROM ex GROUP BY tok)
        SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          round(CAST(sum(CAST(round(ln(CAST(v.n_tok AS DOUBLE) / total), 9)
              AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS avg_logp
        FROM ex e JOIN vocab v ON e.tok = v.tok CROSS JOIN tot
        GROUP BY e.doc_id"""),
      notes = "decimal-grid log-prob sum keeps the average order-independent"),

    // ---- SemDeDup-style semantic dedup: partition the corpus into
    // KMeans cells (the SAME persisted IVF index a04 probes — built
    // once; k sized to the corpus by Ivf.kForCells so the expected
    // cell population is CONSTANT as the corpus grows — at every test
    // SF the policy lands on the shared k=16 index), find exact-cosine
    // near-dup pairs WITHIN surviving cells (cells over the hot-cell
    // cap are excluded with visible accounting — SemanticDedup
    // .droppedCells), connect components, and report every vector that
    // loses to a smaller-id representative. Cross-cell near-dups are
    // out of scope by design (SemDeDup's own approximation — the cell
    // partition IS the candidate blocking). Oracle: the GOVERNED cell
    // assignment is dumped as data; DuckDB replays the within-cell
    // pairwise cosine, the transitive closure (recursive CTE), and the
    // min-id rep.
    GraftQuery(
      "x31_semantic_dedup",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val k = Ivf.kForCells(embeddingsCount(s, dir))
        val idx = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, k),
          "vec_id", "embedding", k = k)
        val kept = graft.ops.SemanticDedup.keptCells(idx.assigned)
        if (OracleDump.enabled)
          OracleDump.dump(kept.select($"vec_id", $"cluster"),
            dir, "x31_assigned")
        graft.ops.SemanticDedup.dropListFromKept(
          kept, "vec_id", "embedding", threshold = 0.3)
      },
      Some("""WITH a AS (SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
            FROM read_parquet('__SCRATCH__/x31_assigned/*.parquet')),
          e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          pairs AS (SELECT a1.vec_id AS id_a, a2.vec_id AS id_b
            FROM a a1 JOIN a a2
              ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
            JOIN e e1 ON a1.vec_id = e1.vec_id
            JOIN e e2 ON a2.vec_id = e2.vec_id
            WHERE round(list_cosine_similarity(e1.v, e2.v), 6) > 0.3),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION ALL SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (
            WITH RECURSIVE r(id, lab) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.v, r.lab FROM r JOIN edges e ON e.u = r.id
            ) SELECT * FROM r),
          comp AS (SELECT id, CAST(min(lab) AS BIGINT) AS rep
            FROM reach GROUP BY id)
        SELECT id AS vec_id, rep AS dup_of FROM comp WHERE id <> rep"""),
      notes = "oracle replays within-cell cosine + transitive closure over the dumped assignment"),

    // ---- passage-level exact dedup: remove repeated sub-document
    // passages corpus-wide, keeping first occurrences (whole-doc dedup
    // can't touch boilerplate inside otherwise-distinct docs). Window
    // of 3 tokens: real pipelines run 50-100-token passages, but the
    // synthetic 40-word-vocabulary fixture only produces cross-doc
    // duplicate windows at small n (~1.8k dup occurrences at w=3, zero
    // at w=50) — the MATH is window-size-independent and the boundary
    // arithmetic is x28's, already pinned cross-engine.
    GraftQuery(
      "x32_passage_dedup",
      (s, dir) => graft.ops.Dedup.passageDedup(
        Tables(s, dir, "documents"), "doc_id", "text", window = 3),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (SELECT doc_id, t, n,
            unnest(range(0, 1 + (greatest(n - 3, 0) + 2) // 3)) AS ci
          FROM nz),
        p AS (SELECT doc_id, CAST(ci AS INT) AS ci,
            array_to_string(t[ci * 3 + 1 : ci * 3 + 3], ' ') AS pass
          FROM c),
        perdoc AS (SELECT pass, doc_id, min(ci) AS midx
          FROM p GROUP BY pass, doc_id),
        wins AS (SELECT pass, min(doc_id) AS wdoc FROM perdoc GROUP BY pass),
        winner AS (SELECT pd.pass, pd.doc_id, pd.midx
          FROM perdoc pd JOIN wins w ON pd.pass = w.pass AND pd.doc_id = w.wdoc),
        kept AS (SELECT p.doc_id, p.ci, p.pass
          FROM p JOIN winner x
            ON p.pass = x.pass AND p.doc_id = x.doc_id AND p.ci = x.midx),
        tot AS (SELECT doc_id, count(*) AS nall FROM p GROUP BY doc_id),
        ka AS (SELECT doc_id,
            string_agg(pass, ' ' ORDER BY ci) AS clean_text,
            count(*) AS nkept
          FROM kept GROUP BY doc_id)
        SELECT ka.doc_id, ka.clean_text, CAST(ka.nkept AS INT) AS n_kept,
          CAST(tot.nall - ka.nkept AS INT) AS n_dropped
        FROM ka JOIN tot ON ka.doc_id = tot.doc_id"""),
      notes = "first-occurrence winners via two partial aggs + equi-joins; no content-partitioned window"),

    // ---- incremental passage dedup against a persisted passage index
    // (the continuous-ingest form of x32, mirroring x25's incremental
    // LSH shape): the corpus (doc_id < 250) is chunked ONCE at index
    // time; each new batch pays one anti-join on the passage key plus
    // its own within-batch winner election. Corpus ids all precede
    // batch ids, so the result equals full passageDedup restricted to
    // the batch (differential spec).
    GraftQuery(
      "x33_incremental_passage_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val path = s"${sys.props("java.io.tmpdir")}/graft-passidx-${OracleDump.sfTag(dir)}"
        // marker carries the CORPUS fingerprint, not just the index
        // format version: a regenerated fixture rebuilds the index
        // instead of silently serving stale passages
        val marker = new java.io.File(
          s"$path/_INDEX_OK_v2_${OracleDump.tableFingerprint(dir, "documents")}")
        if (!marker.exists()) {
          graft.ops.Dedup.writePassageIndex(docs.filter($"doc_id" < 250),
            "doc_id", "text", window = 3, path)
          marker.createNewFile(): Unit
        }
        graft.ops.Dedup.incrementalPassageDedup(docs.filter($"doc_id" >= 250),
          path, "doc_id", "text", window = 3)
      },
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (SELECT doc_id, t, n,
            unnest(range(0, 1 + (greatest(n - 3, 0) + 2) // 3)) AS ci
          FROM nz),
        p AS (SELECT doc_id, CAST(ci AS INT) AS ci,
            array_to_string(t[ci * 3 + 1 : ci * 3 + 3], ' ') AS pass
          FROM c),
        idxp AS (SELECT DISTINCT pass FROM p WHERE doc_id < 250),
        b AS (SELECT * FROM p WHERE doc_id >= 250),
        fresh AS (SELECT * FROM b
          WHERE pass NOT IN (SELECT pass FROM idxp)),
        perdoc AS (SELECT pass, doc_id, min(ci) AS midx
          FROM fresh GROUP BY pass, doc_id),
        wins AS (SELECT pass, min(doc_id) AS wdoc FROM perdoc GROUP BY pass),
        winner AS (SELECT pd.pass, pd.doc_id, pd.midx
          FROM perdoc pd JOIN wins w ON pd.pass = w.pass AND pd.doc_id = w.wdoc),
        kept AS (SELECT f.doc_id, f.ci, f.pass
          FROM fresh f JOIN winner x
            ON f.pass = x.pass AND f.doc_id = x.doc_id AND f.ci = x.midx),
        tot AS (SELECT doc_id, count(*) AS nall FROM b GROUP BY doc_id),
        ka AS (SELECT doc_id,
            string_agg(pass, ' ' ORDER BY ci) AS clean_text,
            count(*) AS nkept
          FROM kept GROUP BY doc_id)
        SELECT ka.doc_id, ka.clean_text, CAST(ka.nkept AS INT) AS n_kept,
          CAST(tot.nall - ka.nkept AS INT) AS n_dropped
        FROM ka JOIN tot ON ka.doc_id = tot.doc_id"""),
      notes = "one anti-join against the persisted passage index; corpus text never re-chunked per batch"),

    // ---- hybrid retrieval: BM25 top-100 ∪ cosine top-100 fused with
    // Reciprocal Rank Fusion (k0=60). The corpus-sized work is the two
    // candidate generators (each already verified standalone: x27, x10);
    // the fusion itself only ever sees two bounded top-N lists, so its
    // windows + full-outer join are O(N) whatever the corpus size.
    GraftQuery(
      "x40_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        val lex = graft.ops.Bm25.score(
          Tables(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "join", "data"))
          .orderBy($"bm25".desc, $"doc_id").limit(100)
        val e = Tables(s, dir, "embeddings")
        val vec = Similarity.bruteForceTopK(
          e, e.filter($"vec_id" === 0L), "vec_id", "embedding", k = 100)
          .withColumnRenamed("vec_id", "doc_id")
        graft.ops.Rrf.fuse(lex, "bm25", vec, "cos_sim", "doc_id", k = 50)
      },
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        st AS (SELECT count(*) AS n,
            CAST(sum(len(t)) AS BIGINT) AS sumdl,
            CAST(sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
            CAST(sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
            CAST(sum(CASE WHEN list_contains(t, 'data') THEN 1 ELSE 0 END) AS BIGINT) AS df2
          FROM toks),
        tfx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
            CAST(len(t) - len(list_filter(t, x -> x <> 'spark')) AS DOUBLE) AS tf0,
            CAST(len(t) - len(list_filter(t, x -> x <> 'join')) AS DOUBLE) AS tf1,
            CAST(len(t) - len(list_filter(t, x -> x <> 'data')) AS DOUBLE) AS tf2
          FROM toks),
        bm AS (SELECT doc_id, round(
            ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * 2.2
              / (tf0 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * 2.2
              / (tf1 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * 2.2
              / (tf2 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n))), 6)
            AS bm25 FROM tfx, st),
        lex AS (SELECT doc_id, bm25 FROM bm WHERE bm25 > 0
          ORDER BY bm25 DESC, doc_id LIMIT 100),
        lrank AS (SELECT doc_id,
            row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM lex),
        e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        vtop AS (SELECT vec_id AS doc_id,
            round(list_cosine_similarity(v, qv), 6) AS cos_sim
          FROM e, q ORDER BY cos_sim DESC, vec_id LIMIT 100),
        vrank AS (SELECT doc_id,
            row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS vec_rank FROM vtop)
        SELECT coalesce(l.doc_id, r.doc_id) AS doc_id,
          round(coalesce(1.0 / (60 + lex_rank), 0)
              + coalesce(1.0 / (60 + vec_rank), 0), 6) AS rrf
        FROM lrank l FULL OUTER JOIN vrank r ON l.doc_id = r.doc_id
        ORDER BY rrf DESC, doc_id LIMIT 50"""),
      notes = "ranks are total orders over rounded scores, so both engines agree rank-for-rank"),

    // ---- x21's decontamination through the Bloom-prefilter path: the
    // shape for benchmark unions too large to broadcast as a join hash
    // table. No false negatives + exact verify ⇒ bit-identical to x21,
    // which is exactly what the shared oracle pins.
    GraftQuery(
      "x41_decontam_bloom",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Decontam.overlapsBloom(
          docs.filter($"doc_id" % 11 =!= 0),
          docs.filter($"doc_id" % 11 === 0),
          "doc_id", "text", n = 5)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' ||
                 t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                 FOR i IN range(1, greatest(len(t) - 3, 1))]) AS s FROM toks),
          bn AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 11 = 0),
          dn AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 11 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM dn JOIN bn USING (g) GROUP BY doc_id"""),
      notes = "same oracle as x21: the bloom prefilter must be invisible in the result"),

    // ---- Morton z-value used by the z-order clustered layout
    // (ops/Layout.scala): the bit-interleave is closed-form in both
    // engines, so the oracle pins the exact curve the layout sorts by.
    // The layout write + measured row-group skipping are spec-tested
    // (LayoutSpec); this query verifies the arithmetic that makes the
    // skipping correct.
    GraftQuery(
      "x42_zorder_zvalue",
      (s, dir) => {
        val l = Tables(s, dir, "lineitem")
        l.select(col("l_orderkey"), col("l_linenumber"),
          Layout.zValue(col("l_partkey") % 256, col("l_suppkey") % 256,
            bits = 8).as("z"))
          .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
          .limit(200)
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
          CAST(${Layout.zValueSql("(l_partkey % 256)", "(l_suppkey % 256)")}
            AS BIGINT) AS z
        FROM lineitem ORDER BY z, l_orderkey, l_linenumber LIMIT 200"""),
      notes = "z-order curve arithmetic, bit-for-bit in both engines"),

    // ---- CCNet-style perplexity bucketing: head/middle/tail thirds of
    // the corpus by unigram-LM score (head = most probable). Boundaries
    // are exact tertiles via the banded quantile path; the oracle
    // composes x30's scoring CTE with Quantiles' bit-exact percentile
    // replay, so the bucket labels hash-match.
    GraftQuery(
      "x43_perplexity_buckets",
      (s, dir) => graft.ops.LangModel.perplexityBuckets(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
        ex AS (SELECT doc_id, unnest(t) AS tok FROM nz),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM ex),
        vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
          FROM ex GROUP BY tok),
        scored AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
            round(CAST(sum(CAST(round(ln(CAST(v.n_tok AS DOUBLE) / total), 9)
                AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS avg_logp
          FROM ex e JOIN vocab v ON e.tok = v.tok CROSS JOIN tot
          GROUP BY e.doc_id),
        th AS (SELECT * FROM (${graft.ops.Quantiles.oracleSql("scored", Nil,
          "avg_logp", Seq("t1" -> (1.0 / 3), "t2" -> (2.0 / 3)))}))
        SELECT s.doc_id, s.n_tokens, s.avg_logp,
          CASE WHEN s.avg_logp < th.t1 THEN 'tail'
               WHEN s.avg_logp < th.t2 THEN 'middle'
               ELSE 'head' END AS ppl_bucket
        FROM scored s CROSS JOIN th"""),
      notes = "tertile boundaries replayed bit-exactly; ties resolve by the fixed < rule"),

    // ---- token co-occurrence PMI over the top-100 document-frequency
    // tokens — collocation mining / tokenizer-merge candidates. The
    // top-V cutoff happens BEFORE any join, so per-doc pair fan-out is
    // ≤ V²/2 and the pair key space ≤ V² whatever the corpus size.
    GraftQuery(
      "x44_token_pmi",
      (s, dir) => graft.ops.Cooccur.pmiTopPairs(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
            list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
          FROM documents),
        nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
        ex AS (SELECT doc_id, unnest(t) AS tok FROM nz),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM nz),
        dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
          FROM ex GROUP BY tok),
        top AS (SELECT tok, df FROM dfreq ORDER BY df DESC, tok LIMIT 100),
        f AS (SELECT e.doc_id, e.tok FROM ex e JOIN top USING (tok)),
        pr AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
            CAST(count(*) AS BIGINT) AS n_ab
          FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY a.tok, b.tok)
        SELECT pr.tok_a, pr.tok_b, pr.n_ab,
          round(ln(CAST(pr.n_ab AS DOUBLE) * nn.nd
            / (CAST(ta.df AS DOUBLE) * CAST(tb.df AS DOUBLE))), 6) AS pmi
        FROM pr JOIN top ta ON pr.tok_a = ta.tok
          JOIN top tb ON pr.tok_b = tb.tok CROSS JOIN nn
        WHERE pr.n_ab >= 5
        ORDER BY pmi DESC, tok_a, tok_b LIMIT 100"""),
      notes = "PMI doubles come from exact long ratios; rank order is total"),

    // ---- perceptual-hash near-dup over the binary media column: aHash
    // (NN-resample to 64 samples, integer mean threshold) + the
    // pigeonhole Hamming block join. Pigeonhole recall is exactly 1.0
    // within the bound, so the blocked result must EQUAL the all-pairs
    // comparison — which is precisely what the oracle runs, re-deriving
    // every fingerprint bit from the payload hex.
    GraftQuery(
      "x45_media_phash_neardup",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("media"))
        Multimodal.phashNearDup(s, media, "doc_id", "media", maxHamming = 9)
      },
      Some("""WITH docs AS (SELECT doc_id AS id,
            octet_length(CAST(text AS BLOB)) AS len,
            hex(CAST(text AS BLOB)) AS h FROM documents
          WHERE octet_length(CAST(text AS BLOB)) > 0),
        sm AS (SELECT id, list_transform(range(0, 64), i ->
            CAST(('0x' || substring(h, 2 * CAST((i * len) // 64 AS INTEGER) + 1, 2))
              AS INTEGER)) AS b FROM docs),
        bv AS (SELECT id, list_transform(b,
            x -> CASE WHEN x * 64 >= list_sum(b) THEN 1 ELSE 0 END) AS v
          FROM sm),
        pairs AS (SELECT a.id AS id_a, b.id AS id_b,
            CAST(list_sum(list_transform(range(1, 65), i ->
              CASE WHEN a.v[i] <> b.v[i] THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
          FROM bv a JOIN bv b ON a.id < b.id)
        SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 9"""),
      notes = "oracle brute-forces ALL pairs; the blocked join must match it exactly"),

    // ---- decontamination against a PERSISTED benchmark index (bloom +
    // hash set built once, probed per batch with zero benchmark
    // re-hashing) — the operational shape when eval suites are fixed
    // and corpora arrive daily. Same oracle as x21/x41: the index face
    // must be invisible in the result.
    GraftQuery(
      "x46_decontam_indexed",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val path = s"${sys.props("java.io.tmpdir")}/graft-decontam-idx-" +
          s"${OracleDump.sfTag(dir)}-n5"
        if (!graft.ops.Decontam.benchIndexReady(s, path))
          graft.ops.Decontam.writeBenchIndex(
            docs.filter($"doc_id" % 11 === 0), "text", path)
        graft.ops.Decontam.overlapsIndexed(
          docs.filter($"doc_id" % 11 =!= 0), path, "doc_id", "text", n = 5)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' ||
                 t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
                 FOR i IN range(1, greatest(len(t) - 3, 1))]) AS s FROM toks),
          bn AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 11 = 0),
          dn AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 11 <> 0)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
        FROM dn JOIN bn USING (g) GROUP BY doc_id"""),
      notes = "probe of a persisted bloom+hash index; result ≡ the exact broadcast path"),

    // ---- DSIR importance resampling (Xie et al. 2023): hashed-n-gram
    // bag-of-words models of target vs raw, per-doc importance
    // log-weight, Gumbel-top-k selection ∝ exp(ilw). The model side is
    // O(buckets) whatever the corpus size; the corpus sees exactly two
    // keyed shuffles and no corpus-corpus join.
    GraftQuery(
      "x47_dsir_weights",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Dsir.importanceWeights(
          docs.filter($"doc_id" % 5 =!= 0),
          docs.filter($"doc_id" % 5 === 0), "doc_id", "text")
      },
      Some(dsirWeightsCte +
        """SELECT pd.doc_id, CAST(sum(pd.c) AS BIGINT) AS n_grams,
             round(CAST(sum(pd.c * lr.lr) AS DOUBLE), 6) AS ilw
           FROM pd JOIN lr USING (f) GROUP BY pd.doc_id"""),
      notes = "decimal-grid per-bucket log-ratios; ilw partition-order-independent"),

    GraftQuery(
      "x48_dsir_resample",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Dsir.resample(
          docs.filter($"doc_id" % 5 =!= 0),
          docs.filter($"doc_id" % 5 === 0), "doc_id", "text", k = 50)
      },
      Some(dsirWeightsCte +
        """, w AS (SELECT pd.doc_id,
             round(CAST(sum(pd.c * lr.lr) AS DOUBLE), 6) AS ilw
           FROM pd JOIN lr USING (f) GROUP BY pd.doc_id),
          sel AS (SELECT doc_id, ilw, round(ilw +
             (-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) + 0.5) / 4294967296.0))), 6) AS score FROM w)
        SELECT doc_id, ilw, score,
          CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rk
        FROM sel ORDER BY score DESC, doc_id LIMIT 50"""),
      notes = "Gumbel keys from md5(doc_id): exact-rational u, replayable sample"),

    // ---- interpolated bigram LM (KenLM-lite, one Markov order above
    // x30): P(w2|w1) = λ·c(w1w2)/c(w1) + (1−λ)·c(w2)/N. Model = two
    // map-side-combined count tables (O(V), O(observed V²)); scoring
    // joins the exploded bigram stream on model keys — never a corpus
    // self-join.
    GraftQuery(
      "x49_bigram_lm",
      (s, dir) => graft.ops.LangModel.bigramLogProb(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          uc AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
                 FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
          nt AS (SELECT CAST(sum(cw) AS DOUBLE) AS n FROM uc),
          bg AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM
                 (SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]}
                    FOR i IN range(1, len(t))]) AS b FROM toks)),
          bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb
                 FROM bg GROUP BY w1, w2),
          lp AS (SELECT bg.doc_id,
              CAST(round(ln(CAST(0.75 AS DOUBLE) * CAST(bc.cb AS DOUBLE)
                   / CAST(u1.cw AS DOUBLE)
                 + CAST(0.25 AS DOUBLE) * CAST(u2.cw AS DOUBLE) / nt.n), 9)
                AS DECIMAL(28,9)) AS l
            FROM bg JOIN bc USING (w1, w2)
            JOIN uc u1 ON bg.w1 = u1.w JOIN uc u2 ON bg.w2 = u2.w
            CROSS JOIN nt)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          round(CAST(sum(l) AS DOUBLE) / count(*), 6) AS avg_logp2
        FROM lp GROUP BY doc_id"""),
      notes = "λ=0.75 chosen so both λ and 1−λ are exact binary literals"),

    // ---- df-cut TF-IDF cosine pairs: lexical template-family mining.
    // The ABSOLUTE df cap (terms in > 10 docs leave the VECTORS) is
    // the scale contract — co-term join fan-out ≤ maxDf·instances,
    // linear in corpus size (a fraction-based cut degenerates
    // quadratically; measured in SCALE.md r11) — and cosine is exact
    // w.r.t. the pruned vectors, so the oracle reproduces it.
    GraftQuery(
      "x50_tfidf_cosine_pairs",
      (s, dir) => graft.ops.TfIdf.cosinePairs(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          bg AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                 FOR i IN range(1, len(t))]) AS g FROM toks),
          tf AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
                 FROM bg GROUP BY doc_id, g),
          nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
          dfreq AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY g),
          kept AS (SELECT g, df FROM dfreq WHERE df <= 10),
          w AS (SELECT tf.doc_id, tf.g,
                CAST(round(CAST(tf.tf AS DOUBLE) * ln(nn.n / CAST(k.df AS DOUBLE)), 9)
                  AS DECIMAL(18,9)) AS w
                FROM tf JOIN kept k USING (g) CROSS JOIN nn),
          nrm AS (SELECT doc_id, sqrt(CAST(sum(w*w) AS DOUBLE)) AS nm
                  FROM w GROUP BY doc_id),
          dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(sum(a.w * b.w) AS DOUBLE) AS dot
                   FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id
                   GROUP BY a.doc_id, b.doc_id)
        SELECT d.id_a, d.id_b, round(d.dot / (na.nm * nb.nm), 6) AS cos_sim
        FROM dots d JOIN nrm na ON d.id_a = na.doc_id
          JOIN nrm nb ON d.id_b = nb.doc_id
        ORDER BY cos_sim DESC, id_a, id_b LIMIT 100"""),
      notes = "decimal-grid weights; dots/norms summed exactly; rank is a total order"),

    // ---- deterministic mixture interleave (stride scheduling): one
    // global curriculum order holding the src1:src2:rest = 3:2:1 mix
    // at every prefix. The global seq is a CLOSED-FORM integer formula
    // over an O(domains) broadcast table — no global window, no
    // floating-point key — so both engines derive the identical
    // permutation.
    GraftQuery(
      "x51_mixture_interleave",
      (s, dir) => graft.ops.Curriculum.interleave(
        Tables(s, dir, "documents"), "doc_id", "source",
        Map("src1" -> 3, "src2" -> 2)),
      Some("""WITH pos AS (SELECT source, doc_id,
            CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS i FROM documents),
         doms AS (SELECT source AS e, CAST(count(*) AS BIGINT) AS ne,
            CAST(CASE source WHEN 'src1' THEN 3 WHEN 'src2' THEN 2
              ELSE 1 END AS BIGINT) AS we,
            CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS rke
          FROM pos GROUP BY source),
         own AS (SELECT p.source, p.doc_id, p.i, d.we AS wd, d.rke AS rkd
                 FROM pos p JOIN doms d ON p.source = d.e),
         agg AS (SELECT o.source, o.doc_id,
             sum(LEAST(d.ne, ((2*o.i - 1)*d.we + o.wd - 1) // (2*o.wd))
             + (CASE WHEN d.rke < o.rkd AND ((2*o.i-1)*d.we) % o.wd = 0
                   AND (((2*o.i-1)*d.we) // o.wd) % 2 = 1
                   AND ((((2*o.i-1)*d.we) // o.wd) + 1) // 2 <= d.ne
                THEN 1 ELSE 0 END)) AS bef
           FROM own o CROSS JOIN doms d GROUP BY o.source, o.doc_id)
        SELECT CAST(bef + 1 AS BIGINT) AS seq, source, doc_id FROM agg"""),
      notes = "seq is provably a permutation of 1..N; spec pins prefix-mix exactness"),

    // ---- per-doc duplication profile: the diagnostic face of x32 —
    // what fraction of each doc's 3-token passages is repeated content
    // (anywhere in the corpus, incl. in-doc repeats). Linear in corpus
    // passages: one multiplicity aggregation + one join back.
    GraftQuery(
      "x52_duplication_profile",
      (s, dir) => graft.ops.Dedup.duplicationProfile(
        Tables(s, dir, "documents"), "doc_id", "text", window = 3),
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (SELECT doc_id, t, n,
            unnest(range(0, 1 + (greatest(n - 3, 0) + 2) // 3)) AS ci
          FROM nz),
        p AS (SELECT doc_id, CAST(ci AS INT) AS ci,
            array_to_string(t[ci * 3 + 1 : ci * 3 + 3], ' ') AS pass
          FROM c),
        mult AS (SELECT pass, count(*) AS m FROM p GROUP BY pass)
        SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_passages,
          CAST(sum(CASE WHEN mult.m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          round(CAST(sum(CASE WHEN mult.m > 1 THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS dup_frac
        FROM p JOIN mult USING (pass) GROUP BY p.doc_id"""),
      notes = "same passage convention as x32/x33; dup_frac is an exact ratio"),

    // ---- Zipf-law fit: least squares of ln(freq) on ln(rank) over the
    // top-100 ranks — the one-row corpus health line (natural text sits
    // near slope −1; template spam bends it). One token count + a
    // TakeOrderedAndProject; nothing corpus-sized shuffles.
    GraftQuery(
      "x53_zipf_fit",
      (s, dir) => graft.ops.TextAnalysis.zipfFit(
        Tables(s, dir, "documents"), "text"),
      Some("""WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),
            '[a-z0-9]+')) AS w FROM documents),
         freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY w),
         top AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
                 FROM freq ORDER BY f DESC, w LIMIT 100),
         pts AS (SELECT CAST(round(ln(CAST(r AS DOUBLE)),9) AS DECIMAL(12,9)) AS x,
                        CAST(round(ln(CAST(f AS DOUBLE)),9) AS DECIMAL(12,9)) AS y
                 FROM top),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(x*y) AS DOUBLE) AS sxy,
                CAST(sum(y*y) AS DOUBLE) AS syy FROM pts)
        SELECT CAST(n AS BIGINT) AS n_ranks,
          round((n*sxy - sx*sy)/(n*sxx - sx*sx), 6) AS slope,
          round((sy - sx*((n*sxy - sx*sy)/(n*sxx - sx*sx)))/n, 6) AS intercept,
          round((n*sxy - sx*sy)*(n*sxy - sx*sy)
            /((n*sxx - sx*sx)*(n*syy - sy*sy)), 6) AS r2
        FROM s"""),
      notes = "ln values on the 1e-9 decimal grid before summation; scalar math in doubles"),

    // ---- cross-source contamination matrix: distinct 5-token passages
    // shared per source pair — mirror/syndication detection before
    // domain-level mixing treats sources as independent. Passage → its
    // ≤|sources| distinct source set (ONE aggregation, hot-passage
    // safe), pairs explode from the sorted set, key space ≤ |sources|².
    GraftQuery(
      "x54_cross_source_overlap",
      (s, dir) => graft.ops.Decontam.crossSourceOverlap(
        Tables(s, dir, "documents"), "source", "text", window = 5),
      Some("""WITH toks AS (SELECT source,
            regexp_extract_all(lower(text),'[a-z0-9]+') AS t FROM documents),
         nz AS (SELECT source, t, len(t) AS n FROM toks WHERE len(t) > 0),
         c AS (SELECT source, t, n,
               unnest(range(0, 1 + (greatest(n - 5, 0) + 4) // 5)) AS ci FROM nz),
         p AS (SELECT DISTINCT source,
               array_to_string(t[ci*5+1 : ci*5+5], ' ') AS pass FROM c),
         pairs AS (SELECT a.source AS src_a, b.source AS src_b
                   FROM p a JOIN p b ON a.pass = b.pass AND a.source < b.source)
        SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared
        FROM pairs GROUP BY src_a, src_b"""),
      notes = "oracle's pass-key self-join ≡ the set-explosion on distinct (source, pass)"),

    // ---- CCNet-style boilerplate stripping: passages in ≥2 docs AND
    // ≥5% of a source's docs are template content; every doc is rebuilt
    // from its surviving passages (all-boilerplate docs survive with
    // empty clean_text). Chunking is row-local; the anti-join's
    // boilerplate side is support-filtered (tiny).
    GraftQuery(
      "x55_boilerplate_removal",
      (s, dir) => graft.ops.Scrub.removeBoilerplate(
        Tables(s, dir, "documents"), "doc_id", "source", "text",
        window = 3, minFrac = 0.05, minDocs = 2),
      Some("""WITH toks AS (SELECT doc_id, source,
            regexp_extract_all(lower(text),'[a-z0-9]+') AS t FROM documents),
         nz AS (SELECT doc_id, source, t, len(t) AS n FROM toks WHERE len(t) > 0),
         c AS (SELECT doc_id, source, t, n,
               unnest(range(0, 1 + (greatest(n - 3, 0) + 2) // 3)) AS ci FROM nz),
         p AS (SELECT doc_id, source, CAST(ci AS INT) AS ci,
               array_to_string(t[ci*3+1 : ci*3+3], ' ') AS pass FROM c),
         ss AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS nsrc
                FROM p GROUP BY source),
         sup AS (SELECT source, pass,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
                 FROM p GROUP BY source, pass),
         b AS (SELECT sup.source, pass FROM sup JOIN ss USING (source)
               WHERE nd >= 2 AND CAST(nd AS DOUBLE) >= 0.05 * CAST(nsrc AS DOUBLE)),
         kept AS (SELECT p.* FROM p ANTI JOIN b
                  ON p.source = b.source AND p.pass = b.pass),
         ka AS (SELECT doc_id, string_agg(pass, ' ' ORDER BY ci) AS ct,
                CAST(count(*) AS INT) AS nk FROM kept GROUP BY doc_id),
         tot AS (SELECT doc_id, source, CAST(count(*) AS INT) AS nall
                 FROM p GROUP BY doc_id, source)
        SELECT tot.doc_id, tot.source,
          COALESCE(ka.ct, '') AS clean_text,
          COALESCE(ka.nk, 0) AS n_kept,
          tot.nall - COALESCE(ka.nk, 0) AS n_dropped
        FROM tot LEFT JOIN ka USING (doc_id)"""),
      notes = "same passage convention as x32; empty-clean docs are rows, not drops"),

    // ---- embedding label-separation stats (the between/within picture
    // behind a Fisher score): per label, mean squared radius and
    // squared centroid gap to the corpus mean. Everything reduces to
    // per-(label, component) moment sums — one aggregation, no
    // vector-vector joins, key space = labels × dims.
    GraftQuery(
      "x56_label_separation",
      (s, dir) => graft.ops.EmbedStats.labelSeparation(
        Tables(s, dir, "embeddings"), "label", "embedding"),
      Some("""WITH f AS (SELECT label, u.p AS pos,
              CAST(round(CAST(u.v AS DOUBLE), 7) AS DECIMAL(10,7)) AS v
            FROM (SELECT label, unnest([{'p': i, 'v': embedding[i]}
                   FOR i IN range(1, len(embedding)+1)]) AS u FROM embeddings)),
         lp AS (SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
                sum(v) AS s1, sum(v*v) AS s2 FROM f GROUP BY label, pos),
         gp AS (SELECT pos, sum(s1) AS gs1, CAST(sum(n) AS BIGINT) AS gn
                FROM lp GROUP BY pos),
         t AS (SELECT label, n,
              CAST(round(CAST(s2 AS DOUBLE)/n
                  - (CAST(s1 AS DOUBLE)/n)*(CAST(s1 AS DOUBLE)/n), 9)
                AS DECIMAL(16,9)) AS msr,
              CAST(round((CAST(s1 AS DOUBLE)/n - CAST(gs1 AS DOUBLE)/gn)
                        *(CAST(s1 AS DOUBLE)/n - CAST(gs1 AS DOUBLE)/gn), 9)
                AS DECIMAL(16,9)) AS gap
            FROM lp JOIN gp USING (pos))
        SELECT label, max(n) AS n_vecs,
          round(CAST(sum(msr) AS DOUBLE), 6) AS mean_sq_radius,
          round(CAST(sum(gap) AS DOUBLE), 6) AS centroid_gap_sq
        FROM t GROUP BY label"""),
      notes = "Σ(v−μ)² = Σv² − (Σv)²/n on the decimal grid; 10⁻⁹ terms decimal-summed"),

    // ---- DSIR against a PERSISTED model (the operational shape: fit
    // the O(buckets) log-ratio table once, commit behind _OK, probe
    // every batch with zero refit — x46's discipline applied to the
    // scoring family). Oracle = the x47 inline model, so the index
    // face must be invisible in the result.
    GraftQuery(
      "x57_dsir_indexed",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val path = s"${sys.props("java.io.tmpdir")}/graft-dsir-model-" +
          s"${OracleDump.sfTag(dir)}-b1024"
        if (!graft.ops.Dsir.modelReady(s, path))
          graft.ops.Dsir.writeModel(
            docs.filter($"doc_id" % 5 =!= 0),
            docs.filter($"doc_id" % 5 === 0), "text", path)
        graft.ops.Dsir.scoreIndexed(
          docs.filter($"doc_id" % 5 =!= 0), path, "doc_id", "text")
      },
      Some(dsirWeightsCte +
        """SELECT pd.doc_id, CAST(sum(pd.c) AS BIGINT) AS n_grams,
             round(CAST(sum(pd.c * lr.lr) AS DOUBLE), 6) AS ilw
           FROM pd JOIN lr USING (f) GROUP BY pd.doc_id"""),
      notes = "probe of the committed model ≡ the inline fit, row for row"),

    // ---- corpus snapshot diff (crawl drift): per token, counts in
    // both snapshots + add-1-smoothed log-ratio over the union vocab,
    // top movers first. Two O(vocab) counts + one vocab-table
    // full-outer join + TakeOrderedAndProject — nothing corpus-sized
    // joins or sorts.
    GraftQuery(
      "x58_corpus_diff",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.TextAnalysis.corpusDiff(
          docs.filter($"doc_id" % 2 === 0),
          docs.filter($"doc_id" % 2 =!= 0), "text")
      },
      Some("""WITH ta AS (SELECT unnest(regexp_extract_all(lower(text),
              '[a-z0-9]+')) AS token FROM documents WHERE doc_id % 2 = 0),
          tb AS (SELECT unnest(regexp_extract_all(lower(text),
              '[a-z0-9]+')) AS token FROM documents WHERE doc_id % 2 <> 0),
          ca AS (SELECT token, CAST(count(*) AS BIGINT) AS n_a FROM ta GROUP BY token),
          cb AS (SELECT token, CAST(count(*) AS BIGINT) AS n_b FROM tb GROUP BY token),
          j AS (SELECT COALESCE(ca.token, cb.token) AS token,
                COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
                FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
          t AS (SELECT CAST(count(*) AS DOUBLE) AS v,
                CAST(sum(n_a) AS DOUBLE) AS na,
                CAST(sum(n_b) AS DOUBLE) AS nb FROM j)
        SELECT token, n_a, n_b,
          round(ln((CAST(n_a AS DOUBLE) + 1.0) / (t.na + t.v))
            - ln((CAST(n_b AS DOUBLE) + 1.0) / (t.nb + t.v)), 6) AS log_ratio
        FROM j CROSS JOIN t
        ORDER BY abs(log_ratio) DESC, token LIMIT 100"""),
      notes = "add-1 smoothing over the union vocab; |log_ratio| rank is total-ordered"),

    // ---- passage-granularity retrieval (the RAG shape): BM25 over the
    // size-30/stride-20 chunk collection, top-20 chunks. Composes the
    // verified chunker (x28 convention) with the verified scorer (x27
    // formula) at the grain retrieval actually serves; collection
    // stats are the CHUNK collection's. Chunk ids are closed-form
    // (doc_id·1000 + idx) so provenance needs no join back.
    GraftQuery(
      "x59_chunk_retrieval",
      (s, dir) => {
        import s.implicits._
        val chunks = graft.ops.Chunking.slidingChunks(
          Tables(s, dir, "documents"), "doc_id", "text",
          size = 30, stride = 20)
          .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
            col("chunk_text"))
        graft.ops.Bm25.score(chunks, "chunk_id", "chunk_text",
          terms = Seq("spark", "join", "data"))
          .select(col("chunk_id"),
            expr("chunk_id DIV 1000").as("doc_id"),
            expr("chunk_id % 1000").cast("int").as("chunk_idx"),
            col("bm25"))
          .orderBy(col("bm25").desc, col("chunk_id"))
          .limit(20)
      },
      Some("""WITH toks AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (SELECT doc_id, t, n,
            unnest(range(0, 1 + (greatest(n - 30, 0) + 19) // 20)) AS ci
          FROM nz),
        ch AS (SELECT doc_id * 1000 + ci AS chunk_id, doc_id,
            CAST(ci AS INT) AS chunk_idx,
            t[ci * 20 + 1 : ci * 20 + 30] AS ct FROM c),
        st AS (SELECT count(*) AS n,
            CAST(sum(len(ct)) AS BIGINT) AS sumdl,
            CAST(sum(CASE WHEN list_contains(ct, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
            CAST(sum(CASE WHEN list_contains(ct, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
            CAST(sum(CASE WHEN list_contains(ct, 'data') THEN 1 ELSE 0 END) AS BIGINT) AS df2
          FROM ch),
        tf AS (SELECT chunk_id, doc_id, chunk_idx,
            CAST(len(ct) AS DOUBLE) AS dl,
            CAST(len(ct) - len(list_filter(ct, x -> x <> 'spark')) AS DOUBLE) AS tf0,
            CAST(len(ct) - len(list_filter(ct, x -> x <> 'join')) AS DOUBLE) AS tf1,
            CAST(len(ct) - len(list_filter(ct, x -> x <> 'data')) AS DOUBLE) AS tf2
          FROM ch),
        sc AS (SELECT chunk_id, doc_id, chunk_idx, round(
            ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * tf0 * 2.2
              / (tf0 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * tf1 * 2.2
              / (tf1 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n)))
          + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * tf2 * 2.2
              / (tf2 + 1.2 * (0.25 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n))), 6)
          AS bm25 FROM tf, st)
        SELECT chunk_id, doc_id, chunk_idx, bm25 FROM sc WHERE bm25 > 0
        ORDER BY bm25 DESC, chunk_id LIMIT 20"""),
      notes = "x28's chunk convention × x27's BM25 over the chunk collection's own stats"),

    // ---- Gopher-style rule gates (Rae et al. 2021): per-doc surface
    // stats + conjunctive pass flag. Closed-form expressions, one scan;
    // the auditable complement to x07's scored gate. Thresholds are
    // applied to the ROUNDED ratios on both sides, so a boundary doc
    // can never split the verdicts.
    GraftQuery(
      "x60_gopher_rules",
      (s, dir) => graft.ops.TextAnalysis.gopherRules(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH w AS (SELECT doc_id,
          CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
          CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS wc,
          CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS nh,
          CAST((length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE) AS ne,
          CAST(len(list_filter(regexp_extract_all(text, '\S+'),
            x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) AS na,
          CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
            x -> x IN ('the','a','an','and','or','of','to','in','is','it')))
            AS BIGINT) AS n_stop
        FROM documents),
      r AS (SELECT doc_id, n_words,
          round(CASE WHEN n_words > 0 THEN wc / n_words ELSE 0.0 END, 6) AS mean_word_len,
          round(CASE WHEN n_words > 0 THEN nh / n_words ELSE 0.0 END, 6) AS hash_ratio,
          round(CASE WHEN n_words > 0 THEN ne / n_words ELSE 0.0 END, 6) AS ellipsis_ratio,
          round(CASE WHEN n_words > 0 THEN na / n_words ELSE 0.0 END, 6) AS alpha_frac,
          n_stop
        FROM w)
      SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
        alpha_frac, n_stop,
        CAST(n_words >= 50 AND n_words <= 100000
          AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
          AND hash_ratio <= 0.1 AND ellipsis_ratio <= 0.3
          AND alpha_frac >= 0.8 AND n_stop >= 2 AS INT) AS pass
      FROM r"""),
      notes = "published defaults where the fixture bites; word bounds are parameters"),

    // ---- embedding Gram + covariance matrix (i ≤ j): whitening/PCA
    // input and the anisotropy diagnostic. The d²/2 products per vector
    // are ONE row-local nested-transform array (no self-join, no
    // (vec,dim)² shuffle); aggregation key space is d²/2; per-dim means
    // broadcast into the final join. Products/components on the 1e-9
    // decimal grid before summation.
    GraftQuery(
      "x61_embedding_gram",
      (s, dir) => graft.ops.EmbedStats.gramCov(
        Tables(s, dir, "embeddings"), "embedding"),
      Some("""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        x AS (SELECT vec_id, unnest(v) AS xi,
            CAST(generate_subscripts(v, 1) - 1 AS INT) AS i FROM e),
        y AS (SELECT vec_id, unnest(v) AS xj,
            CAST(generate_subscripts(v, 1) - 1 AS INT) AS j FROM e),
        p AS (SELECT x.i, y.j,
              CAST(floor(x.xi * y.xj * 1000000000.0 + 0.5) AS DECIMAL(38,0)) AS v
              FROM x JOIN y ON x.vec_id = y.vec_id AND y.j >= x.i),
        sp AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(v) AS DOUBLE) / 1000000000.0 AS spd FROM p GROUP BY i, j),
        d AS (SELECT i,
              CAST(sum(CAST(floor(xi * 1000000000.0 + 0.5) AS DECIMAL(38,0)))
                AS DOUBLE) / 1000000000.0 AS si
              FROM x GROUP BY i)
      SELECT sp.i, sp.j, sp.n,
        round(sp.spd / sp.n, 6) + 0.0 AS gram,
        round(sp.spd / sp.n - (da.si / sp.n) * (db.si / sp.n), 6) + 0.0 AS cov
      FROM sp JOIN d da ON da.i = sp.i JOIN d db ON db.i = sp.j"""),
      notes = "oracle's within-vector pair join ≡ the generator form; the 1e-9 grid " +
        "snap is floor(v*1e9 + 0.5) on BOTH sides (identical IEEE ops, exact " +
        "integer sums); +0.0 normalizes DuckDB's -0.0 to match Spark"),

    // ---- per-source quality percentile normalization: map each doc's
    // x07 quality score to its percent_rank WITHIN its source — the
    // cross-source-comparable quality signal (absolute score scales
    // drift per source; mixing policies want quantiles). One window
    // per source partition; ties share a rank, so the output is
    // order-deterministic.
    GraftQuery(
      "x62_source_quality_norm",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select($"doc_id", $"source",
            graft.ops.TextAnalysis.qualityScore($"text").as("__q"))
          .select($"doc_id", $"source", round($"__q", 6).as("quality"),
            round(percent_rank().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy($"source").orderBy($"__q")), 6).as("q_pct"))
      },
      Some("""WITH q AS (SELECT doc_id, source,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n,
          CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) AS nd,
          CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
            x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                       'for','on','with','as','at','by','from','that','this'))) AS DOUBLE) AS stop,
          CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
          CAST(length(text) AS DOUBLE) AS chars
        FROM documents),
      sc AS (SELECT doc_id, source,
          (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
          + (CASE WHEN n > 0 THEN nd / n ELSE 0.0 END) * 0.25
          + least(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END * 5.0, 1.0) * 0.25
          + (CASE WHEN chars > 0 THEN 1.0 - least(punct / chars * 5.0, 1.0) ELSE 0.0 END) * 0.25
          AS q FROM q)
      SELECT doc_id, source, round(q, 6) AS quality,
        round(percent_rank() OVER (PARTITION BY source ORDER BY q), 6) AS q_pct
      FROM sc"""),
      notes = "x07's score composed with a per-source percent_rank; ranked on the unrounded score both sides"),

    // ---- per-component z-scores (standardization): the whitening-lite
    // pass before distance ops when component scales differ. μ/σ from
    // one posexplode aggregation (d-row stats, floor-snap grid sums —
    // see x61), broadcast into a row-local projection; zero-variance
    // components yield NULL, never ±Inf.
    GraftQuery(
      "x63_embedding_standardize",
      (s, dir) => graft.ops.EmbedStats.standardize(
        Tables(s, dir, "embeddings"), "vec_id", "embedding"),
      Some("""WITH e AS (SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        x AS (SELECT vec_id, unnest(v) AS xi,
            CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim FROM e),
        st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CAST(floor(xi * 1000000000.0 + 0.5) AS DECIMAL(38,0)))
              AS DOUBLE) / 1000000000.0 AS s1,
            CAST(sum(CAST(floor(xi * xi * 1000000000.0 + 0.5) AS DECIMAL(38,0)))
              AS DOUBLE) / 1000000000.0 AS s2
          FROM x GROUP BY dim)
      SELECT x.vec_id, x.dim,
        CASE WHEN st.s2 / st.n - (st.s1 / st.n) * (st.s1 / st.n) > 0
          THEN round((x.xi - st.s1 / st.n)
            / sqrt(st.s2 / st.n - (st.s1 / st.n) * (st.s1 / st.n)), 6) + 0.0
          ELSE NULL END AS z
      FROM x JOIN st USING (dim)"""),
      notes = "same floor-snap moment sums as x61; +0.0 normalizes -0.0"),

    // ---- token-budget truncation: keep each doc's first 32 tokens —
    // the context-window cap before packing. Normalized-join rebuild
    // (the passage convention); pure row-local projection.
    GraftQuery(
      "x64_token_truncate",
      (s, dir) => graft.ops.TextAnalysis.truncateTokens(
        Tables(s, dir, "documents"), "doc_id", "text", budget = 32),
      Some("""WITH toks AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        CAST(least(len(t), 32) AS BIGINT) AS n_kept,
        array_to_string(t[1:32], ' ') AS truncated
      FROM toks"""),
      notes = "normalized token-join rebuild, the passage-dedup convention"),

    // ---- n-gram novelty vs everything earlier (min doc_id = first
    // occurrence): the acquisition-health signal — a collapsing
    // novelty curve means the crawl is re-reading the web. One min
    // aggregation on the gram key + one gram-keyed join back; linear
    // in corpus grams, never self-joined.
    GraftQuery(
      "x65_ngram_novelty",
      (s, dir) => graft.ops.TextAnalysis.ngramNovelty(
        Tables(s, dir, "documents"), "doc_id", "text", n = 3),
      Some("""WITH toks AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 3),
        gg AS (SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id, array_to_string(t[gi : gi + 2], ' ') AS gram
            FROM nz, unnest(range(1, n - 1)) AS u(gi))),
        firsts AS (SELECT gram, min(doc_id) AS first_doc FROM gg GROUP BY gram)
      SELECT gg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END) AS BIGINT)
          AS n_novel,
        round(CAST(sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END)
          AS DOUBLE) / count(*), 6) AS novelty
      FROM gg JOIN firsts f USING (gram) GROUP BY gg.doc_id"""),
      notes = "oracle's DISTINCT (doc, gram) ≡ Shingles' array_distinct; min-id = first occurrence"),

    // ---- directional n-gram containment join within a blocking key:
    // the quotation/inclusion detector Jaccard dedup structurally
    // misses — a short doc fully quoted inside a long one has tiny
    // Jaccard (|A∩B|/|A∪B| shrinks with |B|) but containment
    // |A∩B|/|A| ≈ 1. Lossless prefix filter on the containment bound
    // (first hn−⌈t·hn⌉+1 sorted hashes of the CONTAINED side must hit
    // the container) + size prune |h(B)| ≥ t·|h(A)|; verify = exact
    // sorted-hash intersection over candidates only. The oracle is the
    // exact O(block²) directional brute force over string shingles.
    GraftQuery(
      "x66_dedup_containment",
      (s, dir) => graft.ops.Dedup.ngramContainmentBlocked(
        Tables(s, dir, "documents"), "doc_id", "text", "lang",
        n = 3, threshold = 0.6),
      Some("""WITH toks AS (
          SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id, lang, list_distinct(
            [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s
          FROM toks),
        nz AS (SELECT * FROM sh WHERE len(s) > 0)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6)
            AS containment
        FROM nz a JOIN nz b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6)
          >= 0.6"""),
      notes = "directional pairs (id_a≠id_b, both orders possible); " +
        "oracle = exact in-block brute force over string shingles"),

    // ---- PCA projection onto the covariance's top-k eigenvectors —
    // the dimensionality-reduction / whitening preprocessor. The
    // distributed work is one gramCov pass + one d-key means agg; the
    // d×d eigen-decomposition runs driver-side (bounded by dim, not
    // corpus). The fitted artifact (components + centering offsets) is
    // DATA once dumped: the oracle replays the projection as one
    // inner product per (doc, component) and hash-matches the values.
    GraftQuery(
      "x67_pca_project",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val p = graft.ops.EmbedStats.pca(e, "embedding", k = 4)
        OracleDump.dump(
          p.components.zipWithIndex.map { case (c, j) =>
            (j, c.toSeq, p.offsets(j))
          }.toSeq.toDF("component", "vec", "voffset"),
          dir, "x67_pca")
        graft.ops.EmbedStats.pcaProject(e, "vec_id", "embedding", p)
      },
      Some("""WITH c AS (SELECT component, vec, voffset
          FROM read_parquet('__SCRATCH__/x67_pca/*.parquet'))
        SELECT e.vec_id, c.component,
          round(list_inner_product(
            list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.vec)
            - c.voffset, 6) + 0.0 AS value
        FROM embeddings e CROSS JOIN c"""),
      notes = "fitted components+offsets dumped as data; both engines run " +
        "the identical sequential-order inner product; +0.0 folds DuckDB's -0.0"),

    // ---- top-V vocabulary coverage / per-doc OOV rate — the
    // tokenizer-sizing signal: one token-key count agg, a driver-
    // bounded top-V cut (ties lexicographic), broadcast back into a
    // per-doc re-aggregation. V=20 bites on the fixture's ~31-token
    // synthetic vocabulary (mean OOV ≈ 0.32, no count tie at the cut).
    GraftQuery(
      "x68_vocab_coverage",
      (s, dir) => graft.ops.TextAnalysis.vocabCoverage(
        Tables(s, dir, "documents"), "doc_id", "text", vocabSize = 20),
      Some("""WITH toks AS (SELECT doc_id,
          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents),
        tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
        vocab AS (SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM tc)
          WHERE rk <= 20)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_oov,
          round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS oov_rate
        FROM toks t LEFT JOIN vocab v USING (tok) GROUP BY t.doc_id"""),
      notes = "OOV counted WITH multiplicity; deterministic lexicographic tie-break at the cut"),

    // ---- per-source novelty slice — the acquisition decision table
    // x65's doc-level curve feeds: micro-averaged (Σnovel/Σgrams, exact
    // integer sums) first-occurrence fraction per source. A source
    // whose novelty sits near zero is redundant against what's already
    // held — cut it before paying to crawl it.
    GraftQuery(
      "x69_source_novelty",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
          .join(docs.select($"doc_id", $"source"), "doc_id")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_grams").as("n_grams"),
            sum($"n_novel").as("n_novel"),
            round(sum($"n_novel").cast("double") / sum($"n_grams"), 6)
              .as("novelty"))
      },
      Some("""WITH toks AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 3),
        gg AS (SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id, array_to_string(t[gi : gi + 2], ' ') AS gram
            FROM nz, unnest(range(1, n - 1)) AS u(gi))),
        firsts AS (SELECT gram, min(doc_id) AS first_doc FROM gg GROUP BY gram),
        per AS (SELECT gg.doc_id, count(*) AS ng,
            sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END) AS nv
          FROM gg JOIN firsts f USING (gram) GROUP BY gg.doc_id)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(per.ng) AS BIGINT) AS n_grams,
          CAST(sum(per.nv) AS BIGINT) AS n_novel,
          round(CAST(sum(per.nv) AS DOUBLE) / sum(per.ng), 6) AS novelty
        FROM per JOIN documents d USING (doc_id) GROUP BY d.source"""),
      notes = "micro-average over x65's per-doc attribution; exact integer sums"),

    // ---- whitened PCA projection — the coordinates downstream ANN
    // actually consumes: raw PCA keeps the dominant component's
    // variance, so distances are still ruled by it; dividing each
    // component by √λ equalizes them. Same fitted artifact as x67 with
    // the eigenvalues riding along; non-positive eigenvalue → NULL
    // (x63's zero-variance convention), never ±Inf. Row-local
    // three-node plan, zero shuffles.
    GraftQuery(
      "x70_pca_whiten",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val p = graft.ops.EmbedStats.pca(e, "embedding", k = 4)
        OracleDump.dump(
          p.components.zipWithIndex.map { case (c, j) =>
            (j, c.toSeq, p.offsets(j), p.eigenvalues(j))
          }.toSeq.toDF("component", "vec", "voffset", "eig"),
          dir, "x70_pca")
        graft.ops.EmbedStats.pcaWhiten(e, "vec_id", "embedding", p)
      },
      Some("""WITH c AS (SELECT component, vec, voffset, eig
          FROM read_parquet('__SCRATCH__/x70_pca/*.parquet'))
        SELECT e.vec_id, c.component,
          CASE WHEN c.eig > greatest(1e-12,
              1e-6 * (SELECT max(eig) FROM c))
            THEN round((list_inner_product(
              list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.vec)
              - c.voffset) / sqrt(c.eig), 6) + 0.0
            ELSE NULL END AS value
        FROM embeddings e CROSS JOIN c"""),
      notes = "x67's replay with eigenvalues in the dump; both engines run " +
        "identical scalar math; +0.0 folds DuckDB's -0.0"),

    // ---- per-source OOV slice — the acquisition-facing face of x68
    // exactly as x69 is of x65: micro-averaged Σoov/Σtokens per source
    // against the corpus's own top-V cut. The "which source will the
    // committed tokenizer shred into bytes" table a data-acquisition
    // review reads next to the novelty slice. One groupBy over the
    // verified x68 operator; exact integer sums.
    GraftQuery(
      "x71_source_oov",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.TextAnalysis.vocabCoverage(docs, "doc_id", "text",
            vocabSize = 20)
          .join(docs.select($"doc_id", $"source"), "doc_id")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("n_tokens"),
            sum($"n_oov").as("n_oov"),
            round(sum($"n_oov").cast("double") / sum($"n_tokens"), 6)
              .as("oov_rate"))
      },
      Some("""WITH toks AS (SELECT doc_id,
          unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
          FROM documents),
        tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
        vocab AS (SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM tc)
          WHERE rk <= 20)
        SELECT d.source, CAST(count(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_oov,
          round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS oov_rate
        FROM toks t LEFT JOIN vocab v USING (tok)
        JOIN documents d USING (doc_id) GROUP BY d.source"""),
      notes = "x68's vocab cut + x69's micro-average shape; n_docs counts " +
        "docs with tokens (x68 has no row for tokenless docs)"),

    // ---- bounded-merge BPE tokenizer fit + per-doc tokenization —
    // the subword half of the tokenizer-sizing family (x68 sizes a
    // WORD vocabulary; the committed artifact of a real pipeline is a
    // merge list). Fit: ONE corpus scan (word frequencies), then 16
    // iterations over the vocabulary-sized word table — pair explode,
    // map-side-combining count, driver argmax with a total-order
    // tie-break, row-local merge application. The fitted per-word
    // symbolization is dumped as data; the oracle replays the per-doc
    // tokenization (word-keyed join + ordered string_agg) and
    // hash-matches counts AND the subword stream. The fit itself is
    // spec-verified (BpeSpec: hand-computed Sennrich-style merge
    // sequence, deterministic ties, l==r leftmost-first overlap,
    // partitioning invariance).
    GraftQuery(
      "x72_bpe_tokenize",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val fit = graft.ops.Bpe.fitCached(docs, "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        OracleDump.dump(fit.wordTable, dir, "x72_bpe")
        graft.ops.Bpe.tokenize(docs, "doc_id", "text", fit)
      },
      Some("""WITH m AS (SELECT word, syms, n_syms
          FROM read_parquet('__SCRATCH__/x72_bpe/*.parquet')),
        toks AS (SELECT doc_id, gi, t[gi] AS word FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), unnest(range(1, len(t) + 1)) AS u(gi))
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(m.n_syms) AS BIGINT) AS n_bpe_tokens,
          string_agg(m.syms, ' ' ORDER BY t.gi) AS bpe_text
        FROM toks t JOIN m USING (word) GROUP BY t.doc_id"""),
      notes = "fitted symbolization dumped as data (x14's convention: the " +
        "plumbing hash-verifies, the fit is spec-pinned); every corpus word " +
        "is in the map by construction, so the join is lossless"),

    // ---- per-cluster corpus profile — the semantic-mixing table: for
    // each cell of the persisted IVF index (the a04 artifact, built
    // once), the doc count, exact mean quality score, and source/lang
    // diversity. The table a mixture policy reads to spot a junk
    // cluster (low quality, one source) or an underrepresented one
    // before weighting. One id-keyed join (assigned ⋈ documents, both
    // corpus-sized → co-partitioned) + one k-key aggregation; the mean
    // rides an EXACT decimal sum of per-doc 1e-6-rounded scores, so it
    // is partition-order independent.
    GraftQuery(
      "x73_cluster_profile",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val docs = Tables(s, dir, "documents")
        val index = graft.ops.Ivf.buildPersistentCached(e,
          OracleDump.ivfPath(dir, 16), "vec_id", "embedding", k = 16)
        index.assigned.select($"vec_id".as("doc_id"), $"cluster")
          .join(docs.select($"doc_id", $"source", $"lang",
            round(TextAnalysis.qualityScore($"text"), 6).as("__q")), "doc_id")
          .groupBy($"cluster")
          .agg(count(lit(1)).as("n_docs"),
            round(sum($"__q".cast("decimal(18,6)")).cast("double") /
              count(lit(1)), 6).as("mean_quality"),
            countDistinct($"source").as("n_sources"),
            countDistinct($"lang").as("n_langs"))
      },
      Some("""WITH a AS (SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        q AS (SELECT doc_id, source, lang,
            CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n,
            CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) AS nd,
            CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                         'for','on','with','as','at','by','from','that','this'))) AS DOUBLE) AS stop,
            CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
            CAST(length(text) AS DOUBLE) AS chars
          FROM documents),
        s AS (SELECT doc_id, source, lang, round(
            (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
            + (CASE WHEN n > 0 THEN nd / n ELSE 0.0 END) * 0.25
            + least(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END * 5.0, 1.0) * 0.25
            + (CASE WHEN chars > 0 THEN 1.0 - least(punct / chars * 5.0, 1.0)
               ELSE 0.0 END) * 0.25, 6) AS qq
          FROM q)
        SELECT a.cluster, CAST(count(*) AS BIGINT) AS n_docs,
          round(CAST(sum(CAST(s.qq AS DECIMAL(18,6))) AS DOUBLE)
            / count(*), 6) AS mean_quality,
          CAST(count(DISTINCT s.source) AS BIGINT) AS n_sources,
          CAST(count(DISTINCT s.lang) AS BIGINT) AS n_langs
        FROM a JOIN s ON a.vec_id = s.doc_id GROUP BY a.cluster"""),
      notes = "x07's score CTE + a04's persisted-index replay; exact decimal " +
        "mean (partition-order independent)"),

    // ---- per-source subword fertility — the x72 family's acquisition
    // slice (x69/x71's shape): tokens-per-word under the committed
    // merge list, per source. The table that prices each source in
    // context-window slots BEFORE a crawl contract is renewed: a
    // source the tokenizer shreds costs 2-4× its word count to train
    // on. One explode + one vocab-table join + one source-key agg;
    // fertility rides exact integer sums.
    GraftQuery(
      "x74_fertility_by_source",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val fit = graft.ops.Bpe.fitCached(docs, "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        OracleDump.dump(fit.wordTable, dir, "x74_bpe")
        val out = graft.ops.Bpe.fertilityBy(
          docs.select($"source", $"text"), "text", "source", fit)
        out
      },
      Some("""WITH m AS (SELECT word, n_syms
          FROM read_parquet('__SCRATCH__/x74_bpe/*.parquet')),
        toks AS (SELECT doc_id, t[gi] AS word FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), unnest(range(1, len(t) + 1)) AS u(gi))
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(m.n_syms) AS BIGINT) AS n_bpe_tokens,
          round(CAST(sum(m.n_syms) AS DOUBLE) / count(*), 6) AS fertility
        FROM toks t JOIN m USING (word) JOIN documents d USING (doc_id)
        GROUP BY d.source"""),
      notes = "x72's dumped symbolization replayed per source; integer sums " +
        "then one rounded division — partition-order independent"),

    // ---- cluster-balanced deterministic sampling — the diversity-
    // preserving subset export: the same FRACTION of every semantic
    // cell (quota = ceil(rate·n_cell), md5-rank within cell), where a
    // flat hash gate at the same rate kills small cells with
    // probability (1-rate)^n — exactly the rare-topic mass a curated
    // mix exists to keep. Rank order is rate-independent, so exports
    // at different rates nest (the 25% set ⊂ the 50% set).
    GraftQuery(
      "x75_cluster_quota_sample",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val index = graft.ops.Ivf.buildPersistentCached(e,
          OracleDump.ivfPath(dir, 16), "vec_id", "embedding", k = 16)
        val assigned = index.assigned.select($"vec_id".as("doc_id"), $"cluster")
        graft.ops.Sampling.cellQuotaSample(assigned, "doc_id", "cluster", 0.25)
          .groupBy($"cluster")
          .agg(count(lit(1)).as("n_sampled"), sum($"doc_id").as("id_sum"))
          .join(assigned.groupBy($"cluster").agg(count(lit(1)).as("n_docs")),
            "cluster")
          .select($"cluster", $"n_docs", $"n_sampled", $"id_sum")
      },
      Some("""WITH a AS (SELECT vec_id AS doc_id, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        k AS (SELECT doc_id, cluster,
            row_number() OVER (PARTITION BY cluster
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
            count(*) OVER (PARTITION BY cluster) AS n FROM a)
        SELECT cluster, CAST(max(n) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_sampled,
          CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM k WHERE rn <= ceil(0.25 * n) GROUP BY cluster"""),
      notes = "a04's persisted-index replay; (md5(id), id) is a total " +
        "order, so both engines pick identical rows"),

    // ---- temperature-scaled mixture sampling (α = 0.5) — the
    // published multilingual/multi-domain recipe: sample source s
    // ∝ n_s^α so the head crawl slice stops drowning the tail.
    // Downsampling-only: the smallest source keeps everything, every
    // other source downsamples to the exact n_s^0.5 mix. The rates are
    // data-derived, so the oracle RECOMPUTES them from the same
    // integer counts — possible because the weight normalizer cancels
    // algebraically and what remains (sqrt, ·, ÷, min) is correctly-
    // rounded IEEE arithmetic both engines share bit-for-bit.
    GraftQuery(
      "x76_temperature_mix_sample",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Sampling.temperatureSample(docs, "doc_id", "source", 0.5)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("id_sum"))
          .join(docs.groupBy($"source").agg(count(lit(1)).as("n_total")),
            "source")
          .select($"source", $"n_total", $"n_kept", $"id_sum")
      },
      Some("""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source),
        r AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM c),
        m AS (SELECT min(CAST(n AS DOUBLE) / w) AS mm FROM r),
        t AS (SELECT source, n,
            CAST(floor(least(1.0, w * (SELECT mm FROM m) / CAST(n AS DOUBLE))
              * 65536 + 0.5) AS INT) AS thr FROM r)
        SELECT d.source, t.n AS n_total, CAST(count(*) AS BIGINT) AS n_kept,
          CAST(sum(d.doc_id) AS BIGINT) AS id_sum
        FROM documents d JOIN t ON d.source = t.source
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INT)
              < t.thr
        GROUP BY d.source, t.n"""),
      notes = "rates recomputed in SQL from the same counts: weight " +
        "normalizer cancels, sqrt/mul/div/min are correctly-rounded IEEE, " +
        "threshold = floor(rate*65536 + 0.5) mirrors gateThreshold"),

    // ---- sequence packing under the COMMITTED subword tokenizer —
    // x19's offset-stride packs priced in real BPE tokens instead of
    // whitespace words (the unit that actually fills a context
    // window: a shredded doc takes 2-4× the packing slots its word
    // count suggests, so word-priced packs systematically overflow).
    // Composition of two verified operators: x72's tokenize supplies
    // per-doc subword counts (one explode + vocab-table join + doc
    // agg), x19's window packs them per language shard. The oracle
    // replays tokenization from the dumped symbolization, then the
    // identical window arithmetic.
    GraftQuery(
      "x77_bpe_packing",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val fit = graft.ops.Bpe.fitCached(docs, "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        OracleDump.dump(fit.wordTable, dir, "x77_bpe")
        val counts = graft.ops.Bpe.tokenize(
          docs.select($"doc_id", $"text"), "doc_id", "text", fit)
          .select($"doc_id", $"n_bpe_tokens")
        val packed = graft.ops.Packing.packBy(
          counts.join(docs.select($"doc_id", $"lang"), "doc_id"),
          "lang", "doc_id", $"n_bpe_tokens".cast("long"), budget = 1024)
        graft.ops.Packing.packStats(packed, "lang", 1024)
      },
      Some("""WITH m AS (SELECT word, n_syms
          FROM read_parquet('__SCRATCH__/x77_bpe/*.parquet')),
        toks AS (SELECT doc_id, t[gi] AS word FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), unnest(range(1, len(t) + 1)) AS u(gi)),
        cnt AS (SELECT t.doc_id, CAST(sum(m.n_syms) AS BIGINT) AS n_tok
          FROM toks t JOIN m USING (word) GROUP BY t.doc_id),
        j AS (SELECT c.doc_id, d.lang, c.n_tok
          FROM cnt c JOIN documents d USING (doc_id)),
        packed AS (SELECT lang, n_tok,
          CAST(floor((sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
            / 1024) AS BIGINT) AS pack_id
          FROM j)
        SELECT lang, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          round(CAST(sum(n_tok) AS DOUBLE) / 1024, 6) AS utilization
        FROM packed GROUP BY lang, pack_id"""),
      notes = "x72's dumped symbolization prices the docs; x19's window " +
        "packs them — tokenless docs drop on both sides (inner join)"),

    // ---- deterministic EXACT-size global sample: the n smallest
    // (md5(id), id) keys — eval sets and human-review batches need
    // exactly n rows, not ~rate·N with binomial jitter, and the
    // hash-rank order makes samples NEST across sizes (grow a review
    // batch without redrawing it). Plans TakeOrderedAndProject
    // (per-partition heaps), never a global sort.
    GraftQuery(
      "x78_exact_sample",
      (s, dir) => {
        import s.implicits._
        graft.ops.Sampling.exactSample(
          Tables(s, dir, "documents"), "doc_id", n = 100)
          .select($"doc_id", $"lang")
      },
      Some("""SELECT doc_id, lang FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100"""),
      notes = "the (md5(id), id) total order is shared with the gate " +
        "family; both engines pick identical rows"),

    // ---- top-n-gram dominance: the fraction of a doc's word 2-grams
    // taken by its single most common 2-gram, WITH the winning gram —
    // Gopher's keyword-stuffing/boilerplate signal, auditable because
    // a reviewer reads the gram itself. Ties break to the smallest
    // gram; docs under 2 tokens have no row.
    GraftQuery(
      "x79_top_ngram_dominance",
      (s, dir) => graft.ops.TextAnalysis.topNgramDominance(
        Tables(s, dir, "documents"), "doc_id", "text", n = 2),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        g AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
          FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)),
        c AS (SELECT doc_id, gram, count(*) AS n_top
          FROM g GROUP BY doc_id, gram),
        r AS (SELECT doc_id, gram, n_top,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY n_top DESC, gram) AS rk,
            sum(n_top) OVER (PARTITION BY doc_id) AS n_ngrams FROM c)
        SELECT doc_id, gram AS top_ngram, CAST(n_top AS BIGINT) AS n_top,
          CAST(n_ngrams AS BIGINT) AS n_ngrams,
          round(CAST(n_top AS DOUBLE) / n_ngrams, 6) AS dominance
        FROM r WHERE rk = 1"""),
      notes = "argmax under (count desc, gram asc) — a total order both " +
        "engines replay; exact integer sums"),

    // ---- tokenize NEW data under the committed merge list — the
    // committed tokenizer's main consumer is data the fit never saw,
    // and x72's symbolization join silently drops unseen words (right
    // for the fit corpus, wrong for arriving data). This face derives
    // every distinct word's segmentation from the MERGE LIST itself
    // (Bpe.tokenizeWith / applyMerges — identical on in-fit words,
    // deterministic on unseen ones), exercised over the corpus with a
    // PLANTED vocabulary-novel word per doc. The oracle replays
    // tokenization from the dumped merge list alone (never the
    // symbolization table): a recursive CTE applies each merge
    // leftmost-first in fit order — the published BPE rule, pinned
    // here engine-independently.
    GraftQuery(
      "x80_bpe_tokenize_unseen",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val fit = graft.ops.Bpe.fitCached(docs, "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        OracleDump.dump(fit.mergeTable(s), dir, "x80_bpe_merges")
        val incoming = docs.select($"doc_id",
          concat($"text", lit(" zzqx"), ($"doc_id" % 23).cast("string"))
            .as("text"))
        graft.ops.Bpe.tokenizeWith(incoming, "doc_id", "text",
          fit.merges.map(m => (m.left, m.right)))
      },
      Some("""WITH RECURSIVE
        mg AS (SELECT CAST(step AS INTEGER) AS step, "left" AS l, "right" AS r
          FROM read_parquet('__SCRATCH__/x80_bpe_merges/*.parquet')),
        nm AS (SELECT CAST(count(*) AS INTEGER) AS n FROM mg),
        docs2 AS (SELECT doc_id,
            text || ' zzqx' || CAST(doc_id % 23 AS VARCHAR) AS text
          FROM documents),
        toks AS (SELECT doc_id, gi, t[gi] AS word FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM docs2), unnest(range(1, len(t) + 1)) AS u(gi)),
        w AS (SELECT DISTINCT word FROM toks),
        seg AS (
          SELECT word,
            list_transform(range(1, length(word) + 1), i -> word[i]) AS syms,
            0 AS st
          FROM w
          UNION ALL
          SELECT word,
            CASE WHEN pos IS NULL THEN syms
                 ELSE list_concat(list_concat(syms[1:pos-1], [l || r]),
                                  syms[pos+2:]) END,
            CASE WHEN pos IS NULL THEN st + 1 ELSE st END
          FROM (SELECT s.word, s.syms, s.st, m.l, m.r,
              list_filter(range(1, len(s.syms)),
                i -> s.syms[i] = m.l AND s.syms[i+1] = m.r)[1] AS pos
            FROM seg s JOIN mg m ON m.step = s.st)),
        fin AS (SELECT word, array_to_string(syms, ' ') AS syms,
            CAST(len(syms) AS BIGINT) AS n_syms
          FROM seg, nm WHERE st = nm.n)
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(f.n_syms) AS BIGINT) AS n_bpe_tokens,
          string_agg(f.syms, ' ' ORDER BY t.gi) AS bpe_text
        FROM toks t JOIN fin f USING (word) GROUP BY t.doc_id"""),
      notes = "oracle replays the merge list itself: one recursive leftmost-" +
        "first application per step (provably ≡ the single greedy pass — a " +
        "replacement can never create an occurrence of its own pair to its " +
        "left or right), unseen words included"),

    // ---- packing budget sweep — the context-window sizing table:
    // pack count and fill rate of the BPE-priced corpus at budgets
    // 512/1024/2048/4096, computed from ONE tokenization pass (the
    // committed x72 artifact) with one window per budget. The table an
    // operator reads before committing a sequence length: fill rate
    // falls as the window grows past the doc-length distribution (big
    // windows strand capacity behind short docs under contiguous
    // fill), and the pack count IS the training-step bill. Exact
    // integer sums; fill_rate = Σtokens / (packs·budget), one rounded
    // division per row.
    GraftQuery(
      "x81_packing_budget_sweep",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val fit = graft.ops.Bpe.fitCached(docs, "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        OracleDump.dump(fit.wordTable, dir, "x81_bpe")
        val priced = graft.ops.Staged(graft.ops.Bpe.tokenize(
          docs.select($"doc_id", $"text"), "doc_id", "text", fit)
          .select($"doc_id", $"n_bpe_tokens")
          .join(docs.select($"doc_id", $"lang"), "doc_id"))
        Seq(512, 1024, 2048, 4096).map { b =>
          graft.ops.Packing.packBy(priced, "lang", "doc_id",
              $"n_bpe_tokens".cast("long"), budget = b)
            .agg(countDistinct($"lang", $"pack_id").as("n_packs"),
              count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
            .select(lit(b).as("budget"), $"n_packs", $"n_docs", $"n_tokens",
              round($"n_tokens".cast("double") / ($"n_packs" * lit(b)), 6)
                .as("fill_rate"))
        }.reduce(_ unionByName _)
      },
      Some("""WITH m AS (SELECT word, n_syms
          FROM read_parquet('__SCRATCH__/x81_bpe/*.parquet')),
        toks AS (SELECT doc_id, t[gi] AS word FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), unnest(range(1, len(t) + 1)) AS u(gi)),
        cnt AS (SELECT t.doc_id, CAST(sum(m.n_syms) AS BIGINT) AS n_tok
          FROM toks t JOIN m USING (word) GROUP BY t.doc_id),
        j AS (SELECT c.doc_id, d.lang, c.n_tok
          FROM cnt c JOIN documents d USING (doc_id)),
        b AS (SELECT unnest([512, 1024, 2048, 4096]) AS budget),
        packed AS (SELECT b.budget, j.lang, j.n_tok,
          CAST(floor((sum(j.n_tok) OVER (PARTITION BY b.budget, j.lang
            ORDER BY j.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - j.n_tok)
            / b.budget) AS BIGINT) AS pack_id
          FROM j CROSS JOIN b)
        SELECT budget, CAST(count(DISTINCT (lang, pack_id)) AS BIGINT)
            AS n_packs,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          round(CAST(sum(n_tok) AS DOUBLE)
            / (count(DISTINCT (lang, pack_id)) * budget), 6) AS fill_rate
        FROM packed GROUP BY budget"""),
      notes = "x77's pricing at four window sizes from one tokenization " +
        "pass; pack identity = (lang, pack_id) exactly as x19/x77"),

    // ---- LSH band tuning sweep — the (bands, rowsPerBand) S-curve
    // measured, not assumed (a08/a14's discipline applied to the dedup
    // index): recall of minHashLsh at four band splits of the SAME
    // 128-hash signature family against the exact inverted-index
    // ground truth, which shares minHashLsh's own verify metric so the
    // gap is pure banding recall. The published knob: more rows per
    // band sharpens the S-curve (fewer candidates, lower recall below
    // the knee) — (4,32) deliberately sits past the fixture's jaccard
    // mass to show the drop. Precision is 1.0 on every row (exact
    // verify), so found ⊆ truth and recall is the only moving number.
    // The per-config banded tables are dumped as data (x05/x25's
    // convention): the oracle replays candidate join + exact verify +
    // recall per config, and the truth side pairwise-joins shingle
    // sets directly.
    GraftQuery(
      "x82_lsh_band_sweep",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val truth = graft.ops.Staged(graft.ops.Dedup.exactJaccardPairs(
          docs, "doc_id", "text", threshold = 0.8)
          .select($"id_a", $"id_b"))
        Seq((32, 4), (16, 8), (8, 16), (4, 32)).map { case (b, r) =>
          if (OracleDump.enabled) {
            val banded = docs
              .select($"doc_id",
                graft.ops.Dedup.shingleHashSet($"text", 3).as("__h"))
              .where(size($"__h") > 0)
              .select($"doc_id", posexplode(graft.ops.Dedup.bandKeys(
                graft.ops.Dedup.minHashSignatureFromHashes($"__h", b * r),
                b, r)).as(Seq("band_idx", "band_key")))
            OracleDump.dump(banded, dir, s"x82_bands_${b}_$r")
          }
          val found = graft.ops.Dedup.minHashLsh(docs, "doc_id", "text",
            threshold = 0.8, bands = b, rowsPerBand = r)
            .select($"id_a", $"id_b")
          truth.join(found.withColumn("__hit", lit(1)),
              Seq("id_a", "id_b"), "left")
            .agg(count(lit(1)).as("n_true"), count($"__hit").as("n_found"))
            .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
              $"n_true", $"n_found",
              round($"n_found".cast("double") / $"n_true", 6).as("recall"))
        }.reduce(_ unionByName _)
      },
      Some(s"""$shingleCte,
        truth AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM nz a JOIN nz b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        tn AS (SELECT count(*) AS n FROM truth),
        ${Seq((32, 4), (16, 8), (8, 16), (4, 32)).map { case (b, r) =>
          s"""c_${b}_$r AS (SELECT $b AS bands, $r AS rows_per_band,
            x.doc_id AS id_a, y.doc_id AS id_b
          FROM read_parquet('__SCRATCH__/x82_bands_${b}_$r/*.parquet') x
          JOIN read_parquet('__SCRATCH__/x82_bands_${b}_$r/*.parquet') y
            ON x.band_idx = y.band_idx AND x.band_key = y.band_key
            AND x.doc_id < y.doc_id
          GROUP BY ALL)"""
        }.mkString(",\n        ")},
        cands AS (SELECT * FROM c_32_4 UNION ALL SELECT * FROM c_16_8
          UNION ALL SELECT * FROM c_8_16 UNION ALL SELECT * FROM c_4_32),
        found AS (SELECT c.bands, c.rows_per_band, c.id_a, c.id_b
          FROM cands c JOIN nz a ON a.doc_id = c.id_a
          JOIN nz b ON b.doc_id = c.id_b
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        cfg AS (SELECT * FROM (VALUES (32, 4), (16, 8), (8, 16), (4, 32))
          c(bands, rows_per_band)),
        hits AS (SELECT f.bands, f.rows_per_band, f.id_a, f.id_b
          FROM found f JOIN truth USING (id_a, id_b))
        SELECT cfg.bands, cfg.rows_per_band,
          CAST(tn.n AS BIGINT) AS n_true,
          CAST(count(h.id_a) AS BIGINT) AS n_found,
          round(CAST(count(h.id_a) AS DOUBLE) / tn.n, 6) AS recall
        FROM cfg CROSS JOIN tn
        LEFT JOIN hits h ON h.bands = cfg.bands
          AND h.rows_per_band = cfg.rows_per_band
        GROUP BY cfg.bands, cfg.rows_per_band, tn.n"""),
      notes = "truth = exact inverted-index pairwise jaccard (same verify " +
        "metric as the subject); per-config banded tables dumped as data, " +
        "oracle replays candidate join + verify + recall"),

    // ---- shard balance report — the loader-facing health table for
    // the x36 export rule: docs AND bytes (char mass) per md5 shard,
    // with each shard's deviation from the uniform share. A skewed
    // shard skews training step time (loaders consume shards in
    // lockstep), so this is the table read BEFORE committing an
    // export's shard count; the md5 rule makes balance a property of
    // the id distribution, checkable WITHOUT writing the export. One
    // row-local shard projection + one nShards-key agg; the uniform
    // share rides a driver count (one bounded aggregate).
    GraftQuery(
      "x83_shard_balance",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val nShards = 8
        val total = docs.count()
        docs.select(
            graft.ops.Sharding.shardId($"doc_id", nShards).as("shard"),
            length($"text").cast("long").as("__chars"))
          .groupBy($"shard")
          .agg(count(lit(1)).as("n_docs"), sum($"__chars").as("n_chars"))
          .select($"shard", $"n_docs", $"n_chars",
            round($"n_docs".cast("double") /
              (lit(total).cast("double") / nShards), 6).as("load_factor"))
      },
      Some("""WITH t AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        sh AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS shard,
            CAST(length(text) AS BIGINT) AS chars
          FROM documents)
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(chars) AS BIGINT) AS n_chars,
          round(CAST(count(*) AS DOUBLE) / (t.n / 8), 6) AS load_factor
        FROM sh CROSS JOIN t GROUP BY shard, t.n"""),
      notes = "x36's md5 shard rule replayed (first 8 hex chars mod " +
        "nShards); load_factor = n_docs / uniform share"),

    // ---- per-source duplication rate — the acquisition table behind
    // the dedup stage: for each source, how much of it the near-dup
    // pass SUPPRESSES (keep-reps rule: a doc dies iff it is in a
    // cluster and not the min-id representative — exactly the
    // capstone's stage-5 rule). A source paying a high dup rate is
    // re-crawling content the corpus already holds — the renew/cut
    // signal x69 (novelty) reads from the content side, here read from
    // the dedup verdicts themselves. Composes the verified LSH + CC
    // path; the suppressed set is cluster-sized (small), broadcast
    // back onto the corpus; the agg key space is #sources.
    GraftQuery(
      "x84_source_dup_rate",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val pairs = graft.ops.Dedup.minHashLsh(docs, "doc_id", "text",
          threshold = 0.8)
        val clusters = graft.ops.Dedup.connectedComponents(pairs)
        docs.select($"doc_id", $"source")
          .join(broadcast(clusters.where($"doc_id" =!= $"cluster_rep")
            .select($"doc_id", lit(1).as("__supp"))), Seq("doc_id"), "left")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            count($"__supp").as("n_suppressed"),
            round(count($"__supp").cast("double") / count(lit(1)), 6)
              .as("dup_rate"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s FROM toks),
          nz AS (SELECT * FROM sh WHERE len(s) > 0),
          pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM nz a JOIN nz b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
          edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                    UNION ALL SELECT id_b, id_a FROM pairs),
          nodes AS (SELECT DISTINCT u AS id FROM edges),
          reach AS (
            WITH RECURSIVE r(id, lab) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT e.v, r.lab FROM r JOIN edges e ON e.u = r.id
            ) SELECT * FROM r),
          supp AS (SELECT id AS doc_id FROM reach GROUP BY id
            HAVING CAST(min(lab) AS BIGINT) <> id)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(sp.doc_id) AS BIGINT) AS n_suppressed,
          round(CAST(count(sp.doc_id) AS DOUBLE) / count(*), 6) AS dup_rate
        FROM documents d LEFT JOIN supp sp USING (doc_id)
        GROUP BY d.source"""),
      notes = "x20's recursive-CTE closure + the keep-reps rule, sliced " +
        "per source; suppressed ⊂ clustered docs, so the slice is exact"),

    // ---- per-source acquisition health — the ONE table the renew/cut
    // review reads: x69 (novelty), x71 (OOV), x74 (fertility), x84
    // (dup rate) and the x62/x73 quality mean were five separately
    // computed per-source verdicts; this joins the five signals on
    // source (each from its existing operator — no new math; left
    // joins from the all-docs quality frame so a degenerate tokenless
    // source surfaces as NULLs, never silently drops). Oracle = the
    // five existing oracles' CTEs joined the same way. The capstone's
    // day-2 report emits this exact frame (CurateMain.runIncremental).
    GraftQuery(
      "x85_source_health",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val fit = graft.ops.Bpe.fitCached(docs, "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        OracleDump.dump(fit.wordTable, dir, "x85_bpe")
        graft.ops.Acquisition.sourceHealth(docs, "doc_id", "text",
          "source", fit)
      },
      Some("""WITH q AS (SELECT doc_id, source,
          CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n,
          CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) AS nd,
          CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
            x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                       'for','on','with','as','at','by','from','that','this'))) AS DOUBLE) AS stop,
          CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
          CAST(length(text) AS DOUBLE) AS chars
        FROM documents),
      sc AS (SELECT doc_id, source, round(
          (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
          + (CASE WHEN n > 0 THEN nd / n ELSE 0.0 END) * 0.25
          + least(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END * 5.0, 1.0) * 0.25
          + (CASE WHEN chars > 0 THEN 1.0 - least(punct / chars * 5.0, 1.0)
             ELSE 0.0 END) * 0.25, 6) AS qq
        FROM q),
      qual AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          round(CAST(sum(CAST(qq AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
            AS mean_quality
        FROM sc GROUP BY source),
      toks AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      nvz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 3),
      gg AS (SELECT DISTINCT doc_id, gram FROM (
          SELECT doc_id, array_to_string(t[gi : gi + 2], ' ') AS gram
          FROM nvz, unnest(range(1, n - 1)) AS u(gi))),
      firsts AS (SELECT gram, min(doc_id) AS first_doc FROM gg GROUP BY gram),
      pernov AS (SELECT gg.doc_id, count(*) AS ng,
          sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END) AS nv
        FROM gg JOIN firsts f USING (gram) GROUP BY gg.doc_id),
      nov AS (SELECT d.source,
          round(CAST(sum(pernov.nv) AS DOUBLE) / sum(pernov.ng), 6) AS novelty
        FROM pernov JOIN documents d USING (doc_id) GROUP BY d.source),
      wtoks AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM wtoks GROUP BY tok),
      vocab AS (SELECT tok FROM (
          SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM tc)
        WHERE rk <= 20),
      oov AS (SELECT d.source,
          round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS oov_rate
        FROM wtoks w LEFT JOIN vocab v USING (tok)
        JOIN documents d USING (doc_id) GROUP BY d.source),
      bm AS (SELECT word, n_syms
        FROM read_parquet('__SCRATCH__/x85_bpe/*.parquet')),
      fert AS (SELECT d.source,
          round(CAST(sum(bm.n_syms) AS DOUBLE) / count(*), 6) AS fertility
        FROM wtoks w JOIN bm ON bm.word = w.tok
        JOIN documents d USING (doc_id) GROUP BY d.source),
      dsh AS (SELECT doc_id, list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
             FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s FROM toks),
      dnz AS (SELECT * FROM dsh WHERE len(s) > 0),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM dnz a JOIN dnz b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
      edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT u AS id FROM edges),
      reach AS (
        WITH RECURSIVE r(id, lab) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT e.v, r.lab FROM r JOIN edges e ON e.u = r.id
        ) SELECT * FROM r),
      supp AS (SELECT id AS doc_id FROM reach GROUP BY id
        HAVING CAST(min(lab) AS BIGINT) <> id),
      dup AS (SELECT d.source,
          round(CAST(count(sp.doc_id) AS DOUBLE) / count(*), 6) AS dup_rate
        FROM documents d LEFT JOIN supp sp USING (doc_id)
        GROUP BY d.source)
      SELECT qual.source, qual.n_docs, qual.mean_quality,
        nov.novelty, oov.oov_rate, fert.fertility, dup.dup_rate
      FROM qual
      LEFT JOIN nov USING (source)
      LEFT JOIN oov USING (source)
      LEFT JOIN fert USING (source)
      LEFT JOIN dup USING (source)"""),
      notes = "the x69/x71/x74/x84/x62 oracles' CTEs joined on source; " +
        "fertility replays the dumped x85_bpe symbolization; left joins " +
        "keep a tokenless source visible as NULLs"),

    // ---- truth-instrument cap audit — the accounting face of x82's
    // exact-Jaccard ground truth (Dedup.droppedShingles): the bucket
    // sizes of every shingle the hot-shingle cap REMOVED from the
    // truth set. A recall number quoted against the truth is only
    // trustworthy when this table is empty; a mis-set cap is now
    // auditable instead of advisory (SemanticDedup.droppedCells'
    // pattern). The cap here (5) is set BELOW the fixture's hottest
    // shingles on purpose so the audit has rows to verify; x82's own
    // truth pass runs uncapped-in-effect (its 100k default clears the
    // fixture) and its spec asserts the empty-audit case. Output is
    // the bucket-size multiset — the shingle key itself is an
    // engine-internal xxhash64, so the oracle replays the STRING-side
    // bucket sizes (1:1 with the hashed sets by construction).
    GraftQuery(
      "x86_truth_cap_audit",
      (s, dir) => {
        import s.implicits._
        graft.ops.Dedup.droppedShingles(
            Tables(s, dir, "documents"), "doc_id", "text", maxBucket = 5)
          .select($"n_docs")
      },
      Some(s"""$shingleCte,
        inv AS (SELECT doc_id, unnest(s) AS sh FROM nz)
        SELECT CAST(count(*) AS BIGINT) AS n_docs
        FROM inv GROUP BY sh HAVING count(*) > 5"""),
      notes = "string-side replay of the hashed inverted index's hot " +
        "buckets; multiset of bucket sizes (hash keys are engine-internal)"),

    // ---- per-source quality-gate calibration — the table that turns
    // x85's mean_quality into an actionable CUT: exact p10/p50/p90 of
    // the per-doc quality score WITHIN each source (x62 normalizes a
    // doc against its source; this prices the gate itself — "drop the
    // bottom decile of every source" reads its threshold per source
    // straight off q10). Exact, not approximate: the shared
    // Quantiles.exact histogram machinery (group per (source, rounded
    // score), one running-sum window over the domain-bounded
    // histogram, shared interpolation expressions) with its generated
    // oracle over the x07 score subquery — the interpolation
    // arithmetic is byte-identical on both engines by construction.
    GraftQuery(
      "x87_source_quality_quantiles",
      (s, dir) => {
        import s.implicits._
        graft.ops.Quantiles.exact(
          Tables(s, dir, "documents").select($"source",
            round(TextAnalysis.qualityScore($"text"), 6).as("quality")),
          Seq("source"), "quality",
          Seq("q10" -> 0.1, "q50" -> 0.5, "q90" -> 0.9))
      },
      Some(graft.ops.Quantiles.oracleSql(
        """(SELECT source, round(
             (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
             + (CASE WHEN n > 0 THEN nd / n ELSE 0.0 END) * 0.25
             + least(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END * 5.0, 1.0) * 0.25
             + (CASE WHEN chars > 0 THEN 1.0 - least(punct / chars * 5.0, 1.0)
                ELSE 0.0 END) * 0.25, 6) AS quality
           FROM (SELECT source,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n,
             CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) AS nd,
             CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
               x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                          'for','on','with','as','at','by','from','that','this'))) AS DOUBLE) AS stop,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
             CAST(length(text) AS DOUBLE) AS chars
           FROM documents))""",
        Seq("source"), "quality",
        Seq("q10" -> 0.1, "q50" -> 0.5, "q90" -> 0.9))),
      notes = "x07's score CTE feeding the shared exact-quantile replay " +
        "(q45/q46's generated oracle); per-source gate thresholds"),

    // ---- per-source language trust — x08's confusion sliced the way
    // acquisition reads it: does each source actually contain the
    // language its metadata claims? Per source: doc count, label-vs-
    // predicted agreement rate (x08's n-gram heuristic), and the
    // MAJORITY predicted language (argmax with lexicographic
    // tie-break) — a source whose top_pred_lang disagrees with its
    // label is mislabeled at the metadata level, which poisons every
    // lang-keyed mixing decision downstream. Two source-keyed aggs +
    // one #source-partition window; row-local scoring.
    GraftQuery(
      "x88_source_lang_trust",
      (s, dir) => {
        import s.implicits._
        val pred = Tables(s, dir, "documents")
          .select($"source", $"lang",
            TextAnalysis.langId($"text").as("lang_pred"))
        val agg = pred.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"lang" === $"lang_pred", 1L).otherwise(0L))
              .as("n_match"))
          .select($"source", $"n_docs", $"n_match",
            round($"n_match".cast("double") / $"n_docs", 6).as("agree_rate"))
        val top = pred.groupBy($"source", $"lang_pred")
          .agg(count(lit(1)).as("__n"))
          .withColumn("__rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"source").orderBy($"__n".desc, $"lang_pred")))
          .where($"__rk" === 1)
          .select($"source", $"lang_pred".as("top_pred_lang"))
        agg.join(top, "source")
      },
      Some("""WITH sc AS (SELECT source, lang,
          list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
          FROM documents),
        scores AS (SELECT source, lang,
          len(list_intersect(t, ['der','die','das','und','ist','nicht','ein','mit','von','zu'])) AS s_de,
          len(list_intersect(t, ['the','and','of','to','in','is','that','it','for','with'])) AS s_en,
          len(list_intersect(t, ['el','la','los','y','es','un','una','en','por','que'])) AS s_es,
          len(list_intersect(t, ['le','la','les','et','est','un','une','dans','pour','que'])) AS s_fr,
          len(list_intersect(t, ['de','shi','le','wo','ni','ta','zai','you','he','bu'])) AS s_zh
          FROM sc),
        pr AS (SELECT source, lang,
          CASE WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) <= 0 THEN 'und'
               WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
               WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
               WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
               WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
               ELSE 'zh' END AS lang_pred
          FROM scores),
        ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END) AS BIGINT)
              AS n_match,
            round(CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*), 6) AS agree_rate
          FROM pr GROUP BY source),
        tp AS (SELECT source, lang_pred AS top_pred_lang FROM (
            SELECT source, lang_pred, count(*) AS n,
              row_number() OVER (PARTITION BY source
                ORDER BY count(*) DESC, lang_pred) AS rk
            FROM pr GROUP BY source, lang_pred) WHERE rk = 1)
        SELECT ag.source, ag.n_docs, ag.n_match, ag.agree_rate,
          tp.top_pred_lang
        FROM ag JOIN tp USING (source)"""),
      notes = "x08's heuristic + decision rule verbatim, sliced per source; " +
        "majority prediction under (count desc, lang asc) — total order"),

    // ---- the health table ACTING on acquisition — x85 names the bad
    // sources, this composes the verdict into the mixing operators: a
    // planted re-crawl source (every doc a copy of src0's — novelty
    // ~0, dup_rate ~1 at ANY scale) and a planted fresh connector
    // slice (suffixed tokens — novel, clean, half-sized) join the
    // organic corpus; the gate zeroes out sources below HALF the
    // corpus's doc-weighted mean novelty or above 0.5 dup_rate
    // (relative floors — absolute novelty falls with corpus size),
    // and the survivors temperature-flatten (x76's verified n^0.5
    // recipe: the small fresh source keeps everything, the organic
    // head downsamples to match). The oracle replays the planting,
    // both verdict closures, the integer-exact gate, and the rate
    // arithmetic end to end.
    GraftQuery(
      "x89_health_gated_mix",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
          .select($"doc_id", $"text", $"source")
        val stride = docs.agg(max($"doc_id")).head().getLong(0) + 1L
        val recrawl = docs.where($"source" === "src0")
          .select(($"doc_id" + stride).as("doc_id"), $"text",
            lit("recrawl").as("source"))
        val connector = docs.where($"source" === "src0" && $"doc_id" % 2 === 0)
          .select(($"doc_id" + 2L * stride).as("doc_id"),
            array_join(transform(TextAnalysis.tokens($"text"),
              x => concat(x, lit("c1"))), " ").as("text"),
            lit("connector").as("source"))
        val corpus = docs.unionByName(recrawl).unionByName(connector)
        val fit = graft.ops.Bpe.fitCached(
          Tables(s, dir, "documents"), "text", nMerges = 16,
          OracleDump.bpePath(dir, 16),
          OracleDump.tableFingerprint(dir, "documents"))
        val kept = graft.ops.Acquisition.healthGatedMix(
          corpus, "doc_id", "text", "source", fit)
        kept.groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), sum($"doc_id").as("id_sum"))
          .join(corpus.groupBy($"source").agg(count(lit(1)).as("n_total")),
            "source")
          .select($"source", $"n_total", $"n_kept", $"id_sum")
      },
      Some("""WITH mx AS (SELECT max(doc_id) + 1 AS stride FROM documents),
        corpus AS (
          SELECT doc_id, text, source FROM documents
          UNION ALL
          SELECT d.doc_id + mx.stride, d.text, 'recrawl'
          FROM documents d, mx WHERE d.source = 'src0'
          UNION ALL
          SELECT d.doc_id + 2 * mx.stride,
            array_to_string(list_transform(
              regexp_extract_all(lower(d.text), '[a-z0-9]+'),
              x -> x || 'c1'), ' '),
            'connector'
          FROM documents d, mx WHERE d.source = 'src0' AND d.doc_id % 2 = 0),
        toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM corpus),
        nvz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 3),
        gg AS (SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id, array_to_string(t[gi : gi + 2], ' ') AS gram
            FROM nvz, unnest(range(1, n - 1)) AS u(gi))),
        firsts AS (SELECT gram, min(doc_id) AS first_doc
          FROM gg GROUP BY gram),
        pernov AS (SELECT gg.doc_id, count(*) AS ng,
            sum(CASE WHEN f.first_doc = gg.doc_id THEN 1 ELSE 0 END) AS nv
          FROM gg JOIN firsts f USING (gram) GROUP BY gg.doc_id),
        nov AS (SELECT c.source,
            round(CAST(sum(pernov.nv) AS DOUBLE) / sum(pernov.ng), 6)
              AS novelty
          FROM pernov JOIN corpus c USING (doc_id) GROUP BY c.source),
        dsh AS (SELECT doc_id,
            list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              FOR i IN range(1, greatest(len(t) - 1, 1))]) AS s FROM toks),
        dnz AS (SELECT * FROM dsh WHERE len(s) > 0),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM dnz a JOIN dnz b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        nodes AS (SELECT DISTINCT u AS id FROM edges),
        reach AS (
          WITH RECURSIVE r(id, lab) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.v, r.lab FROM r JOIN edges e ON e.u = r.id
          ) SELECT * FROM r),
        supp AS (SELECT id AS doc_id FROM reach GROUP BY id
          HAVING CAST(min(lab) AS BIGINT) <> id),
        dup AS (SELECT c.source,
            round(CAST(count(sp.doc_id) AS DOUBLE) / count(*), 6) AS dup_rate
          FROM corpus c LEFT JOIN supp sp USING (doc_id)
          GROUP BY c.source),
        nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM corpus GROUP BY source),
        hv AS (SELECT nd.source, nd.n, nov.novelty,
            COALESCE(dup.dup_rate, 0) AS dup_rate
          FROM nd LEFT JOIN nov USING (source) LEFT JOIN dup USING (source)),
        fl AS (SELECT CAST(round(0.5 *
              (CAST(sum(CAST(round(novelty * 1000000) AS BIGINT) * n)
                 AS DOUBLE) / sum(n)), 0) AS BIGINT) AS floor_micro
          FROM hv WHERE novelty IS NOT NULL),
        healthy AS (SELECT hv.source, hv.n FROM hv, fl
          WHERE hv.novelty IS NOT NULL
            AND CAST(round(hv.novelty * 1000000) AS BIGINT) >= fl.floor_micro
            AND hv.dup_rate <= 0.5),
        r2 AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM healthy),
        m2 AS (SELECT min(CAST(n AS DOUBLE) / w) AS mm FROM r2),
        t2 AS (SELECT source, n,
            CAST(floor(least(1.0, w * (SELECT mm FROM m2) / CAST(n AS DOUBLE))
              * 65536 + 0.5) AS INT) AS thr FROM r2)
        SELECT c.source, t2.n AS n_total, CAST(count(*) AS BIGINT) AS n_kept,
          CAST(sum(c.doc_id) AS BIGINT) AS id_sum
        FROM corpus c JOIN t2 ON c.source = t2.source
        WHERE CAST(('0x' || substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 4)) AS INT)
              < t2.thr
        GROUP BY c.source, t2.n"""),
      notes = "x85's novelty + keep-reps closures over the planted union, " +
        "the doc-weighted micro-unit novelty floor as exact integers, " +
        "x76's unnormalized rate algebra over the survivors — the verdict " +
        "table driving the mix, replayed end to end"),

    // ---- per-doc unigram Shannon entropy (nats) — the whole-
    // distribution repetitiveness signal (x79 reads the max share,
    // x22 reads n-gram repeats; this reads the full shape: template
    // spam scores low at ANY length). Tokenless docs keep a row with
    // NULL entropy. x30's decimal-grid discipline: per-word terms on
    // the 1e-9 grid, decimal sum, so the result is partition-order
    // independent on both engines.
    GraftQuery(
      "x90_token_entropy",
      (s, dir) => graft.ops.TextAnalysis.tokenEntropy(
        Tables(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          ex AS (SELECT doc_id, unnest(t) AS tok FROM toks WHERE len(t) > 0),
          cnt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
            FROM ex GROUP BY doc_id, tok),
          nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
            FROM cnt GROUP BY doc_id),
          ent AS (SELECT cnt.doc_id, max(nn.n) AS n_tokens,
              round(CAST(-sum(CAST(round(
                  (CAST(c AS DOUBLE) / nn.n) * ln(CAST(c AS DOUBLE) / nn.n),
                  9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
            FROM cnt JOIN nn ON cnt.doc_id = nn.doc_id
            GROUP BY cnt.doc_id)
          SELECT d.doc_id, COALESCE(ent.n_tokens, 0) AS n_tokens, ent.entropy
          FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id"""),
      notes = "decimal negated before the double cast on both engines " +
        "(no -0.0 hash hazard); single-word docs read exactly 0"),

    // ---- per-source unigram KL divergence from the corpus
    // distribution (nats) — the DISTRIBUTIONAL drift column the health
    // table lacks: a source can be 0-OOV and 0-novel (all common
    // words) and still skew the mix by proportion; KL prices that.
    // p=0 terms vanish and the corpus includes every source (q>0), so
    // no smoothing enters the sum. Tokenless sources keep a NULL-kl
    // row (x85's convention).
    GraftQuery(
      "x91_source_unigram_kl",
      (s, dir) => graft.ops.TextAnalysis.sourceUnigramKl(
        Tables(s, dir, "documents"), "doc_id", "text", "source"),
      Some("""WITH toks AS (SELECT source,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          ex AS (SELECT source, unnest(t) AS tok FROM toks WHERE len(t) > 0),
          tot AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM ex),
          g AS (SELECT tok, CAST(count(*) AS BIGINT) AS cg
            FROM ex GROUP BY tok),
          sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cs
            FROM ex GROUP BY source, tok),
          st AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns
            FROM sc GROUP BY source),
          kl AS (SELECT sc.source, max(st.ns) AS n_tokens,
              round(CAST(sum(CAST(round(
                  (CAST(cs AS DOUBLE) / st.ns) *
                  ln((CAST(cs AS DOUBLE) * tot.nt) /
                     (CAST(st.ns AS DOUBLE) * cg)), 9)
                AS DECIMAL(28,9))) AS DOUBLE), 6) AS kl
            FROM sc JOIN g USING (tok) JOIN st USING (source) CROSS JOIN tot
            GROUP BY sc.source),
          nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source)
          SELECT nd.source, nd.n_docs, COALESCE(kl.n_tokens, 0) AS n_tokens,
            kl.kl
          FROM nd LEFT JOIN kl USING (source)"""),
      notes = "terms only over words the source HAS (p=0 vanishes, " +
        "q>0 by inclusion — smoothing-free); 1e-9 grid + decimal sum"),

    // ---- per-source Population Stability Index of the x07 quality
    // score vs the corpus-global distribution over 10 fixed buckets on
    // [0,1] — "does this source's quality PROFILE match the corpus":
    // two sources with equal mean_quality, one bimodal junk+gems, read
    // identically in x85 but apart here (the standard drift metric:
    // <0.1 stable, >0.25 shifted). Absent cells enter at the 1e-6
    // floor; the score is exact integer ratios so bucketing is
    // bit-deterministic.
    GraftQuery(
      "x92_quality_psi",
      (s, dir) => graft.ops.TextAnalysis.qualityPsi(
        Tables(s, dir, "documents"), "doc_id", "text", "source"),
      Some("""WITH q AS (SELECT source,
            (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END) * 0.25
            + (CASE WHEN n > 0 THEN nd / n ELSE 0.0 END) * 0.25
            + least(CASE WHEN n > 0 THEN stop / n ELSE 0.0 END * 5.0, 1.0) * 0.25
            + (CASE WHEN chars > 0 THEN 1.0 - least(punct / chars * 5.0, 1.0)
               ELSE 0.0 END) * 0.25 AS quality
          FROM (SELECT source,
            CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) AS n,
            CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS DOUBLE) AS nd,
            CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
              x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                         'for','on','with','as','at','by','from','that','this'))) AS DOUBLE) AS stop,
            CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
            CAST(length(text) AS DOUBLE) AS chars
          FROM documents)),
          b AS (SELECT source,
            least(CAST(floor(quality * 10) AS INT), 9) AS bucket FROM q),
          tot AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM b),
          gb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nb
            FROM b GROUP BY bucket),
          sn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM b GROUP BY source),
          gr AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bucket),
          sb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS nsb
            FROM b GROUP BY source, bucket),
          grid AS (SELECT sn.source, sn.n_docs,
              greatest(CAST(COALESCE(sb.nsb, 0) AS DOUBLE) / sn.n_docs,
                1e-6) AS p,
              greatest(CAST(COALESCE(gb.nb, 0) AS DOUBLE) / tot.nt,
                1e-6) AS q2
            FROM sn CROSS JOIN gr
            LEFT JOIN sb ON sb.source = sn.source AND sb.bucket = gr.bucket
            LEFT JOIN gb ON gb.bucket = gr.bucket
            CROSS JOIN tot)
          SELECT source, max(n_docs) AS n_docs,
            round(CAST(sum(CAST(round((p - q2) * ln(p / q2), 9)
              AS DECIMAL(28,9))) AS DOUBLE), 6) AS psi
          FROM grid GROUP BY source"""),
      notes = "x07's score CTE verbatim; full #sources x 10 grid with " +
        "the epsilon floor so absent cells participate on both engines"),

    // ---- token-weighted temperature mix — the mixing family's unit
    // corrected for what a training run actually budgets: x76
    // flattens DOC counts, but a source of few long docs and a source
    // of many short ones hold identical token mass and x76 treats the
    // first as "small" (keeps all of it). Here the n^alpha recipe
    // runs over per-source TOKEN totals; the gate is the same
    // row-level md5 keep-rate. The oracle recomputes the totals, the
    // sqrt/min/div rate algebra (normalizer cancels — no cross-source
    // float sum), the 65536 threshold, and the kept doc/token masses.
    GraftQuery(
      "x93_token_weighted_mix",
      (s, dir) => {
        import s.implicits._
        val wdocs = Tables(s, dir, "documents")
          .select($"doc_id", $"source",
            TextAnalysis.nTokens($"text").cast("long").as("n_tok"))
        graft.ops.Sampling.weightedTemperatureSample(
            wdocs, "doc_id", "source", "n_tok", 0.5)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"),
            sum($"n_tok").as("tokens_kept"), sum($"doc_id").as("id_sum"))
          .join(wdocs.groupBy($"source")
            .agg(count(lit(1)).as("n_total"), sum($"n_tok").as("tokens_total")),
            "source")
          .select($"source", $"n_total", $"tokens_total", $"n_kept",
            $"tokens_kept", $"id_sum")
      },
      Some("""WITH tc AS (SELECT doc_id, source,
            CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
              AS n_tok
          FROM documents),
        c AS (SELECT source, CAST(count(*) AS BIGINT) AS nd,
            CAST(sum(n_tok) AS BIGINT) AS t
          FROM tc GROUP BY source),
        r AS (SELECT source, nd, t, sqrt(CAST(t AS DOUBLE)) AS w
          FROM c WHERE t > 0),
        m AS (SELECT min(CAST(t AS DOUBLE) / w) AS mm FROM r),
        thr AS (SELECT source, nd, t,
            CAST(floor(least(1.0, w * (SELECT mm FROM m) / CAST(t AS DOUBLE))
              * 65536 + 0.5) AS INT) AS thr FROM r)
        SELECT d.source, thr.nd AS n_total, thr.t AS tokens_total,
          CAST(count(*) AS BIGINT) AS n_kept,
          CAST(sum(d.n_tok) AS BIGINT) AS tokens_kept,
          CAST(sum(d.doc_id) AS BIGINT) AS id_sum
        FROM tc d JOIN thr ON d.source = thr.source
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INT)
              < thr.thr
        GROUP BY d.source, thr.nd, thr.t"""),
      notes = "x76's rate algebra verbatim over exact integer token " +
        "totals; zero-token sources drop from the rate table by rule"),

    // ---- per-source entropy calibration — x87's recipe applied to the
    // x90 signal: exact p10/p50/p90 of per-doc unigram entropy WITHIN
    // each source, the threshold table an entropy-based template/spam
    // gate reads per source ("drop the bottom entropy decile" needs its
    // cut per source — organic entropy levels differ by domain).
    // Tokenless docs (NULL entropy) are excluded from the distribution,
    // not counted as zeros. Shared Quantiles.exact machinery + its
    // generated oracle over the x90 entropy subquery.
    GraftQuery(
      "x94_source_entropy_quantiles",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Quantiles.exact(
          graft.ops.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
            .where($"entropy".isNotNull)
            .join(docs.select($"doc_id", $"source"), "doc_id")
            .select($"source", $"entropy"),
          Seq("source"), "entropy",
          Seq("q10" -> 0.1, "q50" -> 0.5, "q90" -> 0.9))
      },
      Some(graft.ops.Quantiles.oracleSql(
        """(SELECT d.source, e.entropy FROM documents d JOIN (
             SELECT c.doc_id,
               round(CAST(-sum(CAST(round(
                   (CAST(c.c AS DOUBLE) / n.n) *
                   ln(CAST(c.c AS DOUBLE) / n.n), 9)
                 AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
             FROM (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
                   FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                     FROM documents)
                   GROUP BY doc_id, tok) c
             JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                   FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                     FROM documents)
                   GROUP BY doc_id) n ON c.doc_id = n.doc_id
             GROUP BY c.doc_id) e ON d.doc_id = e.doc_id)""",
        Seq("source"), "entropy",
        Seq("q10" -> 0.1, "q50" -> 0.5, "q90" -> 0.9))),
      notes = "x90's entropy replay feeding the shared exact-quantile " +
        "oracle generator (x87's class); NULL-entropy docs excluded"),

    // ---- sliding-window repeated-substring suppression — the
    // ExactSubstr face passage dedup structurally misses: x32's
    // aligned passages let up to window-1 tokens of every copied span
    // survive at each boundary; the sliding form catches a repeat at
    // ANY offset, including within one document. First global
    // occurrence (min (doc, pos)) survives; every other occurrence's
    // positions drop and the doc rebuilds from what's left. The
    // oracle replays spans, first-occurrence attribution, coverage,
    // and reconstruction (ORDER BY pos string_agg ≡ the sorted-struct
    // array_join).
    GraftQuery(
      "x95_substring_dedup",
      (s, dir) => graft.ops.Dedup.substringDedup(
        Tables(s, dir, "documents"), "doc_id", "text", window = 8),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          w AS (SELECT doc_id, gi - 1 AS pos,
              array_to_string(t[gi : gi + 7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(gi)
            WHERE len(t) >= 8),
          f AS (SELECT gram, doc_id AS fdoc, pos AS fpos FROM (
              SELECT gram, doc_id, pos, row_number() OVER (
                PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM w)
            WHERE rk = 1),
          rep AS (SELECT w.doc_id, w.pos FROM w JOIN f USING (gram)
            WHERE NOT (w.doc_id = f.fdoc AND w.pos = f.fpos)),
          cov AS (SELECT DISTINCT doc_id, pos + u AS pos
            FROM rep, unnest(range(0, 8)) AS v(u)),
          tp AS (SELECT doc_id, gi - 1 AS pos, t[gi] AS tok
            FROM toks, unnest(range(1, len(t) + 1)) AS u(gi)),
          kept AS (SELECT tp.doc_id, tp.pos, tp.tok
            FROM tp LEFT JOIN cov
              ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
            WHERE cov.pos IS NULL),
          reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id)
          SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
            CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_dropped,
            COALESCE(reb.clean_text, '') AS clean_text
          FROM toks t LEFT JOIN reb ON t.doc_id = reb.doc_id"""),
      notes = "span key is the token 8-gram string for oracle parity; " +
        "production blocks on xxhash64(span) — same plan, 8-byte shuffle"),

    // ---- per-source substring-dup rate — x95 sliced the way
    // acquisition reads it (x84's recipe on the sliding-span verdict):
    // what fraction of each source's TOKEN mass is repeated spans.
    // x84 counts whole docs the near-dup pass suppresses; a source can
    // pass that (every doc "different") while half of every doc is the
    // same stamped template — this column bills exactly that. Token
    // fractions guarded for tokenless sources (NULL, the x85
    // convention).
    GraftQuery(
      "x96_source_substring_dup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.Dedup.substringDedup(docs, "doc_id", "text", window = 8)
          .join(docs.select($"doc_id", $"source"), "doc_id")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("n_tokens"),
            sum($"n_dropped").as("n_dropped"),
            when(sum($"n_tokens") > 0,
              round(sum($"n_dropped").cast("double") / sum($"n_tokens"), 6))
              .as("dup_token_frac"))
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          w AS (SELECT doc_id, gi - 1 AS pos,
              array_to_string(t[gi : gi + 7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(gi)
            WHERE len(t) >= 8),
          f AS (SELECT gram, doc_id AS fdoc, pos AS fpos FROM (
              SELECT gram, doc_id, pos, row_number() OVER (
                PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM w)
            WHERE rk = 1),
          rep AS (SELECT w.doc_id, w.pos FROM w JOIN f USING (gram)
            WHERE NOT (w.doc_id = f.fdoc AND w.pos = f.fpos)),
          cov AS (SELECT DISTINCT doc_id, pos + u AS pos
            FROM rep, unnest(range(0, 8)) AS v(u)),
          dropped AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_drop
            FROM cov GROUP BY doc_id),
          perdoc AS (SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
              COALESCE(dropped.n_drop, 0) AS n_dropped
            FROM toks t LEFT JOIN dropped ON t.doc_id = dropped.doc_id)
          SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(p.n_dropped) AS BIGINT) AS n_dropped,
            CASE WHEN sum(p.n_tokens) > 0 THEN
              round(CAST(sum(p.n_dropped) AS DOUBLE) / sum(p.n_tokens), 6)
            END AS dup_token_frac
          FROM perdoc p JOIN documents d ON p.doc_id = d.doc_id
          GROUP BY d.source"""),
      notes = "x95's coverage closure re-aggregated per source; " +
        "n_dropped = covered-position count (no reconstruction needed)"),

    // ---- incremental substring dedup — x95's day-2 face (x33's
    // recipe for the sliding-span family): the corpus's distinct spans
    // persist once as a bucketed index, the batch probes it with ONE
    // equi join on the span key (a committed span covers every batch
    // occurrence — the corpus owns its first occurrence), fresh spans
    // fall back to first-wins within the batch. Corpus ids < batch
    // ids, so the oracle replays the ONE-SHOT x95 closure over
    // corpus ∪ batch restricted to batch docs — the same differential
    // identity the spec pins for the incremental passage face.
    GraftQuery(
      "x97_incremental_substring_dedup",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val path = s"${sys.props("java.io.tmpdir")}/graft-spanidx-${OracleDump.sfTag(dir)}"
        val marker = new java.io.File(
          s"$path/_INDEX_OK_v1_${OracleDump.tableFingerprint(dir, "documents")}")
        if (!marker.exists()) {
          // hashed = false EXPLICITLY (r20, the default is now the
          // production hashed keying): x97 is the ORACLE-PARITY face —
          // the committed index stores the string spans DuckDB replays
          graft.ops.Dedup.writeSpanIndex(docs.filter($"doc_id" < 250),
            "doc_id", "text", window = 8, path, hashed = false)
          marker.createNewFile(): Unit
        }
        graft.ops.Dedup.incrementalSubstringDedup(
          docs.filter($"doc_id" >= 250), path, "doc_id", "text", window = 8,
          hashed = false)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          w AS (SELECT doc_id, gi - 1 AS pos,
              array_to_string(t[gi : gi + 7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(gi)
            WHERE len(t) >= 8),
          f AS (SELECT gram, doc_id AS fdoc, pos AS fpos FROM (
              SELECT gram, doc_id, pos, row_number() OVER (
                PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM w)
            WHERE rk = 1),
          rep AS (SELECT w.doc_id, w.pos FROM w JOIN f USING (gram)
            WHERE w.doc_id >= 250
              AND NOT (w.doc_id = f.fdoc AND w.pos = f.fpos)),
          cov AS (SELECT DISTINCT doc_id, pos + u AS pos
            FROM rep, unnest(range(0, 8)) AS v(u)),
          tp AS (SELECT doc_id, gi - 1 AS pos, t[gi] AS tok
            FROM toks, unnest(range(1, len(t) + 1)) AS u(gi)
            WHERE doc_id >= 250),
          kept AS (SELECT tp.doc_id, tp.pos, tp.tok
            FROM tp LEFT JOIN cov
              ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
            WHERE cov.pos IS NULL),
          reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id)
          SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
            CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_dropped,
            COALESCE(reb.clean_text, '') AS clean_text
          FROM toks t LEFT JOIN reb ON t.doc_id = reb.doc_id
          WHERE t.doc_id >= 250"""),
      notes = "one-shot x95 closure over corpus ∪ batch restricted to " +
        "batch docs ≡ the incremental probe when corpus ids precede " +
        "batch ids — the x33 differential identity"),

    // ---- production-keyed substring dedup — x95 with the shuffle key
    // the 100 TB deployment actually moves: the span frame projects
    // xxhash64(span) and drops the text BEFORE anything shuffles, so
    // the first-occurrence agg and the repeat join exchange 8-byte
    // longs instead of window-token strings (~10× less shuffle I/O at
    // window=8). Output is identical to x95 absent a 64-bit collision
    // — none at any test SF, so the oracle is x95's verbatim; the
    // differential spec additionally pins x98 ≡ x95 row-for-row, and
    // the plan spec pins that no string-typed span survives to an
    // Exchange.
    GraftQuery(
      "x98_substring_dedup_hashed",
      (s, dir) => graft.ops.Dedup.substringDedupHashed(
        Tables(s, dir, "documents"), "doc_id", "text", window = 8),
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          w AS (SELECT doc_id, gi - 1 AS pos,
              array_to_string(t[gi : gi + 7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(gi)
            WHERE len(t) >= 8),
          f AS (SELECT gram, doc_id AS fdoc, pos AS fpos FROM (
              SELECT gram, doc_id, pos, row_number() OVER (
                PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM w)
            WHERE rk = 1),
          rep AS (SELECT w.doc_id, w.pos FROM w JOIN f USING (gram)
            WHERE NOT (w.doc_id = f.fdoc AND w.pos = f.fpos)),
          cov AS (SELECT DISTINCT doc_id, pos + u AS pos
            FROM rep, unnest(range(0, 8)) AS v(u)),
          tp AS (SELECT doc_id, gi - 1 AS pos, t[gi] AS tok
            FROM toks, unnest(range(1, len(t) + 1)) AS u(gi)),
          kept AS (SELECT tp.doc_id, tp.pos, tp.tok
            FROM tp LEFT JOIN cov
              ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
            WHERE cov.pos IS NULL),
          reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id)
          SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
            CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_dropped,
            COALESCE(reb.clean_text, '') AS clean_text
          FROM toks t LEFT JOIN reb ON t.doc_id = reb.doc_id"""),
      notes = "x95's oracle verbatim: the hashed keying is collision-free " +
        "at test SFs by construction, so the closures coincide — the " +
        "oracle checks the DEDUP result, DedupSpec pins the x98 ≡ x95 " +
        "identity and PlanSpec the 8-byte shuffle key"),

    // ---- hash-keyed PERSISTED span index — x97's day-2 probe with
    // x98's production keying on the artifact that lives forever: the
    // committed index stores xxhash64 span keys (8 bytes/row instead
    // of ~50-byte window-token strings — at 100 TB the INDEX, not the
    // transient probe, is where the bytes bill), and every probe
    // exchange against it moves longs. Output ≡ x97 absent a 64-bit
    // collision (none at any test SF), so the oracle is x97's
    // verbatim; DedupSpec pins the hashed ≡ text-keyed differential
    // across write/probe/append and PlanSpec pins the L-suffix keying
    // on the probe's span exchanges.
    GraftQuery(
      "x99_incremental_substring_hashed",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        val path = s"${sys.props("java.io.tmpdir")}/graft-spanidxh-${OracleDump.sfTag(dir)}"
        val marker = new java.io.File(
          s"$path/_INDEX_OK_v1_${OracleDump.tableFingerprint(dir, "documents")}")
        if (!marker.exists()) {
          graft.ops.Dedup.writeSpanIndex(docs.filter($"doc_id" < 250),
            "doc_id", "text", window = 8, path, hashed = true)
          marker.createNewFile(): Unit
        }
        graft.ops.Dedup.incrementalSubstringDedup(
          docs.filter($"doc_id" >= 250), path, "doc_id", "text", window = 8,
          hashed = true)
      },
      Some("""WITH toks AS (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
          w AS (SELECT doc_id, gi - 1 AS pos,
              array_to_string(t[gi : gi + 7], ' ') AS gram
            FROM toks, unnest(range(1, len(t) - 6)) AS u(gi)
            WHERE len(t) >= 8),
          f AS (SELECT gram, doc_id AS fdoc, pos AS fpos FROM (
              SELECT gram, doc_id, pos, row_number() OVER (
                PARTITION BY gram ORDER BY doc_id, pos) AS rk FROM w)
            WHERE rk = 1),
          rep AS (SELECT w.doc_id, w.pos FROM w JOIN f USING (gram)
            WHERE w.doc_id >= 250
              AND NOT (w.doc_id = f.fdoc AND w.pos = f.fpos)),
          cov AS (SELECT DISTINCT doc_id, pos + u AS pos
            FROM rep, unnest(range(0, 8)) AS v(u)),
          tp AS (SELECT doc_id, gi - 1 AS pos, t[gi] AS tok
            FROM toks, unnest(range(1, len(t) + 1)) AS u(gi)
            WHERE doc_id >= 250),
          kept AS (SELECT tp.doc_id, tp.pos, tp.tok
            FROM tp LEFT JOIN cov
              ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
            WHERE cov.pos IS NULL),
          reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id)
          SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
            CAST(len(t.t) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_dropped,
            COALESCE(reb.clean_text, '') AS clean_text
          FROM toks t LEFT JOIN reb ON t.doc_id = reb.doc_id
          WHERE t.doc_id >= 250"""),
      notes = "x97's oracle verbatim: the hashed index keying is " +
        "collision-free at test SFs, so the probes coincide — the " +
        "oracle checks the dedup result, DedupSpec the hashed ≡ " +
        "text-keyed family differential, PlanSpec the 8-byte probe key")
  )

  /** DuckDB model CTE for the DSIR queries — unigram+bigram features
    * hashed to 1024 buckets via md5-prefix (the [[graft.ops.Dsir]]
    * rule), add-1-smoothed target/raw distributions, per-bucket
    * log-ratio on the 10⁻⁹ decimal grid. Target = doc_id % 5 = 0.
    */
  private def dsirWeightsCte =
    """WITH toks AS (SELECT doc_id,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      gr AS (SELECT doc_id, unnest(list_concat(t,
          [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))])) AS g FROM toks),
      bk AS (SELECT doc_id, CAST(('0x' || substr(md5(g), 1, 4)) AS INT) % 1024 AS f
             FROM gr),
      qc AS (SELECT f, CAST(count(*) AS BIGINT) AS n FROM bk
             WHERE doc_id % 5 <> 0 GROUP BY f),
      pc AS (SELECT f, CAST(count(*) AS BIGINT) AS np FROM bk
             WHERE doc_id % 5 = 0 GROUP BY f),
      tot AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM qc) AS rtot,
          (SELECT CAST(count(*) AS DOUBLE) FROM bk WHERE doc_id % 5 = 0) AS ttot),
      lr AS (SELECT qc.f,
          CAST(round(ln((COALESCE(pc.np, 0) + 1.0) / (tot.ttot + 1024))
            - ln((qc.n + 1.0) / (tot.rtot + 1024)), 9) AS DECIMAL(12,9)) AS lr
         FROM qc LEFT JOIN pc USING (f) CROSS JOIN tot),
      pd AS (SELECT doc_id, f, CAST(count(*) AS DECIMAL(10,0)) AS c FROM bk
             WHERE doc_id % 5 <> 0 GROUP BY doc_id, f)
    """
}
