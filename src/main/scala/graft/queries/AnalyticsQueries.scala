package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Ivf
import graft.sources.Tables

/** Reshaping + vector-analytics queries: pivot/unpivot, per-label
  * embedding centroids, IVF approximate search.
  */
object AnalyticsQueries {

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  val all: Seq[GraftQuery] = Seq(

    // ---- pivot: event counts per user as columns. Explicit value list
    // keeps the schema static (a values-scan at 100 TB would need a
    // full pass first).
    GraftQuery(
      "a01_pivot",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy($"user_id")
          .pivot("event_type", eventTypes)
          .agg(count(lit(1)))
          .na.fill(0, eventTypes)
      },
      Some(s"""SELECT user_id,
        ${eventTypes.map(t => s"count(*) FILTER (WHERE event_type = '$t') AS $t")
          .mkString(", ")}
        FROM events GROUP BY user_id""")),

    // ---- unpivot (melt): wide customer metrics to long form.
    GraftQuery(
      "a02_unpivot",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "customer")
          .select($"c_custkey", $"c_acctbal",
            $"c_nationkey".cast("double").as("c_nation_d"))
          .unpivot(Array($"c_custkey"), Array($"c_acctbal", $"c_nation_d"),
            "metric", "value")
      },
      Some("""SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
        UNION ALL
        SELECT c_custkey, 'c_nation_d' AS metric, CAST(c_nationkey AS DOUBLE) FROM customer""")),

    // ---- per-label embedding centroids via posexplode + exact decimal
    // mean per dimension (the relational formulation; VectorAggSpec
    // proves the typed Aggregator computes the same centroids).
    GraftQuery(
      "a03_label_centroids",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "embeddings")
          .select($"label", posexplode($"embedding").as(Seq("dim", "x")))
          .groupBy($"label", $"dim")
          .agg((sum($"x".cast(DecimalType(18, 8))).cast("double") / count(lit(1)))
            .as("centroid"))
      },
      // NB: the oracle widens FLOAT→DOUBLE before the decimal cast;
      // DuckDB's direct FLOAT→DECIMAL scales in float precision and
      // loses the 8th decimal, while Spark casts via double.
      Some("""SELECT label, CAST(pos - 1 AS INT) AS dim,
          CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS centroid
        FROM (SELECT label, unnest(embedding) AS x,
              generate_subscripts(embedding, 1) AS pos FROM embeddings)
        GROUP BY label, dim""")),

    // ---- IVF approximate top-k (KMeans cells + nprobe search). The
    // index is a PERSISTED table partitioned by cluster — the probe's
    // scan shows PartitionFilters and reads nprobe/k of the corpus.
    GraftQuery(
      "a04_sim_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val index = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        Ivf.topK(index, e.filter($"vec_id" === 0L), "vec_id", "embedding", k = 50)
      },
      // the KMeans fit is not SQL-portable, but the PERSISTED index is
      // data: the oracle reads centroids + the cluster-partitioned
      // assigned table and replays the probe selection (nprobe=4
      // nearest cells by centroid EUCLIDEAN distance — the metric the
      // cells were built with) and the exact cosine re-rank
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
        probes AS (SELECT cluster FROM cents CROSS JOIN q
          ORDER BY list_distance(centroid, qv) ASC, cluster LIMIT 4),
        a AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1))
        SELECT a.vec_id,
          round(list_cosine_similarity(
            list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) AS cos_sim
        FROM a JOIN probes p ON a.cluster = p.cluster CROSS JOIN q
        ORDER BY cos_sim DESC, a.vec_id LIMIT 50"""),
      notes = "oracle replays probe selection + re-rank over the persisted index"),

    // ---- IVF-PQ-style probe over the int8 face of the same persisted
    // index: the `assigned_int8` table stores each vector symmetrically
    // quantized (q_i = clamp(round(x_i·127/max|x|))) in the identical
    // cluster= layout, so the probe prunes the same partitions while
    // reading ~4× fewer bytes per cell — the face a scan-bandwidth-
    // bound 100 TB probe actually reads. Cosine over q needs no scale
    // (dequantization is a positive scalar — cosine is scale-
    // invariant); the stored qvec is plain data, so the oracle reads
    // it back and replays probe + re-rank exactly.
    GraftQuery(
      "a05_sim_ivfpq_topk",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        Ivf.buildPersistentCached(e, path, "vec_id", "embedding", k = 16): Unit
        Ivf.quantizeAssigned(s, path, "vec_id", "embedding")
        Ivf.topKInt8(s, path, e.filter($"vec_id" === 0L),
          "vec_id", "embedding", k = 50)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
        probes AS (SELECT cluster FROM cents CROSS JOIN q
          ORDER BY list_distance(centroid, qv) ASC, cluster LIMIT 4),
        a AS (SELECT vec_id, qvec, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_int8/*/*.parquet',
                            hive_partitioning = 1))
        SELECT a.vec_id,
          round(list_cosine_similarity(
            list_transform(a.qvec, x -> CAST(x AS DOUBLE)), q.qv), 6) AS cos_sim
        FROM a JOIN probes p ON a.cluster = p.cluster CROSS JOIN q
        ORDER BY cos_sim DESC, a.vec_id LIMIT 50"""),
      notes = "oracle replays probe selection + re-rank over the stored int8 face"),

    // ---- batched ANN over the same persisted index: top-k per query
    // for a WORK LIST (the production retrieval shape — request
    // batches, eval suites). Probes are computed at plan time from the
    // driver-known query list, so the cell filter stays STATIC
    // (partition pruning survives batching); the ≤ Q·nprobe
    // (query, cell) pairs broadcast into an equi-join, and per-query
    // ranking is a keyed window (WindowGroupLimit) — no global sort.
    GraftQuery(
      "a06_sim_ivf_batch",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val index = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        Ivf.topKBatch(index, e.filter($"vec_id" % 97 === 0L),
          "vec_id", "embedding", "vec_id", k = 10)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 4),
        a AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        scored AS (SELECT p.query_id, a.vec_id,
            round(list_cosine_similarity(
              list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) AS cos_sim
          FROM a JOIN probes p ON a.cluster = p.cluster
          JOIN q ON q.query_id = p.query_id)
        SELECT query_id, vec_id, cos_sim FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, vec_id) AS rk FROM scored)
        WHERE rk <= 10"""),
      notes = "per-query replay of a04's probe + re-rank; rank on the rounded value"),

    // ---- ANN recall report: per query, how much of the brute-force
    // top-k the IVF probe recovers — the quality gauge that belongs
    // NEXT TO an approximate index (recall drift after appends or a
    // centroid rebuild is the production alarm). ANN side = a06's
    // batched probe; ground truth = one broadcast-queries pass over
    // the corpus (Similarity.bruteForceTopKBatch — the corpus is never
    // shuffled); recall = |ANN ∩ BF| / |BF| per query. At 100 TB the
    // BF side runs on a SAMPLE of queries by construction (the query
    // list is driver-small) — the corpus pass is one scan either way.
    GraftQuery(
      "a07_ann_recall",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter($"vec_id" % 97 === 0L)
        val index = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        val ann = Ivf.topKBatch(index, queries,
          "vec_id", "embedding", "vec_id", k = 10)
          .select($"query_id", $"vec_id")
        val bf = graft.ops.Similarity.bruteForceTopKBatch(e, queries,
          "vec_id", "embedding", "vec_id", k = 10)
          .select($"query_id", $"vec_id")
        bf.join(ann.withColumn("__hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy($"query_id")
          .agg(count(lit(1)).as("n_bf"),
            count($"__hit").as("n_hit"),
            round(count($"__hit").cast("double") / count(lit(1)), 6)
              .as("recall"))
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 4),
        a AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        ann AS (SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
              row_number() OVER (PARTITION BY p.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                a.vec_id) AS rk
            FROM a JOIN probes p ON a.cluster = p.cluster
            JOIN q ON q.query_id = p.query_id) WHERE rk <= 10),
        bf AS (SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM embeddings e CROSS JOIN q) WHERE rk <= 10)
        SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(a.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM bf b LEFT JOIN ann a
          ON a.query_id = b.query_id AND a.vec_id = b.vec_id
        GROUP BY b.query_id"""),
      notes = "ANN side ≡ a06's replay; BF side ranks the whole corpus per query on the rounded cosine"),

    // ---- nprobe tuning sweep: micro-averaged recall@k per nprobe over
    // the same query list — the table an operator reads to pick the
    // recall/cost point before raising nprobe corpus-wide. One BF
    // ground-truth pass (staged, shared across all probe settings);
    // each ANN side is a06's plan at a different static partition
    // filter. Micro-average (Σhit/Σbf) keeps the aggregation in exact
    // integer sums — no order-dependent double accumulation.
    GraftQuery(
      "a08_ann_nprobe_sweep",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val queries = e.filter($"vec_id" % 97 === 0L)
        val index = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        val bf = graft.ops.Staged(
          graft.ops.Similarity.bruteForceTopKBatch(e, queries,
            "vec_id", "embedding", "vec_id", k = 10)
            .select($"query_id", $"vec_id"))
        Seq(1, 2, 4).map { np =>
          val ann = Ivf.topKBatch(index, queries,
            "vec_id", "embedding", "vec_id", k = 10, nprobe = np)
            .select($"query_id", $"vec_id")
          bf.join(ann.withColumn("__hit", lit(1)),
              Seq("query_id", "vec_id"), "left")
            .agg(count(lit(1)).as("n_bf"), count($"__hit").as("n_hit"))
            .select(lit(np).as("nprobe"), $"n_bf", $"n_hit",
              round($"n_hit".cast("double") / $"n_bf", 6).as("recall"))
        }.reduce(_ unionByName _)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id % 97 = 0),
        ranked_cells AS (SELECT q.query_id, c.cluster,
            row_number() OVER (PARTITION BY q.query_id
              ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
          FROM cents c CROSS JOIN q),
        a AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        np AS (SELECT unnest([1, 2, 4]) AS nprobe),
        ann AS (SELECT nprobe, query_id, vec_id FROM (
            SELECT np.nprobe, p.query_id, a.vec_id,
              row_number() OVER (PARTITION BY np.nprobe, p.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                a.vec_id) AS rk
            FROM np JOIN ranked_cells p ON p.pr <= np.nprobe
            JOIN a ON a.cluster = p.cluster
            JOIN q ON q.query_id = p.query_id) WHERE rk <= 10),
        bf AS (SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM embeddings e CROSS JOIN q) WHERE rk <= 10)
        SELECT np.nprobe, CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(ann.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(ann.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM np CROSS JOIN bf b LEFT JOIN ann
          ON ann.nprobe = np.nprobe AND ann.query_id = b.query_id
          AND ann.vec_id = b.vec_id
        GROUP BY np.nprobe"""),
      notes = "a07's recall per nprobe in {1,2,4}; micro-averaged (exact integer sums)"),

    // ---- int8-vs-float probe agreement: per query, how much of the
    // float probe's top-k the stored int8 face reproduces at the SAME
    // cells (batchProbe is shared, so the gap measures exactly the
    // quantization effect, never probe drift) — the QC table that
    // decides whether the 4×-smaller face is safe to serve. Both sides
    // are a06's plan shape; the int8 side reads assigned_int8.
    GraftQuery(
      "a09_ann_int8_agreement",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        Ivf.quantizeAssigned(s, path, "vec_id", "embedding")
        val queries = e.filter($"vec_id" % 97 === 0L)
        val fl = Ivf.topKBatch(index, queries,
          "vec_id", "embedding", "vec_id", k = 10)
          .select($"query_id", $"vec_id")
        val i8 = Ivf.topKInt8Batch(index, path, queries,
          "vec_id", "embedding", "vec_id", k = 10)
          .select($"query_id", $"vec_id")
        fl.join(i8.withColumn("__hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy($"query_id")
          .agg(count(lit(1)).as("n_float"),
            count($"__hit").as("n_agree"),
            round(count($"__hit").cast("double") / count(lit(1)), 6)
              .as("agreement"))
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 4),
        af AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        a8 AS (SELECT vec_id, qvec, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_int8/*/*.parquet',
                            hive_partitioning = 1)),
        fl AS (SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
              row_number() OVER (PARTITION BY p.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                a.vec_id) AS rk
            FROM af a JOIN probes p ON a.cluster = p.cluster
            JOIN q ON q.query_id = p.query_id) WHERE rk <= 10),
        i8 AS (SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
              row_number() OVER (PARTITION BY p.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(a.qvec, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                a.vec_id) AS rk
            FROM a8 a JOIN probes p ON a.cluster = p.cluster
            JOIN q ON q.query_id = p.query_id) WHERE rk <= 10)
        SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_float,
          CAST(count(i.vec_id) AS BIGINT) AS n_agree,
          round(CAST(count(i.vec_id) AS DOUBLE) / count(*), 6) AS agreement
        FROM fl f LEFT JOIN i8 i
          ON i.query_id = f.query_id AND i.vec_id = f.vec_id
        GROUP BY f.query_id"""),
      notes = "both sides replay a06's probe; the int8 side re-ranks the stored qvec"),

    // ---- product-quantization ADC probe over the same persisted
    // index: vectors stored as m=4 one-byte codebook codes (64× fewer
    // vector bytes than the float face, 16× fewer than int8), ranked
    // by the exact cosine of the query against each vector's PQ
    // RECONSTRUCTION — scored as m lookups into two per-query LUTs
    // (dot(q_sub, c), ‖c‖²), never by decoding vectors. Probe-cell
    // selection is the shared Ivf.probeCells, so the three faces
    // (float / int8 / pq) cannot drift. Codes and codebooks are DATA
    // (a05's philosophy): the oracle reads both back and replays the
    // LUT build + ADC arithmetic; the encode argmin itself is
    // spec-pinned exactly (planted codebooks, tie → lower code).
    GraftQuery(
      "a10_pq_adc_topk",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        Ivf.buildPersistentCached(e, path, "vec_id", "embedding", k = 16): Unit
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        graft.ops.Pq.topKPq(s, path, e.filter($"vec_id" === 7L),
          "vec_id", "embedding", k = 50)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id = 7),
        probes AS (SELECT cluster FROM cents CROSS JOIN q
          ORDER BY list_distance(centroid, qv) ASC, cluster LIMIT 4),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        a AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        parts AS (SELECT a.vec_id, a.cluster, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster CROSS JOIN q
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        agg AS (SELECT vec_id, cluster,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY vec_id, cluster)
        SELECT g.vec_id,
          round((list_inner_product(q.qv, c.centroid) + g.sdot) /
            (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid) + g.scr)),
            6) AS cos_adc
        FROM agg g JOIN cents c ON c.cluster = g.cluster CROSS JOIN q
        WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0
        ORDER BY cos_adc DESC, g.vec_id LIMIT 50"""),
      notes = "oracle replays probe + the residual-ADC cosine (centroid + " +
        "codebook parts) over the dumped centroids, codebooks, and codes"),

    // ---- pq-vs-float probe agreement: per query, how much of the
    // float probe's top-k the 64×-smaller PQ face reproduces at the
    // SAME cells (batchProbe shared — the gap is pure reconstruction
    // error, never probe drift) — a09's methodology applied to the
    // most aggressive face. The go/no-go table for a staged serving
    // pipeline (PQ candidates → exact re-rank): low agreement says
    // raise k on the PQ stage before re-ranking, not serve it raw.
    GraftQuery(
      "a11_ann_pq_agreement",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        val queries = e.filter($"vec_id" % 97 === 0L)
        val fl = Ivf.topKBatch(index, queries,
          "vec_id", "embedding", "vec_id", k = 10)
          .select($"query_id", $"vec_id")
        val pq = graft.ops.Pq.topKPqBatch(s, path, index, queries,
          "vec_id", "embedding", "vec_id", k = 10)
          .select($"query_id", $"vec_id")
        fl.join(pq.withColumn("__hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
          .groupBy($"query_id")
          .agg(count(lit(1)).as("n_float"),
            count($"__hit").as("n_pq_agree"),
            round(count($"__hit").cast("double") / count(lit(1)), 6)
              .as("agreement"))
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 4),
        af AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        apq AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        fl AS (SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
              row_number() OVER (PARTITION BY p.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                a.vec_id) AS rk
            FROM af a JOIN probes p ON a.cluster = p.cluster
            JOIN q ON q.query_id = p.query_id) WHERE rk <= 10),
        parts AS (SELECT p.query_id, a.vec_id, a.cluster, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM apq a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster
          JOIN q ON q.query_id = p.query_id
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        pqagg AS (SELECT query_id, vec_id, cluster,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY query_id, vec_id, cluster),
        pqs AS (SELECT query_id, vec_id FROM (
            SELECT g.query_id, g.vec_id,
              row_number() OVER (PARTITION BY g.query_id ORDER BY
                round((list_inner_product(q.qv, c.centroid) + g.sdot) /
                  (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid)
                    + g.scr)), 6) DESC, g.vec_id) AS rk
            FROM pqagg g JOIN cents c ON c.cluster = g.cluster
            JOIN q ON q.query_id = g.query_id
            WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0)
          WHERE rk <= 10)
        SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_float,
          CAST(count(p.vec_id) AS BIGINT) AS n_pq_agree,
          round(CAST(count(p.vec_id) AS DOUBLE) / count(*), 6) AS agreement
        FROM fl f LEFT JOIN pqs p
          ON p.query_id = f.query_id AND p.vec_id = f.vec_id
        GROUP BY f.query_id"""),
      notes = "float side replays a06's probe; pq side replays the two-LUT ADC " +
        "over the dumped codebooks at the SAME probed cells"),

    // ---- staged retrieval: PQ candidates → exact float re-rank — the
    // serving pipeline the compressed face exists FOR (a11's agreement
    // table says raw PQ@10 loses ~60% on this fixture; this query
    // shows the cure): stage 1 scans m bytes/vector over the probed
    // cells for 5× the final k, stage 2 reads full floats for ONLY
    // those candidates — from the index's CLUSTER-PRUNED float face,
    // never the full corpus table (Pq.topKStaged; a full-corpus float
    // scan in the re-rank would defeat the compressed face at 100 TB).
    // `in_direct` marks overlap with the direct float probe's top-10 —
    // the recovery scoreboard (how much of the expensive answer the
    // cheap pipeline reproduces, on the PQ-worst-case fixture).
    GraftQuery(
      "a12_ann_staged_rerank",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        val q = e.filter($"vec_id" === 7L)
        val staged = graft.ops.Pq.topKStaged(s, path, q,
          "vec_id", "embedding", k = 10, kCand = 50)
        val direct = Ivf.topK(index, q, "vec_id", "embedding", k = 10)
          .select($"vec_id", lit(1).as("__d"))
        staged.join(direct, Seq("vec_id"), "left")
          .select($"vec_id", $"cos_sim",
            coalesce($"__d", lit(0)).as("in_direct"))
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id = 7),
        probes AS (SELECT cluster FROM cents CROSS JOIN q
          ORDER BY list_distance(centroid, qv) ASC, cluster LIMIT 4),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        apq AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        parts AS (SELECT a.vec_id, a.cluster, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM apq a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster CROSS JOIN q
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        agg AS (SELECT vec_id, cluster,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY vec_id, cluster),
        cand AS (SELECT g.vec_id FROM agg g
          JOIN cents c ON c.cluster = g.cluster CROSS JOIN q
          WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0
          ORDER BY round((list_inner_product(q.qv, c.centroid) + g.sdot) /
            (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid) + g.scr)),
            6) DESC, g.vec_id LIMIT 50),
        staged AS (SELECT e.vec_id,
            round(list_cosine_similarity(
              list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6)
              AS cos_sim
          FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
          ORDER BY cos_sim DESC, e.vec_id LIMIT 10),
        af AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        direct AS (SELECT a.vec_id FROM af a JOIN probes p ON a.cluster = p.cluster
          CROSS JOIN q
          ORDER BY round(list_cosine_similarity(
            list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
            a.vec_id LIMIT 10)
        SELECT s.vec_id, s.cos_sim,
          CAST(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
            AS in_direct
        FROM staged s LEFT JOIN direct d USING (vec_id)"""),
      notes = "stage 1 = a10's ADC top-50 replay; stage 2 = exact cosine over " +
        "only those candidates; direct = a04's probe top-10 for the overlap flag"),

    // ---- staged recall report, batched: the go/no-go table for
    // serving the 64×-smaller PQ face. ONE brute-force ground-truth
    // pass over the a06 query sample (the a08 discipline), then
    // micro-averaged recall@10 for the three serving options — the
    // float probe (what full-fidelity IVF returns), the raw PQ probe
    // (a11's face, served unre-ranked), and the staged pipeline
    // (batched PQ top-50 → cluster-pruned exact float re-rank,
    // Pq.topKStagedBatch). Cell selection is Ivf.batchProbe on every
    // face, so the three rows differ only in what gets scored: the
    // table reads directly as "staging recovers what raw PQ loses at
    // the same bytes scanned in stage 1". Micro-average = exact
    // integer Σhit/Σbf, no order-dependent float accumulation.
    GraftQuery(
      "a13_ann_staged_recall",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        val queries = e.filter($"vec_id" % 97 === 0L)
        val bf = graft.ops.Staged(
          graft.ops.Similarity.bruteForceTopKBatch(e, queries,
            "vec_id", "embedding", "vec_id", k = 10)
            .select($"query_id", $"vec_id"))
        def recallOf(face: String,
            ann: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
          bf.join(ann.select($"query_id", $"vec_id")
              .withColumn("__hit", lit(1)),
              Seq("query_id", "vec_id"), "left")
            .agg(count(lit(1)).as("n_bf"), count($"__hit").as("n_hit"))
            .select(lit(face).as("face"), $"n_bf", $"n_hit",
              round($"n_hit".cast("double") / $"n_bf", 6).as("recall"))
        val fl = Ivf.topKBatch(index, queries,
          "vec_id", "embedding", "vec_id", k = 10)
        // pq_raw and staged share ONE candidate frame (a14's plan):
        // the raw face is the adc_rank <= 10 cut, staged the exact
        // re-rank of all 50 — one ADC pass + one pruned float pass
        val (sc0, qidOut) = graft.ops.Pq.stagedCandidates(s, path, index,
          queries, "vec_id", "embedding", "vec_id", kCand = 50)
        val sc = graft.ops.Staged(sc0)
        val pq = sc.where($"adc_rank" <= 10)
          .select(col(qidOut), $"vec_id")
        val staged = graft.ops.Pq.topKFromCandidates(
          sc, qidOut, "vec_id", k = 10, kCand = 50)
        Seq(("float", fl), ("pq_raw", pq), ("staged", staged))
          .map { case (n, a) => recallOf(n, a) }
          .reduce(_ unionByName _)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 4),
        af AS (SELECT vec_id, embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        apq AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        fl AS (SELECT query_id, vec_id FROM (
            SELECT p.query_id, a.vec_id,
              row_number() OVER (PARTITION BY p.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(a.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                a.vec_id) AS rk
            FROM af a JOIN probes p ON a.cluster = p.cluster
            JOIN q ON q.query_id = p.query_id) WHERE rk <= 10),
        parts AS (SELECT p.query_id, a.vec_id, a.cluster, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM apq a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster
          JOIN q ON q.query_id = p.query_id
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        pqagg AS (SELECT query_id, vec_id, cluster,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY query_id, vec_id, cluster),
        pqranked AS (SELECT g.query_id, g.vec_id,
            row_number() OVER (PARTITION BY g.query_id ORDER BY
              round((list_inner_product(q.qv, c.centroid) + g.sdot) /
                (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid)
                  + g.scr)), 6) DESC, g.vec_id) AS rk
          FROM pqagg g JOIN cents c ON c.cluster = g.cluster
          JOIN q ON q.query_id = g.query_id
          WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0),
        pq10 AS (SELECT query_id, vec_id FROM pqranked WHERE rk <= 10),
        cand AS (SELECT query_id, vec_id FROM pqranked WHERE rk <= 50),
        staged AS (SELECT query_id, vec_id FROM (
            SELECT cd.query_id, e.vec_id,
              row_number() OVER (PARTITION BY cd.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM cand cd JOIN embeddings e USING (vec_id)
            JOIN q ON q.query_id = cd.query_id) WHERE rk <= 10),
        bf AS (SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM embeddings e CROSS JOIN q) WHERE rk <= 10)
        SELECT 'float' AS face, CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(a.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM bf b LEFT JOIN fl a
          ON a.query_id = b.query_id AND a.vec_id = b.vec_id
        UNION ALL
        SELECT 'pq_raw' AS face, CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(a.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM bf b LEFT JOIN pq10 a
          ON a.query_id = b.query_id AND a.vec_id = b.vec_id
        UNION ALL
        SELECT 'staged' AS face, CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(a.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(a.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM bf b LEFT JOIN staged a
          ON a.query_id = b.query_id AND a.vec_id = b.vec_id"""),
      notes = "bf = a07's corpus rank per query; fl = a06's replay; pq/staged " +
        "replay the two-LUT ADC rank once and cut it at 10 (raw) and 50 " +
        "(candidates), the candidates re-ranked by exact cosine"),

    // ---- staged kCand tuning sweep: a13's table says "raise the
    // PQ-stage candidate count before re-ranking" — this is the knob's
    // measured curve (a08's discipline applied to staging): recall@10
    // per kCand over the same query sample against ONE brute-force
    // truth pass. Stage-2 bytes grow linearly in kCand (256·kCand
    // float bytes per query) while stage-1 bytes are constant, so the
    // curve's knee IS the serving configuration decision. Candidate
    // sets NEST, so the whole sweep runs off ONE staged-candidate
    // frame (Pq.stagedCandidates at the largest kCand: one ADC pass +
    // one pruned float pass, carrying adc_rank + exact cosine per
    // pair) — each setting is a filter `adc_rank <= kc` + keyed-window
    // re-rank, never a re-probe; recall is monotone in kCand by
    // construction and the oracle replays every cut.
    GraftQuery(
      "a14_staged_kcand_sweep",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        val queries = e.filter($"vec_id" % 97 === 0L)
        val bf = graft.ops.Staged(
          graft.ops.Similarity.bruteForceTopKBatch(e, queries,
            "vec_id", "embedding", "vec_id", k = 10)
            .select($"query_id", $"vec_id"))
        val (sc0, qidOut) = graft.ops.Pq.stagedCandidates(s, path, index,
          queries, "vec_id", "embedding", "vec_id", kCand = 100)
        val sc = graft.ops.Staged(sc0)
        Seq(10, 25, 50, 100).map { kc =>
          val staged = graft.ops.Pq.topKFromCandidates(
            sc, qidOut, "vec_id", k = 10, kCand = kc)
          bf.join(staged.select($"query_id", $"vec_id")
              .withColumn("__hit", lit(1)),
              Seq("query_id", "vec_id"), "left")
            .agg(count(lit(1)).as("n_bf"), count($"__hit").as("n_hit"))
            .select(lit(kc).as("k_cand"), $"n_bf", $"n_hit",
              round($"n_hit".cast("double") / $"n_bf", 6).as("recall"))
        }.reduce(_ unionByName _)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 4),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        apq AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        parts AS (SELECT p.query_id, a.vec_id, a.cluster, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM apq a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster
          JOIN q ON q.query_id = p.query_id
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        pqagg AS (SELECT query_id, vec_id, cluster,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY query_id, vec_id, cluster),
        pqranked AS (SELECT g.query_id, g.vec_id,
            row_number() OVER (PARTITION BY g.query_id ORDER BY
              round((list_inner_product(q.qv, c.centroid) + g.sdot) /
                (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid)
                  + g.scr)), 6) DESC, g.vec_id) AS rk
          FROM pqagg g JOIN cents c ON c.cluster = g.cluster
          JOIN q ON q.query_id = g.query_id
          WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0),
        kc AS (SELECT unnest([10, 25, 50, 100]) AS k_cand),
        staged AS (SELECT k_cand, query_id, vec_id FROM (
            SELECT kc.k_cand, cd.query_id, e.vec_id,
              row_number() OVER (PARTITION BY kc.k_cand, cd.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM kc JOIN pqranked cd ON cd.rk <= kc.k_cand
            JOIN embeddings e USING (vec_id)
            JOIN q ON q.query_id = cd.query_id) WHERE rk <= 10),
        bf AS (SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM embeddings e CROSS JOIN q) WHERE rk <= 10)
        SELECT kc.k_cand, CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(s.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM kc CROSS JOIN bf b LEFT JOIN staged s
          ON s.k_cand = kc.k_cand AND s.query_id = b.query_id
          AND s.vec_id = b.vec_id
        GROUP BY kc.k_cand"""),
      notes = "a08's sweep discipline on the staging knob: one ADC rank per " +
        "query, cut at each kCand, each cut exactly re-ranked; candidate " +
        "sets nest so recall is monotone in kCand"),

    // ---- per-cell quantization health: member count + mean/max
    // residual norm (‖vec − centroid[cell]‖) per cluster of the
    // persisted index — the WHEN-to-refit table. Appends register
    // under FROZEN centroids, so drifting ingest inflates residual
    // norms cell by cell long before any corpus average moves; reads
    // next to the pq-agreement monitor (that one says the compressed
    // face degraded, this one says WHERE, in raw geometry). One pruned
    // -layout scan + row-local codegen'd residual against the literal
    // centroid matrix + k-key agg; the mean rides an exact decimal sum
    // of 1e-6-rounded norms, the per-row square-sum folds left in
    // fixed dim order on BOTH engines (no bare float sum()).
    GraftQuery(
      "a15_cell_residual_health",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        Ivf.buildPersistentCached(e, path, "vec_id", "embedding", k = 16): Unit
        Ivf.cellResidualProfile(s, path, "embedding")
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        a AS (SELECT embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        rn AS (SELECT a.cluster,
            round(sqrt(list_reduce(
              list_transform(range(1, len(c.centroid) + 1),
                i -> (CAST(a.embedding[i] AS DOUBLE) - c.centroid[i])
                     * (CAST(a.embedding[i] AS DOUBLE) - c.centroid[i])),
              (x, y) -> x + y)), 6) AS r
          FROM a JOIN cents c ON c.cluster = a.cluster)
        SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs,
          round(CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
            AS mean_res_norm,
          max(r) AS max_res_norm
        FROM rn GROUP BY cluster"""),
      notes = "oracle replays the residual arithmetic from the dumped " +
        "centroids + assigned face; square-sum is an ordered left fold " +
        "on both sides, mean an exact decimal sum of rounded norms"),

    // ---- staged serving-configuration grid: recall@10 over the FULL
    // (nprobe × kCand) grid — a14's answer said "the residual gap at
    // kCand=100 is cell selection, not reconstruction"; this is the
    // table that decides the serving config along BOTH axes at once.
    // Stage-1 bytes scale with nprobe (m bytes/vector per probed
    // cell), stage-2 bytes with kCand (full floats per candidate), so
    // the grid prices widening the cheap axis against deepening the
    // expensive one. One-pass discipline throughout: probe sets nest
    // in nprobe and candidate sets nest in kCand, so ONE batchProbe +
    // ONE ADC pass at (nprobe=8) + ONE pruned float pass over the
    // distinct candidates serve all 16 settings; each setting is two
    // filters + a keyed window over the shared Staged frame; ONE
    // brute-force truth pass grades them all. Recall is monotone in
    // BOTH axes by construction; the oracle replays every cut.
    GraftQuery(
      "a16_staged_nprobe_grid",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        val queries = e.filter($"vec_id" % 97 === 0L)
        val bf = graft.ops.Staged(
          graft.ops.Similarity.bruteForceTopKBatch(e, queries,
            "vec_id", "embedding", "vec_id", k = 10)
            .select($"query_id", $"vec_id"))
        val (sc0, qidOut) = graft.ops.Pq.stagedCandidatesGrid(s, path,
          index, queries, "vec_id", "embedding", "vec_id",
          kCandMax = 100, nprobes = Seq(1, 2, 4, 8))
        val sc = graft.ops.Staged(sc0)
        (for (np <- Seq(1, 2, 4, 8); kc <- Seq(10, 25, 50, 100)) yield {
          val staged = graft.ops.Pq.topKFromCandidates(
            sc.where($"nprobe" === np), qidOut, "vec_id", k = 10, kCand = kc)
          bf.join(staged.select($"query_id", $"vec_id")
              .withColumn("__hit", lit(1)),
              Seq("query_id", "vec_id"), "left")
            .agg(count(lit(1)).as("n_bf"), count($"__hit").as("n_hit"))
            .select(lit(np).as("nprobe"), lit(kc).as("k_cand"),
              $"n_bf", $"n_hit",
              round($"n_hit".cast("double") / $"n_bf", 6).as("recall"))
        }).reduce(_ unionByName _)
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster, pr FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 8),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        apq AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        parts AS (SELECT p.query_id, a.vec_id, a.cluster, p.pr, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM apq a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster
          JOIN q ON q.query_id = p.query_id
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        pqagg AS (SELECT query_id, vec_id, cluster, pr,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY query_id, vec_id, cluster, pr),
        npg AS (SELECT unnest([1, 2, 4, 8]) AS np),
        pqranked AS (SELECT npg.np, g.query_id, g.vec_id,
            row_number() OVER (PARTITION BY npg.np, g.query_id ORDER BY
              round((list_inner_product(q.qv, c.centroid) + g.sdot) /
                (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid)
                  + g.scr)), 6) DESC, g.vec_id) AS rk
          FROM npg JOIN pqagg g ON g.pr <= npg.np
          JOIN cents c ON c.cluster = g.cluster
          JOIN q ON q.query_id = g.query_id
          WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0),
        cand AS (SELECT np, query_id, vec_id, rk FROM pqranked WHERE rk <= 100),
        kcg AS (SELECT unnest([10, 25, 50, 100]) AS k_cand),
        staged AS (SELECT np, k_cand, query_id, vec_id FROM (
            SELECT cd.np, kcg.k_cand, cd.query_id, e.vec_id,
              row_number() OVER (PARTITION BY cd.np, kcg.k_cand, cd.query_id
                ORDER BY round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6)
                  DESC, e.vec_id) AS rk
            FROM kcg JOIN cand cd ON cd.rk <= kcg.k_cand
            JOIN embeddings e USING (vec_id)
            JOIN q ON q.query_id = cd.query_id) WHERE rk <= 10),
        bf AS (SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
              row_number() OVER (PARTITION BY q.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM embeddings e CROSS JOIN q) WHERE rk <= 10)
        SELECT npg.np AS nprobe, kcg.k_cand,
          CAST(count(*) AS BIGINT) AS n_bf,
          CAST(count(s.vec_id) AS BIGINT) AS n_hit,
          round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 6) AS recall
        FROM npg CROSS JOIN kcg CROSS JOIN bf b
        LEFT JOIN staged s ON s.np = npg.np AND s.k_cand = kcg.k_cand
          AND s.query_id = b.query_id AND s.vec_id = b.vec_id
        GROUP BY npg.np, kcg.k_cand"""),
      notes = "a14's sweep discipline on BOTH serving axes: probe sets nest " +
        "in nprobe, candidate sets in kCand, so one ADC rank per (np, query) " +
        "cut at each kCand, each cut exactly re-ranked; 16 grid rows"),

    // ---- semantic-dedup threshold pricing sweep — x82's discipline
    // applied to the VECTOR dedup face: before committing a cosine
    // threshold corpus-wide, the table that prices each setting in
    // pair volume, cluster count, and corpus mass killed (keep-reps
    // rule — the same verdicts x31/the capstone apply). One blocked
    // pair pass at the loosest threshold serves every setting (pair
    // sets NEST in the threshold: strict-> cuts of one rounded cosine
    // column); per setting the keep-reps verdict is a CC run over the
    // filtered pairs — pair-set-sized, not corpus-sized. The per-
    // setting stat rows are 1-row scalar aggregates cross-joined (the
    // q37 class). Oracle replays all four closures from the dumped
    // governed assignment in ONE threshold-keyed recursive CTE.
    GraftQuery(
      "a17_semdedup_threshold_sweep",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val idx = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        val kept = graft.ops.SemanticDedup.keptCells(idx.assigned)
        if (OracleDump.enabled)
          OracleDump.dump(kept.select($"vec_id", $"cluster"),
            dir, "a17_assigned")
        val pairs = graft.ops.Staged(graft.ops.Similarity.cosinePairsBlocked(
          kept, "vec_id", "embedding", "cluster", threshold = 0.2))
        Seq(0.2, 0.3, 0.4, 0.5).map { t =>
          val pt = pairs.where($"cos_sim" > t).select($"id_a", $"id_b")
          val comp = graft.ops.Dedup.connectedComponents(pt)
          pt.agg(count(lit(1)).as("n_pairs"))
            // broadcast-hint the 1-row side: size ESTIMATES at plan
            // time don't know an aggregate is one row, and an unhinted
            // cross of two "big" frames plans CartesianProduct
            .crossJoin(broadcast(comp.agg(
              countDistinct($"cluster_rep").as("n_clusters"),
              sum(when($"doc_id" =!= $"cluster_rep", 1L).otherwise(0L))
                .as("n_dropped"))))
            .select(lit(t).as("threshold"), $"n_pairs",
              coalesce($"n_clusters", lit(0L)).as("n_clusters"),
              coalesce($"n_dropped", lit(0L)).as("n_dropped"))
        }.reduce(_ unionByName _)
      },
      Some("""WITH a AS (SELECT vec_id, CAST(cluster AS INTEGER) AS cluster
            FROM read_parquet('__SCRATCH__/a17_assigned/*.parquet')),
          e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
          p AS (SELECT id_a, id_b, c FROM (
              SELECT a1.vec_id AS id_a, a2.vec_id AS id_b,
                round(list_cosine_similarity(e1.v, e2.v), 6) AS c
              FROM a a1 JOIN a a2
                ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
              JOIN e e1 ON a1.vec_id = e1.vec_id
              JOIN e e2 ON a2.vec_id = e2.vec_id) WHERE c > 0.2),
          tg AS (SELECT unnest([0.2, 0.3, 0.4, 0.5]) AS t),
          ed AS (SELECT tg.t, p.id_a AS u, p.id_b AS v
                 FROM tg JOIN p ON p.c > tg.t
                 UNION ALL
                 SELECT tg.t, p.id_b, p.id_a FROM tg JOIN p ON p.c > tg.t),
          nodes AS (SELECT DISTINCT t, u AS id FROM ed),
          reach AS (
            WITH RECURSIVE r(t, id, lab) AS (
              SELECT t, id, id FROM nodes
              UNION
              SELECT ed.t, ed.v, r.lab FROM r
              JOIN ed ON ed.t = r.t AND ed.u = r.id
            ) SELECT * FROM r),
          comp AS (SELECT t, id, CAST(min(lab) AS BIGINT) AS rep
            FROM reach GROUP BY t, id),
          st AS (SELECT t, CAST(count(DISTINCT rep) AS BIGINT) AS nc,
              CAST(sum(CASE WHEN id <> rep THEN 1 ELSE 0 END) AS BIGINT) AS nd
            FROM comp GROUP BY t),
          np AS (SELECT tg.t, CAST(count(p.id_a) AS BIGINT) AS n
            FROM tg LEFT JOIN p ON p.c > tg.t GROUP BY tg.t)
        SELECT np.t AS threshold, np.n AS n_pairs,
          COALESCE(st.nc, 0) AS n_clusters, COALESCE(st.nd, 0) AS n_dropped
        FROM np LEFT JOIN st ON st.t = np.t"""),
      notes = "x31's within-cell cosine + x20's closure replayed per " +
        "threshold from one dumped governed assignment; pair sets nest, " +
        "so one pair pass serves every cut; keep-reps verdicts exact"),

    // ---- the grid-chosen serving configuration, registered: a16's
    // table said (nprobe=8, kCand=100) staged beats the nprobe=4
    // float probe (0.833 vs 0.783 recall@10 at sf0.01) at a fraction
    // of the stage-1 bytes — the residual gap was CELL SELECTION, so
    // widening the cheap m-bytes/vector axis buys more than deepening
    // re-rank. This serves the a06 query sample at exactly that
    // operating point (Pq.topKStagedBatch: one batched ADC pass over
    // the probed cells, one cluster-pruned exact float re-rank of the
    // top-100 candidates), so the RECOMMENDED configuration is itself
    // oracle-verified end to end — a04-a14 keep their nprobe=4
    // defaults untouched for cross-round stability.
    GraftQuery(
      "a18_staged_serving_point",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val index = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        graft.ops.Pq.pqAssign(s, path, "vec_id", "embedding", m = 4, ksub = 16)
        val queries = e.filter($"vec_id" % 97 === 0L)
        graft.ops.Pq.topKStagedBatch(s, path, index, queries,
            "vec_id", "embedding", "vec_id", k = 10, kCand = 100, nprobe = 8)
          .select($"query_id", $"vec_id", $"cos_sim")
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        q AS (SELECT vec_id AS query_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
            sqrt(list_inner_product(
              list_transform(embedding, x -> CAST(x AS DOUBLE)),
              list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS qnorm
          FROM embeddings WHERE vec_id % 97 = 0),
        probes AS (SELECT query_id, cluster FROM (
            SELECT q.query_id, c.cluster,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY list_distance(c.centroid, q.qv) ASC, c.cluster) AS pr
            FROM cents c CROSS JOIN q) WHERE pr <= 8),
        cb AS (SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
            centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/pq_codebooks/*.parquet')),
        apq AS (SELECT vec_id, codes, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned_pq/*/*.parquet',
                            hive_partitioning = 1)),
        parts AS (SELECT p.query_id, a.vec_id, a.cluster, cb.sub,
            list_inner_product(
              list_slice(q.qv, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid) AS dotp,
            2 * list_inner_product(
              list_slice(c.centroid, cb.sub * 16 + 1, cb.sub * 16 + 16),
              cb.centroid)
              + list_inner_product(cb.centroid, cb.centroid) AS cr
          FROM apq a JOIN probes p ON a.cluster = p.cluster
          JOIN cents c ON c.cluster = a.cluster
          JOIN q ON q.query_id = p.query_id
          JOIN cb ON cb.code = ((CAST(a.codes[cb.sub + 1] AS INTEGER) + 256) % 256)),
        pqagg AS (SELECT query_id, vec_id, cluster,
            list_reduce(list(dotp ORDER BY sub), (a, b) -> a + b) AS sdot,
            list_reduce(list(cr ORDER BY sub), (a, b) -> a + b) AS scr
          FROM parts GROUP BY query_id, vec_id, cluster),
        pqranked AS (SELECT g.query_id, g.vec_id,
            row_number() OVER (PARTITION BY g.query_id ORDER BY
              round((list_inner_product(q.qv, c.centroid) + g.sdot) /
                (q.qnorm * sqrt(list_inner_product(c.centroid, c.centroid)
                  + g.scr)), 6) DESC, g.vec_id) AS rk
          FROM pqagg g JOIN cents c ON c.cluster = g.cluster
          JOIN q ON q.query_id = g.query_id
          WHERE list_inner_product(c.centroid, c.centroid) + g.scr > 0),
        cand AS (SELECT query_id, vec_id FROM pqranked WHERE rk <= 100)
        SELECT query_id, vec_id, cos_sim FROM (
            SELECT cd.query_id, e.vec_id,
              round(list_cosine_similarity(
                list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6)
                AS cos_sim,
              row_number() OVER (PARTITION BY cd.query_id ORDER BY
                round(list_cosine_similarity(
                  list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 6) DESC,
                e.vec_id) AS rk
            FROM cand cd JOIN embeddings e USING (vec_id)
            JOIN q ON q.query_id = cd.query_id) WHERE rk <= 10"""),
      notes = "a13's two-LUT ADC replay widened to pr <= 8 and cut at 100 " +
        "candidates, the exact-cosine re-rank cut at 10 — the a16 grid's " +
        "chosen operating point served and verified end to end"),

    // ---- index-resize advisory — the WHEN for refitIndex(resizeTo):
    // kForCells keeps the expected cell population constant, so a
    // corpus that outgrew (or never filled) its k reads its target
    // straight off the policy; the a15 residual profile says cells
    // DRIFTED, this says cells are the wrong SIZE — the two
    // maintenance triggers are orthogonal. Hysteresis: recommend only
    // on a >= 2x gap either way (a refit re-derives every face, so
    // borderline k flapping would buy nothing and bill a full
    // rebuild). The rehearsal-scaled policy (targetCell=512, kMin=4 —
    // ScaleRehearsalSem's constants) keeps the advisory meaningful at
    // test SFs; production uses the 4096 default. The capstone
    // (CurateMain.runIncremental) consults the same rule before its
    // refit-on-alert, so a triggered repair also lands the resize.
    GraftQuery(
      "a19_index_resize_advisory",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val idx = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        val kCurrent = idx.centroids.length
        // one bounded driver-side count: the policy input is a single
        // long, the advisory a single row
        val n = e.count()
        val kPolicy = Ivf.kForCells(n, targetCell = 512, kMin = 4)
        val resize = Ivf.resizeRecommended(kCurrent, kPolicy)
        Seq((n, kCurrent, kPolicy, resize,
            if (resize) kPolicy else kCurrent))
          .toDF("n_vecs", "k_current", "k_policy", "resize_recommended",
            "k_target")
      },
      Some("""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs
            FROM embeddings),
          p AS (SELECT n_vecs, 16 AS k_current,
              CAST(greatest(4, least(262144,
                CAST(ceil(n_vecs / 512.0) AS BIGINT))) AS INT) AS k_policy
            FROM n)
        SELECT n_vecs, k_current, k_policy,
          (k_policy >= 2 * k_current OR 2 * k_policy <= k_current)
            AS resize_recommended,
          CASE WHEN k_policy >= 2 * k_current OR 2 * k_policy <= k_current
            THEN k_policy ELSE k_current END AS k_target
        FROM p"""),
      notes = "policy k replayed as exact integer arithmetic " +
        "(ceil/clamp); hysteresis = the same 2x rule Ivf.resizeRecommended " +
        "applies; k_current pinned to the shared k=16 index"),

    // ---- IVF cell-balance advisory — the SKEW axis of the index
    // health family: a15 reads residual drift (are centroids stale),
    // a19 reads size policy (is k right for N); this reads cell
    // POPULATION balance (is one cell hot). Probe cost at fixed nprobe
    // is bounded by the largest probed cell, so a high max/mean or
    // Gini is the latency-tail alarm that neither drift nor size
    // catches — a perfectly-sized, zero-drift index can still funnel
    // half the corpus through one Voronoi cell. One k-row aggregation
    // over the persisted assignment + a k-row sorted accumulation:
    // exact integer arithmetic end to end (Gini numerator is an
    // integer; the two divisions round at 1e-6).
    GraftQuery(
      "a20_cell_balance",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val idx = Ivf.buildPersistentCached(e, OracleDump.ivfPath(dir, 16),
          "vec_id", "embedding", k = 16)
        if (OracleDump.enabled)
          OracleDump.dump(idx.assigned.select($"vec_id", $"cluster"),
            dir, "a20_assigned")
        val cells = idx.assigned.groupBy($"cluster")
          .agg(count(lit(1)).as("n"))
        val k = idx.centroids.length
        // k-row frame: the global window is over the CELL table (k
        // rows, bounded by the index's own k), never the corpus
        val ranked = cells.withColumn("__i", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"n", $"cluster")))
        ranked.agg(
            sum($"n").as("n_vecs"),
            max($"n").as("max_cell"),
            sum(($"__i" * 2 - k - 1) * $"n").as("__g"))
          .select(lit(k).as("k_cells"), $"n_vecs", $"max_cell",
            round($"n_vecs".cast("double") / k, 6).as("mean_cell"),
            round($"max_cell".cast("double") * k / $"n_vecs", 6)
              .as("max_over_mean"),
            round($"__g".cast("double") / (lit(k.toLong) * $"n_vecs"), 6)
              .as("gini"))
      },
      Some("""WITH a AS (SELECT CAST(cluster AS INTEGER) AS cluster
            FROM read_parquet('__SCRATCH__/a20_assigned/*.parquet')),
          c AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n
            FROM a GROUP BY cluster),
          r AS (SELECT n, row_number() OVER (ORDER BY n, cluster) AS i
            FROM c),
          g AS (SELECT CAST(16 AS INT) AS k_cells,
              CAST(sum(n) AS BIGINT) AS n_vecs,
              CAST(max(n) AS BIGINT) AS max_cell,
              CAST(sum((i * 2 - 16 - 1) * n) AS BIGINT) AS gnum
            FROM r)
          SELECT k_cells, n_vecs, max_cell,
            round(CAST(n_vecs AS DOUBLE) / 16, 6) AS mean_cell,
            round(CAST(max_cell AS DOUBLE) * 16 / n_vecs, 6)
              AS max_over_mean,
            round(CAST(gnum AS DOUBLE) / (16 * n_vecs), 6) AS gini
          FROM g""")
    ,
      notes = "governed assignment dumped as data; Gini over the " +
        "(n, cluster)-sorted cell table — total order, integer numerator"),

    // ---- the unified maintenance trigger table (r18) — the THREE
    // orthogonal index-health axes (a15 residual drift, a19 size
    // policy, a20 cell balance) composed into the ONE row the
    // streaming maintenance loop's decision reads
    // (VectorStreams.maintainEpoch): a refit is advised when ANY axis
    // alerts, because each catches a poisoning the others structurally
    // miss. Ceilings are the loop's defaults at the fixture scale
    // (residual 2.0 = "unit-scale residuals doubled", balance 2.0 =
    // "the hottest cell reads twice the mean"); the policy constants
    // are a19's sf-scaled ones. ONE pruned-layout scan serves all
    // three axes: the a15 profile already carries each cell's
    // population, so the balance and size gauges fold into the same
    // k-row → 1-row aggregation — no second scan, no scalar cross.
    GraftQuery(
      "a21_maintenance_triggers",
      (s, dir) => {
        import s.implicits._
        val e = Tables(s, dir, "embeddings")
        val path = OracleDump.ivfPath(dir, 16)
        val idx = Ivf.buildPersistentCached(e, path,
          "vec_id", "embedding", k = 16)
        val k = idx.centroids.length
        Ivf.cellResidualProfile(s, path, "embedding")
          .agg(max($"mean_res_norm").as("max_mean_residual"),
            sum($"n_vecs").as("n_vecs"), max($"n_vecs").as("max_cell"))
          .select(lit(k).as("k_cells"), $"n_vecs", $"max_mean_residual",
            round($"max_cell".cast("double") * k / $"n_vecs", 6)
              .as("max_over_mean"),
            greatest(lit(4L), least(lit(262144L),
              ceil($"n_vecs" / lit(512.0)).cast("long"))).cast("int")
              .as("k_policy"))
          .withColumn("resize_recommended",
            $"k_policy" >= lit(2 * k) || lit(2) * $"k_policy" <= lit(k))
          .withColumn("residual_alert", $"max_mean_residual" > 2.0)
          .withColumn("balance_alert", $"max_over_mean" > 2.0)
          .withColumn("refit_advised",
            $"residual_alert" || $"balance_alert" || $"resize_recommended")
      },
      Some("""WITH cents AS (SELECT CAST(cluster AS INTEGER) AS cluster, centroid
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/centroids/*.parquet')),
        a AS (SELECT embedding, CAST(cluster AS INTEGER) AS cluster
          FROM read_parquet('__TMP__/graft-ivf-__SFTAG__-k16/assigned/*/*.parquet',
                            hive_partitioning = 1)),
        rn AS (SELECT a.cluster,
            round(sqrt(list_reduce(
              list_transform(range(1, len(c.centroid) + 1),
                i -> (CAST(a.embedding[i] AS DOUBLE) - c.centroid[i])
                     * (CAST(a.embedding[i] AS DOUBLE) - c.centroid[i])),
              (x, y) -> x + y)), 6) AS r
          FROM a JOIN cents c ON c.cluster = a.cluster),
        prof AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n,
            round(CAST(sum(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
              AS mrn
          FROM rn GROUP BY cluster),
        t AS (SELECT CAST(16 AS INT) AS k_cells,
            CAST(sum(n) AS BIGINT) AS n_vecs,
            max(mrn) AS max_mean_residual,
            round(CAST(max(n) AS DOUBLE) * 16 / CAST(sum(n) AS DOUBLE), 6)
              AS max_over_mean,
            CAST(greatest(4, least(262144,
              CAST(ceil(CAST(sum(n) AS DOUBLE) / 512.0) AS BIGINT))) AS INT)
              AS k_policy
          FROM prof)
        SELECT k_cells, n_vecs, max_mean_residual, max_over_mean, k_policy,
          (k_policy >= 32 OR 2 * k_policy <= 16) AS resize_recommended,
          (max_mean_residual > 2.0) AS residual_alert,
          (max_over_mean > 2.0) AS balance_alert,
          ((max_mean_residual > 2.0) OR (max_over_mean > 2.0)
            OR (k_policy >= 32 OR 2 * k_policy <= 16)) AS refit_advised
        FROM t"""),
      notes = "a15's residual replay + a20's cell counts + a19's integer " +
        "policy arithmetic composed into the loop's one decision row, " +
        "all off ONE k-row profile aggregation"),

    // ---- per-source KL vs a FROZEN unigram table under the
    // renormalized-SHARED-support rule — the health row's
    // distributional-drift column (r19): x91 prices a source against
    // the union it sits in; this prices an ARRIVING batch's sources
    // against the committed day-1 distribution, the streaming KL
    // monitor's semantics sliced per source. One source drifting its
    // proportions hides behind nine healthy batchmates in the global
    // gauge exactly as novelty does; this row names it. Corpus =
    // doc_id % 3 = 0 (the frozen slice), batch = the rest.
    GraftQuery(
      "a22_source_shared_kl",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents")
        graft.ops.TextAnalysis.perSourceSharedKl(
          docs.where($"doc_id" % 3 =!= 0),
          "text", "source",
          graft.ops.Staged(graft.ops.TextAnalysis.unigramCounts(
            docs.where($"doc_id" % 3 === 0), "text")))
      },
      Some("""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
          batch AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
          fz AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                AS tok FROM corpus) GROUP BY tok),
          ex AS (SELECT source,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
            FROM batch),
          bc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cb
            FROM ex GROUP BY source, tok),
          tot AS (SELECT source, CAST(sum(cb) AS BIGINT) AS ntok
            FROM bc GROUP BY source),
          sh AS (SELECT bc.source, bc.tok, bc.cb, fz.cnt
            FROM bc JOIN fz USING (tok)),
          sums AS (SELECT source, CAST(sum(cb) AS BIGINT) AS ninv,
              CAST(sum(cnt) AS BIGINT) AS qs FROM sh GROUP BY source),
          kl AS (SELECT sh.source,
              round(CAST(sum(CAST(round(
                  (CAST(cb AS DOUBLE) / sums.ninv) *
                  ln((CAST(cb AS DOUBLE) * sums.qs) /
                     (CAST(sums.ninv AS DOUBLE) * cnt)), 9)
                AS DECIMAL(28,9))) AS DOUBLE), 6) AS kl
            FROM sh JOIN sums USING (source) GROUP BY sh.source),
          nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM batch GROUP BY source)
          SELECT nd.source, nd.n_docs, COALESCE(tot.ntok, 0) AS n_tokens,
            COALESCE(sums.ninv, 0) AS n_in_vocab, kl.kl
          FROM nd LEFT JOIN tot USING (source) LEFT JOIN sums USING (source)
            LEFT JOIN kl USING (source)"""),
      notes = "the streaming KL monitor's renormalized-shared-support " +
        "rule sliced per source: terms over words BOTH sides hold, both " +
        "distributions renormalized to that support, 1e-9 grid + " +
        "decimal sum — the same arithmetic as the global gauge, so one " +
        "threshold serves both")
  )
}
