package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.sources.Tables

/** Event-time operators as batch queries: tumbling windows, bucketed
  * range join, as-of join, sessionization. The same transforms run
  * under Structured Streaming (see graft.streaming.Streams); here they
  * are verified against the DuckDB oracle in batch.
  */
object TemporalQueries {

  val all: Seq[GraftQuery] = Seq(

    // ---- tumbling event-time aggregation. window() groups align with
    // date_trunc('hour') for a 1-hour tumble.
    GraftQuery(
      "t01_tumbling_hourly",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "events")
          .groupBy(window($"ts", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
          .select($"window.start".as("window_start"), $"event_type", $"n", $"total_value")
      },
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2""")),

    // ---- range join via time-bucketing: pairs of same-user events
    // within 5 minutes. Each left row is emitted into its bucket ±1 and
    // equi-joined — O(pairs-in-range) work with a plain shuffle join,
    // instead of the broadcast-nested-loop a raw time-condition join
    // plans. The oracle is the naive pairwise condition.
    GraftQuery(
      "t02_range_join_bucketed",
      (s, dir) => {
        import s.implicits._
        val windowUs = 300L * 1000000L // 5 minutes in microseconds
        val ev = Tables(s, dir, "events")
          .select($"event_id", $"user_id", $"ts", unix_micros($"ts").as("us"))
        // exact integer bucket (double division would misbucket at edges)
        val bucketOf = expr(s"us div $windowUs")
        val probes = ev.select($"event_id", $"user_id", $"us",
            explode(array((-1).to(1).map(d => bucketOf + d): _*)).as("bucket"))
        val build = ev.select($"event_id".as("event_id_b"), $"user_id",
          $"us".as("us_b"), bucketOf.as("bucket"))
        // a pair matches in exactly one bucket (build bucket is unique,
        // probe buckets are distinct) → no post-join distinct needed
        probes.join(build, Seq("user_id", "bucket"))
          .where($"event_id" < $"event_id_b" &&
            abs($"us_b" - $"us") <= windowUs)
          .select($"event_id".as("id_a"), $"event_id_b".as("id_b"),
            ($"us_b" - $"us").as("delta_us"))
      },
      Some("""SELECT a.event_id AS id_a, b.event_id AS id_b,
          epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 300000000""")),

    // ---- general as-of join (union+window, one shuffle): every event
    // gets the most recent error event at-or-before it, per user. The
    // oracle uses DuckDB's native ASOF JOIN.
    GraftQuery(
      "t03_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", $"event_id".as("err_id"))
        // the custom Catalyst operator (AsOfJoinNode → AsOfJoinExec);
        // AsOfJoin.apply is the equivalent built-ins-only formulation
        AsOfJoin.sortMerge(ev.select($"event_id", $"user_id", $"ts"), errors,
          timeCol = "ts", keys = Seq("user_id"), payload = Seq("err_id"))
          .select($"event_id", $"user_id", $"ts", $"asof_err_id")
      },
      Some("""SELECT e.event_id, e.user_id, e.ts, err.event_id AS asof_err_id
        FROM events e ASOF LEFT JOIN
          (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') err
          ON e.user_id = err.user_id AND e.ts >= err.ts""")),

    // ---- bounded-lookback as-of (merge_asof tolerance): same join,
    // but an error older than 10 minutes no longer explains the event.
    // A backward match outside tolerance means NO match (anything
    // earlier is older still), so the oracle just null-gates DuckDB's
    // ASOF result on the age of the matched row.
    GraftQuery(
      "t06_asof_tolerance",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", $"event_id".as("err_id"))
        AsOfJoin.sortMerge(ev.select($"event_id", $"user_id", $"ts"), errors,
          timeCol = "ts", keys = Seq("user_id"), payload = Seq("err_id"),
          tolerance = Some(java.time.Duration.ofMinutes(10)))
          .select($"event_id", $"user_id", $"ts", $"asof_err_id")
      },
      Some("""SELECT event_id, user_id, ts,
          CASE WHEN ats IS NOT NULL AND ts - ats <= INTERVAL 10 MINUTE
               THEN aid END AS asof_err_id
        FROM (
          SELECT e.event_id, e.user_id, e.ts, err.ts AS ats,
                 err.event_id AS aid
          FROM events e ASOF LEFT JOIN
            (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'error') err
            ON e.user_id = err.user_id AND e.ts >= err.ts)""")),

    // ---- forward as-of: every event gets the NEXT error at-or-after
    // it per user (the "time to next failure" primitive). Same custom
    // operator, direction flipped — the merge's lookahead row IS the
    // match, no held state.
    GraftQuery(
      "t07_asof_forward",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"ts", $"event_id".as("err_id"))
        AsOfJoin.sortMerge(ev.select($"event_id", $"user_id", $"ts"), errors,
          timeCol = "ts", keys = Seq("user_id"), payload = Seq("err_id"),
          forward = true)
          .select($"event_id", $"user_id", $"ts", $"asof_err_id")
      },
      Some("""SELECT e.event_id, e.user_id, e.ts, err.event_id AS asof_err_id
        FROM events e ASOF LEFT JOIN
          (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error') err
          ON e.user_id = err.user_id AND e.ts <= err.ts""")),

    // ---- sessionization in batch SQL form: gaps-and-islands with a
    // 30-minute gap; matches streaming session_window() semantics for
    // session starts/sizes.
    GraftQuery(
      "t04_sessionization",
      (s, dir) => {
        Tables(s, dir, "events").createOrReplaceTempView("events")
        s.sql("""
          WITH marked AS (
            SELECT user_id, ts, event_id,
              CASE WHEN unix_micros(ts) - unix_micros(
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
            FROM events),
          numbered AS (
            SELECT user_id, ts,
              sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM marked)
          SELECT user_id, session_id, min(ts) AS session_start,
            max(ts) AS session_end, count(*) AS n_events
          FROM numbered GROUP BY user_id, session_id""")
      },
      Some("""WITH marked AS (
            SELECT user_id, ts, event_id,
              CASE WHEN epoch_us(ts) - epoch_us(
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
            FROM events),
          numbered AS (
            SELECT user_id, ts,
              CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM marked)
          SELECT user_id, session_id, min(ts) AS session_start,
            max(ts) AS session_end, count(*) AS n_events
          FROM numbered GROUP BY user_id, session_id""")),

    // ---- sketch aggregates: HLL distinct + approximate quantiles.
    // The sketch VALUES are engine-specific (HLL++/GK internals), but
    // their BOUND CONTRACTS are not: the sketch outputs are dumped as
    // data, and both engines compute — in pure integer arithmetic, so
    // the booleans are bit-identical — (a) |approx_users − exact| ≤
    // 15% of exact (3σ at HLL++'s default 5% rsd) and (b) each
    // approximate percentile's true rank lands within ±1% of its
    // target (10× percentile_approx's n/accuracy guarantee). The
    // oracle replays the checks over the dump: the sketch leaves
    // rows-only-land while the engine-specific internals stay free.
    GraftQuery(
      "t05_sketches",
      (s, dir) => {
        import s.implicits._
        val ev = Tables(s, dir, "events")
        val sk = graft.ops.Staged(ev.groupBy($"event_type")
          .agg(
            approx_count_distinct($"user_id").as("approx_users"),
            percentile_approx($"value", lit(0.5), lit(1000)).as("p50_value"),
            percentile_approx($"value", lit(0.99), lit(1000)).as("p99_value")))
        if (OracleDump.enabled) OracleDump.dump(sk, dir, "t05_sketch")
        val ex = ev.groupBy($"event_type").agg(
          countDistinct($"user_id").as("exact_users"),
          count($"value").as("n"))
        // true ranks of the sketched percentile values: the value's
        // rank interval is (lt, le]; the contract holds iff it
        // intersects [(p − tol)·n, (p + tol)·n]
        val rk = ev.join(sk.select($"event_type", $"p50_value", $"p99_value"),
            Seq("event_type"))
          .groupBy($"event_type").agg(
            sum(when($"value" <= $"p50_value", 1L).otherwise(0L)).as("le50"),
            sum(when($"value" < $"p50_value", 1L).otherwise(0L)).as("lt50"),
            sum(when($"value" <= $"p99_value", 1L).otherwise(0L)).as("le99"))
        sk.join(ex, Seq("event_type")).join(rk, Seq("event_type"))
          .select($"event_type", $"approx_users", $"p50_value", $"p99_value",
            (abs($"approx_users" - $"exact_users") * 100 <= $"exact_users" * 15)
              .as("hll_ok"),
            ($"le50" * 100 >= $"n" * 49 && $"lt50" * 100 <= $"n" * 51).as("p50_ok"),
            ($"le99" * 100 >= $"n" * 98).as("p99_ok"))
      },
      Some("""WITH sk AS (SELECT event_type, approx_users, p50_value, p99_value
            FROM read_parquet('__SCRATCH__/t05_sketch/*.parquet')),
          ex AS (SELECT event_type,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
              CAST(count(value) AS BIGINT) AS n
            FROM events GROUP BY event_type),
          rk AS (SELECT e.event_type,
              CAST(sum(CASE WHEN e.value <= sk.p50_value THEN 1 ELSE 0 END) AS BIGINT) AS le50,
              CAST(sum(CASE WHEN e.value < sk.p50_value THEN 1 ELSE 0 END) AS BIGINT) AS lt50,
              CAST(sum(CASE WHEN e.value <= sk.p99_value THEN 1 ELSE 0 END) AS BIGINT) AS le99
            FROM events e JOIN sk ON e.event_type = sk.event_type
            GROUP BY e.event_type)
        SELECT sk.event_type, sk.approx_users, sk.p50_value, sk.p99_value,
          (abs(sk.approx_users - ex.exact_users) * 100 <= ex.exact_users * 15) AS hll_ok,
          (rk.le50 * 100 >= ex.n * 49 AND rk.lt50 * 100 <= ex.n * 51) AS p50_ok,
          (rk.le99 * 100 >= ex.n * 98) AS p99_ok
        FROM sk JOIN ex USING (event_type) JOIN rk USING (event_type)"""),
      notes = "sketch values dumped as data; both engines verify the bound contracts in integer arithmetic")
  )
}
