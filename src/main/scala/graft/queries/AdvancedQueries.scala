package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import Q._

/** Round-2 breadth: statistical moments, lateral/explode, map columns,
  * gap filling, exact percentiles, rank-family windows, filtered
  * aggregation, regex suite, date arithmetic, range window frames, and
  * the event-analytics pair (funnel, cohort retention).
  *
  * Determinism notes follow the Q.dsum discipline: every
  * order-sensitive float aggregation goes through exact DECIMAL sums;
  * derived double math (variance, correlation) is then a fixed scalar
  * expression over those exact sums, bit-identical across engines.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    // ---- q27: second-moment statistics (variance / stddev /
    // correlation) computed from exact decimal sums, NOT the engines'
    // one-pass stddev/corr (whose float accumulation order differs).
    // Map-side partial sums + one tiny shuffle; scales like q01.
    GraftQuery(
      "q27_stat_moments",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            dsum($"l_quantity").as("sq"),
            dsum($"l_quantity" * $"l_quantity", 4).as("sqq"),
            dsum($"l_extendedprice").as("sp"),
            dsum($"l_extendedprice" * $"l_extendedprice", 4).as("spp"),
            dsum($"l_quantity" * $"l_extendedprice", 4).as("sqp"))
          // final round(9) absorbs single-ulp divergence from FMA
          // contraction in the engines' `a*b - c*d` compilations; the
          // sums underneath are exact decimals
          .select($"l_returnflag", $"n",
            round(($"sqq" - $"sq" * $"sq" / $"n") / ($"n" - 1), 9).as("var_qty"),
            round(sqrt(($"sqq" - $"sq" * $"sq" / $"n") / ($"n" - 1)), 9).as("std_qty"),
            round(($"n" * $"sqp" - $"sq" * $"sp") /
              (sqrt($"n" * $"sqq" - $"sq" * $"sq") *
               sqrt($"n" * $"spp" - $"sp" * $"sp")), 9).as("corr_qty_price"))
      },
      Some(s"""WITH m AS (SELECT l_returnflag,
          CAST(count(*) AS BIGINT) AS n,
          ${sqlDsum("l_quantity")} AS sq,
          ${sqlDsum("l_quantity * l_quantity", 4)} AS sqq,
          ${sqlDsum("l_extendedprice")} AS sp,
          ${sqlDsum("l_extendedprice * l_extendedprice", 4)} AS spp,
          ${sqlDsum("l_quantity * l_extendedprice", 4)} AS sqp
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          round((sqq - sq * sq / n) / (n - 1), 9) AS var_qty,
          round(sqrt((sqq - sq * sq / n) / (n - 1)), 9) AS std_qty,
          round((n * sqp - sq * sp) /
            (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 9) AS corr_qty_price
        FROM m""")),

    // ---- q28: lateral explode with position (generator / UDTF
    // category). One narrow generate, no shuffle; output is
    // (doc, position, token) — the token-stream relational view.
    GraftQuery(
      "q28_explode_tokens",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .where($"doc_id" % 10 === 0)
          .select($"doc_id",
            posexplode(regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)))
              .as(Seq("pos", "token")))
      },
      Some("""WITH toks AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
          FROM documents WHERE doc_id % 10 = 0)
        SELECT doc_id, CAST(generate_subscripts(ts, 1) AS INT) - 1 AS pos,
          unnest(ts) AS token FROM toks""")),

    // ---- q29: map-typed column: parse JSON props to MAP, explode
    // entries. The map never shuffles — entries explode in place.
    GraftQuery(
      "q29_map_entries",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .select($"event_id",
            explode(from_json($"props", MapType(StringType, LongType)))
              .as(Seq("prop_key", "prop_val")))
      },
      Some("""SELECT event_id, k AS prop_key,
          CAST(json_extract(props, '$.' || k) AS BIGINT) AS prop_val
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)""")),

    // ---- q30: gap filling — dense month × region grid LEFT JOIN'd to
    // sparse counts, zeros filled. The dense dimension is generated
    // (sequence/explode), never materialized wider than (#months × 5).
    GraftQuery(
      "q30_gap_fill_months",
      (s, dir) => {
        import s.implicits._
        val orders = t(s, dir, "orders")
        val months = orders
          .agg(date_trunc("month", min($"o_orderdate")).as("lo"),
            date_trunc("month", max($"o_orderdate")).as("hi"))
          .select(explode(sequence($"lo", $"hi", expr("interval 1 month"))).as("month"))
        // broadcast the generated month axis: the dense grid is tiny
        // relative to the fact side and must never shuffle to build
        val grid = t(s, dir, "region").select($"r_name").crossJoin(broadcast(months))
        val counts = orders
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
          .join(t(s, dir, "region"), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n"))
        grid.join(counts, Seq("r_name", "month"), "left")
          .select($"r_name", $"month", coalesce($"n", lit(0L)).as("n"))
      },
      Some("""WITH months AS (SELECT unnest(generate_series(
            date_trunc('month', (SELECT min(o_orderdate) FROM orders)),
            date_trunc('month', (SELECT max(o_orderdate) FROM orders)),
            INTERVAL 1 MONTH)) AS month),
          grid AS (SELECT r_name, month FROM region, months),
          cnt AS (SELECT r_name, date_trunc('month', o_orderdate) AS month,
              count(*) AS n
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2)
        SELECT g.r_name, g.month, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN cnt ON g.r_name = cnt.r_name AND g.month = cnt.month""")),

    // ---- q31: exact percentiles (percentile_cont semantics, linear
    // interpolation), via the scale-safe two-pass histogram+rank in
    // graft.ops.Quantiles — no aggregation buffer ever holds a group
    // (the built-in `percentile` ObjectHashAggregate does, and OOMs at
    // 100x). Oracle replays the identical two-pass math.
    GraftQuery(
      "q31_percentiles",
      (s, dir) => {
        import s.implicits._
        graft.ops.Quantiles.exact(t(s, dir, "orders"),
            Seq("o_orderstatus"), "o_totalprice",
            Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9))
          .drop("n")
      },
      Some(s"""WITH q AS (${graft.ops.Quantiles.oracleSql("orders",
          Seq("o_orderstatus"), "o_totalprice",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9))})
        SELECT o_orderstatus, p25, p50, p75, p90 FROM q""")),

    // ---- q32: rank-family window functions (ntile / percent_rank /
    // cume_dist) under a total per-partition order (ties broken by key
    // → deterministic across engines).
    GraftQuery(
      "q32_ntile_ranks",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
        t(s, dir, "orders")
          .where($"o_orderkey" % 7 === 0)
          .select($"o_orderkey", $"o_orderpriority",
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd
        FROM orders WHERE o_orderkey % 7 = 0
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)""")),

    // ---- q33: conditional (filtered) aggregation — one scan computing
    // several differently-filtered aggregates at once, instead of N
    // scans + joins.
    GraftQuery(
      "q33_filtered_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            count(when($"o_orderstatus" === "O", 1)).as("n_open"),
            count(when($"o_orderstatus" === "F", 1)).as("n_finished"),
            dsum(when($"o_orderstatus" === "F", $"o_totalprice")).as("rev_finished"),
            dsum(when($"o_orderpriority" === "1-URGENT", $"o_totalprice")).as("rev_urgent"))
      },
      Some(s"""SELECT n_name,
          CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
          CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_finished,
          ${sqlDsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS rev_finished,
          ${sqlDsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS rev_urgent
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""")),

    // ---- q34: regex scalar suite (extract / extract_all+count /
    // replace-all). Row-local, codegen'd, no shuffle.
    GraftQuery(
      "q34_regex_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select($"p_partkey",
            regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
            size(regexp_extract_all($"p_name", lit("a"), lit(0))).as("n_a"),
            regexp_replace($"p_type", "[aeiou]", "").as("type_novowels"))
      },
      Some("""SELECT p_partkey,
          regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
          CAST(len(regexp_extract_all(p_name, 'a')) AS INT) AS n_a,
          regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowels
        FROM part""")),

    // ---- q35: date/time arithmetic suite. DOW numbering is engine-
    // specific (Spark 1=Sun, DuckDB 0=Sun) → normalized explicitly.
    GraftQuery(
      "q35_date_arith",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .where($"o_orderkey" % 11 === 0)
          .select($"o_orderkey",
            date_trunc("quarter", $"o_orderdate").as("quarter"),
            (dayofweek($"o_orderdate") - 1).as("dow"),
            last_day($"o_orderdate").cast("timestamp").as("month_end"),
            add_months($"o_orderdate", 3).cast("timestamp").as("plus3m"),
            datediff(lit("2002-01-01").cast("date"), $"o_orderdate").as("days_to_2002"))
      },
      Some("""SELECT o_orderkey,
          date_trunc('quarter', o_orderdate) AS quarter,
          CAST(dayofweek(o_orderdate) AS INT) AS dow,
          CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
          o_orderdate + INTERVAL 3 MONTH AS plus3m,
          CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS INT) AS days_to_2002
        FROM orders WHERE o_orderkey % 11 = 0""")),

    // ---- q36: range-frame window (time-based sliding sum per user)
    // plus an unbounded frame first_value. The range frame is over
    // integer microseconds → portable; the windowed sum goes through
    // DECIMAL for order-independence.
    GraftQuery(
      "q36_window_range_frame",
      (s, dir) => {
        import s.implicits._
        val byTime = Window.partitionBy($"user_id").orderBy($"us")
          .rangeBetween(-3600000000L, 0L) // trailing hour
        val full = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("us", unix_micros($"ts"))
          .select($"event_id",
            sum($"value".cast(DecimalType(18, 4))).over(byTime)
              .cast(DoubleType).as("hour_sum"),
            first(col("event_id")).over(full).as("first_event"))
      },
      Some("""SELECT event_id,
          CAST(sum(CAST(value AS DECIMAL(18,4))) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS hour_sum,
          first_value(event_id) OVER
            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_event
        FROM events""")),

    // ---- q37: ordered event funnel (view → click → purchase, each
    // step strictly after the previous per user). Three grouped mins,
    // each a key-partitioned agg + broadcast-sized join. Each stage's
    // per-user table feeds BOTH the next stage's join and its own
    // count, so the aggregated intermediates are Staged — without it
    // the events scan and the first aggregations execute twice.
    GraftQuery(
      "q37_event_funnel",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val v = graft.ops.Staged(ev.where($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("t1")))
        val c = graft.ops.Staged(ev.where($"event_type" === "click").as("e")
          .join(v, Seq("user_id")).where($"ts" > $"t1")
          .groupBy($"user_id").agg(min($"ts").as("t2")))
        val p = ev.where($"event_type" === "purchase").as("e2")
          .join(c, Seq("user_id")).where($"ts" > $"t2")
          .groupBy($"user_id").agg(min($"ts").as("t3"))
        v.agg(count(lit(1)).as("n_view"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("n_view_click"))))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n_view_click_purchase"))))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
            WHERE e.event_type = 'click' GROUP BY e.user_id),
          p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
            WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
          CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
          CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase""")),

    // ---- q38: cohort retention — users bucketed by first-activity
    // day, counted per days-since-cohort offset (the fixture spans one
    // month, so day granularity gives a real retention matrix). Two
    // shuffles (per-user min, then cohort grid agg), both
    // key-partitioned.
    GraftQuery(
      "q38_cohort_retention",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val cohort = ev.groupBy($"user_id")
          .agg(date_trunc("day", min($"ts")).as("cohort_day"))
        ev.select($"user_id", date_trunc("day", $"ts").as("d"))
          .distinct()
          .join(cohort, Seq("user_id"))
          .groupBy($"cohort_day",
            datediff($"d", $"cohort_day").as("offset_days"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH cohort AS (SELECT user_id, date_trunc('day', min(ts))
              AS cohort_day FROM events GROUP BY user_id),
          act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
        SELECT cohort_day,
          CAST(date_diff('day', cohort_day, d) AS INT) AS offset_days,
          CAST(count(*) AS BIGINT) AS n_users
        FROM act JOIN cohort USING (user_id)
        GROUP BY 1, 2""")),

    // ---- q39: multiset (bag) set operations — EXCEPT ALL keeps
    // duplicate multiplicity, unlike q14's set variants. Both arms are
    // one hash shuffle each.
    GraftQuery(
      "q39_set_ops_all",
      (s, dir) => {
        import s.implicits._
        val open = t(s, dir, "orders").where($"o_orderstatus" === "O")
          .select($"o_custkey")
        val fin = t(s, dir, "orders").where($"o_orderstatus" === "F")
          .select($"o_custkey")
        open.exceptAll(fin).withColumn("op", lit("except_all"))
          .unionByName(open.intersectAll(fin).withColumn("op", lit("intersect_all")))
      },
      Some("""SELECT o_custkey, 'except_all' AS op FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT o_custkey, 'intersect_all' AS op FROM (
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""")),

    // ---- q40: correlated LATERAL join (top-2 per group as a lateral
    // subquery — the decorrelated plan is a partitioned window, not a
    // per-row re-execution).
    GraftQuery(
      "q40_lateral_topn",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("nation")
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT n_name, l.c_name, l.c_acctbal
          FROM nation, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2) l""")
      },
      Some("""SELECT n_name, l.c_name, l.c_acctbal FROM nation,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) l""")),

    // ---- q41: array higher-order functions (filter / transform /
    // aggregate / slice) — the portable HOF surface; the dedup hot
    // loops use native expressions instead (see functions/Expressions).
    GraftQuery(
      "q41_array_hof",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "documents")
          .where($"doc_id" % 10 === 3)
          .withColumn("t", regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0)))
          .select($"doc_id",
            size(expr("filter(t, x -> length(x) > 3)")).as("n_long"),
            expr("aggregate(transform(t, x -> cast(length(x) as bigint)), 0L, (a, x) -> a + x)")
              .as("total_chars"),
            array_join(expr("transform(slice(t, 1, 3), x -> upper(x))"), ",")
              .as("first3_upper"))
      },
      Some("""WITH toks AS (SELECT doc_id,
          regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents WHERE doc_id % 10 = 3)
        SELECT doc_id,
          CAST(len(list_filter(t, x -> len(x) > 3)) AS INT) AS n_long,
          CAST(COALESCE(list_aggregate(list_transform(t, x -> len(x)), 'sum'), 0)
            AS BIGINT) AS total_chars,
          array_to_string(list_transform(t[1:3], x -> upper(x)), ',')
            AS first3_upper
        FROM toks""")),

    // ---- q42: forward-fill interpolation — carry the last non-null
    // observation forward per key (time-series gap repair as one keyed
    // window, no self-join).
    GraftQuery(
      "q42_fill_forward",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy($"ts".asc, $"event_id".asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("pv", when($"event_type" === "purchase", $"value"))
          .select($"event_id", $"user_id",
            last($"pv", ignoreNulls = true).over(w).as("last_purchase"))
      },
      Some("""SELECT event_id, user_id,
          last_value(CASE WHEN event_type = 'purchase' THEN value END
            IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
        FROM events""")),

    // ---- q43: histogram bucketing via width_bucket (DuckDB lacks the
    // function → exact floor emulation; bin edges k/8 are binary-exact
    // for these constants, so edge values bucket identically).
    GraftQuery(
      "q43_histogram",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .select(width_bucket($"o_totalprice", lit(0.0), lit(400000.0), lit(8))
            .cast("int").as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 400000 THEN 9
            ELSE CAST(floor(o_totalprice / 50000) AS INT) + 1 END AS bucket,
          CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1""")),

    // ---- q44: winsorized mean — the outlier-robust average (clamp at
    // the p05/p95 quantiles, then average). The GLOBAL percentile goes
    // through the scale-safe two-pass Quantiles helper (the built-in
    // `percentile(col, array(...))` holds the entire column in one
    // ObjectHashAggregate buffer — the 100 TB killer); bounds rounded
    // onto the cent grid so the clamped column stays dsum-exact on both
    // engines. HALF_UP on the exact binary value mirrors DuckDB's
    // ties-away round() on the same double (prices are positive).
    GraftQuery(
      "q44_winsorized_mean",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        // With no non-null prices the global aggregate row carries NULL
        // bounds (see Quantiles.exact's empty-input contract) — fail
        // with a contract error, not a bare NPE from getDouble
        val b = graft.ops.Quantiles.exact(li, Nil, "l_extendedprice",
            Seq("lo" -> 0.05, "hi" -> 0.95))
          .head(1).headOption.filterNot(_.isNullAt(0))
          .getOrElse(throw new IllegalArgumentException(
            "q44: winsorization bounds undefined — lineitem has no " +
              "non-null l_extendedprice values"))
        val Seq(lo, hi) = Seq(b.getDouble(0), b.getDouble(1)).map(v =>
          BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        li.groupBy($"l_returnflag")
          .agg(Q.davg(greatest(least($"l_extendedprice", lit(hi)), lit(lo)))
            .as("wins_avg"))
      },
      Some(s"""WITH q AS (${graft.ops.Quantiles.oracleSql("lineitem",
            Nil, "l_extendedprice", Seq("lo" -> 0.05, "hi" -> 0.95))}),
          b AS (SELECT round(lo, 2) AS lo, round(hi, 2) AS hi FROM q)
        SELECT l_returnflag,
          (${Q.sqlDsum("greatest(least(l_extendedprice, hi), lo)")}
             / count(*)) AS wins_avg
        FROM lineitem, b GROUP BY l_returnflag""")),

    // ---- q45: exact global percentiles of an OFF-GRID double
    // (l_extendedprice · l_discount: products of grid values land on no
    // decimal grid, so q44's "histogram ≤ value domain" bound does not
    // apply — distinct count ≈ row count). Runs the BANDED two-pass
    // quantile: the only group-wide ordered window scans per-band
    // totals (O(#bands) rows), then refinement windows inside the ≤ 2
    // selected bands — no single window partition ever sees O(N) rows
    // (PlanSpec + QuantilesSpec pin the shape). The oracle replays the
    // plain percentile_cont math: banding changes the execution shape,
    // not the value.
    GraftQuery(
      "q45_banded_quantiles",
      (s, dir) => {
        import s.implicits._
        val v = t(s, dir, "lineitem")
          .select(($"l_extendedprice" * $"l_discount").as("disc_value"))
        graft.ops.Quantiles.exactBanded(v, Nil, "disc_value",
          Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99), bandWidth = 64.0)
      },
      Some(graft.ops.Quantiles.oracleSql("lineitem", Nil,
        "(l_extendedprice * l_discount)",
        Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))),
      notes = "banded rank pass: ordered window over band totals only, refinement inside selected bands"),

    // ---- q46: the GROUPED banded path under the same oracle — keyed
    // band windows end to end (no group-wide window at all), the
    // execution shape a per-key percentile over raw doubles takes at
    // scale. Same exact result as the unbanded grouped form, so the
    // shared oracle replay applies unchanged.
    GraftQuery(
      "q46_grouped_banded_quantiles",
      (s, dir) => {
        import s.implicits._
        val v = t(s, dir, "lineitem")
          .select($"l_returnflag",
            ($"l_extendedprice" * $"l_discount").as("disc_value"))
        graft.ops.Quantiles.exactBanded(v, Seq("l_returnflag"), "disc_value",
          Seq("p25" -> 0.25, "p75" -> 0.75), bandWidth = 64.0)
      },
      Some(graft.ops.Quantiles.oracleSql("lineitem", Seq("l_returnflag"),
        "(l_extendedprice * l_discount)",
        Seq("p25" -> 0.25, "p75" -> 0.75))),
      notes = "keyed banded quantiles: every window partitioned by (key, band) or key over band totals")
  )
}
