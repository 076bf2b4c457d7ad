package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import Q._

/** The general relational surface (SURVEY §2.2): scans, projection/filter,
  * joins of every flavor, aggregation (incl. rollup/cube/grouping sets),
  * windows, sorts/top-k, set ops, scalar functions, subqueries.
  *
  * All plans are declarative DataFrame programs — Catalyst owns pushdown,
  * pruning, join selection, AQE. Scale notes sit on each query.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    // ---- q01: full-scan hash aggregation (TPC-H Q1 shape). Map-side
    // partial agg + tiny shuffle (6 groups); scales linearly.
    GraftQuery(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
            davg($"l_quantity").as("avg_qty"),
            davg($"l_extendedprice").as("avg_price"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")),

    // ---- q02: selective filter + narrow projection. The filter and the
    // 4-column ReadSchema must reach the parquet scan (PushedFilters).
    GraftQuery(
      "q02_filter_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                  $"l_discount" > 0.05 && $"l_quantity" < 10.0)
          .select($"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1.0 - l_discount) AS net_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount > 0.05 AND l_quantity < 10.0""")),

    // ---- q03: 3-way join + agg + total-order top-k (TPC-H Q3 shape).
    // customer is small → broadcast; lineitem⋈orders shuffles on orderkey.
    GraftQuery(
      "q03_top_unshipped_orders",
      (s, dir) => {
        import s.implicits._
        val cutoff = lit("1997-06-01").cast("timestamp")
        val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
        val l = t(s, dir, "lineitem").filter($"l_shipdate" > cutoff)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some(s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-01'
          AND l_shipdate  > TIMESTAMP '1997-06-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ---- q04: broadcast dimension join (part is tiny relative to fact).
    GraftQuery(
      "q04_brand_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand")
          .agg(
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT p_brand,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
        count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    // ---- q05: star join through region→nation→customer→orders→lineitem
    // (TPC-H Q5 shape). The three dims broadcast; one shuffle join on the
    // fact keys; AQE can re-plan skew.
    GraftQuery(
      "q05_region_nation_revenue",
      (s, dir) => {
        import s.implicits._
        val r = t(s, dir, "region").filter($"r_name" === "ASIA")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
        val l = t(s, dir, "lineitem")
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
      },
      Some(s"""SELECT n_name,
        ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name""")),

    // ---- q06: fully-pushed-down scan + single global agg (TPC-H Q6).
    GraftQuery(
      "q06_forecast_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
                  $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
                  $"l_quantity" < 24.0)
          .agg(dsum($"l_extendedprice" * $"l_discount", 4).as("revenue"))
      },
      Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""")),

    // ---- q07: left-semi join (EXISTS) — no row multiplication, the
    // build side only carries the key.
    GraftQuery(
      "q07_semi_join",
      (s, dir) => {
        import s.implicits._
        val o96 = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
                  $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
          .select($"o_custkey")
        t(s, dir, "customer")
          .join(o96, $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers
        FROM customer WHERE EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01')
        GROUP BY c_mktsegment""")),

    // ---- q08: left-anti join (NOT EXISTS).
    GraftQuery(
      "q08_anti_join",
      (s, dir) => {
        import s.implicits._
        val o95h1 = t(s, dir, "orders")
          .filter($"o_orderdate" < lit("1995-07-01").cast("timestamp"))
          .select($"o_custkey")
        t(s, dir, "customer")
          .join(o95h1, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
        FROM customer WHERE NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate < TIMESTAMP '1995-07-01')""")),

    // ---- q09: per-group top-k via ranking window — the scalable top-k
    // idiom (no global sort; one shuffle on the partition key).
    GraftQuery(
      "q09_topk_per_customer",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3""")),

    // ---- q10: running / sliding analytics windows over the event stream.
    // Decimal-exact running sum keeps the frame aggregation
    // order-independent (DuckDB uses segment trees, Spark a running
    // accumulator — raw doubles would drift).
    GraftQuery(
      "q10_running_window",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .withColumn("running_value",
            sum($"value".cast("decimal(18,2)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .withColumn("prev_value", lag($"value", 1).over(w))
          .withColumn("rn", row_number().over(w))
          .select($"event_id", $"user_id", $"running_value", $"prev_value", $"rn")
      },
      Some("""SELECT event_id, user_id,
          CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
          lag(value, 1) OVER w AS prev_value,
          row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")),

    // ---- q11: rollup (hierarchical grouping sets).
    GraftQuery(
      "q11_rollup",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // ---- q12: cube.
    GraftQuery(
      "q12_cube",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        ${sqlDsum("o_totalprice")} AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // ---- q13: exact distinct aggregation (expands to a two-phase agg).
    GraftQuery(
      "q13_distinct_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            countDistinct($"o_custkey").as("n_customers"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        count(*) AS n_orders FROM orders GROUP BY o_orderstatus""")),

    // ---- q14: set operations (UNION/INTERSECT/EXCEPT, set semantics).
    GraftQuery(
      "q14_set_ops",
      (s, dir) => {
        import s.implicits._
        val custNations = t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        val suppNations = t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
        val both   = custNations.intersect(suppNations).withColumn("side", lit("both"))
        val custOnly = custNations.except(suppNations).withColumn("side", lit("customer_only"))
        both.union(custOnly)
      },
      Some("""SELECT nationkey, 'both' AS side FROM
          (SELECT c_nationkey AS nationkey FROM customer
           INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'customer_only' AS side FROM
          (SELECT c_nationkey AS nationkey FROM customer
           EXCEPT SELECT s_nationkey FROM supplier)""")),

    // ---- q15: scalar subquery (computed once, broadcast as a literal).
    GraftQuery(
      "q15_above_avg_balance",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        // exact decimal avg → identical double on both sides
        val avgBal = c.agg(davg($"c_acctbal").as("a")).select($"a")
        c.crossJoin(broadcast(avgBal))
          .filter($"c_acctbal" > $"a")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_above_avg"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n_above_avg FROM customer,
        (SELECT ${sqlDavg("c_acctbal")} AS a FROM customer)
        WHERE c_acctbal > a GROUP BY c_mktsegment""")),

    // ---- q16: string functions + CASE.
    GraftQuery(
      "q16_string_funcs",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .select(
            $"p_partkey",
            upper($"p_brand").as("brand_uc"),
            substring($"p_name", 1, 8).as("name_prefix"),
            length($"p_name").as("name_len"),
            concat_ws("#", $"p_brand", $"p_type").as("brand_type"),
            when($"p_size" < 10, "small")
              .when($"p_size" < 30, "medium")
              .otherwise("large").as("size_class"))
      },
      Some("""SELECT p_partkey, upper(p_brand) AS brand_uc,
        substring(p_name, 1, 8) AS name_prefix, length(p_name) AS name_len,
        concat_ws('#', p_brand, p_type) AS brand_type,
        CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'medium'
             ELSE 'large' END AS size_class
        FROM part""")),

    // ---- q17: date bucketing + aggregation (month grain).
    GraftQuery(
      "q17_monthly_orders",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy(
            year($"o_orderdate").as("o_year"),
            month($"o_orderdate").as("o_month"))
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(month(o_orderdate) AS INT) AS o_month,
        count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total
        FROM orders GROUP BY 1, 2""")),

    // ---- q18: grouping sets via the SQL entry point (temp views).
    GraftQuery(
      "q18_grouping_sets",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    // ---- q19: as-of lookup expressed as a running window (most recent
    // 'error' event at-or-before each event, per user). One shuffle on
    // user_id; no join explosion.
    GraftQuery(
      "q19_asof_last_error",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("last_error_ts",
            max(when($"event_type" === "error", $"ts")).over(w))
          .select($"event_id", $"user_id", $"ts", $"event_type", $"last_error_ts")
      },
      Some("""SELECT event_id, user_id, ts, event_type,
          max(CASE WHEN event_type = 'error' THEN ts END) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_ts
        FROM events""")),

    // ---- q20: global sort + limit (small result; the sort happens on
    // the already-aggregated side).
    GraftQuery(
      "q20_top_customers",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(dsum($"o_totalprice").as("spend"), count(lit(1)).as("n_orders"))
          .orderBy($"spend".desc, $"o_custkey")
          .limit(25)
      },
      Some(s"""SELECT o_custkey, ${sqlDsum("o_totalprice")} AS spend,
        count(*) AS n_orders FROM orders GROUP BY o_custkey
        ORDER BY spend DESC, o_custkey LIMIT 25""")),

    // ---- q21: correlated scalar subquery (Catalyst decorrelates it
    // into an aggregate + join). Decimal-exact inner avg keeps the
    // comparison boundary identical across engines.
    GraftQuery(
      "q21_correlated_subquery",
      (s, dir) => {
        Tables(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
          WHERE o_totalprice > 2 * (
            SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE o_totalprice > 2 * (
          SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*)
          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""")),

    // ---- q22: salted two-stage aggregation over a 3-value (maximally
    // skewed) key — result provably equals the plain groupBy (the
    // oracle), reducer load bounded by rows/nSalts.
    GraftQuery(
      "q22_salted_agg",
      (s, dir) => {
        import s.implicits._
        graft.ops.Skew.saltedSumCount(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity",
          saltSource = $"l_orderkey", nSalts = 32)
      },
      Some(s"""SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_l_quantity,
        count(*) AS n FROM lineitem GROUP BY l_returnflag""")),

    // ---- q23: left outer join against an aggregated subquery (customers
    // with zero orders in the window keep a 0 row).
    GraftQuery(
      "q23_left_outer_join",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" < lit("1995-07-01").cast("timestamp"))
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n0"), dsum($"o_totalprice").as("spend0"))
        t(s, dir, "customer")
          .join(o, $"c_custkey" === $"o_custkey", "left_outer")
          .select($"c_custkey",
            coalesce($"n0", lit(0L)).as("n_orders"),
            coalesce($"spend0", lit(0.0)).as("spend"))
      },
      Some(s"""SELECT c_custkey,
        CAST(coalesce(n0, 0) AS BIGINT) AS n_orders,
        CAST(coalesce(spend0, 0.0) AS DOUBLE) AS spend
        FROM customer LEFT JOIN (
          SELECT o_custkey, count(*) AS n0, ${sqlDsum("o_totalprice")} AS spend0
          FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01'
          GROUP BY o_custkey) o ON c_custkey = o_custkey""")),

    // ---- q24: full outer join of two aggregates over different tables.
    GraftQuery(
      "q24_full_outer_join",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").groupBy($"c_nationkey".as("nk"))
          .agg(count(lit(1)).as("n_customers"))
        val su = t(s, dir, "supplier").groupBy($"s_nationkey".as("nk"))
          .agg(count(lit(1)).as("n_suppliers"))
        c.join(su, Seq("nk"), "full_outer")
          .select($"nk".as("nationkey"),
            coalesce($"n_customers", lit(0L)).as("n_customers"),
            coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
      },
      Some("""SELECT coalesce(c.nk, s.nk) AS nationkey,
        CAST(coalesce(c.n, 0) AS BIGINT) AS n_customers,
        CAST(coalesce(s.n, 0) AS BIGINT) AS n_suppliers
        FROM (SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY 1) c
        FULL OUTER JOIN
             (SELECT s_nationkey AS nk, count(*) AS n FROM supplier GROUP BY 1) s
        ON c.nk = s.nk""")),

    // ---- q25: exact median (interpolated at even counts; inputs on a
    // 2-decimal grid → midpoints near the half-cent grid, so round-to-4
    // stays clear of every rounding boundary). Computed via the
    // scale-safe two-pass Quantiles helper — the built-in `median`
    // buffers the whole group in one ObjectHashAggregate buffer; the
    // two-pass form's state is bounded by distinct cent values.
    GraftQuery(
      "q25_median",
      (s, dir) => {
        import s.implicits._
        graft.ops.Quantiles.exact(t(s, dir, "orders"),
            Seq("o_orderstatus"), "o_totalprice", Seq("p50" -> 0.5))
          .select($"o_orderstatus",
            round($"p50", 4).as("median_price"), $"n")
      },
      Some(s"""WITH q AS (${graft.ops.Quantiles.oracleSql("orders",
          Seq("o_orderstatus"), "o_totalprice", Seq("p50" -> 0.5))})
        SELECT o_orderstatus, round(p50, 4) AS median_price, n FROM q""")),

    // ---- q26: array aggregation (collect distinct values, sorted for
    // a deterministic list). The aggregation is a real array agg
    // (collect_set → sort_array); the final array_join flattens to a
    // scalar so the harness compare (pandas sort) can hash the rows —
    // list cells are unhashable there.
    GraftQuery(
      "q26_array_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(array_join(sort_array(collect_set($"o_orderpriority")), "|")
            .as("priorities"),
            size(collect_set($"o_orderpriority")).as("n_distinct"))
      },
      Some("""SELECT o_orderstatus,
        array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|')
          AS priorities,
        count(DISTINCT o_orderpriority) AS n_distinct
        FROM orders GROUP BY o_orderstatus"""))
  )
}
