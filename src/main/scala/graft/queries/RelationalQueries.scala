package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2b relational surface, declared as Spark built-ins and
  * checked against the DuckDB oracle. Every query is a deterministic SET
  * of rows (unique ordering keys wherever limits/windows are involved) so
  * the driver's sort-then-hash compare is stable. Float aggregates are
  * rounded on BOTH sides to absorb summation-order differences.
  *
  * Scale notes (100 TB bar): every query below starts from a parquet scan
  * with column pruning + predicate pushdown (verified via explain in
  * PlanSpec); joins against the small dimension tables are broadcast;
  * aggregations are hash-based with map-side partial aggregation, which
  * is Catalyst's default for all of these shapes.
  */
object RelationalQueries {

  def defs: Map[String, QueryDef] = agg ++ filterProject ++ joins ++
    windows ++ sortLimit ++ setOps

  /** Dialect-shared SQL (runs verbatim on spark.sql AND DuckDB): TPC-H Q3
    * shape — shipping-priority revenue over customer ⋈ orders ⋈ lineitem.
    */
  /** Dialect-shared EXISTS: runs verbatim on spark.sql and DuckDB. */
  val existsSubquerySql: String = """
    SELECT c_mktsegment, count(*) AS n_with_urgent
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment"""

  /** Dialect-shared aggregate FILTER clause. */
  val filteredAggSql: String = """
    SELECT o_orderpriority,
           count(*) AS n,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4) AS avg_f
    FROM orders GROUP BY o_orderpriority"""

  val shippingPrioritySql: String = """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 10"""

  val lateralTopkSql: String = """
    SELECT n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2) c"""

  // ---------------------------------------------------------------- agg

  private def agg: Map[String, QueryDef] = Map(
    // TPC-H Q1 shape: the classic pricing summary. Partial agg map-side,
    // 2-col group key, all numeric sums rounded for oracle parity.
    "q01_agg_pricing_summary" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""")),

    "q02_agg_count_distinct" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_lines"),
          count(lit(1)).as("n_rows")),
      Some("""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
               CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_lines,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),

    "q03_agg_stats" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price")),
      Some("""
        SELECT l_linestatus,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem GROUP BY l_linestatus""")),

    // ROLLUP: subtotal rows carry NULL group keys in both engines.
    "q04_agg_rollup" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"),
               round(sum(col("c_acctbal")), 2).as("sum_bal"))
      },
      Some("""
        SELECT n_name, c_mktsegment, count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment)""")),

    "q05_agg_cube" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("l_quantity")), 2).as("sum_qty")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // Exact percentiles: Spark `percentile` and DuckDB `quantile_cont`
    // both use linear interpolation over the sorted values.
    "q06_agg_percentile" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75_price")),
      Some("""
        SELECT l_returnflag,
               round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 6) AS p25_qty,
               round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 6) AS p50_qty,
               round(CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE), 6) AS p75_price
        FROM lineitem GROUP BY l_returnflag""")),

    // collect_set surface: emitted as a canonical sorted CSV string so the
    // set-typed result hashes identically across engines.
    "q07_agg_collect_set" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n")),
      Some("""
        SELECT o_orderpriority,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
               count(*) AS n
        FROM orders GROUP BY o_orderpriority""")),

    "q08_agg_having" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("n_orders") >= 5),
      Some("""
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 5""")),

    // grouping_id over rollup: the bitmask that tells subtotal rows from
    // genuine NULL group keys — required for any downstream consumer of
    // rollup output.
    "q86_grouping_id" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
             grouping_id().cast("long").as("gid"),
             grouping(col("o_orderpriority")).cast("long").as("g_pri")),
      Some("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri
        FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""")),

    // bitwise aggregates: fold per-event flag bits into a per-user
    // capability mask — bit_or = "ever did", bit_and = "always carries",
    // bit_xor = parity. One hash-agg, map-side combinable.
    "q81_bitwise_agg" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .withColumn("flag",
          (when(col("event_type") === "click", 1L)
            .when(col("event_type") === "view", 2L)
            .when(col("event_type") === "purchase", 4L)
            .otherwise(8L)) + 16L)
        .groupBy(col("user_id"))
        .agg(expr("bit_or(flag)").as("seen_mask"),
             expr("bit_and(flag)").as("common_mask"),
             expr("bit_xor(flag)").as("parity_mask"),
             count(lit(1)).as("n")),
      Some("""
        SELECT user_id,
               CAST(bit_or(flag) AS BIGINT) AS seen_mask,
               CAST(bit_and(flag) AS BIGINT) AS common_mask,
               CAST(bit_xor(flag) AS BIGINT) AS parity_mask,
               count(*) AS n
        FROM (SELECT user_id,
                     CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                          WHEN 'purchase' THEN 4 ELSE 8 END + 16 AS flag
              FROM events)
        GROUP BY user_id""")),

    // arg-extrema + mode: which row attains the extreme, not the extreme
    // itself (max_by/min_by = DuckDB arg_max/arg_min). Tie-free on this
    // data (checked at sf0.01 and sf0.1); mode ditto.
    "q17_argmax_mode" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("max_by(l_orderkey, l_extendedprice)").as("top_price_order"),
          expr("min_by(l_orderkey, l_extendedprice)").as("bottom_price_order"),
          // deterministic=true pins frequency ties to the LOWEST value —
          // both engines' bare mode() is engine-defined on ties, and at
          // sf0.001 two quantities really do tie (caught by the r12
          // sf0.001 sweep); the oracle replays lowest-most-frequent
          expr("mode(l_quantity, true)").cast("double").as("modal_qty"),
          round(max(col("l_extendedprice")), 2).as("max_price")),
      Some("""
        WITH mc AS (SELECT l_returnflag, l_quantity, count(*) AS n
                    FROM lineitem GROUP BY 1, 2),
        md AS (SELECT l_returnflag, l_quantity FROM (
                 SELECT l_returnflag, l_quantity,
                        row_number() OVER (PARTITION BY l_returnflag
                          ORDER BY n DESC, l_quantity ASC) AS rn
                 FROM mc) WHERE rn = 1)
        SELECT l.l_returnflag,
               arg_max(l.l_orderkey, l.l_extendedprice) AS top_price_order,
               arg_min(l.l_orderkey, l.l_extendedprice) AS bottom_price_order,
               CAST(any_value(md.l_quantity) AS DOUBLE) AS modal_qty,
               round(max(l.l_extendedprice), 2) AS max_price
        FROM lineitem l JOIN md ON l.l_returnflag = md.l_returnflag
        GROUP BY 1""")),

    // linear-regression aggregates (the profiling pass a feature pipeline
    // runs before fitting anything): slope/intercept/r² of price ~ qty
    "q18_regression" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"),
          round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n")),
      Some("""
        SELECT l_linestatus,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        FROM lineitem GROUP BY l_linestatus""")),

    // exact decimal aggregation: money must not float. Both engines sum
    // exact integer CENTS (round(x*100) of the identical parquet double is
    // bit-deterministic, and BIGINT has one representation everywhere —
    // unlike DECIMAL, whose parquet/arrow encodings diverged between Spark
    // and DuckDB and made the r03 hash comparator red on equal values).
    // The 2-dp money sums are derived from those identical cent totals.
    "q35_decimal_exact_sum" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
        .select(col("l_returnflag"),
          col("price_cents"),
          round(col("price_cents") / 100.0, 2).as("sum_price"),
          col("qty_cents"),
          round(col("qty_cents") / 100.0, 2).as("sum_qty")),
      Some("""
        SELECT l_returnflag,
               price_cents,
               round(price_cents / 100.0, 2) AS sum_price,
               qty_cents,
               round(qty_cents / 100.0, 2) AS sum_qty
        FROM (
          SELECT l_returnflag,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
                 CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
          FROM lineitem GROUP BY l_returnflag)""")),

    // fixed-width histogram via width_bucket (data profiling); the oracle
    // replays Spark's bucket math verbatim — floor((v-lo)/((hi-lo)/nb))+1
    // with under/overflow buckets 0 and nb+1.
    "q38_histogram_width_bucket" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .groupBy(width_bucket(col("o_totalprice"), lit(0.0), lit(400000.0), lit(20))
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
             round(min(col("o_totalprice")), 2).as("lo"),
             round(max(col("o_totalprice")), 2).as("hi")),
      Some("""
        SELECT CASE WHEN o_totalprice < 0.0 THEN 0
                    WHEN o_totalprice >= 400000.0 THEN 21
                    ELSE CAST(floor((o_totalprice - 0.0) / ((400000.0 - 0.0) / 20.0)) AS BIGINT) + 1
               END AS bucket,
               count(*) AS n,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM orders GROUP BY 1""")))

  // ------------------------------------------------- filter / projection

  private def filterProject: Map[String, QueryDef] = Map(
    // Full boolean algebra + isin + like + between; Catalyst pushes all
    // of it into the parquet scan (PushedFilters).
    "q10_filter_boolean_algebra" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .filter(
          (col("o_orderstatus").isin("O", "F") && col("o_totalprice") > 1000.0
            || col("o_orderpriority").like("1-%"))
          && !(col("o_custkey") % 7 === 0)
          && col("o_totalprice").between(500.0, 400000.0))
        .select(col("o_orderkey"), col("o_orderstatus"),
                round(col("o_totalprice"), 2).as("price")),
      Some("""
        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        FROM orders
        WHERE ((o_orderstatus IN ('O','F') AND o_totalprice > 1000.0)
               OR o_orderpriority LIKE '1-%')
          AND NOT (o_custkey % 7 = 0)
          AND o_totalprice BETWEEN 500.0 AND 400000.0""")),

    // Null-safe equality (<=> / IS NOT DISTINCT FROM) over a column made
    // nullable with nullif.
    "q11_filter_null_safe" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .filter(col("seg") <=> lit(null).cast("string") || col("seg") <=> lit("MACHINERY"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n")),
      Some("""
        SELECT c_mktsegment, count(*) AS n FROM (
          SELECT c_mktsegment, nullif(c_mktsegment, 'BUILDING') AS seg
          FROM customer)
        WHERE seg IS NOT DISTINCT FROM NULL OR seg IS NOT DISTINCT FROM 'MACHINERY'
        GROUP BY c_mktsegment""")),

    "q12_project_compute" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"),
          when(col("l_quantity") >= 40, "bulk")
            .when(col("l_quantity") >= 10, "mid")
            .otherwise("small").as("qty_band"),
          (col("l_tax") > 0.05).as("high_tax"))
        .filter(col("l_orderkey") % 100 === 0),
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS net,
               CASE WHEN l_quantity >= 40 THEN 'bulk'
                    WHEN l_quantity >= 10 THEN 'mid'
                    ELSE 'small' END AS qty_band,
               l_tax > 0.05 AS high_tax
        FROM lineitem WHERE l_orderkey % 100 = 0""")))

  // --------------------------------------------------------------- joins

  private def joins: Map[String, QueryDef] = Map(
    // Blocked fuzzy join (entity resolution): part names collapse to
    // distinct values with counts BEFORE any pairwise scoring, blocked on
    // the trailing word, Levenshtein ≤ 2 within block; row-pair counts
    // recovered arithmetically. Never scores raw-row pairs.
    "q67_fuzzy_join_blocked" -> QueryDef(
      (s, d) => graft.operators.EntityResolution.blockedFuzzyPairs(
        Tables.part(s, d)
          .withColumn("noun", split(col("p_name"), " ").getItem(1)),
        attrCol = "p_name", blockCol = "noun", maxDist = 2),
      Some("""
        WITH v AS (SELECT string_split(p_name, ' ')[2] AS blk, p_name AS value,
                          count(*) AS cnt
                   FROM part GROUP BY 1, 2)
        SELECT a.blk AS block, a.value AS value_a, b.value AS value_b,
               CAST(levenshtein(a.value, b.value) AS BIGINT) AS lev,
               CAST(a.cnt * b.cnt AS BIGINT) AS n_row_pairs
        FROM v a JOIN v b ON a.blk = b.blk AND a.value < b.value
        WHERE levenshtein(a.value, b.value) BETWEEN 1 AND 2""")),

    // TPC-H Q5 shape: 4-way join; nation/region broadcast, orders↔lineitem
    // shuffle-hash/SMJ on the fact keys.
    "q20_join_revenue_by_nation" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""")),

    // LEFT join keeps customers with zero orders (count(o_orderkey) skips
    // the NULLs from the unmatched side).
    "q21_join_left_outer" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_mktsegment"))
          .agg(countDistinct(col("c_custkey")).as("n_cust"),
               count(col("o_orderkey")).as("n_orders"),
               sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_orderless"))
      },
      Some("""
        SELECT c_mktsegment,
               CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust,
               count(o_orderkey) AS n_orders,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment""")),

    "q22_join_right_outer" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "right")
          .groupBy(col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_orders"),
               countDistinct(col("c_custkey")).as("n_cust"))
      },
      Some("""
        SELECT c_mktsegment, count(o_orderkey) AS n_orders,
               CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // FULL outer of two per-nation aggregates (some nations may lack
    // suppliers at small SF).
    "q23_join_full_outer" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d).groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
        val su = Tables.supplier(s, d).groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, c("c_nationkey") === su("s_nationkey"), "full")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      },
      Some("""
        SELECT coalesce(c.k, s.k) AS nationkey,
               coalesce(c.n_cust, 0) AS n_cust,
               coalesce(s.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        ON c.k = s.k""")),

    // LEFT SEMI = EXISTS: customers owning at least one urgent open order.
    "q24_join_semi" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
        GROUP BY c_mktsegment""")),

    // LEFT ANTI = NOT EXISTS: parts never shipped.
    "q25_join_anti" -> QueryDef(
      (s, d) => {
        val p = Tables.part(s, d)
        val li = Tables.lineitem(s, d)
        p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
          .groupBy(col("p_brand")).agg(count(lit(1)).as("n_unsold"))
      },
      Some("""
        SELECT p_brand, count(*) AS n_unsold FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        GROUP BY p_brand""")),

    "q26_join_cross" -> QueryDef(
      (s, d) => {
        val r = Tables.region(s, d).select(col("r_name"))
        val n = Tables.nation(s, d)
        r.crossJoin(n).groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_pairs"),
               sum(col("n_nationkey").cast("long")).as("key_sum"))
      },
      Some("""
        SELECT r_name, count(*) AS n_pairs,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM region CROSS JOIN nation GROUP BY r_name""")),

    // The full SQL surface end-to-end: a TPC-H Q3-shaped 3-table join,
    // dialect-shared SQL text — the SAME string runs on spark.sql and the
    // DuckDB oracle (temp views registered over the parquet tables).
    // Exact (interpolated) group quantiles — the non-approx twin of q09:
    // Spark's percentile() and DuckDB's quantile_cont share linear
    // interpolation over the sorted group.
    "q14_exact_quantiles" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
             round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"),
             count(lit(1)).as("n")),
      Some("""
        SELECT c_mktsegment,
               round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
               round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
               count(*) AS n
        FROM customer GROUP BY 1""")),

    // Winsorization (outlier clipping at per-group p05/p95) — the numeric
    // cleaning pass a feature pipeline runs before training. The quantile
    // table is a per-group singleton joined back by broadcast; the corpus
    // itself is scanned once and never shuffled for the clip.
    "q36_winsorize" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bounds = li.groupBy(col("l_returnflag").as("rf"))
          .agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
               expr("percentile(l_extendedprice, 0.95)").as("hi"))
        li.join(broadcast(bounds), col("l_returnflag") === col("rf"))
          .withColumn("clipped", least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
          .groupBy(col("l_returnflag"))
          .agg(round(sum(col("clipped")), 2).as("winsorized_sum"),
               sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L)).as("n_clip_low"),
               sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_clip_high"),
               count(lit(1)).as("n"))
      },
      Some("""
        WITH q AS (
          SELECT l_returnflag AS rf,
                 quantile_cont(l_extendedprice, 0.05) AS lo,
                 quantile_cont(l_extendedprice, 0.95) AS hi
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag,
               round(sum(least(greatest(l_extendedprice, lo), hi)), 2) AS winsorized_sum,
               CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
               CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
               count(*) AS n
        FROM lineitem JOIN q ON l_returnflag = rf
        GROUP BY l_returnflag""")),

    // One-pass APPROX winsorize — the 100 TB form of q36: the per-group
    // p05/p95 come from a percentile_approx SKETCH (mergeable partials,
    // map-side combined — no per-group sort anywhere), so the only sort
    // q36 carries disappears. Rows-only gate (DuckDB's approx_quantile is
    // a different sketch); Round4OpsSpec ties it to the exact q36 within
    // tolerance.
    "q36b_winsorize_approx" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bounds = li.groupBy(col("l_returnflag").as("rf"))
          .agg(percentile_approx(col("l_extendedprice"), lit(0.05), lit(10000)).as("lo"),
               percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("hi"))
        li.join(broadcast(bounds), col("l_returnflag") === col("rf"))
          .withColumn("clipped", least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
          .groupBy(col("l_returnflag"))
          .agg(round(sum(col("clipped")), 2).as("winsorized_sum"),
               sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L)).as("n_clip_low"),
               sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L)).as("n_clip_high"),
               count(lit(1)).as("n"))
      },
      None),

    // Correlated EXISTS subquery — one dialect-shared string on spark.sql
    // AND DuckDB; Catalyst decorrelates it to a left-semi join.
    "q15_exists_subquery" -> QueryDef(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(existsSubquerySql)
      },
      Some(existsSubquerySql)),

    // Aggregate FILTER clause (per-aggregate predicates in one pass —
    // no self-joins, no CASE pyramids); dialect-shared string.
    "q16_filtered_agg" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(filteredAggSql)
      },
      Some(filteredAggSql)),

    // SQL scripting (Spark 4): a BEGIN…END compound with typed local
    // variables — procedural control flow runs ON the engine (each
    // statement is a full Catalyst plan), replacing driver-side glue
    // code for multi-step parameterized jobs. The script's last SELECT
    // is the result; the oracle inlines the variable bindings.
    "q99_sql_scripting" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        val prev = s.conf.getOption("spark.sql.scripting.enabled")
        s.conf.set("spark.sql.scripting.enabled", "true")
        try s.sql("""
          BEGIN
            DECLARE threshold DOUBLE DEFAULT 100000.0;
            DECLARE n BIGINT;
            SET n = (SELECT count(*) FROM orders
                     WHERE o_totalprice > threshold);
            SELECT n AS n_big, threshold AS cutoff;
          END""")
        finally prev match {
          case Some(p) => s.conf.set("spark.sql.scripting.enabled", p)
          case None => s.conf.unset("spark.sql.scripting.enabled")
        }
      },
      Some("""
        SELECT count(*) AS n_big, 100000.0 AS cutoff
        FROM orders WHERE o_totalprice > 100000.0""")),

    // SQL pipe syntax (Spark 4): linear dataflow-ordered SQL — each |>
    // stage consumes the previous result, so the text reads in execution
    // order like the DataFrame API. Same Catalyst plan as the nested
    // form; the oracle is the ANSI equivalent.
    "q97_pipe_syntax" -> QueryDef(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""
          FROM orders
          |> WHERE o_totalprice > 100000
          |> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total
             GROUP BY o_orderpriority
          |> WHERE n > 10
          |> ORDER BY o_orderpriority
          |> LIMIT 3""")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders WHERE o_totalprice > 100000
        GROUP BY o_orderpriority HAVING count(*) > 10
        ORDER BY o_orderpriority LIMIT 3""")),

    // Parameterized SQL (named parameter markers, Spark 3.4+): values
    // bind as literals AFTER parsing — the analytics-service shape that
    // kills string-splicing injection and keeps one plan cache entry per
    // query shape. Oracle inlines the same constants.
    "q92_parameterized_sql" -> QueryDef(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql(
          """SELECT c_mktsegment, count(*) AS n,
                    round(avg(c_acctbal), 4) AS avg_bal
             FROM customer
             WHERE c_acctbal > :minbal AND c_mktsegment != :excluded
             GROUP BY c_mktsegment""",
          Map("minbal" -> 1000, "excluded" -> "MACHINERY"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS avg_bal
        FROM customer
        WHERE c_acctbal > 1000 AND c_mktsegment != 'MACHINERY'
        GROUP BY c_mktsegment""")),

    "q39_sql_shipping_priority" -> QueryDef(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(RelationalQueries.shippingPrioritySql)
      },
      Some(RelationalQueries.shippingPrioritySql)),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    // dialect-shared string runs verbatim on spark.sql AND DuckDB.
    // Spark decorrelates this into a join + per-group limit; it is the
    // SQL-surface twin of the top-k-per-group operator family.
    "q87_lateral_topk" -> QueryDef(
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation")
        Tables.customer(s, d).createOrReplaceTempView("customer")
        s.sql(RelationalQueries.lateralTopkSql)
      },
      Some(RelationalQueries.lateralTopkSql)),

    // Per-group top-k via the custom plan operator (bounded heaps, partial
    // pruning before the shuffle — graft.plans.TopKPerGroup) — same
    // contract as q30's window formulation, same oracle shape.
    "q37_topk_custom_plan" -> QueryDef(
      (s, d) => graft.plans.TopKPerGroup.perGroup(
          Tables.customer(s, d),
          groupCols = Seq("c_mktsegment"),
          orderCols = Seq("c_acctbal" -> true, "c_custkey" -> false),
          k = 3)
        .select(col("c_mktsegment"), col("rank").as("rn"), col("c_custkey"),
                round(col("c_acctbal"), 2).as("bal")),
      Some("""
        SELECT c_mktsegment, rn, c_custkey, round(c_acctbal, 2) AS bal FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer)
        WHERE rn <= 3""")),

    // Salted skew join: identical result multiset to the plain join (the
    // oracle IS the plain join) — salting only respreads the partitions.
    "q19_join_salted" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        // salt basis = the two columns the aggregate reads anyway:
        // deterministic on recompute AND pruning-neutral
        graft.operators.SkewJoin.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
          salt = 8, saltBasis = Seq("l_orderkey", "l_extendedprice"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
               round(sum(col("l_extendedprice")), 2).as("gross"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
               round(sum(l_extendedprice), 2) AS gross
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""")),

    // Unpivot/melt: wide measure columns to (id, metric, value) rows —
    // Dataset.unpivot compiles to Expand (each input row emitted once per
    // measure in one pass, no join/union re-scan).
    "q44_unpivot_measures" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          variableColumnName = "metric", valueColumnName = "value"),
      Some("""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
               l_quantity AS value
        FROM lineitem WHERE l_orderkey <= 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem WHERE l_orderkey <= 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        FROM lineitem WHERE l_orderkey <= 100""")),

    // Equi + theta (inequality) join condition.
    "q27_join_theta" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        c.join(su, c("c_nationkey") === su("s_nationkey")
                 && c("c_acctbal") < su("s_acctbal"))
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""
        SELECT c_nationkey AS nationkey, count(*) AS n_pairs
        FROM customer JOIN supplier
          ON c_nationkey = s_nationkey AND c_acctbal < s_acctbal
        GROUP BY c_nationkey""")),

    // Explicit broadcast hint: dimension build side replicated, no shuffle
    // of the fact table.
    "q28_join_broadcast_dim" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(round(sum(col("l_extendedprice")), 2).as("gross"),
               count(lit(1)).as("n"))
      },
      Some("""
        SELECT p_brand, round(sum(l_extendedprice), 2) AS gross, count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    // As-of join (union + forward-fill window — one shuffle, no range
    // fan-out; graft.operators.AsOfJoin). Oracle: DuckDB's native ASOF.
    "q29_join_asof" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        // dedupe the history side to one row per (key, instant) for
        // deterministic ties, mirrored in the oracle
        val ord = Tables.orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"))
        graft.operators.AsOfJoin.asOf(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate",
          payload = Seq("o_orderkey", "o_orderdate"))
      },
      Some("""
        WITH ord AS (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
        FROM events e ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""")),

    // Banded range join (graft.operators.RangeJoin): point-in-interval
    // matching as an EQUI-join on time buckets + exact filter, instead of
    // the O(n·m) BroadcastNestedLoopJoin Spark plans for inequality-only
    // conditions. Here: lineitems shipped within a week of each urgent
    // order's date.
    "q43_range_join_banded" -> QueryDef(
      (s, d) => {
        val week = 7L * 86400
        val iv = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("start_s"),
            (unix_timestamp(col("o_orderdate")) + week).as("end_s"))
        // aggregate-before-join: ship timestamps are day-granular, so
        // collapsing 600k lineitems to ~2.4k (day, count) rows first cuts
        // the join output from O(lineitems·7) pair rows to O(orders·7) —
        // the standard partial-aggregation pushdown for dense range joins
        val pts = Tables.lineitem(s, d)
          .groupBy(unix_timestamp(col("l_shipdate")).as("ship_s"))
          .agg(count(lit(1)).as("cnt"))
        graft.operators.RangeJoin.banded(pts, iv,
            "ship_s", "start_s", "end_s", bandWidth = 8L * 86400)
          .groupBy(col("o_orderkey"))
          .agg(sum(col("cnt")).as("shipped_nearby"))
      },
      Some("""
        SELECT o_orderkey, count(*) AS shipped_nearby
        FROM orders JOIN lineitem
          ON epoch(l_shipdate) BETWEEN epoch(o_orderdate)
                                   AND epoch(o_orderdate) + 604800
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1""")))

  // ------------------------------------------------------------- windows

  private def windows: Map[String, QueryDef] = Map(
    // Time-RANGE window frame: 7-day trailing revenue per customer. The
    // frame is value-based (interval on the ORDER BY timestamp), not
    // row-based — each row's window is [ts − 6 days, ts]. Spark needs a
    // numeric ORDER BY for rangeBetween, so the timestamp orders by its
    // epoch-millis; identical arithmetic to DuckDB's INTERVAL frame
    // (UTC, no DST). One shuffle by customer, sorted once.
    "q42_window_range_frame" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(unix_millis(col("o_orderdate").cast("timestamp")))
          .rangeBetween(-6L * 86400000L, 0L)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                  count(lit(1)).over(w).as("n_in_window"),
                  round(sum(col("o_totalprice")).over(w), 4).as("trailing_rev"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderdate,
               count(*) OVER w AS n_in_window,
               round(sum(o_totalprice) OVER w, 4) AS trailing_rev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)""")),

    // Top-3 per group via row_number with a total (unique) ordering.
    "q30_window_topk_per_group" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
                  round(col("c_acctbal"), 2).as("bal"))
      },
      Some("""
        SELECT c_mktsegment, rn, c_custkey, round(c_acctbal, 2) AS bal FROM (
          SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer) WHERE rn <= 3""")),

    // Running (cumulative) sum per customer, unique order within partition.
    "q31_window_running_sum" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .filter(col("o_custkey") % 10 === 0)
          .withColumn("cum_spend", round(sum(col("o_totalprice")).over(w), 2))
          .select(col("o_custkey"), col("o_orderkey"), col("cum_spend"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
        FROM orders WHERE o_custkey % 10 = 0""")),

    "q32_window_lag_lead" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .filter(col("o_custkey") % 20 === 0)
          .select(
            col("o_custkey"), col("o_orderkey"),
            round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 4).as("delta_prev"),
            lead(col("o_orderkey"), 1).over(w).as("next_order"),
            first(col("o_orderkey")).over(w).as("first_order"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice - lag(o_totalprice, 1) OVER w, 4) AS delta_prev,
               lead(o_orderkey, 1) OVER w AS next_order,
               first_value(o_orderkey) OVER w AS first_order
        FROM orders WHERE o_custkey % 20 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""")),

    "q33_window_rank_ntile" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
        Tables.supplier(s, d)
          .select(col("s_nationkey"), col("s_suppkey"),
                  rank().over(w).cast("long").as("rnk"),
                  dense_rank().over(w).cast("long").as("drnk"),
                  ntile(4).over(w).cast("long").as("quartile"))
      },
      Some("""
        SELECT s_nationkey, s_suppkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)""")),

    // Distribution window functions: percent_rank / cume_dist /
    // nth_value — the ECDF shapes quality-threshold selection uses.
    "q80_window_distribution" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
        Tables.supplier(s, d)
          .select(col("s_nationkey"), col("s_suppkey"),
                  round(percent_rank().over(w), 6).as("pr"),
                  round(cume_dist().over(w), 6).as("cd"),
                  nth_value(col("s_suppkey"), 2).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                    .as("second_poorest"))
      },
      Some("""
        SELECT s_nationkey, s_suppkey,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd,
               nth_value(s_suppkey, 2) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_poorest
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)""")),

    // Sliding rows-frame moving average.
    "q34_window_moving_avg" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(-3, 0)
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderpriority"), col("o_orderkey"),
                  round(avg(col("o_totalprice")).over(w), 4).as("ma4"))
      },
      Some("""
        SELECT o_orderpriority, o_orderkey,
               round(avg(o_totalprice) OVER (
                 PARTITION BY o_orderpriority ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ma4
        FROM orders WHERE o_orderkey % 50 = 0""")))

  // -------------------------------------------------------- sort / limit

  private def sortLimit: Map[String, QueryDef] = Map(
    // Top-k: Catalyst compiles orderBy+limit into TakeOrderedAndProject
    // (per-partition heap + driver merge — no full sort at 100 TB).
    "q40_topk_orders" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price")),
      Some("""
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""")),

    "q41_limit_offset" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .offset(10).limit(15)
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal")),
      Some("""
        SELECT c_custkey, round(c_acctbal, 2) AS bal
        FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 15 OFFSET 10""")),

    // contiguous global enumeration: ids 0..n-1 in doc_id order via the
    // two-phase range-partition + offset scheme — row_number() OVER a
    // global ORDER BY would collapse to one partition at 100 TB
    "q78_contiguous_ids" -> QueryDef(
      (s, d) => graft.operators.RowIds.withContiguousIds(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "global_id", col("doc_id"))
        .select(col("doc_id"), col("global_id")),
      Some("""
        SELECT doc_id,
               row_number() OVER (ORDER BY doc_id) - 1 AS global_id
        FROM documents""")))

  // ------------------------------------------------------------- set ops

  private def setOps: Map[String, QueryDef] = Map(
    "q45_union_distinct" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        a.union(b).distinct().groupBy().agg(count(lit(1)).as("n_cust"))
      },
      Some("""
        SELECT count(*) AS n_cust FROM (
          SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""")),

    "q46_intersect" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val jan = o.filter(month(col("o_orderdate")) === 1).select(col("o_custkey"))
        val feb = o.filter(month(col("o_orderdate")) === 2).select(col("o_custkey"))
        jan.intersect(feb)
      },
      Some("""
        SELECT o_custkey FROM orders WHERE month(o_orderdate) = 1
        INTERSECT
        SELECT o_custkey FROM orders WHERE month(o_orderdate) = 2""")),

    "q47_except" -> QueryDef(
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"))
        val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
        c.except(o)
      },
      Some("""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders""")),

    // unionByName: schema-drift-safe union — branches with DIFFERENT
    // column order (and a column missing on one side) align by NAME,
    // nulls filling the gap. Positional union would silently mix the
    // columns; this is the shape for appending batches whose schemas
    // drifted (the mergeSchema read twin is src13).
    "q96_union_by_name" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val a = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_totalprice"),
                  col("o_orderstatus"))
        val b = o.filter(col("o_orderstatus") === "P")
          .select(col("o_orderstatus"), col("o_orderkey")) // reordered, one col missing
        a.unionByName(b, allowMissingColumns = true)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
               round(sum(col("o_totalprice")), 2).as("price_sum"))
      },
      Some("""
        SELECT o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS price_sum
        FROM (
          SELECT o_orderkey, o_totalprice, o_orderstatus
          FROM orders WHERE o_orderpriority = '1-URGENT'
          UNION ALL
          SELECT o_orderkey, NULL AS o_totalprice, o_orderstatus
          FROM orders WHERE o_orderstatus = 'P')
        GROUP BY o_orderstatus""")),

    // Bag-semantics set ops: EXCEPT ALL / INTERSECT ALL keep duplicate
    // MULTIPLICITY (a customer with 5 total and 2 'F' orders survives
    // exceptAll 3 times) — distinct-based q46/q47 can't express this.
    // Spark plans both as one hash aggregate over (key, count) with a
    // replicate generator — no sort, one shuffle.
    "q95_bag_set_ops" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val all = o.select(col("o_custkey"))
        val f   = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        all.exceptAll(f).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_surviving"))
      },
      Some("""
        SELECT o_custkey, count(*) AS n_surviving FROM (
          SELECT o_custkey FROM orders
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY o_custkey""")),

    // INTERSECT ALL — q95's other half: multiset intersection keeps
    // min(count_left, count_right) copies per key. A customer with 5
    // orders total and 2 'F' orders intersects 2 times.
    "q100_intersect_all" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val all = o.select(col("o_custkey"))
        val f   = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        all.intersectAll(f).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_common"))
      },
      Some("""
        SELECT o_custkey, count(*) AS n_common FROM (
          SELECT o_custkey FROM orders
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY o_custkey""")),

    "q48_dropduplicates" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .dropDuplicates(),
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""")))
}
