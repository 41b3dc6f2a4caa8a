package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.DataQuality
import graft.operators.DataQuality.Check._

/** Data-quality gates (SURVEY §2c extensions): one-pass column
  * profiling and declarative constraint validation — the admission
  * checks a 100 TB ingest runs before data reaches the corpus. Both
  * gates are exactly DuckDB-oracled: every metric is a plain aggregate
  * both engines compute identically (doubles rounded to 6 dp; numeric
  * min/max kept as DOUBLE columns — never round-tripped through
  * engine-specific string formatting).
  */
object ProfilingQueries {

  def defs: Map[String, QueryDef] = Map(

    // One-pass profile of 5 lineitem columns (2 keys, 2 measures, 1
    // string, 1 timestamp): a single aggregate scan; the report is
    // O(columns). exact=true (count_distinct through one Expand) only so
    // DuckDB can replay every metric — q102b below is the production
    // default (HLL, no Expand).
    "q102_data_profile" -> QueryDef(
      (s, d) => DataQuality.profile(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
            "l_shipdate"), exact = true),
      Some("""
        SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
               count(*) - count(l_orderkey) AS n_nulls,
               count(DISTINCT l_orderkey) AS n_distinct,
               round(CAST(min(l_orderkey) AS DOUBLE), 6) AS min_num,
               round(CAST(max(l_orderkey) AS DOUBLE), 6) AS max_num,
               round(avg(CAST(l_orderkey AS DOUBLE)), 6) AS avg_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
               count(DISTINCT l_quantity),
               round(CAST(min(l_quantity) AS DOUBLE), 6),
               round(CAST(max(l_quantity) AS DOUBLE), 6),
               round(avg(CAST(l_quantity AS DOUBLE)), 6),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
               count(DISTINCT l_extendedprice),
               round(CAST(min(l_extendedprice) AS DOUBLE), 6),
               round(CAST(max(l_extendedprice) AS DOUBLE), 6),
               round(avg(CAST(l_extendedprice AS DOUBLE)), 6),
               CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               min(l_returnflag), max(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
               count(DISTINCT l_shipdate),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR)
        FROM lineitem""")),

    // The SAME profile on the default approx path — one HLL sketch per
    // column, NO Expand, the shape a 100 TB wide-table profile actually
    // plans. Rows-only gate (HLL estimates are engine-specific, so no
    // value oracle); DataQualitySpec ties it to q102's exact counts
    // within sketch tolerance.
    "q102b_data_profile_approx" -> QueryDef(
      (s, d) => DataQuality.profile(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
            "l_shipdate")),
      None),

    // Constraint report over orders: completeness, key uniqueness, value
    // range (deliberately tight so the fail branch is exercised),
    // domain membership, format regex — ONE aggregate pass — plus
    // referential integrity vs customer as a broadcast anti-join
    // aggregate. Output is one row per check.
    "q103_constraint_report" -> QueryDef(
      (s, d) => DataQuality.validate(Tables.orders(s, d), Seq(
        Completeness("o_custkey"),
        Completeness("o_orderdate"),
        Uniqueness("o_orderkey"),
        InRange("o_totalprice", 0.0, 300000.0),
        InSet("o_orderstatus", Seq("O", "F", "P")),
        Matches("o_orderpriority", "^[1-5]-"),
        ForeignKey("o_custkey", Tables.customer(s, d), "c_custkey"))),
      Some("""
        SELECT 'completeness' AS check_name, 'o_custkey' AS col_name,
               round(count(o_custkey) * 1.0 / count(*), 6) AS metric,
               round(count(o_custkey) * 1.0 / count(*), 6) >= 1.0 AS passed
        FROM orders
        UNION ALL
        SELECT 'completeness', 'o_orderdate',
               round(count(o_orderdate) * 1.0 / count(*), 6),
               round(count(o_orderdate) * 1.0 / count(*), 6) >= 1.0
        FROM orders
        UNION ALL
        SELECT 'uniqueness', 'o_orderkey',
               CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS DOUBLE),
               count(o_orderkey) - count(DISTINCT o_orderkey) = 0
        FROM orders
        UNION ALL
        SELECT 'range', 'o_totalprice',
               CAST(count(*) FILTER (o_totalprice IS NOT NULL
                 AND (o_totalprice < 0.0 OR o_totalprice > 300000.0)) AS DOUBLE),
               count(*) FILTER (o_totalprice IS NOT NULL
                 AND (o_totalprice < 0.0 OR o_totalprice > 300000.0)) = 0
        FROM orders
        UNION ALL
        SELECT 'in_set', 'o_orderstatus',
               CAST(count(*) FILTER (o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O', 'F', 'P')) AS DOUBLE),
               count(*) FILTER (o_orderstatus IS NOT NULL
                 AND o_orderstatus NOT IN ('O', 'F', 'P')) = 0
        FROM orders
        UNION ALL
        SELECT 'pattern', 'o_orderpriority',
               CAST(count(*) FILTER (o_orderpriority IS NOT NULL
                 AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS DOUBLE),
               count(*) FILTER (o_orderpriority IS NOT NULL
                 AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) = 0
        FROM orders
        UNION ALL
        SELECT 'foreign_key', 'o_custkey',
               CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
                     ON o.o_custkey = c.c_custkey
                     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
                    AS DOUBLE),
               (SELECT count(*) FROM orders o LEFT JOIN customer c
                ON o.o_custkey = c.c_custkey
                WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) = 0""")))
}
