package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Approximate aggregates, explicit grouping sets, and structural JSON
  * (SURVEY §2b aggregation/scalar rows). At 100 TB the approx variants
  * are what users actually run: HLL++ and quantile sketches are
  * fixed-size, mergeable partial states — one shuffle of sketches, never
  * of values. Sketch internals differ from DuckDB's, so q09 gets a
  * rows-only gate; Round4OpsSpec asserts tolerance vs the exact answers.
  */
object ApproxQueries {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  def defs: Map[String, QueryDef] = Map(

    // HLL++ distinct sketch + approximate median, both mergeable partials
    "q09_agg_approx" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
             percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
               .as("approx_median_price")),
      None),

    // explicit GROUPING SETS with grouping_id (rollup/cube are gated as
    // q04/q05; this is the free-form shape)
    "q13_grouping_sets" -> QueryDef(
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                 round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
          FROM lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")),

    // approx_top_k heavy hitters (Spark 4): a bounded frequency sketch —
    // fixed size regardless of row count, mergeable partials, ONE pass.
    // At 100 TB this replaces the groupBy-count-sort-limit chain (full
    // shuffle of every distinct key) for "top domains / top languages"
    // style questions. When the tracked-item budget (default 10k) covers
    // the actual cardinality the sketch degenerates to EXACT counts —
    // event_type has 5 values, so the oracle is the plain exact top-3
    // (counts verified tie-free at both test SFs).
    "q93_approx_top_k" -> QueryDef(
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events")
        s.sql("""SELECT t.item AS event_type, t.count AS n
                 FROM (SELECT explode(approx_top_k(event_type, 3)) AS t
                       FROM events)""")
      },
      Some("""
        SELECT event_type, count(*) AS n
        FROM events GROUP BY 1 ORDER BY n DESC LIMIT 3""")),

    // from_json → typed struct → to_json round trip on events.props
    // (reference job/task parameters are arbitrary nested JSON), plus
    // schema_of_json inferring the DDL from a sample payload — how a
    // pipeline bootstraps the struct schema before committing to it
    "q61_json_struct" -> QueryDef(
      (s, d) => {
        val parsed = from_json(col("props"), propsSchema)
        Tables.events(s, d).filter(col("event_id") < 500)
          .select(col("event_id"),
                  parsed.getField("k").as("k"),
                  to_json(parsed).as("props_json"),
                  schema_of_json(lit("""{"k":1}""")).as("props_schema"))
      },
      Some("""
        SELECT event_id,
               CAST(props->>'$.k' AS INTEGER) AS k,
               to_json({'k': CAST(props->>'$.k' AS INTEGER)}) AS props_json,
               'STRUCT<k: BIGINT>' AS props_schema
        FROM events WHERE event_id < 500""")),

    // Mergeable-sketch rollup — the re-aggregation pattern that matters
    // at 100 TB: per-day HLL sketches of distinct users (fixed-size
    // binary partials) are UNIONED to per-type totals without touching
    // the raw rows again; a nightly job keeps day-level sketches and any
    // rollup (week/month/all-time) is a cheap sketch merge, never a
    // re-scan. The gate emits the estimate next to the exact count and a
    // ±5% flag; sketch internals aren't SQL-replicable → rows-only, with
    // the tolerance re-asserted in Round4OpsSpec.
    "q88_sketch_rollup" -> QueryDef(
      (s, d) => {
        val ev = Tables.events(s, d)
        val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"),
                               col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = daily.groupBy(col("event_type"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        merged.join(exact, Seq("event_type"))
          .withColumn("within_5pct",
            (abs(col("est_users") - col("exact_users")) <=
              col("exact_users") * 0.05).cast("long"))
          .select(col("event_type"), col("exact_users"),
                  col("est_users"), col("within_5pct"))
      },
      None),

    // Mergeable PERCENTILE rollup (q88's quantile sibling, with a
    // stronger verification story): day-grain integer HDR histograms of
    // price cents roll up to month by a pure count-sum — the corpus is
    // never rescanned at a coarser grain — and extraction reports the
    // bracketing bucket [est_lo, est_hi] provably containing the true
    // percentile (width ≤ 2^-5 relative). Unlike KLL/GK sketches the
    // histogram is order-free integer math, so where q88 is rows-only by
    // design, EVERY stage here (bit-length bucketing, rollup, rank
    // extraction) replays in DuckDB and the gate is hash-oracled.
    "q108_quantile_rollup" -> QueryDef(
      (s, d) => {
        import graft.operators.QuantileRollup
        val li = Tables.lineitem(s, d)
          .withColumn("cents",
            round(col("l_extendedprice") * 100).cast("long"))
          .withColumn("month", date_trunc("month", col("l_shipdate")))
          .withColumn("day", date_trunc("day", col("l_shipdate")))
        val daily = QuantileRollup.histogram(li, "cents", Seq("month", "day"))
        val monthly = QuantileRollup.rollup(daily, Seq("month"))
        QuantileRollup.percentiles(monthly, Seq("month"), Seq(0.5, 0.95, 0.99))
      },
      Some("""
        WITH v AS (SELECT date_trunc('month', l_shipdate) AS month,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                   FROM lineitem),
        b AS (SELECT month, cents,
                     greatest(length(bin(cents)) - 6, 0) AS sh FROM v),
        h AS (SELECT month,
                     (cents >> sh) << sh AS bucket_lo,
                     ((cents >> sh) << sh) + ((CAST(1 AS BIGINT) << sh) - 1) AS bucket_hi,
                     count(*) AS cnt
              FROM b GROUP BY 1, 2, 3),
        c AS (SELECT month, bucket_lo, bucket_hi, cnt,
                     sum(cnt) OVER (PARTITION BY month ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER (PARTITION BY month) AS n
              FROM h),
        p AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE),
                             CAST(0.99 AS DOUBLE)]) AS p)
        SELECT month, p, bucket_lo AS est_lo, bucket_hi AS est_hi,
               CAST(n AS BIGINT) AS n
        FROM c CROSS JOIN p
        WHERE cum >= ceil(p * n) AND cum - cnt < ceil(p * n)"""))
  )
}
