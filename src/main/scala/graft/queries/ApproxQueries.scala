package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Approximate aggregates, explicit grouping sets, and structural JSON
  * (SURVEY §2b aggregation/scalar rows). At 100 TB the approx variants
  * are what users actually run: HLL++ and quantile sketches are
  * fixed-size, mergeable partial states — one shuffle of sketches, never
  * of values. Sketch internals differ from DuckDB's, so q09 gets a
  * rows-only gate; ApproxSpec asserts tolerance vs the exact answers.
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
    // the tolerance re-asserted in ApproxSpec.
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
      None)
  )
}
