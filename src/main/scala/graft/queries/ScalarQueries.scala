package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2b scalar-function surface: string, regexp, date/time, math,
  * array (+ higher-order), map, JSON, hash, conditional. All codegen'd
  * Spark built-ins — no UDFs — so each projection stays inside a single
  * WholeStageCodegen span over the parquet scan.
  */
object ScalarQueries {

  def defs: Map[String, QueryDef] = Map(

    // Collated comparison semantics (Spark 4): UTF8_LCASE makes equality,
    // DISTINCT, and GROUP BY case-insensitive AT THE TYPE LEVEL — no
    // lower() rewrite needed at every use site, and the collation rides
    // the column through joins/aggs. The oracle normalizes with lower()
    // (equivalent for case-insensitive distinctness). The CASE mixes the
    // case deterministically so the gate actually exercises the collation.
    "q94_collation" -> QueryDef(
      (s, d) => {
        Tables.part(s, d).createOrReplaceTempView("part")
        // p_type is all-uppercase in the fixtures, so HALF the rows are
        // lowered: the distinct set really contains case-variants of the
        // same type, and a case-SENSITIVE distinct would overcount and
        // diverge from the oracle — the collation is load-bearing
        s.sql("""
          SELECT p_brand,
                 count(DISTINCT (CASE WHEN p_partkey % 2 = 0
                                      THEN lower(p_type) ELSE p_type END)
                       COLLATE UTF8_LCASE) AS n_types
          FROM part GROUP BY p_brand""")
      },
      Some("""
        SELECT p_brand,
               count(DISTINCT lower(CASE WHEN p_partkey % 2 = 0
                                         THEN lower(p_type) ELSE p_type END))
                 AS n_types
        FROM part GROUP BY p_brand""")),

    "q50_string_funcs" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") % 25 === 0)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 10, 6).as("sub"),
          concat(col("c_mktsegment"), lit("|"), col("c_name")).as("cat"),
          length(col("c_name")).cast("long").as("len"),
          trim(lit("  pad  ")).as("trimmed"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          reverse(col("c_mktsegment")).as("rev"),
          repeat(lit("ab"), 3).as("rep"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr")),
      Some("""
        SELECT c_custkey,
               upper(c_name) AS up,
               lower(c_mktsegment) AS lo,
               substring(c_name, 10, 6) AS sub,
               concat(c_mktsegment, '|', c_name) AS cat,
               CAST(length(c_name) AS BIGINT) AS len,
               trim('  pad  ') AS trimmed,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
               CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
               reverse(c_mktsegment) AS rev,
               repeat('ab', 3) AS rep,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr
        FROM customer WHERE c_custkey % 25 = 0""")),

    "q51_regexp_funcs" -> QueryDef(
      (s, d) => Tables.part(s, d)
        .filter(col("p_name").rlike("^(red|blue) "))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(red|blue) ([a-z]+)$", 2).as("noun"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("long").as("brand_num"),
          col("p_name").rlike("w.dget").as("is_widget")),
      Some("""
        SELECT p_partkey,
               regexp_extract(p_name, '^(red|blue) ([a-z]+)$', 2) AS noun,
               CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
               regexp_matches(p_name, 'w.dget') AS is_widget
        FROM part WHERE regexp_matches(p_name, '^(red|blue) ')""")),

    "q52_datetime_funcs" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .filter(col("event_id") % 100 === 0)
        .select(
          col("event_id"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("mo"),
          dayofmonth(col("ts")).cast("long").as("dom"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("mi"),
          (dayofweek(col("ts")) - 1).cast("long").as("dow_sun0"),
          date_trunc("day", col("ts")).as("day_start"),
          unix_timestamp(col("ts")).as("epoch_s"),
          datediff(col("ts"), lit("2024-01-01").cast("timestamp")).cast("long").as("days_since"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"),
          to_date(col("ts")).as("as_date")),
      Some("""
        SELECT event_id,
               CAST(year(ts) AS BIGINT) AS y,
               CAST(month(ts) AS BIGINT) AS mo,
               CAST(day(ts) AS BIGINT) AS dom,
               CAST(hour(ts) AS BIGINT) AS h,
               CAST(minute(ts) AS BIGINT) AS mi,
               CAST(dayofweek(ts) AS BIGINT) AS dow_sun0,
               date_trunc('day', ts) AS day_start,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS days_since,
               strftime(ts, '%Y-%m-%d %H') AS fmt,
               CAST(ts AS DATE) AS as_date
        FROM events WHERE event_id % 100 = 0""")),

    "q53_math_funcs" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 200 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("r1"),
          floor(col("l_extendedprice")).cast("double").as("fl"),
          ceil(col("l_extendedprice")).cast("double").as("ce"),
          abs(col("l_discount") - lit(0.05)).as("ab"),
          round(pow(col("l_quantity"), 2), 4).as("sq"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          signum(col("l_quantity") - 25).as("sg"),
          (col("l_orderkey") % 7).as("md"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) AS r1,
               CAST(floor(l_extendedprice) AS DOUBLE) AS fl,
               CAST(ceil(l_extendedprice) AS DOUBLE) AS ce,
               abs(l_discount - 0.05) AS ab,
               round(pow(l_quantity, 2), 4) AS sq,
               round(ln(l_extendedprice), 6) AS ln_p,
               round(log10(l_extendedprice), 6) AS log10_p,
               round(sqrt(l_quantity), 6) AS sqrt_q,
               round(exp(l_discount), 6) AS exp_d,
               CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
               l_orderkey % 7 AS md,
               greatest(l_tax, l_discount) AS gr,
               least(l_tax, l_discount) AS le
        FROM lineitem WHERE l_orderkey % 200 = 0""")),

    "q54_array_funcs" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 5 === 0)
        .withColumn("ws", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          size(array_distinct(col("ws"))).cast("long").as("n_uniq"),
          array_contains(col("ws"), "spark").as("has_spark"),
          element_at(col("ws"), 1).as("first_word"),
          array_join(slice(col("ws"), 1, 3), " ").as("head3"),
          element_at(array_sort(array_distinct(col("ws"))), 1).as("min_word"),
          array_join(array_sort(slice(col("ws"), 1, 5)), ",").as("sorted_head")),
      Some("""
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(list_distinct(ws)) AS BIGINT) AS n_uniq,
               list_contains(ws, 'spark') AS has_spark,
               ws[1] AS first_word,
               array_to_string(ws[1:3], ' ') AS head3,
               list_sort(list_distinct(ws))[1] AS min_word,
               array_to_string(list_sort(ws[1:5]), ',') AS sorted_head
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        WHERE doc_id % 5 = 0""")),

    // array set algebra (sorted before display so both engines' internal
    // orderings cancel): union / intersect / except / overlap of the
    // first-half vs second-half token sets of each doc.
    "q85_array_setops" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("a", slice(col("ws"), 1, 30))
        .withColumn("b", slice(col("ws"), 31, 30))
        .select(
          col("doc_id"),
          // coalesce matches the oracle's COALESCE(..., ''): a null-text
          // row yields empty sets on both engines, not NULL-vs-'' skew
          coalesce(array_join(array_sort(array_distinct(concat(col("a"), col("b")))), ","), lit("")).as("union_ab"),
          coalesce(array_join(array_sort(array_intersect(col("a"), col("b"))), ","), lit("")).as("inter_ab"),
          coalesce(array_join(array_sort(array_except(col("a"), col("b"))), ","), lit("")).as("except_ab"),
          arrays_overlap(col("a"), col("b")).as("overlaps")),
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
          WHERE doc_id % 7 = 0),
        ab AS (SELECT doc_id,
                      COALESCE(ws[1:30], CAST([] AS VARCHAR[])) AS a,
                      COALESCE(ws[31:60], CAST([] AS VARCHAR[])) AS b FROM t)
        SELECT doc_id,
               COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS union_ab,
               COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))), ','), '') AS inter_ab,
               COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS except_ab,
               list_has_any(a, b) AS overlaps
        FROM ab""")),

    // ANSI-safe arithmetic: try_divide/try_add return NULL instead of
    // killing the job on /0 or overflow — the right default inside a
    // 100 TB pipeline where one pathological row must not fail the run.
    // Oracle mirrors with NULLIF guards.
    "q84_try_arithmetic" -> QueryDef(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 7 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(expr("try_divide(l_extendedprice, l_quantity - 25)"), 6)
            .as("price_per_excess_unit"),
          expr("try_add(CAST(9223372036854775807 AS BIGINT), l_orderkey + 1)")
            .as("overflow_is_null"),
          round(expr("try_divide(l_discount, l_tax)"), 6).as("disc_per_tax")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice / NULLIF(l_quantity - 25, 0), 6) AS price_per_excess_unit,
               CAST(NULL AS BIGINT) AS overflow_is_null,
               round(l_discount / NULLIF(l_tax, 0), 6) AS disc_per_tax
        FROM lineitem WHERE l_orderkey % 7 = 0""")),

    // generator with ordinal: posexplode — the tokenize-with-positions
    // shape every sequence pipeline needs (token order survives the
    // explode). One generate per row, no shuffle.
    "q49_posexplode_tokens" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok")),
      Some("""
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, parts[i] AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS parts
              FROM documents WHERE doc_id < 50),
             LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i)""")),

    // Higher-order functions: transform / filter / aggregate / exists.
    "q55_array_hof" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .withColumn("ws", split(col("text"), " "))
        .select(
          col("doc_id"),
          expr("aggregate(transform(ws, w -> length(w)), 0L, (acc, x) -> acc + x)").as("char_sum"),
          expr("size(filter(ws, w -> length(w) > 4))").cast("long").as("n_long"),
          expr("exists(ws, w -> w = 'vector')").as("has_vector"),
          expr("size(filter(ws, w -> w rlike '^[bs]'))").cast("long").as("n_bs")),
      Some("""
        SELECT doc_id,
               CAST(list_sum(list_transform(ws, w -> strlen(w))) AS BIGINT) AS char_sum,
               CAST(len(list_filter(ws, w -> strlen(w) > 4)) AS BIGINT) AS n_long,
               list_contains(list_transform(ws, w -> w = 'vector'), true) AS has_vector,
               CAST(len(list_filter(ws, w -> regexp_matches(w, '^[bs]'))) AS BIGINT) AS n_bs
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        WHERE doc_id % 7 = 0""")),

    "q56_map_funcs" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .withColumn("m", map(col("event_type"), col("n")))
        .select(
          element_at(map_keys(col("m")), 1).as("k"),
          element_at(map_values(col("m")), 1).as("v"),
          size(col("m")).cast("long").as("m_size")),
      Some("""
        SELECT map_keys(m)[1] AS k, map_values(m)[1] AS v,
               CAST(cardinality(m) AS BIGINT) AS m_size
        FROM (SELECT map([event_type], [n]) AS m
              FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1))""")),

    // Ordered string aggregation (listagg shape): deterministic via
    // sort_array before the join — matches DuckDB's ORDER BY string_agg.
    "q63_string_agg" -> QueryDef(
      (s, d) => Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
             count(lit(1)).as("n")),
      Some("""
        SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
               count(*) AS n
        FROM nation GROUP BY 1""")),

    // Edit distance for fuzzy matching (near-dup titles/brands): every
    // part name against its type label, bucketed by distance.
    "q64_edit_distance" -> QueryDef(
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
                levenshtein(col("p_name"), lower(col("p_type"))).cast("long").as("dist"))
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("first_part")),
      Some("""
        SELECT CAST(levenshtein(p_name, lower(p_type)) AS BIGINT) AS dist,
               count(*) AS n, min(p_partkey) AS first_part
        FROM part GROUP BY 1""")),

    // Spark 4 VariantType: parse_json into the binary variant encoding
    // once, then typed variant_get extraction — the semi-structured path
    // that replaces repeated string re-parsing at scale.
    "q62_variant_json" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", variant_get(col("v"), "$.k", "long"))
        .groupBy(col("k") % 10)
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
        .select(col("(k % 10)").as("k_mod"), col("n"), col("k_sum")),
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events GROUP BY 1""")),

    "q57_json_funcs" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(
          sum(col("k")).as("k_sum"),
          round(avg(col("k")), 6).as("k_avg"),
          max(col("k")).as("k_max"),
          count(when(col("k") > 50, 1)).as("n_high")),
      Some("""
        SELECT event_type,
               CAST(sum(k) AS BIGINT) AS k_sum,
               round(avg(k), 6) AS k_avg,
               max(k) AS k_max,
               count(CASE WHEN k > 50 THEN 1 END) AS n_high
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type""")),

    // MD5 parity matters: it is the reference's schema-fingerprint hash
    // (IntegrationUtils.scala:19-35).
    "q58_hash_funcs" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") % 50 === 0)
        .select(
          col("c_custkey"),
          md5(col("c_name").cast("binary")).as("name_md5"),
          sha2(col("c_name").cast("binary"), 256).as("name_sha256"),
          substring(md5(concat(col("c_name"), lit("|"), col("c_mktsegment")).cast("binary")), 1, 8).as("salted8")),
      Some("""
        SELECT c_custkey,
               md5(c_name) AS name_md5,
               sha256(c_name) AS name_sha256,
               substring(md5(concat(c_name, '|', c_mktsegment)), 1, 8) AS salted8
        FROM customer WHERE c_custkey % 50 = 0""")),

    // xxhash64: Spark-native 64-bit hash (no DuckDB analog → rows-only).
    // Used as the hash family for MinHash/SimHash in the dedup operators.
    "q59_hash_xxhash64" -> QueryDef(
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"), xxhash64(col("c_name")).as("h"),
                crc32(col("c_name").cast("binary")).as("crc")),
      None),

    "q60_conditional_funcs" -> QueryDef(
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
          when(col("o_totalprice") > 200000, "big").otherwise("small").as("bucket"),
          nvl2(nullif(col("o_orderpriority"), lit("5-LOW")), lit("prio"), lit("low")).as("prio_flag"),
          ifnull(nullif(col("o_custkey"), col("o_custkey")), lit(-1L)).as("always_default"))
      ,
      Some("""
        SELECT o_orderkey,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
               CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket,
               CASE WHEN nullif(o_orderpriority, '5-LOW') IS NOT NULL
                    THEN 'prio' ELSE 'low' END AS prio_flag,
               coalesce(nullif(o_custkey, o_custkey), -1) AS always_default
        FROM orders WHERE o_orderkey % 100 = 0"""))
  )
}
