package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{QueryDef, Tables}
import graft.sources.AvroRecordFiles
import org.apache.spark.sql.functions._

/** Non-parquet source/sink formats (SURVEY §2b scans row): csv, json,
  * binaryFile, and Avro container files. Each query round-trips
  * driver-generated parquet data through the format and reads it back, so
  * the DuckDB oracle (reading the original parquet) checks lossless
  * encode+decode — schema, types, and values.
  *
  * binaryFile is the analog of the reference's raw stage, where fetched
  * payloads are opaque byte files (`executor/.../run/
  * FetchRawDataOperation.java:59-64`); Avro container files are its
  * processed-record wire format (see [[graft.sources.AvroRecordFiles]]).
  */
object SourceQueries {

  /** Per-sf scratch dir so sf0.001/sf0.01/sf0.1 runs never mix files. */
  private def exportDir(sfDir: String, name: String): String = {
    val sf = Paths.get(sfDir).getFileName.toString
    Paths.get(sys.props("java.io.tmpdir"), "graft_export", sf, name).toString
  }

  /** Documents written with a parquet BLOOM FILTER on doc_id and small
    * row groups (so several exist to skip). Sorted by doc_id so min/max
    * stats AND the bloom both get a fair shot; shared by the src16 gate
    * and BloomFilterSpec. Freshness-guarded against fixture regeneration
    * like the streaming stagings.
    */
  private[queries] def stagedBloomDir(s: org.apache.spark.sql.SparkSession,
                                      d: String): String = {
    val out = Staging.stageIfStale(d, "docs_bloom", "documents.parquet") { dir =>
      Tables.documents(s, d).sort(col("doc_id")).coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "100000")
        .option("parquet.block.size", (64 * 1024).toString)
        .parquet(dir.toString)
    }.toString
    out
  }

  def defs: Map[String, QueryDef] = Map(

    "src01_csv_roundtrip" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "nation_csv")
        val nation = Tables.nation(s, d)
        nation.write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(nation.schema).option("header", "true").csv(out)
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation")),

    // line-oriented text: one string column on disk; id + payload are
    // packed as "id<TAB>text" on write and split (limit 2) on read, the
    // standard flat-corpus interchange shape.
    "src09_text_roundtrip" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "documents_text")
        Tables.documents(s, d)
          .select(concat(col("doc_id"), lit("\t"), col("text")).as("value"))
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .select(split(col("value"), "\t", 2).as("parts"))
          .select(col("parts").getItem(0).cast("long").as("doc_id"),
                  col("parts").getItem(1).as("text"))
      },
      Some("SELECT doc_id, text FROM documents")),

    "src02_json_roundtrip" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "supplier_json")
        val supplier = Tables.supplier(s, d)
        supplier.write.mode("overwrite").json(out)
        s.read.schema(supplier.schema).json(out)
      },
      Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")),

    // opaque byte payloads on disk → (id, size, checksum); the raw-stage
    // fetch shape. File fan-out is driver-side ONLY because this models an
    // external system dropping files; the read path is the operator.
    "src03_binaryfile_raw" -> QueryDef(
      (s, d) => {
        val out = Paths.get(exportDir(d, "raw_bin"))
        if (Files.exists(out)) {
          Files.list(out).forEach(p => Files.delete(p))
        } else Files.createDirectories(out)
        Tables.documents(s, d).filter(col("doc_id") < 20)
          .select(col("doc_id"), col("text")).collect()
          .foreach { r =>
            Files.write(out.resolve(f"doc_${r.getLong(0)}%04d.bin"),
              r.getString(1).getBytes(StandardCharsets.UTF_8))
          }
        s.read.format("binaryFile").load(out.toString)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1).cast("long").as("doc_id"),
            length(col("content")).cast("long").as("n_bytes"),
            md5(col("content")).as("content_md5"))
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents WHERE doc_id < 20""")),

    // small-file compaction: many-file input rewritten to byte-derived
    // file count; the oracle checks content is untouched
    // Catalog tables: saveAsTable into the session catalog, insertInto
    // appends through the catalog's resolved schema, spark.table reads it
    // back — the managed-table sink path (vs src01-05's path-based IO).
    "src08_table_catalog" -> QueryDef(
      (s, d) => {
        // a fresh process has an empty metastore but may inherit a stale
        // warehouse LOCATION from a previous run — drop both first
        s.sql("DROP TABLE IF EXISTS graft_suppliers")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), "graft_suppliers")
        val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(loc)) fs.delete(loc, true)
        val suppliers = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"), round(col("s_acctbal"), 2).as("bal"))
        suppliers.filter(col("s_suppkey") % 2 === 0)
          .write.mode("overwrite").saveAsTable("graft_suppliers")
        suppliers.filter(col("s_suppkey") % 2 =!= 0)
          .write.insertInto("graft_suppliers")
        s.table("graft_suppliers")
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("bal")), 2).as("bal_sum"))
      },
      Some("""
        SELECT s_nationkey, count(*) AS n,
               round(sum(round(s_acctbal, 2)), 2) AS bal_sum
        FROM supplier GROUP BY 1""")),

    "src07_compaction" -> QueryDef(
      (s, d) => {
        val in = exportDir(d, "events_small")
        val out = exportDir(d, "events_compacted")
        Tables.events(s, d).select(col("event_id"), col("user_id"))
          .repartition(16).write.mode("overwrite").parquet(in)
        val (bytes, _) = graft.operators.Compaction.footprint(s, in)
        graft.operators.Compaction.compact(s, in, out, math.max(1, bytes / 2))
        s.read.parquet(out)
      },
      Some("SELECT event_id, user_id FROM events")),

    // Parquet BLOOM FILTERS: the opt-in point-lookup skipper. Min/max
    // page stats cannot prune an equality probe on a high-cardinality
    // column unless the data is sorted by it; a bloom filter skips whole
    // row groups for ids they definitely do not contain — at 100 TB the
    // difference between a needle lookup scanning every row group of
    // every file and touching ~one. The gate probes three ids through
    // the bloom-enabled staging; the oracle replays the probe on the
    // source table, so equal results prove the skipping is LOSSLESS.
    // BloomFilterSpec asserts the footers actually carry the filter (and
    // that it answers membership correctly).
    "src16_parquet_bloom" -> QueryDef(
      (s, d) => s.read.parquet(stagedBloomDir(s, d))
        .filter(col("doc_id").isin(7L, 99L, 311L))
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE doc_id IN (7, 99, 311)""")),

    // Z-order (Morton) layout: interleave the bits of two grid coords so
    // one sort key co-locates rows close in BOTH dimensions; the gate
    // checks the per-bucket bounding boxes a file-level skipper would
    // persist (oracle replicates the interleave bit-for-bit in SQL).
    // The write path (repartitionByRange on zvalue) is asserted in
    // ZOrderSpec, incl. measured skipping vs a linear sort.
    "src10_zorder_stats" -> QueryDef(
      (s, d) => {
        val orders = Tables.orders(s, d).select(
          col("o_totalprice").cast("double").as("x"),
          col("o_custkey").cast("double").as("y"))
        graft.operators.ZOrder.bucketStats(orders, "x", "y", bits = 8, bucketShift = 10)
          .select(col("bucket"), col("n"),
            round(col("min_x"), 2).as("min_x"), round(col("max_x"), 2).as("max_x"),
            col("min_y").cast("long").as("min_y"), col("max_y").cast("long").as("max_y"))
      },
      Some("""
        WITH mm AS (
          SELECT min(CAST(o_totalprice AS DOUBLE)) AS mnx, max(CAST(o_totalprice AS DOUBLE)) AS mxx,
                 min(CAST(o_custkey AS DOUBLE)) AS mny, max(CAST(o_custkey AS DOUBLE)) AS mxy
          FROM orders
        ), g AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS x, CAST(o_custkey AS DOUBLE) AS y,
                 CAST(least(255, floor((CAST(o_totalprice AS DOUBLE) - mnx) * 256.0 / (mxx - mnx))) AS BIGINT) AS gx,
                 CAST(least(255, floor((CAST(o_custkey AS DOUBLE) - mny) * 256.0 / (mxy - mny))) AS BIGINT) AS gy
          FROM orders, mm
        ), z AS (
          SELECT x, y,
                 CAST(list_sum([(((gx >> b) & 1) << (2*b)) + (((gy >> b) & 1) << (2*b+1)) for b in range(8)]) AS BIGINT) AS zvalue
          FROM g
        )
        SELECT zvalue >> 10 AS bucket, count(*) AS n,
               round(min(x), 2) AS min_x, round(max(x), 2) AS max_x,
               CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
        FROM z GROUP BY 1""")),

    // ORC: the other native columnar format (predicate pushdown + column
    // pruning work the same as parquet); round trip proves lossless
    // encode/decode of ints, strings, and doubles.
    "src15_orc_roundtrip" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "part_orc")
        val part = Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"), col("p_brand"),
                  round(col("p_retailprice"), 2).as("price"))
        part.write.mode("overwrite").orc(out)
        s.read.schema(part.schema).orc(out)
      },
      Some("""
        SELECT p_partkey, p_name, p_brand,
               round(p_retailprice, 2) AS price
        FROM part""")),

    // Malformed-record tolerance: a JSON landing dir where odd-keyed rows
    // are corrupt (truncated JSON). PERMISSIVE mode must load every good
    // row, shunt bad lines into _corrupt_record, and never fail the job —
    // at 100 TB a single bad crawl line must not kill a 6-hour ingest.
    "src14_corrupt_records" -> QueryDef(
      (s, d) => {
        val out = Paths.get(exportDir(d, "supplier_dirty"))
        if (Files.exists(out)) Files.list(out).forEach(p => Files.delete(p))
        else Files.createDirectories(out)
        val lines = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey")).collect()
          .map { r =>
            val (k, nk) = (r.getAs[Number](0).longValue, r.getAs[Number](2).longValue)
            val good = s"""{"s_suppkey":$k,"s_name":"${r.getString(1)}","s_nationkey":$nk}"""
            if (k % 2 == 0) good else good.dropRight(8) // truncate → corrupt
          }
        Files.write(out.resolve("part-000.json"),
          lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
        val schema = "s_suppkey LONG, s_name STRING, s_nationkey LONG, _corrupt_record STRING"
        val read = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(out.toString)
        read.agg(
          count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("s_nationkey"))).as("key_sum"))
      },
      Some("""
        SELECT CAST(sum(CASE WHEN s_suppkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
               CAST(sum(CASE WHEN s_suppkey % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
               CAST(sum(CASE WHEN s_suppkey % 2 = 0 THEN s_nationkey END) AS BIGINT) AS key_sum
        FROM supplier""")),

    // Parquet schema evolution: an old batch (3 columns) and a new batch
    // (4 columns, zstd-compressed) under one root; mergeSchema unions the
    // schemas and back-fills the old batch's missing column with NULL —
    // the schema-drift reality of any long-lived 100 TB corpus.
    "src13_mergeschema" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "supplier_evolving")
        val sup = Tables.supplier(s, d)
        sup.filter(col("s_suppkey") % 2 === 0)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
          .write.mode("overwrite").parquet(s"$out/batch=old")
        sup.filter(col("s_suppkey") % 2 =!= 0)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
                  round(col("s_acctbal"), 2).as("bal"))
          .write.mode("overwrite").option("compression", "zstd")
          .parquet(s"$out/batch=new")
        s.read.option("mergeSchema", "true").parquet(out)
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
                  col("bal"), col("batch"))
      },
      Some("""
        SELECT s_suppkey, s_name, s_nationkey,
               CASE WHEN s_suppkey % 2 <> 0 THEN round(s_acctbal, 2) END AS bal,
               CASE WHEN s_suppkey % 2 = 0 THEN 'old' ELSE 'new' END AS batch
        FROM supplier""")),

    // Dynamic partition overwrite: reload ONE day's corrected data into a
    // partitioned layout — only the touched partition is replaced, every
    // other day survives. The daily-reload pattern at 100 TB: overwrite
    // mode "static" would wipe the whole table; the oracle equality
    // (min-day values doubled, all other days intact) proves the dynamic
    // semantics end-to-end.
    "src12_dynamic_overwrite" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "events_dpo")
        val ev = Tables.events(s, d)
          .select(col("ts"), col("value"), to_date(col("ts")).as("day"))
        ev.write.mode("overwrite").partitionBy("day").parquet(out)
        // fetch the boundary day as a STRING: decoding a DateType on the
        // driver needs sun.util.calendar opened (spark-submit/sbt inject
        // --add-opens; an embedding JVM may not), and a yyyy-MM-dd literal
        // round-trips identically
        val firstDay = ev.agg(date_format(min(col("day")), "yyyy-MM-dd"))
          .head().getString(0)
        val prior = s.conf.get("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try ev.filter(col("day") === lit(firstDay))
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite").partitionBy("day").parquet(out)
        finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
        s.read.parquet(out)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))
      },
      Some("""
        SELECT CAST(ts AS DATE) AS day, count(*) AS n,
               round(sum(CASE WHEN CAST(ts AS DATE) =
                                   (SELECT min(CAST(ts AS DATE)) FROM events)
                              THEN value * 2 ELSE value END), 2) AS value_sum
        FROM events GROUP BY 1""")),

    // Bucketed tables: both sides written bucketBy(join key) with the same
    // bucket count, so the sort-merge join reads co-located buckets and
    // needs NO shuffle on either side (asserted on the plan in
    // SourcesSpec) — at 100 TB this is the difference between a join that
    // moves the fact table and one that moves nothing.
    "src11_bucketed_join" -> QueryDef(
      (s, d) => {
        for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
          s.sql(s"DROP TABLE IF EXISTS $t")
          val loc = new org.apache.hadoop.fs.Path(
            s.conf.get("spark.sql.warehouse.dir"), t)
          val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
          if (fs.exists(loc)) fs.delete(loc, true)
        }
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .mode("overwrite").saveAsTable("graft_orders_b")
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .mode("overwrite").saveAsTable("graft_lineitem_b")
        s.table("graft_orders_b").hint("MERGE")
          .join(s.table("graft_lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
               round(sum(col("l_extendedprice")), 2).as("revenue"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_lines,
               round(sum(l_extendedprice), 2) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1""")),

    // Hive-style partitioned layout: write partitioned by day, read back
    // with a partition predicate — the scan must prune to ONE directory
    // (PartitionFilters; asserted on the plan in SourcesSpec)
    "src06_partition_pruning" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "events_bydate")
        val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
        ev.write.mode("overwrite").partitionBy("day").parquet(out)
        // string-decoded boundary day (see src12's note): identical
        // pruning literal, no driver DateType decode
        val minDay = ev.agg(date_format(min(col("day")), "yyyy-MM-dd"))
          .head().getString(0)
        s.read.parquet(out)
          .filter(col("day") === lit(minDay))
          .select(col("event_id"), col("user_id"), col("day"))
      },
      Some("""
        SELECT event_id, user_id, CAST(ts AS DATE) AS day
        FROM events
        WHERE CAST(ts AS DATE) = (SELECT min(CAST(ts AS DATE)) FROM events)""")),

    // JDBC sink + source against embedded Derby (the JDBC driver Spark
    // ships for its metastore) — dialect type mapping + predicate-free
    // full-table read; on a cluster the same code targets any warehouse
    "src05_jdbc_roundtrip" -> QueryDef(
      (s, d) => {
        val props = new java.util.Properties()
        // SINGLE-JVM STAND-IN (documented via the r11 local-cluster
        // smoke, which skips this gate): Spark's JDBC source/sink open
        // driver-side connections (table-exists check, schema
        // inference) AND executor-side data connections concurrently,
        // so they require a SERVER-mode database; embedded Derby — the
        // only JDBC endpoint in the sandbox — admits one JVM per boot
        // and cannot serve driver + a separate executor JVM at once.
        // Under any local[k] master everything shares one JVM and the
        // full write+read roundtrip runs for real; a production
        // deployment swaps the URL for a database server and the SAME
        // plan (JDBCRelation scan / JdbcUtils sink) distributes —
        // nothing graft-side is in that path to break.
        //
        // SERVER-MODE SEAM: when a network JDBC endpoint exists (e.g.
        // Derby's NetworkServerControl + ClientDriver on the classpath —
        // both probed absent from this sandbox's /opt/spark/jars and
        // offline cache), spark.graft.src05.url/.driver point this gate
        // at it unchanged and the data connections open executor-side;
        // ClusterSmoke probes for it reflectively and sets these confs.
        props.setProperty("driver",
          s.conf.getOption("spark.graft.src05.driver")
            .getOrElse("org.apache.derby.jdbc.EmbeddedDriver"))
        val url = s.conf.getOption("spark.graft.src05.url")
          .getOrElse(s"jdbc:derby:${exportDir(d, "derby_db")};create=true")
        val nation = Tables.nation(s, d)
        nation.write.mode("overwrite").jdbc(url, "nation_tbl", props)
        s.read.jdbc(url, "nation_tbl", props)
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation")),

    // snappy Avro container files written per partition, read back per file
    "src04_avro_roundtrip" -> QueryDef(
      (s, d) => {
        val out = exportDir(d, "orders_avro")
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
                  col("o_totalprice"), col("o_orderdate"))
        AvroRecordFiles.write(orders, out)
        AvroRecordFiles.read(s, out, orders.schema)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders"""))
  )
}
