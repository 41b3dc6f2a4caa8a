package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Per-query entries printed on the bench line. The harness keeps only
    * the LAST ~2000 chars of output, so the JSON line must stay well under
    * that — all queries are still timed (and included in "value"), but the
    * per-query map carries this representative subset; the full map lands
    * in BENCH_DETAIL.json next to the build.
    */
  private[graft] val headline = Seq(
    "p03_fetch_parse_raw", "p06_persist_counts",
    "q01_agg_pricing_summary", "q13_grouping_sets",
    "q20_join_revenue_by_nation", "q28_join_broadcast_dim", "q29_join_asof",
    "q19_join_salted", "q37_topk_custom_plan", "q39_sql_shipping_priority",
    "q40_topk_orders", "q48_dropduplicates",
    "q70_tumbling_window", "q76_streaming_tumbling",
    "src04_avro_roundtrip", "src06_partition_pruning", "src07_compaction",
    "u02_udaf_weighted_avg",
    "d01_dedup_exact", "d02_dedup_ngram_jaccard", "d03_dedup_minhash_lsh",
    "d04_dedup_simhash", "d05_dedup_embedding", "d06_dedup_clusters",
    "s01_knn_brute_force", "s02_knn_lsh", "s04_knn_ivf", "s05_quantize_int8",
    "t01_lang_id", "t04_fingerprint", "t06_curation_pipeline",
    "m03_frame_sampling",
    "q87_lateral_topk", "q88_sketch_rollup", "q89_streaming_left_outer",
    "q90_transform_with_state", "s09_random_projection", "s10_kmeans",
    "t20_mixture_resample",
    "q91_recursive_cte", "q93_approx_top_k", "t21_classifier_score",
    // the streaming fixed-cost floor next to the heaviest streaming gate,
    // so the round artifact carries the gate-minus-floor data term
    "q104_streaming_minhash_pairs", "q105_streaming_lifecycle_floor",
    // r12 flagships: the composed IVFADC lifecycle + the live TCP ingest
    "s24_ivfpq_search", "s25_continuous_retrain", "s26_continuous_ivfpq",
    "q130_socket_ingest")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed queries aren't charged for
    // cold-compiling the scan/join/agg paths every later query reuses
    Seq("q01_agg_pricing_summary", "d01_dedup_exact", "t01_lang_id",
        "q20_join_revenue_by_nation")
      .foreach { q => SparkEntry.queries.get(q).foreach { fn =>
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () } } }
    // min of two passes per query: this host shows transient multi-second
    // CPU-steal bursts that would otherwise land on one arbitrary query
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                 name: String): Double = {
      val t0 = System.nanoTime()
      // materialize every output row (UnsafeRow, all columns) — a plain
      // count() lets Catalyst prune projection-only queries to nothing
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        // a failed query's elapsed time is NOT a benchmark number — track
        // it so the artifact says so instead of recording a fast-fail
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val pass1 = ordered.map { case (name, fn) => name -> timeOnce(fn, name) }.toMap
    val pass2 = ordered.map { case (name, fn) => name -> timeOnce(fn, name) }.toMap
    // Targeted third pass: a host-steal burst (multi-second CPU theft, see
    // r03's bogus 13.7 s t14 entry) can hit BOTH passes of one query. Any
    // query that is still slow after min-of-2, or whose two passes disagree
    // wildly, gets one uncontended retry; the reported value is min-of-all.
    // the two retry causes are structurally different signals: `slow`
    // (min-of-2 > 3 s) fires mechanically on every honest slow gate, so
    // its count grows with the suite; `disagree` (passes differ > 2.5×)
    // is the steal-burst fingerprint — recorded separately per gate so
    // burst detection is a grep, not a BENCH_NOTES reconstruction
    def slowCause(name: String): Boolean =
      math.min(pass1(name), pass2(name)) > 3.0
    def disagreeCause(name: String): Boolean = {
      val best2 = math.min(pass1(name), pass2(name))
      best2 > 0.5 && math.max(pass1(name), pass2(name)) > 2.5 * best2
    }
    def noisy(name: String): Boolean = slowCause(name) || disagreeCause(name)
    val results = ordered.map { case (name, fn) =>
      val best2 = math.min(pass1(name), pass2(name))
      name -> (if (noisy(name)) math.min(best2, timeOnce(fn, name)) else best2)
    }
    // which gates retried, not just how many: the outlier-retry pass can
    // mask systematic slow-starts unless the artifact names the gates
    // (VERDICT r7 "What's wrong" #3)
    val retriedNames = ordered.collect { case (name, _) if noisy(name) => name }
    val retried = retriedNames.size
    // Locale.ROOT: a comma-decimal default locale would print 62,700 and
    // corrupt the JSON line
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // full per-query detail for offline inspection (not on the line)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retriedJson = retriedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val causesJson = retriedNames.map { n =>
      s""""$n":{"slow":${slowCause(n)},"disagree":${disagreeCause(n)}}"""
    }.mkString("{", ",", "}")
    val cpusDetail = if (cpus.forall(_.isDigit) && cpus.nonEmpty) cpus else "-1"
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"total":${fmt(total)},"n":${results.size},"sf":"$sfDir","cpus":$cpusDetail,"runs":2,"retried":$retried,"retried_queries":$retriedJson,"retried_causes":$causesJson,"failed":$failedJson,"queries":${jsonMap(results)}}
""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(line(total, results, sfDir, cpus))
    spark.stop()
  }

  private[graft] def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private[graft] def jsonMap(entries: Seq[(String, Double)]): String =
    entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")

  /** The single JSON line the harness parses from the tail of the build
    * output — MUST stay well under the harness's ~2000-char tail capture
    * (BenchLineSpec enforces the budget at worst-case widths).
    */
  private[graft] def line(total: Double, results: Seq[(String, Double)],
                          sfDir: String, cpus: String = "32"): String = {
    // a non-numeric $SPARK_GRAFT_CPUS (local[*] experiments) must not
    // corrupt the JSON line the harness parses
    val cpusJson = if (cpus.forall(_.isDigit) && cpus.nonEmpty) cpus else "-1"
    val shown = results.filter { case (k, _) => headline.contains(k) }
    // "cpus" stamps the honored $SPARK_GRAFT_CPUS on the line itself so
    // the driver's suspect_cpus_ignored heuristic can verify the core
    // count instead of inferring it from scaling ratios (r17 verdict #5
    // — the ≈1 ratios at sf0.1 are the per-job fixed-cost floor, not an
    // ignored knob)
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jsonMap(shown)},"n_queries":${results.size},"sf":"$sfDir","cpus":$cpusJson,"runs":2}"""
  }
}
