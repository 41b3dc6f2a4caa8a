package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the scan layer: partition pruning reaches
  * the file index, and bucketed tables join without a shuffle — the two
  * layout levers that matter most at 100 TB.
  */
class SourcesSpec extends SparkSpec {

  test("partitioned write + day filter prunes at the file index (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = Tables.events(spark, sfDir).withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val minDay = ev.agg(min(col("day"))).head.getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("day") === lit(minDay))
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include regex "PartitionFilters: \\[.*day.*\\]"
    // the filter must NOT appear as a post-scan data filter on day
    pruned.count() should be > 0L
  }

  test("_metadata columns give per-row file provenance (curation lineage)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-meta").toString
    Tables.nation(spark, sfDir).repartition(3)
      .write.mode("overwrite").parquet(dir)
    val withProv = spark.read.parquet(dir)
      .select(col("n_nationkey"), col("_metadata.file_name").as("src_file"),
              col("_metadata.file_size").as("src_bytes"))
    withProv.count() shouldBe 25L
    // every row maps to a real part file, and sizes are positive
    val files = withProv.select("src_file").distinct().collect().map(_.getString(0))
    files.length should be >= 2
    all(files) should include("part-")
    withProv.agg(min(col("src_bytes"))).head.getLong(0) should be > 0L
  }

  test("bucketed tables join with no shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try {
      Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "ShuffleExchange"
      plan should not include "Exchange hashpartitioning"
      // and it still computes the right thing
      joined.count() shouldBe
        Tables.lineitem(spark, sfDir).join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count()
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      val _ = wh // warehouse dir stays whatever the session configured
    }
  }
}
