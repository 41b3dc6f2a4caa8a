package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout operators: small-file compaction and range-partitioned
  * (min/max-prunable) writes.
  */
class LayoutSpec extends SparkSpec {

  test("compaction collapses a many-file directory to the byte-derived count") {
    val in = java.nio.file.Files.createTempDirectory("graft-smallfiles").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compacted").toString
    val ev = Tables.events(spark, sfDir)
    ev.repartition(32).write.mode("overwrite").parquet(in)
    val (bytes, before) = Compaction.footprint(spark, in)
    before shouldBe 32
    val (b2, after) = Compaction.compact(spark, in, out, targetBytes = bytes / 3)
    b2 shouldBe 32
    after should (be >= 3 and be <= 5) // ceil(bytes/(bytes/3)) ± rounding
    spark.read.parquet(out).count() shouldBe ev.count()
  }

  test("repartitionByRange + sortWithinPartitions yields disjoint per-file key ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft-ranged").toString
    Tables.orders(spark, sfDir).select(col("o_orderkey"))
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    files.length shouldBe 4
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // each file's [min, max] interval is disjoint from the next — exactly
    // what lets parquet row-group stats prune range predicates to one file
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => hi should be < lo2
      case _ =>
    }
  }
}
