package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan and a
  * min-of-two timing for one named gate query.
  *
  * Usage: runMain graft.Explain <queryName> [sfDir] [formatted|simple]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName> [sfDir] [mode]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain(mode)
    def once: Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val (a, b) = (once, once)
    println(String.format(java.util.Locale.ROOT,
      "[explain] %s min=%.3f s (passes %.3f / %.3f)",
      name, Double.box(math.min(a, b)), Double.box(a), Double.box(b)))
    spark.stop()
  }
}
