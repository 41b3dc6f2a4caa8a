package graft

import org.apache.spark.sql.SparkSession

/** Isolated per-query timer for steal-variance tiebreaks: times ONLY the
  * named gates (after a shared warmup) so a mover's number is not taken
  * while 200 other gates churn the page cache and JIT around it. Used by
  * the round-8 bench tiebreak protocol (VERDICT r7 "Next round" #1).
  *
  * Usage: runMain graft.TimeQueries <sfDir> <q1,q2,...> [passes]
  * Prints one JSON line per query: {"query":...,"min":...,"runs":[...]}
  */
object TimeQueries {
  private val Usage =
    "usage: runMain graft.TimeQueries <sfDir> <q1,q2,...> [passes]"

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(Usage)
      sys.exit(2)
    }
    val sfDir = args(0)
    val names = args(1).split(",").toSeq.filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (names.isEmpty || unknown.nonEmpty) {
      System.err.println(
        if (names.isEmpty) s"empty query list\n$Usage"
        else s"unknown queries: ${unknown.mkString(", ")}\n$Usage")
      sys.exit(2)
    }
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup set as Bench, so codegen/scan JIT cost lands off-clock
    Seq("q01_agg_pricing_summary", "d01_dedup_exact", "t01_lang_id",
        "q20_join_revenue_by_nation")
      .foreach { q => SparkEntry.queries.get(q).foreach { fn =>
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () } } }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val runsJson = runs.map(Bench.fmt).mkString("[", ",", "]")
      println(s"""{"query":"$name","min":${Bench.fmt(runs.min)},"runs":$runsJson}""")
    }
    spark.stop()
  }
}
