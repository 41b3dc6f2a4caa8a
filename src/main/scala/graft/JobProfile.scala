package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness for the r17 optimization round (guide §1): runs
  * named gates with a SparkListener attached and reports, per gate, the
  * number of Spark jobs, stages, tasks, the summed executor task time,
  * and the wall time — separating scheduling/launch overhead (many tiny
  * jobs/tasks) from genuine compute. Read-only: no contract surface.
  *
  * Usage: runMain graft.JobProfile <sfDir> <q1,q2,...> [passes]
  * Prints one JSON line per query.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <q1,q2,...> [passes]")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq.filter(_.nonEmpty)
    val passes = if (args.length > 2) args(2).toInt else 1
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    val shuffleReadB = new AtomicLong(0L)
    val shuffleWriteB = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    // warmup (same set as Bench)
    Seq("q01_agg_pricing_summary", "d01_dedup_exact", "t01_lang_id",
        "q20_join_revenue_by_nation")
      .foreach { q => SparkEntry.queries.get(q).foreach { fn =>
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () } } }

    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to passes).foreach { p =>
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0L); shuffleReadB.set(0L); shuffleWriteB.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat to drain
        Thread.sleep(300)
        println(s"""{"query":"$name","pass":$p,"wall":${Bench.fmt(wall)},""" +
          s""""jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},""" +
          s""""task_time_s":${Bench.fmt(taskTimeMs.get / 1000.0)},""" +
          s""""shuffle_read_mb":${Bench.fmt(shuffleReadB.get / 1e6)},""" +
          s""""shuffle_write_mb":${Bench.fmt(shuffleWriteB.get / 1e6)}}""")
      }
    }
    spark.stop()
  }
}
