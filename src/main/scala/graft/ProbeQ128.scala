package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.operators.GraphRank
import graft.queries.EventQueries

/** One-off cost decomposition of the q128 continuous-maintenance gate —
  * the suite's most expensive gate. The gate's structure is
  * `one-time 5-round equilibrium + stream drain of 2 boundaries, each
  * boundary = accumulate partials + staleFrontier + 2-round resume`;
  * this main times each term ISOLATED (min-of-2, same session, same
  * shuffle-partition setting as the gate) so the §2e dossier row can
  * attribute the gate's seconds instead of guessing:
  *
  *  - `warm_equilibrium_5r`  — the one-time old-snapshot pageRank
  *  - `stream_floor_2b`      — the identical 4-file/2-boundary drain
  *    with a no-op foreachBatch (per-batch planning + commit log +
  *    source listing; the q105-style corpus-independent floor, except
  *    this gate uses no state store, so the floor is foreachBatch's)
  *  - `frontier_full_delta`  — staleFrontier(old, new, hops=1).count —
  *    the LAST boundary's delta term and an upper bound on the first's
  *    (half the files ⇒ a subset delta)
  *  - `resume_2r`            — pageRankResume(new, warmState, 2) — one
  *    boundary's publish term (both boundaries pay ≈ this: the resume
  *    is bounded-round over the full accumulated graph either way)
  *  - `q128_full_gate`       — the gate itself, for the residual
  *
  * Expectation: full ≈ warm + floor + 2·frontier + 2·resume (+ the
  * accumulate/pin writes). Usage: runMain graft.ProbeQ128 [sfDir]
  */
object ProbeQ128 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once, once)
      println(String.format(java.util.Locale.ROOT,
        """{"term":"%s","sec":%.3f}""", label, Double.box(t)))
      t
    }

    // warm the session + stage the stream files once, off the clock
    SparkEntry.queries("q128_continuous_rank")(spark, dir)
      .queryExecution.toRdd.count()

    // the gate runs its whole body under 4 shuffle partitions
    // (withStreamConf parts="4"); mirror that for every term
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val (oldE, newE) = EventQueries.tradeSnapshots(spark, dir)
    val staged = EventQueries.stageNewLinksDir(spark, dir)
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("w", LongType)))

    time("warm_equilibrium_5r") {
      GraphRank.pageRank(oldE, "src", "dst", 5, 85, 100,
        GraphRank.DefaultUnits, Some("w")).queryExecution.toRdd.count()
    }
    time("stream_floor_2b") {
      val q = spark.readStream.option("maxFilesPerTrigger", "2")
        .schema(schema).parquet(staged.toString)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.queryExecution.toRdd.count(); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    time("frontier_full_delta") {
      GraphRank.staleFrontier(oldE, newE, "src", "dst", hops = 1,
        Some("w")).count()
    }
    val warmState = GraphRank.pageRank(oldE, "src", "dst", 5, 85, 100,
      GraphRank.DefaultUnits, Some("w"))
      .select(col("node"), col("rank_units")).localCheckpoint()
    time("resume_2r") {
      GraphRank.pageRankResume(newE, "src", "dst", warmState, 2, 85, 100,
        GraphRank.DefaultUnits, Some("w")).queryExecution.toRdd.count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    time("q128_full_gate") {
      SparkEntry.queries("q128_continuous_rank")(spark, dir)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
