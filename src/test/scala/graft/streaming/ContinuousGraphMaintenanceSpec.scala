package graft.streaming

import graft.SparkSpec
import graft.operators.GraphRank
import org.apache.spark.sql.functions._

/** The continuous maintenance loop (r9 capstone): the drained stream
  * equals the one-shot batch resume regardless of batching (the weight
  * monoid), empty-delta boundaries provably skip the re-rank, and a
  * stream with no increments serves the old equilibrium unchanged.
  */
class ContinuousGraphMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // old snapshot: a weighted ring with a chord; new snapshot: one edge
  // reweighted, one removed, one added (plus a brand-new node)
  private val oldLinks = Seq(
    (1L, 2L, 2L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 1L, 1L), (1L, 3L, 1L))
  private val newLinks = Seq(
    (1L, 2L, 3L), (2L, 3L, 1L), (4L, 1L, 1L), (2L, 5L, 1L), (5L, 1L, 1L))

  private def oldDF = oldLinks.toDF("src", "dst", "w")

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Stage `files` row-groups as one parquet file each under a fresh
    * dir, then drain them through continuousRank one file per batch.
    */
  private def drain(files: Seq[Seq[(Long, Long, Long)]])
      : ContinuousGraphMaintenance.Run = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cgm_spec")
    files.zipWithIndex.foreach { case (rows, i) =>
      val df = if (rows.isEmpty)
        Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
      else rows.toDF("src", "dst", "w")
      df.coalesce(1).write.mode("append").parquet(s"$dir/f$i.parquet")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("src",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dst",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .schema(schema).parquet(s"$dir/*.parquet")
    ContinuousGraphMaintenance.continuousRank(spark, oldDF, stream,
      "src", "dst", "w", oldIterations = 4, resumeIterations = 2)
  }

  test("drain equals batch: any batching of the partials lands on the one-shot resume, bit-identical") {
    val direct = rows(GraphRank.pageRankResume(
      newLinks.toDF("src", "dst", "w"), "src", "dst",
      GraphRank.pageRank(oldDF, "src", "dst", 4, weightCol = Some("w")),
      2, weightCol = Some("w")))
    // one batch with everything
    val oneShot = drain(Seq(newLinks))
    rows(oneShot.ranks) shouldBe direct
    // three uneven batches, with a duplicated pair whose partials must
    // re-sum across batches (the monoid seam)
    val split = Seq(
      Seq((1L, 2L, 1L), (2L, 3L, 1L)),
      Seq((1L, 2L, 2L), (4L, 1L, 1L)), // (1,2) again: 1+2 = the full 3
      Seq((2L, 5L, 1L), (5L, 1L, 1L)))
    val staged = drain(split)
    rows(staged.ranks) shouldBe direct
    // every boundary recomputed (each batch changed the graph), and the
    // frontier was measured each time
    staged.boundaries.size shouldBe 3
    staged.boundaries.foreach { b =>
      b.recomputed shouldBe true
      b.frontierSize should be > 0L
    }
  }

  test("empty-delta boundary skips the re-rank and serves the same ranks (provably lossless)") {
    val run = drain(Seq(newLinks, Seq.empty))
    // boundary 1 published; boundary 2 saw an empty delta → skipped
    run.boundaries.size shouldBe 2
    run.boundaries.head.recomputed shouldBe true
    run.boundaries.last.recomputed shouldBe false
    run.boundaries.last.frontierSize shouldBe 0L
    // the served ranks are the boundary-1 equilibrium, bit-for-bit
    rows(run.ranks) shouldBe rows(GraphRank.pageRankResume(
      newLinks.toDF("src", "dst", "w"), "src", "dst",
      GraphRank.pageRank(oldDF, "src", "dst", 4, weightCol = Some("w")),
      2, weightCol = Some("w")))
  }

  test("no increments: the loop serves the old equilibrium unchanged") {
    val run = drain(Seq(Seq.empty))
    run.boundaries.size shouldBe 1
    run.boundaries.head.recomputed shouldBe false
    rows(run.ranks) shouldBe rows(
      GraphRank.pageRank(oldDF, "src", "dst", 4, weightCol = Some("w")))
  }

  test("public entry point resumes across restarts with stable dirs + checkpoint") {
    // the advisor's gap: continuousRank with defaults loses the
    // accumulated graph on restart. With stable accumDir/ranksDir AND a
    // checkpointLocation, a second invocation redelivers only
    // uncommitted batches and the accumulated on-disk partials carry
    // over — drain half the increments, "restart", drain the rest.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_cgm_src")
    val accumDir = java.nio.file.Files
      .createTempDirectory("graft_cgm_accum2").toString
    val ranksDir = java.nio.file.Files
      .createTempDirectory("graft_cgm_ranks2").toString
    val cpDir = java.nio.file.Files
      .createTempDirectory("graft_cgm_cp").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("src",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dst",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType)))
    def stream() = spark.readStream.option("maxFilesPerTrigger", "1")
      .schema(schema).parquet(s"$srcDir/*.parquet")
    def run() = ContinuousGraphMaintenance.continuousRank(spark, oldDF,
      stream(), "src", "dst", "w", oldIterations = 4,
      resumeIterations = 2, accumDir = Some(accumDir),
      ranksDir = Some(ranksDir), checkpointLocation = Some(cpDir))
    newLinks.take(3).toDF("src", "dst", "w")
      .coalesce(1).write.mode("append").parquet(s"$srcDir/f0.parquet")
    run() // first incarnation drains batch 0
    newLinks.drop(3).toDF("src", "dst", "w")
      .coalesce(1).write.mode("append").parquet(s"$srcDir/f1.parquet")
    val resumed = run() // restart: only the NEW file is delivered…
    resumed.boundaries.map(_.batchId) shouldBe Seq(1L)
    // …and the accumulated graph still carries batch 0's partials, so
    // the published ranks equal the one-shot resume over ALL links
    val direct = rows(GraphRank.pageRankResume(
      newLinks.toDF("src", "dst", "w"), "src", "dst",
      GraphRank.pageRank(oldDF, "src", "dst", 4, weightCol = Some("w")),
      2, weightCol = Some("w")))
    rows(resumed.ranks) shouldBe direct
    // a further restart with NOTHING left to redeliver must serve the
    // drained ranks from disk, not re-baseline to the old equilibrium
    val idle = run()
    idle.boundaries shouldBe empty
    rows(idle.ranks) shouldBe direct
  }

  test("redelivered batchId replaces, never double-counts: drain survives a mid-stream restart") {
    // Structured Streaming redelivers the last uncommitted batchId after
    // a failure. Model it directly against the extracted Loop: batch 1
    // is delivered, the query "dies" before committing, a RESTARTED loop
    // (fresh in-memory state, same accumDir/ranksDir — the on-disk truth)
    // redelivers batch 1 and continues. The accumulated weights and the
    // final ranks must equal the no-failure run bit-for-bit; an
    // append-mode accumulator would double batch 1's partials here.
    val b0 = Seq((1L, 2L, 1L), (2L, 3L, 1L))
    val b1 = Seq((1L, 2L, 2L), (4L, 1L, 1L)) // (1,2) re-summed: 1+2 = 3
    val b2 = Seq((2L, 5L, 1L), (5L, 1L, 1L))
    val warmFull = GraphRank.pageRank(oldDF, "src", "dst", 4,
      weightCol = Some("w")).localCheckpoint()
    val warmState = warmFull.select(col("node"), col("rank_units"))
    val accumDir = java.nio.file.Files
      .createTempDirectory("graft_cgm_redeliver_a").toString
    val ranksDir = java.nio.file.Files
      .createTempDirectory("graft_cgm_redeliver_r").toString
    def newLoop() = new ContinuousGraphMaintenance.Loop(spark, oldDF,
      warmFull, warmState, "src", "dst", "w", resumeIterations = 2,
      dampNum = 85, dampDen = 100, totalUnits = GraphRank.DefaultUnits,
      accumDir, ranksDir)
    val first = newLoop()
    first.processBatch(b0.toDF("src", "dst", "w"), 0L)
    first.processBatch(b1.toDF("src", "dst", "w"), 1L) // uncommitted…
    val restarted = newLoop() // …query restarts: fresh seam state
    restarted.processBatch(b1.toDF("src", "dst", "w"), 1L) // redelivery
    restarted.processBatch(b2.toDF("src", "dst", "w"), 2L)
    // accumulated graph = the monoid over {b0, b1, b2}, batch 1 ONCE
    val accum = spark.read.parquet(accumDir)
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    accum shouldBe newLinks.map { case (s, d, w) => (s, d) -> w }.toMap
    // and the published ranks equal the clean (no-failure) drain
    rows(restarted.result.ranks) shouldBe rows(GraphRank.pageRankResume(
      newLinks.toDF("src", "dst", "w"), "src", "dst",
      GraphRank.pageRank(oldDF, "src", "dst", 4, weightCol = Some("w")),
      2, weightCol = Some("w")))
  }
}
