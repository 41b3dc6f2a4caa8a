package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The s28 serving-layout contract, plan-asserted (the spec
  * Similarity.buildIvfPqIndex's doc cites): an IVFADC index stored
  * `partitionBy("cid")` — by the one-shot builder or by the continuous
  * Loop's versioned writes — makes the probed-list IN filter prune at
  * the FILE index (PartitionFilters), so serving reads nProbe/nLists
  * of the index FILES; on an unpartitioned index the same filter
  * degrades gracefully to a row filter with identical answers; and the
  * re-rank half pushes the bounded candidate-id set down onto the
  * corpus scan instead of paying a second full pass. The index-layout
  * asserts run against [[Similarity.ivfPqCandidates]] — the LAZY half
  * whose plan contains the index scan (the full search materializes
  * candidates to derive the corpus pushdown, so its final plan starts
  * after them); the corpus-pushdown assert runs against the full
  * search. SourcesSpec's src06 assert, applied to our own layout.
  */
class IvfPqIndexLayoutSpec extends SparkSpec {

  private val NLists = 8
  private lazy val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
  private lazy val cbs = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
    nLists = NLists, m = 2, codebookSize = 4,
    maxIterCoarse = 1, maxIterPq = 1)
  private lazy val queries = emb.filter(col("vec_id") < 3).localCheckpoint()

  private def search(index: org.apache.spark.sql.DataFrame) =
    Similarity.ivfPqSearchIndexed(index, emb, queries, k = 5,
      cbs._1, cbs._2, nProbe = 2, rerank = 3)

  private def candidates(index: org.apache.spark.sql.DataFrame) =
    Similarity.ivfPqCandidates(index, queries, k = 5,
      cbs._1, cbs._2, nProbe = 2, rerank = 3)

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // the scan over `dir` inside a plan; for the index, PartitionFilters
  // must carry the probed-list cid IN filter
  private def scanLine(plan: String, dir: String): String =
    plan.linesIterator
      .filter(_.contains("FileScan parquet"))
      .find(_.contains(new java.io.File(dir).getName))
      .getOrElse(fail(s"no FileScan over $dir in plan:\n$plan"))

  test("one-shot buildIvfPqIndex lays out cid= directories; the candidate scan prunes at the file index") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-layout").toString
    val idx = Similarity.buildIvfPqIndex(emb, dir, cbs._1, cbs._2)
    // physical layout: one cid=<list> directory per non-empty list
    val cidDirs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("cid="))
    cidDirs.length should be > 1
    cidDirs.length should be <= NLists
    val scan = scanLine(
      candidates(idx).queryExecution.executedPlan.toString, dir)
    scan should include regex "PartitionFilters: \\[.*cid.* IN \\("
    resultSet(search(idx)).size should be > 0
  }

  test("pruning is real I/O, not annotation: non-probed cid directories are never read") {
    // corrupt every cid directory the probed-list filter excludes; a
    // full-index scan would now fail, a pruned scan never touches them
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-prune").toString
    val idx = Similarity.buildIvfPqIndex(emb, dir, cbs._1, cbs._2)
    val expected = resultSet(search(idx))
    // the probed set: exactly the lists the candidate scan's
    // PartitionFilters names. Recover it from the plan string.
    val scan = scanLine(
      candidates(idx).queryExecution.executedPlan.toString, dir)
    val in = "cid[^ ]* IN \\(([-0-9,]+)\\)".r
      .findFirstMatchIn(scan)
      .getOrElse(fail(s"no cid IN (...) in scan line: $scan"))
      .group(1).split(",").map(_.trim.toInt).toSet
    in.size should be < NLists // otherwise the corrupt step tests nothing
    val corrupted = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("cid=") &&
        !in.contains(f.getName.stripPrefix("cid=").toInt))
    corrupted.length should be > 0
    corrupted.foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.write(f.toPath,
          "not a parquet file".getBytes))
    }
    // fresh read over the corrupted tree: pruned search still answers.
    // Schema passed explicitly — inference reads the footer of the
    // path-sorted FIRST data file, which may be a corrupted non-probed
    // one; this test must only prove the SCAN never touches them
    val res2 = search(spark.read.schema(idx.schema).parquet(dir))
    resultSet(res2) shouldBe expected
  }

  test("the Loop's versioned index writes keep the served layout: the candidate scan prunes") {
    import spark.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-loop-layout").toString
    val init = Similarity.ivfPqEncodeFixedPoint(
      emb.filter(col("vec_id") % 7 =!= 0), cbs._1, cbs._2).localCheckpoint()
    // compactEvery = 1: every boundary a BASE — this spec pins the
    // SERVED layout of base versions (cid-partitioned, pruned); the
    // delta-chain serve path has its own spec
    // (ContinuousIndexMaintenanceSpec "serve-while-maintaining")
    val loop = graft.streaming.ContinuousIndexMaintenance.ivfPqLoop(
      spark, init, cbs._1, cbs._2, "vec_id", "embedding", 1000000L,
      stateDir,
      graft.streaming.ContinuousIndexMaintenance.LineagePolicy(
        compactEvery = 1))
    val delta = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("status", lit("added"))
      .select(col("vec_id"), col("embedding"), col("status"))
    loop.processBatch(delta, 0L)
    // version 0 is physically cid-partitioned…
    val v0 = new java.io.File(s"$stateDir/v0")
    Option(v0.listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith("cid=")) should be > 1
    // …and the served state (read back from disk) prunes under search
    val scan = scanLine(candidates(loop.result.state)
      .queryExecution.executedPlan.toString, s"$stateDir/v0")
    scan should include regex "PartitionFilters: \\[.*cid.* IN \\("
    // maintained-index search answers = one-shot-index search answers
    val oneShotDir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-oneshot").toString
    resultSet(search(loop.result.state)) shouldBe
      resultSet(search(Similarity.buildIvfPqIndex(emb, oneShotDir,
        cbs._1, cbs._2)))
  }

  test("the re-rank corpus read is candidate-pruned, not a second full scan") {
    // after the index read is pruned to nProbe/nLists files, the exact
    // re-rank must not pay a full corpus pass: the bounded candidate-id
    // set is pushed down onto the corpus scan (PushedFilters In(vec_id))
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-rrx").toString
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-corpus").toString
    emb.write.mode("overwrite").parquet(corpusDir)
    val corpusPq = spark.read.parquet(corpusDir)
    val idx = Similarity.buildIvfPqIndex(corpusPq, idxDir, cbs._1, cbs._2)
    val res = Similarity.ivfPqSearchIndexed(idx, corpusPq, queries, k = 5,
      cbs._1, cbs._2, nProbe = 2, rerank = 3)
    val scan = scanLine(
      res.queryExecution.executedPlan.toString, corpusDir)
    scan should include regex "PushedFilters: \\[.*[Ii]n\\(vec_id"
    resultSet(res) shouldBe resultSet(search(idx))
  }

  test("an empty query set returns an empty result without erroring on the empty pushdowns") {
    // both driver-side collects (probed lists, candidate ids) are empty:
    // the search must degrade to filter(false) plans, not an empty-IN error
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-emptyq").toString
    val idx = Similarity.buildIvfPqIndex(emb, dir, cbs._1, cbs._2)
    Similarity.ivfPqSearchIndexed(idx, emb, queries.filter(lit(false)),
      k = 5, cbs._1, cbs._2, nProbe = 2, rerank = 3).count() shouldBe 0L
  }

  test("unpartitioned index degrades gracefully to a row filter with identical answers") {
    val dirP = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-part").toString
    val dirU = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-unpart").toString
    val idxP = Similarity.buildIvfPqIndex(emb, dirP, cbs._1, cbs._2)
    Similarity.ivfPqEncodeFixedPoint(emb, cbs._1, cbs._2)
      .write.mode("overwrite").parquet(dirU) // same rows, flat layout
    val scan = scanLine(candidates(spark.read.parquet(dirU))
      .queryExecution.executedPlan.toString, dirU)
    // no partition column ⇒ the cid IN filter lands on the data side
    scan should include ("PartitionFilters: []")
    scan should include regex "PushedFilters: \\[.*[Ii]n\\(cid"
    resultSet(search(spark.read.parquet(dirU))) shouldBe
      resultSet(search(idxP))
  }
}
