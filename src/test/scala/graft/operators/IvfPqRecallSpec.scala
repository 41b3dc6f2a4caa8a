package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The IVFADC retrieval-quality floor at the documented operating point
  * (RECALL.json, r14): recall@10 vs brute-force exact cosine must hold
  * ≥ 0.9 at m=16 / codebookSize=256 / nLists≈√n / nProbe=8 / rerank=4
  * — the sizing the 100 TB serving claim quotes (measured 0.945 here,
  * 0.91 at sf0.1; the scanned fraction at this point is nProbe/√n, so
  * it VANISHES as the corpus grows). The whole path is fixed-point deterministic,
  * so this is an exact regression tripwire, not a flaky statistical
  * bound: it catches any future change to train/encode/probe/ADC that
  * silently trades recall (the r14 ADC-ranking fix bought exactly this
  * — the old residual-dot ranking read 0.29 at higher probe counts and
  * DEGRADED as nProbe grew; PqAdcDist2's scaladoc has the story).
  */
class IvfPqRecallSpec extends SparkSpec {

  test("recall@10 >= 0.9 at the production operating point, and more probes never hurt") {
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = emb.count()
    val queries = emb.orderBy("vec_id").limit(20).localCheckpoint()
    val k = 10
    val exact = graft.RecallProbe.groundTruth(emb, queries, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nLists = math.sqrt(n.toDouble).toInt // ≈ 22 at n = 500
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = nLists, m = 16, codebookSize = 256,
      maxIterCoarse = 3, maxIterPq = 2)
    val index = Similarity.ivfPqEncodeFixedPoint(emb, coarse, pq)
      .localCheckpoint()
    def recallAt(nProbe: Int): Double = {
      val got = Similarity.ivfPqSearchIndexed(index, emb, queries, k,
          coarse, pq, nProbe, rerank = 4).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      exact.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
      }.sum / exact.size
    }
    val atOperatingPoint = recallAt(8)
    atOperatingPoint should be >= 0.9
    // the property the r14 ADC fix restored: raising nProbe widens the
    // candidate pool under a cross-list-comparable score, so recall is
    // non-decreasing in probes (small slack for rerank-window churn)
    recallAt(16) should be >= atOperatingPoint - 0.02
  }

  test("norm-skew collapses ADC recall beyond any retrain; L2-normalized ingest restores the floor") {
    // measured r15 (RECALL.json postRebalanceAdc): on the staged
    // norm-collapse corpus the shared residual-PQ codebooks cannot
    // resolve within the 1/64-norm clump — recall@10 reads ~0.24
    // stale, ~0.15 after the s37 cut, and only ~0.49 even after a
    // FULL two-stage retrain on the skewed corpus (the dynamic range,
    // not the listing, is the binding constraint). The production
    // recipe for cosine serving is Similarity.l2Normalize at ingest:
    // cosine truth is unchanged, norm-skew cannot exist, and the
    // operating-point floor holds. This spec pins the recipe's two
    // claims as exact fixed-point tripwires at sf0.001 sizing.
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = emb.count()
    val corpus = graft.queries.SkewFixture.skewed(emb)
    val nrm = corpus.withColumn("embedding",
      Similarity.l2Normalize(col("embedding"))).localCheckpoint()
    val queries = nrm.orderBy("vec_id").limit(20).localCheckpoint()
    val k = 10
    // cosine ground truth: identical on raw and normalized vectors
    val exact = graft.RecallProbe.groundTruth(nrm, queries, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nLists = math.sqrt(n.toDouble).toInt
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(nrm, dim = 64,
      nLists = nLists, m = 16, codebookSize = 256,
      maxIterCoarse = 3, maxIterPq = 2)
    val index = Similarity.ivfPqEncodeFixedPoint(nrm, coarse, pq)
      .localCheckpoint()
    // claim 1: the production floor holds on the normalized skew corpus
    val got = Similarity.ivfPqSearchIndexed(index, nrm, queries, k,
        coarse, pq, nProbe = 8, rerank = 4).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = exact.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t).toDouble / t.size
    }.sum / exact.size
    recall should be >= 0.9
    // claim 2: normalization erases the census skew the raw collapse
    // stages (raw hottest ≥ 50% of the corpus; normalized ≤ 2× avg)
    val hottest = index.groupBy(col("cid")).count()
      .agg(max(col("count"))).head().getLong(0)
    hottest.toDouble should be <= 2.0 * n / nLists
  }
}
