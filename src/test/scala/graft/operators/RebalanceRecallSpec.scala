package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Retrieval-quality floors for the REBALANCED index (r14 verdict #1 —
  * the ADC lesson applied to the r14 list geometry): recall@10 of the
  * state-served path ([[Similarity.ivfSearchState]] — probe by
  * codebook, candidates from the PHYSICAL lists, exactly what the
  * partitioned layout serves) measured against brute-force exact
  * cosine on the staged hot-region corpus, before and after
  * [[Similarity.splitListsEven]]'s cut. The full sweep is
  * RECALL.json's `postRebalance` (graft.RebalanceRecallProbe); this
  * spec pins its load-bearing conclusions as exact fixed-point
  * regression tripwires at sf0.001 sizing (n=500, nLists=√n=22 → 33
  * post-cut):
  *
  *  1. at the BUDGET-ADJUSTED operating point (hold the scanned
  *     fraction: nProbe′ = ⌈nProbe·nLists′/nLists⌉ = 12), the cut
  *     index answers within 0.06 recall of the pre-cut index at
  *     STRICTLY FEWER scanned candidate rows (measured 0.695 vs
  *     0.740, 4 923 vs 5 424 rows);
  *  2. one step up (nProbe 16, still under pre's nProbe-12 budget),
  *     the cut index BEATS pre's operating point outright (0.815 vs
  *     0.740) — at equal-and-above scan budgets the balanced index
  *     dominates;
  *  3. the balance win the cut exists for: the hottest probed list
  *     shrinks ≥ 5× (256 → 22 — per-probe worst-case latency);
  *  4. the verdict's geometry question, isolated by control: at the
  *     adjusted point, rank-chunk listing gives up ≤ 0.08 recall vs a
  *     fresh-argmax (Voronoi) relisting under the SAME expanded
  *     codebook (measured gap 0.000 here; ≤ 0.13 mid-range at sf0.1,
  *     RECALL.json) — the mid-budget loss is probe-budget dilution,
  *     not the cut's geometry;
  *  5. the merge direction never loses: consolidating starved lists
  *     at fixed nProbe only widens each probe's candidate pool.
  */
class RebalanceRecallSpec extends SparkSpec {

  test("rebalanced-index recall: adjusted-budget parity, equal-budget dominance, geometry control") {
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = emb.count()
    val corpus = graft.queries.SkewFixture.skewed(emb).localCheckpoint()
    val queries = corpus.orderBy("vec_id").limit(20).localCheckpoint()
    val k = 10
    val truth = graft.RecallProbe.groundTruth(corpus, queries, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nLists = math.max(4, math.sqrt(n.toDouble).toInt)
    val cb = Similarity.kmeansTrainFixedPoint(emb, nLists, maxIter = 3)

    val state0 = Similarity.assignFixedPoint(corpus, cb).localCheckpoint()
    val (mv, cbSplit) = Similarity.splitListsEven(corpus, cb,
      Similarity.RebalancePolicy(3L, 2L), state = Some(state0))
    cbSplit.length should be > cb.length // the fixture must stage a cut
    val stateSplit = mv.select(col("id"), col("cid")).localCheckpoint()

    def measure(state: org.apache.spark.sql.DataFrame,
                pcb: Array[Array[Long]], nProbe: Int): (Double, Long) =
      graft.RebalanceRecallProbe.measure(
        corpus, state, queries, pcb, nProbe, k, truth)

    val nProbe = 8
    val adjusted = // hold the scanned fraction across the cut
      math.ceil(nProbe.toDouble * cbSplit.length / cb.length).toInt
    val (preR, preCand) = measure(state0, cb, nProbe)
    val (postR, postCand) = measure(stateSplit, cbSplit, adjusted)
    // 1. adjusted-budget parity at strictly fewer scanned rows
    postR should be >= preR - 0.06
    postCand should be < preCand
    // 2. one probe step up still under pre's next budget: outright win
    val (postHiR, postHiCand) = measure(stateSplit, cbSplit, adjusted + 4)
    postHiR should be > preR
    postHiCand should be < measure(state0, cb, nProbe + 4)._2
    // 3. the hottest probed list shrinks ≥ 5×
    def hottest(st: org.apache.spark.sql.DataFrame): Long =
      st.groupBy(col("cid")).count().agg(max(col("count"))).head().getLong(0)
    hottest(state0).toDouble / hottest(stateSplit) should be >= 5.0
    // 4. geometry control: rank chunks vs Voronoi relisting of the SAME
    //    expanded codebook — the cut geometry gives up ≤ 0.08 here
    val voronoi = Similarity.assignFixedPoint(corpus, cbSplit)
      .localCheckpoint()
    val (vorR, _) = measure(voronoi, cbSplit, adjusted)
    (vorR - postR) should be <= 0.08
    // 5. the merge direction never loses recall at fixed nProbe
    val (mvM, cbMerge) = Similarity.mergeLists(corpus, cb,
      Similarity.MergePolicy(2L, 3L))
    cbMerge.length should be < cb.length
    val stateMerge = mvM.select(col("id"), col("cid")).localCheckpoint()
    val (mrgR, _) = measure(stateMerge, cbMerge, 2)
    mrgR should be >= measure(state0, cb, 2)._1
  }

  test("s41 recovery floor: the fixed-point-normalized retrain restores ADC recall on the collapsed corpus") {
    // RECALL.json `normRecovery` pinned as a fixed-point tripwire
    // (r17): the stale-codebook index over the collapsed corpus loses
    // most of its ADC recall (the regime the norm tripwire flags —
    // r15's 0.235-class measurement); the s41 recovery — exactly what
    // continuousIvfPqWithRetrain's recovery boundary builds and
    // serves: l2NormalizeFixedPoint + both stages retrained + encode,
    // all at scale 1 — restores the ≥ 0.9 operating floor of the
    // measured normalized-ingest recipe.
    val emb = Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = emb.count()
    val corpus = graft.queries.SkewFixture.skewed(emb).localCheckpoint()
    val k = 10
    val queries = corpus.orderBy("vec_id").limit(20).localCheckpoint()
    val truth = graft.RecallProbe.groundTruth(corpus, queries, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nLists = math.max(4, math.sqrt(n.toDouble).toInt)
    def recallOf(pidx: org.apache.spark.sql.DataFrame,
                 pcorpus: org.apache.spark.sql.DataFrame,
                 pcb: Array[Array[Long]], ppq: Array[Array[Array[Long]]],
                 scale: Long): Double = {
      // the phase's query set = the truth's nQ ids from ITS corpus
      // (cosine truth is normalization-invariant, vec_id order stable)
      val q2 = pcorpus.orderBy("vec_id").limit(20).localCheckpoint()
      val got = Similarity.ivfPqSearchIndexed(pidx, pcorpus, q2, k,
          pcb, ppq, nProbe = 8, rerank = 4, scale = scale).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t).toDouble / t.size
      }.sum / truth.size
    }
    val (coarseP, pqP) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = nLists, m = 16, codebookSize = 256,
      maxIterCoarse = 3, maxIterPq = 2)
    val pre = recallOf(Similarity.ivfPqEncodeFixedPoint(corpus, coarseP,
      pqP).localCheckpoint(), corpus, coarseP, pqP, 1000000L)
    val nrmFp = Similarity.l2NormalizeFixedPoint(corpus).localCheckpoint()
    val (coarseF, pqF) = Similarity.ivfPqTrainFixedPoint(nrmFp, dim = 64,
      nLists = nLists, m = 16, codebookSize = 256,
      maxIterCoarse = 3, maxIterPq = 2, scale = 1L)
    val rec = recallOf(Similarity.ivfPqEncodeFixedPoint(nrmFp, coarseF,
      pqF, 1L).localCheckpoint(), nrmFp, coarseF, pqF, 1L)
    pre should be <= 0.5 // the collapse is real (measured 0.17–0.26)
    rec should be >= 0.9 // the recovery restores the operating floor
  }
}
