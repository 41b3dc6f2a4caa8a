package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 additions: the frequency-cut composite-LM scoring paths (the
  * 100 TB Stupid Backoff swap) and the token-budget exhaustion fallback.
  */
class Round7OpsSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("bigramBackoffLogProbCut(minCount=1) is the bit-identical twin of the exact path") {
    val docs = graft.Tables.documents(spark, sfDir)
    val pred = col("doc_id") % 10 =!= 0
    val exact = rows(graft.operators.TextAnalysis
      .bigramBackoffLogProb(docs, "text", "doc_id", trainPred = pred))
    val cut = rows(graft.operators.TextAnalysis
      .bigramBackoffLogProbCut(docs, "text", "doc_id", trainPred = pred,
        minCount = 1L))
    cut shouldBe exact
  }

  test("trigramBackoffLogProbCut(minCount=1) is the bit-identical twin of the exact path") {
    val docs = graft.Tables.documents(spark, sfDir)
    val pred = col("doc_id") % 10 =!= 0
    val exact = rows(graft.operators.TextAnalysis
      .trigramBackoffLogProb(docs, "text", "doc_id", trainPred = pred))
    val cut = rows(graft.operators.TextAnalysis
      .trigramBackoffLogProbCut(docs, "text", "doc_id", trainPred = pred,
        minCount = 1L))
    cut shouldBe exact
  }

  test("bigram cut minCount=2: rare entries score exactly as unseen (hand-verified)") {
    import spark.implicits._
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // train unigrams a:3 b:3 c:2 (T=8); bigrams (a,b):3 (b,a):1 (b,c):2.
    // minCount=2 keeps (a,b), (b,c) and all three unigrams; (b,a) is cut,
    // so its positions take the α·nu(a)/T backoff instead of ln(1/3).
    val tiny = Seq((1L, "a b a b c"), (2L, "a b c"), (10L, "a b zzz c"))
      .toDF("doc_id", "text")
    val got = rows(graft.operators.TextAnalysis
      .bigramBackoffLogProbCut(tiny, "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0, minCount = 2L))
    got(1L) shouldBe ((4L, r6(
      (0 + math.log(0.4 * 3 / 8.0) + 0 + math.log(2.0 / 3)) / 4)))
    got(2L) shouldBe ((2L, r6(math.log(2.0 / 3) / 2)))
    // doc 10's branches were already backoff/floor — identical to exact
    got(10L) shouldBe ((3L, r6(
      (0 + math.log(0.4 * 1 / 8.0) + math.log(0.4 * 2 / 8.0)) / 3)))
  }

  test("trigram cut minCount=2: each level falls through independently (hand-verified)") {
    import spark.implicits._
    val a = 0.4
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // train: unigrams a:3 b:3 c:2 d:1 (T=9); bigrams ab:3 bc:2 ca:1 bd:1;
    // trigrams abc:2 bca:1 cab:1 abd:1. minCount=2 keeps trigram abc,
    // bigrams ab/bc, unigrams a/b/c.
    val tiny = Seq(
      (1L, "a b c a b c"), (2L, "a b d"),
      (10L, "a b c x d"), (20L, "d a b"))
      .toDF("doc_id", "text")
    val got = rows(graft.operators.TextAnalysis
      .trigramBackoffLogProbCut(tiny, "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0, minCount = 2L))
    // doc 1: abc kept → ln(2/3); bca cut → bigram (c,a) cut → unigram a
    // kept → ln(α²·3/9); cab cut → bigram (a,b) kept → ln(α·3/3); abc.
    got(1L) shouldBe ((4L, r6(
      (math.log(2.0 / 3) + math.log(a * a * 3 / 9.0) +
        math.log(a * 3 / 3.0) + math.log(2.0 / 3)) / 4)))
    // doc 2: abd cut → (b,d) cut → d cut (nu=1 < 2) → floor α²·1/9
    got(2L) shouldBe ((1L, r6(math.log(a * a * 1 / 9.0))))
    // docs 10/20: every branch already lands where the exact path did
    // (x unseen → floor; d cut scores as the coalesce-1 floor exact used
    // for nu=1; (a,b) kept) — cut output equals the exact output
    val exact = rows(graft.operators.TextAnalysis
      .trigramBackoffLogProb(tiny, "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0))
    got(10L) shouldBe exact(10L)
    got(20L) shouldBe exact(20L)
  }

  test("combination banding with (combo, key) caps is lossless vs brute force on a random hash corpus") {
    import spark.implicits._
    // 400 hashes: 200 seeded-random (uniform — banding must not lose any
    // close pair) + 200 built as ≤5-bit perturbations of 50 bases (dense
    // near-dup structure — exercises equal-hash groups and multi-block
    // diffs). Deterministic seed; brute force is the ground truth.
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(200)(rnd.nextLong())
    val pert = Seq.fill(200) {
      val b = base(rnd.nextInt(50))
      (0 until rnd.nextInt(6)).foldLeft(b)((h, _) => h ^ (1L << rnd.nextInt(64)))
    }
    val hashes = (base ++ pert).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("id", "h64")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = pairSet(hashes.as("a")
      .join(hashes.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        bit_count(col("a.h64").bitwiseXOR(col("b.h64"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 5))
    for (nBlocks <- Seq(6, 7, 8)) {
      val banded = pairSet(graft.operators.Dedup.hammingPairsBlocks(
        hashes, "id", "h64", maxDist = 5, bucketCap = 100000, nBlocks = nBlocks))
      withClue(s"nBlocks=$nBlocks ") { banded shouldBe brute }
    }
  }

  test("hammingPairs over-cap semantics: caps count DISTINCT hashes, equal-hash pairs survive any cap") {
    import spark.implicits._
    // Bucket stress: hashes k (k < 64) have DISTINCT chunk-0 values
    // (singleton buckets) but all share chunks 1..3 (= 0), so those
    // three buckets hold 64 distinct hashes — over a cap of 8 they drop
    // and no cross-hash candidate survives anywhere. Meanwhile hash 5
    // appears under THREE ids (5, 105, 205): its distance-0 pairs must
    // survive even though every multi-hash bucket containing hash 5 is
    // over-cap — the ADVICE divergence scenario, now the engine contract
    // the d04/m06 oracles replay.
    val rows =
      (0 until 64).map(k => (k.toLong, k.toLong)) ++          // dense group
      Seq((105L, 5L), (205L, 5L))                             // dup ids of hash 5
    val out = graft.operators.Dedup.hammingPairs(
        rows.toDF("id", "h64"), "id", "h64", maxDist = 3, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every chunk bucket the dense group lands in holds 64 distinct
    // hashes > cap 8 ⇒ no cross-hash candidates at all...
    out.filter(_._3 > 0) shouldBe empty
    // ...but the three ids sharing hash 5 still pair at distance 0,
    // because expandHashPairs emits equal-hash pairs OUTSIDE the caps
    out shouldBe Set((5L, 105L, 0L), (5L, 205L, 0L), (105L, 205L, 0L))
    // and with the cap lifted the dense group pairs normally again
    val uncapped = graft.operators.Dedup.hammingPairs(
        rows.toDF("id", "h64"), "id", "h64", maxDist = 3, bucketCap = 100000)
      .collect()
    uncapped.length should be > 3
  }

  test("t33 scores the position stream through broadcast joins only (the zero-shuffle-scoring claim)") {
    val plan = graft.SparkEntry.queries("t33_bigram_backoff_cut")(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    withClue("a sort-merge join would reshuffle the position stream: ") {
      plan should not include "SortMergeJoin"
    }
  }

  test("incrementalMinhash pairs batch against existing ONLY, never within a side") {
    import spark.implicits._
    // e1/e2: identical existing docs (existing×existing — must NOT pair);
    // b1: identical to e1 (must pair, jaccard 1.0); b2: identical to b1
    // (batch×batch — must NOT pair); b3: unrelated (no pair)
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val existing = Seq((10L, shared), (20L, shared)).toDF("doc_id", "text")
    val batch = Seq((1L, shared), (2L, shared),
      (3L, "completely different words in this one here nothing shared at all"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalMinhash(
        batch, existing, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    out shouldBe Set((1L, 10L, 1.0), (1L, 20L, 1.0),
                     (2L, 10L, 1.0), (2L, 20L, 1.0))
    // deterministic: a re-run is identical
    graft.operators.Dedup.incrementalMinhash(
        batch, existing, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet shouldBe out
  }

  test("hammingPairsAgainst: one-sided pairing, equal-hash bypass survives over-cap index buckets") {
    import spark.implicits._
    // plain case: batch hash 0 equals existing id 10 and is 1 bit from
    // existing id 20; existing 10/20 are 1 bit apart WITHIN the side
    // (must not pair); batch id 2 is > maxDist from everything
    val existing = Seq((10L, 0L), (20L, 1L)).toDF("id", "h64")
    val batch = Seq((1L, 0L), (2L, 255L)).toDF("id", "h64")
    val out = graft.operators.Dedup.hammingPairsAgainst(
        batch, existing, "id", "h64", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set((1L, 10L, 0L), (1L, 20L, 1L))
    // over-cap case: 64 dense existing hashes share chunks 1..3 (buckets
    // of 64 distinct hashes > cap 8 → dropped, so near-misses vanish —
    // the documented cap drop), but the batch item byte-identical in
    // fingerprint to TWO indexed items still pairs via the cap-free
    // equal-hash bypass
    val dense = ((0 until 64).map(k => (1000L + k, k.toLong)) :+ (2000L, 5L))
      .toDF("id", "h64")
    val probe = Seq((1L, 5L)).toDF("id", "h64")
    val capped = graft.operators.Dedup.hammingPairsAgainst(
        probe, dense, "id", "h64", maxDist = 3, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    capped shouldBe Set((1L, 1005L, 0L), (1L, 2000L, 0L))
  }

  test("q106 streaming admission equals batch d16 at the gate's batch boundaries") {
    def rows3(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    rows3("q106_streaming_admission") shouldBe rows3("d16_incremental_minhash")
  }

  test("embeddingDecontam flags planted eval duplicates and clears orthogonal vectors") {
    import spark.implicits._
    val evalVec = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val ortho = Array.tabulate(8)(i => if (i >= 4) 1.0f else 0.0f)
    val evalSet = Seq((100L, evalVec)).toDF("vec_id", "embedding")
    val corpus = Seq((1L, evalVec), (2L, ortho)).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .embeddingDecontam(corpus, evalSet, threshold = 0.35)
      .collect().map(r =>
        r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getBoolean(3))).toMap
    got(1L) shouldBe ((1.0, 100L, true))   // exact planted duplicate
    got(2L) shouldBe ((0.0, 100L, false))  // orthogonal: sim 0, clean
  }

  test("tokenBudgetMixThreshold exhaustion fallback: admit set equals window path even when escalation can't settle") {
    // A heavy-tailed source: one doc holds nearly all the mass, so a
    // priority cutoff sized from average token mass almost surely misses
    // it and every escalation round stays short unless the giant's hash
    // lands in the slice. With safety driven to ~0 the 8 rounds reach at
    // most safety·2^8 ≈ tiny coverage — the fallback must then take the
    // FULL slice for that source, reproducing the window path exactly.
    import spark.implicits._
    val giant = ("w " * 5000).trim
    val docs = ((1L to 40L).map(i => (i, "src", "a b c d e")) :+
      (99L, "src", giant)).toDF("doc_id", "source", "text")
    def admitted(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val window = admitted(graft.operators.TextAnalysis.tokenBudgetMix(
      docs, "doc_id", "source", "text", temperature = 1.0,
      budgetTokens = 5100L))
    val threshold = admitted(graft.operators.TextAnalysis
      .tokenBudgetMixThreshold(docs, "doc_id", "source", "text",
        temperature = 1.0, budgetTokens = 5100L, safety = 1e-6))
    threshold shouldBe window
  }
}
