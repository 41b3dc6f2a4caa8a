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
