package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The integer fixed-point classifier trainer (gate t36): learns a
  * separable vocabulary, improves its integer error mass, and is
  * bit-identical across partitionings — the properties the
  * hash-oracle's from-scratch retrain builds on.
  */
class FixedPointClassifierSpec extends SparkSpec {

  import spark.implicits._

  // class vocabularies hash to disjoint bucket sets (en: {52, 24},
  // fr: {20, 22, 13} at buckets = 64) — within-class collisions are
  // harmless, cross-class ones would blur the toy signal
  private def toy = (0 until 40).map { i =>
    if (i % 2 == 0) (i.toLong, "aaa bbb ccc aaa", "en")
    else (i.toLong, "xxx yyy zzz yyy", "fr")
  }.toDF("doc_id", "text", "lang")

  test("separable vocab: accuracy reaches 100% and error mass falls") {
    val (w, hist) = TextAnalysis.trainClassifierFixedPoint(
      toy, "doc_id", "text", col("lang") === "en", iters = 4)
    val h = hist.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // iteration 1 is the zero-weight plateau: p = ½ exactly for every
    // doc ⇒ all predicted negative ⇒ correct = the fr half
    h.head._3 shouldBe 20L
    h.last._3 shouldBe 40L
    h.last._2 should be < h.head._2
    w.length shouldBe 65
    w.exists(_ != 0L) shouldBe true
  }

  test("bit-identical weights across partitionings (exact Long sums)") {
    val (a, _) = TextAnalysis.trainClassifierFixedPoint(
      toy.repartition(1), "doc_id", "text", col("lang") === "en", iters = 3)
    val (b, _) = TextAnalysis.trainClassifierFixedPoint(
      toy.repartition(7, col("doc_id")), "doc_id", "text",
      col("lang") === "en", iters = 3)
    a.toSeq shouldBe b.toSeq
  }

  test("hand case: the zero-init iteration's gradients and update") {
    // one en doc "aaa" (bucket 52, cnt 1), one fr doc "xxx" (bucket 20):
    // iter 1 p = 500000 both; e = -500000 (en), +500000 (fr);
    // g_52 = -500000, g_20 = +500000, gb = 0; n = 2, lrDen = 2 ⇒
    // w_52 = -floor(-500000/4) = +125000, w_20 = -125000, bias 0
    val docs = Seq((1L, "aaa", "en"), (2L, "xxx", "fr"))
      .toDF("doc_id", "text", "lang")
    val (w, _) = TextAnalysis.trainClassifierFixedPoint(
      docs, "doc_id", "text", col("lang") === "en", iters = 1)
    w(52) shouldBe 125000L
    w(20) shouldBe -125000L
    w(64) shouldBe 0L
    w.zipWithIndex.filter { case (_, j) => j != 52 && j != 20 }
      .foreach(_._1 shouldBe 0L)
  }
}
