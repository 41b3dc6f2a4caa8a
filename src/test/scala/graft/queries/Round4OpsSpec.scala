package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Round-4 additions that the DuckDB oracle cannot check directly. */
class Round4OpsSpec extends SparkSpec {

  test("SQL text kernels equal the Scala-API kernels row for row (shared expression tree)") {
    import org.apache.spark.sql.functions._
    graft.plans.GraftExtensions.register(spark)
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
    docs.createOrReplaceTempView("r4_docs")
    val viaSql = spark.sql("""
      SELECT doc_id, graft_lang_id(text) AS lang_pred,
             graft_token_count(text) AS n_tokens,
             graft_classifier_score(text) AS score,
             graft_fingerprint(text) AS fp
      FROM r4_docs""").collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val viaApi = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.langId(col("text")),
        graft.operators.TextAnalysis.tokenCount(col("text")),
        graft.operators.TextAnalysis.classifierScore(col("text")),
        graft.operators.TextAnalysis.contentFingerprint(col("text")))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    viaSql shouldBe viaApi
  }

  test("approx winsorize (q36b) tracks the exact winsorize (q36) within sketch tolerance") {
    def byFlag(name: String): Map[String, (Double, Long, Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir).collect().map { r =>
        r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }.toMap
    val exact = byFlag("q36_winsorize")
    val approx = byFlag("q36b_winsorize_approx")
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (flag, (sum, lo, hi, n)) =>
      val (aSum, aLo, aHi, aN) = approx(flag)
      aN shouldBe n // the corpus pass is identical; only the bounds sketch
      // accuracy=10000 bounds the rank error at n/10000 rows per side
      math.abs(aSum - sum) / sum should be < 1e-3
      math.abs(aLo - lo).toDouble should be <= n * 0.01
      math.abs(aHi - hi).toDouble should be <= n * 0.01
    }
  }
}
