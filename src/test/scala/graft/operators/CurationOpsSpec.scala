package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the round-3 curation operators on crafted inputs
  * where the expected answer is computable by hand: chunk dedup, quality
  * rules, PII redaction, sequence packing, stratified rebalancing,
  * blocked fuzzy matching, centroid assignment.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("chunkDedup flags the globally-later copy of a shared chunk") {
    val docs = Seq(
      (1L, "a b c d e f g h"),          // chunks: "a b c d", "e f g h"
      (2L, "a b c d x y z w"),          // first chunk duplicates doc 1's
      (3L, "p q r")                     // one short chunk, unique
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(docs, "text", "doc_id", chunkWords = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out(1L) shouldBe ((2L, 0L))
    out(2L) shouldBe ((2L, 1L))
    out(3L) shouldBe ((1L, 0L))
  }

  test("qualityRules: rule flags, bitmask arithmetic, and keep flag") {
    // 64 distinct 4-letter words (mean length ≥ 3, no repetition, alpha
    // ratio 4/5) plus two stopword markers
    val good = "the and " + (for (a <- 'a' to 'h'; b <- 'a' to 'h')
      yield s"w$a${b}x").mkString(" ")
    val repetitive = "spam ham " * 40                   // rep_ratio ≈ 1
    val short = "tiny doc"                              // fails word count
    val docs = Seq((1L, good), (2L, repetitive.trim), (3L, short))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityRules(docs, "text")
      .select("doc_id", "r_word_count", "r_repetition", "rule_mask", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out(1L)._1 shouldBe 1L          // long enough
    out(1L)._4 shouldBe 1L          // passes everything
    out(1L)._3 shouldBe 31L         // all five bits set
    out(2L)._2 shouldBe 0L          // repetition rule fails
    out(2L)._4 shouldBe 0L
    out(3L)._1 shouldBe 0L          // too short
    out(3L)._4 shouldBe 0L
  }

  test("piiRedact counts and scrubs emails and 555-phone patterns") {
    val docs = Seq(
      (1L, "reach me at jane.doe@example.org or 555-0142 thanks"),
      (2L, "no contact info here")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs, "text")
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    out(1L)._1 shouldBe 1L
    out(1L)._2 shouldBe 1L
    out(1L)._3 shouldBe "reach me at <EMAIL> or <PHONE> thanks"
    out(2L) shouldBe ((0L, 0L, "no contact info here"))
  }

  test("sequencePacking bins by the prefix-sum start offset within each group") {
    // tokens: 4, 4, 4 with budget 8 → starts at 0, 4, 8 → bins 0, 0, 1
    val docs = Seq(
      ("g", 1L, "w w w w"), ("g", 2L, "x x x x"), ("g", 3L, "y y y y"))
      .toDF("lang", "doc_id", "text")
    val out = TextAnalysis.sequencePacking(docs, "text", "doc_id", "lang", 8)
      .orderBy("bin").collect()
    out.map(_.getLong(1)) shouldBe Array(0L, 1L)
    out.map(_.getLong(2)) shouldBe Array(2L, 1L)          // docs per bin
    out.map(_.getLong(3)) shouldBe Array(8L, 4L)          // tokens per bin
  }

  test("stratifiedRebalance keeps the whole smallest stratum and shrinks the rest") {
    val docs = (1L to 300L).map(i => (i, if (i <= 60) "small" else "big"))
      .toDF("doc_id", "stratum")
    val out = TextAnalysis.stratifiedRebalance(docs, "doc_id", "stratum")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out("small") shouldBe ((60L, 60L))                    // threshold = 100%
    out("big")._1 shouldBe 240L
    // hash acceptance targets 60/240 = 25%; allow sampling noise
    out("big")._2.toDouble shouldBe (60.0 +- 25.0)
  }

  test("blockedFuzzyPairs scores only within blocks and multiplies row counts") {
    val rows = Seq.fill(3)("cold plate") ++ Seq.fill(2)("old plate") ++
      Seq("old gear", "cold ring", "bold plate")
    val df = rows.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
      .withColumn("noun", split(col("name"), " ").getItem(1))
    val out = EntityResolution.blockedFuzzyPairs(df, "name", "noun", maxDist = 2)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    out(("bold plate", "cold plate")) shouldBe ((1L, 3L))
    out(("bold plate", "old plate")) shouldBe ((1L, 2L))  // drop the 'b'
    out(("cold plate", "old plate")) shouldBe ((1L, 6L))  // 3 × 2 row pairs
    // "old gear" and "cold ring" are in other blocks: no cross-block pairs
    out.keys.flatMap(p => Seq(p._1, p._2)) should not contain "old gear"
  }

  test("assignToCentroids sends every vector to its own cluster's centroid") {
    val vecs = (0 until 20).map { i =>
      val grp = if (i % 2 == 0) "lo" else "hi"
      val base = if (grp == "lo") 0.0f else 10.0f
      (i.toLong, grp, Array(base + i % 3 * 0.1f, base - i % 2 * 0.1f))
    }.toDF("vec_id", "grp", "embedding")
    val cents = Similarity.centroids(vecs, "grp", "embedding")
    val out = Similarity.assignToCentroids(vecs, cents, "vec_id", "grp", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out(("lo", "lo")) shouldBe 10L
    out(("hi", "hi")) shouldBe 10L
    out.keySet shouldBe Set(("lo", "lo"), ("hi", "hi"))   // diagonal only
  }

  test("removeBoilerplate cuts chunks shared by >maxDocs docs, keeps order") {
    // "h1 h2 h3 h4" leads 3 of 4 docs → boilerplate at maxDocs=2;
    // every other chunk is unique and must survive in document order
    val docs = Seq(
      (1L, "h1 h2 h3 h4 a1 a2 a3 a4 b1 b2 b3 b4"),
      (2L, "h1 h2 h3 h4 c1 c2 c3 c4"),
      (3L, "h1 h2 h3 h4 d1 d2 d3 d4"),
      (4L, "e1 e2 e3 e4")
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "text", "doc_id",
        chunkWords = 4, maxDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    out(1L) shouldBe ((3L, 1L, "a1 a2 a3 a4 b1 b2 b3 b4"))
    out(2L) shouldBe ((2L, 1L, "c1 c2 c3 c4"))
    out(3L) shouldBe ((2L, 1L, "d1 d2 d3 d4"))
    out(4L) shouldBe ((1L, 0L, "e1 e2 e3 e4"))
  }

  test("removeBoilerplate rebuilds an all-boilerplate doc as empty text") {
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "x y z w"), (4L, "x y z w")
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "text", "doc_id",
        chunkWords = 4, maxDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    out.values.toSet shouldBe Set("")
  }

  test("canonicalByScore keeps the highest-quality member per cluster, ties to lowest id") {
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9),  // cluster A: 2 wins (tie 2 vs 3 → lower id)
      (4L, 0.1), (5L, 0.8),             // cluster B: 5 wins
      (6L, 0.3)                         // unclustered: its own canonical
    ).toDF("doc_id", "quality_score")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L)
    ).toDF("id", "component")
    val out = Dedup.canonicalByScore(scored, clusters, "doc_id", "quality_score")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    out(1L) shouldBe ((2L, false))
    out(2L) shouldBe ((2L, true))
    out(3L) shouldBe ((2L, false))
    out(4L) shouldBe ((5L, false))
    out(5L) shouldBe ((5L, true))
    out(6L) shouldBe ((6L, true))
  }

  test("embeddingOutliers flags exactly the far-from-prototype vector per class") {
    // 20 vectors at the class origin + 1 planted far point, two classes
    val rows =
      (1L to 20L).map(i => (i, "a", Seq(0.0f, 0.0f))) ++
        Seq((21L, "a", Seq(10.0f, 0.0f))) ++                // the outlier
        (31L to 50L).map(i => (i, "b", Seq(5.0f, 5.0f))) ++
        Seq((51L, "b", Seq(5.0f, -9.0f)))
    val df = spark.createDataFrame(rows).toDF("vec_id", "grp", "embedding")
    val out = Similarity.embeddingOutliers(df, "grp", "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    out.filter(_._2).keySet shouldBe Set(21L, 51L)
    out.size shouldBe 42
  }

  test("duplicateSpanStats finds cross-doc and within-doc spans, merges islands") {
    val docs = Seq(
      (1L, "u1 u2 A B C D E u3 u4"),   // shares A..E (5 tokens) with doc 2
      (2L, "A B C D E v1 v2 v3"),
      (3L, "X Y Z W q X Y Z W"),       // same 4-token run twice in ONE doc
      (4L, "tiny")                     // shorter than L: no shingles at all
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(docs, "text", "doc_id", spanTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 1: dup shingle positions 2,3 merge into one span [2,7) = 5 tokens
    out(1L) shouldBe ((9L, 2L, 1L, 5L))
    out(2L) shouldBe ((8L, 2L, 1L, 5L))
    // doc 3: positions 0 and 5 are 5 apart (> L) — two spans, 8 tokens
    out(3L) shouldBe ((9L, 2L, 2L, 8L))
    out(4L) shouldBe ((1L, 0L, 0L, 0L))
  }

  test("stripDuplicateSpans cuts ALL copies of duplicated spans, keeps the rest") {
    val docs = Seq(
      (1L, "u1 u2 A B C D E u3 u4"),
      (2L, "A B C D E v1 v2 v3"),
      (3L, "X Y Z W q X Y Z W"),
      (4L, "tiny")
    ).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, "text", "doc_id", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "u1 u2 u3 u4"
    out(2L) shouldBe "v1 v2 v3"
    out(3L) shouldBe "q"
    out(4L) shouldBe "tiny"
    // cross-consistency: stripped token count == n_tokens - dup_tokens
    val stats = Dedup.duplicateSpanStats(docs, "text", "doc_id", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(4))).toMap
    out.foreach { case (id, clean) =>
      val kept = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
      kept shouldBe stats(id)
    }
  }
}
