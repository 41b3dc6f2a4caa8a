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

  test("epochShuffle is a deterministic permutation with contiguous per-shard positions") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val e3 = graft.operators.TextAnalysis.epochShuffle(docs, "doc_id", epoch = 3, nShards = 8)
    val rows = e3.collect()
    rows.length.toLong shouldBe n                       // every doc exactly once
    rows.map(_.getLong(0)).distinct.length.toLong shouldBe n
    // per-shard positions are 1..count(shard), no gaps
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      rs.map(_.getLong(2)).sorted shouldBe (1L to rs.length.toLong).toArray
    }
    // pure function of (epoch, id): a re-run is bit-identical
    val rerun = graft.operators.TextAnalysis
      .epochShuffle(docs, "doc_id", epoch = 3, nShards = 8).collect()
    rerun.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a different epoch reorders: same ids, (shard, pos) largely different
    val e4 = graft.operators.TextAnalysis
      .epochShuffle(docs, "doc_id", epoch = 4, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val same = rows.count(r => e4(r.getLong(0)) == ((r.getLong(1), r.getLong(2))))
    same.toDouble / n should be < 0.05
  }

  test("dsirScore ranks in-target (en) documents above out-of-target on average") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val scored = graft.operators.TextAnalysis
      .dsirScore(docs, "doc_id", "text", targetPred = col("lang") === "en")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val byTarget = scored.groupBy(col("lang") === "en")
      .agg(avg(col("logw") / col("n_tokens")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    byTarget(true) should be > byTarget(false)
  }

  test("tokenBudgetMix fills each source to its budget and no further (greedy prefix)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val kept = graft.operators.TextAnalysis.tokenBudgetMix(
      docs, "doc_id", "source", "text", temperature = 0.6, budgetTokens = 25000L)
    val bySource = kept.groupBy("source")
      .agg(sum("n_tokens").as("kept_tokens"), count(lit(1)).as("kept_docs"),
           max("budget_tokens").as("budget"), max("cum_before").as("max_cum"))
      .collect()
    val allDocs = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { r =>
      val (src, keptTokens, keptDocs, budget, maxCum) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      maxCum should be < budget                    // every admitted doc had room before it
      if (keptDocs < allDocs(src))                 // budget bound: either exhausted…
        keptTokens should be >= budget             // …(last doc may overshoot)
      else keptDocs shouldBe allDocs(src)          // …or the whole source fit
    }
    // pure function of ids: a re-run admits the identical multiset
    val again = graft.operators.TextAnalysis.tokenBudgetMix(
      docs, "doc_id", "source", "text", 0.6, 25000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    again shouldBe kept.select("doc_id").collect().map(_.getLong(0)).sorted
  }

  test("tokenBudgetMixThreshold (the 100 TB path) admits the identical set as the window path") {
    val docs = graft.Tables.documents(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._2, r._1)).toSeq
    val window = rows(graft.operators.TextAnalysis.tokenBudgetMix(
      docs, "doc_id", "source", "text", temperature = 0.6, budgetTokens = 25000L))
    val threshold = rows(graft.operators.TextAnalysis.tokenBudgetMixThreshold(
      docs, "doc_id", "source", "text", temperature = 0.6, budgetTokens = 25000L))
    threshold shouldBe window // every column, cum_before included
    // a pathologically low safety factor still converges via the
    // escalation loop to the same admit set
    val tight = rows(graft.operators.TextAnalysis.tokenBudgetMixThreshold(
      docs, "doc_id", "source", "text", 0.6, 25000L, safety = 0.1))
    tight shouldBe window
  }

  test("stupid-backoff bigram LM: corpus shape + all three scoring branches hand-verified") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val pred = col("doc_id") % 10 =!= 0
    val scored = graft.operators.TextAnalysis
      .bigramBackoffLogProb(docs, "text", "doc_id", trainPred = pred)
    val byRow = scored.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val fsize = org.apache.spark.sql.functions.size _
    byRow.size.toLong shouldBe docs.filter(fsize(split(col("text"), " ")) >= 2).count()
    // n_bigrams = tokens − 1
    val toks = docs.select(col("doc_id"), fsize(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byRow.foreach { case (id, (nb, _)) => assert(nb == (toks(id) - 1).toLong) }
    // pure function of the corpus: a re-run is bit-identical
    graft.operators.TextAnalysis
      .bigramBackoffLogProb(docs, "text", "doc_id", trainPred = pred)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap shouldBe byRow

    // all three branches with hand-computed numbers: train unigrams
    // a:3 b:3 c:2 (T=8), train bigrams (a,b):3 (b,a):1 (b,c):2.
    // doc 10 (held out): (a,b) seen → ln(3/3)=0; (b,zzz) w-unseen →
    // ln(0.4·1/8); (zzz,c) bigram-unseen, c seen → ln(0.4·2/8)
    import spark.implicits._
    val tiny = Seq((1L, "a b a b c"), (2L, "a b c"), (10L, "a b zzz c"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bigramBackoffLogProb(tiny, "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got(1L) shouldBe ((4L, BigDecimal(
      (0 + math.log(1.0 / 3) + 0 + math.log(2.0 / 3)) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    got(2L) shouldBe ((2L, BigDecimal(math.log(2.0 / 3) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    got(10L) shouldBe ((3L, BigDecimal(
      (0 + math.log(0.4 * 1 / 8.0) + math.log(0.4 * 2 / 8.0)) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("stupid-backoff trigram LM: the three-level recursion hand-verified") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // train: unigrams a:3 b:3 c:2 d:1 (T=9); bigrams ab:3 bc:2 ca:1 bd:1;
    // trigrams abc:2 bca:1 cab:1 abd:1
    val tiny = Seq(
      (1L, "a b c a b c"), (2L, "a b d"),
      (10L, "a b c x d"), // seen trigram + two α² floors (x unseen)
      (20L, "d a b"))     // trigram unseen, bigram (a,b) seen → α·3/3
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .trigramBackoffLogProb(tiny, "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val a = 0.4
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(1L) shouldBe ((4L,
      r6((2 * math.log(2.0 / 3) + math.log(1.0 / 2) + 0.0) / 4)))
    got(2L) shouldBe ((1L, r6(math.log(1.0 / 3))))
    got(10L) shouldBe ((3L,
      r6((math.log(2.0 / 3) + 2 * math.log(a * a * 1 / 9.0)) / 3)))
    got(20L) shouldBe ((1L, r6(math.log(a * 3 / 3.0))))
  }

  test("hybridRrfTopK: dense ranks, both-list docs beat equal single-list docs, deterministic") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Similarity.hybridRrfTopK(
      graft.Tables.documents(spark, sfDir), graft.Tables.embeddings(spark, sfDir),
      queryTerms = Seq("join", "filter", "scan"), queryVecId = 1L,
      k = 20, poolK = 50).collect()
    out.map(_.getLong(0)).sorted shouldBe (1L to 20L).toArray
    // rrf strictly decreasing in rank up to the 6dp rounding, ties by id
    out.sortBy(_.getLong(0)).sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) > b.getDouble(2) ||
        (a.getDouble(2) == b.getDouble(2) && a.getLong(1) < b.getLong(1)))
    }
    // any doc present in BOTH lists must outscore a doc whose single-list
    // rank equals either of its ranks (the fusion property)
    val both = out.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    val single = out.filter(r => r.isNullAt(3) ^ r.isNullAt(4))
    for (b <- both; s <- single) {
      val sRank = if (s.isNullAt(3)) s.getLong(4) else s.getLong(3)
      if (sRank >= math.min(b.getLong(3), b.getLong(4)))
        assert(b.getDouble(2) > s.getDouble(2),
          s"doc ${b.getLong(1)} in both lists should outscore doc ${s.getLong(1)}")
    }
  }

  test("trainClassifier: loss falls monotonically on the corpus, retrains bit-identical") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val (w, hist) = graft.operators.TextAnalysis.trainClassifier(
      docs, "text", col("lang") === "en")
    val rows = hist.collect().sortBy(_.getLong(0))
    rows.map(_.getLong(0)) shouldBe (1L to 8L).toArray
    rows.sliding(2).foreach { case Array(a, b) =>
      b.getDouble(1) should be < a.getDouble(1) // loss strictly decreases
    }
    val (w2, hist2) = graft.operators.TextAnalysis.trainClassifier(
      docs, "text", col("lang") === "en")
    w2 shouldBe w                                // bit-identical retrain
    hist2.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))) shouldBe
      rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
  }

  test("trainClassifier learns a separable vocabulary split to high accuracy") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two vocab-disjoint classes: the hashed-BOW boundary exists exactly
    val good = Seq("alpha", "bravo", "charlie", "delta", "echo",
                   "foxtrot", "golf", "hotel", "india", "juliett")
    val bad = Seq("kilo", "lima", "mike", "november", "oscar",
                  "papa", "quebec", "romeo", "sierra", "tango")
    val rng = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      val vocab = if (i % 2 == 0) good else bad
      val words = Seq.fill(30)(vocab(rng.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "is_good")
    val (_, hist) = graft.operators.TextAnalysis.trainClassifier(
      docs, "text", col("is_good"), buckets = 256, iters = 12)
    val last = hist.collect().maxBy(_.getLong(0))
    last.getDouble(2) should be >= 0.95
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

  test("trainBpeMerges reproduces the canonical Sennrich example; apply tokenizes accordingly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the BPE paper's worked vocabulary: low×5, lower×2, newest×6, widest×3
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.trainBpeMerges(docs, "text", 4)
    // hand-derived with this engine's tie-break (count desc, pair asc):
    // es(9, tie with "s t") → est(9) → lo(7, tie with "o w") → low(7)
    merges shouldBe Seq(
      ("e s", "es"), ("es t", "est"), ("l o", "lo"), ("lo w", "low"))
    // retrain is bit-identical (deterministic argmax)
    graft.operators.TextAnalysis.trainBpeMerges(docs, "text", 4) shouldBe merges
    // apply: word boundaries survive ('¤' never merges), merges nest
    val toks = Seq("newest low").toDF("text")
      .select(graft.operators.TextAnalysis
        .applyBpeTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    toks shouldBe Seq("n", "e", "w", "est", "low")
  }

  test("hardTriplets mines the exact hardest positive and negatives with correct margins") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val out = graft.operators.Similarity
      .hardTriplets(emb, emb.filter(col("vec_id") % 25 === 0), negK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val anchors = vecs.filter(_._1 % 25 == 0)
    anchors.length should be > 0
    anchors.foreach { case (aid, av, al) =>
      val rows = out.filter(_._1 == aid)
      val pos = rows.filter(_._2 == "pos")
      val neg = rows.filter(_._2 == "neg").sortBy(_._3)
      pos.length shouldBe 1
      neg.length shouldBe 3
      // brute-force reference ranking per kind
      val cands = vecs.filter(_._1 != aid)
      val bestPos = cands.filter(_._3 == al)
        .map { case (cid, cv, _) => (cid, cos(av, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.head
      val topNeg = cands.filter(_._3 != al)
        .map { case (cid, cv, _) => (cid, cos(av, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(3)
      pos.head._4 shouldBe bestPos._1
      pos.head._5 shouldBe (BigDecimal(bestPos._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-6)
      neg.map(_._4).toSeq shouldBe topNeg.map(_._1).toSeq
      // margin = rounded pos sim − rounded neg sim, on every neg row
      neg.foreach { n =>
        n._6.isDefined shouldBe true
        n._6.get shouldBe (pos.head._5 - n._5 +- 1e-9)
      }
      pos.head._6 shouldBe None
    }
  }

  test("slidingChunks covers every token, overlaps by window−stride, and hashes slices") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")), // 80 tokens: 3 chunks
      (2L, (1 to 32).map(i => s"w$i").mkString(" ")), // exactly one window
      (3L, "a b c"))                                  // short doc: 1 chunk
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .slidingChunks(docs, "text", "doc_id", windowTokens = 32, strideTokens = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 80 tokens: starts 0,24,48 → ceil((80−32)/24)+1 = 3 chunks; last is full
    out.filter(_._1 == 1L).sortBy(_._2) shouldBe Seq(
      (1L, 0L, 0L, 32L), (1L, 1L, 24L, 32L), (1L, 2L, 48L, 32L))
    out.filter(_._1 == 2L) shouldBe Seq((2L, 0L, 0L, 32L))
    out.filter(_._1 == 3L) shouldBe Seq((3L, 0L, 0L, 3L))
    // coverage: union of [start, start+n_tok) spans every token index
    val covered = out.filter(_._1 == 1L)
      .flatMap(c => c._3 until (c._3 + c._4)).toSet
    covered shouldBe (0L until 80L).toSet
    // chunk hash equals the portable hash of the joined slice
    val h = graft.operators.TextAnalysis
      .slidingChunks(docs.filter($"doc_id" === 3L), "text", "doc_id", 32, 24)
      .select("chunk_hash").head().getLong(0)
    val expect = docs.sparkSession.range(1)
      .select(graft.functions.PortableHash.md5_64(lit("a b c"))).head().getLong(0)
    h shouldBe expect
  }

  test("minhashSigKernel equals the uncapped index-path signatures on real docs") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir).limit(100)
    val viaKernel = docs.select(col("doc_id"),
        graft.operators.Dedup.minhashSigKernel(col("text"), 3, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaIndex = graft.operators.Dedup
      .minhashSignatures(docs, "text", "doc_id", k = 32, shingleN = 3, dfCap = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    viaKernel shouldBe viaIndex
    // and the SQL registration is the same kernel
    graft.plans.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("r4_mh_docs")
    val viaSql = spark.sql(
        "SELECT doc_id, graft_minhash_sig(text, 3, 32) AS sig FROM r4_mh_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    viaSql shouldBe viaKernel
  }

  test("mmrDiverseTopK skips a near-duplicate in favor of a diverse candidate") {
    import spark.implicits._
    // query [1,0]; a & b are near-identical top hits, c is diverse and
    // moderately relevant. At λ=0.3 the redundancy penalty dominates:
    // pick 1 = a (rel argmax, tie to lower id), pick 2 = c, NOT the dup b.
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(1f, 0.001f)),
      (3L, Array(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val picks = graft.operators.Similarity
      .mmrDiverseTopK(emb, queryVecId = 0L, k = 2, poolK = 3, lambda = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    picks shouldBe Array((1L, 1L), (2L, 3L))
    // at λ=1.0 MMR degenerates to pure relevance: the dup comes back
    val rel = graft.operators.Similarity
      .mmrDiverseTopK(emb, queryVecId = 0L, k = 2, poolK = 3, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rel shouldBe Array((1L, 1L), (2L, 2L))
  }

  test("lengthBucketedBatches: ordered disjoint buckets, full deterministic batches") {
    val out = graft.operators.TextAnalysis.lengthBucketedBatches(
      graft.Tables.documents(spark, sfDir), "text", "doc_id",
      nShards = 8, batchSize = 16)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getInt(3), r.getLong(4), r.getLong(5)))
    rows.map(_._1).distinct.length shouldBe rows.length // every doc once
    // bucket token ranges are disjoint and ordered
    val ranges = rows.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (b, rs) => (b, rs.map(_._2).min, rs.map(_._2).max) }
    ranges.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) => hi should be <= lo
      case _ =>
    }
    // within each (bucket, shard): positions 0..15 per batch, only the
    // last batch may run short
    rows.groupBy(r => (r._3, r._4)).foreach { case (_, rs) =>
      val batches = rs.groupBy(_._5).toSeq.sortBy(_._1)
      batches.init.foreach(_._2.map(_._6).sorted shouldBe (0L until 16L).toArray)
      val last = batches.last._2.map(_._6).sorted
      last shouldBe (0L until last.length.toLong).toArray
    }
    // deterministic: identical on rerun
    val again = graft.operators.TextAnalysis.lengthBucketedBatches(
      graft.Tables.documents(spark, sfDir), "text", "doc_id", 8, 16)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSet
    rows.map(r => (r._1, r._5, r._6)).toSet shouldBe again
  }

  test("snapshotDiff classifies added/removed/changed/unchanged from hash pairs") {
    import spark.implicits._
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.snapshotDiff(oldSnap, newSnap, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    out shouldBe Map(1L -> "removed", 2L -> "unchanged",
                     3L -> "changed", 4L -> "added")
  }
}
