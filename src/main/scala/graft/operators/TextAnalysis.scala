package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen'd; no UDFs) — each is a single projection
  * over the scan, so they fuse into one WholeStageCodegen stage and cost
  * one pass at 100 TB.
  */
object TextAnalysis {

  /** Stopword marker sets per language for the n-gram/stopword heuristic. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "es" -> Seq("el", "la", "de", "y", "que", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  private def markerCount(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isin(markers(lang): _*))).cast("long")

  /** Language ID: argmax of per-language marker-token counts, fixed
    * priority order on ties, "und" when no marker hits at all.
    */
  def langId(textCol: Column): Column =
    langIdOfWords(split(textCol, " "))

  /** [[langId]] over an already-tokenized words array — callers that
    * stage the split (see [[qualityRules]]) pay one tokenize per row
    * instead of one per marker-set reference.
    */
  def langIdOfWords(ws: Column): Column = {
    val scores = Seq("en", "es", "de", "fr").map(l => l -> markerCount(ws, l))
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(maxScore > 0 && s === maxScore, l).otherwise(acc)
    }
  }

  /** [[langId]] as a staged DataFrame transform: the words array, the
    * four marker scores, and their max are each materialized once, so the
    * argmax CASE chain reads scalar attributes. The Column form inlines
    * the max per WHEN arm — ~8 re-evaluations, each re-filtering (and
    * under [[langId]] re-splitting) the text.
    */
  def withLangId(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val langs = Seq("en", "es", "de", "fr")
    val scored = langs.foldLeft(df.withColumn("_ws", split(col(textCol), " "))) {
      (acc, l) => acc.withColumn(s"_s_$l", markerCount(col("_ws"), l))
    }
    val scores = langs.map(l => l -> col(s"_s_$l"))
    val mx = col("_mx")
    val pred = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(mx > 0 && s === mx, l).otherwise(acc)
    }
    scored.withColumn("_mx", greatest(scores.map(_._2): _*))
      .withColumn(outCol, pred)
      .drop("_ws" +: "_mx" +: langs.map(l => s"_s_$l"): _*)
  }

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(textCol, " ")).cast("long")

  /** BPE-ish subword proxy count: letter runs, digit runs, and residual
    * symbols — the standard pre-tokenization regex shape.
    */
  def bpeishTokenCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Quality metrics + a composite [0,1] score: length saturation,
    * stopword ratio, lexical diversity, alpha-char ratio.
    */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    // tokenize ONCE, then reduce to per-doc scalars ONCE: inlined, the
    // split/filter/distinct array work would re-run per referencing
    // column (quality_score alone references all of them)
    val ws = col("_ws")
    // guard zero-length text: ANSI mode turns 0/0 into a job-killing
    // error, and one empty doc must not fail the corpus scan. Empty → 0.0,
    // null text → null (no otherwise-branch), mirroring the oracle SQL.
    val alphaRatio = when(length(col(textCol)) > 0,
      length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double") /
        length(col(textCol)).cast("double"))
      .when(length(col(textCol)) === 0, lit(0.0))
    val staged = df.withColumn("_ws", split(col(textCol), " "))
      .withColumn("_nw", size(ws).cast("double"))
      .withColumn("_stops", markerCount(ws, "en").cast("double"))
      .withColumn("_uniq", size(array_distinct(ws)).cast("double"))
      .withColumn("_alpha", alphaRatio)
    val (nWords, stopRatio, diversity, alpha) =
      (col("_nw"), col("_stops") / col("_nw"), col("_uniq") / col("_nw"), col("_alpha"))
    staged.withColumn("n_words", nWords.cast("long"))
      .withColumn("stop_ratio", round(stopRatio, 6))
      .withColumn("diversity", round(diversity, 6))
      .withColumn("alpha_ratio", round(alpha, 6))
      .withColumn("quality_score", round(
        least(nWords / 100.0, lit(1.0)) * 0.3 +
        least(stopRatio * 5.0, lit(1.0)) * 0.3 +
        diversity * 0.2 + alpha * 0.2, 6))
      .drop("_ws", "_nw", "_stops", "_uniq", "_alpha")
  }

  /** Benchmark decontamination: which training documents share ≥1
    * word-level n-gram with an evaluation document. The eval side is a
    * benchmark suite — tiny against a 100 TB corpus — so its exploded
    * shingle set is BROADCAST and the corpus is never shuffled; emits
    * (train_id, eval_id, n_shared) for contamination triage.
    */
  def contaminationPairs(train: DataFrame, eval_ : DataFrame,
                         textCol: String, idCol: String,
                         shingleN: Int = 5): DataFrame = {
    def sh(df: DataFrame, idName: String) = df
      .withColumn("_ws", split(col(textCol), " ")) // tokenize once per row
      .select(col(idCol).as(idName),
        explode(array_distinct(Dedup.ngramsOfWords(col("_ws"), shingleN))).as("s"))
    sh(train, "train_id").join(broadcast(sh(eval_, "eval_id")), "s")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Internal-repetition quality signal: 1 − distinct/total word n-grams.
    * Boilerplate- or loop-generated text scores high. Pure codegen'd
    * column math — single pass, no shuffle at all.
    */
  def repetitionMetrics(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3): DataFrame = {
    // words + grams materialized once each; the three output columns then
    // read two integer scalars instead of re-building the gram array
    val staged = df.withColumn("_ws", split(col(textCol), " "))
      .withColumn("_grams", Dedup.ngramsOfWords(col("_ws"), n))
      .withColumn("_ng", size(col("_grams")).cast("long"))
      .withColumn("_nd", size(array_distinct(col("_grams"))).cast("long"))
    staged.select(col(idCol),
      col("_ng").as("n_grams"),
      col("_nd").as("n_distinct"),
      round(lit(1.0) - col("_nd").cast("double") /
        col("_ng").cast("double"), 6).as("rep_ratio"))
  }

  /** TF-IDF top-k terms per document: tf = term count within the doc,
    * idf = ln(N/df) over the corpus, top-k by score (ties broken by term)
    * via the bounded-heap [[graft.plans.TopKPerGroup]] operator — no
    * per-group sort. Three shuffles total (doc×term, term, topk group),
    * each keyed small: the corpus text itself is never reshuffled.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(n) // 1-row side broadcasts
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .select(col("doc_id"), col("term"), col("score"))
    graft.plans.TopKPerGroup.perGroup(scored, Seq("doc_id"),
      Seq("score" -> true, "term" -> false), k)
  }

  /** Unigram-LM log-probability scoring — the cheap stand-in for the
    * LM-perplexity quality filters real curation pipelines run (CCNet
    * style): score each document by the average log corpus-unigram
    * probability of its tokens. Out-of-distribution / gibberish text
    * scores low. One token shuffle builds the LM; the vocabulary table
    * then joins back — left to Catalyst/AQE to broadcast when it fits
    * (web-scale vocabularies can reach 10⁹ entries, where a forced
    * broadcast would OOM the driver; cut the tail by frequency first if
    * a broadcast is required). Only the 1-row total is forced.
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val lm = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = lm.agg(sum(col("n")).as("t"))
    tok.join(lm, "term").crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           round(avg(log(col("n") / col("t"))), 6).as("avg_logprob"))
  }

  /** Stupid Backoff bigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale LM recipe:
    * no normalized discounting, just count ratios with a fixed α
    * backoff, chosen precisely because it needs only count tables that
    * build in one shuffle each and distribute trivially). The LM trains
    * on the rows matching `trainPred` (the 90% split in the gate) and
    * scores EVERY document — held-out docs hit unseen bigrams, which is
    * where the backoff earns its keep:
    *
    *   score(doc) = mean over positions i≥1 of log S(w_i | w_{i-1})
    *   S(w|v) = count(v w) / count(v)       when the bigram was seen
    *          = α · count(w) / T            otherwise (α = 0.4)
    *          = α · 1 / T                   w itself unseen (floor)
    *
    * Movement: bigram + unigram count tables are one shuffle each over
    * the TRAIN slice; scoring left-joins the position stream against
    * both — Catalyst/AQE broadcasts them when they fit. When the LM
    * outgrows broadcast (web scale), use [[bigramBackoffLogProbCut]]:
    * Brants-style frequency cutoffs + precomputed score tables, scoring
    * with zero position-stream shuffles; its `minCount = 1` setting is
    * the spec-asserted bit-identical twin of this path. Docs with fewer
    * than 2 tokens drop out.
    */
  def bigramBackoffLogProb(df: DataFrame, textCol: String, idCol: String,
                           trainPred: Column,
                           alpha: Double = 0.4): DataFrame = {
    // trainPred must be expressible over (doc_id) — it is applied both to
    // the source rows and to the exploded bigram stream
    val ws = df.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val big = ws.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS v, ws[i] AS w))")).as("vw"))
      .select(col("doc_id"), col("vw.v").as("v"), col("vw.w").as("w"))
    val train = df.filter(trainPred)
    val uni = train.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("nu"))
    val tot = uni.agg(sum(col("nu")).as("t"))
    val bg = big.filter(trainPred)
      .groupBy(col("v"), col("w")).agg(count(lit(1)).as("nb"))
    big
      .join(bg, Seq("v", "w"), "left")
      .join(uni.select(col("term").as("v"), col("nu").as("nv")), Seq("v"), "left")
      .join(uni.select(col("term").as("w"), col("nu").as("nw")), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp",
        when(col("nb").isNotNull, log(col("nb") / col("nv")))
          .otherwise(log(lit(alpha) * coalesce(col("nw"), lit(1L)) / col("t"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** The trigram level of Stupid Backoff — the RECURSION that makes
    * Brants et al. 2007 an n-gram method rather than a bigram trick:
    *
    *   S(w|u,v) = count(u v w) / count(u v)   trigram seen
    *            = α · S(w|v)                  else (recurse to bigram)
    *   with S(w|v) as in [[bigramBackoffLogProb]] (and its unseen-word
    *   floor), so an unseen trigram whose bigram is also unseen pays α².
    *
    * Per document: mean over positions i ≥ 2 of log S(w_i | w_{i-2},
    * w_{i-1}); docs with fewer than 3 tokens drop out. Count tables
    * (trigram, bigram, unigram) are one shuffle each over the train
    * slice — the same build-once-join-everywhere movement as the bigram
    * level, one order higher. At web scale use
    * [[trigramBackoffLogProbCut]] (frequency-cut, broadcast score
    * tables, zero position-stream shuffles; `minCount = 1` is the
    * bit-identical twin).
    */
  def trigramBackoffLogProb(df: DataFrame, textCol: String, idCol: String,
                            trainPred: Column,
                            alpha: Double = 0.4): DataFrame = {
    val ws = df.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val tri = ws.select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(ws) - 1), i -> struct(ws[i-2] AS u, ws[i-1] AS v, ws[i] AS w))")).as("t"))
      .select(col("doc_id"), col("t.u").as("u"), col("t.v").as("v"), col("t.w").as("w"))
    val train = df.filter(trainPred)
    val trainWs = train.select(split(col(textCol), " ").as("ws"))
    val uni = train.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("nu"))
    val tot = uni.agg(sum(col("nu")).as("t"))
    val bg = trainWs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS v, ws[i] AS w))")).as("b"))
      .groupBy(col("b.v"), col("b.w")).agg(count(lit(1)).as("nb"))
      .select(col("v"), col("w"), col("nb"))
    val tg = tri.filter(trainPred)
      .groupBy(col("u"), col("v"), col("w")).agg(count(lit(1)).as("nt"))
    tri
      .join(tg, Seq("u", "v", "w"), "left")
      .join(bg.select(col("v").as("u"), col("w").as("v"), col("nb").as("nuv")),
            Seq("u", "v"), "left")
      .join(bg.select(col("v"), col("w"), col("nb").as("nvw")), Seq("v", "w"), "left")
      .join(uni.select(col("term").as("v"), col("nu").as("nv")), Seq("v"), "left")
      .join(uni.select(col("term").as("w"), col("nu").as("nw")), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp",
        when(col("nt").isNotNull, log(col("nt") / col("nuv")))
          .when(col("nvw").isNotNull, log(lit(alpha) * col("nvw") / col("nv")))
          .otherwise(log(lit(alpha) * lit(alpha) *
            coalesce(col("nw"), lit(1L)) / col("t"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
           round(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** The 100 TB execution of [[bigramBackoffLogProb]]: frequency-cut
    * composite-LM scoring (Brants et al. 2007 §4 count cutoffs — the
    * standard web-scale LM compaction; a Zipfian tail holds most ENTRIES
    * but little MASS, so a small `minCount` shrinks the tables by orders
    * of magnitude while touching few positions).
    *
    * Two changes versus the exact path, both about movement:
    *  1. Entries with count < `minCount` are dropped from the bigram and
    *     unigram tables; positions that lose their bigram take the
    *     α-backoff, positions whose word was cut take the unseen floor —
    *     the SAME formulas the exact path applies to genuinely unseen
    *     n-grams, so the approximation is "pretend rare = unseen".
    *  2. Scored values are PRECOMPUTED into the tables (seen-bigram
    *     table carries log(nb/nv) directly, joined once on (v, w)), and
    *     both tables are broadcast-hinted: the corpus-sized position
    *     stream is scored with ZERO shuffles, where the exact path's
    *     three count-table joins each reshuffle it when the LM outgrows
    *     AQE's broadcast threshold.
    *
    * `minCount = 1` cuts nothing and is spec-asserted to reproduce the
    * exact path's output bit-for-bit at 6 dp (the t26 pattern: the scale
    * path is an equality-checked twin, not a lookalike).
    */
  def bigramBackoffLogProbCut(df: DataFrame, textCol: String, idCol: String,
                              trainPred: Column, alpha: Double = 0.4,
                              minCount: Long = 1L): DataFrame = {
    val ws = df.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val big = ws.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS v, ws[i] AS w))")).as("vw"))
      .select(col("doc_id"), col("vw.v").as("v"), col("vw.w").as("w"))
    val train = df.filter(trainPred)
    val uni = train.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("nu"))
    val tot = uni.agg(sum(col("nu")).as("t"))
    // count-table-sized joins (never the position stream): seen bigrams
    // carry their final score; the kept-unigram table carries the count
    // the backoff needs
    val seen = big.filter(trainPred)
      .groupBy(col("v"), col("w")).agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= minCount)
      .join(uni.select(col("term").as("v"), col("nu").as("nv")), Seq("v"))
      .select(col("v"), col("w"), log(col("nb") / col("nv")).as("lp_seen"))
    val kept = uni.filter(col("nu") >= minCount)
      .select(col("term").as("w"), col("nu").as("nw"))
    big
      .join(broadcast(seen), Seq("v", "w"), "left")
      .join(broadcast(kept), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp", coalesce(col("lp_seen"),
        log(lit(alpha) * coalesce(col("nw"), lit(1L)) / col("t"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           round(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** Frequency-cut composite-LM execution of [[trigramBackoffLogProb]] —
    * the trigram level of [[bigramBackoffLogProbCut]], same contract:
    * per-level count cutoffs, precomputed score tables (trigram level
    * carries log(nt/nuv), bigram level carries log(α·nvw/nv)), three
    * broadcast joins against the position stream instead of the exact
    * path's five reshuffling count-table joins. `minCount = 1` is the
    * spec-asserted bit-identical twin of the exact path.
    */
  def trigramBackoffLogProbCut(df: DataFrame, textCol: String, idCol: String,
                               trainPred: Column, alpha: Double = 0.4,
                               minCount: Long = 1L): DataFrame = {
    val ws = df.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val tri = ws.select(col("doc_id"), explode(expr(
        "transform(sequence(2, size(ws) - 1), i -> struct(ws[i-2] AS u, ws[i-1] AS v, ws[i] AS w))")).as("t"))
      .select(col("doc_id"), col("t.u").as("u"), col("t.v").as("v"), col("t.w").as("w"))
    val train = df.filter(trainPred)
    val trainWs = train.select(split(col(textCol), " ").as("ws"))
    val uni = train.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("nu"))
    val tot = uni.agg(sum(col("nu")).as("t"))
    val bg = trainWs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS v, ws[i] AS w))")).as("b"))
      .groupBy(col("b.v"), col("b.w")).agg(count(lit(1)).as("nb"))
      .select(col("v"), col("w"), col("nb"))
    val seen3 = tri.filter(trainPred)
      .groupBy(col("u"), col("v"), col("w")).agg(count(lit(1)).as("nt"))
      .filter(col("nt") >= minCount)
      .join(bg.select(col("v").as("u"), col("w").as("v"), col("nb").as("nuv")),
            Seq("u", "v"))
      .select(col("u"), col("v"), col("w"), log(col("nt") / col("nuv")).as("lp3"))
    val seen2 = bg.filter(col("nb") >= minCount)
      .join(uni.select(col("term").as("v"), col("nu").as("nv")), Seq("v"))
      .select(col("v"), col("w"),
              log(lit(alpha) * col("nb") / col("nv")).as("lp2"))
    val kept = uni.filter(col("nu") >= minCount)
      .select(col("term").as("w"), col("nu").as("nw"))
    tri
      .join(broadcast(seen3), Seq("u", "v", "w"), "left")
      .join(broadcast(seen2), Seq("v", "w"), "left")
      .join(broadcast(kept), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp", coalesce(col("lp3"), col("lp2"),
        log(lit(alpha) * lit(alpha) *
          coalesce(col("nw"), lit(1L)) / col("t"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
           round(avg(col("lp")), 6).as("avg_logprob"))
  }

  /** BM25 keyword scoring (k1 = 1.2, b = 0.75): score every document for
    * a bag of query terms, return the global top-k. The inverted-index
    * shape at scale: only rows matching the (tiny) query-term set survive
    * the first filter, per-doc lengths and the two corpus scalars
    * (N, avgdl) broadcast, and the final cut runs through the bounded-heap
    * global top-k — no global sort of the scored corpus.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val lens = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = df.select(count(lit(1)).as("n_docs"))
      .crossJoin(lens.agg(avg(col("dl")).as("avgdl")))
    val tf = tok.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf.join(dfreq, "term").join(lens, "doc_id").crossJoin(stats)
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = contrib.groupBy(col("doc_id"))
      .agg(round(sum(col("c")), 6).as("score"))
    graft.plans.TopKPerGroup.perGroup(scored, Nil,
      Seq("score" -> true, "doc_id" -> false), k)
  }

  /** Email/phone patterns for PII scrubbing. Kept to RE2-compatible
    * syntax (char classes + bounded repeats, no backrefs) so the Java
    * regex engine and the DuckDB oracle's RE2 match identically.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** PII scan + redaction: occurrence counts per pattern and the scrubbed
    * text. Pure regex column math — fuses into the scan's codegen stage,
    * zero shuffles; at 100 TB this is the cheapest possible shape (one
    * pass, no data movement). Redacted text returned as a column so
    * callers can either persist it or fingerprint it.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
  }

  /** Gopher-style hard quality rules: each document gets a per-rule pass
    * flag, a combined keep flag, and a bitmask for triage dashboards.
    * Single-pass column math, no shuffle. Thresholds follow the published
    * Gopher/FineWeb heuristics adapted to whitespace tokenization.
    */
  def qualityRules(df: DataFrame, textCol: String): DataFrame = {
    // stage 1: tokenize + build trigrams ONCE; stage 2: reduce the arrays
    // to integer scalars. Inlined (the pre-round-3 shape) every rule
    // re-ran split() — ~12 tokenizations and 3 gram builds per row.
    val ws = col("_ws")
    val staged = df.withColumn("_ws", split(col(textCol), " "))
      .withColumn("_grams", Dedup.ngramsOfWords(ws, 3))
      .withColumn("_nw", size(ws).cast("double"))
      .withColumn("_marks", Seq("en", "es", "de", "fr")
        .map(l => markerCount(ws, l)).reduce(_ + _))
      .withColumn("_ng", size(col("_grams")))
      .withColumn("_nd", size(array_distinct(col("_grams"))))
      .drop("_ws", "_grams")
    val nWords = col("_nw")
    val meanLen = (length(col(textCol)).cast("double") - (nWords - 1)) / nWords
    // same zero-denominator guards as qualityMetrics: texts too short
    // for a 3-gram (or empty) score 0, they don't throw under ANSI
    val repRatio = when(col("_ng") > 0,
      lit(1.0) - col("_nd").cast("double") /
        col("_ng").cast("double")).otherwise(lit(0.0))
    val alphaRatio = when(length(col(textCol)) > 0,
      length(regexp_replace(col(textCol), "[^a-zA-Z]", "")).cast("double") /
        length(col(textCol)).cast("double"))
      .when(length(col(textCol)) === 0, lit(0.0))
    val rules = Seq(
      "r_word_count" -> (nWords >= 50 && nWords <= 100000),
      "r_mean_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "r_stopwords" -> (col("_marks") >= 2),
      "r_repetition" -> (repRatio <= 0.5),
      "r_alpha" -> (alphaRatio >= 0.7))
    val withRules = rules.foldLeft(staged) { case (acc, (name, cond)) =>
      acc.withColumn(name, cond.cast("long"))
    }
    withRules
      .withColumn("rule_mask", rules.zipWithIndex.map { case ((n, _), i) =>
        col(n) * lit(1L << i) }.reduce(_ + _))
      .withColumn("keep", rules.map { case (n, _) => col(n) === 1L }
        .reduce(_ && _).cast("long"))
      .drop("_nw", "_marks", "_ng", "_nd")
  }

  /** Greedy sequence packing for training-batch assembly: within each
    * group (a shard key — language here), documents are laid out in a
    * deterministic order and cut into bins of ~`budget` tokens by the
    * running prefix sum (a document starts a new bin when its START
    * offset crosses a budget boundary; bins absorb the overflow of their
    * last doc — the standard contiguous-fill packing). One window shuffle
    * per shard key; at 100 TB the group key keeps window state per-shard,
    * never global.
    */
  def sequencePacking(df: DataFrame, textCol: String, idCol: String,
                      groupCol: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = tokenCount(col(textCol))
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol).as("grp"), col(idCol).as("id"), tokens.as("tokens"))
      .withColumn("bin", floor((sum(col("tokens")).over(w) - col("tokens")) / budget))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"),
           min(col("id")).as("first_id"), max(col("id")).as("last_id"))
  }

  /** Deterministic stratified rebalancing: downsample every stratum to
    * the size of the smallest one via portable-hash acceptance, so the
    * sample is a pure function of ids — stable across runs, engines, and
    * re-sharding (no rand()). Strata counts are one small aggregate that
    * broadcasts back; the corpus itself is filtered in place with no
    * extra shuffle.
    */
  def stratifiedRebalance(df: DataFrame, idCol: String,
                          stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_total"))
    val target = counts.agg(min(col("n_total")).as("target"))
    val h = pmod(graft.functions.PortableHash.md5_64(col(idCol).cast("string")),
      lit(1000000L))
    df.join(broadcast(counts), stratumCol)
      .crossJoin(broadcast(target))
      .withColumn("kept",
        (h < floor(col("target") * lit(1000000L) / col("n_total"))).cast("long"))
      .groupBy(col(stratumCol))
      .agg(max(col("n_total")).as("n_total"), sum(col("kept")).as("n_kept"))
  }

  /** Weighted sampling without replacement via priority sampling
    * (Duffield–Lund–Thorup): each row gets priority w/u with u a
    * deterministic uniform in (0,1] derived from the portable id hash,
    * and the k highest priorities per stratum win. Pure division — no
    * ln/pow, so the oracle replays it bit-for-bit — and no rand(): the
    * sample is a stable function of ids. Selection runs through the
    * bounded-heap top-k operator: the shuffle carries at most k rows per
    * stratum per map partition, never the corpus.
    */
  def prioritySample(df: DataFrame, idCol: String, stratumCol: String,
                     weightCol: String, k: Int): DataFrame = {
    val u = (pmod(graft.functions.PortableHash.md5_64(col(idCol).cast("string")),
      lit(1000000L)) + lit(1L)).cast("double") / lit(1000001.0)
    val scored = df.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
      col(weightCol).cast("double").as("w"),
      (col(weightCol).cast("double") / u).as("priority"))
    graft.plans.TopKPerGroup.perGroup(scored, Seq("stratum"),
        Seq("priority" -> true, "id" -> false), k)
      .select(col("stratum"), col("id"), col("w"),
        round(col("priority"), 4).as("priority"), col("rank"))
  }

  /** Order-sensitive 60-bit document fingerprint: portable MD5-derived
    * hash of the whitespace-normalized text (exact-content identity,
    * cheap at any scale, replicable by the DuckDB oracle).
    */
  def contentFingerprint(textCol: Column): Column =
    graft.functions.PortableHash.md5_64(trim(regexp_replace(textCol, "\\s+", " ")))

  /** Winnowing-style robust fingerprint: minimum shingle hash — stable
    * under small appends/truncations (MinHash with k=1). Exposed as two
    * scalar columns (min, max) so downstream comparisons stay sortable.
    */
  def robustFingerprintMin(textCol: Column, shingleN: Int = 3): Column =
    array_min(transform(Dedup.shingles(textCol, shingleN),
      s => graft.functions.PortableHash.md5_64(s)))

  def robustFingerprintMax(textCol: Column, shingleN: Int = 3): Column =
    array_max(transform(Dedup.shingles(textCol, shingleN),
      s => graft.functions.PortableHash.md5_64(s)))

  /** Linear-classifier quality scoring — the model-based filtering step
    * (fastText/CCNet-style "does this look like reference text?") as a
    * single zero-shuffle pass: hashed bag-of-words features
    * (PortableHash mod `buckets`), a deterministic integer weight per
    * bucket (the stand-in for trained weights, same contract as the
    * multimodal decode stub — the PLUMBING is real: literal weight
    * family, codegen'd fold, sigmoid), scored as
    * sigmoid(4·Σw / (97·n_tokens)).
    *
    * The fold accumulates INTEGERS (weights in [-48, 48]), so engines
    * agree exactly regardless of their float-summation order; the only
    * float ops are one division and one exp on an exactly-agreed
    * rational. Scale design: per-row column math fused into the scan —
    * no shuffle, no model state beyond plan literals.
    */
  def classifierScore(textCol: Column, buckets: Int = 64): Column = {
    val ws = split(textCol, " ")
    val wInt = (t: Column) =>
      (graft.functions.PortableHash.md5_64(t) % buckets) * 2654435761L % 97L - 48L
    val isum = aggregate(transform(ws, wInt), lit(0L), (a, x) => a + x)
    round(lit(1.0) / (lit(1.0) +
      exp(lit(-4.0) * isum.cast("double") /
          (lit(97.0) * greatest(size(ws), lit(1)).cast("double")))), 6)
  }

  /** DuckDB SQL computing exactly [[classifierScore]] over `text`. */
  def classifierScoreSql(buckets: Int = 64): String = {
    val h = graft.functions.PortableHash.sqlMd5_64("t")
    s"""round(1.0 / (1.0 + exp(-4.0 *
        CAST(list_sum(list_transform(string_split(text, ' '),
          t -> ($h % $buckets) * 2654435761 % 97 - 48)) AS DOUBLE) /
        (97.0 * greatest(len(string_split(text, ' ')), 1)))), 6)"""
  }

  /** Temperature-scaled source mixture resampling — the "data mixing"
    * step of LLM corpus assembly: target share of source g ∝ n_g^τ
    * (τ < 1 upweights small sources, the multilingual-rebalancing
    * standard), scaled so the expected sample totals `targetFraction` of
    * the corpus. Acceptance is a pure function of the document id
    * ([[graft.functions.PortableHash]] ratio < per-source rate) — stable
    * across runs, engines, and re-sharding; no rand().
    *
    * Scale design: per-source counts are one tiny aggregate; the rate
    * table (sources × 3 doubles) joins back via broadcast; the corpus is
    * filtered in place — zero data-dependent shuffle beyond the count.
    * Returns (source, n_total, rate, n_sampled).
    */
  def mixtureResample(df: DataFrame, idCol: String, groupCol: String,
                      temperature: Double, targetFraction: Double): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_total"))
    val totals = counts.agg(sum(pow(col("n_total"), temperature)).as("z"),
                            sum(col("n_total")).as("corpus_n"))
    // acceptance compares against the ROUNDED rate (also the emitted
    // value), so a last-ulp pow/sum drift between engines cannot flip a
    // boundary document
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("rate", round(
        least(lit(1.0), col("corpus_n") * targetFraction *
          (pow(col("n_total"), temperature) / col("z")) / col("n_total")), 6))
      .select(col("grp"), col("n_total"), col("rate"))
    val hashRatio =
      (graft.functions.PortableHash.md5_64(col(idCol).cast("string")) % 1000000L)
        .cast("double") / 1000000.0
    df.select(col(groupCol).as("grp"), col(idCol))
      .join(broadcast(rates), Seq("grp"))
      .groupBy(col("grp").as("source_grp"), col("n_total"), col("rate"))
      .agg(sum(when(hashRatio < col("rate"), 1L).otherwise(0L)).as("n_sampled"))
      .select(col("source_grp"), col("n_total"), col("rate"), col("n_sampled"))
  }

  /** Staged min+max robust fingerprint: the hashed shingle array is
    * materialized ONCE and both extrema read it — the Column forms above,
    * used together, would tokenize/shingle/hash the text twice.
    */
  def withRobustFingerprints(df: DataFrame, textCol: String,
                             shingleN: Int = 3): DataFrame =
    df.withColumn("_ws", split(col(textCol), " "))
      .withColumn("_h", transform(
        array_distinct(Dedup.ngramsOfWords(col("_ws"), shingleN)),
        s => graft.functions.PortableHash.md5_64(s)))
      .withColumn("fp_min", array_min(col("_h")))
      .withColumn("fp_max", array_max(col("_h")))
      .drop("_ws", "_h")

  /** In-engine logistic-regression trainer for the hashed bag-of-words
    * quality/domain classifier — the trainer behind the literal-weight
    * scorer shape of [[classifierScore]] (fastText/CCNet-style model-
    * based filtering trains exactly this: hashed unigram features ×
    * logistic loss). Full-batch gradient descent: the per-doc feature
    * vector (L1-normalized bucket counts) is built ONCE and cached;
    * each iteration is ONE aggregate over it computing the whole
    * (buckets+1)-dim gradient plus loss/accuracy, with the current
    * weights riding the plan as literals — the k-means trainer's shape
    * (s10), applied to supervised training. No shuffle at any point:
    * gradient partials map-side-combine into buckets+3 doubles per
    * partition.
    *
    * Deterministic: features are pure hash functions, init is zeros,
    * and the driver loop is data-independent — a retrain on the SAME
    * partitioning is bit-identical (spec-asserted, like s10). The
    * r17 unsplittable-input spread hash-shuffles the feature build
    * before the double-precision gradient avgs, so across DIFFERENT
    * partitionings / cluster fetch orders the float sums are
    * order-dependent and only rounded-6dp-stable, not bit-stable
    * (r17 advice) — the exact-replay contract lives in the
    * fixed-point twin ([[trainClassifierFixedPoint]], t36), whose
    * Long sums are order-free under any shuffle.
    *
    * Returns (trained weights incl. bias, per-iteration history
    * (iter, loss, accuracy) as a DataFrame).
    */
  def trainClassifier(df: DataFrame, textCol: String, labelCol: Column,
                      buckets: Int = 64, iters: Int = 8,
                      lr: Double = 2.0): (Array[Double], DataFrame) = {
    val spark = df.sparkSession
    val ws = split(col(textCol), " ")
    // single-loop histogram kernel: the declarative 64×(filter+size)
    // formulation re-scanned the id array per bucket (19.5 s of the
    // 21.6 s gate at sf0.1); BucketHistogram is bit-identical per row
    // spread an unsplittable input (r17, guide §2.5): the histogram
    // kernel AND every iteration's 65-column gradient aggregate read
    // the checkpointed blocks — a one-task scan would leave all of it
    // serial; no-op when the scan already carries ≥ cores splits
    val feats = Dedup.spreadIfNarrow(df, col(textCol)).select(
        labelCol.cast("double").as("y"),
        graft.functions.BucketHistogram.of(
          transform(ws, w => pmod(graft.functions.PortableHash.md5_64(w),
            lit(buckets.toLong))), buckets).as("x"))
      .localCheckpoint() // one feature-build scan; iterations re-read it
    val w = Array.fill(buckets + 1)(0.0)
    val history = Seq.newBuilder[(Long, Double, Double)]
    for (it <- 1 to iters) {
      val wDot = (0 until buckets).foldLeft(lit(w(buckets))) { (acc, j) =>
        acc + lit(w(j)) * element_at(col("x"), j + 1)
      }
      val scored = feats.withColumn("p", lit(1.0) / (lit(1.0) + exp(-wDot)))
      val gradCols = (0 until buckets).map(j =>
        avg((col("p") - col("y")) * element_at(col("x"), j + 1)).as(s"g$j"))
      val extras = Seq(
        avg(col("p") - col("y")).as("gb"),
        avg(-(col("y") * log(col("p")) +
          (lit(1.0) - col("y")) * log(lit(1.0) - col("p")))).as("loss"),
        avg(((col("p") > 0.5) === (col("y") > 0.5)).cast("double")).as("acc"))
      val r = scored.agg((gradCols ++ extras).head, (gradCols ++ extras).tail: _*)
        .collect()(0)
      for (j <- 0 until buckets) w(j) -= lr * r.getDouble(j)
      w(buckets) -= lr * r.getDouble(buckets)
      history += ((it.toLong, r.getDouble(buckets + 1), r.getDouble(buckets + 2)))
    }
    import spark.implicits._
    val hist = history.result()
      .toDF("iter", "loss", "accuracy")
      .select(col("iter"), round(col("loss"), 6).as("loss"),
              round(col("accuracy"), 6).as("accuracy"))
    (w, hist)
  }

  /** Integer fixed-point classifier trainer — [[trainClassifier]]'s
    * question with a hash-oracle-able answer (gate t36), extending the
    * s19 training-oracle style to the text family. The float GD's
    * un-replayable pieces are replaced by exact integer twins:
    *
    *  - features = RAW hashed-bucket token counts, kept SPARSE as
    *    (doc, bucket, cnt) rows (the count explode is one shuffle; per
    *    iteration one doc-keyed margin aggregate + one 65-key gradient
    *    aggregate, both map-side combined — t27's movement with the
    *    dense histogram swapped for its sparse twin);
    *  - the logistic sigmoid is replaced by the HARD sigmoid
    *    p = clamp(½ + m/4, 0, 1) in probability micro-units
    *    (p_units = clamp(500000 + ⌊m_units/4⌋, 0, 1e6)) — piecewise
    *    linear, so every probability, error, and gradient is an exact
    *    integer; the one rounding per (iter, doc) and per (iter,
    *    bucket) is the established floor-of-double-division, identical
    *    on both engines;
    *  - updates: w_j ← w_j − ⌊Σ_docs (p − y·1e6)·x_j / (lrDen·n)⌋,
    *    zero init. Every intermediate stays far below 2^53.
    *
    * Bit-deterministic across partitionings (exact Long sums) and the
    * oracle RE-TRAINS from scratch as `iters` unrolled CTE stages.
    * History reports integer (err_units, correct) instead of the float
    * log-loss — the hard-sigmoid objective's honest metrics. The float
    * trainer (t27) remains the production logistic path; this is its
    * verification twin the way s19 twins s10.
    */
  def trainClassifierFixedPoint(df: DataFrame, idCol: String,
                                textCol: String, labelCol: Column,
                                buckets: Int = 64, iters: Int = 3,
                                lrDen: Long = 2L)
      : (Array[Long], DataFrame) = {
    val spark = df.sparkSession
    val P = 1000000L
    val xb = Dedup.spreadIfNarrow(df, col(idCol))
      .select(col(idCol).as("id"), labelCol.cast("long").as("y"),
        explode(transform(split(col(textCol), " "),
          w => pmod(graft.functions.PortableHash.md5_64(w),
            lit(buckets.toLong)))).as("j"))
      .groupBy(col("id"), col("y"), col("j"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // one feature scan; iterations re-read it
    val n = df.count()
    if (n == 0L) {
      // empty corpus: zero weights, no iterations — the
      // kmeansTrainFixedPoint empty-corpus convention (training on
      // nothing is a no-op, not an NPE in the scored aggregate)
      import spark.implicits._
      return (Array.fill(buckets + 1)(0L),
        Seq.empty[(Long, Long, Long)].toDF("iter", "err_units", "correct"))
    }
    // the 2^53 exactness guard (the fixed-point-trainer convention):
    // gradient sums are bounded by P·totalTokens, and each iteration's
    // margins by max|w|·maxDocTokens — both must stay exact integers
    val stats = xb.groupBy(col("id")).agg(sum(col("cnt")).as("dt"))
      .agg(sum(col("dt")), max(col("dt"))).head()
    val (totalTokens, maxDocTokens) =
      if (stats.isNullAt(0)) (0L, 0L) else (stats.getLong(0), stats.getLong(1))
    require(totalTokens.toDouble * P < math.pow(2, 53),
      s"fixed-point classifier: $totalTokens tokens overflow the " +
        "2^53-exact gradient sums at micro-unit scale; cap the " +
        "training sample")
    val w = Array.fill(buckets + 1)(0L)
    val history = Seq.newBuilder[(Long, Long, Long)]
    for (it <- 1 to iters) {
      val maxW = w.map(math.abs).max
      // the margin is msum + bias, so the bound is maxW·(maxDocTokens+1):
      // the bias term is itself ≤ maxW and must sit inside the 2^53 window
      require(maxW.toDouble * (maxDocTokens + 1) < math.pow(2, 53),
        s"fixed-point classifier: iteration $it weights (max |w| $maxW) " +
          s"× $maxDocTokens tokens/doc (+ bias) would overflow the " +
          "2^53-exact margins; lower the learning rate or iteration count")
      val wLit = typedLit(w.take(buckets).toSeq)
      val scored = xb.groupBy(col("id"), col("y"))
        .agg(sum(element_at(wLit, col("j").cast("int") + 1) * col("cnt"))
          .as("msum"))
        .withColumn("p", least(lit(P), greatest(lit(0L),
          lit(P / 2) + floor((col("msum") + lit(w(buckets)))
            .cast("double") / 4.0).cast("long"))))
        .withColumn("e", col("p") - col("y") * lit(P))
        .localCheckpoint() // pin this iteration's probabilities
      val gj = scored.select(col("id"), col("e"))
        .join(xb.select(col("id"), col("j"), col("cnt")), Seq("id"))
        .groupBy(col("j"))
        .agg(sum(col("e") * col("cnt")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ex = scored.agg(
        sum(col("e")).as("gb"),
        sum(abs(col("e"))).as("err"),
        sum(when((col("p") > lit(P / 2)) === (col("y") === 1L), 1L)
          .otherwise(0L)).as("correct")).collect()(0)
      for (j <- 0 until buckets)
        w(j) -= math.floor(
          gj.getOrElse(j.toLong, 0L).toDouble / (lrDen * n)).toLong
      w(buckets) -= math.floor(ex.getLong(0).toDouble / (lrDen * n)).toLong
      history += ((it.toLong, ex.getLong(1), ex.getLong(2)))
    }
    import spark.implicits._
    (w, history.result().toDF("iter", "err_units", "correct"))
  }

  /** Token-budget mixture: per-source TOKEN budgets (not doc counts —
    * the unit a training run actually consumes) from a temperature-
    * scaled share of the corpus token mass (data-mixing shape:
    * budget_s ∝ T_s^τ · B), filled deterministically in hash-priority
    * order — a document is admitted while the tokens admitted before it
    * (same source, lower priority) leave room in its source's budget.
    * Priority is a pure hash of the id: no rand(), re-shardable, and a
    * re-run admits the identical set.
    *
    * Scale: source token masses are one tiny aggregate; budgets
    * broadcast back. Admission is ONE window (token prefix-sum ordered
    * by priority) per source — per-source sort, never global. At
    * 100 TB use [[tokenBudgetMixThreshold]]: the same admit semantics
    * via a priority-cutoff probe, so the sort touches only a
    * budget-sized slice per source. The share is rounded to
    * 6 dp before floor (as t20's rate) so a last-ulp pow/sum drift
    * between engines cannot flip a budget's integer boundary.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, groupCol: String,
                     textCol: String, temperature: Double,
                     budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
                         tokenCount(col(textCol)).as("n_tokens"))
    val masses = toks.groupBy(col("grp")).agg(sum(col("n_tokens")).as("grp_tokens"))
    val z = masses.agg(sum(pow(col("grp_tokens"), temperature)).as("z"))
    val budgets = masses.crossJoin(broadcast(z))
      .withColumn("budget_tokens",
        floor(round(lit(budgetTokens.toDouble) *
          pow(col("grp_tokens"), temperature) / col("z"), 6)).cast("long"))
      .select(col("grp"), col("budget_tokens"))
    val w = Window.partitionBy(col("grp")).orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("pri",
        graft.functions.PortableHash.md5_64(col("doc_id").cast("string")))
      .join(broadcast(budgets), Seq("grp"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < col("budget_tokens"))
      .select(col("doc_id"), col("grp").as("source"), col("n_tokens"),
              col("cum_before"), col("budget_tokens"))
  }

  /** The 100 TB execution of [[tokenBudgetMix]]: a two-pass
    * priority-threshold probe with IDENTICAL admit-while-below
    * semantics (spec-asserted equal on the same inputs).
    *
    * The window path sorts every source's full doc list; here the
    * per-source sort runs only over a budget-sized SLICE. Because the
    * priority is a uniform 64-bit hash, the cutoff needs no data pass:
    * the p-quantile of `pri` is analytically `Long.Min + p·2^64` with
    * `p = safety · budget / source_tokens`. Pass 1 verifies each
    * source's slice carries at least min(budget, source_tokens) tokens
    * (a tiny per-source aggregate), doubling the cutoff for any source
    * that fell short — token counts are independent of the admission
    * hash, so one probe almost surely suffices and the loop is bounded
    * (8 rounds = safety·2^8; if a source is STILL short after that, its
    * cutoff drops to the full slice, so admit-set equality with the
    * window path is unconditional, never merely probable).
    * Pass 2 runs the SAME (pri, doc_id) prefix-sum window on the slice;
    * a slice is prefix-closed in that order, so every admitted doc's
    * `cum_before` is identical to the full-window value.
    */
  def tokenBudgetMixThreshold(df: DataFrame, idCol: String, groupCol: String,
                              textCol: String, temperature: Double,
                              budgetTokens: Long,
                              safety: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(groupCol).cast("string").as("grp"),
                         col(idCol).as("doc_id"),
                         tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("pri",
        graft.functions.PortableHash.md5_64(col("doc_id").cast("string")))
    val masses = toks.groupBy(col("grp")).agg(sum(col("n_tokens")).as("grp_tokens"))
    val z = masses.agg(sum(pow(col("grp_tokens"), temperature)).as("z"))
    val budgets = masses.crossJoin(broadcast(z))
      .withColumn("budget_tokens",
        floor(round(lit(budgetTokens.toDouble) *
          pow(col("grp_tokens"), temperature) / col("z"), 6)).cast("long"))
      .select(col("grp"), col("grp_tokens"), col("budget_tokens"))
    // O(#sources) driver state — the same size as the broadcast the
    // window path already ships
    val state = budgets.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    var margin = state.map { case (g, _, _) => g -> safety }.toMap
    def buildSlice(): DataFrame = {
      val cuts = state.map { case (g, gt, b) =>
        val p = if (gt == 0L) 1.0
                else math.min(1.0, margin(g) * b.toDouble / gt)
        val cut = if (p >= 1.0) Long.MaxValue
                  else (Long.MinValue + p * math.pow(2.0, 64)).toLong
        (g, cut)
      }.toSeq.toDF("grp", "cut")
      toks.join(broadcast(cuts), Seq("grp"))
        .filter(col("pri") <= col("cut")).drop("cut")
    }
    var slice: DataFrame = null
    var shortNow: Seq[String] = Nil
    var settled = false
    var rounds = 0
    while (!settled && rounds < 8) {
      rounds += 1
      slice = buildSlice()
      val sliceMass = slice.groupBy(col("grp"))
        .agg(sum(col("n_tokens")).as("m")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      shortNow = state.collect { case (g, gt, b)
        if sliceMass.getOrElse(g, 0L) < math.min(b, gt) => g }.toSeq
      if (shortNow.isEmpty) settled = true
      else margin = margin ++ shortNow.map(g => g -> margin(g) * 2.0)
    }
    if (!settled) {
      // Escalation exhausted with still-short sources (pathologically
      // heavy-tailed token masses vs the safety factor): fall back to
      // the FULL slice (cut = Long.MaxValue) for exactly those sources,
      // so the admit set stays guaranteed-equal to the window path
      // instead of silently under-admitting.
      margin = margin ++ shortNow.map(g => g -> Double.MaxValue)
      slice = buildSlice()
    }
    val w = Window.partitionBy(col("grp")).orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    slice
      .join(broadcast(budgets.select(col("grp"), col("budget_tokens"))), Seq("grp"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < col("budget_tokens"))
      .select(col("doc_id"), col("grp").as("source"), col("n_tokens"),
              col("cum_before"), col("budget_tokens"))
  }

  /** Deterministic epoch shuffle — the training-time "global shuffle":
    * each epoch permutes the corpus into `nShards` shards with a stable
    * within-shard order, as a PURE FUNCTION of (epoch, id). No rand():
    * the permutation is reproducible across runs, engines, and partial
    * re-execution (a lost shard re-derives bit-identically), and epoch
    * e+1's order is uncorrelated with epoch e's because the epoch number
    * is folded into the hash.
    *
    * Scale: `shard = h mod nShards` is the one shuffle key; the
    * within-shard rank is a per-shard window, so each reducer sorts only
    * corpus/nShards rows — exactly the shuffle-writer's per-partition
    * sort, never a global one. At 100 TB, nShards scales with the corpus
    * (shard ≈ training-file size) and per-reducer state stays bounded.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("id"))
    df.select(col(idCol).as("id"))
      .withColumn("h", graft.functions.PortableHash.md5_64(
        concat(lit(s"$epoch:"), col("id").cast("string"))))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("id"), col("shard"), col("pos"))
  }

  /** DSIR-style hashed-n-gram importance scoring (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * token unigrams are hashed into `buckets` feature buckets; a TARGET
    * subset (e.g. the high-quality or in-domain slice) and the full
    * corpus each induce a smoothed bucket distribution, and every
    * document is scored by its summed per-token log importance ratio
    * log p_target(b) − log p_corpus(b). Documents with `logw > 0` look
    * more target-like than corpus-like — the resampling weight of the
    * paper, exposed as a quality signal.
    *
    * Scale: the bucket table is ONE explode+agg pass producing
    * 2·`buckets` numbers — a bounded driver structure like the k-means
    * codebooks — which returns to the plan as a literal array, so the
    * scoring pass is a zero-shuffle scan with a per-row sequential fold
    * (deterministic order → the DuckDB oracle replays it exactly; the
    * per-bucket log ratios are rounded to 6 dp in BOTH engines so every
    * per-token term is byte-identical).
    */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
                targetPred: Column, buckets: Int = 64): DataFrame = {
    val PH = graft.functions.PortableHash
    val B = buckets.toLong
    val counts = df
      .select(targetPred.cast("long").as("tgt"),
              explode(filter(split(col(textCol), " "),
                             w => length(w) > 0)).as("w"))
      .select(pmod(PH.md5_64(col("w")), lit(B)).as("b"), col("tgt"))
      .groupBy(col("b"))
      .agg(sum(col("tgt")).as("ct"), count(lit(1)).as("ca"))
      .collect().map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val nt = counts.valuesIterator.map(_._1).sum
    val na = counts.valuesIterator.map(_._2).sum
    // per-bucket log-ratios as INTEGER micro-units (6dp × 1e6): the
    // per-doc sum is then exact Long arithmetic — associative, so
    // engine summation order can't split a rounding tie (the r12
    // sf0.001 sweep caught exactly that: a float fold landing on a
    // .xxxx5 boundary rounded differently across engines). logw =
    // sumMicro / 1e6 is the same IEEE double on both engines, bit-exact.
    val ratiosMicro = Array.tabulate(buckets) { b =>
      val (ct, ca) = counts.getOrElse(b, (0L, 0L))
      BigDecimal(math.log((ct + 1.0) / (nt + buckets)) -
                 math.log((ca + 1.0) / (na + buckets)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .underlying.movePointRight(6).longValueExact
    }
    val rlit = array(ratiosMicro.map(lit).toIndexedSeq: _*)
    df.select(col(idCol).as("doc_id"),
              filter(split(col(textCol), " "), w => length(w) > 0).as("_toks"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("_sum_micro", aggregate(col("_toks"), lit(0L),
        (acc, w) => acc + element_at(rlit,
          (pmod(PH.md5_64(w), lit(B)) + 1).cast("int"))))
      .withColumn("logw", col("_sum_micro").cast("double") / lit(1000000.0))
      .withColumn("target_like", col("_sum_micro") > 0)
      .select(col("doc_id"), col("n_tokens"), col("logw"), col("target_like"))
  }

  /** Length-bucketed batch assignment — the dynamic-batching prep step a
    * training run wants so a 4000-token doc never pads a batch of
    * 40-token docs: quartile buckets from ONE exact-percentile aggregate
    * (broadcast back as plan literals; swap `approx_percentile` in at
    * 100 TB, same shape as q36→q36b), then deterministic batch ids from
    * a portable-hash order. The ranking window partitions by
    * (bucket × shard) — `nShards` hash shards bound every window group
    * to corpus/(4·nShards) rows, so no single sorted partition exists at
    * any corpus size (same salting idea as t24's epoch shuffle) and batch
    * identity (bucket, shard, batch_in_shard) is stable across reruns.
    */
  def lengthBucketedBatches(df: DataFrame, textCol: String, idCol: String,
                            nShards: Int, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withN = df.select(col(idCol).as("id"),
      tokenCount(col(textCol)).as("n_tokens"))
    val bounds = withN.agg(
      round(expr("percentile(n_tokens, 0.25D)"), 6).as("b1"),
      round(expr("percentile(n_tokens, 0.5D)"), 6).as("b2"),
      round(expr("percentile(n_tokens, 0.75D)"), 6).as("b3"))
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("_h").asc, col("id").asc)
    withN.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("n_tokens") <= col("b1"), lit(0))
          .when(col("n_tokens") <= col("b2"), lit(1))
          .when(col("n_tokens") <= col("b3"), lit(2)).otherwise(lit(3)))
      .withColumn("_h", graft.functions.PortableHash.md5_64(
        concat(lit("batch:"), col("id").cast("string"))))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("rk", row_number().over(w))
      .select(col("id").as(idCol), col("n_tokens"), col("bucket"), col("shard"),
        floor((col("rk") - 1) / batchSize).cast("long").as("batch_in_shard"),
        pmod(col("rk") - 1, lit(batchSize)).cast("long").as("pos_in_batch"))
  }

  /** Sliding-window token chunking with overlap — the RAG / context-
    * window prep step: a `windowTokens`-token window advancing by
    * `strideTokens` (stride < window ⇒ overlapping chunks, so no retrieval
    * span straddles a hard cut). Start offsets are 0, S, 2S, …,
    * ceil((n−W)/S)·S — every token lands in ≥1 chunk and the final chunk
    * may run short. One posexplode per document (~n/S rows out per
    * n-token doc) and ZERO shuffle: chunk identity is (doc id, chunk
    * index) plus a portable content hash, never a global counter, so
    * chunking 100 TB is a single embarrassingly-parallel scan.
    */
  def slidingChunks(df: DataFrame, textCol: String, idCol: String,
                    windowTokens: Int, strideTokens: Int): DataFrame = {
    require(strideTokens >= 1 && windowTokens >= strideTokens,
      "need 1 <= strideTokens <= windowTokens (full coverage)")
    val (w, s) = (windowTokens, strideTokens)
    val nStarts = when(col("_n") <= w, lit(1L)).otherwise(
      ceil((col("_n") - w).cast("double") / s).cast("long") + 1L)
    df.withColumn("_ws", filter(split(col(textCol), " "), t => length(t) > 0))
      .withColumn("_n", size(col("_ws")))
      .select(col(idCol), posexplode(transform(sequence(lit(0L), nStarts - 1),
        i => slice(col("_ws"), (i * s + 1).cast("int"), lit(w)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        (col("pos") * s).cast("long").as("start_tok"),
        size(col("col")).cast("long").as("n_tok"),
        graft.functions.PortableHash.md5_64(concat_ws(" ", col("col")))
          .as("chunk_hash"))
  }

  /** BPE merge-rule training (Sennrich et al. 2016) run in-engine: k
    * iterations of (adjacent-symbol-pair count aggregate → argmax merge →
    * apply merge to the dictionary). Training operates on the
    * word-FREQUENCY dictionary, exactly like the reference algorithm —
    * ONE corpus scan builds it, and every iteration thereafter touches
    * only |vocab| rows, so training cost is independent of corpus row
    * count (the s10/t27 trainer shape: the model rides the driver, the
    * data stays put). Each argmax is a 1-row collect (a plan literal
    * thereafter); ties break by (count desc, pair asc), so retraining is
    * bit-identical.
    *
    * Merge application is one left-to-right non-overlapping `replace`
    * pass per rank (both Spark's and DuckDB's string-replace semantics,
    * so the oracle replays it exactly). Immediately consecutive
    * occurrences of a pair ("aaa" under merge "a a") merge again only at
    * a later rank that selects them — the one deviation from textbook
    * BPE, mirrored in the oracle and harmless for vocabulary induction.
    *
    * Symbols are space-delimited within a word rep of shape " c h a r s "
    * (boundary-padded so a replace of " a b " can only match whole
    * symbols, never the inside of a longer symbol).
    */
  def trainBpeMerges(docs: DataFrame, textCol: String, k: Int): Seq[(String, String)] = {
    var dict = docs
      .select(explode(filter(split(col(textCol), " "),
                             w => length(w) > 0)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
        regexp_replace(col("word"), "(?s)(.)", "$1 ")).as("sym"), col("freq"))
      .localCheckpoint() // truncate lineage: each iteration appends a replace
    val merges = Seq.newBuilder[(String, String)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val top = dict
        .select(split(trim(col("sym")), " ").as("ws"), col("freq"))
        .filter(size(col("ws")) >= 2) // fully-merged words yield no pairs
        .select(explode(Dedup.ngramsOfWords(col("ws"), 2)).as("pr"), col("freq"))
        .groupBy(col("pr")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pr").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pr = top(0).getString(0)
        val mg = pr.replace(" ", "")
        merges += ((pr, mg))
        dict = dict.withColumn("sym",
          call_function("replace", col("sym"), lit(s" $pr "), lit(s" $mg ")))
          .localCheckpoint()
      }
    }
    merges.result()
  }

  /** Apply trained BPE merges to a text column, returning the token
    * array. The whole document is char-spaced once (original spaces
    * become the '¤' boundary symbol, which no merge can contain — merges
    * are trained on words alone), then each rank is one literal `replace`
    * fused into the same codegen'd projection: k string passes per row,
    * ZERO shuffle at any corpus size.
    */
  def applyBpeTokens(textCol: Column, merges: Seq[(String, String)]): Column = {
    val rep0 = concat(lit(" "), regexp_replace(
      call_function("replace", textCol, lit(" "), lit("¤")), "(?s)(.)", "$1 "))
    val rep = merges.foldLeft(rep0) { case (r, (pr, mg)) =>
      call_function("replace", r, lit(s" $pr "), lit(s" $mg "))
    }
    filter(split(trim(rep), " "), t => t =!= lit("¤") && length(t) > 0)
  }
}
