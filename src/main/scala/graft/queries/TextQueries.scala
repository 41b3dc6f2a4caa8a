package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents` (SURVEY §2c): language ID,
  * quality scoring, token counting, fingerprinting.
  */
object TextQueries {

  // the marker lists must stay in sync with TextAnalysis.markers
  private def inList(lang: String): String =
    TextAnalysis.markers(lang).map(w => s"'$w'").mkString("(", ",", ")")

  // the four marker sets are disjoint, so the any-language marker count
  // (sum of per-language counts) equals one membership test on the union
  private def inAllMarkers: String =
    Seq("en", "es", "de", "fr").flatMap(TextAnalysis.markers)
      .map(w => s"'$w'").mkString("(", ",", ")")

  def defs: Map[String, QueryDef] = Map(

    "t01_lang_id" -> QueryDef(
      (s, d) => TextAnalysis.withLangId(Tables.documents(s, d), "text", "lang_pred")
        .select(col("doc_id"), col("lang").as("lang_declared"), col("lang_pred")),
      Some(s"""
        WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
        sc AS (SELECT doc_id, lang,
                 len(list_filter(ws, w -> w IN ${inList("en")})) AS s_en,
                 len(list_filter(ws, w -> w IN ${inList("es")})) AS s_es,
                 len(list_filter(ws, w -> w IN ${inList("de")})) AS s_de,
                 len(list_filter(ws, w -> w IN ${inList("fr")})) AS s_fr
               FROM t)
        SELECT doc_id, lang AS lang_declared,
               CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                    ELSE 'fr' END AS lang_pred
        FROM sc""")),

    "t02_quality_score" -> QueryDef(
      (s, d) => TextAnalysis.qualityMetrics(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("n_words"), col("stop_ratio"),
                col("diversity"), col("alpha_ratio"), col("quality_score")),
      Some(s"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        m AS (SELECT doc_id,
                CAST(len(ws) AS DOUBLE) AS nw,
                CAST(len(list_filter(ws, w -> w IN ${inList("en")})) AS DOUBLE) AS stops,
                CAST(len(list_distinct(ws)) AS DOUBLE) AS uniq,
                CASE WHEN strlen(text) > 0 THEN
                       CAST(strlen(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                         / CAST(strlen(text) AS DOUBLE)
                     WHEN strlen(text) = 0 THEN 0.0 END AS alpha
              FROM t)
        SELECT doc_id,
               CAST(nw AS BIGINT) AS n_words,
               round(stops / nw, 6) AS stop_ratio,
               round(uniq / nw, 6) AS diversity,
               round(alpha, 6) AS alpha_ratio,
               round(least(nw / 100.0, 1.0) * 0.3 +
                     least(stops / nw * 5.0, 1.0) * 0.3 +
                     uniq / nw * 0.2 + alpha * 0.2, 6) AS quality_score
        FROM m""")),

    "t03_token_counts" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
                TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
                TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"),
                (length(col("text")).cast("double") /
                  TextAnalysis.bpeishTokenCount(col("text"))).as("chars_per_token")),
      Some("""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpeish_tokens,
               CAST(strlen(text) AS DOUBLE) /
                 len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS chars_per_token
        FROM documents""")),

    // end-to-end curation capstone: quality-score filter → language match
    // → exact-dedup keeper — the composed training-data cleaning pipeline
    "t06_curation_pipeline" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = TextAnalysis.withLangId(
          TextAnalysis.qualityMetrics(docs, "text"), "text", "lang_pred")
        val keepers = Dedup.exact(docs, "text", "doc_id")
          .select(col("keeper_id").as("doc_id"))
        scored
          .filter(col("quality_score") >= 0.5 && col("lang_pred") === col("lang"))
          .join(keepers, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("lang"), col("quality_score"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents),
        m AS (SELECT doc_id, lang, text,
                CAST(len(ws) AS DOUBLE) AS nw,
                CAST(len(list_filter(ws, w -> w IN ${inList("en")})) AS DOUBLE) AS stops,
                CAST(len(list_distinct(ws)) AS DOUBLE) AS uniq,
                CAST(strlen(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                  / CAST(strlen(text) AS DOUBLE) AS alpha,
                len(list_filter(ws, w -> w IN ${inList("en")})) AS s_en,
                len(list_filter(ws, w -> w IN ${inList("es")})) AS s_es,
                len(list_filter(ws, w -> w IN ${inList("de")})) AS s_de,
                len(list_filter(ws, w -> w IN ${inList("fr")})) AS s_fr
              FROM t),
        scored AS (SELECT doc_id, lang, text,
                round(least(nw / 100.0, 1.0) * 0.3 +
                      least(stops / nw * 5.0, 1.0) * 0.3 +
                      uniq / nw * 0.2 + alpha * 0.2, 6) AS quality_score,
                CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                     WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                     WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                     WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                     ELSE 'fr' END AS lang_pred
              FROM m),
        keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        SELECT doc_id, lang, quality_score
        FROM scored
        WHERE quality_score >= 0.5 AND lang_pred = lang
          AND doc_id IN (SELECT doc_id FROM keepers)""")),

    // Rabin–Karp rolling min-hash (one O(n) pass per doc, codegen'd
    // expression). The oracle re-derives each window hash from scratch
    // (O(n·k) — DuckDB has no rolling state), exercising the identical
    // base-257 / mod-2³¹−1 arithmetic; the corpus is ASCII, so ord() =
    // byte value. Spark's O(n) rolling pass must land on the same minima.
    "t05_rolling_fingerprint" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
                graft.functions.RollingMinHash(col("text"), 16).as("rolling_fp")),
      Some("""
        WITH b AS (SELECT doc_id,
                     [CAST(ord(text[i]) AS BIGINT) for i in range(1, strlen(text)+1)] AS bs,
                     least(16, strlen(text)) AS w
                   FROM documents)
        SELECT doc_id,
               CASE WHEN len(bs) = 0 THEN 0 ELSE
                 list_min([list_reduce(bs[i:i+w-1],
                             (a, x) -> (a*257 + x) % 2147483647)
                           for i in range(1, len(bs)-w+2)]) END AS rolling_fp
        FROM b""")),

    // Benchmark decontamination: training docs sharing a 5-gram with the
    // (broadcast) eval subset. Eval membership = doc_id % 40 == 0 here;
    // in production the eval side is the benchmark suite.
    "t08_decontamination" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.contaminationPairs(
          docs.filter(col("doc_id") % 40 =!= 0),
          docs.filter(col("doc_id") % 40 === 0),
          "text", "doc_id", shingleN = 5)
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (SELECT doc_id, unnest(
                 CASE WHEN len(ws) >= 5
                      THEN list_distinct([array_to_string(ws[i:i+4], ' ')
                                          for i in range(1, len(ws) - 3)])
                      ELSE [array_to_string(ws, ' ')] END) AS s
               FROM d)
        SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_shared
        FROM sh tr JOIN sh ev ON tr.s = ev.s
        WHERE ev.doc_id % 40 = 0 AND tr.doc_id % 40 <> 0
        GROUP BY 1, 2""")),

    // Internal-repetition quality signal (1 - distinct/total 3-grams).
    "t09_repetition_ratio" -> QueryDef(
      (s, d) => TextAnalysis.repetitionMetrics(Tables.documents(s, d),
        "text", "doc_id", n = 3),
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        g AS (SELECT doc_id,
                CASE WHEN len(ws) >= 3
                     THEN [array_to_string(ws[i:i+2], ' ')
                           for i in range(1, len(ws) - 1)]
                     ELSE [array_to_string(ws, ' ')] END AS grams
              FROM d)
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
               round(1 - len(list_distinct(grams)) * 1.0 / len(grams), 6) AS rep_ratio
        FROM g""")),

    // Unigram-LM scoring (CCNet-style quality filter stand-in).
    "t12_unigram_logprob" -> QueryDef(
      (s, d) => TextAnalysis.unigramLogProb(Tables.documents(s, d),
        "text", "doc_id"),
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents),
        lm AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
        tot AS (SELECT count(*) AS t FROM tok)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(ln(n * 1.0 / t)), 6) AS avg_logprob
        FROM tok JOIN lm USING (term) CROSS JOIN tot
        GROUP BY doc_id""")),

    // Stupid Backoff bigram LM (Brants et al. 2007): count-ratio bigram
    // scoring with α-backoff to unigrams — the web-scale LM-quality
    // filter one step up from t12's unigram scorer. The LM trains on the
    // 90% split (doc_id % 10 <> 0) and scores ALL docs, so held-out docs
    // exercise the backoff on genuinely unseen bigrams. The oracle
    // replays counts, the seen/backoff CASE, and the unseen-word floor.
    "t31_bigram_backoff" -> QueryDef(
      (s, d) => TextAnalysis.bigramBackoffLogProb(
        Tables.documents(s, d), "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0),
      Some("""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        big AS (SELECT doc_id, ws[i-1] AS v, ws[i] AS w
                FROM ws, LATERAL (SELECT unnest(range(2, len(ws) + 1)) AS i) t
                WHERE len(ws) >= 2),
        tb AS (SELECT v, w, count(*) AS nb FROM big
               WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
        uni AS (SELECT term, count(*) AS nu FROM (
                  SELECT unnest(ws) AS term FROM ws WHERE doc_id % 10 <> 0)
                GROUP BY 1),
        tot AS (SELECT sum(nu) AS t FROM uni),
        scored AS (
          SELECT big.doc_id,
                 CASE WHEN tb.nb IS NOT NULL THEN ln(tb.nb * 1.0 / uv.nu)
                      ELSE ln(0.4 * coalesce(uw.nu, 1) * 1.0 / t) END AS lp
          FROM big LEFT JOIN tb ON big.v = tb.v AND big.w = tb.w
                   LEFT JOIN uni uv ON big.v = uv.term
                   LEFT JOIN uni uw ON big.w = uw.term
                   CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logprob
        FROM scored GROUP BY 1""")),

    // The 100 TB execution of t31: Brants-style frequency-cut (minCount=2)
    // composite-LM scoring — rare bigrams/words are dropped from the
    // broadcast score tables and their positions take the SAME backoff /
    // floor formulas the exact path applies to unseen n-grams. The oracle
    // replays the cut: count predicates (nb >= 2, nu >= 2) fold the
    // "rare = unseen" contract into t31's CASE. minCount=1 equality with
    // the exact path is spec-asserted (Round7OpsSpec).
    "t33_bigram_backoff_cut" -> QueryDef(
      (s, d) => TextAnalysis.bigramBackoffLogProbCut(
        Tables.documents(s, d), "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0, minCount = 2L),
      Some("""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        big AS (SELECT doc_id, ws[i-1] AS v, ws[i] AS w
                FROM ws, LATERAL (SELECT unnest(range(2, len(ws) + 1)) AS i) t
                WHERE len(ws) >= 2),
        tb AS (SELECT v, w, count(*) AS nb FROM big
               WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
        uni AS (SELECT term, count(*) AS nu FROM (
                  SELECT unnest(ws) AS term FROM ws WHERE doc_id % 10 <> 0)
                GROUP BY 1),
        tot AS (SELECT sum(nu) AS t FROM uni),
        scored AS (
          SELECT big.doc_id,
                 CASE WHEN tb.nb >= 2 THEN ln(tb.nb * 1.0 / uv.nu)
                      ELSE ln(0.4 * (CASE WHEN uw.nu >= 2 THEN uw.nu
                                          ELSE 1 END) * 1.0 / t) END AS lp
          FROM big LEFT JOIN tb ON big.v = tb.v AND big.w = tb.w
                   LEFT JOIN uni uv ON big.v = uv.term
                   LEFT JOIN uni uw ON big.w = uw.term
                   CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logprob
        FROM scored GROUP BY 1""")),

    // The trigram level of Stupid Backoff — the recursion (trigram →
    // α·bigram → α²·unigram floor) that makes it an n-gram method. Same
    // split discipline as t31; α is CAST AS DOUBLE in the oracle so both
    // engines compute the identical IEEE α² (the d13 decimal lesson).
    "t32_trigram_backoff" -> QueryDef(
      (s, d) => TextAnalysis.trigramBackoffLogProb(
        Tables.documents(s, d), "text", "doc_id",
        trainPred = col("doc_id") % 10 =!= 0),
      Some("""
        WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        tri AS (SELECT doc_id, ws[i-2] AS u, ws[i-1] AS v, ws[i] AS w
                FROM ws, LATERAL (SELECT unnest(range(3, len(ws) + 1)) AS i) t
                WHERE len(ws) >= 3),
        tg AS (SELECT u, v, w, count(*) AS nt FROM tri
               WHERE doc_id % 10 <> 0 GROUP BY 1, 2, 3),
        big AS (SELECT doc_id, ws[i-1] AS v, ws[i] AS w
                FROM ws, LATERAL (SELECT unnest(range(2, len(ws) + 1)) AS i) t
                WHERE len(ws) >= 2),
        tb AS (SELECT v, w, count(*) AS nb FROM big
               WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
        uni AS (SELECT term, count(*) AS nu FROM (
                  SELECT unnest(ws) AS term FROM ws WHERE doc_id % 10 <> 0)
                GROUP BY 1),
        tot AS (SELECT sum(nu) AS t FROM uni),
        a AS (SELECT CAST(0.4 AS DOUBLE) AS alpha),
        scored AS (
          SELECT tri.doc_id,
                 CASE WHEN tg.nt IS NOT NULL THEN ln(tg.nt * 1.0 / uvb.nb)
                      WHEN vwb.nb IS NOT NULL THEN ln(alpha * vwb.nb / uv.nu)
                      ELSE ln(alpha * alpha * coalesce(uw.nu, 1) / t) END AS lp
          FROM tri LEFT JOIN tg ON tri.u = tg.u AND tri.v = tg.v AND tri.w = tg.w
               LEFT JOIN tb uvb ON tri.u = uvb.v AND tri.v = uvb.w
               LEFT JOIN tb vwb ON tri.v = vwb.v AND tri.w = vwb.w
               LEFT JOIN uni uv ON tri.v = uv.term
               LEFT JOIN uni uw ON tri.w = uw.term
               CROSS JOIN tot CROSS JOIN a)
        SELECT doc_id, count(*) AS n_trigrams, round(avg(lp), 6) AS avg_logprob
        FROM scored GROUP BY 1""")),

    // BM25 keyword search: global top-20 via the bounded-heap operator
    // (no corpus-wide sort). Oracle replays the formula with row_number.
    "t11_bm25_search" -> QueryDef(
      (s, d) => TextAnalysis.bm25TopK(Tables.documents(s, d), "text",
        "doc_id", queryTerms = Seq("join", "filter", "scan"), k = 20),
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents),
        lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
                         (SELECT avg(dl) FROM lens) AS avgdl),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
               WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT doc_id, round(sum(
            ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
            (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
          FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
          GROUP BY doc_id)
        SELECT doc_id, score,
               row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
        FROM scored ORDER BY rank LIMIT 20""")),

    // Reproducible train/val split assignment: a document's split is a
    // pure function of its id via the portable hash — stable across runs,
    // machines, and engines (the property that matters when the corpus is
    // re-sharded), unlike rand()-based sampling. 90/10 here; summarized
    // per (lang, split) to keep the gate output bounded.
    "t10_split_assignment" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .withColumn("split",
          when(pmod(PH.md5_64(col("doc_id").cast("string")), lit(100L)) < 90,
            "train").otherwise("val"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc")),
      Some(s"""
        SELECT lang,
               CASE WHEN ${PH.sqlMd5_64("CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'train' ELSE 'val' END AS split,
               count(*) AS n, min(doc_id) AS min_doc
        FROM documents GROUP BY 1, 2""")),

    // TF-IDF top-3 terms per document through the bounded-heap top-k
    // operator (score desc, term asc for deterministic ties).
    "t07_tfidf_top_terms" -> QueryDef(
      (s, d) => TextAnalysis.tfidfTopTerms(Tables.documents(s, d), "text",
        "doc_id", k = 3),
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (SELECT doc_id, term,
                     round(tf * ln(n_docs * 1.0 / df), 6) AS score
                   FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        ranked AS (SELECT doc_id, term, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC) AS rank
                   FROM scored)
        SELECT doc_id, term, score, rank FROM ranked WHERE rank <= 3""")),

    // PII scan + redaction. The corpus has no real PII, so a deterministic
    // contact string derived from doc_id is appended to every third doc on
    // BOTH sides — the gate checks the regex scan/redact machinery, with
    // the redacted text compared via portable fingerprint.
    "t13_pii_redaction" -> QueryDef(
      (s, d) => {
        val aug = when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
                 lit("@example.com or call 555-"),
                 lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
          .otherwise(col("text"))
        TextAnalysis.piiRedact(
            Tables.documents(s, d).withColumn("aug", aug), "aug")
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
                  PH.md5_64(col("redacted")).as("redacted_fp"))
      },
      Some(s"""
        WITH a AS (SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                          THEN text || ' contact user' || doc_id ||
                               '@example.com or call 555-' ||
                               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE text END AS aug
                   FROM documents),
        r AS (SELECT doc_id, aug,
                regexp_replace(regexp_replace(aug,
                  '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
                  '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted
              FROM a)
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(aug, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
               ${PH.sqlMd5_64("redacted")} AS redacted_fp
        FROM r""")),

    // Gopher-style hard quality rules: per-rule flags + bitmask + keep.
    "t14_quality_rules" -> QueryDef(
      (s, d) => TextAnalysis.qualityRules(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("r_word_count"), col("r_mean_word_len"),
                col("r_stopwords"), col("r_repetition"), col("r_alpha"),
                col("rule_mask"), col("keep")),
      Some(s"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id, text, ws,
                CASE WHEN len(ws) >= 3
                     THEN [array_to_string(ws[i:i+2], ' ')
                           for i in range(1, len(ws) - 1)]
                     ELSE [array_to_string(ws, ' ')] END AS grams
              FROM t),
        m AS (SELECT doc_id,
                CAST(len(ws) AS DOUBLE) AS nw,
                (CAST(strlen(text) AS DOUBLE) - (len(ws) - 1)) / len(ws) AS mean_len,
                len(list_filter(ws, w -> w IN ${inAllMarkers})) AS marks,
                CASE WHEN len(grams) > 0 THEN
                       1 - len(list_distinct(grams)) * 1.0 / len(grams)
                     ELSE 0.0 END AS rep,
                CASE WHEN strlen(text) > 0 THEN
                       CAST(strlen(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                         / strlen(text)
                     WHEN strlen(text) = 0 THEN 0.0 END AS alpha
              FROM g),
        r AS (SELECT doc_id,
                CASE WHEN nw >= 50 AND nw <= 100000 THEN 1 ELSE 0 END AS r1,
                CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0 THEN 1 ELSE 0 END AS r2,
                CASE WHEN marks >= 2 THEN 1 ELSE 0 END AS r3,
                CASE WHEN rep <= 0.5 THEN 1 ELSE 0 END AS r4,
                CASE WHEN alpha >= 0.7 THEN 1 ELSE 0 END AS r5
              FROM m)
        SELECT doc_id,
               CAST(r1 AS BIGINT) AS r_word_count,
               CAST(r2 AS BIGINT) AS r_mean_word_len,
               CAST(r3 AS BIGINT) AS r_stopwords,
               CAST(r4 AS BIGINT) AS r_repetition,
               CAST(r5 AS BIGINT) AS r_alpha,
               CAST(r1 + r2*2 + r3*4 + r4*8 + r5*16 AS BIGINT) AS rule_mask,
               CAST(r1*r2*r3*r4*r5 AS BIGINT) AS keep
        FROM r""")),

    // Greedy sequence packing into ~2048-token bins per language shard
    // (prefix-sum bin assignment — deterministic, one window per shard).
    "t15_sequence_packing" -> QueryDef(
      (s, d) => TextAnalysis.sequencePacking(Tables.documents(s, d),
          "text", "doc_id", "lang", budget = 2048)
        .withColumnRenamed("grp", "lang"),
      Some("""
        WITH t AS (SELECT lang, doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
                   FROM documents),
        c AS (SELECT lang, doc_id, tokens,
                sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM t)
        SELECT lang, CAST(floor((cum - tokens) * 1.0 / 2048) AS BIGINT) AS bin,
               count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens,
               min(doc_id) AS first_id, max(doc_id) AS last_id
        FROM c GROUP BY 1, 2""")),

    // Deterministic stratified rebalancing: every language stratum
    // downsampled to the smallest stratum via portable-hash acceptance.
    "t16_stratified_sample" -> QueryDef(
      (s, d) => TextAnalysis.stratifiedRebalance(Tables.documents(s, d),
        "doc_id", "lang"),
      Some(s"""
        WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
        t AS (SELECT min(n_total) AS target FROM c),
        k AS (SELECT d.lang, c.n_total,
                CASE WHEN ${PH.sqlMd5_64("CAST(doc_id AS VARCHAR)")} % 1000000
                       < floor(t.target * 1000000 * 1.0 / c.n_total)
                     THEN 1 ELSE 0 END AS kept
              FROM documents d JOIN c USING (lang) CROSS JOIN t)
        SELECT lang, max(n_total) AS n_total, CAST(sum(kept) AS BIGINT) AS n_kept
        FROM k GROUP BY 1""")),

    // Vocabulary induction (the BPE-training merge-candidate scan at word
    // granularity): corpus-wide adjacent-pair counts, global top-30 by
    // frequency through the bounded-heap top-k operator — one token-pair
    // shuffle with map-side partials, never a global sort.
    "t17_bigram_vocab" -> QueryDef(
      (s, d) => {
        val counts = Tables.documents(s, d)
          .withColumn("_ws", split(col("text"), " ")) // tokenize once
          .select(explode(Dedup.ngramsOfWords(col("_ws"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        graft.plans.TopKPerGroup.perGroup(counts, Nil,
          Seq("n" -> true, "bigram" -> false), 30)
      },
      Some("""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT unnest(
                CASE WHEN len(ws) >= 2
                     THEN [array_to_string(ws[i:i+1], ' ')
                           for i in range(1, len(ws))]
                     ELSE [array_to_string(ws, ' ')] END) AS bigram
              FROM d),
        c AS (SELECT bigram, count(*) AS n FROM g GROUP BY 1)
        SELECT bigram, n,
               row_number() OVER (ORDER BY n DESC, bigram ASC) AS rank
        FROM c ORDER BY rank LIMIT 30""")),

    // Shard-export manifest: the training-data export shape. Shard = a
    // deterministic portable hash of the doc id mod N, so any engine (or
    // a later re-run) reproduces the same assignment; the manifest rows
    // (docs / tokens / langs per shard) are what the downstream loader
    // validates against. The actual write is
    // `repartition(N, col("shard")).write.partitionBy("shard")` — one
    // shuffle, each shard a contiguous file set.
    "t19_shard_manifest" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .withColumn("shard",
          graft.functions.PortableHash.md5_64(col("doc_id").cast("string")) % 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
             sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
             countDistinct(col("lang")).as("n_langs")),
      Some(s"""
        SELECT ${graft.functions.PortableHash.sqlMd5_64("CAST(doc_id AS VARCHAR)")} % 8 AS shard,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents GROUP BY 1""")),

    // Weighted sampling without replacement (priority sampling): top-20
    // per language by n_chars/u with u a deterministic uniform from the
    // portable id hash — pure IEEE division (no ln/pow), so the oracle
    // reproduces priorities bit-for-bit; ranking uses the exact value,
    // display rounds it.
    "t18_priority_sample" -> QueryDef(
      (s, d) => TextAnalysis.prioritySample(Tables.documents(s, d),
        "doc_id", "lang", "n_chars", k = 20),
      Some(s"""
        WITH scored AS (
          SELECT lang AS stratum, doc_id AS id,
                 CAST(n_chars AS DOUBLE) AS w,
                 CAST(n_chars AS DOUBLE) /
                   (CAST(${PH.sqlMd5_64("CAST(doc_id AS VARCHAR)")} % 1000000
                         + 1 AS DOUBLE) / 1000001.0) AS priority
          FROM documents)
        SELECT stratum, id, w, round(priority, 4) AS priority,
               row_number() OVER (PARTITION BY stratum
                                  ORDER BY priority DESC, id ASC) AS rank
        FROM scored QUALIFY rank <= 20""")),

    // Temperature-scaled source mixture resampling (the LLM "data mixing"
    // step): target share ∝ n^0.5, expected sample = half the corpus,
    // acceptance a pure hash function of doc_id — the oracle replays the
    // rate formula and the acceptance hash exactly.
    "t20_mixture_resample" -> QueryDef(
      (s, d) => TextAnalysis.mixtureResample(
        Tables.documents(s, d), "doc_id", "source",
        temperature = 0.5, targetFraction = 0.5),
      Some(s"""
        WITH c AS (SELECT source AS grp, count(*) AS n_total
                   FROM documents GROUP BY 1),
        t AS (SELECT sum(pow(n_total, 0.5)) AS z,
                     sum(n_total) AS corpus_n FROM c),
        r AS (SELECT grp, n_total,
                round(least(1.0, corpus_n * 0.5 *
                  (pow(n_total, 0.5) / z) / n_total), 6) AS rate
              FROM c, t)
        SELECT r.grp AS source_grp, r.n_total, r.rate,
               CAST(sum(CASE WHEN
                 (${PH.sqlMd5_64("CAST(doc_id AS VARCHAR)")} % 1000000)
                   / 1000000.0 < r.rate THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_sampled
        FROM documents d JOIN r ON d.source = r.grp
        GROUP BY 1, 2, 3""")),

    // Model-based quality filtering: linear classifier inference over
    // hashed bag-of-words features (the fastText-style quality gate of
    // CCNet/LLaMA-class pipelines). Weights are a deterministic literal
    // family (stub semantics, real plumbing — like the multimodal
    // decoder); scoring fuses into the scan with ZERO shuffle, and the
    // integer feature fold makes the oracle replay exact.
    "t21_classifier_score" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
                TextAnalysis.classifierScore(col("text")).as("quality_score"))
        .withColumn("kept", (col("quality_score") >= 0.5).cast("boolean")),
      Some(s"""
        SELECT doc_id,
               ${TextAnalysis.classifierScoreSql()} AS quality_score,
               quality_score >= 0.5 AS kept
        FROM documents""")),

    // Per-source quality cap — the crawl-curation step after scoring:
    // keep only the best k documents per source (RefinedWeb-style
    // per-domain budgets). Runs through the bounded-heap top-k operator,
    // so the shuffle carries ≤ k rows per source per map partition —
    // never a per-source sort, never the full corpus. Score is t21's
    // classifier (zero-shuffle, oracle-replicable), so the whole gate is
    // score-scan → bounded top-k: two stages at any corpus size.
    "t22_source_quality_cap" -> QueryDef(
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
                  TextAnalysis.classifierScore(col("text")).as("quality_score"))
        graft.plans.TopKPerGroup.perGroup(scored,
            groupCols = Seq("source"),
            orderCols = Seq("quality_score" -> true, "doc_id" -> false),
            k = 20)
          .select(col("source"), col("doc_id"), col("quality_score"),
                  col("rank"))
      },
      Some(s"""
        WITH scored AS (
          SELECT source, doc_id,
                 ${TextAnalysis.classifierScoreSql()} AS quality_score
          FROM documents)
        SELECT source, doc_id, quality_score,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality_score DESC, doc_id ASC)
                 AS rank
        FROM scored QUALIFY rank <= 20""")),

    "t04_fingerprint" -> QueryDef(
      (s, d) => TextAnalysis.withRobustFingerprints(Tables.documents(s, d), "text")
        .select(col("doc_id"),
                TextAnalysis.contentFingerprint(col("text")).as("content_fp"),
                col("fp_min"), col("fp_max")),
      Some(s"""
        WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        s AS (SELECT doc_id, text,
                CASE WHEN len(ws) >= 3
                     THEN list_distinct([array_to_string(ws[i:i+2], ' ')
                                         for i in range(1, len(ws)-1)])
                     ELSE [array_to_string(ws, ' ')] END AS shingles
              FROM d)
        SELECT doc_id,
               ${PH.sqlMd5_64("trim(regexp_replace(text, '\\s+', ' ', 'g'))")} AS content_fp,
               list_min([${PH.sqlMd5_64("sh")} for sh in shingles]) AS fp_min,
               list_max([${PH.sqlMd5_64("sh")} for sh in shingles]) AS fp_max
        FROM s""")),

    // A curation step in PURE SQL: the scalar text kernels are registered
    // on the FunctionRegistry (graft.plans.GraftExtensions), so a
    // SQL-only user — the reference's users submit opaque jobs; ours
    // submit SQL — can run lang-id + token count + classifier filter +
    // fingerprint without touching the Scala API. The registered
    // builders APPLY the library's Column kernels (one expression tree,
    // same codegen), and the whole gate hash-matches the DuckDB oracle.
    "t23_sql_curation" -> QueryDef(
      (s, d) => {
        graft.plans.GraftExtensions.register(s)
        Tables.documents(s, d).createOrReplaceTempView("documents_sql")
        s.sql("""
          SELECT doc_id,
                 graft_lang_id(text) AS lang_pred,
                 graft_token_count(text) AS n_tokens,
                 graft_classifier_score(text) AS cls_score,
                 graft_fingerprint(text) AS content_fp
          FROM documents_sql
          WHERE graft_classifier_score(text) >= 0.5
            AND graft_token_count(text) >= 20""")
      },
      Some(s"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        sc AS (SELECT doc_id, text,
                 len(list_filter(ws, w -> w IN ${inList("en")})) AS s_en,
                 len(list_filter(ws, w -> w IN ${inList("es")})) AS s_es,
                 len(list_filter(ws, w -> w IN ${inList("de")})) AS s_de,
                 len(list_filter(ws, w -> w IN ${inList("fr")})) AS s_fr,
                 CAST(len(ws) AS BIGINT) AS n_tokens,
                 ${TextAnalysis.classifierScoreSql()} AS cls_score
               FROM t)
        SELECT doc_id,
               CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                    WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
                    ELSE 'fr' END AS lang_pred,
               n_tokens, cls_score,
               ${PH.sqlMd5_64("trim(regexp_replace(text, '\\s+', ' ', 'g'))")} AS content_fp
        FROM sc
        WHERE cls_score >= 0.5 AND n_tokens >= 20""")),

    // Deterministic epoch shuffle: the training-time global permutation
    // as a pure function of (epoch, doc_id) — reproducible shards and
    // within-shard order, no rand(). The oracle replays the epoch-salted
    // hash, the mod-shard split, and the per-shard rank exactly.
    "t24_epoch_shuffle" -> QueryDef(
      (s, d) => TextAnalysis.epochShuffle(
        Tables.documents(s, d), "doc_id", epoch = 3, nShards = 8),
      Some(s"""
        WITH h AS (SELECT doc_id AS id,
                     ${PH.sqlMd5_64("'3:' || CAST(doc_id AS VARCHAR)")} AS h
                   FROM documents)
        SELECT id, h % 8 AS shard,
               row_number() OVER (PARTITION BY h % 8 ORDER BY h, id) AS pos
        FROM h""")),

    // DSIR importance scoring: hashed-unigram bucket distributions for
    // the English slice (target) vs the whole corpus; per-doc summed
    // log importance ratio. The oracle rebuilds the same smoothed
    // 64-bucket table (rounded to 6 dp, the byte-identical per-token
    // terms), folds each doc's tokens in order, and rounds to 4 dp.
    "t25_dsir_weights" -> QueryDef(
      (s, d) => TextAnalysis.dsirScore(
        Tables.documents(s, d), "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 64),
      Some(s"""
        WITH tok AS (
          SELECT (lang = 'en') AS tgt,
                 unnest(list_filter(string_split(text, ' '),
                                    w -> len(w) > 0)) AS w
          FROM documents),
        bc AS (SELECT ${PH.sqlMd5_64("w")} % 64 AS b,
                 sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
                 count(*) AS ca
               FROM tok GROUP BY 1),
        tots AS (SELECT sum(ct) AS nt, sum(ca) AS na FROM bc),
        fullb AS (SELECT t.i AS b, coalesce(bc.ct, 0) AS ct,
                    coalesce(bc.ca, 0) AS ca
                  FROM range(64) t(i) LEFT JOIN bc ON bc.b = t.i),
        r AS (SELECT b, CAST(round(1000000 *
                       round(ln((ct + 1.0) / (nt + 64)) -
                             ln((ca + 1.0) / (na + 64)), 6), 0) AS BIGINT)
                       AS lrm
              FROM fullb, tots),
        rl AS (SELECT list(lrm ORDER BY b) AS rl FROM r),
        d AS (SELECT doc_id,
                list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
              FROM documents)
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
               CAST(coalesce(list_sum([rl[(${PH.sqlMd5_64("w")} % 64) + 1]
                                       for w in ws]), 0) AS DOUBLE)
                 / 1000000.0 AS logw,
               coalesce(list_sum([rl[(${PH.sqlMd5_64("w")} % 64) + 1]
                                  for w in ws]), 0) > 0 AS target_like
        FROM d, rl""")),

    // Token-budget mixture: per-source token budgets (τ-scaled share of
    // the corpus token mass), filled in hash-priority order. The oracle
    // replays masses, 6dp-rounded budget shares, priorities, and the
    // prefix-sum admission window exactly.
    "t26_token_budget_mix" -> QueryDef(
      (s, d) => TextAnalysis.tokenBudgetMix(
        Tables.documents(s, d), "doc_id", "source", "text",
        temperature = 0.6, budgetTokens = 25000L),
      Some(s"""
        WITH toks AS (SELECT source AS grp, doc_id,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                      FROM documents),
        m AS (SELECT grp, sum(n_tokens) AS grp_tokens FROM toks GROUP BY 1),
        z AS (SELECT sum(pow(grp_tokens, 0.6)) AS z FROM m),
        b AS (SELECT grp,
                CAST(floor(round(25000 * pow(grp_tokens, 0.6) / z, 6)) AS BIGINT)
                  AS budget_tokens
              FROM m, z),
        p AS (SELECT toks.*, ${PH.sqlMd5_64("CAST(doc_id AS VARCHAR)")} AS pri
              FROM toks),
        c AS (SELECT p.*, b.budget_tokens,
                coalesce(sum(n_tokens) OVER (PARTITION BY p.grp
                  ORDER BY pri, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS cum_before
              FROM p JOIN b ON p.grp = b.grp)
        SELECT doc_id, grp AS source, n_tokens,
               CAST(cum_before AS BIGINT) AS cum_before, budget_tokens
        FROM c WHERE cum_before < budget_tokens""")),

    // In-engine classifier training: full-batch logistic GD over hashed
    // bag-of-words features, one gradient aggregate per iteration (the
    // s10-kmeans trainer shape, supervised). Gate emits the training
    // history; convergence, separation, and bit-identical retrain are
    // spec-asserted (rows-only by design — iterated float training is
    // not SQL-replayable).
    "t27_classifier_train" -> QueryDef(
      (s, d) => TextAnalysis.trainClassifier(
        Tables.documents(s, d), "text", col("lang") === "en")._2,
      None),

    // Embedding-space benchmark decontamination (t35) — t08's semantic
    // sibling: corpus vectors whose nearest EVAL-set vector clears a
    // cosine threshold are flagged (paraphrased leakage n-gram overlap
    // can't see). Eval set = vec_id % 20 = 0 (the held-out benchmark),
    // corpus = the rest. Oracle replays the exact cosine argmax (ties to
    // lowest eval id) and the rounded-boundary flag.
    "t35_embedding_decontam" -> QueryDef(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        graft.operators.Similarity.embeddingDecontam(
          emb.filter(col("vec_id") % 20 =!= 0),
          emb.filter(col("vec_id") % 20 === 0),
          threshold = 0.35)
      },
      Some("""
        WITH ev AS (SELECT vec_id AS eval_id, CAST(embedding AS DOUBLE[]) AS evv
                    FROM embeddings WHERE vec_id % 20 = 0),
        c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id % 20 <> 0),
        sims AS (SELECT c.vec_id, ev.eval_id,
                        list_cosine_similarity(v, evv) AS sim
                 FROM c, ev),
        r AS (SELECT vec_id, eval_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, eval_id ASC) AS rn
              FROM sims)
        SELECT vec_id, round(sim, 6) AS max_sim, eval_id AS closest_eval_id,
               round(sim, 6) >= 0.35 AS contaminated
        FROM r WHERE rn = 1""")),

    // Iteration 1 of the t27 trainer, hash-oracled — the only GD
    // iteration an SQL oracle can replay exactly: with zero-init weights
    // every doc scores p = 0.5 precisely, so the loss is ln 2 for every
    // row and accuracy is the non-target label share (integer counting,
    // no float-order sensitivity). This pins t27's feature build,
    // scoring expression, and loss/accuracy aggregates to the DuckDB
    // oracle; later iterations stay rows-only because the gradient avg
    // is a distributed float sum whose partial order an SQL engine
    // cannot replay (see SURVEY §2d).
    "t34_classifier_train_iter1" -> QueryDef(
      (s, d) => TextAnalysis.trainClassifier(
        Tables.documents(s, d), "text", col("lang") === "en", iters = 1)._2,
      Some("""
        SELECT CAST(1 AS BIGINT) AS iter, round(ln(2), 6) AS loss,
               round(avg(CASE WHEN lang = 'en' THEN 0.0 ELSE 1.0 END), 6)
                 AS accuracy
        FROM documents""")),

    // Integer fixed-point classifier TRAINING, hash-oracled (t36, r11 —
    // the s19 training-oracle style for the text family): raw hashed-
    // bucket counts as sparse features, hard-sigmoid probabilities in
    // exact micro-units, integer gradient sums, floor-div updates. The
    // oracle RE-TRAINS from scratch (iters unrolled CTE stages) and the
    // gate emits the final weight vector — a mismatch in any iteration's
    // margins, clamps, gradients, or updates changes some weight. t27
    // stays the production logistic path (its GD avg is float-order
    // dependent); this is its verification twin the way s19 twins s10.
    "t36_classifier_train_fixed" -> QueryDef(
      (s, d) => {
        val (w, _) = TextAnalysis.trainClassifierFixedPoint(
          Tables.documents(s, d), "doc_id", "text", col("lang") === "en")
        import s.implicits._
        w.zipWithIndex.map { case (v, j) => (j.toLong, v) }.toSeq.toDF("j", "w")
      },
      Some(classifierFixedOracle(buckets = 64, iters = 3, lrDen = 2))),

    // In-engine BPE tokenizer (t28): merge rules trained on the
    // word-frequency dictionary (Sennrich et al. 2016 — k iterations of
    // pair-count argmax, each over |vocab| rows, so training cost is
    // corpus-size-independent after one scan), then applied to every doc
    // as a chain of literal replaces in ONE codegen'd projection — zero
    // shuffle at apply time. The oracle replays TRAINING AND APPLY
    // exactly: k unrolled CTE stages, each stage's argmax merge applied
    // via scalar subqueries (materialized so the stage chain doesn't
    // re-inline exponentially).
    "t28_bpe_tokenize" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = TextAnalysis.trainBpeMerges(docs, "text", BpeMergeCount)
        val toks = TextAnalysis.applyBpeTokens(col("text"), merges)
        docs.select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          length(call_function("replace", col("text"), lit(" "), lit("")))
            .cast("long").as("n_chars"),
          size(toks).cast("long").as("n_bpe"))
          .withColumn("compression",
            round(col("n_chars").cast("double") / col("n_bpe"), 6))
      },
      Some(bpeOracle(BpeMergeCount))),

    // Sliding-window chunking with overlap (t29): the RAG / context-prep
    // step — 32-token windows advancing by 24 (8-token overlap), chunk
    // identity = (doc_id, chunk_idx) + portable content hash. One
    // posexplode, zero shuffle; the oracle replays start offsets, slices,
    // and hashes exactly.
    "t29_chunk_windows" -> QueryDef(
      (s, d) => TextAnalysis.slidingChunks(Tables.documents(s, d), "text",
        "doc_id", windowTokens = 32, strideTokens = 24),
      Some(s"""
        WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '),
                                              w -> len(w) > 0) AS ws
                   FROM documents),
        n AS (SELECT doc_id, ws, len(ws) AS n FROM d),
        st AS (SELECT doc_id, ws,
                 CASE WHEN n <= 32 THEN 1
                      ELSE CAST(ceil((n - 32) / 24.0) AS BIGINT) + 1 END AS nst
               FROM n),
        ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                      CAST(i * 24 AS BIGINT) AS start_tok,
                      ws[CAST(i * 24 + 1 AS BIGINT):CAST(i * 24 + 32 AS BIGINT)] AS chunk
               FROM st, LATERAL (SELECT unnest(range(0, nst)) AS i) t)
        SELECT doc_id, chunk_idx, start_tok,
               CAST(len(chunk) AS BIGINT) AS n_tok,
               ${PH.sqlMd5_64("array_to_string(chunk, ' ')")} AS chunk_hash
        FROM ch""")),

    // Length-bucketed batching (t30): quartile buckets from one exact-
    // percentile aggregate (the approx_percentile swap is the documented
    // 100 TB path, as q36→q36b), deterministic hash-ordered batch ids
    // within bucket×shard. The oracle replays boundaries (quantile_cont =
    // Spark's percentile, parity proven by q14), bucket CASE, shard hash,
    // and the ranking window exactly.
    "t30_length_batching" -> QueryDef(
      (s, d) => TextAnalysis.lengthBucketedBatches(Tables.documents(s, d),
        "text", "doc_id", nShards = 8, batchSize = 16),
      Some(s"""
        WITH n AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents),
        b AS (SELECT round(quantile_cont(n_tokens, 0.25), 6) AS b1,
                     round(quantile_cont(n_tokens, 0.5), 6) AS b2,
                     round(quantile_cont(n_tokens, 0.75), 6) AS b3 FROM n),
        a AS (SELECT doc_id, n_tokens,
                CASE WHEN n_tokens <= b1 THEN 0 WHEN n_tokens <= b2 THEN 1
                     WHEN n_tokens <= b3 THEN 2 ELSE 3 END AS bucket,
                ${PH.sqlMd5_64("'batch:' || CAST(doc_id AS VARCHAR)")} AS h
              FROM n, b),
        r AS (SELECT doc_id, n_tokens, bucket, CAST(h % 8 AS INT) AS shard,
                     row_number() OVER (PARTITION BY bucket, h % 8
                                        ORDER BY h, doc_id) AS rk
              FROM a)
        SELECT doc_id, n_tokens, bucket, shard,
               CAST((rk - 1) // 16 AS BIGINT) AS batch_in_shard,
               CAST((rk - 1) % 16 AS BIGINT) AS pos_in_batch
        FROM r"""))
  )

  private val BpeMergeCount = 12

  /** DuckDB replay of t28: w0 = the char-spaced word-frequency dict; each
    * stage i recounts adjacent pairs, picks the argmax merge m_i (count
    * desc, pair asc), and applies it to both the dict (w_i) and the
    * documents (r_i) with the same boundary-padded replace the engine
    * uses. MATERIALIZED keeps the i-deep CTE chain linear.
    */
  private def bpeOracle(k: Int): String = {
    val trainStages = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (
           SELECT unnest([array_to_string(ws[j:j+1], ' ') for j in range(1, len(ws))]) AS pr,
                  freq
           FROM (SELECT string_split(trim(sym), ' ') AS ws, freq FROM w${i - 1})
           WHERE len(ws) >= 2),
        m$i AS MATERIALIZED (
           SELECT pr, replace(pr, ' ', '') AS mg
           FROM (SELECT pr, sum(freq) AS n FROM p$i GROUP BY 1)
           ORDER BY n DESC, pr ASC LIMIT 1),
        w$i AS MATERIALIZED (
           SELECT replace(sym, coalesce(' ' || (SELECT pr FROM m$i) || ' ', chr(1)),
                          ' ' || coalesce((SELECT mg FROM m$i), '') || ' ') AS sym,
                  freq
           FROM w${i - 1})"""
    }.mkString(",\n        ")
    val applyStages = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (
           SELECT doc_id, text,
                  replace(rep, coalesce(' ' || (SELECT pr FROM m$i) || ' ', chr(1)),
                          ' ' || coalesce((SELECT mg FROM m$i), '') || ' ') AS rep
           FROM r${i - 1})"""
    }.mkString(",\n        ")
    s"""
      WITH w0 AS MATERIALIZED (
        SELECT ' ' || regexp_replace(word, '(?s)(.)', '\\1 ', 'g') AS sym, freq
        FROM (SELECT word, count(*) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
              WHERE len(word) > 0 GROUP BY 1)),
      $trainStages,
      r0 AS MATERIALIZED (
        SELECT doc_id, text,
               ' ' || regexp_replace(replace(text, ' ', '¤'), '(?s)(.)', '\\1 ', 'g') AS rep
        FROM documents),
      $applyStages
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(trim(rep), ' '),
                                  t -> t <> '¤' AND len(t) > 0)) AS BIGINT) AS n_bpe,
             round(CAST(len(replace(text, ' ', '')) AS DOUBLE) /
                   len(list_filter(string_split(trim(rep), ' '),
                                   t -> t <> '¤' AND len(t) > 0)), 6) AS compression
      FROM r$k"""
  }

  private val PH = graft.functions.PortableHash

  /** DuckDB replay of t36: re-train the fixed-point classifier from
    * scratch — sparse (doc, bucket, cnt) features, then per iteration
    * the exact-integer margin aggregate, the hard-sigmoid clamp
    * (one floor-of-double-division per doc), the 65-key integer
    * gradient sums, and the floor-div weight update. Bias rides as
    * bucket id `buckets`.
    */
  private def classifierFixedOracle(buckets: Int, iters: Int,
                                    lrDen: Long): String = {
    val P = 1000000L
    val steps = (1 to iters).map { i =>
      s"""m$i AS (SELECT xb.doc_id, xb.y,
             (SELECT w FROM w${i - 1} WHERE j = $buckets)
               + SUM(wt.w * xb.cnt) AS mu
           FROM xb JOIN w${i - 1} wt ON wt.j = xb.j
           GROUP BY 1, 2),
    p$i AS (SELECT doc_id, y,
             LEAST($P, GREATEST(0, ${P / 2}
               + CAST(floor(CAST(mu AS DOUBLE) / 4) AS BIGINT))) AS p
           FROM m$i),
    g$i AS (SELECT xb.j, SUM((p.p - p.y * $P) * xb.cnt) AS g
           FROM p$i p JOIN xb ON xb.doc_id = p.doc_id GROUP BY 1),
    w$i AS (SELECT wp.j, wp.w - CAST(floor(CAST(
             CASE WHEN wp.j = $buckets
                  THEN (SELECT SUM(p - y * $P) FROM p$i)
                  ELSE COALESCE(g.g, 0) END
             AS DOUBLE) / ($lrDen * (SELECT n FROM nn))) AS BIGINT) AS w
           FROM w${i - 1} wp LEFT JOIN g$i g ON g.j = wp.j)"""
    }.mkString(",\n    ")
    s"""
    WITH xb AS MATERIALIZED (
      SELECT doc_id, y, j, COUNT(*) AS cnt FROM (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               ${PH.sqlMd5_64("w")} % $buckets AS j
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents))
      GROUP BY 1, 2, 3),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    w0 AS (SELECT CAST(j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
           FROM (SELECT unnest(range(0, ${buckets + 1})) AS j)),
    $steps
    SELECT j, w FROM w$iters"""
  }
}
