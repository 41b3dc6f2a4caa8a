package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Deduplication operator suite over `documents` (SURVEY §2c). The exact
  * and n-gram-Jaccard variants are SQL-expressible and oracle-checked;
  * MinHash-LSH and SimHash use Spark-native xxhash64 (no DuckDB analog)
  * and get rows-only checks — their *verified* outputs are themselves
  * exact-Jaccard/Hamming values, so DedupSpec asserts their agreement
  * with the exact operators instead.
  */
object DedupQueries {

  // mirrors Dedup.shingleIndex's document-frequency cap (Jaccard over the
  // non-ubiquitous shingle universe)
  private val jaccardOracle = s"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
           FROM d, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t),
    shc AS (SELECT doc_id, s FROM (
              SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh)
            WHERE df <= ${graft.operators.Dedup.DefaultDfCap}),
    sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
    com AS (SELECT a.doc_id id1, b.doc_id id2, count(*) c
            FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
    SELECT id1, id2, round(c * 1.0 / (s1.n + s2.n - c), 6) AS jaccard
    FROM com JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
    WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.8"""

  def defs: Map[String, QueryDef] = Map(

    "d01_dedup_exact" -> QueryDef(
      (s, d) => Dedup.exact(Tables.documents(s, d), "text", "doc_id"),
      Some("""
        SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
               count(*) AS dup_count
        FROM documents GROUP BY 1""")),

    "d02_dedup_ngram_jaccard" -> QueryDef(
      (s, d) => Dedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
        shingleN = 3, threshold = 0.8),
      Some(jaccardOracle)),

    // MinHash-LSH: candidates from 32-hash/8-band signatures, then exact
    // Jaccard verification — same output contract as d02 minus LSH misses.
    // xxhash64 family ⇒ rows-only here; agreement vs d02 asserted in
    // DedupSpec.
    "d03_dedup_minhash_lsh" -> QueryDef(
      (s, d) => Dedup.minhashLsh(Tables.documents(s, d), "text", "doc_id",
        k = 32, bands = 8, shingleN = 3, threshold = 0.8),
      None),

    "d04_dedup_simhash" -> QueryDef(
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "text", "doc_id",
        maxDist = 3),
      None),

    // Pairs → connected components → keeper: the per-document cluster
    // assignment a dedup pipeline actually emits. Oracle = recursive
    // transitive closure over the same (DF-capped) pair graph.
    "d06_dedup_clusters" -> QueryDef(
      (s, d) => Dedup.connectedComponents(
          Dedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id",
            shingleN = 3, threshold = 0.8))
        .select(col("id").as("doc_id"), col("component").as("cluster_keeper")),
      Some(s"""
        WITH RECURSIVE
        d AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
               FROM d, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) t),
        shc AS (SELECT doc_id, s FROM (
                  SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM sh)
                WHERE df <= ${graft.operators.Dedup.DefaultDfCap}),
        sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY 1),
        com AS (SELECT a.doc_id id1, b.doc_id id2, count(*) c
                FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
        pairs AS (SELECT id1, id2
                  FROM com JOIN sz s1 ON id1 = s1.doc_id JOIN sz s2 ON id2 = s2.doc_id
                  WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.8),
        edges AS (SELECT id1 AS a, id2 AS b FROM pairs
                  UNION SELECT id2, id1 FROM pairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION SELECT a, a FROM edges
          UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id, min(b) AS cluster_keeper FROM reach GROUP BY a""")),

    // Embedding-cosine near-dup (double-precision parity with the oracle).
    "d05_dedup_embedding" -> QueryDef(
      (s, d) => graft.operators.Similarity.cosinePairs(
        Tables.embeddings(s, d), threshold = 0.4),
      Some("""
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4"""))
  )
}
