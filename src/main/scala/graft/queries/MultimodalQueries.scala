package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column suite (SURVEY §2c): binary payload + metadata model,
  * stubbed decode kernel, frame sampling. The stub decoder derives
  * features from the payload MD5, so even the "decode" is oracle-checkable
  * in SQL.
  */
object MultimodalQueries {

  private val PH = graft.functions.PortableHash

  def defs: Map[String, QueryDef] = Map(

    "m01_media_metadata" -> QueryDef(
      (s, d) => Multimodal.asMediaTable(Tables.documents(s, d), "text", "doc_id")
        .select(col("doc_id"), col("meta.media_type").as("media_type"),
                col("meta.byte_len").as("byte_len"),
                col("meta.checksum").as("checksum")),
      Some("""
        SELECT doc_id, 'text/plain' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               md5(text) AS checksum
        FROM documents""")),

    // mapPartitions decode kernel; features are MD5-derived so the oracle
    // recomputes them from hex digits.
    "m02_decode_features" -> QueryDef(
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d), "text", "doc_id")
        Multimodal.decodeFeatures(media, "doc_id")
          .select(col("doc_id"),
                  col("features.width").cast("long").as("width"),
                  col("features.height").cast("long").as("height"),
                  col("features.n_frames").cast("long").as("n_frames"),
                  round(col("features.brightness"), 6).as("brightness"))
      },
      Some("""
        SELECT doc_id,
               CAST(1 + CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 2048 AS BIGINT) AS width,
               CAST(1 + CAST(('0x' || substr(md5(text), 5, 4)) AS INTEGER) % 2048 AS BIGINT) AS height,
               CAST(1 + CAST(('0x' || substr(md5(text), 9, 2)) AS INTEGER) % 64 AS BIGINT) AS n_frames,
               round(CAST(('0x' || substr(md5(text), 11, 2)) AS INTEGER) / 255.0, 6) AS brightness
        FROM documents""")),

    // aspect-preserving resize planning (scale-to-fit 512, never upscale)
    "m04_resize_plan" -> QueryDef(
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d), "text", "doc_id")
        Multimodal.resizePlan(Multimodal.decodeFeatures(media, "doc_id"),
          "doc_id", maxDim = 512)
      },
      Some("""
        WITH f AS (SELECT doc_id,
                     1 + CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 2048 AS w,
                     1 + CAST(('0x' || substr(md5(text), 5, 4)) AS INTEGER) % 2048 AS h
                   FROM documents),
        sc AS (SELECT doc_id, w, h,
                 CASE WHEN greatest(w, h) > 512
                      THEN 512.0 / greatest(w, h) ELSE 1.0 END AS scale
               FROM f)
        SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
               CAST(greatest(floor(w * scale), 1) AS BIGINT) AS out_width,
               CAST(greatest(floor(h * scale), 1) AS BIGINT) AS out_height,
               round(scale, 6) AS scale
        FROM sc""")),

    // Multimodal curation capstone: build (media, caption, embedding)
    // training pairs — media features from the decode kernel, caption
    // quality from the text operators, embedding presence via join —
    // filtered to the trainable subset. The composed pipeline a
    // CLIP-style dataset build runs, end to end, oracle-checked.
    "m05_training_pairs" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val mediaTbl = Multimodal.asMediaTable(docs, "text", "doc_id")
        val feats = Multimodal.decodeFeatures(mediaTbl, "doc_id")
          .select(col("doc_id"), col("features.width").cast("long").as("width"))
        val media = mediaTbl
          .select(col("doc_id"), col("meta.byte_len").as("byte_len"))
          .join(feats, "doc_id")
        val quality = graft.operators.TextAnalysis.qualityMetrics(docs, "text")
          .select(col("doc_id"), col("quality_score"))
        val emb = Tables.embeddings(s, d).select(col("vec_id"))
        media.join(quality, "doc_id")
          .join(emb, col("doc_id") === col("vec_id"))
          .filter(col("quality_score") >= 0.5 && col("width") >= 256)
          .select(col("doc_id"), col("byte_len"), col("width"),
                  col("quality_score"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        q AS (SELECT doc_id, text,
                round(least(CAST(len(ws) AS DOUBLE) / 100.0, 1.0) * 0.3 +
                      least(CAST(len(list_filter(ws, w -> w IN
                        (${graft.operators.TextAnalysis.markers("en").map(w => s"'$w'").mkString(",")})))
                        AS DOUBLE) / len(ws) * 5.0, 1.0) * 0.3 +
                      CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) * 0.2 +
                      CAST(strlen(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                        / strlen(text) * 0.2, 6) AS quality_score
              FROM t),
        f AS (SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                CAST(1 + CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 2048 AS BIGINT) AS width
              FROM documents)
        SELECT d.doc_id, f.byte_len, f.width, q.quality_score
        FROM documents d JOIN q USING (doc_id) JOIN f ON f.doc_id = d.doc_id
        JOIN embeddings e ON e.vec_id = d.doc_id
        WHERE q.quality_score >= 0.5 AND f.width >= 256""")),

    // Media near-dup: SimHash over the payload's byte 4-gram shingles
    // (the opaque-binary perceptual hash), banded on 6×10-bit chunks
    // (lossless to Hamming 5), exact xor-popcount verify. The oracle
    // replays the engine's DISTINCT-hash-first banding exactly: buckets
    // cap on distinct phash VALUES per (chunk, chunk_val), and equal-hash
    // (distance-0) pairs are emitted unconditionally outside any cap, as
    // Dedup.expandHashPairs does.
    "m06_media_phash_pairs" -> QueryDef(
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d), "text", "doc_id")
        Multimodal.phashPairs(media, "doc_id", maxDist = 5)
      },
      Some(s"""
        WITH pay AS (SELECT doc_id, encode(text) AS payload FROM documents),
        hx AS (SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS nb
               FROM pay),
        tok AS (SELECT doc_id, substr(hx, i*2+1, 8) AS w
                FROM hx, LATERAL (SELECT unnest(range(0, greatest(nb-3,1))) AS i) t),
        hs AS (SELECT doc_id, list(${PH.sqlMd5_64("w")}) AS hl
               FROM tok GROUP BY doc_id),
        ph AS (SELECT doc_id,
                 CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1
                                                        THEN 1 ELSE -1 END
                                                   for h in hl]) > 0
                                     THEN (1::BIGINT << b) ELSE 0 END
                                for b in range(64)]) AS BIGINT) AS phash
               FROM hs),
        dh AS (SELECT DISTINCT phash FROM ph),
        ch AS (SELECT phash, c AS chunk,
                      (phash >> (c * 10)) & 1023 AS chunk_val
               FROM dh, LATERAL (SELECT unnest(range(0, 6)) AS c) t),
        capped AS (SELECT phash, chunk, chunk_val FROM (
                     SELECT *, count(*) OVER (PARTITION BY chunk, chunk_val) AS sz
                     FROM ch)
                   WHERE sz <= ${graft.operators.Dedup.DefaultBucketCap}),
        hv AS (SELECT h1, h2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
               FROM (SELECT DISTINCT a.phash AS h1, b.phash AS h2
                     FROM capped a JOIN capped b
                       ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
                      AND a.phash < b.phash)
               WHERE bit_count(xor(h1, h2)) <= 5)
        SELECT least(x.doc_id, y.doc_id) AS id1,
               greatest(x.doc_id, y.doc_id) AS id2, hv.hamming
        FROM hv JOIN ph x ON x.phash = hv.h1
                JOIN ph y ON y.phash = hv.h2
        UNION ALL
        SELECT x.doc_id AS id1, y.doc_id AS id2, CAST(0 AS BIGINT) AS hamming
        FROM ph x JOIN ph y
          ON x.phash = y.phash AND x.doc_id < y.doc_id""")),

    // The WIDE-corpus banding path (Manku-style block-combination keys,
    // nBlocks=7 → 21 18-bit keys/row) hash-oracled end to end: at sf0.01
    // no bucket cap fires and the banding is lossless to distance 5, so
    // the answer is banding-INVARIANT — the oracle verifies it by brute
    // force (pairwise bit_count over the 500 phashes), which also proves
    // m06's banded answer equals the unbanded truth at this scale.
    "m07_phash_pairs_wide" -> QueryDef(
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d), "text", "doc_id")
        graft.operators.Dedup.hammingPairsBlocks(
          Multimodal.perceptualHash(media, "doc_id"), "id", "phash",
          maxDist = 5, bucketCap = graft.operators.Dedup.DefaultBucketCap,
          nBlocks = 7)
      },
      Some(s"""
        WITH pay AS (SELECT doc_id, encode(text) AS payload FROM documents),
        hx AS (SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS nb
               FROM pay),
        tok AS (SELECT doc_id, substr(hx, i*2+1, 8) AS w
                FROM hx, LATERAL (SELECT unnest(range(0, greatest(nb-3,1))) AS i) t),
        hs AS (SELECT doc_id, list(${PH.sqlMd5_64("w")}) AS hl
               FROM tok GROUP BY doc_id),
        ph AS (SELECT doc_id,
                 CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1
                                                        THEN 1 ELSE -1 END
                                                   for h in hl]) > 0
                                     THEN (1::BIGINT << b) ELSE 0 END
                                for b in range(64)]) AS BIGINT) AS phash
               FROM hs)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 5""")),

    // Incremental media admission (m08): which incoming media payloads
    // sit within Hamming 5 of a perceptual hash ALREADY in the corpus —
    // d16's question for the media stack. Batch chunks band against the
    // EXISTING side's precomputable chunk index only (cap on existing
    // buckets); byte-identical fingerprints bypass banding through a
    // cap-free h64 equi-join. The oracle replays sides, banding, cap,
    // the equal-hash bypass, and the verify bit-for-bit.
    "m08_incremental_phash" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        def phash(df: org.apache.spark.sql.DataFrame) =
          Multimodal.perceptualHash(
            Multimodal.asMediaTable(df, "text", "doc_id"), "doc_id")
        graft.operators.Dedup.hammingPairsAgainst(
          phash(docs.filter(col("doc_id") % 10 =!= 0)),
          phash(docs.filter(col("doc_id") % 10 === 0)),
          "id", "phash", maxDist = 5, nChunks = 6, chunkBits = 10)
      },
      Some(s"""
        WITH pay AS (SELECT doc_id, encode(text) AS payload FROM documents),
        hx AS (SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS nb
               FROM pay),
        tok AS (SELECT doc_id, substr(hx, i*2+1, 8) AS w
                FROM hx, LATERAL (SELECT unnest(range(0, greatest(nb-3,1))) AS i) t),
        hs AS (SELECT doc_id, list(${PH.sqlMd5_64("w")}) AS hl
               FROM tok GROUP BY doc_id),
        ph AS (SELECT doc_id,
                 CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1
                                                        THEN 1 ELSE -1 END
                                                   for h in hl]) > 0
                                     THEN (1::BIGINT << b) ELSE 0 END
                                for b in range(64)]) AS BIGINT) AS phash
               FROM hs),
        phn AS (SELECT doc_id, phash FROM ph WHERE doc_id % 10 <> 0),
        phe AS (SELECT doc_id, phash FROM ph WHERE doc_id % 10 = 0),
        chn AS (SELECT phash, c AS chunk, (phash >> (c * 10)) & 1023 AS chunk_val
                FROM (SELECT DISTINCT phash FROM phn),
                     LATERAL (SELECT unnest(range(0, 6)) AS c) t),
        cape AS (SELECT phash, chunk, chunk_val FROM (
                   SELECT *, count(*) OVER (PARTITION BY chunk, chunk_val) AS sz
                   FROM (SELECT phash, c AS chunk,
                                (phash >> (c * 10)) & 1023 AS chunk_val
                         FROM (SELECT DISTINCT phash FROM phe),
                              LATERAL (SELECT unnest(range(0, 6)) AS c) t))
                 WHERE sz <= ${graft.operators.Dedup.DefaultBucketCap}),
        hv AS (SELECT hn, he, CAST(bit_count(xor(hn, he)) AS BIGINT) AS hamming
               FROM (SELECT DISTINCT n.phash AS hn, e.phash AS he
                     FROM chn n JOIN cape e
                       ON n.chunk = e.chunk AND n.chunk_val = e.chunk_val
                      AND n.phash <> e.phash)
               WHERE bit_count(xor(hn, he)) <= 5)
        SELECT x.doc_id AS id_new, y.doc_id AS id_existing, hv.hamming
        FROM hv JOIN phn x ON x.phash = hv.hn
                JOIN phe y ON y.phash = hv.he
        UNION ALL
        SELECT x.doc_id AS id_new, y.doc_id AS id_existing,
               CAST(0 AS BIGINT) AS hamming
        FROM phn x JOIN phe y ON x.phash = y.phash""")),

    // m09: media fingerprint-index maintenance (r10) — d19's seam for
    // the media stack. The EXISTING (indexed) corpus moves V1→V2 with
    // the d19 version construction (%17=3 slice added, %19=5 slice
    // removed, %13=0 slice's payload revised); the gate maintains V1's
    // (id, phash) state through the snapshot diff — re-running the
    // payload kernel on DELTA items only — and serves m08's admission
    // batch against the MAINTAINED index, while the ORACLE rebuilds the
    // existing side's fingerprints from V2 from scratch. The hash match
    // is the maintenance ≡ rebuild theorem THROUGH the full banded
    // admission pipeline (chunk index + cap + equal-hash bypass).
    "m09_phash_maintenance" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ex = docs.filter(col("doc_id") % 10 === 0)
        val v1e = ex.filter(col("doc_id") % 17 =!= 3)
        val v2e = ex.filter(col("doc_id") % 19 =!= 5)
          .withColumn("text", when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" rev2qq"))).otherwise(col("text")))
        def media(df: org.apache.spark.sql.DataFrame) =
          Multimodal.asMediaTable(df, "text", "doc_id")
        val state1 = Multimodal.perceptualHash(media(v1e), "doc_id")
        val diff = graft.operators.Dedup.snapshotDiff(v1e, v2e,
          "text", "doc_id")
        val maintained = Multimodal.maintainPhashState(state1, diff,
          media(v2e), "doc_id")
        graft.operators.Dedup.hammingPairsAgainst(
          Multimodal.perceptualHash(
            media(docs.filter(col("doc_id") % 10 =!= 0)), "doc_id"),
          maintained,
          "id", "phash", maxDist = 5, nChunks = 6, chunkBits = 10)
      },
      Some(phashMaintenanceOracle)),

    // m10: m09 run as a CONTINUOUS ingest (r11) — the q129 pattern for
    // the media family. The V1→V2 media diff rows (doc_id, payload,
    // status; one row per touched item) stream in micro-batches, and
    // each boundary advances the persisted (id, phash) state with m09's
    // movement: anti-join the batch's touched ids, payload-kernel the
    // batch's delta payloads ONLY. The diff has one row per item, so
    // any file batching is id-disjoint and the drained state equals the
    // one-shot maintenance — which equals a from-scratch rebuild of the
    // V2 fingerprints (m09's theorem), so this gate serves the SAME
    // admission query and shares m09's rebuild oracle verbatim. State
    // versions are batchId-keyed pure functions of the previous version
    // (restart-idempotent, spec'd in ContinuousIndexMaintenanceSpec).
    "m10_continuous_phash" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ex = docs.filter(col("doc_id") % 10 === 0)
        val v1e = ex.filter(col("doc_id") % 17 =!= 3)
        def media(df: org.apache.spark.sql.DataFrame) =
          Multimodal.asMediaTable(df, "text", "doc_id")
        val dir = stageMediaDiffDir(s, d)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("status",
            org.apache.spark.sql.types.StringType)))
        val stream = s.readStream
          .option("maxFilesPerTrigger", "2") // 4 staged files → 2 boundaries
          .schema(schema).parquet(dir.toString)
        val run = graft.streaming.ContinuousIndexMaintenance
          .continuousPhash(s,
            Multimodal.perceptualHash(media(v1e), "doc_id")
              .localCheckpoint(),
            stream, "doc_id")
        graft.operators.Dedup.hammingPairsAgainst(
          Multimodal.perceptualHash(
            media(docs.filter(col("doc_id") % 10 =!= 0)), "doc_id"),
          run.state,
          "id", "phash", maxDist = 5, nChunks = 6, chunkBits = 10)
      },
      Some(phashMaintenanceOracle)),


    "m03_frame_sampling" -> QueryDef(
      (s, d) => {
        val media = Multimodal.asMediaTable(Tables.documents(s, d), "text", "doc_id")
        Multimodal.sampleFrames(Multimodal.decodeFeatures(media, "doc_id"),
          "doc_id", everyK = 4)
      },
      Some("""
        WITH n AS (SELECT doc_id,
                     1 + CAST(('0x' || substr(md5(text), 9, 2)) AS INTEGER) % 64 AS n_frames
                   FROM documents)
        SELECT doc_id, CAST(frame AS BIGINT) AS frame
        FROM n, LATERAL (SELECT unnest(range(0, n_frames)) AS frame) t
        WHERE frame % 4 = 0"""))
  )

  /** The m09/m10 rebuild oracle: fingerprints of the V2 existing side
    * rebuilt FROM SCRATCH (no maintenance anywhere), then the full
    * banded admission pipeline (chunk index + cap + equal-hash bypass)
    * against the fresh side — the maintenance ≡ rebuild theorem for
    * both the one-shot (m09) and continuous (m10) forms.
    */
  private lazy val phashMaintenanceOracle: String = s"""
        WITH paye AS (SELECT doc_id,
                        encode(CASE WHEN doc_id % 13 = 0
                                    THEN text || ' rev2qq' ELSE text END)
                          AS payload
                      FROM documents
                      WHERE doc_id % 10 = 0 AND doc_id % 19 <> 5),
        payn AS (SELECT doc_id, encode(text) AS payload FROM documents
                 WHERE doc_id % 10 <> 0),
        pay AS (SELECT * FROM paye UNION ALL SELECT * FROM payn),
        hx AS (SELECT doc_id, hex(payload) AS hx, octet_length(payload) AS nb
               FROM pay),
        tok AS (SELECT doc_id, substr(hx, i*2+1, 8) AS w
                FROM hx, LATERAL (SELECT unnest(range(0, greatest(nb-3,1))) AS i) t),
        hs AS (SELECT doc_id, list(${PH.sqlMd5_64("w")}) AS hl
               FROM tok GROUP BY doc_id),
        ph AS (SELECT doc_id,
                 CAST(list_sum([CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1
                                                        THEN 1 ELSE -1 END
                                                   for h in hl]) > 0
                                     THEN (1::BIGINT << b) ELSE 0 END
                                for b in range(64)]) AS BIGINT) AS phash
               FROM hs),
        phn AS (SELECT doc_id, phash FROM ph WHERE doc_id % 10 <> 0),
        phe AS (SELECT doc_id, phash FROM ph WHERE doc_id % 10 = 0),
        chn AS (SELECT phash, c AS chunk, (phash >> (c * 10)) & 1023 AS chunk_val
                FROM (SELECT DISTINCT phash FROM phn),
                     LATERAL (SELECT unnest(range(0, 6)) AS c) t),
        cape AS (SELECT phash, chunk, chunk_val FROM (
                   SELECT *, count(*) OVER (PARTITION BY chunk, chunk_val) AS sz
                   FROM (SELECT phash, c AS chunk,
                                (phash >> (c * 10)) & 1023 AS chunk_val
                         FROM (SELECT DISTINCT phash FROM phe),
                              LATERAL (SELECT unnest(range(0, 6)) AS c) t))
                 WHERE sz <= ${graft.operators.Dedup.DefaultBucketCap}),
        hv AS (SELECT hn, he, CAST(bit_count(xor(hn, he)) AS BIGINT) AS hamming
               FROM (SELECT DISTINCT n.phash AS hn, e.phash AS he
                     FROM chn n JOIN cape e
                       ON n.chunk = e.chunk AND n.chunk_val = e.chunk_val
                      AND n.phash <> e.phash)
               WHERE bit_count(xor(hn, he)) <= 5)
        SELECT x.doc_id AS id_new, y.doc_id AS id_existing, hv.hamming
        FROM hv JOIN phn x ON x.phash = hv.hn
                JOIN phe y ON y.phash = hv.he
        UNION ALL
        SELECT x.doc_id AS id_new, y.doc_id AS id_existing,
               CAST(0 AS BIGINT) AS hamming
        FROM phn x JOIN phe y ON x.phash = y.phash"""

  /** m10's staged stream source: the V1→V2 snapshot-diff of the
    * EXISTING media corpus as (doc_id, payload, status) rows — payload
    * = the NEW bytes for added/changed, null for removed; unchanged
    * rows excluded — in 4 parquet files. The diff emits ONE row per
    * item, so any file batching is id-disjoint. Restaged when
    * documents.parquet changes (the stageDiffDir pattern).
    */
  private def stageMediaDiffDir(s: org.apache.spark.sql.SparkSession,
      d: String): java.nio.file.Path =
    Staging.stageIfStale(d, "media_diff_stream4", "documents.parquet") { dir =>
      val ex = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
      val v1e = ex.filter(col("doc_id") % 17 =!= 3)
      val v2e = ex.filter(col("doc_id") % 19 =!= 5)
        .withColumn("text", when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" rev2qq"))).otherwise(col("text")))
      graft.operators.Dedup.snapshotDiff(v1e, v2e, "text", "doc_id")
        .filter(col("status") =!= "unchanged")
        .join(v2e.select(col("doc_id"), col("text")),
          col("id") === col("doc_id"), "left")
        .select(col("id").as("doc_id"),
                col("text").cast("binary").as("payload"), col("status"))
        .repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
    }
}
