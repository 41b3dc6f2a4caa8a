package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque BinaryType columns
  * with a typed metadata struct, plus a decode/feature-extract stage.
  *
  * The decode kernel is a per-partition batch operator (mapPartitions over
  * a typed iterator — the Scala analog of mapInPandas): payload bytes in,
  * fixed-schema feature struct out. Real image/audio codecs are not in
  * this container, so `StubDecoder.decode` derives deterministic fake
  * features from the payload's MD5 — the Spark-side plumbing (schema,
  * batching, partitioning) is real and tested; swap `decode` for a JNI/
  * javax.imageio call in production.
  *
  * Scale notes: payloads never pass through a shuffle — ingest partitions
  * map 1:1 to decode partitions; only extracted features (tiny structs)
  * flow onward. For very large media, store pointers (path + range) and
  * load in the decode kernel instead of materializing bytes in the row.
  */
object Multimodal {

  /** Wrap a text corpus as a multimodal table: opaque binary payload +
    * metadata struct (media_type, byte_len, checksum) — the engine's
    * binary-column data model.
    */
  def asMediaTable(df: DataFrame, payloadSource: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      col(payloadSource).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        length(col(payloadSource).cast("binary")).cast("long").as("byte_len"),
        md5(col(payloadSource).cast("binary")).as("checksum")).as("meta"))

  /** The feature schema every decoder emits. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("brightness", DoubleType, nullable = false)))

  /** Deterministic stand-in for a media codec: features derived from the
    * payload checksum (STUB — see class doc).
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Double) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def u8(i: Int): Int = h(i) & 0xff
      val width = 1 + (u8(0) << 8 | u8(1)) % 2048
      val height = 1 + (u8(2) << 8 | u8(3)) % 2048
      val nFrames = 1 + u8(4) % 64
      val brightness = u8(5).toDouble / 255.0
      (width, height, nFrames, brightness)
    }
  }

  /** Batch decode: per-partition kernel keeping the iterator lazy (no
    * partition materialization), emitting id + decoded feature struct.
    */
  def decodeFeatures(media: DataFrame, idCol: String): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", featureSchema, nullable = false)))
    val rdd = media.select(col(idCol).cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, f, b) = StubDecoder.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), Row(w, h, f, b))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize planning over decoded features: scale (width, height) so the
    * longest side equals `maxDim`, preserving aspect ratio (never
    * upscales). Pure integer column math — codegen'd, no kernel pass; the
    * actual pixel resample belongs in the decode kernel (StubDecoder here)
    * and would consume this plan's target dims.
    */
  def resizePlan(decoded: DataFrame, idCol: String, maxDim: Int): DataFrame = {
    val w = col("features.width")
    val h = col("features.height")
    val longest = greatest(w, h)
    val scale = when(longest > maxDim, lit(maxDim).cast("double") / longest)
      .otherwise(lit(1.0))
    decoded.select(
      col(idCol),
      w.cast("long").as("width"),
      h.cast("long").as("height"),
      greatest(floor(w * scale), lit(1)).cast("long").as("out_width"),
      greatest(floor(h * scale), lit(1)).cast("long").as("out_height"),
      round(scale, 6).as("scale"))
  }

  /** Perceptual hash over an opaque media payload: SimHash of the
    * payload's byte 4-gram shingles (the ssdeep-style content-defined
    * fuzzy hash — small payload edits flip few fingerprint bits, so
    * near-identical media land at small Hamming distance). This IS the
    * real operator for opaque binaries; for decoded images, production
    * swaps the shingle features for DCT low-frequency coefficients of
    * the luma plane (classic pHash) — everything downstream (vote
    * aggregate, banding, verify) is feature-agnostic.
    *
    * Scale: one explode of (id, shingle-hash) — ~1 row per payload
    * byte, never the payload itself — into the same single-pass 64-bit
    * vote aggregate as text SimHash. Engine-portable: shingles are hex
    * substrings and hashes are MD5-derived, so the DuckDB oracle
    * replays the fingerprint bit-for-bit.
    */
  def perceptualHash(media: DataFrame, idCol: String): DataFrame =
    media.select(col(idCol).as("id"),
      graft.functions.ByteShingleSimHash.of(col("payload")).as("phash"))

  /** m09: the media fingerprint table kept current across corpus
    * versions — d19's maintenance seam for the media stack, where
    * skipping the unchanged corpus matters MOST: the per-item cost is
    * the payload-byte kernel (a full media decode in production), so
    * maintenance must never touch an unchanged payload. State = the
    * (id, phash) table [[perceptualHash]] emits — one row per item, no
    * capping question here (m08's chunk index + cap DERIVE from this
    * table inside `hammingPairsAgainst`, identically whether the table
    * was maintained or rebuilt). Maintenance = one broadcastable
    * anti-join on the touched ids + the kernel over DELTA payloads only
    * (hash-only semi-join selects them); contract (spec-asserted AND
    * hash-oracled through the m09 gate, whose oracle REBUILDS the
    * existing side from V2): maintained ≡ `perceptualHash(V2)`
    * row-for-row, hence any admission served from it ≡ served from a
    * rebuild.
    */
  def maintainPhashState(state: DataFrame, diff: DataFrame,
                         newMedia: DataFrame, idCol: String): DataFrame =
    IndexMaintenance.upsert(state, diff, newMedia, idCol)(
      perceptualHash(_, idCol))

  /** The original exploded formulation of [[perceptualHash]] — ~1 row
    * per payload byte shuffled into the shared 64-way vote aggregate.
    * Kept as the reference the single-loop kernel is spec-asserted
    * bit-identical against (MultimodalSpec); the kernel replaced it on
    * the hot path because the explode shipped ~15M rows at sf0.1 for a
    * value that is a pure per-row function of the payload.
    */
  private[graft] def perceptualHashExploded(media: DataFrame, idCol: String): DataFrame = {
    val hx = hex(col("payload")) // 2 hex chars per byte, uppercase
    val nGrams = greatest((length(col("payload")) - 3).cast("int"), lit(1))
    val tok = media.select(col(idCol).as("id"),
        explode(transform(sequence(lit(0), nGrams - 1),
          i => hx.substr(i * 2 + 1, lit(8)))).as("w"))
      .withColumn("h", graft.functions.PortableHash.md5_64(col("w")))
    Dedup.simhashFromHashes(tok).withColumnRenamed("simhash", "phash")
  }

  /** Media near-duplicate pairs: banded Hamming join over the
    * perceptual hashes, lossless to distance 5 (byte-level shingles
    * tolerate a wider radius than word-level SimHash before
    * false-positive rates matter; verify is exact either way). Band
    * width is CORPUS-DERIVED ([[Dedup.hammingPairsAuto]]): small corpora
    * keep the oracled 6×10-bit chunking, larger ones widen the join keys
    * via block-combination banding so buckets stop cap-saturating.
    */
  def phashPairs(media: DataFrame, idCol: String, maxDist: Int = 5,
                 bucketCap: Int = Dedup.DefaultBucketCap): DataFrame =
    Dedup.hammingPairsAuto(perceptualHash(media, idCol), "id", "phash",
      maxDist, bucketCap)

  /** "Frame sampling" over a decoded media table: explode n_frames into
    * per-frame rows, keeping every k-th frame — the video-pipeline shape.
    */
  def sampleFrames(decoded: DataFrame, idCol: String, everyK: Int): DataFrame =
    decoded
      .select(col(idCol), col("features.n_frames").as("n_frames"))
      .withColumn("frame", explode(sequence(lit(0), col("n_frames") - 1)))
      .filter(col("frame") % everyK === 0)
      .select(col(idCol), col("frame").cast("long").as("frame"))
}
