package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Scale design: brute-force top-k is the exact baseline — a broadcast of
  * the (small) query set against a full scan of the corpus, per-partition
  * heap via window row_number ≤ k after AQE-coalesced shuffle by query id.
  * The scale path is LSH (random-hyperplane signs): corpus and queries
  * bucketed by signature, candidates only within matching buckets — the
  * corpus shuffle is by bucket key, never all-pairs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * (deterministic left-to-right fold, matching the DuckDB oracle).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(ad, x => x * x), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(bd, x => x * x), lit(0.0), (acc, x) => acc + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (it is broadcast); ties broken by
    * neighbor id for determinism.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("sim"), 6).as("sim"))
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits of projections
    * onto pseudo-random hyperplanes. The hyperplane family is derived from
    * xxhash64(table·nBits + bit, dimension) — deterministic, seedable per
    * hash table, no stored model.
    */
  def lshSignature(vecCol: Column, dim: Int, nBits: Int, table: Int = 0): Column = {
    val vd = vecCol.cast("array<double>")
    (0 until nBits).foldLeft(lit(0L)) { (acc, b) =>
      val proj = aggregate(
        zip_with(vd, sequence(lit(0), lit(dim - 1)),
          (x, i) => x * when(xxhash64(lit(table * nBits + b), i)
            .bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
        lit(0.0), (s, x) => s + x)
      acc.bitwiseOR(when(proj > 0, lit(1L << b)).otherwise(lit(0L)))
    }
  }

  /** Approximate top-k via multi-table LSH: `tables` independent
    * hyperplane families; candidates = union of same-bucket matches across
    * tables, then exact cosine re-rank. Recall grows with `tables`
    * (1-(1-p^nBits)^tables), cost per table is one corpus shuffle key.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
             nBits: Int = 4, tables: Int = 8, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    def buckets(src: DataFrame, id: String, vec: String): DataFrame =
      src.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(array((0 until tables).map(t =>
            lshSignature(col(vecCol), dim, nBits, t)): _*)))
        .toDF(id, vec, "table", "bucket")
    val q = broadcast(buckets(queries, "query_id", "qv"))
    val c = buckets(corpus, "neighbor_id", "cv")
    val cands = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("qv")).as("qv"), first(col("cv")).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    cands
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("sim"), 6).as("sim"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection). */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = corpus.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = corpus.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("sim", cosine(col("v1"), col("v2")))
      .filter(col("sim") >= threshold)
      .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
  }
}
