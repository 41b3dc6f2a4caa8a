package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable percentile rollup over an integer-exact HDR-style
  * histogram — the quantile analog of q88's HLL sketch rollup, with a
  * strictly stronger verification story: where KLL/GK sketches are
  * merge-order-dependent (Spark's combine order varies run to run, so
  * their estimates can drift between reruns) and their internals defy a
  * SQL oracle, this histogram is a vector of INTEGER bucket counts whose
  * merge is a commutative sum — order-free, bit-deterministic, and every
  * stage (bucketing, rollup, extraction) replays in DuckDB.
  *
  * Bucketing (HdrHistogram-style log buckets, pure integer bit math —
  * no ln/log2 floats): for a non-negative long v with bit length L
  * (= length of its binary string, an exact integer both engines
  * compute identically), shift b = max(L − (SubBucketBits+1), 0) and
  * sub-index q = v >> b. Values below 2^(s+1) are exact (b = 0);
  * larger values land in [q·2^b, (q+1)·2^b), so the relative bucket
  * width — and therefore the quantile bracket — is ≤ 2^−SubBucketBits
  * (s = 5 ⇒ ≤ 3.2%). Distinct buckets ≤ (64−s)·2^s ≈ 2k regardless of
  * row count.
  *
  * 100 TB shape: the histogram build is ONE map-side-combined aggregate
  * keyed (grain, bucket) — ≤2k rows per grain cross the shuffle, never
  * values. Any coarser grain (day→month→all) is a count-sum over
  * histogram rows: the raw corpus is never rescanned, the exact
  * replayable twin of production latency-percentile pipelines
  * (HdrHistogram / Prometheus buckets). Extraction reports the
  * BRACKETING contract: for each requested p, the bucket [lo, hi]
  * containing rank ⌈p·n⌉ — the true percentile provably lies inside.
  */
object QuantileRollup {

  /** Sub-bucket resolution bits: 2^5 = 32 sub-buckets per octave ⇒
    * bucket relative width ≤ 1/32.
    */
  val SubBucketBits: Int = 5

  /** Integer HDR histogram of `valueCol` (non-negative LONG) per grain:
    * (grainCols…, bucket_lo, bucket_hi, cnt).
    */
  def histogram(df: DataFrame, valueCol: String, grainCols: Seq[String]): DataFrame = {
    val s = SubBucketBits
    val withBucket = df
      // loud guard on the non-negative contract: a negative long's
      // two's-complement bin() has length 64, so it would land in an
      // arithmetic-shift bucket whose [lo, hi] does NOT bracket the
      // value — silently wrong output. Fail per-row instead (the
      // labelPropagation zero-clamp convention).
      .withColumn("__v",
        when(col(valueCol) < 0,
          raise_error(concat(
            lit(s"QuantileRollup.histogram: negative value in '$valueCol' " +
              "violates the non-negative LONG contract: "),
            col(valueCol).cast("string"))).cast("long"))
          .otherwise(col(valueCol).cast("long")))
      .withColumn("__b",
        greatest(length(bin(col("__v"))) - lit(s + 1), lit(0)).cast("int"))
      // hi = lo + (2^b - 1): never overflows for v >= 0 (the naive
      // ((q+1) << b) - 1 wraps past Long.Max in the top octave)
      .withColumn("bucket_lo", expr("shiftleft(shiftright(__v, __b), __b)"))
      .withColumn("bucket_hi",
        expr("shiftleft(shiftright(__v, __b), __b) + (shiftleft(1L, __b) - 1L)"))
    withBucket.groupBy(grainCols.map(col) :+ col("bucket_lo") :+ col("bucket_hi"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram rows to a coarser grain: a pure integer count-sum —
    * never touches the raw data, commutative so any partitioning/order
    * lands on the identical result.
    */
  def rollup(hist: DataFrame, coarserGrainCols: Seq[String]): DataFrame =
    hist.groupBy(
        coarserGrainCols.map(col) :+ col("bucket_lo") :+ col("bucket_hi"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Percentile brackets from a histogram: for each grain and each p in
    * `ps`, the bucket [lo, hi] containing rank ⌈p·n⌉ (1-based over the
    * sorted multiset). True percentile ∈ [est_lo, est_hi] by
    * construction. One window over ≤2k bucket rows per grain.
    */
  def percentiles(hist: DataFrame, grainCols: Seq[String],
                  ps: Seq[Double]): DataFrame = {
    // p ≤ 0 would silently match no bucket (target_rank 0 is below every
    // cum count) and the percentile would just vanish from the output
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"percentiles needs every p in (0, 1], got ${ps.mkString(", ")}")
    import org.apache.spark.sql.expressions.Window
    val g = grainCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("bucket_lo"))
    val cum = hist
      .groupBy(g :+ col("bucket_lo") :+ col("bucket_hi"): _*)
      .agg(sum(col("cnt")).as("cnt")) // accept day-grain rows: merge here
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(g: _*)))
    val pExpr = explode(array(ps.map(lit): _*)).as("p")
    cum.select(g :+ col("bucket_lo") :+ col("bucket_hi") :+ col("cnt") :+
        col("cum") :+ col("n") :+ pExpr: _*)
      .withColumn("target_rank", ceil(col("p") * col("n")).cast("long"))
      .filter(col("cum") >= col("target_rank") &&
        col("cum") - col("cnt") < col("target_rank"))
      .select(g :+ col("p") :+ col("bucket_lo").as("est_lo") :+
        col("bucket_hi").as("est_hi") :+ col("n"): _*)
  }
}
