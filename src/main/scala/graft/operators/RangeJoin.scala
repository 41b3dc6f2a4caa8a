package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) point-in-interval range join.
  *
  * Spark plans an inequality-only join condition as a
  * BroadcastNestedLoopJoin — O(points × intervals) comparisons, a
  * scale-killer the moment neither side fits in memory. Banding turns it
  * into an EQUI-join Catalyst can shuffle-hash/sort-merge:
  *
  *   1. pick a band width W (≈ the typical interval length);
  *   2. each point maps to ONE bucket floor(p/W);
  *   3. each interval explodes to its covered buckets
  *      floor(start/W)..floor(end/W) — ⌈len/W⌉+1 rows, not a cross
  *      product;
  *   4. equi-join on bucket, then filter the exact range predicate.
  *
  * Every (point, interval) match meets in exactly one bucket (the
  * point's), so no dedup is needed. Shuffle volume is
  * O(points + intervals·avgLen/W); per-bucket work is local and AQE can
  * split skewed buckets. This is the standard bucketed interval-join
  * scheme (cf. interval trees / Bloom-free range joins in the join
  * literature; the reference has no join operators at all — SURVEY §2b).
  */
object RangeJoin {

  /** Join `points` to `intervals` where
    * `points(pointCol) ∈ [intervals(startCol), intervals(endCol)]`
    * (inclusive both ends, SQL BETWEEN semantics). The three columns must
    * be numeric (callers convert timestamps to epoch seconds/days first);
    * magnitudes must stay under 2⁵² (bucket ids compute via double
    * division). Returns all columns of both inputs; malformed intervals
    * (end < start) are dropped, matching BETWEEN's empty result.
    */
  def banded(points: DataFrame, intervals: DataFrame,
             pointCol: String, startCol: String, endCol: String,
             bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val bucket = "__graft_bucket"
    val p = points.withColumn(bucket,
      floor(col(pointCol) / bandWidth).cast("long"))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn(bucket, explode(sequence(
        floor(col(startCol) / bandWidth).cast("long"),
        floor(col(endCol) / bandWidth).cast("long"))))
    p.join(iv, Seq(bucket))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(bucket)
  }
}
