package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution). The scale contract:
  * NEVER score raw-row pairs. Rows first collapse to distinct attribute
  * values with counts (for a 100 TB corpus of names this is orders of
  * magnitude smaller than the row count), pairwise edit distance runs
  * only on distinct values within a blocking key, and row-level match
  * cardinality is recovered arithmetically (cnt_a × cnt_b) — the
  * classic dedupe/record-linkage architecture re-expressed as three
  * aggregates and one blocked self-join.
  */
object EntityResolution {

  /** Fuzzy value pairs: distinct values of `attrCol`, blocked by
    * `blockCol` (both expressions over the input), scored with
    * Levenshtein, kept when distance ∈ [1, maxDist]. Emits one row per
    * (value_a < value_b) pair with the implied row-pair count.
    */
  def blockedFuzzyPairs(df: DataFrame, attrCol: String, blockCol: String,
                        maxDist: Int): DataFrame = {
    val vals = df.groupBy(col(blockCol).as("blk"), col(attrCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
    vals.as("a").join(vals.as("b"),
        col("a.blk") === col("b.blk") && col("a.value") < col("b.value"))
      .withColumn("lev",
        levenshtein(col("a.value"), col("b.value")).cast("long"))
      .filter(col("lev") >= 1 && col("lev") <= maxDist)
      .select(col("a.blk").as("block"),
              col("a.value").as("value_a"), col("b.value").as("value_b"),
              col("lev"), (col("a.cnt") * col("b.cnt")).as("n_row_pairs"))
  }
}
