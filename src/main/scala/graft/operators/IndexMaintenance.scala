package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared incremental index-maintenance seam (r10's d19/m09/s18
  * pattern, factored in r11): a persisted per-id derived state is kept
  * current across corpus versions by
  *
  *   drop-touched → semi-join-fresh → union-kernel
  *
  * - EVERY touched id (removed ∪ changed ∪ added) leaves the kept side —
  *   "added" too, so maintenance is an UPSERT per id and an
  *   at-least-once upstream re-announcing a present id rewrites instead
  *   of silently duplicating state rows (the r9 duplicate-state trap,
  *   closed by design).
  * - The kernel (shingle/signature, payload fingerprint, centroid
  *   argmin, …) runs over DELTA rows only, selected from the new corpus
  *   by a hash-only semi-join — the unchanged corpus is never read
  *   (the family specs prove it by corrupting unchanged payloads).
  * - The rebuild theorem: kept ∪ kernel(delta) ≡ kernel(V_{N+1}) row for
  *   row — each family's gate hash-oracles it against a from-scratch
  *   rebuild.
  *
  * Movement at 100 TB: one broadcastable anti-join on the touched-id
  * set plus the kernel pass over the delta; both bounded by the delta,
  * never the corpus.
  *
  * Instantiations: [[Dedup.maintainMinhashIndex]] (d19/q129),
  * [[Multimodal.maintainPhashState]] (m09),
  * [[Similarity.maintainAssignments]] (s18).
  */
object IndexMaintenance {

  /** Apply the seam: `state` is the per-id derived table (id column
    * literally named "id", the family convention), `diff` a
    * snapshot-diff (id, status ∈ added/removed/changed/unchanged), and
    * `newCorpus` the N+1 source the `kernel` derives fresh rows from —
    * called with exactly the delta (added ∪ changed) rows.
    */
  def upsert(state: DataFrame, diff: DataFrame, newCorpus: DataFrame,
             idCol: String)(kernel: DataFrame => DataFrame): DataFrame = {
    val touched = diff
      .filter(col("status").isin("removed", "changed", "added"))
      .select(col("id"))
    val fresh = diff.filter(col("status").isin("added", "changed"))
      .select(col("id").as("__fresh_id"))
    val kept = state.join(touched, Seq("id"), "left_anti")
    val delta = newCorpus.join(fresh,
      col(idCol) === col("__fresh_id"), "left_semi")
    kept.unionByName(kernel(delta))
  }
}
