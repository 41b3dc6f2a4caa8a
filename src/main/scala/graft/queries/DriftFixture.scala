package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** THE drift corpus fixture — the single definition of the V1/V2
  * snapshot predicates and the s29 slice split that the retrain-family
  * gates (s25/s28/s29), their stream staging, and the margin probe
  * ([[graft.DriftProbe]]) all share. Hoisted (r14, on advice) because
  * the %17/%19/%13/%52 predicates were hand-duplicated across those
  * sites: the measured margins backing the s29 drift trigger
  * (DriftMovedNumer/Denom) are margins OF THIS SPLIT, so an edit to a
  * stray copy could silently diverge what the probe measures from what
  * the gate stages. The DuckDB oracles necessarily restate the
  * predicates in SQL — the hash gate is what pins those copies.
  */
private[graft] object DriftFixture {

  /** V1 = the pre-drift snapshot: every ~17th vector is not yet there
    * (so V1→V2 has adds on the other side too).
    */
  def v1(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 17 =!= 3)

  /** V2 = the post-drift snapshot: every ~19th vector removed, and —
    * the drift that MOVES assignments while preserving dist2 on this
    * origin-symmetric corpus — every 13th embedding sign-flipped.
    */
  def v2(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 19 =!= 5)
      .withColumn("embedding", when(col("vec_id") % 13 === 0,
        transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))

  /** The V1→V2 diff as (vec_id, embedding, status) rows — embedding =
    * the NEW value for added/changed, null for removed; unchanged rows
    * excluded. Checkpointed: it is sliced multiple ways downstream.
    */
  def diff(v1Snap: DataFrame, v2Snap: DataFrame): DataFrame =
    Similarity.vectorSnapshotDiff(v1Snap, v2Snap, "embedding", "vec_id")
      .filter(col("status") =!= "unchanged")
      .join(v2Snap.select(col("vec_id"), col("embedding")),
        col("id") === col("vec_id"), "left")
      .select(col("id").as("vec_id"), col("embedding"), col("status"))
      .localCheckpoint()

  /** s29's four-slice split of [[diff]] BY KIND, in delivery order:
    * slice 0 the even-id adds (0% moved); slice 1 the odd-id adds PLUS
    * a quarter of the changed rows (vec_id%52 = 13 — enough drift to
    * MEASURE, ~39%, not enough to trigger at 3/5); slice 2 the
    * remaining changed (negated) rows (100% moved → the trigger);
    * slice 3 the removals (delta-empty, measures nothing).
    */
  def s29Slices(d: DataFrame): Seq[DataFrame] = Seq(
    d.filter(col("status") === "added" &&
      pmod(col("vec_id"), lit(2L)) === 0),
    d.filter((col("status") === "added" &&
        pmod(col("vec_id"), lit(2L)) === 1) ||
      (col("status") === "changed" &&
        pmod(col("vec_id"), lit(52L)) === 13)),
    d.filter(col("status") === "changed" &&
      pmod(col("vec_id"), lit(52L)) =!= 13),
    d.filter(col("status") === "removed"))
}

/** THE list-SKEW fixture (s30) — the single definition of the staged
  * hot-region corpus the s30 gate rebalances and
  * [[graft.ListSkewProbe]] measures (the [[DriftFixture]] convention:
  * one predicate definition, margins measured OF that definition).
  * The suite corpus's own k-means lists are balanced within ~1.2× of
  * average at every SF (probe, r14), so skew is staged as the drift
  * mode it models: AFTER the codebook trained, half the corpus
  * collapsed toward the origin — every odd-id embedding scaled by the
  * dyadic 1/64 (exact in float AND double, so both engines quantize
  * the identical value) — and the stale quantizer concentrates the
  * whole hot region into its smallest-norm list(s). Assignments are
  * all FRESH argmaxes (moved-share drift is s29's axis; this is the
  * orthogonal one), yet the census is pathological — the skew a
  * rebalance, not a retrain, repairs.
  */
private[graft] object SkewFixture {

  /** The post-drift corpus: odd-id vectors ×1/64, even-id unchanged. */
  def skewed(emb: DataFrame): DataFrame =
    emb.withColumn("embedding",
      when(pmod(col("vec_id"), lit(2L)) === 1,
        transform(col("embedding"), x => x * lit(0.015625f)))
        .otherwise(col("embedding")))

  /** s34's three-slice CONTINUOUS form of the same skew event, by
    * kind and in delivery order: slice 0 removals (vec_id%101 = 7 —
    * the census dips a sliver, no trigger); slice 1 the hot-region
    * collapse itself (every PRESENT odd id ×1/64 — the census
    * crossing the monitor must catch); slice 2 a tiny post-split
    * maintenance delta (present %250 = 0 ids negated — landed under
    * the EXPANDED codebook, and small enough that the settled census
    * stays settled: the measured post-split children sit ≥ 5% under
    * the bar at every SF with ≤ 8 slice-2 rows to absorb). Slices are
    * id-disjoint by construction (odd / even-%250), so any batching
    * is legal; one row per id per slice.
    */
  def s34Slices(emb: DataFrame): Seq[DataFrame] = {
    val removed = col("vec_id") % 101 === 7
    Seq(
      emb.filter(removed).select(col("vec_id"),
        lit(null).cast("array<float>").as("embedding"),
        lit("removed").as("status")),
      emb.filter(!removed && pmod(col("vec_id"), lit(2L)) === 1)
        .select(col("vec_id"),
          transform(col("embedding"), x => x * lit(0.015625f))
            .as("embedding"),
          lit("changed").as("status")),
      emb.filter(!removed && col("vec_id") % 250 === 0)
        .select(col("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"),
          lit("changed").as("status")))
  }

  /** s36's three-slice CENSUS-then-DRIFT composition — both monitors
    * live in one stream, each catching the boundary built for it, the
    * second deciding UNDER THE FIRST'S GROWN CODEBOOK. In delivery
    * order: slice 0 removals (%101 = 7 — the census dips a sliver,
    * neither monitor triggers); slice 1 the hot clump as ADDITIONS —
    * every present odd-id embedding collapsed ×1/64 and re-landed
    * under a FRESH id (vec_id + 10⁹ — past any ScaleProbe copy shift,
    * whose c·10⁷ id offsets would otherwise collide with the clump and
    * turn the additions into changes): an added row has no stored seat,
    * so the drift monitor's moved-share reads EXACTLY 0 (the
    * composition's load-bearing trick — the same hot-region event
    * staged as changes would trip drift first, s34's scaladoc note)
    * while the census absorbs the clump into the origin-nearest lists
    * and crosses the split bar → the census monitor cuts and versions
    * the EXPANDED codebook; slice 2 negations of the present %10 = 0
    * ids — a negated vector's exact-integer argmax flips lists
    * (negation reverses every dot), so the drift monitor — measuring
    * against the RANK-CHUNKED post-cut state under the GROWN codebook
    * — reads ~100% moved-share and retrains. Slices are id-disjoint
    * (removed / fresh 10⁹-offset odd / present %10) — any batching is
    * legal; one row per id per slice.
    */
  def censusThenDriftSlices(emb: DataFrame): Seq[DataFrame] = {
    val removed = col("vec_id") % 101 === 7
    Seq(
      emb.filter(removed).select(col("vec_id"),
        lit(null).cast("array<float>").as("embedding"),
        lit("removed").as("status")),
      emb.filter(!removed && pmod(col("vec_id"), lit(2L)) === 1)
        .select((col("vec_id") + lit(1000000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(0.015625f))
            .as("embedding"),
          lit("added").as("status")),
      emb.filter(!removed && col("vec_id") % 10 === 0)
        .select(col("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"),
          lit("changed").as("status")))
  }
}

/** THE norm-collapse fixture (s41, r17) — the staged event the
  * tripwire-with-recovery gate drains and the recovery recall probe
  * measures (the [[DriftFixture]] convention: one predicate
  * definition). The suite embeddings are ~unit-norm (measured N2
  * envelope ratio ≈ 1 at every SF), so the margins are structural:
  * slice 0's ×2 widens the N2 envelope to ~4× — under the gate's 8/1
  * norm bar (64× in N2) by 16×; slice 1's ×1/64 collapse drops minN2
  * ~4096× — over the bar by ≥ 64× regardless of slice 0. Every
  * transform is a dyadic float scale or a negation: exact in float
  * AND double, so both engines quantize identical values. Slices are
  * id-disjoint by construction (the %13/%11/%23 guards), so any
  * batching is legal and the oracle's CASE needs no priority order.
  * In delivery order:
  *   slice 0 — benign natural-scale variation (%23 = 1 ids ×2): the
  *     envelope widens, NO flag — the tripwire must not cry wolf;
  *   slice 1 — the collapse (%11 = 4 ids ×1/64): flags → the recovery
  *     boundary (normalized two-stage retrain + full re-encode);
  *   slice 2 — post-recovery maintenance (%13 = 6 ids negated):
  *     delta-encoded in the NORMALIZED space under the recovery
  *     codebooks.
  */
private[graft] object NormFixture {
  private val s2 = col("vec_id") % 13 === 6
  private val s1 = col("vec_id") % 11 === 4 && !s2
  private val s0 = col("vec_id") % 23 === 1 && !s1 && !s2

  def slices(emb: DataFrame): Seq[DataFrame] = Seq(
    emb.filter(s0).select(col("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"),
      lit("changed").as("status")),
    emb.filter(s1).select(col("vec_id"),
      transform(col("embedding"), x => x * lit(0.015625f)).as("embedding"),
      lit("changed").as("status")),
    emb.filter(s2).select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"),
      lit("changed").as("status")))

  /** The corpus AFTER slice k (0-based), for probes/specs that need the
    * boundary corpora offline. */
  def corpusAfter(emb: DataFrame, k: Int): DataFrame = {
    val base = col("embedding")
    val v = k match {
      case 0 => when(s0, transform(base, x => x * lit(2.0f))).otherwise(base)
      case 1 => when(s1, transform(base, x => x * lit(0.015625f)))
        .when(s0, transform(base, x => x * lit(2.0f))).otherwise(base)
      case _ => when(s2, transform(base, x => -x))
        .when(s1, transform(base, x => x * lit(0.015625f)))
        .when(s0, transform(base, x => x * lit(2.0f))).otherwise(base)
    }
    emb.select(col("vec_id"), v.as("embedding"))
  }
}
