package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring (PageRank) in exact integer fixed-point.
  *
  * The LLM-pipeline use: rank crawl domains / hosts by link authority and
  * feed the rank into source-quality weighting (the Common-Crawl-style
  * "which domains deserve crawl budget and mixture weight" signal that
  * sits next to the classifier score t21 and the source caps t22).
  *
  * Why integer fixed-point instead of textbook double arithmetic: a
  * float PageRank sums per-target contributions across partitions, and
  * cross-partition float addition order is engine- and run-dependent —
  * the same argument that keeps t27's later GD iterations rows-only.
  * Representing rank in integer micro-units (`totalUnits` = 1e9 per unit
  * of probability mass) makes every operation exact: integer division
  * for the per-edge contribution, an order-independent Long sum for the
  * in-flow, and integer damping `base + (dampNum·in) div dampDen`. Two
  * independent engines — and two different partitionings of the same
  * engine — produce bit-identical ranks, so the whole K-iteration
  * computation is hash-oracled AND reproducible at 100 TB (a re-run on a
  * different cluster layout cannot drift). The cost is a documented,
  * bounded mass leak: each integer division drops < 1 unit (1e-9) per
  * edge/node per iteration, plus dangling nodes (no out-edges) absorb
  * their mass — both irrelevant at ranking granularity and both part of
  * the operator's exact contract, not numerical noise.
  *
  * Scale shape: the edge list is deduplicated, joined with out-degrees,
  * and materialized ONCE (localCheckpoint), repartitioned by src so
  * every iteration reuses the same layout. Per iteration the work is
  * one join of the (node, rank) table against the edges on src — ranks
  * are one row per NODE (domains: millions), so Catalyst broadcasts
  * them against the edge scan at any corpus scale where nodes ≪ edges —
  * plus ONE map-side-combined Long-sum shuffle keyed by dst. Rank
  * lineage is truncated per iteration, so iteration N's plan stays
  * O(1). Driver state: two scalars (node count, derived constants).
  *
  * Reference analog: none — the reference has no graph operators; this
  * extends the §2c curation stack (SURVEY §2c, cf. Brin & Page 1998 and
  * the crawl-frontier ranking in Common Crawl's cc-pagerank datasets).
  */
object GraphRank {

  /** Default total probability mass in integer units: 1e9 ⇒ ranks are
    * exact to a nano of probability mass.
    */
  val DefaultUnits: Long = 1000000000L

  /** PageRank over a directed edge list, `iterations` exact fixed-point
    * rounds at damping `dampNum/dampDen` (default 85/100).
    *
    * Node set = distinct(src) ∪ distinct(dst); parallel edges collapse
    * (the standard unweighted formulation). Every node starts at
    * `totalUnits div N`. Per round, node v receives
    * `base + (dampNum · Σ_{u→v} (r_u div outdeg_u)) div dampDen` where
    * `base = ((dampDen−dampNum) · totalUnits) div (dampDen · N)`.
    * Dangling mass is dropped (contract — see class doc).
    *
    * Returns (node LONG, rank_units LONG, rank DOUBLE) with
    * `rank = round(rank_units / totalUnits, 6)`.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5,
               dampNum: Long = 85, dampDen: Long = 100,
               totalUnits: Long = DefaultUnits): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen)
    // dedup + materialize the edge lineage exactly once; repartition by
    // src so each iteration's rank join reuses the layout
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // driver scalar: one Long
    require(n > 0, "pageRank on an empty edge list")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the per-iteration join input, materialized once
    val eo = e.join(outdeg, "src").localCheckpoint()

    val r0 = totalUnits / n
    val base = ((dampDen - dampNum) * totalUnits) / (dampDen * n)

    var ranks = nodes.withColumn("r", lit(r0))
    var i = 0
    while (i < iterations) {
      // integer per-edge contribution: exact, order-free
      val inSum = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("insum")) // Long sum: order-independent
      ranks = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$dampNum * coalesce(insum, 0L) div $dampDen"))
            .as("r"))
        .localCheckpoint() // truncate lineage so round N's plan is O(1)
      i += 1
    }
    ranks.select(col("node"), col("r").as("rank_units"),
      round(col("r") / lit(totalUnits.toDouble), 6).as("rank"))
  }
}
