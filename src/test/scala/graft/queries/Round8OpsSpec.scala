package graft.queries

import graft.{SparkSpec, Tables}
import graft.operators.{Dedup, GraphRank, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-8 additions: the community-keyed canonical capstone (d17) is a
  * LOSSLESS switch from the component-keyed selection (d10) — same doc
  * coverage, communities strictly refine components, and wherever the
  * two groupings coincide the keeper decisions agree.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  // the d10 pipeline: exact jaccard pairs → connected components
  private lazy val components = Dedup.connectedComponents(
      Dedup.jaccardPairs(docs, "text", "doc_id", shingleN = 3, threshold = 0.8))
    .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // the d17 pipeline: LSH-verified pairs → weighted LPA communities
  private lazy val communities = {
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id",
      k = 32, bands = 8, shingleN = 3, threshold = 0.8)
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"),
      floor(col("jaccard") * 1000000d + 0.5d).cast("long").as("w"))
    GraphRank.labelCommunities(edges, "src", "dst", iterations = 4,
      weightCol = Some("w"), selfWeight = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def canonical(clusters: Map[Long, Long]) = {
    val cl = clusters.toSeq.toDF("id", "component")
    Dedup.canonicalByScore(
      TextAnalysis.qualityMetrics(docs, "text")
        .select(col("doc_id"), col("quality_score")),
      cl, "doc_id", "quality_score")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("lossless switch: d17 covers exactly the docs d10 covers, one keeper row each") {
    val d10 = canonical(components)
    val d17 = canonical(communities)
    d17.keySet shouldBe d10.keySet
    d17.keySet shouldBe docs.select("doc_id").as[Long].collect().toSet
    // every keeper is a member of its own group
    d17.foreach { case (_, (_, canon, _)) => d17.contains(canon) shouldBe true }
  }

  test("communities refine components: every weighted-LPA community sits inside one d10 component") {
    // LSH pairs ⊆ exact pairs and labels only flow along edges, so a
    // community can never straddle two connected components
    communities.nonEmpty shouldBe true
    communities.groupBy(_._2).foreach { case (_, members) =>
      val comps = members.keys
        .map(n => components.getOrElse(n, n)).toSet
      comps.size shouldBe 1
    }
  }

  test("where a component IS a single community, the keeper decision is identical") {
    val d10 = canonical(components)
    val d17 = canonical(communities)
    // group docs by component; when every member carries the SAME
    // community, that community's member set equals the component's
    // (communities refine components, see previous test), so both paths
    // rank the identical pool and must pick the identical keeper
    val byComp = d10.keySet.groupBy(id => components.getOrElse(id, id))
    var checked = 0
    byComp.foreach { case (_, members) =>
      val comms = members.map(id => communities.getOrElse(id, id))
      if (comms.size == 1) {
        members.foreach { id => d17(id) shouldBe d10(id) }
        checked += members.size
      }
    }
    checked should be > 0
  }
}
