package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** s29 margin measurement: for each candidate threshold percentile,
  * print the far-share of each staged drift slice (adds %2=0, adds
  * %2=1, negated changes, removals are delta-empty) under the V1
  * codebook — the evidence behind SimilarityQueries.DriftPct /
  * DriftFar* (see the s29 gate + BENCH_NOTES r13). Run per SF:
  *
  *   runMain graft.DriftProbe /root/testdata/sf0.01
  */
object DriftProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]").appName("graft-drift-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val v1 = emb.filter(col("vec_id") % 17 =!= 3)
    val cb = Similarity.kmeansTrainFixedPoint(v1, k = 8, maxIter = 3)
    val v2 = emb.filter(col("vec_id") % 19 =!= 5)
      .withColumn("embedding", when(col("vec_id") % 13 === 0,
        transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    val diff = Similarity.vectorSnapshotDiff(v1, v2, "embedding", "vec_id")
      .filter(col("status") =!= "unchanged")
      .join(v2.select(col("vec_id"), col("embedding")),
        col("id") === col("vec_id"), "left")
      .select(col("id").as("vec_id"), col("embedding"), col("status"))
      .localCheckpoint()
    val slices = Seq(
      "adds_even" -> diff.filter(col("status") === "added" &&
        pmod(col("vec_id"), lit(2L)) === 0),
      "adds_odd" -> diff.filter(col("status") === "added" &&
        pmod(col("vec_id"), lit(2L)) === 1),
      "changed_negated" -> diff.filter(col("status") === "changed"))
    for (pct <- Seq(75, 90, 95, 99)) {
      val thr = Similarity.driftThresholdDist2(v1, cb, pct)
      val shares = slices.map { case (name, sl) =>
        val r = Similarity.assignmentDist2(sl, cb)
          .agg(count(lit(1)), sum(when(col("dist2") > thr, 1L)
            .otherwise(0L))).head()
        val (n, far) = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
        f"$name=$far/$n (${if (n == 0) 0.0 else 100.0 * far / n}%.1f%%)"
      }
      println(s"sf=$sfDir pct=$pct thr=$thr  ${shares.mkString("  ")}")
    }
    // the MOVED-share statistic: fraction of delta vectors whose fresh
    // exact-integer argmax list differs from the state's assignment
    val state = Similarity.assignFixedPoint(v1, cb).localCheckpoint()
    val s29Slices = Seq(
      "s0_adds_even" -> diff.filter(col("status") === "added" &&
        pmod(col("vec_id"), lit(2L)) === 0),
      "s1_adds_odd+chg52" -> diff.filter(
        (col("status") === "added" && pmod(col("vec_id"), lit(2L)) === 1) ||
        (col("status") === "changed" && pmod(col("vec_id"), lit(52L)) === 13)),
      "s2_chg_rest" -> diff.filter(col("status") === "changed" &&
        pmod(col("vec_id"), lit(52L)) =!= 13))
    val moved = s29Slices.map { case (name, sl) =>
      val fresh = Similarity.assignFixedPoint(
        sl.filter(col("status").isin("added", "changed")), cb)
      val r = fresh.join(state.select(col("id"), col("cid").as("__old")),
          Seq("id"), "left")
        .agg(count(lit(1)), sum(when(col("__old").isNotNull &&
          col("cid") =!= col("__old"), 1L).otherwise(0L))).head()
      val (n, m) = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      f"$name=$m/$n (${if (n == 0) 0.0 else 100.0 * m / n}%.1f%%)"
    }
    println(s"sf=$sfDir MOVED  ${moved.mkString("  ")}")
    spark.stop()
  }
}
