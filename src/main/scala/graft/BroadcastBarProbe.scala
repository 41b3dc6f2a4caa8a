package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the GraphRank broadcast bar (r18, r17 advice):
  * builds an n-row narrow (node, tw, r) table — the exact row shape the
  * iterative operators broadcast each round — broadcast-joins it, and
  * reports the BroadcastExchange's REAL metrics (serialized dataSize,
  * collect/build/broadcast times) so the bar is justified by a measured
  * number, not arithmetic. Read-only tooling, not on any contract path.
  *
  * Usage: runMain graft.BroadcastBarProbe [nRows] (default = the bar)
  */
object BroadcastBarProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong
            else graft.operators.GraphRank.BroadcastNodesMax
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE wraps the exchange in query stages invisible to a plain
      // plan walk; the probe only reads BroadcastExchange metrics
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the biasedRank per-round shape: ranks (node, tw, r) broadcast
    // against an edge-sized stream side
    val nodes = spark.range(n).select(col("id").as("node"),
      (col("id") % 100L + 1L).as("tw"), (col("id") * 3L).as("r"))
    val edges = spark.range(4L * n).select((col("id") % n).as("src"),
      ((col("id") * 7L) % n).as("dst"))
    val j = edges.join(broadcast(nodes), edges("src") === nodes("node"))
      .select(col("dst"), expr("r div 2").as("c"))
    j.queryExecution.toRdd.count()
    j.queryExecution.executedPlan.foreach {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        val m = b.metrics
        def mv(k: String): String =
          m.get(k).map(_.value.toString).getOrElse("-")
        println(s"""{"probe":"broadcast_bar","rows":$n,""" +
          s""""dataSize":${mv("dataSize")},"collectTime_ms":${mv("collectTime")},""" +
          s""""buildTime_ms":${mv("buildTime")},"broadcastTime_ms":${mv("broadcastTime")}}""")
      case _ => ()
    }
    spark.stop()
  }
}
