package graft.engine

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Batch progress metrics — the Spark-native analog of the reference's
  * task StatusUpdate flow (`worker/.../actor/task/TaskFSM.scala`,
  * streaming twin: graft.streaming.TaskTracker). `Dataset.observe`
  * attaches named aggregates that are accumulated DURING execution (no
  * second scan, no extra job) and delivered to a QueryExecutionListener
  * when the action completes — rows processed, bytes summed, nulls seen,
  * all for free on the job's own pass.
  */
class ObserveSpec extends SparkSpec {

  test("observe() reports per-action metrics through QueryExecutionListener without a second scan") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        qe.observedMetrics.get("ingest_progress").foreach(r => seen = Some(r))
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val lineitem = Tables.lineitem(spark, sfDir)
      val observed = lineitem
        .observe("ingest_progress",
          count(lit(1)).as("rows"),
          sum(col("l_quantity")).as("qty_sum"),
          count(when(col("l_returnflag").isNull, 1)).as("null_flags"))
        .filter(col("l_quantity") > 0)
      val n = observed.count()
      // listener events are delivered asynchronously off the action thread
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.isDefined, "observed metrics never reached the listener")
      val m = seen.get
      m.getAs[Long]("rows") shouldBe lineitem.count()
      m.getAs[Long]("null_flags") shouldBe 0L
      assert(m.getAs[Double]("qty_sum") > 0.0)
      assert(n > 0)
    } finally spark.listenerManager.unregister(listener)
  }
}
