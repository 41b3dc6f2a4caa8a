package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession factory with graft's
  * recommended configuration applied and its extensions (native
  * expressions + the top-k planner strategy/rewrite,
  * [[graft.plans.GraftExtensions]]) registered at build time.
  *
  * The defaults encode the engine's 100 TB posture:
  *  - AQE on with skew-join splitting and partition coalescing — runtime
  *    re-planning is the first line of defense against skew and
  *    over-partitioning (PlanSpec asserts both actually fire);
  *  - RocksDB state store provider — streaming state on local SSD +
  *    changelog instead of executor heap (required by transformWithState,
  *    and the only provider that survives 10⁹-key state);
  *  - shuffle partitions sized by the caller (cluster-dependent: a good
  *    start is 2–3× total executor cores; the local test harnesses use
  *    the core count);
  *  - UTC session timezone — reference parity (`TimeUtils.scala:13-15` in
  *    hyppo-worker pins UTC) and oracle determinism.
  *
  * Every knob can still be overridden afterwards; this is a starting
  * point, not a straitjacket.
  *
  * JVM note: Spark 4 on JDK 17+ needs the platform module opens that
  * spark-submit (org.apache.spark.launcher.JavaModuleOptions) injects.
  * A host that embeds this library in a bare JVM must pass them itself
  * (see build.sbt's jdk17AddOpens for the list) — most paths degrade
  * gracefully without them, but driver-side decoding of DATE results
  * (e.g. Spark's recursive-CTE anchor collect) throws
  * EXPRESSION_DECODING_FAILED if `java.base/sun.util.calendar` is
  * closed.
  */
object GraftSession {

  /** Recommended configs, exposed for hosts that build their own session
    * (e.g. to merge into spark-submit --conf).
    */
  val recommended: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")

  /** Build (or reuse) a session with the recommended configuration.
    *
    * @param master            cluster URL; None defers to spark-submit
    * @param shufflePartitions target shuffle parallelism (≈ 2–3× total
    *                          executor cores on a real cluster)
    */
  def create(master: Option[String] = None,
             shufflePartitions: Int = 200,
             appName: String = "graft"): SparkSession = {
    val b0 = SparkSession.builder().appName(appName)
    val b1 = master.fold(b0)(b0.master)
    val s = recommended.foldLeft(
      b1.config("spark.sql.shuffle.partitions", shufflePartitions.toString)) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    // spark.sql.extensions is a STATIC conf: if a SparkContext already
    // existed (shared JVM, notebook, test harness), the builder config
    // above was silently ignored — register() delivers the full surface
    // on the live session, and no-ops when the conf DID apply
    graft.plans.GraftExtensions.register(s)
    s
  }
}
