package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The front-door factory really applies the posture it documents: the
  * extensions are live (SQL function + top-k strategy) and the
  * recommended configs land on the session.
  */
class GraftSessionSpec extends AnyFunSuite with Matchers {

  test("GraftSession.create registers extensions and applies the recommended configs") {
    // force the SHARED test context into existence first: the factory
    // must deliver its surface on a pre-existing SparkContext (where the
    // static extensions conf is silently ignored), and creating the
    // JVM-wide context here with local[2]+graft confs would hijack every
    // later suite
    SparkSpec.session
    // clear (but do NOT stop) the shared session so getOrCreate builds a
    // fresh SparkSession on the same context; restore afterwards
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val s = GraftSession.create(master = Some("local[2]"),
        shufflePartitions = 4, appName = "graft-session-spec")
      s.conf.get("spark.sql.shuffle.partitions") shouldBe "4"
      s.conf.get("spark.sql.adaptive.enabled") shouldBe "true"
      s.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
      s.conf.get("spark.sql.streaming.stateStore.providerClass") should
        include("RocksDB")
      // extensions live: the codegen'd dot kernel is SQL-callable and the
      // row_number idiom rewrites into the custom top-k operator
      s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0) shouldBe 11.0
      // the scalar text kernels ride the same extensions surface
      s.sql("SELECT graft_lang_id('the a of and is to') AS l")
        .collect().head.getString(0) shouldBe "en"
      s.sql("SELECT graft_token_count('one two three') AS n")
        .collect().head.getLong(0) shouldBe 3L
      import s.implicits._
      val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy($"g").orderBy($"v".desc)
      val topk = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 1)
      topk.queryExecution.executedPlan.toString should include("TopK")
      topk.collect().map(r => (r.getString(0), r.getInt(1))).toSet shouldBe
        Set(("a", 3), ("b", 9))
    } finally {
      // never stop: the SparkContext is shared with every other suite
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
