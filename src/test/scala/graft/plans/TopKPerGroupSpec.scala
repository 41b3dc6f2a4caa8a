package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-group top-k plan operator: result parity with the
  * window formulation, bounded-heap pruning before the exchange, and
  * physical-plan shape (Partial below the shuffle, Final above).
  */
class TopKPerGroupSpec extends SparkSpec {

  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("matches the window row_number formulation exactly") {
    val got = TopKPerGroup.perGroup(customer,
        groupCols = Seq("c_mktsegment"),
        orderCols = Seq("c_acctbal" -> true, "c_custkey" -> false),
        k = 3)
      .select(col("c_mktsegment"), col("rank"), col("c_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val want = customer
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("c_mktsegment"), col("rank"), col("c_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe want
  }

  test("physical plan: PartialExec below the exchange, FinalExec above") {
    val df = TopKPerGroup.perGroup(customer,
      Seq("c_mktsegment"), Seq("c_acctbal" -> true, "c_custkey" -> false), 2)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("TopKFinal")
    plan should include("TopKPartial")
    // partial runs on the map side: it appears AFTER (deeper than) the
    // shuffle exchange in the plan tree string
    plan.indexOf("TopKPartial") should be > plan.indexOf("Exchange")
  }

  test("partial stage prunes each partition to ≤ k rows per group") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 4, i)).toDF("g", "v").repartition(8)
    val analyzed = org.apache.spark.sql.GraftSqlShim.analyzedPlan(df)
    val topk = TopKPerGroup.perGroup(df, Seq("g"), Seq("v" -> true), 5)
    topk.count() shouldBe 20 // 4 groups × 5
    // the rank column is usable downstream like any attribute
    topk.filter(col("rank") === 1).select(sum(col("v"))).head.getLong(0) shouldBe
      (997 + 998 + 999 + 1000)
    analyzed should not be null
  }

  test("optimizer rule rewrites the row_number window idiom into the heap operator") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    def windowed = customer
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"))
    val want = windowed.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

    TopKPerGroup.ensureStrategy(spark)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKPerGroup.TopKRewrite
    try {
      val plan = windowed.queryExecution.executedPlan.toString
      plan should include("TopKPartial")
      plan should not include regex("Window ".r.toString)
      // rn keeps its IntegerType through the rewrite
      windowed.schema("rn").dataType.typeName shouldBe "integer"
      val got = windowed.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      got shouldBe want
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKPerGroup.TopKRewrite)
    }
  }

  test("rank/dense_rank window filters are NOT rewritten (tie semantics differ)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKPerGroup.TopKRewrite
    try {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
      val plan = customer.withColumn("r", rank().over(w)).filter(col("r") <= 3)
        .queryExecution.executedPlan.toString
      plan should not include "TopKPartial"
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKPerGroup.TopKRewrite)
    }
  }

  test("GLOBAL top-k (empty grouping) emits exactly k rows across all partitions") {
    import spark.implicits._
    // multiple input partitions: the regression was each partition
    // independently emitting its own k rows with ranks 1..k
    val df = (1 to 1000).map(i => (i % 4, i)).toDF("g", "v").repartition(8)
    val got = TopKPerGroup.perGroup(df, Nil, Seq("v" -> true), 5)
      .select(col("v"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    got shouldBe Set((1000, 1L), (999, 2L), (998, 3L), (997, 4L), (996, 5L))
  }

  test("optimizer rule handles the global row_number idiom (no partitionBy)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 4, i)).toDF("g", "v").repartition(8)
    val w = Window.orderBy(col("v").desc)
    def windowed = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val want = windowed.collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKPerGroup.TopKRewrite
    try {
      val plan = windowed.queryExecution.executedPlan.toString
      plan should include("TopKPartial")
      val got = windowed.collect().map(r => (r.getInt(1), r.getInt(2))).toSet
      got.size shouldBe 3
      got shouldBe want
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKPerGroup.TopKRewrite)
    }
  }

  test("k larger than the group emits the whole group, ranked") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 30), (2, 20)).toDF("g", "v")
    val got = TopKPerGroup.perGroup(df, Seq("g"), Seq("v" -> true), 99)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    got shouldBe Set((1, 30, 1L), (1, 10, 2L), (2, 20, 1L))
  }
}
