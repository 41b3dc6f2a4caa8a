package graft.operators

import graft.SparkSpec
import graft.operators.DataQuality.Check._
class DataQualitySpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), Some("a")),
      (2L, Some(-5.0), Some("b")),
      (3L, None, Some("a")),
      (3L, Some(20.0), None), // duplicate id, null string
      (5L, Some(999.0), Some("zz"))
    ).toDF("id", "x", "s")
  }

  test("profile: exact per-column stats incl. nulls, numeric vs string split") {
    val p = DataQuality.profile(fixture, Seq("id", "x", "s"), exact = true)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    p("id").getAs[Long]("n_rows") shouldBe 5L
    p("id").getAs[Long]("n_nulls") shouldBe 0L
    p("id").getAs[Long]("n_distinct") shouldBe 4L
    p("id").getAs[Double]("min_num") shouldBe 1.0
    p("id").getAs[Double]("max_num") shouldBe 5.0
    p("x").getAs[Long]("n_nulls") shouldBe 1L
    p("x").getAs[Double]("avg_num") shouldBe 256.0 // (10-5+20+999)/4
    p("x").getAs[String]("min_str") shouldBe null  // numeric: no string stats
    p("s").getAs[Long]("n_nulls") shouldBe 1L
    p("s").getAs[String]("min_str") shouldBe "a"
    p("s").getAs[String]("max_str") shouldBe "zz"
    assert(p("s").isNullAt(p("s").fieldIndex("min_num")))
  }

  test("profile is one aggregate pass: no joins, a single scan feeds the report") {
    val plan = DataQuality.profile(fixture, Seq("id", "x", "s"), exact = true)
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    // exact count_distinct plans via Expand: partial + final + the
    // distinct stage — but never a per-column scan (scan count == 1)
    "Scan".r.findAllIn(plan).size shouldBe 1
  }

  test("approx profile (the DEFAULT) drops the Expand (the 100 TB shape)") {
    val exact = DataQuality.profile(fixture, Seq("id", "x", "s"), exact = true)
      .queryExecution.executedPlan.toString
    val approx = DataQuality.profile(fixture, Seq("id", "x", "s"))
      .queryExecution.executedPlan.toString
    exact should include("Expand")
    approx should not include "Expand"
    "Exchange".r.findAllIn(approx).size shouldBe 1
  }

  test("approx profile (q102b) tracks the exact profile (q102) within HLL tolerance") {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate")
    val li = graft.Tables.lineitem(spark, sfDir)
    def byCol(exact: Boolean) = DataQuality.profile(li, cols, exact)
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val e = byCol(exact = true)
    val a = byCol(exact = false)
    for (c <- cols) {
      // every metric except n_distinct is computed identically
      for (f <- Seq("n_rows", "n_nulls")) a(c).getAs[Long](f) shouldBe e(c).getAs[Long](f)
      for (f <- Seq("min_num", "max_num", "avg_num", "min_str", "max_str"))
        a(c).get(a(c).fieldIndex(f)) shouldBe e(c).get(e(c).fieldIndex(f))
      // n_distinct: HLL default rsd is 5%; assert within 15% of exact
      val (ed, ad) = (e(c).getAs[Long]("n_distinct"), a(c).getAs[Long]("n_distinct"))
      assert(math.abs(ad - ed) <= math.max(1L, (ed * 0.15).toLong),
        s"$c: approx n_distinct $ad vs exact $ed drifted past sketch tolerance")
    }
  }

  test("validate: planted violations are counted, pass/fail per check") {
    val rep = DataQuality.validate(fixture, Seq(
      Completeness("x"),                   // 4/5 non-null -> fail at 1.0
      Completeness("id"),                  // 1.0 -> pass
      Uniqueness("id"),                    // one dup -> 1 violation
      InRange("x", 0.0, 100.0),            // -5 and 999 out -> 2
      InSet("s", Seq("a", "b")),           // "zz" -> 1 (null not counted)
      Matches("s", "^[a-b]+$")             // "zz" -> 1
    )).collect().map(r => (r.getAs[String]("check_name"), r.getAs[String]("col_name")) -> r).toMap
    rep(("completeness", "x")).getAs[Double]("metric") shouldBe 0.8
    rep(("completeness", "x")).getAs[Boolean]("passed") shouldBe false
    rep(("completeness", "id")).getAs[Boolean]("passed") shouldBe true
    rep(("uniqueness", "id")).getAs[Double]("metric") shouldBe 1.0
    rep(("range", "x")).getAs[Double]("metric") shouldBe 2.0
    rep(("in_set", "s")).getAs[Double]("metric") shouldBe 1.0
    rep(("pattern", "s")).getAs[Double]("metric") shouldBe 1.0
    rep.values.count(!_.getAs[Boolean]("passed")) shouldBe 5
  }

  test("validate: foreign-key orphans via broadcast anti-join; null FKs ignored") {
    import spark.implicits._
    val facts = Seq((1L, Option(10L)), (2L, Option(11L)), (3L, Option(99L)),
      (4L, None)).toDF("id", "fk")
    val dim = Seq(10L, 11L).toDF("dk")
    val df = DataQuality.validate(facts, Seq(ForeignKey("fk", dim, "dk")))
    val plan = df.queryExecution.executedPlan
    plan.toString should include("BroadcastHashJoin")
    val r = df.collect().head
    r.getAs[Double]("metric") shouldBe 1.0 // only 99 is an orphan; null skipped
    r.getAs[Boolean]("passed") shouldBe false
  }
}
