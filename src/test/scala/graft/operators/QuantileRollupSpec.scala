package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer HDR histogram percentile rollup (QuantileRollup): the
  * bracketing contract vs exact percentiles, merge-exactness of the
  * rollup, small-value exactness, and the ≤2^-s relative-width bound.
  */
class QuantileRollupSpec extends SparkSpec {
  import spark.implicits._

  test("small values (< 2^(s+1)) bucket exactly") {
    val df = Seq((1L, "a"), (17L, "a"), (63L, "a")).toDF("v", "g")
    val h = QuantileRollup.histogram(df, "v", Seq("g")).collect()
    h.length shouldBe 3
    h.foreach { r => r.getLong(1) shouldBe r.getLong(2) } // lo == hi
  }

  test("bucket brackets its value with relative width <= 2^-5") {
    val vals = Seq(64L, 100L, 999L, 123456L, 98765432L, (1L << 40) + 12345L)
    val df = vals.map(v => (v, "x")).toDF("v", "g")
    val h = QuantileRollup.histogram(df, "v", Seq("g"))
      .select("bucket_lo", "bucket_hi").as[(Long, Long)].collect()
    h.foreach { case (lo, hi) =>
      vals.exists(v => v >= lo && v <= hi) shouldBe true
      (hi - lo).toDouble / lo should be <= (1.0 / 32)
    }
  }

  test("percentile bracket contains the exact percentile at every p") {
    val n = 5000
    val vals = (1 to n).map(i => ((i.toLong * 7919) % 1000000) + 1)
    val df = vals.map(v => (v, "g")).toDF("v", "g")
    val h = QuantileRollup.histogram(df, "v", Seq("g"))
    val ps = Seq(0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0)
    val br = QuantileRollup.percentiles(h, Seq("g"), ps)
      .select("p", "est_lo", "est_hi").as[(Double, Long, Long)].collect()
      .map { case (p, lo, hi) => p -> (lo, hi) }.toMap
    br.size shouldBe ps.size
    val sorted = vals.sorted
    ps.foreach { p =>
      val exact = sorted(math.ceil(p * n).toInt - 1)
      val (lo, hi) = br(p)
      exact should be >= lo
      exact should be <= hi
    }
  }

  test("rollup merge is exact: day->month rollup equals the direct month histogram") {
    val rows = (1 to 2000).map { i =>
      (((i.toLong * 104729) % 500000) + 1, s"m${i % 3}", s"d${i % 30}")
    }
    val df = rows.toDF("v", "month", "day")
    val daily = QuantileRollup.histogram(df, "v", Seq("month", "day"))
    val rolled = QuantileRollup.rollup(daily, Seq("month"))
      .orderBy("month", "bucket_lo")
      .select("month", "bucket_lo", "bucket_hi", "cnt").collect()
    val direct = QuantileRollup.histogram(df, "v", Seq("month"))
      .orderBy("month", "bucket_lo")
      .select("month", "bucket_lo", "bucket_hi", "cnt").collect()
    rolled.map(_.toSeq) shouldBe direct.map(_.toSeq)
  }

  test("deterministic across partitionings (order-free integer merge)") {
    val rows = (1 to 3000).map(i => (((i.toLong * 31337) % 99991) + 1, "g"))
    val a = QuantileRollup.percentiles(
      QuantileRollup.histogram(rows.toDF("v", "g"), "v", Seq("g")),
      Seq("g"), Seq(0.5, 0.99)).collect().map(_.toSeq).sortBy(_.toString)
    val b = QuantileRollup.percentiles(
      QuantileRollup.histogram(rows.toDF("v", "g").repartition(13), "v", Seq("g")),
      Seq("g"), Seq(0.5, 0.99)).collect().map(_.toSeq).sortBy(_.toString)
    a shouldBe b
  }

  test("extreme magnitudes bracket correctly (top of the long range)") {
    val vals = Seq(Long.MaxValue, Long.MaxValue - 1, 1L << 62, (1L << 62) + 7)
    val df = vals.map(v => (v, "g")).toDF("v", "g")
    val h = QuantileRollup.histogram(df, "v", Seq("g"))
      .select("bucket_lo", "bucket_hi", "cnt").as[(Long, Long, Long)].collect()
    h.map(_._3).sum shouldBe vals.size
    h.foreach { case (lo, hi, _) =>
      lo should be >= 0L // no shift overflow into the sign bit
      hi should be > lo
      vals.exists(v => v >= lo && v <= hi) shouldBe true
    }
  }

  test("zero values land in the exact zero bucket") {
    val df = Seq((0L, "g"), (0L, "g"), (5L, "g")).toDF("v", "g")
    val h = QuantileRollup.histogram(df, "v", Seq("g"))
      .select("bucket_lo", "bucket_hi", "cnt").as[(Long, Long, Long)].collect()
    h.find(_._1 == 0L).map(_._3) shouldBe Some(2L)
  }
}
