package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RowIdsSpec extends SparkSpec {

  test("contiguous ids are exactly 0..n-1 in sort order, whatever the input partitioning") {
    import spark.implicits._
    // adversarial input: reverse-sorted, skewed into ragged partitions
    val df = (0 until 997).map(i => (996L - i, s"v$i")).toDF("k", "v")
      .repartition(7, col("v"))
    val out = RowIds.withContiguousIds(df, "gid", col("k")).collect()
    out.length shouldBe 997
    out.map(_.getAs[Long]("gid")).sorted.toSeq shouldBe (0L until 997L)
    // id order must equal key order
    out.sortBy(_.getAs[Long]("gid")).map(_.getAs[Long]("k")).toSeq shouldBe
      (0L until 997L)
  }

  test("empty partitions and empty input do not break enumeration") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    RowIds.withContiguousIds(empty, "gid", col("k")).count() shouldBe 0L
    val one = Seq((42L, "x")).toDF("k", "v").repartition(5)
    val r = RowIds.withContiguousIds(one, "gid", col("k")).collect()
    r.map(_.getAs[Long]("gid")).toSeq shouldBe Seq(0L)
  }
}
