package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Z-order layout: interleave correctness on known bit patterns, and the
  * actual skipping claim — z-ordered buckets carry tight bounding boxes on
  * BOTH dimensions, where a linear sort is tight only on its leading
  * column.
  */
class ZOrderSpec extends SparkSpec {

  test("morton interleave of known coordinates") {
    // x=5 (101b) lands in even bits, y=3 (011b) in odd bits:
    // z = 1<<0 + 1<<1 + 1<<3 + 1<<4 = 27
    val row = spark.range(1)
      .select(ZOrder.interleave(lit(5L), lit(3L), bits = 3).as("z"))
      .head()
    row.getLong(0) shouldBe 27L

    // interleave is monotone per dimension with the other fixed
    val zs = spark.range(8)
      .select(ZOrder.interleave(col("id"), lit(2L), bits = 3).as("z"))
      .orderBy("id").collect().map(_.getLong(0))
    zs.toSeq shouldBe zs.toSeq.sorted
    zs.distinct.length shouldBe 8
  }

  test("z-order buckets bound both dimensions tighter than a linear sort") {
    val orders = Tables.orders(spark, sfDir).select(
      col("o_totalprice").cast("double").as("x"),
      col("o_custkey").cast("double").as("y"))

    // normalized mean y-span per bucket: z-order vs sort-by-x-only with
    // the same bucket count (64)
    def meanYSpan(bucketed: org.apache.spark.sql.DataFrame): Double =
      bucketed.groupBy("bucket")
        .agg((max("y") - min("y")).as("span"))
        .agg(avg("span")).head().getDouble(0)

    val zSpan = meanYSpan(
      ZOrder.withZValue(orders, "x", "y", bits = 8)
        .withColumn("bucket", shiftright(col("zvalue"), 10)))
    val n = orders.count()
    val linearSpan = meanYSpan(
      // true linear-sort layout: contiguous rank runs per bucket (what a
      // sort-by-x write actually produces), not modulo striping
      orders.withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("x")))
        .withColumn("bucket", ((col("r") - 1) * 64 / n).cast("long")))

    // custkey is ~uniform, so x-sorted buckets see nearly the full y
    // range; z-order must cut the mean y-span at least in half
    zSpan should be < linearSpan * 0.5
  }

  test("a constant dimension pins to grid cell 0 instead of NaN-collapsing") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toDouble, 7.0)).toDF("x", "y")
    val z = ZOrder.withZValue(df, "x", "y", bits = 4).select("x", "zvalue").collect()
    // y constant → z-order degrades to x-order, deterministically
    z.sortBy(_.getDouble(0)).map(_.getLong(1)).toSeq shouldBe
      z.map(_.getLong(1)).sorted.toSeq
    all(z.map(_.getLong(1))) should be >= 0L
  }

  test("quantile grid stays balanced on a skewed column where the min/max grid crowds") {
    import spark.implicits._
    // long-tailed x: 99% of the mass in [0,1), 1% outliers near 1e6 —
    // the shape of prices/degrees/doc-lengths in real corpora
    val n = 4000
    val df = (0 until n).map { i =>
      val x = if (i % 100 == 0) 1e6 + i else (i % 97).toDouble / 97.0
      (x, (i % 64).toDouble)
    }.toDF("x", "y")

    def maxCellShare(cells: org.apache.spark.sql.DataFrame): Double =
      cells.groupBy("c").count().agg(max("count")).head().getLong(0).toDouble / n

    val mm = df.agg(min("x").as("mn"), max("x").as("mx"))
    val minmaxShare = maxCellShare(df.crossJoin(broadcast(mm))
      .select(ZOrder.gridCoord(col("x"), col("mn"), col("mx"), 4).as("c")))
    val bnd = df.agg(percentile_approx(col("x"),
      array((1 until 16).map(i => lit(i / 16.0)): _*), lit(10000)).as("b"))
    val quantShare = maxCellShare(df.crossJoin(broadcast(bnd))
      .select(ZOrder.quantileCoord(col("x"), col("b")).as("c")))

    // min/max: the outliers stretch the range so 99% of rows crowd cell 0
    minmaxShare should be > 0.9
    // equi-depth: no cell far above its ideal 1/16 share
    quantShare should be < 0.2

    // and end to end, the quantile z-grid occupies far more distinct
    // cells — the precondition for tight per-file bounding boxes
    val mmCells = ZOrder.withZValue(df, "x", "y", 4)
      .agg(countDistinct("zvalue")).head().getLong(0)
    val qCells = ZOrder.withZValueQuantile(df, "x", "y", 4)
      .agg(countDistinct("zvalue")).head().getLong(0)
    qCells should be >= 4 * mmCells
  }

  test("writeZOrdered produces range-disjoint z files that skip on both dims") {
    val orders = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      col("o_totalprice").cast("double").as("x"),
      col("o_custkey").cast("double").as("y"))
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(orders, "x", "y", bits = 8, nFiles = 8, out)

    val back = spark.read.parquet(out)
    back.count() shouldBe orders.count()
    back.columns.toSet shouldBe Set("o_orderkey", "x", "y")

    // per-file bounding boxes (via input_file_name) must each cover well
    // under the full x-range: the file-skipping property
    val files = back
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("mnx"), max("x").as("mxx"))
    val (loX, hiX) = {
      val r = orders.agg(min("x"), max("x")).head(); (r.getDouble(0), r.getDouble(1))
    }
    val meanXCover = files
      .agg(avg(col("mxx") - col("mnx"))).head().getDouble(0) / (hiX - loX)
    meanXCover should be < 0.8
  }
}
