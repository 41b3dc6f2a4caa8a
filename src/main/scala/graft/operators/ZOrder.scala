package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: interleave the bits of two grid
  * coordinates so that sorting by the resulting z-value co-locates rows
  * that are close in BOTH dimensions. Files written in z-order carry
  * tight min/max bounding boxes on both columns, so a scan filtered on
  * either (or both) dimensions skips most files — the multi-column
  * data-skipping story a linear sort can only give to its leading column.
  *
  * All column math here is codegen'd bit arithmetic — no UDFs — and the
  * grid scaling is a deterministic one-pass aggregate, broadcast back;
  * the corpus itself is never shuffled to compute it. Two grids:
  * [[withZValue]] (min/max affine map — cheapest, fine for ~uniform
  * columns) and [[withZValueQuantile]] (per-dim approx-quantile
  * boundaries — the 100 TB default, because on skewed real columns a
  * min/max grid crowds nearly all rows into a few cells and the
  * bounding boxes stop skipping). Same interleave, same
  * repartitionByRange(zvalue) write either way.
  */
object ZOrder {

  /** Morton interleave of two `bits`-bit grid coordinates (x in even bit
    * positions, y in odd): a fold of shifts/masks, fully codegen'd.
    */
  def interleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }

  /** Affine map of a value onto the [0, 2^bits) grid given broadcast
    * min/max columns; the max value clamps to the top cell.
    */
  def gridCoord(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    // constant dimension (mn == mx) would otherwise divide 0/0 → NaN and
    // silently collapse the grid; pin it to cell 0 explicitly
    when(mx === mn, lit(0L)).otherwise(
      least(lit((1L << bits) - 1),
        floor((v - mn) * lit(cells) / (mx - mn))).cast("long"))
  }

  /** Attach `zvalue` for (xCol, yCol) on a 2^bits × 2^bits grid. The
    * min/max aggregate is a singleton broadcast (no corpus shuffle).
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame = {
    val mm = df.agg(
      min(col(xCol)).as("mn_x"), max(col(xCol)).as("mx_x"),
      min(col(yCol)).as("mn_y"), max(col(yCol)).as("mx_y"))
    df.crossJoin(broadcast(mm))
      .withColumn("zvalue", interleave(
        gridCoord(col(xCol), col("mn_x"), col("mx_x"), bits),
        gridCoord(col(yCol), col("mn_y"), col("mx_y"), bits), bits))
      .drop("mn_x", "mx_x", "mn_y", "mx_y")
  }

  /** Cell index from approx-quantile boundaries: the count of boundaries
    * ≤ v. With 2^bits − 1 boundaries this lands in [0, 2^bits), each cell
    * holding ~1/2^bits of the MASS (not the value range) — equi-depth, so
    * skew cannot crowd the grid. The per-row cost is 2^bits comparisons
    * over a broadcast literal-sized array; keep bits modest (≤ 8).
    */
  def quantileCoord(v: Column, boundaries: Column): Column =
    size(filter(boundaries, b => v.cast("double") >= b)).cast("long")

  /** Attach `zvalue` on an equi-DEPTH grid: per-dimension
    * `approx_percentile` boundary arrays from ONE sketch aggregate
    * (singleton row, broadcast — the corpus is never shuffled), then the
    * same Morton interleave. This is the skew-proof variant: a min/max
    * grid on a long-tailed column (prices, degrees, doc lengths) maps
    * almost every row to cell 0 and z-order degenerates to noise; the
    * quantile grid keeps per-cell counts balanced by construction.
    */
  def withZValueQuantile(df: DataFrame, xCol: String, yCol: String, bits: Int,
                         accuracy: Int = 10000): DataFrame = {
    val cells = 1L << bits
    val ps = array((1L until cells).map(i => lit(i.toDouble / cells)): _*)
    val bnd = df.agg(
      percentile_approx(col(xCol).cast("double"), ps, lit(accuracy)).as("bnd_x"),
      percentile_approx(col(yCol).cast("double"), ps, lit(accuracy)).as("bnd_y"))
    df.crossJoin(broadcast(bnd))
      .withColumn("zvalue", interleave(
        quantileCoord(col(xCol), col("bnd_x")),
        quantileCoord(col(yCol), col("bnd_y")), bits))
      .drop("bnd_x", "bnd_y")
  }

  /** Per-bucket bounding boxes after cutting the z-range into buckets
    * (bucket = zvalue >> shift): the min/max stats a file-level skipper
    * would persist. Tight boxes on BOTH columns = effective skipping.
    */
  def bucketStats(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  bucketShift: Int): DataFrame =
    withZValue(df, xCol, yCol, bits)
      .groupBy(shiftright(col("zvalue"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))

  /** Write `df` z-ordered: range-partition by zvalue (sampled range
    * exchange — the scalable global sort) so each output file covers a
    * contiguous z-interval, then drop the helper column.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    nFiles: Int, outDir: String): Unit =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(math.max(1, nFiles), col("zvalue"))
      .sortWithinPartitions("zvalue")
      .drop("zvalue")
      .write.mode("overwrite").parquet(outDir)
}
