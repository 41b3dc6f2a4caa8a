package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous global row enumeration — assign ids 0..n-1 following a sort
  * order WITHOUT a single-partition global sort.
  *
  * `monotonically_increasing_id` is gap-ridden (partition id in the high
  * bits) and `row_number() OVER (ORDER BY ...)` collapses to ONE
  * partition. The scalable shape is the classic two-phase enumeration:
  *   1. range-partition by the sort key (sampled exchange, same as any
  *      global sort) and sort within partitions;
  *   2. count rows per partition (tiny: one long per partition to the
  *      driver), prefix-sum the counts into per-partition start offsets;
  *   3. id = partition offset + local index (zipWithIndex-style, no data
  *      movement).
  * Total driver traffic is numPartitions longs; the corpus moves through
  * exactly one exchange — identical cost to sorting it at all.
  */
object RowIds {

  /** Returns `df` plus `idCol` = 0-based contiguous rank of the row under
    * `order` (which must be a total order for a deterministic result).
    */
  def withContiguousIds(df: DataFrame, idCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    // ONE RDD instance for both jobs, persisted so the enumeration job
    // replays neither the scan+exchange NOR the reduce-side sort: the
    // counting job materializes the sorted partitions into block storage
    // and the second job reads them back. The persist is released by
    // Spark's ContextCleaner once the returned DataFrame is unreachable.
    val rdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex {
      case (i, it) => Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = bc.value(i) - 1
      it.map { r => k += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ k) }
    }
    spark.createDataFrame(rows, schema)
  }
}
