package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Parquet bloom-filter staging (src16): the footer must actually carry
  * a bloom filter on doc_id across multiple row groups, and the filter
  * must answer membership correctly — present ids test positive in
  * their row group, an id far outside the corpus tests negative (the
  * property row-group skipping rests on).
  */
class BloomFilterSpec extends SparkSpec {

  test("bloom-enabled staging: multiple row groups, readable filter, correct membership") {
    // the src16 gate's own staging path
    val gate = graft.SparkEntry.queries("src16_parquet_bloom")
    val result = gate(spark, sfDir)
      .collect().map(_.getLong(0)).sorted
    result shouldBe Array(7L, 99L, 311L)

    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_export",
      java.nio.file.Paths.get(sfDir).getFileName.toString, "docs_bloom")
    val part = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part),
      new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      blocks.size should be > 1 // several row groups — skipping is possible
      val firstDocId = blocks.head.getColumns.asScala
        .find(_.getPath.toDotString == "doc_id").get
      val bloom = reader.getBloomFilterDataReader(blocks.head)
        .readBloomFilter(firstDocId)
      bloom should not be null
      // data is doc_id-sorted, so low ids live in the first row group
      bloom.findHash(bloom.hash(7L)) shouldBe true
      // an id far outside the corpus: definitely-absent must (modulo the
      // 1% fpp, deterministic for a fixed filter) test negative
      bloom.findHash(bloom.hash(987654321L)) shouldBe false
    } finally reader.close()
  }
}
