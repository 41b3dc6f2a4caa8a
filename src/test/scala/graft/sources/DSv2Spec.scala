package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DataSource V2 integration source: task fan-out = input partitions,
  * task pruning from pushed filters, column pruning, both integration
  * kinds, and reader throttling.
  */
class DSv2Spec extends SparkSpec {

  private def read(factory: Class[_]): DataFrame =
    spark.read.format("graft.sources.GraftIntegrationSource")
      .option("factory", factory.getName)
      .option("dir", sfDir)
      .load()

  test("structured read equals the JobRunner records path") {
    val viaDsv2 = read(classOf[DocumentsStructuredFactory])
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val integ = new DocumentsStructuredIntegration(sfDir)
    val job = graft.model.IngestionJob(graft.model.IngestionSource("documents-structured"),
      java.util.UUID.randomUUID())
    val runner = new graft.engine.JobRunner(spark,
      graft.model.StorageLayout(java.nio.file.Files.createTempDirectory("dsv2").toString))
    val viaRunner = runner.records(integ, job, runner.planTasks(integ, job))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    viaDsv2 shouldBe viaRunner
  }

  test("one input partition per task; task_number filters prune whole tasks") {
    val df = read(classOf[DocumentsStructuredFactory])
    val nTasks = DocumentsSource.sources(sfDir).size
    df.rdd.getNumPartitions shouldBe nTasks
    val pruned = df.filter(col("task_number") === 1)
    pruned.rdd.getNumPartitions shouldBe 1
    pruned.select(countDistinct(col("task_number"))).head.getLong(0) shouldBe 1L
    df.filter(col("task_number") >= 1).rdd.getNumPartitions shouldBe (nTasks - 1)
  }

  test("column pruning projects before conversion") {
    val df = read(classOf[DocumentsStructuredFactory]).select("doc_id")
    df.schema.fieldNames.toSeq shouldBe Seq("doc_id")
    df.count() shouldBe read(classOf[DocumentsStructuredFactory]).count()
  }

  test("raw integration kind fetches pages and parses per record") {
    val df = read(classOf[DocumentsRawFactory])
    df.schema.fieldNames.toSeq shouldBe
      Seq("doc_id", "raw_size", "raw_md5", "n_words", "task_number")
    df.count() shouldBe spark.read.parquet(s"$sfDir/documents.parquet").count()
  }

  test("throttle.rowsPerSec paces the reader") {
    val t0 = System.nanoTime()
    val n = spark.read.format("graft.sources.GraftIntegrationSource")
      .option("factory", classOf[DocumentsStructuredFactory].getName)
      .option("dir", sfDir)
      .option("throttle.rowsPerSec", "200")
      .load().filter(col("task_number") === 0).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    n should be > 0L
    elapsed should be >= (n / 200.0) * 0.5 // pacing engaged (generous slack)
  }
}
