package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 record-file sink: two-phase commit (manifest written last,
  * only on full success), checksum round-trip, truncate-on-overwrite,
  * and abort cleanup.
  */
class DSv2SinkSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-sink").toString

  // one task per partition — the sink's (documented) writer invariant
  private def input = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("lang"), col("n_chars"),
      pmod(col("doc_id"), lit(3)).cast("int").as("task_number"))
    .repartition(col("task_number"))

  test("round-trip: rows land per task, manifest md5 verifies on read-back") {
    val root = freshRoot()
    input.write.format("graft.sources.GraftRecordFileSink")
      .option("root", root).mode("append").save()
    val manifest = GraftRecordFileSink.readManifest(spark, root)
    manifest.map(_._1).sorted shouldBe Seq(0, 1, 2)
    manifest.map(_._2).sum shouldBe input.count()
    // stream each file back THROUGH the checksum gate with the manifest md5
    val types = Seq(org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)
    val got = manifest.flatMap { case (t, _, _, md5) =>
      AvroRecordFiles.streamFile(s"$root/records/task-$t/data.avro", types, Some(md5))
        .map(vals => (vals(0).asInstanceOf[Long], vals(1).asInstanceOf[String],
          vals(2).asInstanceOf[Long], t))
    }.toSet
    val want = input.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    got shouldBe want
  }

  test("overwrite truncates the records dir; append accumulates") {
    val root = freshRoot()
    val half = input.filter(col("task_number") < 2)
    input.write.format("graft.sources.GraftRecordFileSink")
      .option("root", root).mode("append").save()
    half.write.format("graft.sources.GraftRecordFileSink")
      .option("root", root).mode("overwrite").save()
    val manifest = GraftRecordFileSink.readManifest(spark, root)
    manifest.map(_._1).sorted shouldBe Seq(0, 1)
    manifest.map(_._2).sum shouldBe half.count()
    // task-2 file removed by the truncate
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(new org.apache.hadoop.fs.Path(s"$root/records/task-2/data.avro")) shouldBe false
  }

  test("append merges the manifest across batches") {
    val root = freshRoot()
    input.filter(col("task_number") < 2)
      .write.format("graft.sources.GraftRecordFileSink")
      .option("root", root).mode("append").save()
    input.filter(col("task_number") === 2)
      .write.format("graft.sources.GraftRecordFileSink")
      .option("root", root).mode("append").save()
    val manifest = GraftRecordFileSink.readManifest(spark, root)
    manifest.map(_._1).sorted shouldBe Seq(0, 1, 2) // batch 1's tasks survive
    manifest.map(_._2).sum shouldBe input.count()
  }

  test("streaming ingest lands in the record sink via foreachBatch, exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val root = freshRoot()
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream-docs").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.repartition(3).write.mode("overwrite").parquet(srcDir)
    // 3 files × maxFilesPerTrigger=1 → 3 micro-batches, each committed
    // through the sink's two-phase protocol; task ids namespaced by
    // batch so manifests merge disjointly
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch
          .withColumn("task_number",
            (lit(batchId * 10) + pmod(col("doc_id"), lit(2))).cast("int"))
          .repartition(col("task_number"))
          .write.format("graft.sources.GraftRecordFileSink")
          .option("root", root).mode("append").save()
        ()
      }
      .start()
    q.awaitTermination()
    val manifest = GraftRecordFileSink.readManifest(spark, root)
    manifest.map(_._2).sum shouldBe docs.count() // every doc exactly once
    manifest.map(_._1).distinct.size shouldBe manifest.size // disjoint tasks
  }

  test("a task split across partitions fails the commit loudly, no manifest") {
    val root = freshRoot()
    val split = input.repartition(4) // round-robin: tasks span partitions
    intercept[Exception] {
      split.write.format("graft.sources.GraftRecordFileSink")
        .option("root", root).mode("append").save()
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(new org.apache.hadoop.fs.Path(s"$root/records/_manifest.json")) shouldBe false
  }

  test("a failing write leaves NO manifest (commit marker is last)") {
    val root = freshRoot()
    val boom = udf((id: Long) => {
      if (id == 42L) throw new RuntimeException("boom"); id
    })
    val bad = input.withColumn("doc_id", boom(col("doc_id")))
    intercept[Exception] {
      bad.write.format("graft.sources.GraftRecordFileSink")
        .option("root", root).mode("append").save()
    }
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(new org.apache.hadoop.fs.Path(s"$root/records/_manifest.json")) shouldBe false
  }
}
