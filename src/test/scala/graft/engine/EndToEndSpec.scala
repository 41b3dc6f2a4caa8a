package graft.engine

import graft.{SparkSpec, Tables}
import graft.model._
import graft.sources.DocumentsRawIntegration
import java.nio.file.Files
import java.time.Instant
import java.util.UUID
import org.apache.spark.sql.functions._

/** The switch-over story end-to-end: reference-style ingestion (validate →
  * plan → fetch raw → parse → persist) lands records whose content
  * hashes, token counts, and shard manifest EXACTLY match the same
  * pipeline computed directly on the source-of-truth table — ingestion is
  * lossless and the curation stack composes on its output.
  */
class EndToEndSpec extends SparkSpec {

  test("raw ingest → persisted records → curation stats equal the direct path") {
    val lay = StorageLayout(Files.createTempDirectory("graft-e2e").toString)
    val runner = new JobRunner(spark, lay)
    val j = IngestionJob(IngestionSource("documents-raw"), UUID.randomUUID(),
      startedAt = Instant.parse("2026-08-12T00:00:00Z"))

    runner.run(new DocumentsRawIntegration(sfDir), j) match {
      case Left(f) => fail(f.summaryLines.mkString("; "))
      case Right(res) =>
        val ingested = spark.read.parquet(s"${lay.jobRoot(j)}/persisted")
          .select(col("doc_id"), col("raw_md5"), col("n_words"))
        ingested.count() shouldBe res.recordCount

        // the same curation numbers, from ingested records vs source table
        def pipeline(df: org.apache.spark.sql.DataFrame): (Long, Long, Map[Long, Long]) = {
          val curated = df.filter(col("n_words") >= 10) // quality floor
          val distinctContent = curated.select(col("raw_md5")).distinct().count()
          val shards = curated
            .withColumn("shard",
              graft.functions.PortableHash.md5_64(col("doc_id").cast("string")) % 4)
            .groupBy(col("shard")).agg(count(lit(1)).as("n"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          (curated.count(), distinctContent, shards)
        }

        val direct = pipeline(Tables.documents(spark, sfDir).select(
          col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit("\t"), col("text"))
            .cast("binary")).as("raw_md5"),
          org.apache.spark.sql.functions.size(split(col("text"), " "))
            .cast("long").as("n_words")))
        val viaIngest = pipeline(ingested)
        viaIngest shouldBe direct
        viaIngest._1 should be > 0L
        viaIngest._2 shouldBe viaIngest._1 // id-salted hashes: all distinct
    }
  }
}
