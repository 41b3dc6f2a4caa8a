package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming ingestion surface — the data-plane analog of the
  * reference's AMQP control plane (SURVEY.md §2b "Streaming" row). The
  * reference only streams WORK (RabbitMQ queues with per-message TTL and
  * dead-lettering, worker/.../actor/amqp/QueueHelpers.scala:57-82); here the
  * same semantics apply to DATA:
  *
  *   work TTL / expired dead-letter  → withWatermark (late data dropped)
  *   queue consumption               → readStream file/rate/memory sources
  *   result publication              → writeStream / foreachBatch
  *   at-least-once ACK-after-publish → idempotent foreachBatch (batchId fence)
  *
  * Every transform takes and returns a streaming DataFrame, so the same
  * plan runs over a MemoryStream in tests, a file source locally, and
  * Kafka on a cluster. All aggregations are watermark-bounded: state size
  * is O(open windows), never O(stream) — the 100 TB/day requirement.
  */
object StreamingIngest {

  /** File-source stream over an events-shaped directory (schema must be
    * supplied — streaming sources don't infer). `maxFilesPerTrigger` is the
    * reference's throttled-resource analog for a file feed
    * (WorkResource.scala:29-43): it caps ingest rate per micro-batch.
    */
  def readEventFiles(spark: SparkSession, dir: String,
                     schemaDDL: String,
                     maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDDL))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Tumbling-window counts with late-data drop. Watermark = the work-TTL
    * analog (reference default 1 h, reference.conf:18-19).
    */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
                     lateness: String = "1 hour",
                     width: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window per-user activity. */
  def slidingUserActivity(events: DataFrame, tsCol: String = "ts",
                          lateness: String = "1 hour",
                          width: String = "1 hour",
                          slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n"))

  /** Session windows (gap-based) — state closes when the watermark passes
    * the gap, so memory is bounded by concurrently-open sessions.
    */
  def sessionCounts(events: DataFrame, tsCol: String = "ts",
                    lateness: String = "1 hour",
                    gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n"))

  /** Streaming exact dedup by key, state expired by watermark — the
    * streaming analog of the exact-dedup batch operator. Without the
    * watermark the key set grows unboundedly; with it, state is bounded by
    * keys seen inside the lateness horizon.
    */
  def dedupByKey(events: DataFrame, keys: Seq[String],
                 tsCol: String = "ts", lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Idempotent micro-batch sink: exactly-once parquet output via a
    * batch-id fence, the streaming analog of the engine's at-most-once
    * persist fence (JobRunner.persist; reference ACK placement
    * TaskFSM.scala:102-115). A replayed batchId (restart between write and
    * checkpoint commit) is skipped instead of duplicated.
    */
  def idempotentParquetSink(out: DataFrame, outDir: String,
                            checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    out.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fence = new Path(s"$outDir/_fence/batch-$batchId")
        val fs = fence.getFileSystem(batch.sparkSession.sessionState.newHadoopConf())
        if (fs.createNewFile(fence)) {
          batch.write.mode("append").parquet(s"$outDir/data")
        }
        ()
      }

  /** Run a streaming plan over all currently-available input and stop —
    * the batch-over-stream execution mode (Trigger.AvailableNow) used for
    * catch-up ingestion at scale.
    */
  def runAvailableNow(writer: DataStreamWriter[org.apache.spark.sql.Row]): StreamingQuery =
    writer.trigger(Trigger.AvailableNow()).start()

  // ---------------------------------------------- socket surface (LIVE)
  //
  // The one network streaming source this sandbox CAN execute: Spark's
  // built-in TCP text source. It feeds the SAME JSON payload bridge the
  // Kafka reader uses ([[parseJsonPayload]]), so the executed gate q130
  // covers the decode/transform path end-to-end across a real network
  // boundary; on a cluster the only delta is `format("socket")` →
  // `format("kafka")` + the [[KafkaConfig]] options.

  /** Serve a fixed payload of newline-delimited records over a loopback
    * TCP socket — the live endpoint for the executed ingest gate q130 and
    * its spec. Every accepted connection receives the full payload, then
    * the connection is held open until the CLIENT hangs up (the socket
    * source disconnects on query stop), then the next connection is
    * accepted (a restarted query reconnects and replays — at-least-once,
    * like a rewound Kafka offset). Close the returned server to stop.
    */
  def serveLines(lines: Seq[String]): java.net.ServerSocket = {
    val server = new java.net.ServerSocket(
      0, 1, java.net.InetAddress.getLoopbackAddress)
    val payload = lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val t = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        try {
          val os = sock.getOutputStream
          os.write(payload); os.flush()
          sock.getInputStream.read() // block until the client hangs up
        } catch { case _: Throwable => () }
        finally { try sock.close() catch { case _: Throwable => () } }
      } catch { case _: Throwable => () } // server closed → thread exits
    }, "graft-socket-ingest-server")
    t.setDaemon(true)
    t.start()
    server
  }

  /** Live socket event stream — the executed twin of [[readEventKafka]]:
    * a real network source feeding the same JSON bridge.
    */
  def readEventSocket(spark: SparkSession, host: String, port: Int,
                      schemaDDL: String): DataFrame =
    parseJsonPayload(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load(),
      schemaDDL)

  // ------------------------------------------------------- Kafka surface
  //
  // BROKER-GATED: this environment ships neither a Kafka broker nor the
  // spark-sql-kafka connector jar (probed: no kafka artifact under
  // /opt/spark/jars or the offline coursier cache — an embedded in-JVM
  // broker is therefore not constructible here either), so
  // `.load()`/`.start()` on these cannot
  // execute here — the option construction, the reader/writer wiring, and
  // the JSON payload bridge below are the testable surface (unit-tested in
  // StreamingSpec; EXECUTED over a live TCP source by gate q130 via
  // [[readEventSocket]]), and the same plan runs unchanged once
  // `--packages org.apache.spark:spark-sql-kafka-0-10_2.13` and
  // `kafka.bootstrap.servers` exist on the cluster. The cluster analog of
  // the reference's AMQP queue consumption (ResponseQueueConsumer.scala).

  /** Kafka connection/topic configuration. `maxOffsetsPerTrigger` is the
    * Kafka twin of [[readEventFiles]]' maxFilesPerTrigger rate throttle
    * (the reference's ThrottledWorkResource analog); `failOnDataLoss` is
    * false by default because compacted/expired offsets on a lagging
    * restart should degrade, not kill, a 100 TB/day ingest.
    */
  final case class KafkaConfig(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false,
      extra: Map[String, String] = Map.empty) {

    /** Options for `readStream.format("kafka")`. */
    def sourceOptions: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topic,
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      extra

    /** Options for `writeStream.format("kafka")`. */
    def sinkOptions: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "topic" -> topic) ++ extra
  }

  /** Configured (NOT loaded) Kafka source reader — callers `.load()` where
    * the connector exists. Kept separate from the load so the wiring is
    * compile- and unit-checked in this broker-less environment.
    */
  def kafkaReader(spark: SparkSession, cfg: KafkaConfig)
      : org.apache.spark.sql.streaming.DataStreamReader =
    spark.readStream.format("kafka").options(cfg.sourceOptions)

  /** Kafka event stream: load + decode the JSON `value` payload into the
    * supplied schema. Broker-gated (see section note); the decode step is
    * [[parseJsonPayload]], which tests exercise on batch frames.
    */
  def readEventKafka(spark: SparkSession, cfg: KafkaConfig,
                     schemaDDL: String): DataFrame =
    parseJsonPayload(kafkaReader(spark, cfg).load(), schemaDDL)

  /** Decode a Kafka-shaped frame (binary `value`) into typed event rows.
    * Works identically on streaming and batch frames — the testable half
    * of [[readEventKafka]].
    */
  def parseJsonPayload(kafkaShaped: DataFrame, schemaDDL: String): DataFrame =
    kafkaShaped
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(schemaDDL)).as("e"))
      .select(col("e.*"))

  /** Encode typed rows into the Kafka sink shape: a JSON `value` (and a
    * `key` for log-compaction semantics when `keyCol` is set). The batch
    * twin of the sink path, testable without a broker.
    */
  def toKafkaPayload(out: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val value = to_json(struct(col("*"))).as("value")
    keyCol match {
      case Some(k) => out.select(col(k).cast("string").as("key"), value)
      case None    => out.select(value)
    }
  }

  /** Configured Kafka sink writer over the encoded payload — callers
    * `.start()` where the connector exists. Exactly-once lands on the
    * checkpoint + Kafka's idempotent producer; for sinks needing the
    * batch-id fence instead, compose [[idempotentParquetSink]]'s pattern.
    */
  def kafkaSink(out: DataFrame, cfg: KafkaConfig, checkpointDir: String,
                keyCol: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    toKafkaPayload(out, keyCol).writeStream
      .format("kafka")
      .options(cfg.sinkOptions)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
}
