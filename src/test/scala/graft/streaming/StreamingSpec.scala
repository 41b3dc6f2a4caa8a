package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics vs the reference's control-plane behaviors:
  * watermark late-drop ↔ message TTL expiry, session/tumbling windows,
  * streaming dedup, idempotent foreachBatch ↔ ACK-after-publish, and the
  * TaskTracker FSM ↔ TaskFSM + expired dead-letters
  * (worker/.../actor/task/TaskFSM.scala, QueueHelpers.scala:57-82).
  */
/** Top-level so Spark can derive an Encoder (inner-class case classes can't
  * be encoded — they capture the spec instance as an outer pointer).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import TaskTracker._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  /** Runs each batch thunk, then drains the query, so the watermark advances
    * BETWEEN batches — watermarks only move at micro-batch boundaries.
    */
  private def runBatches(out: DataFrame, name: String,
                         batches: Seq[() => Unit]): DataFrame = {
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try { batches.foreach { b => b(); q.processAllAvailable() } }
    finally q.stop()
    spark.table(name)
  }

  test("tumbling window counts close when watermark passes; late events dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingIngest.tumblingCounts(
      in.toDF(), lateness = "10 minutes", width = "30 minutes")
    val got = runBatches(out, "tumbling", Seq(
      () => in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 2, "click", 2.0)),
      () => in.addData(Ev(3, ts(55), 1, "view", 1.0)), // advances watermark to 10:45
      () => in.addData(Ev(4, ts(5), 3, "click", 9.9)), // late: before watermark, dropped
      () => in.addData(Ev(5, ts(59, 0), 1, "view", 1.0))))
    val rows = got.collect().map(r => (r.getString(1), r.getLong(2))).toMap
    rows("click") shouldBe 2L // the late event 4 must NOT be counted
  }

  private def ts(minute: Int, second: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$second%02d")

  test("windowed aggregation runs on the RocksDB state store (large-state config)") {
    // at 100 TB the default in-memory HDFS-backed state store OOMs on
    // high-cardinality windows; RocksDB spills state to local disk. Same
    // aggregation, same results, swapped provider.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val out = StreamingIngest.tumblingCounts(
        in.toDF(), lateness = "10 minutes", width = "30 minutes")
      val got = runBatches(out, "rocksdb_tumbling", Seq(
        () => in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 2, "click", 2.0)),
        () => in.addData(Ev(3, ts(55), 1, "view", 1.0)),
        () => in.addData(Ev(5, ts(59, 0), 1, "view", 1.0))))
      got.collect().map(r => (r.getString(1), r.getLong(2))).toMap.apply("click") shouldBe 2L
    } finally spark.conf.set(key, prev)
  }

  test("streaming dedup drops within-watermark duplicate keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingIngest.dedupByKey(
      in.toDF(), Seq("event_id"), lateness = "10 minutes")
    val got = runBatches(out, "dedup", Seq(
      () => in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(1, ts(1), 1, "click", 1.0)),
      () => in.addData(Ev(1, ts(2), 1, "click", 1.0), Ev(2, ts(3), 2, "view", 2.0))))
    got.select("event_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("dropDuplicatesWithinWatermark evicts dedup state once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // unlike plain dropDuplicates (state grows forever), the
    // WithinWatermark variant frees each key after lateness expires —
    // the only sustainable streaming-dedup shape at 100 TB/day
    val out = in.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val got = runBatches(out, "dedup_ww", Seq(
      () => in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(1, ts(1), 1, "click", 1.0)),
      () => in.addData(Ev(2, ts(30), 2, "view", 2.0)), // watermark → 10:20, key 1 evicted
      () => in.addData(Ev(1, ts(31), 1, "click", 9.0)))) // same key AFTER eviction: re-emitted
    got.select("event_id").as[Long].collect().sorted shouldBe Array(1L, 1L, 2L)
  }

  test("session windows split on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = StreamingIngest.sessionCounts(
      in.toDF(), lateness = "5 minutes", gap = "10 minutes")
    val got = runBatches(out, "sessions", Seq(
      // user 1: events at 10:00, 10:05 (one session), then 10:30 (a second)
      () => in.addData(Ev(1, ts(0), 1, "a", 0), Ev(2, ts(5), 1, "a", 0),
        Ev(3, ts(30), 1, "a", 0)),
      () => in.addData(Ev(9, ts(59), 7, "a", 0)))) // push watermark past both sessions
    val sessions = got.filter(col("user_id") === 1).collect()
    sessions.length shouldBe 2
    sessions.map(_.getLong(2)).sorted shouldBe Array(1L, 2L)
  }

  test("idempotent foreachBatch sink: replayed batch is not double-written") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val in = MemoryStream[Ev]
    val writer = StreamingIngest.idempotentParquetSink(
      in.toDF(), s"$dir/out", s"$dir/ckpt")
    val q = writer.trigger(Trigger.ProcessingTime(0)).start()
    try { in.addData(Ev(1, ts(0), 1, "a", 0)); q.processAllAvailable() }
    finally q.stop()
    // simulate a replay of batch 0 (restart between write and commit):
    // fence file for batch-0 already exists → write must be skipped
    val replay = Seq(Ev(1, ts(0), 1, "a", 0)).toDF()
    val fence = new org.apache.hadoop.fs.Path(s"$dir/out/_fence/batch-0")
    val fs = fence.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(fence) shouldBe true
    if (fs.createNewFile(fence)) replay.write.mode("append").parquet(s"$dir/out/data")
    spark.read.parquet(s"$dir/out/data").count() shouldBe 1L
  }

  test("stream-static join: the dimension enriches each micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val in = MemoryStream[Ev]
    val out = in.toDF().join(dim, Seq("user_id"), "left")
    val got = runBatches(out, "enriched", Seq(
      () => in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 2, "view", 1.0),
        Ev(3, ts(2), 9, "view", 1.0))))
    got.collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier"))
      .toMap shouldBe Map(1L -> "gold", 2L -> "silver", 3L -> null)
  }

  test("stream-stream interval join honors watermarked time bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val l = clicks.toDF().select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts")).withWatermark("click_ts", "1 hour")
    val r = views.toDF().select(col("event_id").as("view_id"),
      col("user_id").as("v_user"), col("ts").as("view_ts")).withWatermark("view_ts", "1 hour")
    // a view within 10 minutes AFTER a click by the same user
    val joined = l.join(r,
      col("user_id") === col("v_user") &&
      col("view_ts") >= col("click_ts") &&
      col("view_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      clicks.addData(Ev(1, ts(0), 1, "click", 0), Ev(2, ts(30), 2, "click", 0))
      views.addData(
        Ev(10, ts(5), 1, "view", 0),   // joins click 1 (within 10 min)
        Ev(11, ts(20), 1, "view", 0),  // outside the bound → dropped
        Ev(12, ts(31), 2, "view", 0))  // joins click 2
      q.processAllAvailable()
    } finally q.stop()
    spark.table("ssjoin").select("click_id", "view_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet shouldBe Set((1L, 10L), (2L, 12L))
  }

  test("file source: newly landed files are picked up incrementally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-filesrc").toString
    Seq(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 2, "view", 1.0))
      .toDF().write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(Seq.empty[Ev].toDF().schema)
      .parquet(dir)
      .groupBy(col("event_type")).count()
    val q = stream.writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      spark.table("filesrc").collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap shouldBe Map("click" -> 1L, "view" -> 1L)
      // a second file lands: the SAME query must fold it in incrementally
      Seq(Ev(3, ts(2), 3, "click", 1.0)).toDF().write.mode("append").parquet(dir)
      q.processAllAvailable()
      spark.table("filesrc").collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap shouldBe Map("click" -> 2L, "view" -> 1L)
    } finally q.stop()
  }

  test("maxFilesPerTrigger bounds each micro-batch (ingest backpressure)") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-bp-src").toString
    // land 4 separate files
    (0 until 4).foreach { i =>
      Seq(Ev(i.toLong, ts(i), i.toLong, "click", 1.0)).toDF()
        .write.mode("append").parquet(src)
    }
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .schema(Seq.empty[Ev].toDF().schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchSizes.add(batch.count()); ()
      }
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    // 4 files → 4 bounded micro-batches, every row exactly once
    batchSizes.asScala.toSeq.count(_ > 0) shouldBe 4
    batchSizes.asScala.sum shouldBe 4L
    batchSizes.asScala.max should be <= 1L
  }

  test("checkpointed restart resumes from committed offsets, not from scratch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-ckpt-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Unit = {
      // a fresh query object each time = a process restart; only the
      // checkpoint directory carries state across runs
      val q = spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select("event_id").collect().foreach(r => seen.add(r.getLong(0)))
        }
        .start()
      q.awaitTermination()
    }
    Seq(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 2, "view", 1.0))
      .toDF().write.mode("append").parquet(src)
    runOnce()
    seen.toArray.toSet shouldBe Set(1L, 2L)
    Seq(Ev(3, ts(2), 3, "click", 1.0)).toDF().write.mode("append").parquet(src)
    runOnce()
    // the old files are still in src; a restart that re-read them would
    // emit 1/2 again — exactly-once resume means only the new file arrives
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq.sorted shouldBe Seq(1L, 2L, 3L)
  }

  test("aggregation state survives a checkpointed restart") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-ckpt2-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    val latest = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(src)
        .groupBy(col("event_type")).count()
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r => latest.put(r.getString(0), r.getLong(1)))
        }
        .start()
      q.awaitTermination()
    }
    Seq(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 2, "click", 1.0))
      .toDF().write.mode("append").parquet(src)
    runOnce()
    latest.get("click") shouldBe 2L
    // restart, then one more click: the updated count must CONTINUE from
    // the recovered state (3), not restart at 1
    Seq(Ev(3, ts(2), 3, "click", 1.0)).toDF().write.mode("append").parquet(src)
    runOnce()
    latest.get("click") shouldBe 3L
  }

  test("timer sessions merge ACROSS micro-batches and close only via the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx = spark.sqlContext
    // transformWithState needs column families → RocksDB provider only
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val in = MemoryStream[Ev]
    val sessions = in.toDF()
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .transformWithState(
        new SessionFinalizer(gapMs = 10 * 60 * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_us", "n_events")
    val got = runBatches(sessions, "timer_sessions", Seq(
      // batch 1: user 1 two events 1 min apart (one open session), user 2 one
      () => in.addData(Ev(1, ts(0), 1, "click", 1.0),
                       Ev(2, ts(1), 1, "click", 1.0),
                       Ev(3, ts(0), 2, "view", 1.0)),
      // batch 2: user 1 continues within the gap — the open session must
      // MERGE (old timer deleted, new one at 10:05+gap), not emit
      () => in.addData(Ev(4, ts(5), 1, "click", 1.0)),
      // batch 3: far-future event pushes the watermark past every
      // registered timer → sessions for users 1 and 2 close and emit
      () => in.addData(Ev(5, Timestamp.valueOf("2026-01-01 13:00:00"), 99, "view", 1.0)),
      // batch 4: one more tick so the fired timers' output is drained
      () => in.addData(Ev(6, Timestamp.valueOf("2026-01-01 14:00:00"), 99, "view", 1.0))))
    val rows = got.filter(col("user_id") < 99)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // user 1: ONE session (10:00 start, 3 events) — two emitted sessions
    // would mean the cross-batch merge failed
    rows(1L) shouldBe ((ts(0).getTime * 1000L, 3L))
    rows(2L) shouldBe ((ts(0).getTime * 1000L, 1L))
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("out-of-order events the watermark admits sessionize like batch: earlier sessions and bridging") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val sessions = in.toDF()
        .withWatermark("ts", "1 hour") // generous delay ADMITS the late rows
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .transformWithState(
          new SessionFinalizer(gapMs = 10 * 60 * 1000L),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF("user_id", "start_us", "n_events")
      val got = runBatches(sessions, "ooo_sessions", Seq(
        // user 1: one event at 10:30; user 2: two sessions (10:00, 10:16)
        () => in.addData(Ev(1, ts(30), 1, "click", 1.0),
                         Ev(2, ts(0), 2, "view", 1.0),
                         Ev(3, ts(16), 2, "view", 1.0)),
        // out-of-order but watermark-admitted: user 1 gets 10:00 (more
        // than a gap BEFORE its open session → separate earlier session,
        // NOT a merge); user 2 gets 10:08 (bridges its two sessions)
        () => in.addData(Ev(4, ts(0), 1, "click", 1.0),
                         Ev(5, ts(8), 2, "view", 1.0)),
        // push the watermark past every timer, then drain the firings
        () => in.addData(Ev(6, Timestamp.valueOf("2026-01-01 15:00:00"), 99, "view", 1.0)),
        () => in.addData(Ev(7, Timestamp.valueOf("2026-01-01 16:00:00"), 99, "view", 1.0))))
      val rows = got.filter(col("user_id") < 99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      rows shouldBe Set(
        (1L, ts(0).getTime * 1000L, 1L),   // the late event's OWN session
        (1L, ts(30).getTime * 1000L, 1L),  // untouched original session
        (2L, ts(0).getTime * 1000L, 3L))   // 10:08 bridged 10:00 and 10:16
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("state store data source reads checkpointed aggregation state offline") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-ssr-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssr").toString
    Seq(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 2, "click", 1.0),
        Ev(3, ts(2), 3, "view", 1.0))
      .toDF().write.mode("append").parquet(src)
    val q = spark.readStream.schema(Seq.empty[Ev].toDF().schema).parquet(src)
      .groupBy(col("event_type")).count()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      // must process EVERY partition or the state stores never commit
      // (Spark validates per-partition commits since 4.x)
      .foreachBatch { (batch: DataFrame, _: Long) => batch.count(); () }
      .start()
    q.awaitTermination()
    // the production debugging surface for stateful streaming: inspect a
    // query's state WITHOUT replaying it — `statestore` reads the live
    // per-key state, `state-metadata` the operator layout
    val meta = spark.read.format("state-metadata").load(ckpt)
    meta.select("operatorName").as[String].collect() should contain("stateStoreSave")
    val state = spark.read.format("statestore").load(ckpt)
      .select(col("key.event_type").as("event_type"),
              col("value.count").as("n"))
      .as[(String, Long)].collect().toMap
    state shouldBe Map("click" -> 2L, "view" -> 1L)
  }

  test("task tracker: completed and failed tasks report and drop state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TaskEvent]
    val out = TaskTracker.track(spark, in.toDS(), workTimeoutMs = 3600 * 1000L)
    val q = out.writeStream.format("memory").queryName("fsm")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        TaskEvent("job-1", 0, Started, ts(0), ""),
        TaskEvent("job-1", 0, Progress, ts(1), ""),
        TaskEvent("job-1", 0, Progress, ts(2), ""),
        TaskEvent("job-1", 0, Completed, ts(3), "ok"),
        TaskEvent("job-1", 1, Started, ts(0), ""),
        TaskEvent("job-1", 1, Failed, ts(2), "boom"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("fsm").as[TaskReport].collect()
      .map(r => r.taskNumber -> r).toMap
    rows(0).status shouldBe Completed
    rows(0).updates shouldBe 2
    rows(1).status shouldBe Failed
    rows(1).reason shouldBe "boom"
  }

  test("task tracker: a task with no terminal event expires via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TaskEvent]
    // 5-minute work timeout so watermark can overtake it quickly
    val out = TaskTracker.track(spark, in.toDS(), workTimeoutMs = 5 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("fsm_exp")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(TaskEvent("job-2", 7, Started, ts(0), ""))
      q.processAllAvailable()
      // other-key traffic advances the watermark past 10:05 + slack
      in.addData(TaskEvent("job-2", 8, Started, ts(30), ""))
      q.processAllAvailable()
      in.addData(TaskEvent("job-2", 8, Progress, ts(45), ""))
      q.processAllAvailable()
    } finally q.stop()
    val expired = spark.table("fsm_exp").as[TaskReport].collect()
      .filter(_.status == Expired)
    expired.map(_.taskNumber) should contain(7)
  }

  // ---- Kafka surface (broker-gated: no broker or connector jar here, so
  // ---- load()/start() are exercised on a cluster; options + the JSON
  // ---- payload bridge are the locally-testable contract)

  test("KafkaConfig builds the documented source/sink option maps") {
    val cfg = StreamingIngest.KafkaConfig(
      bootstrapServers = "broker-1:9092,broker-2:9092",
      topic = "graft-events",
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(50000L),
      extra = Map("kafka.security.protocol" -> "SASL_SSL"))
    cfg.sourceOptions shouldBe Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "subscribe" -> "graft-events",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.security.protocol" -> "SASL_SSL")
    cfg.sinkOptions shouldBe Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "topic" -> "graft-events",
      "kafka.security.protocol" -> "SASL_SSL")
    // reader/writer wiring constructs without a connector (load/start
    // are the broker-gated calls)
    StreamingIngest.kafkaReader(spark, cfg) should not be null
  }

  test("Kafka JSON payload bridge round-trips typed rows (batch twin of source+sink)") {
    import spark.implicits._
    val events = Seq(
      Ev(1L, ts(0), 10L, "click", 1.5),
      Ev(2L, ts(1), 11L, "view", 2.5)).toDF()
    val ddl = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    val wire = StreamingIngest.toKafkaPayload(events, keyCol = Some("user_id"))
    wire.columns.toSeq shouldBe Seq("key", "value")
    val back = StreamingIngest.parseJsonPayload(wire, ddl)
    back.as[Ev].collect().sortBy(_.event_id) shouldBe
      events.as[Ev].collect().sortBy(_.event_id)
  }

  test("live socket ingest: serveLines → socket source → JSON bridge → typed rows") {
    // the executed half of the network-ingest surface (gate q130 runs it
    // at fixture scale): a real TCP round-trip through Spark's socket
    // source into the SAME parseJsonPayload bridge the Kafka reader uses
    val n = 5
    val lines = (1 to n).map(i =>
      s"""{"event_id":$i,"event_type":"e$i","value":$i.5}""")
    val ddl = "event_id BIGINT, event_type STRING, value DOUBLE"
    val server = StreamingIngest.serveLines(lines)
    try {
      val parsed = StreamingIngest.readEventSocket(
        spark, "127.0.0.1", server.getLocalPort, ddl)
      parsed.isStreaming shouldBe true
      val q = parsed.writeStream.format("memory")
        .queryName("socket_spec_sink").outputMode("append")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var seen = 0L
      while (seen < n && System.nanoTime() < deadline) {
        q.processAllAvailable()
        seen = spark.table("socket_spec_sink").count()
        if (seen < n) Thread.sleep(20)
      }
      q.stop(); q.awaitTermination()
      val rows = spark.table("socket_spec_sink").orderBy("event_id").collect()
      rows.map(_.getLong(0)).toSeq shouldBe (1L to n.toLong)
      rows.map(_.getString(1)).toSeq shouldBe (1 to n).map("e" + _)
      rows.map(_.getDouble(2)).toSeq shouldBe (1 to n).map(_ + 0.5)
    } finally server.close()
  }

  test("socket ingest restart mid-drain: reconnect replays at-least-once, key-dedup lands the oracle rows exactly") {
    // the q130 restart contract EXECUTED (r12 brief #4): incarnation 1
    // is stopped mid-drain (the server delivered only half the feed to
    // its connection), incarnation 2 reconnects and the server —
    // like a rewound Kafka offset — replays the FULL feed. Raw union
    // therefore holds real duplicates; dropDuplicates("event_id") must
    // equal the feed exactly.
    val n = 40
    val half = 15
    val events = (1 to n).map(i => Ev(i.toLong, ts(i % 60), 100L + i,
      s"type${i % 3}", i + 0.25))
    val lines = events.map(e =>
      s"""{"event_id":${e.event_id},"user_id":${e.user_id},""" +
      s""""event_type":"${e.event_type}","value":${e.value}}""")
    val ddl = "event_id BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE"
    // phased server: connection 1 receives only the first `half` lines
    // (then holds, so the client is genuinely mid-stream when stopped);
    // every later connection receives the full payload
    val server = new java.net.ServerSocket(
      0, 1, java.net.InetAddress.getLoopbackAddress)
    val connections = new java.util.concurrent.atomic.AtomicInteger(0)
    val serverThread = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val which = connections.incrementAndGet()
        try {
          val payload = (if (which == 1) lines.take(half) else lines)
            .mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val os = sock.getOutputStream
          os.write(payload); os.flush()
          sock.getInputStream.read() // hold until the client hangs up
        } catch { case _: Throwable => () }
        finally { try sock.close() catch { case _: Throwable => () } }
      } catch { case _: Throwable => () }
    }, "graft-socket-restart-server")
    serverThread.setDaemon(true)
    serverThread.start()
    try {
      def incarnation(sinkName: String, until: Long): Unit = {
        val q = StreamingIngest.readEventSocket(
            spark, "127.0.0.1", server.getLocalPort, ddl)
          .writeStream.format("memory").queryName(sinkName)
          .outputMode("append")
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var seen = 0L
        while (seen < until && System.nanoTime() < deadline) {
          q.processAllAvailable()
          seen = spark.table(sinkName)
            .select(countDistinct(col("event_id"))).head().getLong(0)
          if (seen < until) Thread.sleep(20)
        }
        q.stop(); q.awaitTermination()
        seen should be >= until
      }
      incarnation("socket_restart_sink1", half) // …stopped mid-drain
      incarnation("socket_restart_sink2", n)    // restart: full replay
      connections.get() should be >= 2
      val raw = spark.table("socket_restart_sink1")
        .unionByName(spark.table("socket_restart_sink2"))
      // at-least-once is REAL: the replayed half showed up twice
      raw.count() should be >= (n + half).toLong
      // and the ingest-side key dedup lands exactly the feed
      val got = raw.dropDuplicates("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3))).toSet
      got shouldBe events.map(e =>
        (e.event_id, e.user_id, e.event_type, e.value)).toSet
    } finally { try server.close() catch { case _: Throwable => () } }
  }

  test("streaming minhash near-dup (q104) equals the batch banded+agreement pipeline") {
    val streamed = graft.SparkEntry.queries("q104_streaming_minhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the batch twin: kernel signatures → band hashes → candidate pairs →
    // signature-agreement fraction, all in one declarative plan
    val (k, bands) = (32, 8)
    val rows = k / bands
    val sigs = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.operators.Dedup.minhashSigKernel(col("text"), 3, k).as("sig"))
    val bandHashes = array((0 until bands).map(b =>
      graft.functions.PortableHash.md5_64(concat_ws(",",
        transform(slice(col("sig"), b * rows + 1, rows), _.cast("string"))))): _*)
    val banded = sigs.select(col("doc_id"), col("sig"), posexplode(bandHashes))
      .toDF("doc_id", "sig", "band", "bh")
    val batch = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
              col("a.sig").as("s1"), col("b.sig").as("s2"))
      .distinct()
      .withColumn("est", expr(
        s"size(filter(zip_with(s1, s2, (x, y) -> x = y), v -> v)) / CAST($k AS DOUBLE)"))
      .filter(col("est") >= 0.5)
      .select(col("id1"), col("id2"), round(col("est"), 6).as("sig_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    streamed shouldBe batch
    streamed should not be empty // the corpus plants near-dups; a silent empty set would vacuously pass
  }
}
