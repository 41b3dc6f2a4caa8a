package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Event-stream-shaped queries over the `events` table. These are the
  * batch twins of the Structured Streaming pipeline in graft.streaming:
  * identical transformations run under `readStream` in StreamingSpec,
  * asserting batch/stream result equality. Here they run as batch for the
  * DuckDB oracle.
  */
object EventQueries {

  /** Stage the events table into a directory (the file stream source
    * consumes directories) and open it as a micros-truncated readStream —
    * shared by the executed-streaming gates q76/q77.
    */
  private def eventsStream(s: org.apache.spark.sql.SparkSession, d: String) = {
    val (dir, rawSchema) = stageEventsDir(s, d, "events_stream")
    tsMicros(s.readStream.schema(rawSchema).parquet(dir.toString))
  }

  /** Normalize the raw `ts` column to TimestampType regardless of fixture
    * generation — nanos-as-long gets the floor-truncate to micros, a native
    * timestamp (TIMESTAMP_NTZ under the default parquet reader) is cast
    * in place (sessions pin UTC, so the cast is value-preserving). The
    * streaming twin of Tables.events' dispatch.
    */
  private def tsMicros(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  /** Stage documents.parquet as a 4-file stream-source directory (4
    * micro-batches under maxFilesPerTrigger=1), re-staging whenever the
    * SOURCE fixture is newer than the staging marker — a driver-side
    * fixture regeneration (the r5 events.ts incident) must never leave a
    * streaming gate reading stale staged data. Shared by q101/q104.
    */
  private def stageDocsDir(s: org.apache.spark.sql.SparkSession,
      d: String): java.nio.file.Path =
    Staging.stageIfStale(d, "docs_stream4", "documents.parquet") { dir =>
      Tables.documents(s, d).repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
    }

  /** Stage events.parquet into a per-gate file-stream source directory
    * (the file source consumes directories); returns (dir, raw schema).
    * Shared by every executed-streaming gate.
    */
  private def stageEventsDir(s: org.apache.spark.sql.SparkSession, d: String,
      name: String): (java.nio.file.Path, org.apache.spark.sql.types.StructType) = {
    val sf = java.nio.file.Paths.get(d).getFileName.toString
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_export", sf, name)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(d, "events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // same probe-first dispatch as Tables.events: only a TIMESTAMP(NANOS)
    // footer (which fails schema inference) sets nanosAsLong, and it must
    // then stay set for the streaming scan of the same footer
    val schema =
      try s.read.parquet(s"$d/events.parquet").schema
      catch { case _: org.apache.spark.sql.AnalysisException =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(s"$d/events.parquet").schema
      }
    (dir, schema)
  }

  /** Run `body` with fewer shuffle partitions (state-store setup cost is
    * per partition) and, optionally, the RocksDB state store provider —
    * restoring both afterwards. Shared by the executed-streaming gates.
    */
  private def withStreamConf[T](s: org.apache.spark.sql.SparkSession,
      parts: String, rocksdb: Boolean)(body: => T): T = {
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.shuffle.partitions", parts)
    if (rocksdb) s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      if (rocksdb) prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** Dialect-shared WITH RECURSIVE spine: every day between the corpus's
    * first and last event, left-joined back to per-day activity (days
    * with zero events survive). Runs verbatim on both engines.
    */
  val recursiveSpineSql: String = """
    WITH RECURSIVE days(d, maxd) AS (
      SELECT CAST(min(ts) AS DATE), CAST(max(ts) AS DATE) FROM events
      UNION ALL
      SELECT CAST(d + INTERVAL '1' DAY AS DATE), maxd FROM days WHERE d < maxd
    )
    SELECT days.d AS day, count(e.user_id) AS n_events
    FROM days LEFT JOIN events e ON CAST(e.ts AS DATE) = days.d
    GROUP BY days.d"""

  /** Write `rows` as a single named parquet file inside a file-stream
    * source directory — the far-future sentinel batches that push the
    * watermark past all real data so eviction/timers fire before
    * AvailableNow terminates (q89/q98).
    */
  private def sentinelFile(s: org.apache.spark.sql.SparkSession,
      dir: java.nio.file.Path,
      rawSchema: org.apache.spark.sql.types.StructType, name: String,
      rows: java.util.List[org.apache.spark.sql.Row]): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // Callers always put epoch-NANOS longs in the ts slot; rewrite them to
    // whatever type the staged fixture's schema actually declares so the
    // sentinel file is readable alongside the real data.
    val tsIdx = rawSchema.fieldIndex("ts")
    def fix(r: Row): Row = rawSchema(tsIdx).dataType match {
      case LongType => r
      case t =>
        val nanos = r.getLong(tsIdx)
        val inst = java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(nanos, 1000000000L),
          java.lang.Math.floorMod(nanos, 1000000000L))
        val v: Any =
          if (t == TimestampNTZType)
            java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
          else java.sql.Timestamp.from(inst)
        Row.fromSeq(r.toSeq.updated(tsIdx, v))
    }
    val fixed = new java.util.ArrayList[Row](rows.size)
    rows.forEach(r => fixed.add(fix(r)))
    val df = s.createDataFrame(fixed, rawSchema)
    val tmp = dir.resolve("_sentinel_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val part = try listing.toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    finally listing.close()
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      dir.resolve(name), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def defs: Map[String, QueryDef] = Map(

    // Tumbling 1-hour window via Spark's window() — the streaming
    // group-by-event-time shape (readStream + withWatermark in
    // graft.streaming.EventStreams uses this exact aggregation).
    "q70_tumbling_window" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("value")), 4).as("val_sum"))
        .select(col("window.start").as("hour_start"), col("event_type"),
                col("n"), col("val_sum")),
      Some("""
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS n, round(sum(value), 4) AS val_sum
        FROM events GROUP BY 1, 2""")),

    // The SAME aggregation executed through the real streaming path:
    // readStream (file source) → watermark → windowed agg → memory sink,
    // drained with Trigger.AvailableNow — the gate proves the streaming
    // engine reproduces the batch oracle, not just that a batch twin does.
    "q76_streaming_tumbling" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val stream = eventsStream(s, d)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
               round(sum(col("value")), 4).as("val_sum"))
          .select(col("window.start").as("hour_start"), col("event_type"),
                  col("n"), col("val_sum"))
        val q = stream.writeStream.format("memory").queryName("q76_sink")
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("q76_sink")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS n, round(sum(value), 4) AS val_sum
        FROM events GROUP BY 1, 2""")),

    // Arbitrary stateful processing executed end-to-end: a per-user
    // running counter in mapGroupsWithState (the custom-state API the
    // TaskTracker FSM builds on), drained with AvailableNow in update
    // mode; the batch oracle is a plain GROUP BY count. State is one
    // long per user — bounded, keyed, store-backed.
    "q83_streaming_stateful_count" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
        import s.implicits._
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val counted = eventsStream(s, d)
            .select(col("user_id")).as[Long]
            .groupByKey(identity)
            .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
              (user: Long, rows: Iterator[Long],
               state: org.apache.spark.sql.streaming.GroupState[Long]) =>
                val n = state.getOption.getOrElse(0L) + rows.size
                state.update(n)
                (user, n)
            }
            .toDF("user_id", "n_events")
          val q = counted.writeStream.format("memory").queryName("q83_sink")
            .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          // update mode re-emits a key per trigger; keep the final count
          s.table("q83_sink").groupBy(col("user_id"))
            .agg(max(col("n_events")).as("n_events"))
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      Some("""
        SELECT user_id, count(*) AS n_events
        FROM events GROUP BY user_id""")),

    // The Spark 4 transformWithState API executed on the RocksDB state
    // store — the production pairing (named typed state cells; state on
    // local SSD + changelog, not executor heap). Same per-user counter
    // contract as q83's mapGroupsWithState, same GROUP BY oracle.
    "q90_transform_with_state" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        import s.implicits._
        withStreamConf(s, parts = "8", rocksdb = true) {
          val counted = eventsStream(s, d)
            .select(col("user_id")).as[Long]
            .groupByKey(identity)
            .transformWithState(new graft.streaming.PerKeyCounter,
              TimeMode.None(), OutputMode.Update())
            .toDF("user_id", "n_events")
          val q = counted.writeStream.format("memory").queryName("q90_sink")
            .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.table("q90_sink").groupBy(col("user_id"))
            .agg(max(col("n_events")).as("n_events"))
        }
      },
      Some("""
        SELECT user_id, count(*) AS n_events
        FROM events GROUP BY user_id""")),

    // Event-time TIMERS on transformWithState (the distinctive half of
    // the Spark 4 arbitrary-state API): per-user sessions are CLOSED by
    // the watermark passing last_event+gap — handleExpiredTimer emits
    // the session and clears the key's state, so idle keys cost nothing
    // once their gap elapses. Runs on the RocksDB state store like q90;
    // two far-future sentinels (negative user, dropped from the sink)
    // flush every real timer before AvailableNow terminates. The oracle
    // is plain batch sessionization — the streaming path must reproduce
    // it exactly, per-session rows included.
    "q98_stateful_timers" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        import s.implicits._
        val (dir, rawSchema) = stageEventsDir(s, d, "events_timers")
        // timer firing runs one batch behind the watermark update (same
        // reason as q89's eviction) — two sentinel batches
        Seq(("zz1_sentinel.parquet", 4102444800000000000L),
            ("zz2_sentinel.parquet", 4133980800000000000L)).foreach {
          case (name, nanos) =>
            sentinelFile(s, dir, rawSchema, name, java.util.Arrays.asList(
              org.apache.spark.sql.Row(-1L, nanos, -1L, "click", 0.0, "{}")))
        }
        withStreamConf(s, parts = "8", rocksdb = true) {
          val sessions = tsMicros(s.readStream.schema(rawSchema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(dir.toString))
            .withWatermark("ts", "0 seconds")
            .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
            .as[(Long, Long)]
            .groupByKey(_._1)
            .mapValues(_._2)
            .transformWithState(
              new graft.streaming.SessionFinalizer(gapMs = 10 * 60 * 1000L),
              TimeMode.EventTime(), OutputMode.Append())
            .toDF("user_id", "start_us", "n_events")
            .select(col("user_id"),
                    timestamp_micros(col("start_us")).as("session_start"),
                    col("n_events"))
          val q = sessions.writeStream.format("memory").queryName("q98_sink")
            .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.table("q98_sink").filter(col("user_id") >= 0)
        }
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 10 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM marked)
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events
        FROM sessions GROUP BY user_id, sid""")),

    // Session windows executed through the REAL streaming path (the q72
    // batch twin's agg run via readStream): stateful session merging on
    // the state store, drained with AvailableNow, complete mode so final
    // in-lateness sessions are emitted too. Fewer partitions for the
    // same state-store-setup reason as q77.
    "q82_streaming_session" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val stream = eventsStream(s, d)
            .withWatermark("ts", "1 hour")
            .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
            .agg(count(lit(1)).as("n_events"))
            .select(col("user_id"), col("n_events"))
          val q = stream.writeStream.format("memory").queryName("q82_sink")
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.table("q82_sink")
            .groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_sessions"),
                 max(col("n_events")).as("max_session_events"),
                 sum(col("n_events")).as("total_events"))
        } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      },
      Some("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 10 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        sessions AS (
          SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n_events
          FROM sessions GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_sessions,
               max(n_events) AS max_session_events,
               CAST(sum(n_events) AS BIGINT) AS total_events
        FROM per_session GROUP BY 1""")),

    // Stream-STREAM interval join executed through the real streaming
    // path: clicks join purchases of the same user within 30 minutes,
    // both sides watermarked (the event-time bound lets the engine expire
    // join state — unbounded state otherwise), drained with AvailableNow.
    // Oracle = the equivalent batch interval join.
    "q77_streaming_interval_join" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        // a stream-stream join opens FOUR state stores per shuffle
        // partition; at this volume store setup dominates, so run the
        // stateful query on fewer partitions (restored after start —
        // the conf is captured at query start)
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val clicks = eventsStream(s, d)
          .filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
                  col("ts").as("click_ts"))
          .withWatermark("click_ts", "1 hour")
        val purchases = eventsStream(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
                  col("user_id").as("p_user"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "1 hour")
        val joined = clicks.join(purchases,
          col("user_id") === col("p_user") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("interval 30 minutes"))
          .select(col("click_id"), col("purchase_id"))
        val q = joined.writeStream.format("memory").queryName("q77_sink")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination()
        finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        s.table("q77_sink")
      },
      Some("""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'""")),

    // Stream-stream LEFT OUTER join executed through the real streaming
    // path: every click joins purchases of the same user within 30
    // minutes; clicks with NO purchase must still be emitted (with null
    // purchase_id), which only happens when the watermark passes their
    // join window and evicts their state. Two far-future sentinel rows
    // (one per side, negative user ids, filtered from the output) push
    // both sides' watermarks past every real event, so ALL unmatched
    // clicks are null-emitted before AvailableNow terminates — the result
    // equals the batch LEFT JOIN oracle exactly.
    "q89_streaming_left_outer" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val (dir, rawSchema) = stageEventsDir(s, d, "events_louter")
        // TWO sentinel files (2100 and 2101, one click + one purchase
        // each, negative ids): the first pushes both watermarks past all
        // real data; outer-join EVICTION runs one batch behind the
        // watermark update, so the second sentinel's batch is what
        // null-emits the last unmatched real clicks. maxFilesPerTrigger=1
        // guarantees the files become separate micro-batches.
        def writeSentinel(name: String, nanos: Long): Unit =
          sentinelFile(s, dir, rawSchema, name, java.util.Arrays.asList(
            org.apache.spark.sql.Row(-1L, nanos, -1L, "click", 0.0, "{}"),
            org.apache.spark.sql.Row(-2L, nanos, -2L, "purchase", 0.0, "{}")))
        writeSentinel("zz1_sentinel.parquet", 4102444800000000000L) // 2100
        writeSentinel("zz2_sentinel.parquet", 4133980800000000000L) // 2101
        // parts=4 measured consistently faster than 8 for this gate (the
        // outer join keeps 4 state stores per side per batch; fewer
        // instances beat parallelism at this state size)
        withStreamConf(s, parts = "4", rocksdb = false) {
          def stream = tsMicros(s.readStream.schema(rawSchema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(dir.toString))
          val clicks = stream.filter(col("event_type") === "click")
            .select(col("event_id").as("click_id"), col("user_id"),
                    col("ts").as("click_ts"))
            .withWatermark("click_ts", "1 hour")
          val purchases = stream.filter(col("event_type") === "purchase")
            .select(col("event_id").as("purchase_id"),
                    col("user_id").as("p_user"), col("ts").as("p_ts"))
            .withWatermark("p_ts", "1 hour")
          // NB: no sentinel filter inside the streaming query — a filter on
          // the left side's columns would be PUSHED BELOW the watermark
          // node, the sentinel click would never reach it, and the global
          // (min-of-sides) watermark would stall at the real data's max.
          // Sentinels are dropped from the materialized sink instead.
          val joined = clicks.join(purchases,
            col("user_id") === col("p_user") &&
            col("p_ts") >= col("click_ts") &&
            col("p_ts") <= col("click_ts") + expr("interval 30 minutes"),
            "left_outer")
            .select(col("click_id"), col("purchase_id"))
          val q = joined.writeStream.format("memory").queryName("q89_sink")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.table("q89_sink").filter(col("click_id") >= 0)
        }
      },
      Some("""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id
        FROM events c LEFT JOIN events p
          ON c.user_id = p.user_id AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click'""")),

    // Time-series resample + gap fill: a per-user daily spine (generated
    // with sequence(), one row per day between the user's first and last
    // activity), missing days zero-filled for counts and forward-filled
    // for the running value (last non-null over an ordered window). The
    // spine generation is per-group arithmetic — no cross join against a
    // global calendar — and the fill is one window per user partition.
    "q66_gapfill_resample" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"),
               round(sum(col("value")), 4).as("day_value"))
        val spine = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"),
                  explode(sequence(col("d0"), col("d1"),
                    expr("interval 1 day"))).as("day"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
                  coalesce(col("n_events"), lit(0L)).as("n_events"),
                  last(col("day_value"), ignoreNulls = true).over(w)
                    .as("filled_value"))
      },
      Some("""
        WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
                              count(*) AS n_events,
                              round(sum(value), 4) AS day_value
                       FROM events GROUP BY 1, 2),
        spine AS (SELECT user_id,
                         unnest(generate_series(min(day), max(day),
                                                INTERVAL 1 DAY)) AS day
                  FROM daily GROUP BY user_id),
        f AS (SELECT s.user_id, s.day,
                     coalesce(d.n_events, 0) AS n_events, d.day_value
              FROM spine s LEFT JOIN daily d
                ON s.user_id = d.user_id AND s.day = d.day)
        SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
               last_value(day_value IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        FROM f""")),

    // Recursive CTE (Spark 4 WITH RECURSIVE → UnionLoop): the calendar
    // spine is generated by iteration — anchor row carries (min_day,
    // max_day), each step advances one day until the bound. The SAME
    // string runs verbatim on spark.sql and DuckDB (dialect-shared).
    // Depth = day span (30 here); corpora spanning > 100 days need
    // `WITH RECURSIVE days(...) MAX RECURSION LEVEL n` (Spark-only
    // syntax, so it stays out of the shared string). The recursion
    // itself is cheap (one row per level) — the heavy side stays a
    // single hash join + aggregate over events.
    "q91_recursive_cte" -> QueryDef(
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events")
        s.sql(recursiveSpineSql)
      },
      Some(recursiveSpineSql)),

    // Funnel analysis: per-user view → click → purchase conversion via
    // first-occurrence timestamps (one hash-aggregate over the events,
    // conditional min per stage — no self-joins, no window sorts).
    "q65_funnel_conversion" -> QueryDef(
      (s, d) => {
        val firsts = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
               min(when(col("event_type") === "click", col("ts"))).as("t_click"),
               min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
        firsts.agg(
          count(lit(1)).as("n_users"),
          count(col("t_view")).as("n_viewed"),
          count(when(col("t_view") < col("t_click"), 1)).as("n_clicked_after_view"),
          count(when(col("t_view") < col("t_click") &&
                     col("t_click") < col("t_buy"), 1)).as("n_converted"))
      },
      Some("""
        WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
          FROM events GROUP BY 1)
        SELECT count(*) AS n_users,
               count(t_view) AS n_viewed,
               count(CASE WHEN t_view < t_click THEN 1 END) AS n_clicked_after_view,
               count(CASE WHEN t_view < t_click AND t_click < t_buy THEN 1 END) AS n_converted
        FROM f""")),

    // Sliding windows: 2-hour window sliding by 1 hour — each event lands
    // in two windows. Oracle unions the two aligned tumbling offsets.
    "q71_sliding_window" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n")),
      Some("""
        SELECT win_start, count(*) AS n FROM (
          SELECT date_trunc('hour', ts) AS win_start FROM events
          UNION ALL
          SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS win_start FROM events)
        GROUP BY 1""")),

    // Session windows (10-minute gap) per user: Spark's session_window;
    // oracle reproduces gap-merge semantics with lag + running sum.
    "q72_session_window" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
             max(col("n_events")).as("max_session_events"),
             sum(col("n_events")).as("total_events")),
      Some("""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 10 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        sessions AS (
          SELECT user_id,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM marked),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n_events
          FROM sessions GROUP BY 1, 2)
        SELECT user_id, count(*) AS n_sessions,
               max(n_events) AS max_session_events,
               CAST(sum(n_events) AS BIGINT) AS total_events
        FROM per_session GROUP BY user_id""")),

    // Streaming-dedup twin: distinct (user, day) pairs → daily active users.
    "q73_daily_active_users" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .dropDuplicates("day", "user_id")
        .groupBy(col("day")).agg(count(lit(1)).as("dau")),
      Some("""
        SELECT day, count(*) AS dau FROM (
          SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events)
        GROUP BY day""")),

    // Pivot: one column per event type (fixed value list → stable schema).
    "q74_pivot_event_types" -> QueryDef(
      (s, d) => Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L),
      Some("""
        SELECT date_trunc('day', ts) AS day,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY 1""")),

    // Cohort retention: users grouped by first-active week, counted in
    // each later week they return — two shuffles (per-user first week,
    // then cohort×offset counts), both on keys that shrink with
    // cardinality, never row count. Week offsets are day-diffs / 7 (both
    // dates are Monday week-starts, so the division is exact).
    "q79_cohort_retention" -> QueryDef(
      (s, d) => {
        val weeks = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
          .distinct()
        val cohorts = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
        weeks.join(cohorts, "user_id")
          .withColumn("k", (datediff(col("wk"), col("cohort")) / 7).cast("long"))
          .groupBy(col("cohort"), col("k"))
          .agg(countDistinct(col("user_id")).as("n_active"))
      },
      Some("""
        WITH w AS (SELECT DISTINCT user_id,
                          CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
             f AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY 1)
        SELECT cohort, CAST(datediff('day', cohort, wk) / 7 AS BIGINT) AS k,
               CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_active
        FROM w JOIN f USING (user_id) GROUP BY 1, 2""")),

    // Scalar "subquery" kept declarative: the singleton aggregate is
    // broadcast-cross-joined, never collected to the driver.
    "q75_scalar_subquery" -> QueryDef(
      (s, d) => {
        val o = Tables.orders(s, d)
        val avgPrice = o.agg(avg(col("o_totalprice")).as("avg_price"))
        o.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("avg_price") * 2)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_big"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_big
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 2
        GROUP BY o_orderpriority""")),

    // SCD type-2 history build: each user's event_type stream collapses
    // into validity intervals (runs of the same state suppressed via lag,
    // intervals assembled via lead) — the warehouse read model over an
    // append-only changelog. One shuffle by key; no global sort.
    "q68_scd2_history" -> QueryDef(
      (s, d) => graft.operators.Cdc.scd2History(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type"),
      Some("""
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                          event_type
                   FROM events),
        c AS (SELECT *, lag(event_type) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
              FROM e),
        ch AS (SELECT * FROM c
               WHERE prev_state IS NULL OR prev_state <> event_type)
        SELECT user_id,
               row_number() OVER w AS version,
               event_type AS state,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")),

    // CDC latest-wins compaction: the changelog collapses to one row per
    // key via max_by over the (ts, event_id) version key — ONE hash
    // aggregate with map-side combine, no window/sort — then keys whose
    // final op is the tombstone ('error' here) drop out.
    "q69_cdc_merge" -> QueryDef(
      (s, d) => graft.operators.Cdc.applyChangelog(
        Tables.events(s, d), "user_id", Seq("ts", "event_id"),
        "event_type", deleteOp = "error", payloadCols = Seq("value", "props")),
      Some("""
        WITH ranked AS (
          SELECT user_id, event_type, value, props,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id, event_type AS last_event_type, value AS last_value,
               props AS last_props
        FROM ranked WHERE rn = 1 AND event_type <> 'error'""")),

    // Cross-batch streaming dedup (q101): the continuous-ingest twin of
    // d01 — documents arrive over 4 micro-batches (1 staged file per
    // trigger) and a transformWithState cell per content hash tracks
    // (min keeper id, count) across batches on RocksDB. Keeper = MIN id,
    // so the last per-key update equals the batch answer regardless of
    // arrival order or batch boundaries; the oracle IS d01's SQL.
    "q101_streaming_dedup" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        import s.implicits._
        val dir = stageDocsDir(s, d)
        val schema = Tables.documents(s, d).schema
        withStreamConf(s, parts = "8", rocksdb = true) {
          val deduped = s.readStream
            .option("maxFilesPerTrigger", "1") // 4 files → 4 batches
            .schema(schema).parquet(dir.toString)
            .select(md5(col("text").cast("binary")).as("content_md5"),
              col("doc_id"))
            .as[(String, Long)]
            .groupByKey(_._1)
            .transformWithState(new graft.streaming.StreamingDeduper,
              TimeMode.None(), OutputMode.Update())
            .toDF("content_md5", "keeper_id", "dup_count")
          val q = deduped.writeStream.format("memory").queryName("q101_sink")
            .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.table("q101_sink").groupBy(col("content_md5"))
            .agg(min(col("keeper_id")).as("keeper_id"),
                 max(col("dup_count")).as("dup_count"))
        }
      },
      Some("""
        SELECT md5(text) AS content_md5, min(doc_id) AS keeper_id,
               count(*) AS dup_count
        FROM documents GROUP BY 1""")),

    // Cross-batch streaming NEAR-dup (q104): the continuous-ingest twin
    // of MinHash-LSH. Signatures come from the same zero-shuffle kernel
    // as d13; band hashes are the same portable band hash as the batch
    // path; bucketing + pairing is a transformWithState per (band,
    // band_hash) on RocksDB (BucketPairer). After the 4-batch drain, the
    // distinct emitted set equals the batch candidates verified at the
    // same signature-agreement threshold — the oracle replays signatures,
    // banding, caps, and the agreement fraction in DuckDB.
    "q104_streaming_minhash_pairs" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        import s.implicits._
        val dir = stageDocsDir(s, d)
        val schema = Tables.documents(s, d).schema
        val (k, bands) = (32, 8)
        val rows = k / bands
        withStreamConf(s, parts = "4", rocksdb = true) {
          val sigs = s.readStream
            .option("maxFilesPerTrigger", "1") // 4 files → 4 batches
            .schema(schema).parquet(dir.toString)
            // one file per micro-batch = a one-task scan stage; spread
            // the signature kernel over the stream's shuffle partitions
            // (r17, guide §2.5 — the batch is file-sized by the source
            // contract, so the repartition is batch-sized by design)
            .repartition(col("doc_id"))
            .select(col("doc_id"),
              graft.operators.Dedup.minhashSigKernel(col("text"), 3, k).as("sig"))
          val bandHashes = array((0 until bands).map(b =>
            graft.functions.PortableHash.md5_64(concat_ws(",",
              transform(slice(col("sig"), b * rows + 1, rows),
                _.cast("string"))))): _*)
          val pairs = sigs
            .select(col("doc_id"), col("sig"), posexplode(bandHashes))
            .toDF("doc_id", "sig", "band", "band_hash")
            .select(col("band"), col("band_hash"), col("doc_id"), col("sig"))
            .as[(Int, Long, Long, Array[Long])]
            .groupByKey(r => (r._1, r._2))
            .mapValues(r => (r._3, r._4))
            .transformWithState(
              new graft.streaming.BucketPairer(threshold = 0.5,
                cap = graft.operators.Dedup.DefaultBucketCap),
              TimeMode.None(), OutputMode.Update())
            .toDF("id1", "id2", "sig_sim")
          val q = pairs.writeStream.format("memory").queryName("q104_sink")
            .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          // cross-band duplicate emissions collapse here; rounding matches
          // the oracle's 6 dp
          s.table("q104_sink").distinct()
            .select(col("id1"), col("id2"),
                    round(col("sig_sim"), 6).as("sig_sim"))
        }
      },
      Some(DedupQueries.minhashSigAgreementOracle(k = 32, bands = 8,
        threshold = 0.5))),

    // The streaming LIFECYCLE FLOOR, measured: the executed-streaming
    // gates (q101/q104, q89/q98, …) each pay a fixed multi-batch setup
    // cost — per-batch planning, a RocksDB state store instance per
    // shuffle partition per batch, checkpoint + commit log, memory
    // sink — that has nothing to do with data volume. This gate runs the
    // IDENTICAL lifecycle to q101/q104 (same 4-file staged source, 1
    // file per trigger, same withStreamConf(parts=4, rocksdb),
    // transformWithState, AvailableNow drain) with the data term cut to
    // ONE row by a pushed-down predicate, so BENCH_DETAIL's q105 value
    // IS the floor: a streaming gate's data term ≈ gate − q105, making
    // per-gate deltas interpretable (a regression can no longer hide
    // inside an unmeasured floor).
    "q105_streaming_lifecycle_floor" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
        import s.implicits._
        val dir = stageDocsDir(s, d)
        val schema = Tables.documents(s, d).schema
        withStreamConf(s, parts = "4", rocksdb = true) {
          val one = s.readStream
            .option("maxFilesPerTrigger", "1") // 4 files → 4 batches
            .schema(schema).parquet(dir.toString)
            .filter(col("doc_id") === 1L) // row-group stats skip the rest
            .select(col("doc_id"))
            .as[Long]
            .groupByKey(identity)
            .transformWithState(new graft.streaming.PerKeyCounter,
              TimeMode.None(), OutputMode.Update())
            .toDF("doc_id", "n")
          val q = one.writeStream.format("memory").queryName("q105_sink")
            .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.table("q105_sink").groupBy(col("doc_id"))
            .agg(max(col("n")).as("n"))
        }
      },
      Some("SELECT CAST(1 AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS n")),

    // Streaming ADMISSION (q106): d16 run as a continuous ingest — the
    // incoming document stream (4 micro-batches) is near-dup-checked
    // against the STATIC existing-corpus index inside foreachBatch.
    // Admission is per-doc against the index (no cross-batch state:
    // candidates, caps, and verification all involve one incoming doc
    // and the static side only), so the drained union over batches
    // equals the batch d16 answer at ANY batch boundary — and the gate
    // shares d16's DuckDB oracle verbatim. The existing side's banded
    // index is computed ONCE and checkpointed across batches
    // (minhashAdmissionIndex — the production continuous-ingest form);
    // only exact verification re-reads existing TEXT, and only for
    // candidate docs (semi-joined first).
    "q106_streaming_admission" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val dir = stageDocsDir(s, d)
        val schema = Tables.documents(s, d).schema
        val existing = Tables.documents(s, d)
          .filter(col("doc_id") % 10 === 0).localCheckpoint()
        val index = graft.operators.Dedup.minhashAdmissionIndex(
          existing, "text", "doc_id", k = 32, bands = 8, shingleN = 3)
          .localCheckpoint()
        val out = java.nio.file.Files.createTempDirectory("graft_q106")
        withStreamConf(s, parts = "4", rocksdb = false) {
          val stream = s.readStream
            .option("maxFilesPerTrigger", "1") // 4 files → 4 batches
            .schema(schema).parquet(dir.toString)
            .filter(col("doc_id") % 10 =!= 0)
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              graft.operators.Dedup.incrementalMinhashIndexed(
                  batch, existing, index, "text", "doc_id",
                  k = 32, bands = 8, shingleN = 3, threshold = 0.5)
                .write.mode("append").parquet(out.toString)
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          s.read.parquet(out.toString)
        }
      },
      Some(DedupQueries.streamingAdmissionOracle)),

    // LIVE network ingest (q130): the one streaming source executed over
    // a REAL network boundary in this sandbox. An in-process loopback TCP
    // server serves the first 500 events as JSON lines; Spark's built-in
    // socket source connects, StreamingIngest.parseJsonPayload decodes
    // into typed rows (the exact bridge readEventKafka uses), and the
    // drained sink must equal the same 500 rows read straight from
    // parquet — bit-exact, because timestamps travel as unix_micros
    // (JSON adds no precision loss on int64/string, and Jackson's double
    // repr round-trips exactly). Kafka itself is broker-gated here (no
    // broker, no connector jar — probed; see StreamingIngest's section
    // note): format("socket") → format("kafka") is the cluster swap, the
    // payload bridge and sink are THIS code. Reference analog: live AMQP
    // consumption, worker/.../amqp/ResponseQueueConsumer.scala.
    "q130_socket_ingest" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val n = 500
        val ddl = "event_id BIGINT, user_id BIGINT, event_type STRING, " +
          "ts_us BIGINT, value DOUBLE"
        // bounded driver-side collect: n JSON lines (the message feed), not
        // data-scale — at 100 TB the server side IS the external system
        val lines = Tables.events(s, d)
          .orderBy("event_id").limit(n)
          .select(to_json(struct(col("event_id"), col("user_id"),
            col("event_type"), unix_micros(col("ts")).as("ts_us"),
            col("value"))).as("v"))
          .collect().map(_.getString(0)).toSeq
        val server = graft.streaming.StreamingIngest.serveLines(lines)
        try {
          withStreamConf(s, parts = "4", rocksdb = false) {
            val parsed = graft.streaming.StreamingIngest.readEventSocket(
              s, "127.0.0.1", server.getLocalPort, ddl)
            val q = parsed.writeStream.format("memory")
              .queryName("q130_sink").outputMode("append")
              .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
            // drain until all n DISTINCT event_ids landed — correctness
            // is defined over distinct ids, and under the at-least-once
            // replay this path anticipates (reconnect after restart) a
            // raw row count could be satisfied by duplicates while ids
            // are still short; hard 90 s deadline so a broken transport
            // fails loudly instead of hanging
            val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
            var seen = 0L
            while (seen < n && System.nanoTime() < deadline) {
              q.processAllAvailable()
              seen = s.table("q130_sink")
                .select(countDistinct(col("event_id"))).head().getLong(0)
              if (seen < n) Thread.sleep(25)
            }
            q.stop(); q.awaitTermination()
            require(seen >= n,
              s"q130: socket ingest drained $seen/$n distinct event_ids")
            // socket delivery is at-least-once across reconnects (a
            // restarted query replays the feed) — key-dedup on ingest
            // makes the gate restart-robust, like Kafka offset replay
            s.table("q130_sink").dropDuplicates("event_id")
          }
        } finally { try server.close() catch { case _: Throwable => () } }
      },
      Some("""
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
        FROM events ORDER BY event_id LIMIT 500""")),

    // Streaming percentile maintenance (q111): q108's mergeable integer
    // histogram run as a continuous ingest — each micro-batch's
    // (lang, bucket) counts land from foreachBatch, and the final
    // extraction merges them with a commutative count-sum. The histogram
    // is a monoid, so the drained result equals the batch computation at
    // ANY batch boundary or arrival order — no cross-batch state store
    // is needed; the append sink IS the state, bounded by bucket keys
    // (≤2k per lang), not rows. The continuously-maintained ops
    // percentile, exact where sketch-based monitoring drifts, and
    // oracled by replaying the batch computation in DuckDB.
    "q111_streaming_quantile" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val dir = stageDocsDir(s, d)
        val schema = Tables.documents(s, d).schema
        val out = java.nio.file.Files.createTempDirectory("graft_q111")
        withStreamConf(s, parts = "4", rocksdb = false) {
          val stream = s.readStream
            .option("maxFilesPerTrigger", "1") // 4 files → 4 batches
            .schema(schema).parquet(dir.toString)
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              graft.operators.QuantileRollup.histogram(
                  batch.select(col("lang"), col("n_chars")),
                  "n_chars", Seq("lang"))
                .write.mode("append").parquet(out.toString)
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          val merged = graft.operators.QuantileRollup.rollup(
            s.read.parquet(out.toString), Seq("lang"))
          graft.operators.QuantileRollup.percentiles(merged, Seq("lang"),
            Seq(0.5, 0.95, 0.99))
        }
      },
      Some("""
        WITH b AS (SELECT lang, n_chars AS v,
                          greatest(length(bin(n_chars)) - 6, 0) AS sh
                   FROM documents),
        h AS (SELECT lang, (v >> sh) << sh AS bucket_lo,
                     ((v >> sh) << sh) + ((CAST(1 AS BIGINT) << sh) - 1) AS bucket_hi,
                     count(*) AS cnt
              FROM b GROUP BY 1, 2, 3),
        c AS (SELECT lang, bucket_lo, bucket_hi, cnt,
                     sum(cnt) OVER (PARTITION BY lang ORDER BY bucket_lo) AS cum,
                     sum(cnt) OVER (PARTITION BY lang) AS n
              FROM h),
        p AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE),
                             CAST(0.99 AS DOUBLE)]) AS p)
        SELECT lang, p, bucket_lo AS est_lo, bucket_hi AS est_hi,
               CAST(n AS BIGINT) AS n
        FROM c CROSS JOIN p
        WHERE cum >= ceil(p * n) AND cum - cnt < ceil(p * n)""")),

    // Link-graph authority scoring (PageRank) in exact integer
    // fixed-point — the crawl-domain quality-weighting primitive (see
    // GraphRank doc: integer micro-units make every iteration
    // order-independent, so K full iterations are hash-oracled where a
    // float PageRank would be rows-only by the partial-sum-order
    // argument). The gate ranks the supplier→customer trade graph
    // (distinct pairs from lineitem⋈orders); the oracle replays the
    // integer recurrence as K unrolled CTEs.
    //
    // All trade-graph gates (q107…q128) put customers in the shared
    // node-id space at `o_custkey + custOffset(s, d)`, with the offset
    // DERIVED as max(s_suppkey) + 1 on both the Spark side and the
    // oracle side (the shared `off` CTE) — collision-free at ANY scale
    // factor by construction, closing the r8 doc's SF < 100 bound on
    // the old hard-coded 1e6. The 16× probe copies shift custkeys UP
    // and leave the fixed supplier dim alone, so derived offsets stay
    // stable there too; the TrustRank seed predicates use the same
    // derived bound (`node < off` ⇔ supplier node).
    "q107_link_rank" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        // both directions of the trade relation, so the graph has cycles
        // and authority actually circulates (a one-way bipartite graph
        // just drains); customers offset so ids never collide
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        graft.operators.GraphRank.pageRank(edges, "src", "dst", iterations = 5)
      },
      Some(linkRankOracle(iterations = 5))),

    // TrustRank (Gyöngyi et al. 2004): q107's recurrence with teleport
    // mass restricted to a trusted SEED set — authority is reachable
    // only through link paths from seeds, so link farms that fabricate
    // internal mass rank near zero: the crawl-corpus anti-spam
    // weighting signal. Seeds here: every 5th supplier (deterministic,
    // so the oracle replays seed selection too). Same integer
    // fixed-point arithmetic, same unrolled-CTE oracle with a
    // seed-conditional teleport term.
    "q110_trust_rank" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .filter(col("s_suppkey") % 5 === 0).select(col("s_suppkey"))
        graft.operators.GraphRank.trustRank(edges, "src", "dst", seeds,
          iterations = 5)
      },
      Some(linkRankOracle(iterations = 5,
        seedPred = Some(seedEvery5)))),

    // Graph label propagation (Zhu & Ghahramani 2002): supplier nation
    // labels spread over the bidirectional trade graph, attributing
    // every reachable customer to a market — the semi-supervised
    // corpus-labeling primitive (label a seed slice by hand, propagate
    // over the near-dup/link graph, threshold the argmax) in the same
    // exact integer fixed-point as q107/q110, so all four clamped
    // diffusion iterations AND the final argmax (ties to smallest
    // label) replay in DuckDB bit-for-bit. Masses stay SPARSE: only
    // (node, label) pairs within K hops of a same-label seed exist.
    "q112_label_propagation" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        graft.operators.GraphRank.labelPropagation(edges, "src", "dst",
          seeds, "s_suppkey", "s_nationkey", iterations = 4)
      },
      Some(labelPropOracle(iterations = 4))),

    // q112's dense closed-universe twin: the same clamped diffusion
    // carried as a length-25 Long vector per node (one array row per
    // edge crosses the shuffle instead of ~25 (node, label) rows, and
    // the 25 per-slot sums are codegen'd with working map-side
    // combine) — the scale path that fixes the sparse path's 16× spill
    // bend. Bit-identical by construction AND by spec, so it replays
    // the SAME DuckDB oracle as q112.
    "q112b_label_prop_dense" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        graft.operators.GraphRank.labelPropagationDense(edges, "src", "dst",
          seeds, "s_suppkey", "s_nationkey", labels = (0L until 25L),
          iterations = 4)
      },
      Some(labelPropOracle(iterations = 4))),

    // The ROUTED label-propagation entry point (r8): the clamped
    // recurrence's label universe is closed by construction (clamp mass
    // is the only label source), so labelPropagationAuto discovers the
    // distinct seed labels and routes ≤ 64 of them to the dense vector
    // path — here 25 nations ⇒ dense, bit-identical to q112/q112b by
    // spec, replaying the SAME DuckDB oracle. Callers no longer choose
    // the scale-safe path by hand (the r7 VERDICT's one perf-weak
    // routing gap); open universes (> 64 labels) would run sparse with
    // a finite default beam cap instead of the uncapped spilling shape.
    "q112c_label_prop_auto" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        graft.operators.GraphRank.labelPropagationAuto(edges, "src", "dst",
          seeds, "s_suppkey", "s_nationkey", iterations = 4)
      },
      Some(labelPropOracle(iterations = 4))),

    // HITS hubs/authorities on the DIRECTED supplier→customer trade
    // graph (the bipartite case HITS was built for: suppliers act as
    // hubs/curators, customers as authorities) — same exact integer
    // fixed-point treatment as q107, so all five mutual-reinforcement
    // iterations, including the integer renormalization, replay in
    // DuckDB bit-for-bit.
    "q109_hits" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("dst"))
        graft.operators.GraphRank.hits(edges, "src", "dst", iterations = 5)
      },
      Some(hitsOracle(iterations = 5))),

    // Synchronous label-propagation community detection (Raghavan et
    // al. 2007) on the trade graph — the UNSUPERVISED sibling of q112:
    // every node starts in its own community, adopts the mode of
    // neighbor labels + a self-vote per round, ties to the smallest
    // label. All-integer votes and a total tie rule make each round
    // bit-deterministic (classic LPA is random-order), so all four
    // rounds AND the final community sizes replay in DuckDB.
    "q113_lpa_communities" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("dst"))
        graft.operators.GraphRank.labelCommunities(edges, "src", "dst",
          iterations = 4)
      },
      Some(lpaCommunitiesOracle(iterations = 4))),

    // Bounded k-core peel (Seidman 1983) on the trade graph — the
    // crawl-graph quality-tier prefilter: nodes in a dense k-core sit
    // in well-interlinked regions, thin spam/orphan structure peels
    // away. Four synchronous peels, action-free by design (a fixpoint
    // loop would make the round count data-dependent and kill the SQL
    // replay); the `converged` flag reports whether the peel settled.
    "q114_kcore" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("dst"))
        graft.operators.GraphRank.kCore(edges, "src", "dst",
          k = 12, rounds = 4)
      },
      Some(kCoreOracle(k = 12, rounds = 4))),

    // Exact triangle counting + local clustering coefficient (Suri &
    // Vassilvitskii 2011's degree orientation — out-degree bounded
    // O(√|E|) on any graph, so the wedge join survives hubs) on the
    // high-quantity supplier CO-OCCURRENCE graph: suppliers are
    // adjacent when they supply bulk lineitems (l_quantity > 45) of
    // the same order — a sparse graph with real triangle structure
    // (~12k edges / ~3.9k triangles at sf0.1), the operator's
    // intended crawl/similarity-graph regime. (The UNFILTERED
    // co-occurrence graph is 91% complete at sf0.1 — kept as a
    // documented density-stress probe in SURVEY §2e, not as a
    // recurring gate: 124M triangles per run is a bench liability,
    // not a semantics test.) Clustering separates organic dense
    // neighborhoods from farm-like flat link structure. Integer
    // counts over deterministic joins: fully hash-oracled.
    "q115_triangle_count" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_suppkey").cast("long").as("s"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.s") < col("b.s"))
          .select(col("a.s").as("src"), col("b.s").as("dst"))
          .distinct()
        graft.operators.GraphRank.triangles(pairs, "src", "dst")
      },
      Some(trianglesOracle)),

    // Graph snapshot diff (r8) — the incremental-maintenance primitive
    // the admission family (d07/d14/d16/m08/q106) has for content,
    // now for the link graph: two weighted trade-graph snapshots (old =
    // order links before 1997-06-01, new = links since 1993-01-01, so
    // the overlap window yields all four statuses), every (src, dst)
    // pair classified added/removed/reweighted/unchanged from the
    // normalized link-count weights. One full-outer join, no iteration.
    "q116_edge_delta" -> QueryDef(
      (s, d) => {
        val (oldE, newE) = tradeSnapshots(s, d)
        graft.operators.GraphRank.edgeDelta(oldE, newE, "src", "dst",
          weightCol = Some("w"))
      },
      Some(edgeDeltaOracle + """
        SELECT src, dst, w_old, w_new, status FROM delta""")),

    // Stale-rank frontier (r8): which nodes' PageRank/label values are
    // STALE after q116's delta — dst of every changed edge plus the
    // changed srcs' new-graph out-neighbors (their out-weight moved) at
    // hop 0, then `hops` forward expansions along the new graph: after
    // K rank iterations every divergent node lies in the hops = K−1
    // frontier, so an incremental pipeline re-ranks the frontier
    // instead of the corpus. Fixed hop count ⇒ action-free and
    // replayable as unrolled CTEs (the kCore argument).
    "q117_stale_frontier" -> QueryDef(
      (s, d) => {
        val (oldE, newE) = tradeSnapshots(s, d)
        graft.operators.GraphRank.staleFrontier(oldE, newE, "src", "dst",
          hops = 2, weightCol = Some("w"))
      },
      Some(staleFrontierOracle(hops = 2))),

    // Warm-start rank resume (r8): pageRankResume continues the integer
    // recurrence from a persisted (node, rank_units) table — the
    // recurrence is memoryless given current ranks, so 3 cold + 2
    // resumed iterations are BIT-IDENTICAL to 5 cold (the gate's very
    // construction), which is the checkpoint/restart story for long
    // rank jobs and the warm-start companion to q116/q117's
    // incremental maintenance. The oracle is simply the 5-iteration
    // unrolled recurrence — the resume seam is invisible by design.
    "q118_warm_rank" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val warm = graft.operators.GraphRank.pageRank(edges, "src", "dst",
          iterations = 3)
        graft.operators.GraphRank.pageRankResume(edges, "src", "dst",
          warm, iterations = 2)
      },
      Some(linkRankOracle(iterations = 5))),

    // Streaming edge delta (r8): q116 as a continuous ingest — the new
    // snapshot's link rows stream in bounded micro-batches, foreachBatch
    // appends per-batch (src, dst, count) PARTIALS, and the final
    // classification merges them by count-sum against the old snapshot.
    // The weight table is a MONOID (q111's histogram argument): the
    // drained result equals batch q116 at any batch boundary with no
    // cross-batch state store at all — so this gate shares q116's
    // oracle verbatim, and the streaming seam is invisible by design.
    "q119_streaming_edge_delta" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val (oldE, _) = tradeSnapshots(s, d)
        val dir = stageNewLinksDir(s, d)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.LongType)))
        val out = java.nio.file.Files.createTempDirectory("graft_q119")
        withStreamConf(s, parts = "4", rocksdb = false) {
          val stream = s.readStream
            .option("maxFilesPerTrigger", "1") // 4 files → 4 batches
            .schema(schema).parquet(dir.toString)
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              batch.groupBy(col("src"), col("dst"))
                .agg(sum(col("w")).as("w"))
                .write.mode("append").parquet(out.toString)
            }
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          // partials re-sum inside edgeDelta's weighted normalization
          graft.operators.GraphRank.edgeDelta(oldE,
            s.read.parquet(out.toString), "src", "dst", weightCol = Some("w"))
        }
      },
      Some(edgeDeltaOracle + """
        SELECT src, dst, w_old, w_new, status FROM delta""")),

    // Warm-start label resume (r8): q118's restartability for the label
    // family — labelPropagationMasses persists the sparse (node, label,
    // mass) state after 2 rounds and labelPropagationResume continues
    // for 2 more; the recurrence is memoryless given the mass table, so
    // the result is bit-identical to 4 cold rounds and the gate shares
    // q112's 4-iteration oracle. The incremental corpus-labeling story:
    // persist labeled equilibrium, resume diffusion after each crawl
    // increment instead of replaying from the seeds.
    "q120_warm_labels" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        val m2 = graft.operators.GraphRank.labelPropagationMasses(edges,
          "src", "dst", seeds, "s_suppkey", "s_nationkey", iterations = 2)
        graft.operators.GraphRank.labelPropagationResume(edges, "src", "dst",
          seeds, "s_suppkey", "s_nationkey", m2, iterations = 2)
      },
      Some(labelPropOracle(iterations = 4))),

    // Topic-sensitive rank (r8): trustRank with WEIGHTED seeds
    // (Haveliwala 2002's topic-sensitive PageRank / graded-trust
    // TrustRank) — the teleport mass splits across seeds proportional
    // to integer weights, so an editorially-graded seed list (major
    // reference site = weight 7, marginal directory = weight 1) shapes
    // the whole authority field. Seeds: every 5th supplier at weight
    // (s_suppkey % 7) + 1 — deterministic, so the oracle replays both
    // seed selection and the weight split; same integer fixed-point,
    // all 5 iterations hash-oracled.
    "q121_topic_rank" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .filter(col("s_suppkey") % 5 === 0)
          .select(col("s_suppkey"),
            ((col("s_suppkey") % 7) + 1).cast("long").as("tw"))
        graft.operators.GraphRank.trustRank(edges, "src", "dst", seeds,
          iterations = 5, seedWeightCol = Some("tw"))
      },
      Some(weightedRankOracle(iterations = 5,
        seedPred = seedEvery5,
        twExpr = "(node % 7) + 1"))),

    // Weighted k-core / s-core peel (r8, Garas et al. 2012): degree =
    // Σ incident edge weights, so the survival bar measures tie
    // STRENGTH — here link multiplicity on the trade graph (one unit
    // per lineitem-order link, parallel links add), keeping nodes held
    // by many repeated trades while thin one-off relationships peel.
    // Same action-free bounded-round contract as q114; fully
    // hash-oracled including the weighted degrees and the convergence
    // flag.
    "q122_kcore_weighted" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val links = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("dst"),
                  lit(1L).as("w"))
        graft.operators.GraphRank.kCore(links, "src", "dst",
          k = 25, rounds = 4, weightCol = Some("w"))
      },
      Some(kCoreWeightedOracle(k = 25, rounds = 4))),

    // Community quotient graph (r8): graph coarsening — LPA communities
    // collapse the directed trade graph into super-edges (src_comm,
    // dst_comm, edge count, summed weight), intra-community rows
    // included (the cohesion numerator). The multilevel primitive:
    // rank a billion-page crawl graph at domain/community granularity
    // (METIS / Louvain aggregation step). Gate runs on the BULK-link
    // subgraph (l_quantity > 45, q115's sparsification) where LPA
    // finds ~70 real communities — the full dense trade graph
    // collapses to one, which quotients to a single row (checked in
    // DuckDB before gating, the q115 density protocol). Oracle
    // composes the unrolled LPA rounds with the two-join collapse.
    "q123_community_graph" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("dst"))
        val comm = graft.operators.GraphRank.labelCommunities(edges,
          "src", "dst", iterations = 4)
        graft.operators.GraphRank.quotientGraph(edges, "src", "dst",
          comm, "node", "community")
      },
      Some(s"""${lpaCtes(4, edgePred = "l_quantity > 45")},
        q AS (SELECT coalesce(cs.label, ed.src) AS src_comm,
                     coalesce(cd.label, ed.dst) AS dst_comm
              FROM ed LEFT JOIN l4 cs ON cs.node = ed.src
                      LEFT JOIN l4 cd ON cd.node = ed.dst)
        SELECT src_comm, dst_comm, CAST(count(*) AS BIGINT) AS edges,
               CAST(count(*) AS BIGINT) AS weight
        FROM q GROUP BY 1, 2""")),

    // Seed hop-distance (r8): bounded multi-source BFS from the trusted
    // seed set over the bidirectional trade graph — the link-distance
    // spam heuristic (how many hops from vetted seeds) and the cheap
    // reachability prefilter before a trustRank run (absent ⇒ rank
    // exactly zero). Min-hop per node, nodes beyond 3 hops absent.
    "q124_seed_distance" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .filter(col("s_suppkey") % 5 === 0).select(col("s_suppkey"))
        graft.operators.GraphRank.hopDistances(edges, "src", "dst",
          seeds, maxHops = 3)
      },
      Some(hopDistanceOracle(maxHops = 3,
        seedPred = seedEvery5))),

    // Incremental re-rank, end-to-end (r8): the q116/q117/q118 story
    // composed into ONE gate — rank the OLD weighted snapshot (5
    // rounds), then resume 2 rounds on the NEW snapshot from those
    // ranks: new nodes cold-start at the new graph's teleport value,
    // old-only nodes drop with their graph, and (per the staleFrontier
    // soundness spec) only frontier neighborhoods move. The oracle
    // replays BOTH phases as one CTE chain — 5 unrolled rounds on the
    // old edges feeding the warm-start init of 2 unrolled rounds on
    // the new edges — so the whole incremental pipeline is
    // hash-verified, not just its pieces.
    "q125_incremental_rank" -> QueryDef(
      (s, d) => {
        val (oldE, newE) = tradeSnapshots(s, d)
        val warm = graft.operators.GraphRank.pageRank(oldE, "src", "dst",
          iterations = 5, weightCol = Some("w"))
        graft.operators.GraphRank.pageRankResume(newE, "src", "dst",
          warm, iterations = 2, weightCol = Some("w"))
      },
      Some(incrementalRankOracle(oldIters = 5, resumeIters = 2))),

    // Warm-start community resume (r8): the third member of the resume
    // seam — sync-LPA votes are memoryless given the current (node,
    // label) table, so 2 cold + 2 resumed rounds are bit-identical to
    // 4 cold and the gate shares q113's 4-round oracle verbatim. With
    // q118 (rank) and q120 (label mass) every iterative graph family
    // now checkpoints and resumes without replaying earlier rounds.
    "q126_warm_communities" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("dst"))
        val c2 = graft.operators.GraphRank.labelCommunities(edges,
          "src", "dst", iterations = 2)
        graft.operators.GraphRank.labelCommunitiesResume(edges, "src", "dst",
          c2, iterations = 2)
      },
      Some(lpaCommunitiesOracle(iterations = 4))),

    // Routed label resume (r9): the warm-start twin of q112c, closing
    // the r8 seam where the scale-safe dense shape could not restart —
    // the SAME persisted sparse (node, label, mass) checkpoint that
    // q120 resumes on the sparse path here warm-starts the DENSE vector
    // path through labelPropagationAutoResume (25 nations ≤ 64 ⇒ dense
    // routing, exactly like the cold auto entry), and 2 cold + 2
    // dense-resumed rounds are bit-identical to 4 cold rounds of either
    // path — so this gate shares q112/q120's 4-iteration oracle
    // verbatim and the restartable path IS the scale path now.
    "q127_warm_labels_auto" -> QueryDef(
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("s"),
                  (col("o_custkey") + lit(custOffset(s, d))).as("c"))
        val edges = pairs.select(col("s").as("src"), col("c").as("dst"))
          .union(pairs.select(col("c").as("src"), col("s").as("dst")))
        val seeds = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        val m2 = graft.operators.GraphRank.labelPropagationMasses(edges,
          "src", "dst", seeds, "s_suppkey", "s_nationkey", iterations = 2)
        graft.operators.GraphRank.labelPropagationAutoResume(edges,
          "src", "dst", seeds, "s_suppkey", "s_nationkey", m2, iterations = 2)
      },
      Some(labelPropOracle(iterations = 4))),

    // Continuous graph maintenance, end-to-end (r9): the q119 streaming
    // delta, the q117 frontier, and the q118 warm-start composed into
    // ONE foreachBatch loop — the new snapshot's link partials stream
    // in micro-batches, each batch boundary measures the staleFrontier
    // against the previously served graph (skipping the re-rank
    // entirely when the delta is empty — provably lossless, no
    // containment assumption needed) and otherwise publishes a BOUNDED
    // re-rank: 2 resumed rounds from the old snapshot's 5-round
    // equilibrium. Weight partials are a monoid, so the drained result
    // equals the one-shot batch run (spec-asserted) and the final
    // boundary is exactly q125's two-phase computation — this gate
    // replays q125's unrolled two-phase CTE oracle verbatim, proving
    // the whole production crawl-increment loop, not just its pieces.
    "q128_continuous_rank" -> QueryDef(
      (s, d) => {
        val (oldE, _) = tradeSnapshots(s, d)
        val dir = stageNewLinksDir(s, d)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("dst",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.LongType)))
        withStreamConf(s, parts = "4", rocksdb = false) {
          val stream = s.readStream
            .option("maxFilesPerTrigger", "2") // 4 staged files → 2 boundaries
            .schema(schema).parquet(dir.toString)
          graft.streaming.ContinuousGraphMaintenance.continuousRank(
            s, oldE, stream, "src", "dst", "w",
            oldIterations = 5, resumeIterations = 2).ranks
        }
      },
      Some(incrementalRankOracle(oldIters = 5, resumeIters = 2))),

    // Continuous index maintenance (q129, r10): d19 run as a continuous
    // ingest — the q128 pattern for the dedup family. The V1→V2 diff
    // rows (added/changed/removed, the d14 vocabulary, one row per
    // touched doc) stream in micro-batches, and each boundary advances
    // the persisted UNCAPPED banded index state with d19's movement:
    // anti-join the batch's touched ids, signature the batch's delta
    // docs ONLY. The diff has one row per doc, so any file batching is
    // id-disjoint and the drained state equals the one-shot maintenance
    // (spec) — which equals a from-scratch REBUILD of V2 (d19's
    // theorem), so this gate shares d19's rebuild oracle verbatim:
    // streaming drain, maintenance seam, and capped serving view all
    // hash-verified in one gate. State versions are batchId-keyed pure
    // functions of the previous version (restart-idempotent, spec'd).
    "q129_continuous_index" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val v1 = docs.filter(col("doc_id") % 17 =!= 3)
        val dir = stageDiffDir(s, d)
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("status",
            org.apache.spark.sql.types.StringType)))
        withStreamConf(s, parts = "4", rocksdb = false) {
          val stream = s.readStream
            .option("maxFilesPerTrigger", "2") // 4 staged files → 2 boundaries
            .schema(schema).parquet(dir.toString)
          val run = graft.streaming.ContinuousIndexMaintenance
            .continuousIndex(s,
              graft.operators.Dedup.minhashIndexState(v1, "text", "doc_id")
                .localCheckpoint(),
              stream, "text", "doc_id")
          graft.operators.Dedup.cappedIndexView(run.state)
            .select(col("id").cast("long").as("id"),
                    col("band").cast("long").as("band"),
                    col("band_hash"))
        }
      },
      Some(DedupQueries.indexMaintenanceOracle(k = 32, bands = 8))),
  )

  /** q129's staged stream source: the V1→V2 snapshot-diff rows (doc_id,
    * text, status; `text` = the NEW payload for added/changed, null for
    * removed; `unchanged` rows excluded — maintenance never needs them)
    * in 4 parquet files. The diff emits ONE row per doc, so any file
    * batching is id-disjoint. Restaged when documents.parquet changes
    * (the stageDocsDir pattern).
    */
  private def stageDiffDir(s: org.apache.spark.sql.SparkSession,
      d: String): java.nio.file.Path =
    Staging.stageIfStale(d, "diff_stream4", "documents.parquet") { dir =>
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") % 17 =!= 3)
      val v2 = docs.filter(col("doc_id") % 19 =!= 5)
        .withColumn("text", when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" rev2qq"))).otherwise(col("text")))
      graft.operators.Dedup.snapshotDiff(v1, v2, "text", "doc_id")
        .filter(col("status") =!= "unchanged")
        .join(v2.select(col("doc_id"), col("text")),
          col("id") === col("doc_id"), "left")
        .select(col("id").as("doc_id"), col("text"), col("status"))
        .repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
    }

  /** q125's oracle: two unrolled weighted-rank phases in one chain —
    * the old snapshot's 5 rounds (uniform teleport over its node set)
    * whose final table warm-starts 2 rounds over the new snapshot
    * (missing nodes at the NEW graph's r0), replaying
    * pageRank + pageRankResume end-to-end. Reuses edgeDeltaOracle's
    * weighted snapshot CTEs (`eo`/`en`; `delta` goes unreferenced).
    */
  private def incrementalRankOracle(oldIters: Int, resumeIters: Int): String = {
    val units = graft.operators.GraphRank.DefaultUnits
    def phase(prefix: String, edges: String, iters: Int,
              init: String): String = {
      val rounds = (1 to iters).map { i =>
        val prev = if (i == 1) s"${prefix}0" else s"$prefix${i - 1}"
        s"""$prefix$i AS MATERIALIZED (
          SELECT nd.node,
                 (SELECT base FROM c$prefix) + (85 * coalesce(s.insum, 0)) // 100 AS r
          FROM n$prefix nd LEFT JOIN (
            SELECT e.dst AS node, sum(p.r * e.w // od.outw) AS insum
            FROM $edges e JOIN od$prefix od USING (src)
                          JOIN $prev p ON p.node = e.src
            GROUP BY e.dst) s USING (node))"""
      }.mkString(",\n")
      s"""n$prefix AS MATERIALIZED (
        SELECT src AS node FROM $edges UNION SELECT dst FROM $edges),
      od$prefix AS MATERIALIZED (
        SELECT src, sum(w) AS outw FROM $edges GROUP BY src),
      c$prefix AS MATERIALIZED (
        SELECT count(*) AS n,
               CAST($units AS BIGINT) // count(*) AS r0,
               (CAST(15 AS BIGINT) * $units) // (100 * count(*)) AS base
        FROM n$prefix),
      ${prefix}0 AS ($init),
      $rounds"""
    }
    s"""$edgeDeltaOracle,
      ${phase("o", "eo", oldIters,
        "SELECT node, (SELECT r0 FROM co) AS r FROM no")},
      ${phase("w", "en", resumeIters,
        s"""SELECT nd.node, coalesce(o$oldIters.r, (SELECT r0 FROM cw)) AS r
            FROM nw nd LEFT JOIN o$oldIters ON o$oldIters.node = nd.node""")}
      SELECT node, CAST(r AS BIGINT) AS rank_units,
             round(r / $units.0, 6) AS rank
      FROM w$resumeIters"""
  }

  /** q124's oracle: multi-source BFS unrolled — seeds present in the
    * graph at hop 0, one ring expansion per hop along the symmetrized
    * edges, min-hop per node (staleFrontierOracle's expansion shape).
    */
  private def hopDistanceOracle(maxHops: Int, seedPred: String): String = {
    val hopCtes = (1 to maxHops).map { i =>
      val prev = s"f${i - 1}"
      s"""f$i AS MATERIALIZED (
        SELECT node, min(hop) AS hop FROM (
          SELECT node, hop FROM $prev
          UNION ALL
          SELECT e.dst AS node, $i AS hop
          FROM e JOIN $prev p ON e.src = p.node WHERE p.hop = ${i - 1}) u
        GROUP BY node)"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      p AS MATERIALIZED (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                        CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS MATERIALIZED (
        SELECT s AS src, c AS dst FROM p
        UNION SELECT c AS src, s AS dst FROM p),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      f0 AS (SELECT node, 0 AS hop FROM nodes nd WHERE $seedPred),
      $hopCtes
      SELECT node, CAST(hop AS BIGINT) AS hop FROM f$maxHops"""
  }

  /** q122's oracle: the weighted peel unrolled — symmetrized link-count
    * weights, per round a weighted-degree HAVING filter and the edge
    * restriction, mirroring kCore's weightCol path.
    */
  private def kCoreWeightedOracle(k: Int, rounds: Int): String = {
    val iterCtes = (1 to rounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""a$i AS (SELECT src AS node FROM $prev GROUP BY src HAVING sum(w) >= $k),
      e$i AS MATERIALIZED (
        SELECT e.src, e.dst, e.w FROM $prev e
        JOIN a$i x ON e.src = x.node JOIN a$i y ON e.dst = y.node)"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      l AS MATERIALIZED (
        SELECT CAST(l_suppkey AS BIGINT) AS s,
               CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      cnt AS MATERIALIZED (
        SELECT s, c, CAST(count(*) AS BIGINT) AS w FROM l GROUP BY 1, 2),
      e0 AS MATERIALIZED (
        SELECT s AS src, c AS dst, w FROM cnt
        UNION ALL SELECT c AS src, s AS dst, w FROM cnt),
      $iterCtes,
      deg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS degree
              FROM e$rounds GROUP BY src),
      conv AS (SELECT coalesce(min(degree) >= $k, true) AS converged FROM deg)
      SELECT node, degree, converged FROM deg CROSS JOIN conv"""
  }

  /** q119's staged stream source: the NEW trade snapshot's link rows
    * (src, dst, w=1) in 4 parquet files under the per-SF export dir;
    * restaged when orders.parquet changes (the stageDocsDir pattern).
    */
  private[graft] def stageNewLinksDir(s: org.apache.spark.sql.SparkSession,
      d: String): java.nio.file.Path =
    // the derived node offset is part of the staged data, so it is part
    // of the cache key — a stale dir with a different offset would
    // stream ids from a different node space than the batch side
    Staging.stageIfStale(d, s"trade_new4_off${custOffset(s, d)}",
      "orders.parquet") { dir =>
      tradeSnapshots(s, d)._2.select(col("src"), col("dst"), col("w"))
        .repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
    }

  /** Customer-node id offset shared by every trade-graph gate — DERIVED
    * from the supplier dimension (`max(s_suppkey) + 1`) instead of the
    * r8 era's hard-coded 1e6, so the shared node-id space is
    * collision-free at ANY scale factor (the old bound broke at
    * SF ≥ 100, where suppkeys outgrow 1e6). One tiny dimension-table
    * aggregate per gate build; the oracles mirror the derivation
    * verbatim as the [[offCte]] prefix, so both engines compute the
    * same ids from the same table. Memoized per data directory — the
    * offset is a pure function of the staged supplier table, and every
    * trade-graph gate build (pairs, seeds, snapshots, staging) calls
    * this several times; without the cache each call is a
    * driver-blocking aggregate job.
    */
  private val custOffsetCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def custOffset(s: org.apache.spark.sql.SparkSession,
                         d: String): Long = {
    // cache key carries the supplier table's mtime so a table restaged
    // at the same path within one JVM (the stageIfStale convention)
    // invalidates instead of serving a stale offset
    val src = java.nio.file.Paths.get(d, "supplier.parquet")
    val stamp = if (java.nio.file.Files.exists(src))
      java.nio.file.Files.getLastModifiedTime(src).toMillis else 0L
    custOffsetCache.computeIfAbsent(s"$d@$stamp", _ =>
      Tables.supplier(s, d)
        .agg(max(col("s_suppkey").cast("long"))).head.getLong(0) + 1L)
  }

  /** The oracle-side twin of [[custOffset]]: a CTE every trade-graph
    * oracle prefixes its WITH chain with, referenced as [[offSql]].
    */
  private val offCte =
    "off AS MATERIALIZED (SELECT CAST(max(s_suppkey) AS BIGINT) + 1 AS o FROM supplier)"
  private val offSql = "(SELECT o FROM off)"

  /** The oracle-side seed predicate for "every 5th supplier": supplier
    * nodes are exactly the ids below the derived offset.
    */
  private val seedEvery5 = s"node < $offSql AND node % 5 = 0"

  /** q116/q117's weighted trade-graph snapshots: one row per
    * lineitem-order link (weight accumulates per parallel link), old =
    * links before 1997-06-01, new = links since 1993-01-01. Directed
    * supplier→customer; the customer-id offset is [[custOffset]].
    */
  private[graft] def tradeSnapshots(s: org.apache.spark.sql.SparkSession,
                             d: String): (org.apache.spark.sql.DataFrame,
                                          org.apache.spark.sql.DataFrame) = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val links = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + lit(custOffset(s, d))).as("dst"),
        col("o_orderdate").as("d"), lit(1L).as("w"))
    (links.filter(col("d") < lit("1997-06-01").cast("date")),
     links.filter(col("d") >= lit("1993-01-01").cast("date")))
  }

  /** Shared delta CTEs for q116/q117: normalized weighted snapshots +
    * the full-outer classification, mirroring GraphRank.edgeDelta.
    */
  private val edgeDeltaOracle: String = s"""
      WITH $offCte,
      l AS MATERIALIZED (
        SELECT CAST(l_suppkey AS BIGINT) AS s,
               CAST(o_custkey AS BIGINT) + $offSql AS c,
               o_orderdate AS d
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      eo AS MATERIALIZED (
        SELECT s AS src, c AS dst, CAST(count(*) AS BIGINT) AS w
        FROM l WHERE d < DATE '1997-06-01' GROUP BY 1, 2),
      en AS MATERIALIZED (
        SELECT s AS src, c AS dst, CAST(count(*) AS BIGINT) AS w
        FROM l WHERE d >= DATE '1993-01-01' GROUP BY 1, 2),
      delta AS MATERIALIZED (
        SELECT coalesce(eo.src, en.src) AS src,
               coalesce(eo.dst, en.dst) AS dst,
               eo.w AS w_old, en.w AS w_new,
               CASE WHEN eo.w IS NULL THEN 'added'
                    WHEN en.w IS NULL THEN 'removed'
                    WHEN eo.w = en.w THEN 'unchanged'
                    ELSE 'reweighted' END AS status
        FROM eo FULL OUTER JOIN en
          ON eo.src = en.src AND eo.dst = en.dst)"""

  /** q117's oracle: hop 0 = changed dsts + changed srcs' new-graph
    * out-neighbors, then `hops` unrolled expansions along the new
    * graph, min-hop per node — replaying GraphRank.staleFrontier.
    */
  private def staleFrontierOracle(hops: Int): String = {
    val hopCtes = (1 to hops).map { i =>
      val prev = s"f${i - 1}"
      s"""f$i AS MATERIALIZED (
        SELECT node, min(hop) AS hop FROM (
          SELECT node, hop FROM $prev
          UNION ALL
          SELECT en.dst AS node, $i AS hop
          FROM en JOIN $prev p ON en.src = p.node WHERE p.hop = ${i - 1}) u
        GROUP BY node)"""
    }.mkString(",\n")
    s"""$edgeDeltaOracle,
      ch AS MATERIALIZED (
        SELECT src, dst FROM delta WHERE status <> 'unchanged'),
      d0 AS (SELECT dst AS node FROM ch
             UNION
             SELECT en.dst FROM en
             JOIN (SELECT DISTINCT src FROM ch) cs ON en.src = cs.src),
      f0 AS (SELECT node, 0 AS hop FROM d0),
      $hopCtes
      SELECT node, CAST(hop AS BIGINT) AS hop FROM f$hops"""
  }

  /** q115's oracle: the degree orientation and both wedge joins replay
    * directly — a (degree, id) tuple comparison, one self-join on the
    * middle node, an EXISTS closure, and a 3-way explode for per-node
    * counts; the coefficient reproduces the engine's `2T/(d(d-1))`
    * rounded 6 dp with degree<2 pinned to 0.
    */
  private val trianglesOracle: String = """
    WITH li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, CAST(l_suppkey AS BIGINT) AS s
      FROM lineitem WHERE l_quantity > 45),
    p AS MATERIALIZED (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.s < b.s),
    e AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM p UNION SELECT v, u FROM p),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
            FROM e GROUP BY src),
    o AS MATERIALIZED (
      SELECT e.src AS u, e.dst AS v
      FROM e JOIN deg d1 ON e.src = d1.node JOIN deg d2 ON e.dst = d2.node
      WHERE d1.degree < d2.degree
         OR (d1.degree = d2.degree AND e.src < e.dst)),
    tri AS MATERIALIZED (
      SELECT e1.u, e1.v, e2.v AS w
      FROM o e1 JOIN o e2 ON e1.v = e2.u
      WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v)),
    tn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
             SELECT u AS node FROM tri
             UNION ALL SELECT v FROM tri
             UNION ALL SELECT w FROM tri) x GROUP BY node)
    SELECT d.node, d.degree, coalesce(t.triangles, 0) AS triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE round(2.0 * coalesce(t.triangles, 0) /
                           (d.degree * (d.degree - 1)), 6) END AS coeff
    FROM deg d LEFT JOIN tn t ON t.node = d.node"""

  /** q113's oracle: sync LPA unrolled — per round the neighbor-label
    * votes UNION ALL the self-vote, integer counts, and the same
    * (count DESC, label ASC) argmax window; community sizes replay as
    * one final count per label.
    */
  /** Shared CTE prefix for the sync-LPA oracles (q113, q123): the
    * DIRECTED trade edge list (`ed` — the quotient oracle needs it),
    * the symmetrized vote edges (`e`), and the unrolled rounds ending
    * at `l<iterations>(node, label)`.
    */
  private def lpaCtes(iterations: Int, edgePred: String = "TRUE"): String = {
    val iterCtes = (1 to iterations).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""l$i AS MATERIALIZED (
        SELECT node, label FROM (
          SELECT node, label,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY c DESC, label ASC) AS rn
          FROM (SELECT node, label, count(*) AS c FROM (
                  SELECT e.dst AS node, m.label FROM e JOIN $prev m ON m.node = e.src
                  UNION ALL SELECT node, label FROM $prev) v
                GROUP BY node, label) g) t
        WHERE rn = 1)"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      p AS MATERIALIZED (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                        CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE $edgePred),
      ed AS MATERIALIZED (SELECT s AS src, c AS dst FROM p),
      e AS MATERIALIZED (
        SELECT src, dst FROM ed
        UNION SELECT dst AS src, src AS dst FROM ed),
      l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
      $iterCtes"""
  }

  private def lpaCommunitiesOracle(iterations: Int): String =
    s"""${lpaCtes(iterations)},
      sizes AS (SELECT label, CAST(count(*) AS BIGINT) AS csize
                FROM l$iterations GROUP BY label)
      SELECT node, label AS community, csize
      FROM l$iterations JOIN sizes USING (label)"""

  /** q114's oracle: the peel unrolled — per round a degree HAVING
    * filter and an edge restriction to surviving endpoints; the final
    * degrees and the min-degree convergence flag replay directly.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val iterCtes = (1 to rounds).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""a$i AS (SELECT src AS node FROM $prev GROUP BY src HAVING count(*) >= $k),
      e$i AS MATERIALIZED (
        SELECT e.src, e.dst FROM $prev e
        JOIN a$i x ON e.src = x.node JOIN a$i y ON e.dst = y.node)"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      p AS MATERIALIZED (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                        CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e0 AS MATERIALIZED (
        SELECT s AS src, c AS dst FROM p
        UNION SELECT c AS src, s AS dst FROM p),
      $iterCtes,
      deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
              FROM e$rounds GROUP BY src),
      conv AS (SELECT coalesce(min(degree) >= $k, true) AS converged FROM deg)
      SELECT node, degree, converged FROM deg CROSS JOIN conv"""
  }

  /** q112's oracle: clamped label spreading unrolled — per iteration a
    * sparse (node, label) in-sum joined FULL OUTER against the clamp
    * table, the integer α-damped update, and a mass>0 filter keeping
    * the table sparse exactly like the engine; the final argmax
    * replays as a row_number window (ties to smallest label).
    */
  private def labelPropOracle(iterations: Int): String = {
    val clampUnits = ((100L - 80L) * 1000000L) / 100L
    val iterCtes = (1 to iterations).map { i =>
      val prev = if (i == 1) "m0" else s"m${i - 1}"
      s"""m$i AS MATERIALIZED (
        SELECT * FROM (
          SELECT coalesce(i.node, c.node) AS node,
                 coalesce(i.label, c.label) AS label,
                 (80 * coalesce(i.insum, 0)) // 100 + coalesce(c.clamp, 0) AS mass
          FROM (SELECT e.dst AS node, m.label, sum(m.mass // od.outdeg) AS insum
                FROM e JOIN od USING (src) JOIN $prev m ON m.node = e.src
                GROUP BY e.dst, m.label) i
          FULL OUTER JOIN clamp c ON c.node = i.node AND c.label = i.label) t
        WHERE mass > 0)"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      p AS MATERIALIZED (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                        CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS MATERIALIZED (
        SELECT s AS src, c AS dst FROM p
        UNION SELECT c AS src, s AS dst FROM p),
      od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      clamp AS MATERIALIZED (
        SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS node,
                        CAST(s_nationkey AS BIGINT) AS label,
                        CAST($clampUnits AS BIGINT) AS clamp
        FROM supplier),
      m0 AS (SELECT node, label, clamp AS mass FROM clamp),
      $iterCtes
      SELECT node, label, CAST(mass AS BIGINT) AS mass_units,
             CAST(n_labels AS BIGINT) AS n_labels
      FROM (SELECT node, label, mass,
                   count(*) OVER (PARTITION BY node) AS n_labels,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY mass DESC, label ASC) AS rn
            FROM m$iterations) t
      WHERE rn = 1"""
  }

  /** q109's oracle: HITS unrolled — per iteration an authority CTE
    * (hub-sum over in-edges + integer renormalization) then a hub CTE
    * (authority-sum over out-edges + the same renorm). Pure BIGINT
    * arithmetic; HUGEINT intermediates cast back at the end.
    */
  private def hitsOracle(iterations: Int): String = {
    val units = graft.operators.GraphRank.DefaultUnits
    val iterCtes = (1 to iterations).map { i =>
      val prevH = if (i == 1) "hs0" else s"hs${i - 1}"
      s"""au${i}_raw AS MATERIALIZED (
        SELECT nd.node, coalesce(s.v, 0) AS a
        FROM nodes nd LEFT JOIN (
          SELECT e.dst AS node, sum(p.h) AS v
          FROM e JOIN $prevH p ON p.node = e.src GROUP BY e.dst) s USING (node)),
      au$i AS MATERIALIZED (
        SELECT node, a // greatest((SELECT sum(a) FROM au${i}_raw) // $units, 1) AS a
        FROM au${i}_raw),
      hs${i}_raw AS MATERIALIZED (
        SELECT nd.node, coalesce(s.v, 0) AS h
        FROM nodes nd LEFT JOIN (
          SELECT e.src AS node, sum(p.a) AS v
          FROM e JOIN au$i p ON p.node = e.dst GROUP BY e.src) s USING (node)),
      hs$i AS MATERIALIZED (
        SELECT node, h // greatest((SELECT sum(h) FROM hs${i}_raw) // $units, 1) AS h
        FROM hs${i}_raw)"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      e AS (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                        CAST(o_custkey AS BIGINT) + $offSql AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      c AS (SELECT CAST($units AS BIGINT) // count(*) AS r0 FROM nodes),
      hs0 AS (SELECT node, (SELECT r0 FROM c) AS h FROM nodes),
      $iterCtes
      SELECT au$iterations.node,
             CAST(au$iterations.a AS BIGINT) AS auth_units,
             CAST(hs$iterations.h AS BIGINT) AS hub_units,
             round(au$iterations.a / $units.0, 6) AS authority,
             round(hs$iterations.h / $units.0, 6) AS hub
      FROM au$iterations JOIN hs$iterations USING (node)"""
  }

  /** q107's / q110's oracle: the integer fixed-point (Trust/Page)Rank
    * recurrence unrolled as one CTE per iteration. Every operation is
    * BIGINT arithmetic (`//` = floor division, all values
    * non-negative), so DuckDB lands on the engine's ranks bit-for-bit.
    * `seedPred` restricts the teleport targets (TrustRank); None =
    * every node (PageRank).
    */
  /** q121's oracle: the weighted-teleport recurrence — per-node teleport
    * weight `tw` from a deterministic SQL expression over the node id,
    * TW its sum over seeds present, r0/base per node proportional to tw
    * (all BIGINT floor division, replaying trustRank's seedWeightCol
    * path bit-for-bit).
    */
  private def weightedRankOracle(iterations: Int, seedPred: String,
                                 twExpr: String): String = {
    val units = graft.operators.GraphRank.DefaultUnits
    val iterCtes = (1 to iterations).map { i =>
      val prev = if (i == 1) "it0" else s"it${i - 1}"
      s"""it$i AS MATERIALIZED (
        SELECT t.node,
               (CAST(15 AS BIGINT) * $units * t.tw) // (CAST(100 AS BIGINT) * (SELECT twt FROM c))
                 + (85 * coalesce(s.insum, 0)) // 100 AS r
        FROM tw t LEFT JOIN (
          SELECT e.dst AS node, sum(p.r * e.w // od.outw) AS insum
          FROM e JOIN od USING (src) JOIN $prev p ON p.node = e.src
          GROUP BY e.dst) s USING (node))"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      p AS MATERIALIZED (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                        CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS MATERIALIZED (
        SELECT s AS src, c AS dst, 1 AS w FROM p
        UNION SELECT c AS src, s AS dst, 1 AS w FROM p),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      od AS MATERIALIZED (SELECT src, sum(w) AS outw FROM e GROUP BY src),
      tw AS MATERIALIZED (
        SELECT node, CASE WHEN $seedPred THEN ($twExpr) ELSE 0 END AS tw
        FROM nodes nd),
      c AS MATERIALIZED (SELECT sum(tw) AS twt FROM tw),
      it0 AS (SELECT node, (CAST($units AS BIGINT) * tw) // (SELECT twt FROM c) AS r FROM tw),
      $iterCtes
      SELECT node, CAST(r AS BIGINT) AS rank_units,
             round(r / $units.0, 6) AS rank
      FROM it$iterations"""
  }

  private def linkRankOracle(iterations: Int,
                             seedPred: Option[String] = None): String = {
    val units = graft.operators.GraphRank.DefaultUnits
    val tgt = seedPred.getOrElse("TRUE")
    val iterCtes = (1 to iterations).map { i =>
      val prev = if (i == 1) "it0" else s"it${i - 1}"
      s"""it$i AS MATERIALIZED (
        SELECT nd.node,
               (CASE WHEN $tgt THEN (SELECT base FROM c) ELSE 0 END)
                 + (85 * coalesce(s.insum, 0)) // 100 AS r
        FROM nodes nd LEFT JOIN (
          SELECT e.dst AS node, sum(p.r // od.outdeg) AS insum
          FROM e JOIN od USING (src) JOIN $prev p ON p.node = e.src
          GROUP BY e.dst) s USING (node))"""
    }.mkString(",\n")
    s"""
      WITH $offCte,
      p AS MATERIALIZED (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                        CAST(o_custkey AS BIGINT) + $offSql AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS MATERIALIZED (
        SELECT s AS src, c AS dst FROM p
        UNION SELECT c AS src, s AS dst FROM p),
      nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
      od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      c AS MATERIALIZED (
        SELECT count(*) AS m,
               CAST($units AS BIGINT) // count(*) AS r0,
               (CAST(15 AS BIGINT) * $units) // (100 * count(*)) AS base
        FROM nodes nd WHERE $tgt),
      it0 AS (SELECT node,
                     CASE WHEN $tgt THEN (SELECT r0 FROM c) ELSE 0 END AS r
              FROM nodes nd),
      $iterCtes
      SELECT node, CAST(r AS BIGINT) AS rank_units,
             round(r / $units.0, 6) AS rank
      FROM it$iterations"""
  }
}
