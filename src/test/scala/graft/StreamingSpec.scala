package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** L4 streaming semantics (SURVEY.md §5): the arrival-order-dependent
  * behaviors that the DuckDB oracle cannot check, plus the single-batch
  * guard that the D7 oracle discipline depends on.
  */
class StreamingSpec extends GraftSpec {

  test("StreamingQueryListener observes every batch and the full input row count") {
    // The monitoring surface (Flink's metrics/reporter analog): a
    // registered listener must see start / per-batch progress /
    // termination, and the progress events' numInputRows must sum to
    // the corpus — the numbers an operator dashboard would chart.
    import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val started = new AtomicBoolean(false)
    val terminated = new AtomicBoolean(false)
    val rows = new AtomicLong(0L)
    val batches = new AtomicLong(0L)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        started.set(true)
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        batches.incrementAndGet()
        rows.addAndGet(e.progress.numInputRows)
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        terminated.set(true)
    }
    spark.streams.addListener(listener)
    try {
      val out = SparkEntry.queries("stream_tumbling")(spark, sf)
      assert(out.count() > 0)
      // listener events are delivered asynchronously post-termination
      val deadline = System.currentTimeMillis() + 20000
      while (!terminated.get() && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val corpus = Tables.events(spark, sf).count()
      assert(started.get(), "no start event delivered")
      assert(terminated.get(), "no termination event delivered")
      assert(batches.get() > 0, "no progress events delivered")
      assert(rows.get() == corpus,
        s"listener saw ${rows.get()} input rows, corpus has $corpus")
    } finally spark.streams.removeListener(listener)
  }

  private def ckpt = Files.createTempDirectory("graft_test_ckpt_").toString

  test("stream_pattern_until_timeout: the open until seals by idle " +
      "processing-time timer — closed loops bind the first purchase, " +
      "open loops seal with a null close and their click count") {
    // NON-ORACLE by contract (§2.H): the open-form until has no
    // event-time horizon; the idle timeout is wall-clock, so the pin
    // is a crafted fixture + an independent in-test verdict, not a
    // DuckDB replay. The timer must fire on Spark's no-data
    // micro-batches — no further input exists after staging.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_untilto_").toString
    val us = 1000000L
    def row(tsUs: Long, uid: Long, et: String, eid: Long) =
      (new Timestamp(tsUs / 1000), tsUs * 1000, uid, et, eid)
    // user 1: signup → 3 clicks → purchase → 1 trailing click (closed,
    //   b_count = 3 — the trailing click is outside the loop); user 2:
    //   two signups, NO purchase — the first seals open counting all 3
    //   later clicks, the second open with the 1 click after it;
    //   user 3: purchase BEFORE its signup only (open, b_count = 0 —
    //   a close never binds backwards); user 4: clicks + a purchase
    //   but NO signup ever — its idle timer must still fire (r15 leak
    //   fix: state is armed whenever written), seal with zero anchors
    //   (no output row), and clear the buffered state
    Seq(
      row(10 * us, 1L, "signup", 100L), row(11 * us, 1L, "click", 101L),
      row(12 * us, 1L, "click", 102L), row(13 * us, 1L, "click", 103L),
      row(14 * us, 1L, "purchase", 104L), row(15 * us, 1L, "click", 105L),
      row(10 * us, 2L, "signup", 200L), row(11 * us, 2L, "click", 201L),
      row(12 * us, 2L, "click", 202L), row(13 * us, 2L, "signup", 203L),
      row(14 * us, 2L, "click", 204L),
      row(9 * us, 3L, "purchase", 301L), row(10 * us, 3L, "signup", 300L),
      row(10 * us, 4L, "click", 400L), row(11 * us, 4L, "purchase", 401L))
      .toDF("ts_utc", "ts", "user_id", "event_type", "event_id")
      .repartition(1).write.mode("overwrite").parquet(dir)
    // 4 anchors total (user 2 has two signups)
    val got = StreamingOps.untilTimeoutRun(spark, dir,
        timeoutMs = 1500L, expectedRows = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3), r.getBoolean(4))).toSeq
    val exp = Seq(
      (1L, 100L, Some(104L), 3L, true),
      (2L, 200L, None, 3L, false),
      (2L, 203L, None, 1L, false),
      (3L, 300L, None, 0L, false))
    assert(got == exp, s"idle-timeout until verdicts drifted:\n$got")
    // the anchor-less user 4 sealed silently: no verdict row exists
    // for it (its timer fired — the poll returned — and emitted none)
    assert(!got.exists(_._1 == 4L),
      s"anchor-less key emitted a verdict: $got")
  }

  test("stream_watermark_late: late rows behind the watermark are dropped") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_late_").toString
    val in = s"$dir/in"
    val checkpoint = ckpt

    def t(s: String) = Timestamp.valueOf(s)
    def stage(rows: Seq[(Timestamp, String)]): Unit =
      rows.toDF("ts", "k").repartition(1).write.mode("append").parquet(in)

    // Two *separate* AvailableNow runs over a shared checkpoint = two
    // micro-batches with a real watermark carried across the restart.
    // (memory sink can't recover a checkpoint — collect via foreachBatch.)
    val emittedRows =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    def runOnce(): Unit = {
      val sch = spark.read.parquet(in).schema
      val q = spark.readStream.schema(sch).parquet(in)
        .withWatermark("ts", "15 minutes")
        .groupBy(window($"ts", "1 hour").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").cast("string").as("ws"), $"cnt")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            emittedRows.add(r.getString(0) -> r.getLong(1)))
        }
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint).start()
      q.awaitTermination()
    }

    // batch 1: two rows in the 10:00 window + 12:00 row → watermark 11:45
    stage(Seq((t("2024-01-01 10:05:00"), "a"),
      (t("2024-01-01 10:10:00"), "a"), (t("2024-01-01 12:00:00"), "b")))
    runOnce()
    // batch 2: LATE row for the closed 10:00 window + a fresh 13:00 row
    stage(Seq((t("2024-01-01 10:20:00"), "a"),
      (t("2024-01-01 13:00:00"), "c")))
    runOnce()

    import scala.jdk.CollectionConverters._
    val emitted = emittedRows.asScala.toMap
    assert(emitted.get("2024-01-01 10:00:00").contains(2L),
      s"late row leaked into closed window: $emitted")
  }

  test("update-mode collapse survives multi-micro-batch runs") {
    // The registered stateful ops read ONE staged file (single batch), but
    // their memory-sink read goes through collapseUpdates so a split input
    // (more files / maxFilesPerTrigger) stays correct. Force a real 2-batch
    // update-mode run and assert the collapse recovers the final state.
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val dir = Files.createTempDirectory("graft_multi_").toString
    Seq((1L, 10.0), (2L, 5.0)).toDF("user_id", "value")
      .repartition(1).write.mode("append").parquet(dir)
    Seq((1L, 7.0), (2L, 1.0)).toDF("user_id", "value")
      .repartition(1).write.mode("append").parquet(dir)
    val sch = spark.read.parquet(dir).schema
    val out = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Double)],
         st: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) => {
          var (n, acc) = st.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; acc += v }
          st.update((n, acc))
          (uid, n, acc)
        })
      .toDF("user_id", "n_events", "total_value")
    val q = out.writeStream.format("memory").queryName("multi_upd")
      .outputMode("update").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination()
    val raw = spark.table("multi_upd")
    // precondition: the sink really holds intermediate updates
    assert(raw.count() > 2, s"expected >1 update per user, got ${raw.count()}")
    val collapsed = StreamingOps.collapseUpdatesForTest(raw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(collapsed == Set((1L, 2L, 17.0), (2L, 2L, 6.0)),
      s"collapse wrong: $collapsed")
  }

  test("stream_approx_distinct within 5% of exact per-window distincts") {
    val approx = SparkEntry.queries("stream_approx_distinct")(spark, sf)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts_utc")).as("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, ex) =>
      val ap = approx(d)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$d: approx=$ap exact=$ex off by >5%")
    }
  }

  test("source_rate_smoke: rate source produces rows") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").option("numPartitions", "1").load()
      .writeStream.format("memory").queryName("rate_smoke")
      .option("checkpointLocation", ckpt).start()
    try {
      eventually(20, 500) { spark.table("rate_smoke").count() > 0 }
      assert(spark.table("rate_smoke").count() > 0)
    } finally q.stop()
  }

  test("events replay is a single micro-batch (guards D7 oracle discipline)") {
    val sch = spark.read.parquet(s"$sf/events.parquet").schema
    val dir = Files.createTempDirectory("graft_single_").toString
    Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(s"$sf/events.parquet"))
    val q = spark.readStream.schema(sch).parquet(dir)
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("single_batch")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 1, s"expected 1 data batch, saw $dataBatches")
    val total = q.recentProgress.map(_.numInputRows).sum
    assert(total == spark.read.parquet(s"$sf/events.parquet").count())
  }

  test("stream_tumbling equals the engine's own batch computation") {
    val streamed = SparkEntry.queries("stream_tumbling")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts_utc"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(Tables.dec(col("value"))).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("cnt"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("w_start"), col("event_type"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream_session equals batch session_window computation") {
    val streamed = SparkEntry.queries("stream_session")(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(session_window(col("ts_utc"), "10 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(Tables.dec(col("value"))).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), col("cnt"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("s_start"))
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("session windows merge across micro-batch restarts via state recovery") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess_").toString
    val in = s"$dir/in"
    val checkpoint = ckpt

    def t(s: String) = Timestamp.valueOf(s)
    def stage(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "uid").repartition(1).write.mode("append").parquet(in)

    val emitted =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    def runOnce(): Unit = {
      val sch = spark.read.parquet(in).schema
      val q = spark.readStream.schema(sch).parquet(in)
        .withWatermark("ts", "0 seconds")
        .groupBy(session_window($"ts", "10 minutes").as("sw"), $"uid")
        .agg(count(lit(1)).as("cnt"))
        .select($"uid", col("sw.start").cast("string").as("ss"), $"cnt")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            emitted.add((r.getLong(0), r.getString(1), r.getLong(2))))
        }
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint).start()
      q.awaitTermination()
    }

    // batch 1: user 1 opens a session at 10:00/10:05 — still open (no
    // event advances the watermark past its 10:15 close)
    stage(Seq((t("2024-01-01 10:00:00"), 1L),
      (t("2024-01-01 10:05:00"), 1L)))
    runOnce()
    // batch 2 after restart: 10:08 extends the RECOVERED session (within
    // the 10-min gap of 10:05); 12:00 advances the watermark past the
    // extended close (10:18) so the merged session finalizes
    stage(Seq((t("2024-01-01 10:08:00"), 1L),
      (t("2024-01-01 12:00:00"), 2L)))
    runOnce()
    // batch 3: sentinel far ahead finalizes user 2's session too
    stage(Seq((t("2024-01-01 23:00:00"), 3L)))
    runOnce()

    import scala.jdk.CollectionConverters._
    val sessions = emitted.asScala.toSeq
    val u1 = sessions.filter(_._1 == 1L)
    assert(u1 == Seq((1L, "2024-01-01 10:00:00", 3L)),
      s"expected one merged 3-event session for user 1, got $sessions")
  }

  test("stream-stream join matches rows buffered before a restart") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssj_").toString
    val in = s"$dir/in"
    val checkpoint = ckpt

    def t(s: String) = Timestamp.valueOf(s)
    def stage(rows: Seq[(Timestamp, Long, String)]): Unit =
      rows.toDF("ts", "uid", "kind").repartition(1)
        .write.mode("append").parquet(in)

    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Unit = {
      val sch = spark.read.parquet(in).schema
      val src = spark.readStream.schema(sch).parquet(in)
      val p = src.filter($"kind" === "p")
        .select($"uid".as("p_uid"), $"ts".as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val c = src.filter($"kind" === "c")
        .select($"uid".as("c_uid"), $"ts".as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val q = p.join(c,
          $"p_uid" === $"c_uid" &&
            $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
            $"c_ts" <= $"p_ts", "inner")
        .select($"p_uid")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => emitted.add(r.getLong(0)))
        }
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint).start()
      q.awaitTermination()
    }

    // batch 1: a click for user 7, no purchase yet — nothing joins, but
    // the click must be buffered in join state
    stage(Seq((t("2024-01-01 10:00:00"), 7L, "c")))
    runOnce()
    assert(emitted.isEmpty)
    // batch 2 after restart: the purchase arrives 10 min later — it must
    // match the click RECOVERED from the checkpointed join state
    stage(Seq((t("2024-01-01 10:10:00"), 7L, "p")))
    runOnce()
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSeq == Seq(7L),
      s"buffered click not matched after restart: ${emitted.asScala.toSeq}")
  }

  test("transformWithState recovers RocksDB state across restarts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tws_").toString
    val in = s"$dir/in"
    val checkpoint = ckpt
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def stage(rows: Seq[(Long, Double)]): Unit =
        rows.toDF("user_id", "value").repartition(1)
          .write.mode("append").parquet(in)

      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def runOnce(): Unit = {
        val sch = spark.read.parquet(in).schema
        val q = spark.readStream.schema(sch).parquet(in)
          .as[(Long, Double)]
          .groupByKey(_._1)
          .transformWithState(StreamingOps.runningAggForTest(),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "n_events", "total_value")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.collect().foreach(r =>
              emitted.add(r.getLong(0) -> r.getLong(1)))
          }
          .outputMode("update").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", checkpoint).start()
        q.awaitTermination()
      }

      stage(Seq((1L, 1.5), (1L, 2.5)))
      runOnce()
      stage(Seq((1L, 3.0)))
      runOnce()
      import scala.jdk.CollectionConverters._
      // run 1 emitted (1, 2); run 2 must CONTINUE from recovered state
      // and emit (1, 3), not restart at (1, 1)
      assert(emitted.asScala.toSeq.sorted == Seq(1L -> 2L, 1L -> 3L),
        s"state not recovered: ${emitted.asScala.toSeq}")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("dropDuplicatesWithinWatermark dedups with bounded state") {
    // The 100 TB streaming dedup: plain dropDuplicates keeps every key
    // forever; the within-watermark variant evicts state once the
    // watermark passes, at the cost of only deduplicating within the
    // watermark window — verify the dedup semantics on crafted dupes.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wmdedup_").toString
    def t(s: String) = Timestamp.valueOf(s)
    Seq((t("2024-01-01 10:00:00"), 1L, "a"),
      (t("2024-01-01 10:01:00"), 1L, "b"), // dup id within window
      (t("2024-01-01 10:02:00"), 2L, "c"))
      .toDF("ts", "id", "payload")
      .repartition(1).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val q = spark.readStream.schema(schema).parquet(s"$dir/in")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    val out = spark.table("wm_dedup").collect()
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("event-time timer fires in a later micro-batch; boundary is strict") {
    // Pins the engine's timer-fire condition (expiry vs watermark, ms
    // precision) that the stream_session_timeout oracle mirrors:
    //  - user 3's session closes at 09:10, strictly before the final
    //    watermark (10:10) → its timer MUST fire (emission from
    //    handleExpiredTimer in the trailing no-data batch — timer-driven,
    //    no later event for user 3 exists to close it by data);
    //  - user 1's close time (10:10) EQUALS the watermark → pins < vs ≤
    //    (measured: it emits, so the condition is inclusive ≤);
    //  - user 2 defines the watermark; its own close (10:20) lies beyond
    //    → must stay unemitted.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_timer_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      Seq((t("2024-01-01 09:00:00"), 3L, 1.0),
        (t("2024-01-01 10:00:00"), 1L, 1.0),
        (t("2024-01-01 10:10:00"), 2L, 1.0))
        .toDF("ts", "uid", "value")
        .repartition(1).write.parquet(s"$dir/in")
      val sch = spark.read.parquet(s"$dir/in").schema
      val q = spark.readStream.schema(sch).parquet(s"$dir/in")
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("value"))
        .as[(Timestamp, Long, Long, Double)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.sessionTimeoutForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "start_us", "end_us", "cnt", "sum_dec")
        .writeStream.format("memory").queryName("timer_boundary")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      val emitted = spark.table("timer_boundary").collect()
        .map(r => r.getLong(0)).toSet
      // watermark batches ran past the data batch (timer needs one)
      assert(q.recentProgress.length > 1,
        "no trailing batch ran — timers had no chance to fire")
      assert(emitted.contains(3L), "strictly-past timer did not fire")
      assert(!emitted.contains(2L), "session beyond the watermark emitted")
      // the boundary case: the engine fires timers at expiry <= watermark
      // (inclusive — verified here), so the close-time == watermark
      // session EMITS. The stream_session_timeout oracle encodes exactly
      // this with epoch_ms(close) <= epoch_ms(max ts).
      assert(emitted.contains(1L),
        "boundary session missing — oracle's <= no longer matches")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_session_timeout equals batch sessionization with the cutoff") {
    val streamed = SparkEntry.queries("stream_session_timeout")(spark, sf)
      .collect().map(_.toString).toSeq
    // engine-internal batch recomputation of the same semantics: sessions
    // gaps-and-islands'd in µs; trailing session per user kept only if
    // its ms-floored close <= ms-floored max event time (inclusive, as
    // the timer-boundary test pins)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val maxTs = ev.agg(max(col("ts_us"))).head().getLong(0)
    val batch = ev
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) <= 600000000L, 0)
          .otherwise(1))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("last_us"), count(lit(1)).as("cnt"),
        sum(Tables.dec(col("value"))).as("sv"))
      .withColumn("last_sess", max(col("sess_id")).over(wAll))
      .filter(col("sess_id") < col("last_sess") ||
        floor((col("last_us") + 600000000L) / 1000) <= lit(maxTs / 1000))
      .select(col("user_id"),
        timestamp_micros(col("start_us")).as("s_start"),
        timestamp_micros(col("last_us") + 600000000L).as("s_end"),
        col("cnt"), col("sv").cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("s_start"))
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
  }

  test("stream_funnel: cross-batch conversion, first-purchase pick, pending holdback") {
    // Pins the funnel processor's three load-bearing behaviors on a real
    // 2-micro-batch run (maxFilesPerTrigger=1):
    //  - u1: two same-batch purchases → the EARLIEST (ts, id) wins
    //    (09:20/#210 beats 09:30/#200) even if file order differs;
    //  - u2: signup in batch 1, purchase in batch 2 → state carries the
    //    pending signup across batches and the conversion still lands;
    //  - u4: no purchase → explicit non-conversion ONLY once its 1 h
    //    deadline clears the final watermark;
    //  - u3: signup whose deadline (11:00) exceeds the final watermark
    //    (10:40) → NO verdict emitted (the cutoff the oracle mirrors).
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_funnel_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:30
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 100L),
        (t("2024-01-01 09:30:00"), 1L, "purchase", 200L),
        (t("2024-01-01 09:20:00"), 1L, "purchase", 210L),
        (t("2024-01-01 09:25:00"), 2L, "signup", 110L),
        (t("2024-01-01 09:10:00"), 4L, "signup", 130L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all rows >= 09:30 (not late); final wm: 10:40
      Seq((t("2024-01-01 09:40:00"), 2L, "purchase", 220L),
        (t("2024-01-01 10:00:00"), 3L, "signup", 120L),
        (t("2024-01-01 10:40:00"), 3L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.funnelForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "purchase_id", "us_to_convert")
        .writeStream.format("memory").queryName("funnel_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      val rows = spark.table("funnel_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(rows == Set(
        (1L, 100L, 210L, 1200000000L), // first purchase: 09:20, 20 min
        (2L, 110L, 220L, 900000000L),  // cross-batch: 09:40, 15 min
        (4L, 130L, -1L, -1L)),         // matured non-conversion
        s"funnel verdicts wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_pattern_absence: cross-batch purchase voids the non-match; holdback past the watermark") {
    // Pins the absence processor's load-bearing behaviors on a real
    // 2-micro-batch run:
    //  - u1: signup in batch 1, purchase in batch 2 inside the hour →
    //    verdict followed=true (the cross-batch void the eager emission
    //    a state-less negation would get wrong);
    //  - u2: purchases only OUTSIDE (s_ts, s_ts+1h] (one before the
    //    signup, one past the deadline) → followed=false;
    //  - u4: no purchase at all → followed=false once the deadline
    //    clears the final watermark;
    //  - u3: deadline (11:00) past the final watermark (10:40) → NO
    //    verdict (the cutoff the oracle mirrors).
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_absence_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:25
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 100L),
        (t("2024-01-01 09:20:00"), 2L, "purchase", 205L),
        (t("2024-01-01 09:25:00"), 2L, "signup", 110L),
        (t("2024-01-01 09:10:00"), 4L, "signup", 130L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all rows >= 09:25 (not late); final wm: 10:40
      Seq((t("2024-01-01 09:40:00"), 1L, "purchase", 200L),
        (t("2024-01-01 10:26:00"), 2L, "purchase", 220L), // past deadline
        (t("2024-01-01 10:00:00"), 3L, "signup", 120L),
        (t("2024-01-01 10:40:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.patternAbsenceForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "s_ts_us", "followed")
        .writeStream.format("memory").queryName("absence_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      val rows = spark.table("absence_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
      assert(rows == Set(
        (1L, 100L, true),   // cross-batch purchase voids the non-match
        (2L, 110L, false),  // purchases outside the window don't count
        (4L, 130L, false)), // matured true absence
        s"absence verdicts wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_pattern_optional: greedy with-click chain, fallback to pre-click purchase, cross-batch completion") {
    // Pins the optional quantifier's load-bearing semantics:
    //  - u1: purchase BEFORE the click, none after it → the with-click
    //    chain cannot complete, so the match falls back to the
    //    click-skipped branch (click_id null, the EARLIER purchase) —
    //    the distinctive greedy-optional behavior;
    //  - u2: click then purchase across the batch boundary → with-click
    //    match (state buffers the chain);
    //  - u3: click, no purchase at all → dangling click, no completion.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_opt_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:20
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 100L),
        (t("2024-01-01 09:10:00"), 1L, "purchase", 200L),
        (t("2024-01-01 09:20:00"), 1L, "click", 150L),
        (t("2024-01-01 09:05:00"), 2L, "signup", 110L),
        (t("2024-01-01 09:10:00"), 2L, "click", 160L),
        (t("2024-01-01 09:02:00"), 3L, "signup", 120L),
        (t("2024-01-01 09:15:00"), 3L, "click", 170L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all rows >= 09:20 (not late); final wm: 10:30
      Seq((t("2024-01-01 09:25:00"), 2L, "purchase", 210L),
        (t("2024-01-01 10:30:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.patternOptionalForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "click_id", "purchase_id",
          "us_to_complete")
        .writeStream.format("memory").queryName("opt_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      val rows = spark.table("opt_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(rows == Set(
        (1L, 100L, -1L, 200L),  // greedy fallback: pre-click purchase
        (2L, 110L, 160L, 210L), // cross-batch with-click completion
        (3L, 120L, 170L, -1L)), // dangling click
        s"optional verdicts wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_count_window: cross-batch windows, index continuity, unsealed holdback") {
    // Pins the count-window processor on a real 2-micro-batch run
    // (winSize=2 for hand-checkable windows):
    //  - u1: events straddle the batches; window 0 emits from batch 1's
    //    sealed prefix, window 1 forms across the batch boundary with a
    //    CONTIGUOUS index (nEmitted persisted in state);
    //  - u2: both members arrive in different batches → one window;
    //  - u3: both events sit in the final watermark's millisecond →
    //    never sealed, nothing emits (the cutoff the oracle mirrors);
    //  - last events of u1/u2 (ts = final wm) stay held back.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cw_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:40
      Seq((t("2024-01-01 09:00:00"), 1L, 101L, 1000000L),
        (t("2024-01-01 09:10:00"), 1L, 102L, 2000000L),
        (t("2024-01-01 09:30:00"), 1L, 103L, 3000000L),
        (t("2024-01-01 09:40:00"), 2L, 201L, 1000000L))
        .toDF("ts", "uid", "eid", "v_us")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all rows >= 09:40 (not late); final wm: 10:30
      Seq((t("2024-01-01 09:45:00"), 1L, 104L, 4000000L),
        (t("2024-01-01 10:30:00"), 1L, 105L, 5000000L),
        (t("2024-01-01 09:42:00"), 2L, 202L, 2000000L),
        (t("2024-01-01 10:30:00"), 2L, 203L, 3000000L),
        (t("2024-01-01 10:30:00"), 3L, 301L, 1000000L),
        (t("2024-01-01 10:30:00"), 3L, 302L, 2000000L))
        .toDF("ts", "uid", "eid", "v_us")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("eid"), col("v_us"))
        .as[(Timestamp, Long, Long, Long, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.countWindowForTest(2),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "win_idx", "w_first_us", "w_last_us", "sum_value")
        .writeStream.format("memory").queryName("cw_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
      val rows = spark.table("cw_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(rows == Set(
        (1L, 0L, us("2024-01-01 09:00:00"), us("2024-01-01 09:10:00"), 3.0),
        (1L, 1L, us("2024-01-01 09:30:00"), us("2024-01-01 09:45:00"), 7.0),
        (2L, 0L, us("2024-01-01 09:40:00"), us("2024-01-01 09:42:00"), 3.0)),
        s"count windows wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_count_sliding: overlap across an eviction boundary, full windows only") {
    // Pins the sliding-count processor (winSize=3, slide=2 for
    // hand-checkable windows; window j = ranks [2j+1, 2j+3]):
    //  - u1: 6 events across 2 batches. Window 0 (ranks 1-3) emits from
    //    batch 1's sealed prefix and EVICTS ranks 1-2; window 1 (ranks
    //    3-5) then reuses rank 3 from the surviving buffer — the event
    //    at 09:20 appears in BOTH windows, and its global rank is only
    //    correct if baseRank survived the eviction;
    //  - u2: exactly 3 sealed events → one window (indices independent
    //    per key);
    //  - u3: 2 events — fewer than winSize, nothing emits (full windows
    //    only, the slide never fabricates a partial);
    //  - u1's 10:30 event sits at the final watermark → held back, so
    //    window 2 (ranks 5-7) can never form.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cs_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:30
      Seq((t("2024-01-01 09:00:00"), 1L, 101L, 1000000L),
        (t("2024-01-01 09:10:00"), 1L, 102L, 2000000L),
        (t("2024-01-01 09:20:00"), 1L, 103L, 3000000L),
        (t("2024-01-01 09:30:00"), 1L, 104L, 4000000L),
        (t("2024-01-01 09:00:00"), 2L, 201L, 1000000L),
        (t("2024-01-01 09:05:00"), 2L, 202L, 2000000L),
        (t("2024-01-01 09:10:00"), 2L, 203L, 3000000L),
        (t("2024-01-01 09:00:00"), 3L, 301L, 1000000L))
        .toDF("ts", "uid", "eid", "v_us")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all rows >= 09:30 (not late); final wm: 10:30
      Seq((t("2024-01-01 09:40:00"), 1L, 105L, 5000000L),
        (t("2024-01-01 10:30:00"), 1L, 106L, 6000000L),
        (t("2024-01-01 09:35:00"), 3L, 302L, 2000000L))
        .toDF("ts", "uid", "eid", "v_us")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("eid"), col("v_us"))
        .as[(Timestamp, Long, Long, Long, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.countWindowForTest(3, 2),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "win_idx", "w_first_us", "w_last_us", "sum_value")
        .writeStream.format("memory").queryName("cs_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
      val rows = spark.table("cs_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(rows == Set(
        (1L, 0L, us("2024-01-01 09:00:00"), us("2024-01-01 09:20:00"), 6.0),
        (1L, 1L, us("2024-01-01 09:20:00"), us("2024-01-01 09:40:00"), 12.0),
        (2L, 0L, us("2024-01-01 09:00:00"), us("2024-01-01 09:10:00"), 6.0)),
        s"sliding count windows wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_ewma: lag context survives batches and sealing, final-ms holdback") {
    // Pins the EWMA processor on a real 2-micro-batch run:
    //  - e1/e2 seal after batch 1 (wm 09:30) and emit with 1- and 2-term
    //    averages;
    //  - e3 sits AT the batch-1 watermark's ms → held back, then seals
    //    in batch 2; its average MUST still see e1/e2, which by then
    //    live only in the 9-long lag context (not the buffer) — the
    //    compression this test exists to pin;
    //  - e4 sits at the final watermark's ms → never emits.
    // Hand-computed (v in micro-units, weights 512/256/128):
    //   e1: 1.0;  e2: (2·512 + 1·256)/768 = 1.666667 (half-up);
    //   e3: (3·512 + 2·256 + 1·128)/896 = 2.428571.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ew_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:30
      Seq((t("2024-01-01 09:00:00"), 1L, 101L, 1000000L),
        (t("2024-01-01 09:10:00"), 1L, 102L, 2000000L),
        (t("2024-01-01 09:30:00"), 1L, 103L, 3000000L))
        .toDF("ts", "uid", "eid", "v_us")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — not late; final wm: 09:50
      Seq((t("2024-01-01 09:50:00"), 1L, 104L, 4000000L))
        .toDF("ts", "uid", "eid", "v_us")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("eid"), col("v_us"))
        .as[(Timestamp, Long, Long, Long, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.ewmaForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("event_id", "user_id", "ewma")
        .writeStream.format("memory").queryName("ew_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      val rows = spark.table("ew_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(
        (101L, 1L, 1.0), (102L, 1L, 1.666667), (103L, 1L, 2.428571)),
        s"ewma emissions wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_transitions: prev carry survives batches and sealing, final-ms holdback") {
    // Pins the transition processor on a real 2-micro-batch run:
    //  - e1/e2 seal after batch 1 (wm 09:30): e1 has no predecessor (no
    //    emission), e2 emits (e1.code → e2.code);
    //  - e3 sits AT the batch-1 watermark's ms → held back, then seals
    //    in batch 2; its pair MUST still be (e2.code → e3.code), which
    //    by then lives only in the one-long prevCode state — the
    //    compression this test exists to pin;
    //  - e4 sits at the final watermark's ms → never emits.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tr_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:30
      Seq((t("2024-01-01 09:00:00"), 1L, 101L, 0L),
        (t("2024-01-01 09:10:00"), 1L, 102L, 2L),
        (t("2024-01-01 09:30:00"), 1L, 103L, 4L))
        .toDF("ts", "uid", "eid", "code")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — not late; final wm: 09:50
      Seq((t("2024-01-01 09:50:00"), 1L, 104L, 3L))
        .toDF("ts", "uid", "eid", "code")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("eid"), col("code"))
        .as[(Timestamp, Long, Long, Long, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.transitionsForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("event_id", "user_id", "from_code", "to_code")
        .writeStream.format("memory").queryName("tr_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      val rows = spark.table("tr_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows == Set((102L, 1L, 0L, 2L), (103L, 1L, 2L, 4L)),
        s"transition emissions wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_zscore: lag context survives batches and sealing, n>=5 gate") {
    // Pins the z-score processor on a real 2-micro-batch run:
    //  - e1..e5 seal after batch 1 with fewer than 5 predecessors → z
    //    null, no anomaly;
    //  - e6 seals with exactly 5 lags → finite z below the threshold;
    //  - e7 sits AT the batch-1 watermark's ms → held back, seals in
    //    batch 2; its frame (e1..e6) by then lives only in the 20-long
    //    lag context — the compression this test pins — and its outlier
    //    value must flag;
    //  - e8 sits at the final watermark's ms → never emits.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zs_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:30
      (1 to 6).map(i => (t(f"2024-01-01 09:0${i - 1}:00"), 1L,
          100L + i, i * 1000L))
        .toDF("ts", "uid", "eid", "v_ms")
        .repartition(1).write.mode("append").parquet(dir)
      Seq((t("2024-01-01 09:30:00"), 1L, 107L, 20000L))
        .toDF("ts", "uid", "eid", "v_ms")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — not late; final wm: 09:50
      Seq((t("2024-01-01 09:50:00"), 1L, 108L, 4000L))
        .toDF("ts", "uid", "eid", "v_ms")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "2").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("eid"), col("v_ms"))
        .as[(Timestamp, Long, Long, Long, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.zscoreForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("event_id", "user_id", "z", "is_anomaly")
        .writeStream.format("memory").queryName("zs_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      def zOf(lags: Seq[Long], x: Long): Double = {
        val n = lags.length.toLong
        val s1 = lags.sum; val s2 = lags.map(v => v * v).sum
        (n * x - s1).toDouble / math.sqrt((n * s2 - s1 * s1).toDouble)
      }
      val rows = spark.table("zs_mb").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getBoolean(3))).toSet
      val expect: Set[(Long, Option[Double], Boolean)] =
        (101L to 105L).map(e => (e, None, false)).toSet +
          ((106L, Some(zOf((1L to 5L).map(_ * 1000L), 6000L)), false)) +
          ((107L, Some(zOf((1L to 6L).map(_ * 1000L), 20000L)), true))
      assert(rows == expect, s"z-score emissions wrong: $rows vs $expect")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_funnel: purchase processed before a not-late sub-ms-later signup still converts") {
    // The watermark is ms-truncated while events carry µs timestamps, so
    // a purchase can be processed in an EARLIER batch than a signup that
    // is (a) not late (s_ts ≥ wm) and (b) µs-earlier than the purchase.
    // Without the purchase buffer the conversion would be silently lost
    // (the processor only updated already-pending signups):
    //  batch 1: purchase u1 @ 09:30:00.000500 (batch max → wm 09:30:00.000)
    //  batch 2: signup   u1 @ 09:30:00.000100 (≥ wm → accepted; < p_ts)
    // The verdict must be a conversion with us_to_convert = 400 µs.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_funnel_ms_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      Seq((t("2024-01-01 09:30:00.0005"), 1L, "purchase", 200L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      Seq((t("2024-01-01 09:30:00.0001"), 1L, "signup", 100L),
        (t("2024-01-01 10:40:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.funnelForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "purchase_id", "us_to_convert")
        .writeStream.format("memory").queryName("funnel_ms")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1, "needed a 2-batch run")
      val rows = spark.table("funnel_ms").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(rows == Set((1L, 100L, 200L, 400L)),
        s"ms-boundary conversion lost or wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_pattern_abc: buffered events survive eviction inside the watermark's ms for a sub-ms-later signup") {
    // Pattern twin of the funnel sub-ms race: the watermark is
    // ms-truncated while events carry µs timestamps, so buffered
    // clicks/purchases inside the watermark's CURRENT millisecond must
    // survive eviction even with no pending signup protecting them — a
    // not-late signup (s_ts ≥ wm) with a smaller-µs timestamp in that
    // same ms can still arrive and needs them:
    //  file 1: click 09:30:00.0005, purchase 09:30:00.0008 → wm 09:30:00.000
    //  file 2: click 09:30:00.0002 (evict pass runs for u1 with NO
    //          pending signups and wm in the events' ms — an ms-floor
    //          eviction would drop all three events here)
    //  file 3: signup 09:30:00.0001 (≥ wm → accepted; µs-earlier than
    //          every buffered event) + a 10:40 view to seal the window.
    // Chain: first click after signup = .0002, first purchase after that
    // click = .0008 → full completion, us_to_complete = 700.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_abc_ms_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      Seq((t("2024-01-01 09:30:00.0005"), 1L, "click", 300L),
        (t("2024-01-01 09:30:00.0008"), 1L, "purchase", 400L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      Seq((t("2024-01-01 09:30:00.0002"), 1L, "click", 310L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20)
      Seq((t("2024-01-01 09:30:00.0001"), 1L, "signup", 100L),
        (t("2024-01-01 10:40:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.patternAbcForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "click_id", "purchase_id",
          "us_to_complete")
        .writeStream.format("memory").queryName("abc_ms")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 2, "needed a 3-file-batch run")
      def opt(r: org.apache.spark.sql.Row, i: Int): Long =
        if (r.isNullAt(i)) -1L else r.getLong(i)
      val rows = spark.table("abc_ms").collect()
        .map(r => (r.getLong(0), r.getLong(1), opt(r, 2), opt(r, 3),
          opt(r, 4))).toSet
      assert(rows == Set((1L, 100L, 310L, 400L, 700L)),
        s"ms-boundary chain lost or wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_pattern_abc: chain re-binding, step order, cross-batch, holdback") {
    // The 3-step chain's load-bearing rules, on a real 2-batch run:
    //  - u1: FIRST click wins even when a later click arrives first in
    //    the batch (arrival order ≠ event order), and the purchase step
    //    only counts purchases AFTER that click (the 09:05 purchase
    //    precedes the 09:20 click → excluded; 09:50 qualifies);
    //  - u2: purchase before its click → click recorded, purchase null;
    //  - u3: purchase but NO click → chain stops at step 2 (both null) —
    //    a funnel would have converted; the chain must not;
    //  - u5: click+purchase arrive in batch 2, signup in batch 1 → the
    //    buffered-window state carries across batches;
    //  - u4: deadline (11:00) beyond final watermark (10:30) → no row.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_abc_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:30
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 100L),
        (t("2024-01-01 09:30:00"), 1L, "click", 300L),   // later click first
        (t("2024-01-01 09:20:00"), 1L, "click", 310L),   // true first click
        (t("2024-01-01 09:05:00"), 1L, "purchase", 400L), // before click
        (t("2024-01-01 09:00:00"), 2L, "signup", 110L),
        (t("2024-01-01 09:10:00"), 2L, "purchase", 410L), // before u2's click
        (t("2024-01-01 09:15:00"), 2L, "click", 320L),
        (t("2024-01-01 09:00:00"), 3L, "signup", 120L),
        (t("2024-01-01 09:10:00"), 3L, "purchase", 420L), // no click at all
        (t("2024-01-01 09:05:00"), 5L, "signup", 130L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all >= 09:30; final wm: 10:30
      Seq((t("2024-01-01 09:50:00"), 1L, "purchase", 430L), // after click
        (t("2024-01-01 09:40:00"), 5L, "click", 330L),
        (t("2024-01-01 09:55:00"), 5L, "purchase", 440L),
        (t("2024-01-01 10:00:00"), 4L, "signup", 140L),     // stays pending
        (t("2024-01-01 10:30:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.patternAbcForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "click_id", "purchase_id",
          "us_to_complete")
        .writeStream.format("memory").queryName("abc_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      def opt(r: org.apache.spark.sql.Row, i: Int): Long =
        if (r.isNullAt(i)) -1L else r.getLong(i)
      val rows = spark.table("abc_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), opt(r, 2), opt(r, 3),
          opt(r, 4))).toSet
      assert(rows == Set(
        (1L, 100L, 310L, 430L, 3000000000L), // first click 09:20, purchase 09:50
        (2L, 110L, 320L, -1L, -1L),          // purchase precedes click
        (3L, 120L, -1L, -1L, -1L),           // no click: chain never starts
        (5L, 130L, 330L, 440L, 3000000000L)),// whole tail arrived in batch 2
        s"pattern verdicts wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_pattern_quantified: greedy B+ count, first-C close, B-before-C required, holdback") {
    // The quantifier's load-bearing rules, on a real 3-batch run:
    //  - u1: the FIRST purchase after the first click closes the match —
    //    b_count counts clicks in (signup, THAT purchase), so the 09:40
    //    click and 09:50 purchase after the 09:30 close are ignored
    //    (greedy B+ absorbs Bs only up to the closing C);
    //  - u2: a purchase BEFORE any click (09:05) must not close the
    //    chain — B+ needs at least one B first; its real chain is the
    //    09:10 click → 09:30 purchase, b_count 1. Its click+purchase
    //    arrive in batch 2, pinning cross-batch buffering;
    //  - u3: clicks but no purchase → click bound, b_count/purchase null
    //    (no C ⇒ nothing quantified);
    //  - u4: deadline (11:00) beyond final watermark (10:45) → no row.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_quant_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:05
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 100L),
        (t("2024-01-01 09:00:00"), 2L, "signup", 110L),
        (t("2024-01-01 09:00:00"), 3L, "signup", 120L),
        (t("2024-01-01 09:05:00"), 2L, "purchase", 420L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all >= 09:05; wm after: 10:00
      Seq((t("2024-01-01 09:10:00"), 1L, "click", 300L),
        (t("2024-01-01 09:20:00"), 1L, "click", 310L),
        (t("2024-01-01 09:30:00"), 1L, "purchase", 400L),
        (t("2024-01-01 09:40:00"), 1L, "click", 320L),
        (t("2024-01-01 09:50:00"), 1L, "purchase", 410L),
        (t("2024-01-01 09:10:00"), 2L, "click", 330L),
        (t("2024-01-01 09:30:00"), 2L, "purchase", 430L),
        (t("2024-01-01 09:10:00"), 3L, "click", 340L),
        (t("2024-01-01 09:15:00"), 3L, "click", 350L),
        (t("2024-01-01 10:00:00"), 4L, "signup", 130L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20)
      // batch 3 — seal: final wm 10:45 > the 10:00 deadlines, < u4's 11:00
      Seq((t("2024-01-01 10:45:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.patternQuantifiedForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "click_id", "purchase_id",
          "b_count", "us_to_complete")
        .writeStream.format("memory").queryName("quant_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 2,
        "input collapsed — cross-batch path untested")
      def opt(r: org.apache.spark.sql.Row, i: Int): Long =
        if (r.isNullAt(i)) -1L else r.getLong(i)
      val rows = spark.table("quant_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), opt(r, 2), opt(r, 3),
          opt(r, 4), opt(r, 5))).toSet
      assert(rows == Set(
        (1L, 100L, 300L, 400L, 2L, 1800000000L),
        (2L, 110L, 330L, 430L, 1L, 1800000000L),
        (3L, 120L, 340L, -1L, -1L, -1L)),
        s"quantified verdicts wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_pattern_times: two-click binding, purchase-before-c2 ignored, cross-batch, holdback") {
    // times(2)'s load-bearing rules on a real 3-batch run:
    //  - u1: purchase 09:15 sits between c1 (09:10) and c2 (09:20) —
    //    it must NOT close the match (B{2} needs both Bs first); the
    //    09:30 purchase after c2 closes it. c2 + closing purchase
    //    arrive in batch 2, pinning cross-batch buffering;
    //  - u2: ONE click only → click1 bound, click2/purchase null;
    //  - u3: no clicks → all steps null;
    //  - u4: deadline (11:00) beyond final watermark (10:45) → no row.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_times_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:15
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 100L),
        (t("2024-01-01 09:00:00"), 2L, "signup", 110L),
        (t("2024-01-01 09:00:00"), 3L, "signup", 120L),
        (t("2024-01-01 09:10:00"), 1L, "click", 300L),
        (t("2024-01-01 09:15:00"), 1L, "purchase", 400L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all >= 09:15; wm after: 10:00
      Seq((t("2024-01-01 09:20:00"), 1L, "click", 310L),
        (t("2024-01-01 09:30:00"), 1L, "purchase", 410L),
        (t("2024-01-01 09:20:00"), 2L, "click", 320L),
        (t("2024-01-01 09:25:00"), 3L, "purchase", 420L),
        (t("2024-01-01 10:00:00"), 4L, "signup", 130L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20)
      // batch 3 — seal: final wm 10:45 > the 10:00 deadlines, < u4's 11:00
      Seq((t("2024-01-01 10:45:00"), 9L, "view", 900L))
        .toDF("ts", "uid", "etype", "eid")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("eid"))
        .as[(Timestamp, Long, Long, String, Long)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.patternTimesForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "signup_id", "click1_id", "click2_id",
          "purchase_id", "us_to_complete")
        .writeStream.format("memory").queryName("times_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 2,
        "input collapsed — cross-batch path untested")
      def opt(r: org.apache.spark.sql.Row, i: Int): Long =
        if (r.isNullAt(i)) -1L else r.getLong(i)
      val rows = spark.table("times_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), opt(r, 2), opt(r, 3),
          opt(r, 4), opt(r, 5))).toSet
      assert(rows == Set(
        (1L, 100L, 300L, 310L, 410L, 1800000000L),
        (2L, 110L, 320L, -1L, -1L, -1L),
        (3L, 120L, -1L, -1L, -1L, -1L)),
        s"times verdicts wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream_stream_join_outer: matches emit eagerly, null rows only after the watermark seals") {
    // Null-emission timing on a real 2-file run:
    //  batch 0 (file 1): purchase u1 09:00 + its 08:50 click MATCH and
    //    emit immediately; purchase u2 09:10 has no click — and must
    //    NOT null-emit yet: the query watermark after batch 0 is
    //    min(max purchase 09:10, max click 08:50) = 08:50 < 09:10.
    //  batch 1 (file 2): purchase+click u9 at 10:00/10:05 advance the
    //    watermark to min(10:00, 10:05) = 10:00 — sealing u2's window;
    //    its null row emits in a LATER batch (state eviction runs after
    //    the watermark advance commits). u9's own purchase (10:00, not
    //    < 10:00) stays held — no row.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssjo_").toString
    def t(s: String) = Timestamp.valueOf(s)
    Seq((t("2024-01-01 08:50:00"), 1L, "click", 300L),
      (t("2024-01-01 09:00:00"), 1L, "purchase", 400L),
      (t("2024-01-01 09:10:00"), 2L, "purchase", 410L))
      .toDF("ts", "uid", "etype", "eid")
      .repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(20) // distinct ms mtimes pin file → batch order
    Seq((t("2024-01-01 10:00:00"), 9L, "purchase", 420L),
      (t("2024-01-01 10:05:00"), 9L, "click", 310L))
      .toDF("ts", "uid", "etype", "eid")
      .repartition(1).write.mode("append").parquet(dir)
    val sch = spark.read.parquet(dir).schema
    val ev = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val p = ev.filter(col("etype") === "purchase")
      .select(col("eid").as("p_id"), col("ts").as("p_ts"),
        col("uid").as("p_user"))
      .withWatermark("p_ts", "0 seconds")
    val c = ev.filter(col("etype") === "click")
      .select(col("eid").as("c_id"), col("ts").as("c_ts"),
        col("uid").as("c_user"))
      .withWatermark("c_ts", "0 seconds")
    val q = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"))
      .writeStream.format("memory").queryName("ssjo_mb")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination()
    val progress = q.recentProgress
    assert(progress.length > 1, "input collapsed to one micro-batch")
    val outPerBatch = progress.map(p0 => p0.sink.numOutputRows)
    assert(outPerBatch.head == 1,
      s"batch 0 must emit ONLY the eager match: ${outPerBatch.mkString(",")}")
    assert(outPerBatch.take(2).sum == 1,
      s"null row leaked before the sealing watermark committed: ${outPerBatch.mkString(",")}")
    val rows = spark.table("ssjo_mb").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((400L, 300L, 1L), (410L, -1L, 2L)),
      s"outer join rows wrong: $rows")
  }

  test("stream_late_side_output: late rows route to the side output, both sides sum to the corpus") {
    // 3-file run pinning the routing rule (late iff ts_us < ms-floored
    // running max of PRIOR batches):
    //  file 1: ids 1 (1.0 s), 2 (2.0005 s)    → wm floor after: 2.000 s
    //  file 2: id 3 (1.5 s)    → LATE; id 4 (2.0001 s) → ON-TIME (same
    //          ms as the watermark, smaller µs — the ms-truncation
    //          boundary the engine's own filter has); id 5 (3.0 s)
    //  file 3: id 6 (2.999999 s) → LATE (inside wm's floor); id 7 on-time
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_late_in_").toString
    Seq((1000000L, 1L), (2000500L, 2L))
      .toDF("ts_us", "id").repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(20) // distinct ms mtimes pin file → batch order
    Seq((1500000L, 3L), (2000100L, 4L), (3000000L, 5L))
      .toDF("ts_us", "id").repartition(1).write.mode("append").parquet(dir)
    Thread.sleep(20)
    Seq((2999999L, 6L), (3500000L, 7L))
      .toDF("ts_us", "id").repartition(1).write.mode("append").parquet(dir)
    val sch = spark.read.parquet(dir).schema
    val (onTime, late) = StreamingOps.lateSideOutputRun(spark, dir, sch,
      identity, "ts_us", Some(1))
    val lateIds = late.select("id").collect().map(_.getLong(0)).toSet
    val onIds = onTime.select("id").collect().map(_.getLong(0)).toSet
    assert(lateIds == Set(3L, 6L), s"late side wrong: $lateIds")
    assert(onIds == Set(1L, 2L, 4L, 5L, 7L), s"on-time side wrong: $onIds")
    assert((onIds ++ lateIds) == (1L to 7L).toSet &&
      (onIds & lateIds).isEmpty,
      "sides must partition the corpus exactly")
  }

  test("stream_session_dynamic: long-gap event holds the session open; touching window starts a new one") {
    // The dynamic-gap rules a fixed trailing gap cannot express, on a
    // real 2-batch run (gaps: signup 30 min, purchase 20 min, else 10):
    //  - u1: signup 09:00 extends the session to 09:30, so the click at
    //    09:25 — 20 min after the previous click, far past ITS 10-min
    //    gap — still joins (running-max-end rule); the session end then
    //    moves to 09:35 (= 09:25 + 10 min);
    //  - u1: the click AT exactly 09:35 touches the close time →
    //    half-open windows → it starts a NEW session;
    //  - u2: session spans batches (09:00 in batch 1, 09:05 in batch 2);
    //  - u3: click 10:50 → close 11:00 > final watermark 10:50 → held.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dyn_sess_").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // batch 1 — wm after: 09:05
      Seq((t("2024-01-01 09:00:00"), 1L, "signup", 1.0),
        (t("2024-01-01 09:05:00"), 1L, "click", 1.0),
        (t("2024-01-01 09:00:00"), 2L, "click", 1.0))
        .toDF("ts", "uid", "etype", "value")
        .repartition(1).write.mode("append").parquet(dir)
      Thread.sleep(20) // distinct ms mtimes pin file → batch order
      // batch 2 — all >= 09:05; final wm: 10:50
      Seq((t("2024-01-01 09:25:00"), 1L, "click", 1.0),
        (t("2024-01-01 09:35:00"), 1L, "click", 1.0),
        (t("2024-01-01 09:05:00"), 2L, "click", 1.0),
        (t("2024-01-01 10:50:00"), 3L, "click", 1.0))
        .toDF("ts", "uid", "etype", "value")
        .repartition(1).write.mode("append").parquet(dir)
      val sch = spark.read.parquet(dir).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "0 seconds")
        .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
          col("uid"), col("etype"), col("value"))
        .as[(Timestamp, Long, Long, String, Double)]
        .groupByKey(_._3)
        .transformWithState(StreamingOps.sessionDynamicForTest(),
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "start_us", "end_us", "cnt", "sum_dec")
        .writeStream.format("memory").queryName("dyn_sess_mb")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).start()
      q.awaitTermination()
      assert(q.recentProgress.length > 1,
        "input collapsed to one micro-batch — cross-batch path untested")
      def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
      val rows = spark.table("dyn_sess_mb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows == Set(
        (1L, us("2024-01-01 09:00:00"), us("2024-01-01 09:35:00"), 3L),
        (1L, us("2024-01-01 09:35:00"), us("2024-01-01 09:45:00"), 1L),
        (2L, us("2024-01-01 09:00:00"), us("2024-01-01 09:15:00"), 2L)),
        s"dynamic sessions wrong: $rows")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("value-state TTL expires across restarts; non-TTL state survives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ttl_").toString
    val in = s"$dir/in"
    val checkpoint = ckpt
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def stage(rows: Seq[(Long, Double)]): Unit =
        rows.toDF("user_id", "value").repartition(1)
          .write.mode("append").parquet(in)
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
      val lastDataBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
      def runOnce(expectEmitted: Int): Unit = {
        val sch = spark.read.parquet(in).schema
        // TTL REQUIRES TimeMode.ProcessingTime — and in that mode
        // TransformWithStateExec.shouldRunAnotherBatch is uncondition-
        // ally true (processing-time timers might always fire), so the
        // engine schedules no-data batches forever: AvailableNow never
        // terminates AND processAllAvailable never sees a quiet source
        // (observed 1700+ state versions). The only deterministic
        // handshake is the data itself: poll the foreachBatch sink until
        // the expected emission count arrives (no-data batches emit
        // nothing — handleInputRows never runs without rows, no timers
        // are registered), then stop() the query.
        val q = spark.readStream.schema(sch).parquet(in)
          .as[(Long, Double)]
          .groupByKey(_._1)
          .transformWithState(new StreamingOps.TtlCountProcessor(500L),
            org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF("user_id", "cnt_ttl", "cnt_forever")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val rows = batch.collect()
            rows.foreach(r =>
              emitted.add((r.getLong(0), r.getLong(1), r.getLong(2))))
            if (rows.nonEmpty) lastDataBatch.set(bid)
          }
          .outputMode("update")
          .option("checkpointLocation", checkpoint).start()
        // stop() must not race the data batch's COMMIT-log write: killing
        // the query after foreachBatch ran but before the commit lands
        // makes the next restart re-run the batch from the PRE-batch
        // state (observed: run 2 replayed batch 0 as (1,2,2) and the new
        // file never processed). Handshake: wait for the emission AND for
        // the emitting batch's commit file to exist in the checkpoint.
        try {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          def committed(): Boolean = {
            val b = lastDataBatch.get()
            b >= 0 && new java.io.File(
              new java.io.File(checkpoint, "commits"), b.toString).exists()
          }
          while ((emitted.size() < expectEmitted || !committed()) &&
              System.nanoTime() < deadline)
            Thread.sleep(50)
        } finally q.stop()
        q.awaitTermination()
        assert(emitted.size() == expectEmitted,
          s"expected $expectEmitted emissions, got ${emitted.size()}")
      }
      stage(Seq((1L, 1.0), (1L, 2.0)))
      runOnce(expectEmitted = 1)
      Thread.sleep(1500) // well past the 500 ms TTL
      stage(Seq((1L, 3.0)))
      runOnce(expectEmitted = 2)
      import scala.jdk.CollectionConverters._
      val out = emitted.asScala.toSeq
      // run 1: both counters reach 2. run 2: the TTL'd counter expired and
      // restarts at 1; the non-TTL counter recovered 2 and continues to 3 —
      // proving expiry came from the TTL, not from losing the checkpoint.
      assert(out == Seq((1L, 2L, 2L), (1L, 1L, 3L)),
        s"TTL semantics wrong: $out")
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("processing-time timer fires in a no-data batch; close-out clears state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pt_").toString
    val in = s"$dir/in"
    val checkpoint = ckpt
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def stage(rows: Seq[(Long, Double)]): Unit =
        rows.toDF("user_id", "value").repartition(1)
          .write.mode("append").parquet(in)
      stage(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      val sch = spark.read.parquet(in).schema
      // Default micro-batch trigger, NOT AvailableNow: in ProcessingTime
      // mode the engine keeps scheduling no-data batches (timers might
      // fire) — which is precisely what lets a wall-clock timer fire with
      // no new input; the test drives nothing between phases.
      val q = spark.readStream.schema(sch).parquet(in)
        .as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new StreamingOps.IdleTimeoutProcessor(500L),
          org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("user_id", "phase", "n")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            emitted.add((r.getLong(0), r.getString(1), r.getLong(2))))
        }
        .outputMode("update")
        .option("checkpointLocation", checkpoint).start()
      import scala.jdk.CollectionConverters._
      def await(cond: => Boolean, what: String): Unit = {
        val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
        while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
        assert(cond, s"timed out waiting for $what: ${emitted.asScala.toSeq}")
      }
      try {
        // phase 1: both keys active from the single data batch
        await(emitted.asScala.count(_._2 == "active") >= 2, "active emissions")
        // phase 2: NO new input — both keys must close by wall clock alone
        await(emitted.asScala.count(_._2 == "idle_closed") >= 2,
          "idle_closed emissions")
        val closed = emitted.asScala.filter(_._2 == "idle_closed")
          .map(t => t._1 -> t._3).toMap
        assert(closed == Map(1L -> 2L, 2L -> 1L),
          s"close-out counts wrong: $closed")
        // phase 3: a later event re-opens the key at n=1 — the timer
        // really cleared the state, not just emitted
        stage(Seq((1L, 9.0)))
        await(emitted.asScala.exists(t => t == ((1L, "active", 1L))),
          "re-opened key at n=1")
      } finally { q.stop(); q.awaitTermination() }
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("Trigger.ProcessingTime smoke: explicit wall-clock trigger drives " +
      "a processing-time timer to fire without new input") {
    // Completes the Flink time-semantics matrix: event-time ops run
    // under AvailableNow everywhere else (deterministic, oracle-able);
    // this pins the PROCESSING-time corner — an explicit
    // Trigger.ProcessingTime cadence scheduling batches by wall clock,
    // with a processing-time timer closing idle state between them.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ptt_").toString
    val in = s"$dir/in"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      Seq((7L, 1.0), (7L, 2.0)).toDF("user_id", "value").repartition(1)
        .write.mode("append").parquet(in)
      val emitted =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      val sch = spark.read.parquet(in).schema
      val q = spark.readStream.schema(sch).parquet(in)
        .as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new StreamingOps.IdleTimeoutProcessor(300L),
          org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
          org.apache.spark.sql.streaming.OutputMode.Update())
        .toDF("user_id", "phase", "n")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
          "100 milliseconds"))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            emitted.add((r.getLong(0), r.getString(1), r.getLong(2))))
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt).start()
      import scala.jdk.CollectionConverters._
      def await(cond: => Boolean, what: String): Unit = {
        val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
        while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
        assert(cond, s"timed out waiting for $what: ${emitted.asScala.toSeq}")
      }
      try {
        await(emitted.asScala.exists(t => t == ((7L, "active", 2L))),
          "active emission from the data batch")
        // no further input: only the wall-clock cadence can fire this
        await(emitted.asScala.exists(t => t == ((7L, "idle_closed", 2L))),
          "timer close-out under Trigger.ProcessingTime")
      } finally { q.stop(); q.awaitTermination() }
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("transformWithState agrees with the mapGroupsWithState path") {
    val tws = SparkEntry.queries("stream_stateful_tws")(spark, sf)
      .collect().map(_.toString).toSeq
    val mgs = SparkEntry.queries("stream_stateful_agg")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(tws == mgs)
  }

  private def eventually(tries: Int, sleepMs: Long)(cond: => Boolean): Unit = {
    var i = 0
    while (i < tries && !cond) { Thread.sleep(sleepMs); i += 1 }
  }
}
