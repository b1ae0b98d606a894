package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}

import graft.streaming.StreamingOps

/** Checkpoint-RESTART recovery for the round-5 `transformWithState`
  * processors (SURVEY.md §5; round-5 verdict's top hardening gap). The
  * multi-batch tests in [[StreamingSpec]] pin cross-batch state inside
  * ONE query run; these kill the query between batches and start a NEW
  * query from the same checkpoint, so the custom state rows
  * (`EwmaState`, `CountWinState`, `AbcState`) must round-trip through
  * the state-store encoder and the event-time timers must re-fire after
  * recovery — the path a production restart (deploy, preemption,
  * executor loss) exercises and where a state-schema bug would hide.
  * All three run on the RocksDB provider, the 100 TB posture's store.
  */
class StreamingRecoverySpec extends GraftSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def t(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = Timestamp.valueOf(s).getTime * 1000L

  test("EwmaProcessor: lag context and timers survive a query restart") {
    // Run 1 seals e1/e2 (their micro-values move from the buffer into
    // the 9-long lag context) and leaves e3 buffered. Run 2 is a NEW
    // query from the checkpoint: e3's average must still see e1/e2 —
    // possible only if the recovered EwmaState carries the lag array —
    // and the emission itself requires the rearmed timer to fire after
    // recovery. Expected values are StreamingSpec's hand-computed set.
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_ew_rs_").toString
      val in = s"$dir/in"
      val checkpoint = s"$dir/ckpt"
      def stage(rows: Seq[(Timestamp, Long, Long, Long)]): Unit =
        rows.toDF("ts", "uid", "eid", "v_us").repartition(1)
          .write.mode("append").parquet(in)

      val runs = scala.collection.mutable.ArrayBuffer
        .empty[Set[(Long, Long, Double)]]
      def runOnce(): Unit = {
        val emitted =
          new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
        val sch = spark.read.parquet(in).schema
        val q = spark.readStream.schema(sch).parquet(in)
          .withWatermark("ts", "0 seconds")
          .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
            col("uid"), col("eid"), col("v_us"))
          .as[(Timestamp, Long, Long, Long, Long)]
          .groupByKey(_._3)
          .transformWithState(StreamingOps.ewmaForTest(),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("event_id", "user_id", "ewma")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.collect().foreach(r =>
              emitted.add((r.getLong(0), r.getLong(1), r.getDouble(2))))
          }
          .outputMode("append").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", checkpoint).start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        runs += emitted.asScala.toSet
      }

      // run 1 — final wm 09:30: e1/e2 seal and emit, e3 held in buffer
      stage(Seq((t("2024-01-01 09:00:00"), 1L, 101L, 1000000L),
        (t("2024-01-01 09:10:00"), 1L, 102L, 2000000L),
        (t("2024-01-01 09:30:00"), 1L, 103L, 3000000L)))
      runOnce()
      // run 2 (restart) — e4 advances wm to 09:50, sealing the RECOVERED
      // e3; e4 itself sits at the final wm and stays held
      stage(Seq((t("2024-01-01 09:50:00"), 1L, 104L, 4000000L)))
      runOnce()

      assert(runs(0) == Set((101L, 1L, 1.0), (102L, 1L, 1.666667)),
        s"pre-restart emissions wrong: ${runs(0)}")
      assert(runs(1) == Set((103L, 1L, 2.428571)),
        s"post-restart emission must use the recovered lag context: ${runs(1)}")
    }
  }

  test("count-window processor: window index and rank base survive a restart") {
    // Run 1 emits window 0 (ranks 1-2) and EVICTS it — after that,
    // nEmitted=1 / baseRank=2 exist only in state. Run 2 restarts and
    // must emit the straddling window with index 1 (not 0) over ranks
    // 3-4, proving both counters and the surviving buffer row (e103)
    // were recovered. winSize=2, tumbling (slide = winSize).
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_cw_rs_").toString
      val in = s"$dir/in"
      val checkpoint = s"$dir/ckpt"
      def stage(rows: Seq[(Timestamp, Long, Long, Long)]): Unit =
        rows.toDF("ts", "uid", "eid", "v_us").repartition(1)
          .write.mode("append").parquet(in)

      val runs = scala.collection.mutable.ArrayBuffer
        .empty[Set[(Long, Long, Long, Long, Double)]]
      def runOnce(): Unit = {
        val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
          (Long, Long, Long, Long, Double)]()
        val sch = spark.read.parquet(in).schema
        val q = spark.readStream.schema(sch).parquet(in)
          .withWatermark("ts", "0 seconds")
          .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
            col("uid"), col("eid"), col("v_us"))
          .as[(Timestamp, Long, Long, Long, Long)]
          .groupByKey(_._3)
          .transformWithState(StreamingOps.countWindowForTest(2),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "win_idx", "w_first_us", "w_last_us", "sum_value")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.collect().foreach(r => emitted.add((r.getLong(0),
              r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
          }
          .outputMode("append").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", checkpoint).start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        runs += emitted.asScala.toSet
      }

      // run 1 — final wm 09:30: ranks 1-2 seal -> window 0; e103 buffered
      stage(Seq((t("2024-01-01 09:00:00"), 1L, 101L, 1000000L),
        (t("2024-01-01 09:10:00"), 1L, 102L, 2000000L),
        (t("2024-01-01 09:30:00"), 1L, 103L, 3000000L)))
      runOnce()
      // run 2 (restart) — e105 advances wm to 10:30, sealing e103/e104
      // -> window 1 across the restart boundary; e105 held at final wm
      stage(Seq((t("2024-01-01 09:45:00"), 1L, 104L, 4000000L),
        (t("2024-01-01 10:30:00"), 1L, 105L, 5000000L)))
      runOnce()

      assert(runs(0) == Set(
        (1L, 0L, us("2024-01-01 09:00:00"), us("2024-01-01 09:10:00"), 3.0)),
        s"pre-restart window wrong: ${runs(0)}")
      assert(runs(1) == Set(
        (1L, 1L, us("2024-01-01 09:30:00"), us("2024-01-01 09:45:00"), 7.0)),
        s"post-restart window must continue the recovered index: ${runs(1)}")
    }
  }

  test("ABC pattern processor: pending signup and buffered events survive a restart") {
    // Run 1 leaves u5's signup pending in AbcState (nothing can emit —
    // the chain is incomplete and the 1 h deadline is ahead of the
    // watermark). Run 2 restarts and delivers the click+purchase tail:
    // the completed chain must bind to the RECOVERED signup, and the
    // view sentinel seals it. A second user's signup whose deadline
    // passes only after the restart must emit its no-progress row from
    // recovered state too (timer re-fire path, not just data binding).
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_abc_rs_").toString
      val in = s"$dir/in"
      val checkpoint = s"$dir/ckpt"
      def stage(rows: Seq[(Timestamp, Long, String, Long)]): Unit =
        rows.toDF("ts", "uid", "etype", "eid").repartition(1)
          .write.mode("append").parquet(in)

      val runs = scala.collection.mutable.ArrayBuffer
        .empty[Set[(Long, Long, Long, Long, Long)]]
      def runOnce(): Unit = {
        val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
          (Long, Long, Long, Long, Long)]()
        val sch = spark.read.parquet(in).schema
        val q = spark.readStream.schema(sch).parquet(in)
          .withWatermark("ts", "0 seconds")
          .select(col("ts"), expr("unix_micros(ts)").as("ts_us"),
            col("uid"), col("etype"), col("eid"))
          .as[(Timestamp, Long, Long, String, Long)]
          .groupByKey(_._3)
          .transformWithState(StreamingOps.patternAbcForTest(),
            TimeMode.EventTime(), OutputMode.Append())
          .toDF("user_id", "signup_id", "click_id", "purchase_id",
            "us_to_complete")
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.collect().foreach { r =>
              def opt(i: Int): Long = if (r.isNullAt(i)) -1L else r.getLong(i)
              emitted.add((r.getLong(0), r.getLong(1), opt(2), opt(3), opt(4)))
            }
          }
          .outputMode("append").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", checkpoint).start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        runs += emitted.asScala.toSet
      }

      // run 1 — u5 and u6 sign up; final wm 09:29 (u6's signup). Both
      // deadlines (10:05 / 10:29) are ahead of the wm: nothing emits.
      // u6 sits strictly inside the final 10:30 watermark (not AT it —
      // the timer boundary is strict, pinned in StreamingSpec).
      stage(Seq((t("2024-01-01 09:05:00"), 5L, "signup", 130L),
        (t("2024-01-01 09:29:00"), 6L, "signup", 140L)))
      runOnce()
      // run 2 (restart) — u5's tail arrives; the 10:30 sentinel seals
      // u5's completed chain AND expires u6's untouched deadline.
      stage(Seq((t("2024-01-01 09:40:00"), 5L, "click", 330L),
        (t("2024-01-01 09:55:00"), 5L, "purchase", 440L),
        (t("2024-01-01 10:30:00"), 9L, "view", 900L)))
      runOnce()

      assert(runs(0) == Set.empty[(Long, Long, Long, Long, Long)],
        s"nothing may emit before the deadlines: ${runs(0)}")
      assert(runs(1) == Set(
        (5L, 130L, 330L, 440L, 3000000000L),
        (6L, 140L, -1L, -1L, -1L)),
        s"post-restart chain must bind the recovered signup: ${runs(1)}")
    }
  }

  test("dropDuplicatesWithinWatermark dedup state survives a query restart") {
    // stream_dau's round-6 state shape: the dedup-within-watermark
    // store must recover across a restart so a (user, day) pair first
    // seen BEFORE the restart still suppresses its duplicate arriving
    // AFTER it. Run 1 seeds users 1 and 2 on day 0; run 2 (a NEW query
    // from the same checkpoint) replays user 1 on the same day plus a
    // new user 3. Correct recovery ⇒ day-0 DAU = 3. Lost dedup state
    // would double-count user 1 (DAU 4); a lost aggregation state
    // would count only the new arrivals (DAU 2) — the assertion
    // separates all three outcomes.
    import spark.implicits._
    withRocksDb {
      val dir = Files.createTempDirectory("graft_ddw_rs_").toString
      val in = s"$dir/in"
      val checkpoint = s"$dir/ckpt"
      def stage(rows: Seq[(Timestamp, Long)]): Unit =
        rows.toDF("ts_utc", "user_id").repartition(1)
          .write.mode("append").parquet(in)

      var last: Map[Long, Long] = Map.empty
      def runOnce(): Unit = {
        val name = s"ddw_rs_${System.nanoTime()}"
        val sch = spark.read.parquet(in).schema
        val dau = spark.readStream.schema(sch).parquet(in)
          .withWatermark("ts_utc", "1 day")
          .select(col("ts_utc"), col("user_id"),
            expr("unix_micros(ts_utc) div 86400000000").as("day"))
          .dropDuplicatesWithinWatermark("user_id", "day")
          .groupBy(col("day"))
          .agg(count(lit(1)).as("dau"))
        val q = dau.writeStream.format("memory").queryName(name)
          .outputMode("complete").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", checkpoint).start()
        q.awaitTermination()
        last = spark.table(name).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }

      stage(Seq((t("2024-01-01 01:00:00"), 1L),
        (t("2024-01-01 02:00:00"), 2L)))
      runOnce()
      assert(last == Map(19723L -> 2L),
        s"pre-restart day-0 DAU wrong: $last")
      // restart: user 1's duplicate + new user 3, same day
      stage(Seq((t("2024-01-01 03:00:00"), 1L),
        (t("2024-01-01 04:00:00"), 3L)))
      runOnce()
      assert(last == Map(19723L -> 3L),
        s"recovered dedup state must suppress the replayed (1, day) pair: $last")
    }
  }

  test("foreachBatch exactly-once: batchId-keyed overwrite heals a torn batch on replay") {
    // The no-Kafka-jars substitute for a two-phase-commit sink: Spark
    // guarantees foreachBatch AT-LEAST-once (a batch that fails before
    // its checkpoint commit is REPLAYED under the SAME batchId), so a
    // sink becomes effectively exactly-once iff the write is idempotent
    // in batchId — here a deterministic per-batch target directory with
    // mode("overwrite"). The test drives the full failure path: batch 1
    // tears (partial output lands, then the writer dies before the
    // commit log records it), the torn output is observably visible —
    // exactly the duplicate state a naive append sink would keep — and
    // the restarted query replays batch 1 under the same id, where
    // overwrite replaces the torn files. Final output must equal the
    // input exactly: no loss, no duplicates, no torn sentinel.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fb_eo_").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val checkpoint = s"$dir/ckpt"
    def stage(rows: Seq[(Long, String)]): Unit =
      rows.toDF("event_id", "event_type").repartition(1)
        .write.mode("append").parquet(in)

    // driver-side fault injection: which batchId tears on its next run
    // (crash mid-write), and which crashes AFTER a complete write but
    // before the checkpoint commit (the full-duplicate replay path)
    val crashOnBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
    val crashAfterWrite = new java.util.concurrent.atomic.AtomicLong(-1L)
    def runOnce(): Option[Throwable] = {
      val sch = spark.read.parquet(in).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val target = s"$out/batch_id=$batchId"
          if (batchId == crashOnBatch.get()) {
            // torn write: some output lands, then the sink dies BEFORE
            // foreachBatch returns, so the commit log never records
            // this batchId as done
            Seq((-999L, "torn")).toDF("event_id", "event_type")
              .write.mode("overwrite").parquet(target)
            throw new RuntimeException("injected sink crash")
          }
          // the idempotent pattern under test: deterministic
          // batchId-keyed target + overwrite (the registered
          // sink_exactly_once pattern)
          batch.write.mode("overwrite").parquet(target)
          if (batchId == crashAfterWrite.get())
            // the write COMPLETED; the crash lands in the gap between
            // side-effect and checkpoint commit — the replay is a
            // FULL duplicate of the batch, not a torn one
            throw new RuntimeException("injected post-write crash")
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .start()
      try { q.awaitTermination(); None }
      catch { case e: Throwable => Some(e) }
    }

    stage(Seq((1L, "a"), (2L, "b")))
    assert(runOnce().isEmpty, "batch 0 must commit cleanly")

    stage(Seq((3L, "c"), (4L, "d")))
    crashOnBatch.set(1L)
    assert(runOnce().isDefined, "the injected crash must fail the query")
    // the torn partial output IS visible now — the state a naive
    // append-mode sink would be stuck with
    val torn = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(torn.contains(-999L), s"expected the torn sentinel on disk: $torn")

    crashOnBatch.set(-1L)
    assert(runOnce().isEmpty, "the restarted query must replay batch 1 and succeed")
    val healed = spark.read.parquet(out)
      .select(col("event_id"), col("event_type"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(healed == Set((1L, "a", 0), (2L, "b", 0), (3L, "c", 1), (4L, "d", 1)),
      s"exactly-once violated — expected the exact input across batch dirs, got: $healed")

    // second failure path (r16, closing the r15 verdict's item 5 in
    // full): the side-effect COMPLETES, the crash lands between it and
    // the checkpoint commit — Spark replays the whole batch under the
    // same id, and a naive append sink would now hold every row of
    // batch 2 TWICE. The batchId-keyed overwrite absorbs the complete
    // duplicate exactly as it absorbed the torn write.
    stage(Seq((5L, "e"), (6L, "f")))
    crashAfterWrite.set(2L)
    assert(runOnce().isDefined, "the injected post-write crash must fail the query")
    // the COMPLETE output of batch 2 is on disk, but its commit is not
    val preReplay = spark.read.parquet(out)
      .filter(col("batch_id") === 2)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(preReplay == Set(5L, 6L),
      s"expected batch 2's complete output before the replay: $preReplay")
    crashAfterWrite.set(-1L)
    assert(runOnce().isEmpty, "the restarted query must replay batch 2 and succeed")
    val healed2 = spark.read.parquet(out)
      .select(col("event_id"), col("event_type"), col("batch_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(healed2 == Set((1L, "a", 0), (2L, "b", 0), (3L, "c", 1),
      (4L, "d", 1), (5L, "e", 2), (6L, "f", 2)),
      s"duplicate replay not absorbed — got: $healed2")
  }
}
