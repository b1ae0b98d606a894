package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Long-chain probe for the streaming ingest quartet (round-11 items 5
  * and 7 of the round-10 review): the quartet's scale claims — index
  * O(distinct band rows) forever, per-batch work O(batch + matches),
  * keep-best's honest O(corpus-so-far) per-epoch state write — rested
  * on k=4 chains. This probe runs each ingest at k=16 micro-batches
  * (4× more epochs over the same corpus, so each batch carries 1/16 of
  * the rows while the persisted index crosses the SAME final size) and
  * records the PER-EPOCH trigger durations via a
  * [[StreamingQueryListener]]: a flat epoch curve is the claim
  * confirmed (per-epoch cost tracks batch size + matched index rows,
  * not chain length); a ramp on `stream_keep_best_ingest` quantifies
  * the documented O(corpus) state write so BASELINE.md can carry the
  * deployment arithmetic with measurements instead of prose.
  *
  * Run: sbt "runMain graft.IngestChainProbe [k ...]" (default 4 16;
  * one JSON line per (op, k) with total seconds + per-epoch ms).
  */
object IngestChainProbe {

  def main(args: Array[String]): Unit = {
    // --rollover: the geometry-generation experiment (round-13, the
    // r12 verdict's item 2) instead of the quartet chains — see
    // [[rollover]].
    if (args.headOption.contains("--rollover")) {
      rollover(args.drop(1)); return
    }
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 16)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // batchId → triggerExecution ms, for the one query running at a time
    val epochMs = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        epochMs.synchronized {
          val ms = Option(e.progress.durationMs.get("triggerExecution"))
            .map(_.longValue()).getOrElse(-1L)
          // AvailableNow emits a trailing no-data progress event with
          // the last batchId repeated; keep the FIRST (real) timing
          if (!epochMs.contains(e.progress.batchId))
            epochMs.put(e.progress.batchId, ms)
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    import graft.streaming.StreamingOps
    val runs: Seq[(String, Int => (org.apache.spark.sql.DataFrame, Int))] =
      Seq(
        "stream_minhash_ingest" ->
          (k => StreamingOps.minhashIngestRun(spark, sfDir, k)),
        "stream_embedding_ingest" ->
          (k => StreamingOps.embeddingIngestRun(spark, sfDir, k)),
        "stream_keep_best_ingest" ->
          (k => StreamingOps.keepBestIngestRun(spark, sfDir, k)),
        "stream_decontaminate_ingest" ->
          (k => StreamingOps.decontaminateIngestRun(spark, sfDir, k)),
        // round-12 ingest additions: the CCNet live build (per-epoch
        // cost = batch classify/score + the survivor-index probe; the
        // one-time model staging amortizes over the chain) and the
        // SemDeDup live build (per-epoch cost = affected-cell recompute
        // + the O(corpus-so-far) state carry-forward — the keep_best
        // write shape, expected to ramp with state size, priced in
        // BASELINE.md)
        "stream_ccnet_ingest" ->
          (k => StreamingOps.ccnetIngestRun(spark, sfDir, k)),
        "stream_semantic_ingest" ->
          (k => StreamingOps.semanticIngestRun(spark, sfDir, k)),
        // round-13 additions: all four claim per-epoch work O(batch)
        // with O(1)-or-dim-sized artifact publishes — a k=16 chain
        // should read FLAT per epoch for each (no carried corpus-sized
        // state anywhere: temporal's dim is customer-sized, rules'
        // table |types|-sized, the DSIR grid ≤1024 rows, the
        // side-output watermark ONE row)
        "stream_temporal_join" ->
          (k => StreamingOps.temporalJoinRun(spark, sfDir, k)),
        "stream_rules_apply" ->
          (k => StreamingOps.rulesApplyRun(spark, sfDir, k)),
        "stream_importance_ingest" ->
          (k => StreamingOps.importanceIngestRun(spark, sfDir, k)),
        "stream_side_output_late" ->
          (k => StreamingOps.sideOutputLateRun(spark, sfDir, k)),
        // round-13: the BPE serving twin — per-epoch O(batch words)
        // against the frozen vocab-bounded seg FileScan (the DSIR
        // shape with a word-keyed instead of bucket-keyed join)
        "stream_bpe_ingest" ->
          (k => StreamingOps.bpeIngestRun(spark, sfDir, k)),
        // round-15 (the r14 verdict's item 1): the perceptual-hash
        // ingest — per-epoch work is the batch's partition-mapped
        // hash + the banded probe against the losslessly compacted
        // index (O(distinct signatures) forever), so a k=16 chain
        // should read flat per epoch like the minhash twin
        "stream_phash_ingest" ->
          (k => StreamingOps.phashIngestRun(spark, sfDir, k)))

    // JVM warm-up outside all timings (codegen, parquet, stream classes)
    runs.head._2(2)

    ks.foreach { k =>
      runs.foreach { case (op, run) =>
        epochMs.synchronized(epochMs.clear())
        val t0 = System.nanoTime()
        val (df, n) = run(k)
        val rows = Bench.force(df)
        val sec = (System.nanoTime() - t0) / 1e9
        val per = epochMs.synchronized(
          epochMs.toSeq.sortBy(_._1).map(_._2))
        println(f"""{"metric":"ingest_chain","op":"$op","k":$k,""" +
          f""""batches":$n,"total_sec":$sec%.2f,"rows":$rows,""" +
          s""""per_epoch_ms":${per.mkString("[", ",", "]")},""" +
          s""""sf":"$sfDir"}""")
      }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }

  /** Geometry-generation rollover experiment (round-13): the ingest
    * twins FREEZE their quantizer/LSH geometry at stream start, so a
    * corpus that grows far past the population the geometry was sized
    * for degrades toward the un-refined O(n²/cells) regime the batch
    * op's adaptive sub-quantization escapes. This probe prices that
    * drift: stage a PERTURBED (distinct-vector) corpus at `factor`×
    * sf0.1, then run the k=16 `stream_semantic_ingest` chain twice —
    * quantizer trained on the FULL corpus (the registered op's
    * contract: geometry sized for everything it will ever see) vs
    * trained on only the FIRST QUARTER of ids (a live deployment that
    * sized its generation at stream start and then grew 4× past it) —
    * and record both per-epoch trigger curves. The delta curve is the
    * measured cost of NOT rolling the generation; BASELINE.md carries
    * the verdict + the rollover recipe.
    *
    * Run: sbt "runMain graft.IngestChainProbe --rollover [factor]"
    * (default factor 4; one JSON line per variant). */
  private def rollover(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(4)
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val epochMs = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        epochMs.synchronized {
          val ms = Option(e.progress.durationMs.get("triggerExecution"))
            .map(_.longValue()).getOrElse(-1L)
          if (!epochMs.contains(e.progress.batchId))
            epochMs.put(e.progress.batchId, ms)
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_rollover_${factor}x_").toString
    ScaleProbe.stage(spark, baseSf, dir, factor, "perturbed")
    println(s"[rollover] perturbed ${factor}x corpus staged at $dir")
    val maxId = spark.read.parquet(s"$dir/embeddings.parquet")
      .agg(org.apache.spark.sql.functions.max("vec_id")).head().getLong(0)
    val k = 16
    import graft.streaming.StreamingOps
    Seq(
      // quantizer sized for everything it will see (the contract)
      "full_corpus" -> Long.MaxValue,
      // generation sized at stream start, corpus grows 4x past it
      "first_quarter" -> ((maxId + 1) / 4 - 1),
      // 16x growth past the sizing population — the drift regime
      "first_sixteenth" -> ((maxId + 1) / 16 - 1)).foreach {
      case (variant, hi) =>
        epochMs.synchronized(epochMs.clear())
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_roll_${variant}_").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_roll_ckpt_").toString
        val t0 = System.nanoTime()
        val (df, n) = StreamingOps.semanticIngestRunAt(spark, dir, k,
          root, ckpt, quantizerTrainHi = hi)
        val rows = Bench.force(df)
        val sec = (System.nanoTime() - t0) / 1e9
        val per = epochMs.synchronized(
          epochMs.toSeq.sortBy(_._1).map(_._2))
        println(f"""{"metric":"rollover","variant":"$variant",""" +
          f""""factor":$factor,"k":$k,"batches":$n,""" +
          f""""total_sec":$sec%.2f,"rows":$rows,""" +
          s""""per_epoch_ms":${per.mkString("[", ",", "]")},""" +
          s""""sf":"$baseSf"}""")
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
