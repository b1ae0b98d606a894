package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Pins `stream_embedding_ingest` (the embedding-modality ingest chain):
  * a REAL streaming query over k id-ordered micro-batches must reproduce
  * the horizon-free one-shot truth — reconstructed here independently
  * from `llm_embedding_lsh`'s pair output (same planes, same geometry,
  * same round-6 cosine threshold) — with cross-batch band dups actually
  * firing, and the exact stage exercised on a replicated corpus where
  * the raw fixture (all-distinct embeddings) can't reach it. */
class StreamIngestSpec extends GraftSpec {

  test("stream_embedding_ingest: k id-ordered micro-batches reproduce " +
      "the one-shot exact/band truth, with cross-batch dups firing") {
    val k = 4
    val (verdictDf, nBatches) =
      StreamingOps.embeddingIngestRun(spark, sf, k)
    assert(nBatches == k,
      s"expected $k micro-batches (maxFilesPerTrigger=1), got $nBatches")

    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    def batchOf(id: Long): Long = id * k / (maxId + 1)

    val got = verdictDf.collect().toSeq.map(r => (r.getLong(0),
      r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == ids, "one verdict per corpus vector")

    // truth from the independently computed one-shot op: exact pairs
    // map member -> global rep; lsh pairs give the band adjacency
    val pairs = SparkEntry.queries("llm_embedding_lsh")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(3)))
    val exactOf = pairs.collect { case (rep, m, "exact") => m -> rep }.toMap
    val lsh = pairs.collect { case (a, b, "lsh") => (a, b) }
    val adj = (lsh ++ lsh.map(_.swap)).groupBy(_._1)
      .map { case (kk, v) => kk -> v.map(_._2).toSet }
    got.foreach { case (n, stage, dupOf) =>
      val expected = exactOf.get(n) match {
        case Some(rep) => ("exact_dup", Some(rep))
        case None =>
          val admissible = adj.getOrElse(n, Set.empty).filter(_ < n)
          if (admissible.isEmpty) ("kept", None)
          else ("band_dup", Some(admissible.min))
      }
      assert((stage, dupOf) == expected,
        s"vec $n: got ($stage, $dupOf) expected $expected")
    }

    // the cross-batch index probe must really fire
    assert(got.exists { case (n, _, dupOf) =>
      dupOf.exists(c => batchOf(c) < batchOf(n))
    }, "no cross-batch band dup — the ingest fixture is degenerate")
  }

  test("stream_embedding_ingest exact stage: verbatim replicas resolve " +
      "to the global-first vector across the epoch boundary") {
    import java.nio.file.Files
    val emb = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
    // ids 0-49 originals, 500-549 verbatim replicas: the id-range split
    // puts all originals in batch 0 and all replicas in batch 1, so
    // every replica's exact verdict must cross the epoch boundary
    // through the persisted rep index
    val dir = Files.createTempDirectory("graft_ei_fixture_").toString
    emb.unionByName(emb.withColumn("vec_id", col("vec_id") + 500))
      .write.parquet(s"$dir/embeddings.parquet")
    val (verdictDf, nBatches) = StreamingOps.embeddingIngestRun(spark, dir, 2)
    assert(nBatches == 2)
    val got = verdictDf.collect().map(r => r.getLong(0) ->
      (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    (500L until 550L).foreach { id =>
      assert(got(id) == (("exact_dup", Some(id - 500))),
        s"replica $id: got ${got(id)}")
    }
    // originals got ONLY original-range verdicts (no replica leaked in)
    (0L until 50L).foreach { id =>
      got(id)._2.foreach(c => assert(c < id && c < 50,
        s"original $id points at $c"))
    }
  }

  test("stream_keep_best_ingest: k chained epochs inside a real " +
      "streaming query land on the from-scratch keep-best state, with " +
      "cross-epoch cluster joins firing") {
    val k = 4
    val (stateDf, nBatches) =
      StreamingOps.keepBestIngestRun(spark, sf, k)
    assert(nBatches == k,
      s"expected $k micro-batches (maxFilesPerTrigger=1), got $nBatches")
    val got = stateDf.collect().toSet
    val expected = SparkEntry.queries("llm_dedup_keep_best")(spark, sf)
      .collect().toSet
    assert(got == expected,
      s"chained stream != scratch: only-stream=${(got -- expected).take(3)}"
        + s" only-scratch=${(expected -- got).take(3)}")
    // non-degenerate: some doc must have joined a cluster rooted in an
    // EARLIER micro-batch (the persisted state/survivor probe fired)
    val maxId = Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).head().getLong(0)
    def batchOf(id: Long): Long = id * k / (maxId + 1)
    val crossEpoch = stateDf.collect().count { r =>
      batchOf(r.getLong(1)) < batchOf(r.getLong(0))
    }
    assert(crossEpoch > 0, "degenerate fixture: no cross-epoch joins")
  }

  test("stream_decontaminate_ingest: the static test index watching k " +
      "train batches equals the one-shot decontamination answer") {
    val k = 4
    val (df, nBatches) =
      StreamingOps.decontaminateIngestRun(spark, sf, k)
    assert(nBatches == k)
    val got = df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val expected = SparkEntry.queries("llm_decontaminate")(spark, sf)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got == expected)
    // non-degenerate: contamination must actually occur, and from more
    // than one micro-batch (cross-batch duplicate matches must have
    // collapsed in the count-distinct fold rather than double-counted)
    assert(got.exists(_._3), "fixture has no contamination at all")
  }

  // ---- round 11: kill-and-resume + replay idempotence -----------------

  private def killedBy(t: Throwable, what: String): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .exists(c => Option(c.getMessage).exists(_.contains(what)))

  private def freshRoot(): (String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_resume_").toString
    (root, s"$root/ckpt")
  }

  test("stream_minhash_ingest kill-and-resume: a planned kill before " +
      "epoch 3 resumes from the checkpoint to the one-shot truth") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.minhashIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"),
      s"expected the planned kill, got $e")
    assert(StreamingOps.committedBatches(ckpt) == 2,
      "exactly epochs 1-2 should be committed at the kill point")
    val (resumed, n) =
      StreamingOps.minhashIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k, s"resume should end at $k total batches, got $n")
    val oneShot = StreamingOps.minhashIngestRun(spark, sf, k)._1
    assert(resumed.collect().toSeq == oneShot.collect().toSeq,
      "resumed chain != one-shot chain")
  }

  test("stream_keep_best_ingest kill-and-resume: the batchId-keyed " +
      "versioned state resumes to the from-scratch keep-best state") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.keepBestIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    // the committed prefix is durable: state_v1..v2 exist, v3+ don't
    assert(new java.io.File(s"$root/state_v2").isDirectory)
    assert(!new java.io.File(s"$root/state_v3").exists())
    val (resumed, n) =
      StreamingOps.keepBestIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    val got = resumed.collect().toSet
    val expected = SparkEntry.queries("llm_dedup_keep_best")(spark, sf)
      .collect().toSet
    assert(got == expected, "resumed chain != from-scratch keep-best")
  }

  test("stream_keep_best_ingest replayed epoch: tampering the " +
      "checkpoint's last commit replays the epoch, whose keyed " +
      "overwrite re-materializes identical state (at-least-once is " +
      "exact, not just loud)") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val (first, n1) =
      StreamingOps.keepBestIngestRunAt(spark, sf, k, root, ckpt)
    assert(n1 == k)
    val firstRows = first.collect().toSeq
    // simulate a crash AFTER the epoch-k state write but BEFORE the
    // checkpoint commit: drop the last commit marker, forcing Spark to
    // replay batch k-1 against the already-written state_v(k)
    val lastCommit = new java.io.File(s"$ckpt/commits/${k - 1}")
    assert(lastCommit.isFile, s"expected commit marker $lastCommit")
    assert(lastCommit.delete())
    // Hadoop's local ChecksumFileSystem keeps a .crc sibling; leaving
    // it behind makes the re-commit's atomic create fail as a spurious
    // "concurrent query" — a real crash loses both together
    new java.io.File(s"$ckpt/commits/.${k - 1}.crc").delete()
    assert(StreamingOps.committedBatches(ckpt) == k - 1)
    val (replayed, n2) =
      StreamingOps.keepBestIngestRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(StreamingOps.committedBatches(ckpt) == k,
      "the replayed epoch should re-commit")
    assert(replayed.collect().toSeq == firstRows,
      "replayed epoch changed the final state — replay is not idempotent")
  }

  test("stream_decontaminate_ingest kill-and-resume: the idempotent " +
      "append sink resumes to the one-shot answer with no guard") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.decontaminateIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 2)
    }
    assert(killedBy(e, "planned ingest kill"))
    val (resumed, n) =
      StreamingOps.decontaminateIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    val got = resumed.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val expected = SparkEntry.queries("llm_decontaminate")(spark, sf)
      .collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got == expected)
  }

  test("stream_embedding_ingest kill-and-resume: algebraic replay " +
      "absorption (candEx guard + min folds + distinct readout) " +
      "resumes to the one-shot verdicts") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.embeddingIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    val (resumed, n) =
      StreamingOps.embeddingIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    val oneShot = StreamingOps.embeddingIngestRun(spark, sf, k)._1
    assert(resumed.collect().toSeq == oneShot.collect().toSeq,
      "resumed embedding chain != one-shot chain")
  }

  test("stream_embedding_ingest replayed epoch: tampering the " +
      "checkpoint's last commit replays the epoch against the " +
      "already-appended rep index — the EXACT-stage ordering guard " +
      "(not just candEx's) must ignore each rep's own just-appended " +
      "vector, or verdicts flip to exact_dup-of-itself") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val (first, n1) =
      StreamingOps.embeddingIngestRunAt(spark, sf, k, root, ckpt)
    assert(n1 == k)
    val firstRows = first.collect().toSeq
    // simulate a crash AFTER epoch k's index appends (newReps landed in
    // reps/) but BEFORE the checkpoint commit: drop the last commit
    // marker, forcing Spark to replay batch k-1 with its own reps
    // already visible in the index — the mid-epoch replay the exact
    // stage's `ex_of < vec_id` guard exists for
    val lastCommit = new java.io.File(s"$ckpt/commits/${k - 1}")
    assert(lastCommit.isFile, s"expected commit marker $lastCommit")
    assert(lastCommit.delete())
    new java.io.File(s"$ckpt/commits/.${k - 1}.crc").delete()
    assert(StreamingOps.committedBatches(ckpt) == k - 1)
    val (replayed, n2) =
      StreamingOps.embeddingIngestRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(StreamingOps.committedBatches(ckpt) == k,
      "the replayed epoch should re-commit")
    val replayedRows = replayed.collect().toSeq
    assert(!replayedRows.exists(r => !r.isNullAt(2) &&
        r.getLong(0) == r.getLong(2)),
      "a replayed rep matched its own appended vector (self exact_dup)")
    assert(replayedRows == firstRows,
      "replayed epoch changed the final verdicts — replay is not " +
        "idempotent through the appended index")
  }

  test("stream_keep_best_ingest all-empty stream: the version chain " +
      "advances through empty epochs and the readout is an empty " +
      "frame, not a missing-path failure") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_kbi_empty_").toString
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .filter(lit(false))
      .write.parquet(s"$dir/documents.parquet")
    val (state, n) = StreamingOps.keepBestIngestRun(spark, dir, 3)
    assert(state.columns.toSeq ==
      Seq("doc_id", "cluster_id", "quality", "keep"))
    assert(state.count() == 0)
    assert(n == 3, s"3 empty epochs should still advance the chain, got $n")
  }

  test("the ingest family's id-ordering guard fails LOUDLY on an " +
      "out-of-order batch and passes bounds through on a monotone one") {
    import spark.implicits._
    val prevMax = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val b1 = Seq(5L, 9L, 7L).toDF("doc_id")
    assert(StreamingOps.monotoneBatchBounds(b1, "doc_id", "op", prevMax)
      .contains((5L, 9L)))
    prevMax.set(9L)
    // empty batch: no bounds, no failure
    assert(StreamingOps.monotoneBatchBounds(
      b1.filter($"doc_id" > 100), "doc_id", "op", prevMax).isEmpty)
    // overlap with the folded state: the precondition violation throws
    val e = intercept[IllegalArgumentException] {
      StreamingOps.monotoneBatchBounds(
        Seq(9L, 12L).toDF("doc_id"), "doc_id", "op", prevMax)
    }
    assert(e.getMessage.contains("out-of-order batch"))
  }

  test("stream_ann_query: k query micro-batches against the staged " +
      "static IVF index equal the batch op verbatim, and a planned " +
      "kill resumes from the checkpoint to the same table") {
    val k = 4
    // structural batch invariance: queries are independent, so the
    // streamed serving output IS llm_ann_ivf's over the same queries
    val streamed = StreamingOps.annQueryRun(spark, sf, k)._1.collect().toSeq
    val batch = SparkEntry.queries("llm_ann_ivf")(spark, sf).collect().toSeq
    assert(streamed == batch, "streamed serving != batch llm_ann_ivf")
    // kill-and-resume: the static index re-stage is idempotent and the
    // distinct() readout absorbs any replayed append
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.annQueryRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n) = StreamingOps.annQueryRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    assert(resumed.collect().toSeq == batch,
      "resumed serving stream != batch llm_ann_ivf")
  }

  test("stream_pq_live: epoch 1 equals llm_ann_pq on its prefix, " +
      "every later epoch equals the warm-started one-round refine of " +
      "the previous epoch's codebook, and a planned kill resumes to " +
      "the same table") {
    val k = 4
    val (streamedDf, n1) = StreamingOps.pqLiveRun(spark, sf, k)
    assert(n1 == k)
    val streamed = streamedDf.collect().toSeq
    // independent per-epoch truth: stage each prefix + its index into
    // its OWN dirs (no shared staged state with the streaming run) —
    // epoch 1 cold (≡ the batch op), epoch e > 1 warm from the TRUTH
    // chain's own epoch-(e−1) codebook (r14 warm-start contract)
    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    var prevCbDir: Option[String] = None
    val expected = (1 to k).flatMap { e =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pql_pre${e}_").toString
      val prefix = emb.filter(col("vec_id") < (maxId + 1) * e / k)
      val (cbD, cdD, ctD) = (s"$dir/cb", s"$dir/codes", s"$dir/cent")
      val prev = prevCbDir.map(p =>
        spark.read.schema(operators.AnnOps.pqCbSchema).parquet(p))
      operators.AnnOps.stagePqIndexTo(spark, prefix, cbD, cdD, ctD, prev)
      prevCbDir = Some(cbD)
      val rows =
        operators.AnnOps.pqServeFromDirs(spark, prefix, cbD, cdD, ctD)
          .collect().toSeq
      // epoch 1 must ALSO equal the registered batch op verbatim (the
      // cold path is the same contract)
      if (e == 1) {
        prefix.write.parquet(s"$dir/embeddings.parquet")
        val batch = SparkEntry.queries("llm_ann_pq")(spark, dir)
          .collect().toSeq
        assert(rows == batch, "cold epoch != batch llm_ann_pq")
      }
      rows.map(r => org.apache.spark.sql.Row(e, r.get(0), r.get(1),
        r.get(2), r.get(3), r.get(4)))
    }
    assert(streamed == expected,
      "per-epoch PQ serving verdicts != chained warm-start replay")
    // non-degenerate: some query's top-k must change across versions
    val byEpoch = streamed.groupBy(_.getInt(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getInt(5))))
    assert(byEpoch(1).toSet != byEpoch(k).toSet,
      "degenerate fixture: the PQ index never visibly advanced")
    // kill-and-resume: epoch-keyed index overwrite + distinct readout
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.pqLiveRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n2) = StreamingOps.pqLiveRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(resumed.collect().toSeq == streamed,
      "resumed PQ live stream != one-shot chain")
  }

  test("stream_pq_live_delta: retrain epochs follow the warm chain, " +
      "delta epochs carry codes forward and assign only the suffix " +
      "against the in-force codebook, and kills resume across both " +
      "epoch kinds") {
    val k = 4
    val (streamedDf, n1) = StreamingOps.pqLiveRun(spark, sf, k,
      retrainEvery = 2)
    assert(n1 == k)
    val streamed = streamedDf.collect().toSeq
    // independent truth chain: retrain epochs (1, 3) stage their own
    // index — cold, then warm from the chain's OWN in-force codebook;
    // delta epochs (2, 4) stage codes as previous-epoch codes UNION a
    // PLAIN-SCALA nearest-code argmin over the new suffix (exact
    // longs, written independently of pqAssign), then serve from the
    // STALE in-force model tables
    import operators.AnnOps
    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    def cut(e: Int) = (maxId + 1) * e / k
    var inForceCb: String = null
    var inForceCent: String = null
    var prevCodes: String = null
    val expected = (1 to k).flatMap { e =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pqd_pre${e}_").toString
      val prefix = emb.filter(col("vec_id") < cut(e))
      val codesDir = s"$dir/codes"
      if (e == 1 || (e - 1) % 2 == 0) {
        val (cbD, ctD) = (s"$dir/cb", s"$dir/cent")
        val prev = if (e == 1) None else Some(
          spark.read.schema(AnnOps.pqCbSchema).parquet(inForceCb))
        AnnOps.stagePqIndexTo(spark, prefix, cbD, codesDir, ctD, prev)
        inForceCb = cbD
        inForceCent = ctD
      } else {
        val cb = spark.read.schema(AnnOps.pqCbSchema)
          .parquet(inForceCb).collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            r.getSeq[Long](2).toArray).toMap
        val suffix = emb.filter(col("vec_id") >= cut(e - 1) &&
            col("vec_id") < cut(e))
          .select("vec_id", "embedding", "label").collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
            r.getInt(2)))
        val newRows = suffix.toSeq.flatMap { case (id, v, lab) =>
          (0 until AnnOps.PqM).map { t =>
            val xm = Array.tabulate(AnnOps.PqSubD)(j =>
              math.round(v(t * AnnOps.PqSubD + j).toDouble * 1e6))
            val kBest = (0 until AnnOps.PqK).minBy { kk =>
              val cm = cb((t, kk))
              var d2 = 0L
              var j = 0
              while (j < AnnOps.PqSubD) {
                val d = xm(j) - cm(j); d2 += d * d; j += 1
              }
              (d2, kk)
            }
            (id, t, kBest, lab)
          }
        }
        import spark.implicits._
        newRows.toDF("vec_id2", "t", "k", "label")
          .unionByName(spark.read.parquet(prevCodes))
          .write.parquet(codesDir)
      }
      prevCodes = codesDir
      AnnOps.pqServeFromDirs(spark, prefix, inForceCb, codesDir,
          inForceCent).collect().toSeq
        .map(r => org.apache.spark.sql.Row(e, r.get(0), r.get(1),
          r.get(2), r.get(3), r.get(4)))
    }
    assert(streamed == expected,
      "delta-epoch PQ serving verdicts != independent assign-only replay")
    // the delta cadence genuinely diverges from the full-rebuild op at
    // some delta epoch, and the cold epoch agrees by construction
    val full = StreamingOps.pqLiveRun(spark, sf, k)._1.collect().toSeq
    def ep(rows: Seq[org.apache.spark.sql.Row], e: Int) =
      rows.filter(_.getInt(0) == e)
        .map(r => (r.getLong(1), r.getLong(2), r.getInt(5))).toSet
    assert(ep(streamed, 1) == ep(full, 1),
      "cold epoch drifted between the delta and full-rebuild faces")
    assert((2 to k).exists(e => ep(streamed, e) != ep(full, e)),
      "degenerate fixture: every delta epoch equals the full rebuild")
    // kill-and-resume across BOTH epoch kinds: resume ENTERING a delta
    // epoch (kill before 2: needs codes_v1 + the in-force cb_v1) and
    // ENTERING a warm retrain (kill before 3: warm-reads cb_v1, the
    // in-force codebook, not a cb_v2 that was never staged)
    Seq(2, 3).foreach { fe =>
      val (root, ckpt) = freshRoot()
      val ex = intercept[Exception] {
        StreamingOps.pqLiveRunAt(spark, sf, k, root, ckpt,
          failBeforeEpoch = fe, retrainEvery = 2)
      }
      assert(killedBy(ex, "planned ingest kill"))
      assert(StreamingOps.committedBatches(ckpt) == fe - 1)
      val (resumed, n2) = StreamingOps.pqLiveRunAt(spark, sf, k, root,
        ckpt, retrainEvery = 2)
      assert(n2 == k)
      assert(resumed.collect().toSeq == streamed,
        s"resume after kill-before-$fe != the one-shot delta chain")
    }
  }

  test("stream_pca_live: every epoch's projections equal " +
      "llm_embedding_pca run on that epoch's id-ordered prefix — the " +
      "append-only (sum_xx, sum_x, n) state derivation is exact — and " +
      "a planned kill resumes from the versioned state") {
    val k = 4
    val (streamedDf, n1) = StreamingOps.pcaLiveRun(spark, sf, k)
    assert(n1 == k)
    val streamed = streamedDf.collect().toSeq
    // independent per-epoch truth: the BATCH op on each prefix staged
    // as its own corpus dir — it recomputes mean + covariance DIRECTLY,
    // so equality proves the streamed sufficient-statistics identity
    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val expected = (1 to k).flatMap { e =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_pcal_pre${e}_").toString
      emb.filter(col("vec_id") < (maxId + 1) * e / k)
        .write.parquet(s"$dir/embeddings.parquet")
      SparkEntry.queries("llm_embedding_pca")(spark, dir).collect().toSeq
        .map(r => org.apache.spark.sql.Row(e, r.get(0), r.get(1),
          r.get(2)))
    }
    assert(streamed == expected,
      "per-epoch PCA projections != per-prefix batch llm_embedding_pca")
    // the model visibly advances: epoch-1 projections of a shared
    // vec_id differ from epoch-k's (covariance grew)
    val e1 = streamed.filter(_.getInt(0) == 1)
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ek = streamed.filter(_.getInt(0) == k)
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(e1.keySet.exists(id => e1(id) != ek(id)),
      "degenerate fixture: the PCA model never visibly advanced")
    // kill-and-resume: epoch 3 resumes against the staged state_v2
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.pcaLiveRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n2) = StreamingOps.pcaLiveRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(resumed.collect().toSeq == streamed,
      "resumed PCA live stream != one-shot chain")
  }

  test("stream_outliers_live: every epoch's quarantine equals " +
      "llm_embedding_outliers on that epoch's prefix, and the list " +
      "is genuinely dynamic (early members leave as the model grows)") {
    val k = 4
    val (streamedDf, n1) = StreamingOps.outliersLiveRun(spark, sf, k)
    assert(n1 == k)
    val streamed = streamedDf.collect().toSeq
    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val expected = (1 to k).flatMap { e =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_outl_pre${e}_").toString
      emb.filter(col("vec_id") < (maxId + 1) * e / k)
        .write.parquet(s"$dir/embeddings.parquet")
      SparkEntry.queries("llm_embedding_outliers")(spark, dir)
        .collect().toSeq
        .map(r => org.apache.spark.sql.Row(e, r.get(0), r.get(1),
          r.get(2), r.get(3)))
    }
    assert(streamed == expected,
      "per-epoch quarantine != per-prefix batch llm_embedding_outliers")
    // dynamic: at least one epoch-1 outlier is NOT in the final list
    // even though it is still in the prefix (the model re-judged it)
    val first = streamed.filter(_.getInt(0) == 1).map(_.getLong(1)).toSet
    val last = streamed.filter(_.getInt(0) == k).map(_.getLong(1)).toSet
    assert((first -- last).nonEmpty,
      "degenerate fixture: no early outlier ever left the quarantine")
    // kill-and-resume over the shared sufficient-statistics state
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.outliersLiveRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n2) =
      StreamingOps.outliersLiveRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(resumed.collect().toSeq == streamed,
      "resumed quarantine stream != one-shot chain")
  }

  test("stream_ann_live: every epoch's verdicts equal llm_ann_ivf run " +
      "on that epoch's id-ordered prefix with a prefix-trained " +
      "quantizer, and a planned kill resumes to the same table") {
    val k = 4
    val (streamedDf, n1) = StreamingOps.annLiveRun(spark, sf, k)
    assert(n1 == k)
    val streamed = streamedDf.collect().toSeq
    // independent per-epoch truth: stage each prefix as its own corpus
    // dir and run the BATCH op on it — same quantizer training, same
    // probe, no shared code path through the streaming run
    val emb = Tables.embeddings(spark, sf)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val expected = (1 to k).flatMap { e =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_annl_pre${e}_").toString
      emb.filter(col("vec_id") < (maxId + 1) * e / k)
        .write.parquet(s"$dir/embeddings.parquet")
      SparkEntry.queries("llm_ann_ivf")(spark, dir).collect().toSeq
        .map(r => org.apache.spark.sql.Row(e, r.get(0), r.get(1),
          r.get(2), r.get(3)))
    }
    assert(streamed == expected,
      "per-epoch serving verdicts != per-prefix batch llm_ann_ivf")
    // the composition is non-degenerate: some query's top-k must
    // actually CHANGE across index versions (the live part)
    val byEpoch = streamed.groupBy(_.getInt(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getInt(4))))
    assert(byEpoch(1).toSet != byEpoch(k).toSet,
      "degenerate fixture: the index never visibly advanced")
    // kill-and-resume: epoch-keyed quantizer overwrite + distinct
    // readout resume to the identical table
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.annLiveRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n2) = StreamingOps.annLiveRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(resumed.collect().toSeq == streamed,
      "resumed live-serving stream != one-shot chain")
    // checkpoint tamper: replay epoch k — the epoch-keyed quantizer
    // overwrite is idempotent and the re-appended verdict rows are
    // byte-identical, so the distinct() readout collapses them exactly
    val lastCommit = new java.io.File(s"$ckpt/commits/${k - 1}")
    assert(lastCommit.isFile)
    assert(lastCommit.delete())
    new java.io.File(s"$ckpt/commits/.${k - 1}.crc").delete()
    val (replayed, n3) =
      StreamingOps.annLiveRunAt(spark, sf, k, root, ckpt)
    assert(n3 == k)
    assert(replayed.collect().toSeq == streamed,
      "tampered replay changed the served verdicts")
  }

  test("stream_ccnet_ingest: the live corpus build equals " +
      "llm_ccnet_pipeline verbatim, a planned kill resumes to it, and " +
      "a tampered last commit replays the epoch against its own " +
      "appended survivor index exactly (the least() keeper fold)") {
    val k = 4
    val batch = SparkEntry.queries("llm_ccnet_pipeline")(spark, sf)
      .collect().toSeq
    val (streamedDf, n1) = StreamingOps.ccnetIngestRun(spark, sf, k)
    assert(n1 == k)
    assert(streamedDf.collect().toSeq == batch,
      "live CCNet build != batch llm_ccnet_pipeline")
    // cross-epoch dedup must actually fire — the stock sf0.001 corpus
    // has no dup pair straddling an epoch boundary, so force one:
    // verbatim replicas of every doc land in epoch 2 while all
    // originals sit in epoch 1, and every replica must resolve
    // through the PERSISTED survivor index
    val docs = Tables.documents(spark, sf)
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val dupDir = java.nio.file.Files
      .createTempDirectory("graft_ccn_dup_").toString
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + lit(mx)))
      .write.parquet(s"$dupDir/documents.parquet")
    val exp2 = SparkEntry.queries("llm_ccnet_pipeline")(spark, dupDir)
      .collect().toSeq
    val (got2Df, nb2) = StreamingOps.ccnetIngestRun(spark, dupDir, 2)
    assert(nb2 == 2)
    assert(got2Df.collect().toSeq == exp2,
      "replica-fixture live build != batch op")
    exp2.filter(_.getLong(0) >= mx).foreach { r =>
      assert(r.getString(1) == "dup" && !r.isNullAt(2) &&
        r.getLong(2) < mx,
        s"replica ${r.getLong(0)} did not dedup across the epoch " +
          s"boundary: $r")
    }
    // kill-and-resume
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.ccnetIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n2) =
      StreamingOps.ccnetIngestRunAt(spark, sf, k, root, ckpt)
    assert(n2 == k)
    assert(resumed.collect().toSeq == batch,
      "resumed CCNet chain != batch op")
    // checkpoint tamper: drop the last commit marker so epoch k
    // replays with its own survivors already in seen/ — least() must
    // fold each replayed survivor to its own keeper, byte-identically
    val lastCommit = new java.io.File(s"$ckpt/commits/${k - 1}")
    assert(lastCommit.isFile)
    assert(lastCommit.delete())
    new java.io.File(s"$ckpt/commits/.${k - 1}.crc").delete()
    assert(StreamingOps.committedBatches(ckpt) == k - 1)
    val (replayed, n3) =
      StreamingOps.ccnetIngestRunAt(spark, sf, k, root, ckpt)
    assert(n3 == k)
    assert(replayed.collect().toSeq == batch,
      "replayed epoch changed the final table — replay is not idempotent")
  }

  test("stream_semantic_ingest: the chained cell recomputes land on " +
      "llm_semantic_dedup verbatim, a later-arriving keep-order " +
      "PREDECESSOR flips an earlier epoch's verdict, and " +
      "kill-and-resume + checkpoint-tamper replay are exact") {
    val k = 4
    // final state ≡ batch op on the stock corpus
    val batch = SparkEntry.queries("llm_semantic_dedup")(spark, sf)
      .collect().toSeq
    val (got, n1) = StreamingOps.semanticIngestRun(spark, sf, k)
    assert(n1 == k)
    assert(got.collect().toSeq == batch,
      "chained semantic ingest != batch llm_semantic_dedup")

    // THE FLIP: SemDeDup's keep order is (c_sim asc, vec_id) — NOT
    // arrival order — so a late-arriving outlier that precedes an
    // already-kept member must flip that member to dup when its cell
    // recomputes. Fixture (2-D directions padded to dim 8, one label):
    // v0 at 0° (id 0, epoch 1), v2 at 90° (id 1, epoch 1), v1 at −55°
    // (id 1000, epoch 2). Frozen centroid ≈ 6.6°, so keep order is
    // v2 (0.115) < v1 (0.475) < v0 (0.993), and cos(v0, v1) =
    // cos 55° ≈ 0.574 ≥ 0.4: after epoch 1 v0 is KEPT, after epoch 2
    // it must be dup_of = 1000 — a dup_of LARGER than its own id,
    // impossible under arrival-frozen verdicts.
    import spark.implicits._
    def vec(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(8)(j =>
        if (j == 0) (2.0 * math.cos(r)).toFloat
        else if (j == 1) (2.0 * math.sin(r)).toFloat
        else 0.0f)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semi_flip_").toString
    Seq((0L, vec(0), 0), (1L, vec(90), 0), (1000L, vec(-55), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val root = java.nio.file.Files
      .createTempDirectory("graft_semi_flip_root_").toString
    val ckptF = s"$root/ckpt"
    val (flipDf, nf) =
      StreamingOps.semanticIngestRunAt(spark, dir, 2, root, ckptF)
    assert(nf == 2)
    val fin = flipDf.collect().map(r => r.getLong(0) ->
      (r.getBoolean(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(fin(0L) == ((false, Some(1000L))),
      s"v0 must flip to dup_of=1000, got ${fin(0L)}")
    assert(fin(1L) == ((true, None)) && fin(1000L) == ((true, None)))
    // and the epoch-1 state really had v0 KEPT (the flip happened
    // across the epoch boundary, not within one recompute)
    val v1state = spark.read.parquet(s"$root/state_v1")
      .select(col("vec_id"), col("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v1state == Map(0L -> true, 1L -> true),
      s"epoch-1 state wrong: $v1state")
    // the flip fixture's final state also equals the batch op on it
    assert(flipDf.collect().toSeq ==
      SparkEntry.queries("llm_semantic_dedup")(spark, dir)
        .collect().toSeq)

    // kill-and-resume + tamper on the stock corpus
    val (root2, ckpt2) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.semanticIngestRunAt(spark, sf, k, root2, ckpt2,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt2) == 2)
    val (resumed, n2) =
      StreamingOps.semanticIngestRunAt(spark, sf, k, root2, ckpt2)
    assert(n2 == k)
    assert(resumed.collect().toSeq == batch,
      "resumed semantic ingest != batch op")
    // tamper: replay the last epoch against its own appended members —
    // the member-index distinct() + batchId-keyed state overwrite must
    // re-materialize the identical table
    val lastCommit = new java.io.File(s"$ckpt2/commits/${k - 1}")
    assert(lastCommit.isFile)
    assert(lastCommit.delete())
    new java.io.File(s"$ckpt2/commits/.${k - 1}.crc").delete()
    val (replayed, n3) =
      StreamingOps.semanticIngestRunAt(spark, sf, k, root2, ckpt2)
    assert(n3 == k)
    assert(replayed.collect().toSeq == batch,
      "tampered replay changed the final state")
  }

  test("stream_perplexity_bucket: k document micro-batches against the " +
      "frozen staged LM equal the batch op verbatim, and a planned " +
      "kill resumes from the checkpoint to the same table") {
    val k = 4
    val streamed =
      StreamingOps.perplexityBucketRun(spark, sf, k)._1.collect().toSeq
    val batch =
      SparkEntry.queries("llm_perplexity_bucket")(spark, sf).collect().toSeq
    assert(streamed == batch, "streamed gate != batch llm_perplexity_bucket")
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.perplexityBucketRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n) =
      StreamingOps.perplexityBucketRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    assert(resumed.collect().toSeq == batch,
      "resumed gate stream != batch llm_perplexity_bucket")
  }

  test("stream_temporal_join: the dim ADVANCES between micro-batches " +
      "and one customer's events land on different versions — the " +
      "property a static join can't show; kill-and-resume holds") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val (out, n) =
      StreamingOps.temporalJoinRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    val rows = out.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))

    // the second writer really advanced the dim: each epoch's staged
    // version set strictly grows (v1 = pre-update history, v4 = full)
    val dimSizes = (1 to k).map(e =>
      spark.read.parquet(s"$root/dim_v$e").count())
    assert(dimSizes.head < dimSizes.last &&
      dimSizes == dimSizes.sorted,
      s"dim version sets should grow across epochs, got $dimSizes")
    val nCust = Tables.customer(spark, sf).count()
    assert(dimSizes.head == nCust, "epoch 1 must see version 0 only")

    // an updated (%7) customer with events in multiple epochs binds
    // DIFFERENT versions for comparable events — find one
    // programmatically and demand it exists (the fixture guarantees
    // %7 users with events across the month)
    val multi = rows.filter(_._2 % 7 == 0).groupBy(_._2)
      .filter(_._2.map(_._3).distinct.size >= 2)
    assert(multi.nonEmpty,
      "no %7 customer landed on two different dim versions — the " +
        "temporal property is untested on this fixture")
    // and within such a customer, the version is monotone in event id
    // (event time orders the versions — the validity-interval pick)
    multi.values.foreach { es =>
      val sorted = es.sortBy(_._1).map(_._3)
      assert(sorted == sorted.sorted,
        s"versions must be monotone in event time, got $sorted")
    }
    // non-updated customers always version 0 with the unscaled balance
    assert(rows.filter(_._2 % 7 != 0).forall(_._3 == 0))

    // kill before epoch 3, resume, equal the one-shot run
    val (root2, ckpt2) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.temporalJoinRunAt(spark, sf, k, root2, ckpt2,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt2) == 2)
    val (resumed, n2) =
      StreamingOps.temporalJoinRunAt(spark, sf, k, root2, ckpt2)
    assert(n2 == k)
    assert(resumed.collect().toSeq == out.collect().toSeq,
      "resumed temporal join != one-shot run")
  }

  test("stream_rules_apply: a rule FLIPS between epochs — the same " +
      "event shape classifies differently before and after; " +
      "kill-and-resume holds") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val (out, n) = StreamingOps.rulesApplyRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    val rows = out.collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getString(4)))
    assert(rows.map(_._1).toSet ==
      Tables.events(spark, sf).select("event_id").collect()
        .map(_.getLong(0)).toSet, "one verdict per event")

    // the published rules artifact actually CHANGED between epochs
    val errThr = (1 to k).map(e => spark.read
      .parquet(s"$root/rules_v$e")
      .filter(col("event_type") === "error")
      .head().getDouble(1))
    assert(errThr == Seq(0.0, 0.0, 1000.0, 1000.0),
      s"error rule should flip at epoch 3, got $errThr")

    // and events FELT the flip: error events flag in epochs 1-2
    // (thr 0 — every value qualifies) and pass in 3-4 (thr 1000 —
    // fixture values are far below)
    val errs = rows.filter(_._2 == "error")
    val byEpoch = errs.groupBy(_._3).view.mapValues(_.map(_._5).distinct)
    assert(Seq(1, 2).forall(e => byEpoch.get(e).forall(_ == Seq("flag"))),
      s"pre-flip error events must all flag: $byEpoch")
    assert(Seq(3, 4).forall(e => byEpoch.get(e).forall(_ == Seq("pass"))),
      s"post-flip error events must all pass: $byEpoch")
    assert(Seq(1, 2).exists(byEpoch.contains) &&
      Seq(3, 4).exists(byEpoch.contains),
      "fixture must carry error events on both sides of the flip")

    // kill before epoch 3 (the flip epoch), resume, equal one-shot
    val (root2, ckpt2) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.rulesApplyRunAt(spark, sf, k, root2, ckpt2,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt2) == 2)
    val (resumed, n2) =
      StreamingOps.rulesApplyRunAt(spark, sf, k, root2, ckpt2)
    assert(n2 == k)
    assert(resumed.collect().toSeq == out.collect().toSeq,
      "resumed rules stream != one-shot run")
  }

  test("stream_importance_ingest: k document micro-batches against " +
      "the frozen staged DSIR λ grid equal the batch op verbatim, " +
      "and a planned kill resumes to the same table") {
    val k = 4
    val streamed =
      StreamingOps.importanceIngestRun(spark, sf, k)._1.collect().toSeq
    val batch = SparkEntry.queries("llm_importance_weights")(spark, sf)
      .collect().toSeq
    assert(streamed == batch,
      "streamed DSIR scores != batch llm_importance_weights")
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.importanceIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n) =
      StreamingOps.importanceIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    assert(resumed.collect().toSeq == batch,
      "resumed DSIR stream != batch llm_importance_weights")
  }

  test("stream_bpe_ingest: k document micro-batches against the " +
      "frozen staged tokenizer equal llm_bpe_tokenize verbatim, and " +
      "a planned kill resumes to the same table") {
    val k = 4
    val streamed =
      StreamingOps.bpeIngestRun(spark, sf, k)._1.collect().toSeq
    val batch = SparkEntry.queries("llm_bpe_tokenize")(spark, sf)
      .collect().toSeq
    assert(streamed == batch,
      "streamed BPE token counts != batch llm_bpe_tokenize")
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.bpeIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n) =
      StreamingOps.bpeIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    assert(resumed.collect().toSeq == batch,
      "resumed BPE stream != batch llm_bpe_tokenize")
  }

  test("stream_phash_ingest: k micro-batches equal the horizon-free " +
      "arrival-order truth, the compacted index is signature-bounded, " +
      "and a planned kill resumes to the same table") {
    val k = 4
    val streamed =
      StreamingOps.phashIngestRun(spark, sf, k)._1.collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // independent horizon-free replay: dup_of(n) = min admissible
    // candidate with a smaller id, over the whole corpus
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def hash(t: String): Long = {
      val b = t.getBytes("UTF-8"); val len = b.length
      if (len == 0) 0L
      else {
        val cnt = new Array[Long](64)
        b.foreach(x => cnt((x & 0xff) % 64) += 1)
        (0 until 64).foldLeft(0L)((h, kk) =>
          if (cnt(kk) * 64 > len) h | (1L << kk) else h)
      }
    }
    val ph = docs.map { case (id, fmt, t) =>
      (id, fmt, t.getBytes("UTF-8").length, hash(t)) }
    val expected = ph.sortBy(_._1).map { x =>
      val cands = ph.filter(y => y._1 < x._1 && y._2 == x._2 &&
        math.abs(y._3 - x._3) <= 16 &&
        java.lang.Long.bitCount(x._4 ^ y._4) <= 3).map(_._1)
      (x._1, x._2,
        if (cands.isEmpty) "kept" else "band_dup",
        if (cands.isEmpty) None else Some(cands.min))
    }.toSeq
    assert(streamed == expected,
      "streamed phash verdicts != horizon-free truth")
    assert(expected.exists(_._3 == "band_dup"),
      "degenerate fixture: no dup ever streamed")
    // kill-and-resume: versioned index chain + distinct readout
    val (root, ckpt) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.phashIngestRunAt(spark, sf, k, root, ckpt,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt) == 2)
    val (resumed, n) =
      StreamingOps.phashIngestRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    assert(resumed.collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))) == expected,
      "resumed phash stream != one-shot chain")
    // lossless compaction bound: the final staged index carries at
    // most one row per distinct (fp, fmt, n_bytes) signature
    val idx = spark.read.parquet(s"$root/idx/v$k")
    val sigs = ph.map(x => (x._4, x._2, x._3)).distinct.size
    assert(idx.count() <= sigs, "index grew past the signature bound")
  }

  test("stream_side_output_late: late rows divert to the side sink " +
      "(never epoch 1), on-time + late partition every batch, and " +
      "kill-and-resume holds") {
    val k = 4
    val (root, ckpt) = freshRoot()
    val (side, n) =
      StreamingOps.sideOutputLateRunAt(spark, sf, k, root, ckpt)
    assert(n == k)
    val late = side.collect().toSeq.map(r =>
      (r.getLong(0), r.getInt(3), r.getLong(2), r.getLong(4)))
    assert(late.nonEmpty, "the mod-staged stream must produce late rows")
    // epoch 1 has no watermark yet — nothing can be late there
    assert(late.forall(_._2 >= 2))
    // every late row really was late at its epoch: ts + lateness < wm
    assert(late.forall { case (_, _, ts, wm) => ts + 60000L < wm })
    // partition: per-epoch on-time counts + late counts == slice sizes
    val onTime = spark.read.parquet(s"$root/main")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
    val sliceSizes = ev.groupBy((col("event_id") % k).cast("int"))
      .count().collect().map(r => r.getInt(0) + 1 -> r.getLong(1)).toMap
    val lateByEpoch =
      late.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    (1 to k).foreach { e =>
      assert(onTime.getOrElse(e, 0L) + lateByEpoch.getOrElse(e, 0L) ==
        sliceSizes(e), s"epoch $e: on-time + late != slice size")
    }
    // kill before epoch 3, resume, equal the one-shot run
    val (root2, ckpt2) = freshRoot()
    val e = intercept[Exception] {
      StreamingOps.sideOutputLateRunAt(spark, sf, k, root2, ckpt2,
        failBeforeEpoch = 3)
    }
    assert(killedBy(e, "planned ingest kill"))
    assert(StreamingOps.committedBatches(ckpt2) == 2)
    val (resumed, n2) =
      StreamingOps.sideOutputLateRunAt(spark, sf, k, root2, ckpt2)
    assert(n2 == k)
    assert(resumed.collect().toSeq == side.collect().toSeq,
      "resumed side output != one-shot run")
  }
}
