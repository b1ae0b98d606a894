package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** Pins the sketch family's multi-epoch chain
  * (`LlmOps.advanceMinhashEpoch`): advancing the persisted band index
  * A (+B) (+C) yields, per batch, exactly the verdicts of (a) the full
  * band-pair semantics (dup_of(n) = min{c : {c, n} a band-candidate
  * pair, c < n} — under id-ordering the verdict is horizon-independent)
  * and (b) a from-scratch per-group index staged over all prior docs —
  * which is the compaction theorem exercised for real: the chained
  * index is min(rep_id)-compacted over (lang, n_chars, bucket,
  * band_sig) band rows and may merge rows of different texts, yet no
  * probe can tell it apart from the freshly staged one.
  */
class MinhashChainSpec extends GraftSpec {

  test("sketch multi-epoch chain: chained verdicts == pair-set truth " +
      "== from-scratch index verdicts") {
    val docs = Tables.documents(spark, sf)
    val idxA = LlmOps.minhashBandIndex(docs.filter(col("doc_id") < 300))
      .localCheckpoint()
    val (verdB, idxAB) =
      LlmOps.advanceMinhashEpoch(spark, sf, 300, 400, idxA)
    // the persisted cut between epochs (a deployment reads parquet)
    val (verdC, _) = LlmOps.advanceMinhashEpoch(spark, sf, 400,
      Long.MaxValue, idxAB.localCheckpoint())

    // (a) pair-set truth from the independently computed full op
    val pairs = SparkEntry.queries("llm_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    def check(label: String, got: Seq[(Long, String, Option[Long])],
        lo: Long, hi: Long): Unit = {
      val ids = docs.select("doc_id").collect().map(_.getLong(0))
        .filter(i => i >= lo && i < hi).toSet
      assert(got.map(_._1).toSet == ids, s"$label: one verdict per doc")
      got.foreach { case (n, stage, dupOf) =>
        val admissible = adj.getOrElse(n, Set.empty).filter(_ < n)
        val expected =
          if (admissible.isEmpty) None else Some(admissible.min)
        assert(dupOf == expected,
          s"$label doc $n: dup_of=$dupOf expected=$expected")
        assert(stage == (if (expected.isEmpty) "kept" else "band_dup"))
      }
      // cross-epoch probing must really fire: some verdict's dup_of
      // points BELOW this batch's lower bound
      assert(got.exists(_._3.exists(_ < lo)),
        s"$label: no cross-epoch band dup — chain fixture degenerate")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val gotB = rows(verdB)
    val gotC = rows(verdC)
    check("epoch B", gotB, 300, 400)
    check("epoch C", gotC, 400, Long.MaxValue)

    // (b) the compaction theorem: the chained (compacted, possibly
    // cross-text-merged) index is verdict-equivalent to a freshly
    // staged per-group index over the same doc set
    val batchC = docs.filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    val fresh = rows(LlmOps.minhashVerdictsFrom(batchC,
      LlmOps.minhashBandIndex(docs.filter(col("doc_id") < 400))))
    assert(gotC == fresh, "chained index verdicts != from-scratch index")
  }

  test("stream_minhash_ingest: a real streaming query over k id-ordered " +
      "micro-batches reproduces the pair-set truth, with cross-batch " +
      "dups firing") {
    val k = 4
    val (verdictDf, nBatches) =
      graft.streaming.StreamingOps.minhashIngestRun(spark, sf, k)
    assert(nBatches == k,
      s"expected $k micro-batches (maxFilesPerTrigger=1), got $nBatches")

    val docs = Tables.documents(spark, sf)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    def batchOf(id: Long): Long = id * k / (maxId + 1)

    val got = verdictDf.collect().toSeq.map(r => (r.getLong(0),
      r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).toSet == ids, "one verdict per corpus doc")

    // pair-set truth from the independently computed full op
    val pairs = SparkEntry.queries("llm_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (kk, v) => kk -> v.map(_._2).toSet }
    got.foreach { case (n, stage, dupOf) =>
      val admissible = adj.getOrElse(n, Set.empty).filter(_ < n)
      val expected =
        if (admissible.isEmpty) None else Some(admissible.min)
      assert(dupOf == expected, s"doc $n: dup_of=$dupOf exp=$expected")
      assert(stage == (if (expected.isEmpty) "kept" else "band_dup"))
    }

    // the cross-batch index probe must really fire: some verdict's
    // dup_of lands in an EARLIER micro-batch than its doc
    assert(got.exists { case (n, _, dupOf) =>
      dupOf.exists(c => batchOf(c) < batchOf(n))
    }, "no cross-batch band dup — the ingest fixture is degenerate")
  }
}
