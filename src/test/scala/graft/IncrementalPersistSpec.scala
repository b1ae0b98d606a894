package graft

import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TrainingDataOps}

/** Pins `llm_dedup_keep_best_persisted`'s load-bearing claim: deriving
  * the new epoch from PERSISTED prior state (verdict table + survivor
  * index read from parquet) produces bit-identical verdicts to
  * recomputing both epochs from scratch — the four id-ordering
  * theorems stated on keepBestPersistedFrom, exercised on the real
  * corpus. (The DuckDB oracle re-proves the same equivalence
  * cross-engine at sf0.01; this spec proves it within Spark where the
  * recompute reference shares no code with the incremental path except
  * keepBestOf itself.)
  */
class IncrementalPersistSpec extends GraftSpec {

  test("persisted-state verdicts == recomputed two-epoch verdicts") {
    val docs = Tables.documents(spark, sf)
    val q = TrainingDataOps.qualityDecimal(spark, sf)
    val thr = LlmOps.epochThreshold(spark, sf)

    // recompute reference: the round-9 shape — keep-best BOTH epochs
    // from scratch, verdict from the (was_keep, keep) cross
    val before = LlmOps.keepBestOf(spark,
        docs.filter(col("doc_id") < thr), q)
      .select(col("doc_id"), col("keep").as("was_keep"))
    val expected = LlmOps.keepBestOf(spark, docs, q)
      .join(before, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        col("q").cast("double").as("quality"), col("keep"),
        when(col("was_keep").isNull,
          when(col("keep"), lit("new_keeper")).otherwise(lit("new_dup")))
          .when(col("was_keep") && col("keep"), lit("retained"))
          .when(col("was_keep") && !col("keep"), lit("displaced"))
          .when(col("keep"), lit("promoted"))
          .otherwise(lit("dup")).as("verdict"))
      .collect().toSet

    val got = SparkEntry.queries("llm_dedup_keep_best_persisted")(
      spark, sf).collect().toSet
    assert(got == expected,
      s"persisted != recomputed: only-persisted=${(got -- expected).take(3)}"
        + s" only-recomputed=${(expected -- got).take(3)}")

    // the split must be non-degenerate and the churn real: at least one
    // batch doc joined an existing cluster, and `promoted` must be
    // ABSENT (id-ordering theorem 4: only a batch doc can displace a
    // keeper, an existing non-keeper can never rise)
    val verdicts = got.map(_.getString(4))
    assert(verdicts.contains("new_keeper") && verdicts.contains("new_dup"),
      s"batch side degenerate: $verdicts")
    assert(!verdicts.contains("promoted"),
      "promoted verdict contradicts the id-ordering theorem")
  }

  test("multi-epoch associativity: chained advanceEpoch == from-scratch") {
    // The deployment runs MANY batches, not one: state persisted after
    // epoch k feeds epoch k+1. This pins the induction step of the four
    // id-ordering theorems — advancing A (+B) (+C) must land on exactly
    // the state a from-scratch keep-best over A∪B∪C computes, keeps,
    // cluster labels, quality and all.
    val docs = Tables.documents(spark, sf)
    val q = TrainingDataOps.qualityDecimal(spark, sf)
    val epochA = docs.filter(col("doc_id") < 300)
    val stateA = LlmOps.keepBestOf(spark, epochA, q).localCheckpoint()
    val survA = LlmOps.survivorIndex(epochA).localCheckpoint()
    val (stateB, survB) =
      LlmOps.advanceEpoch(spark, sf, 300, 400, stateA, survA)
    // the persisted cut between epochs (a deployment reads parquet)
    val (stateC, _) = LlmOps.advanceEpoch(spark, sf, 400, Long.MaxValue,
      stateB.localCheckpoint(), survB.localCheckpoint())
    val expected = LlmOps.keepBestOf(spark, docs, q).collect().toSet
    val got = stateC.collect().toSet
    assert(got == expected,
      s"chained != scratch: only-chained=${(got -- expected).take(3)}"
        + s" only-scratch=${(expected -- got).take(3)}")
    // non-degenerate: both batches must really have joined existing
    // clusters (otherwise the induction step went untested)
    val bJoined = stateB.filter(col("doc_id") >= 300 &&
      col("cluster_id") < 300).count()
    val cJoined = stateC.filter(col("doc_id") >= 400 &&
      col("cluster_id") < 400).count()
    assert(bJoined > 0 && cJoined > 0,
      s"degenerate chain fixture: bJoined=$bJoined cJoined=$cJoined")
  }

  test("displacement happens on the real corpus (the load-bearing delta)") {
    // if the fixture ever stops producing a displaced keeper, the op's
    // hardest path (argmax update via prior keeper) is untested — fail
    // loudly so the fixture gets re-crafted rather than silently
    // weakening the suite
    val out = SparkEntry.queries("llm_dedup_keep_best_persisted")(
      spark, sf)
    assert(out.filter(col("verdict") === "displaced").count() > 0,
      "no displaced keeper at sf0.001 — fixture no longer exercises " +
        "the argmax-update path")
  }
}
