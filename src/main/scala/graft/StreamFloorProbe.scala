package graft

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Micro-batch floor probe (round-9; the round-8 review's stretch
  * item): the streaming family costs ~1.4 s/op in the sweep — how much
  * of that is per-query FIXED machinery (query start, state-store
  * open/commit/snapshot, memory-sink setup) vs true micro-batch
  * compute? The experiment: run N streaming ops back-to-back
  * (sequential, the sweep's shape), then the same N CONCURRENTLY in
  * one SparkSession generation (each op keeps its own query,
  * checkpoint and memory sink; the session's scheduler interleaves
  * them). If the concurrent wall clock is far below the sequential
  * sum, the floor is serialized per-query setup + idle stage gaps,
  * not saturated compute — i.e. a deployment hosting many continuous
  * queries in one driver amortizes it, and the per-op sweep numbers
  * OVERSTATE the marginal cost of a streaming op. Findings (measured
  * round 10): sequential 17.66 s vs concurrent 5.02 s for the same
  * 8 ops — 3.5× amortization, so the floor IS serialized setup. The
  * JSON line is committed as STREAM_FLOOR.json; the analysis lives in
  * BASELINE.md §"Streaming floor".
  *
  * Run: sbt "runMain graft.StreamFloorProbe [N]" (default: the 8-op
  * mixed family below; prints one JSON line). With `--family` it
  * instead measures the ENTIRE registered streaming family (every
  * `stream_*` key in SparkEntry.queries) sequential vs concurrent —
  * the round-11 concurrent bench lane: the sweep's per-op streaming
  * line is a regression tracker, this number is the honest marginal
  * cost of deploying the family together.
  *
  * MEDIAN-OF-N (round-12, the r11 verdict's item 5): the three
  * same-day round-11 family runs spread 24.1-45.4 s concurrent (±47%),
  * unusable as a regression gate at n=1 — so `--family` now runs the
  * whole sequential+concurrent pair 3 times by default (`--reps N`
  * overrides) and emits per-rep numbers, medians and the concurrent
  * spread in ONE artifact. The gate (BASELINE.md): compare MEDIANS,
  * flag only a delta above the measured same-artifact spread.
  */
object StreamFloorProbe {

  // a mixed slice of the family: CEP, session, chained-stateful,
  // sliding counts, sketches — not just the cheap aggs
  private val Ops = Seq(
    "stream_funnel", "stream_pattern_abc", "stream_session_dynamic",
    "stream_dau", "stream_ewma", "stream_count_window",
    "stream_transitions", "stream_zscore")

  /** LANE SPLIT (round-15, the r14 review's item 2): the family grew 8
    * compute-heavy live-rebuild ops in r13 and the concurrent median
    * moved 2.8× past its own ~30 % gate — the "setup floor amortizes"
    * claim was proven on the CEP/window/join family, and ops that
    * STAGE a model/index artifact per run (the `_ingest` chains, the
    * `_live` per-epoch rebuilds, the artifact-staging `_query` server)
    * saturate compute instead of idling between triggers, so hosting
    * them in one 8-pool measures staging collisions, not floor
    * amortization. `--lane floor` excludes them; `--lane live` is the
    * complement; no flag = the whole family (the r13-comparable
    * number). */
  private def isLiveRebuild(op: String): Boolean =
    op.endsWith("_ingest") || op.endsWith("_live") ||
      op == "stream_ann_query" ||
      // the delta face stages epoch artifacts exactly like its
      // full-rebuild twin — same lane (r16; `_live_delta` defeats the
      // suffix test)
      op == "stream_pq_live_delta"

  def main(args: Array[String]): Unit = {
    val family = args.contains("--family")
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

    def runOne(op: String): Double = {
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(op)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }

    // a trailing --lane with no operand must fail loudly, not fall
    // back to measuring the full family (r15 advice)
    if (args.lastOption.contains("--lane"))
      throw new IllegalArgumentException(
        "--lane requires an operand: floor, live, or all")
    val lane = args.sliding(2).collectFirst {
      case Array("--lane", l) => l
    }.getOrElse("all")
    val ops = {
      val base =
        if (family) SparkEntry.queries.keys.filter(_.startsWith("stream_"))
          .toSeq.sorted
        else Ops
      lane match {
        case "floor" => base.filterNot(isLiveRebuild)
        case "live" => base.filter(isLiveRebuild)
        case "all" => base
        case l => throw new IllegalArgumentException(s"unknown lane $l")
      }
    }
    val metric = (if (family) "stream_floor_family" else "stream_floor") +
      (if (lane == "all") "" else s"_$lane")
    // cap the pool below the executor thread count so the concurrent
    // lane measures query interleaving, not driver-thread starvation —
    // and so the ingest quartet's staging writes don't all collide
    val poolSize = math.min(ops.size, 8)

    val reps = args.sliding(2).collectFirst {
      case Array("--reps", n) => n.toInt
    }.getOrElse(if (family) 3 else 1)

    // warm the JVM (codegen, state-store classes) outside both timings
    runOne(ops.head)

    def measurePair(): (Seq[(String, Double)], Double, Double) = {
      val seqTimes = ops.map(op => op -> runOne(op))
      val pool = Executors.newFixedThreadPool(poolSize)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      val t0 = System.nanoTime()
      val fs = ops.map(op => Future(runOne(op)))
      Await.result(Future.sequence(fs), Duration.Inf)
      val concTotal = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      (seqTimes, seqTimes.map(_._2).sum, concTotal)
    }

    val runs = (1 to reps).map { i =>
      val r = measurePair()
      println(f"[streamfloor] rep $i: sequential ${r._2}%.2f s, " +
        f"concurrent ${r._3}%.2f s")
      r
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val seqMed = median(runs.map(_._2))
    val concMed = median(runs.map(_._3))
    val concs = runs.map(_._3)
    val spreadPct =
      if (concMed == 0) 0.0 else (concs.max - concs.min) / concMed * 100
    // per-op medians across reps (r12 advice: the last-rep sample mixed
    // one noisy measurement into a median-gated artifact)
    val per = ops.map { op =>
      val med = median(runs.map(_._1.collectFirst {
        case (`op`, v) => v
      }.get))
      s""""$op":$med"""
    }.mkString("{", ",", "}")
    val repsJson = runs.map { case (_, sq, cc) =>
      f"""{"sequential_sec":$sq%.2f,"concurrent_sec":$cc%.2f}"""
    }.mkString("[", ",", "]")
    println(f"""{"metric":"$metric%s","sequential_sec":$seqMed%.2f,""" +
      f""""concurrent_sec":$concMed%.2f,"reps":$repsJson,""" +
      f""""concurrent_spread_pct":$spreadPct%.1f,"ops":${ops.size},""" +
      s""""pool":$poolSize,"per_op_sequential":$per,"sf":"$sfDir"}""")
    spark.stop()
  }
}
