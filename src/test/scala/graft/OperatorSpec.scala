package graft

import org.apache.spark.sql.functions._

/** L1 unit coverage for batch operators: every registered query runs on
  * sf0.001 and returns a sane shape; targeted semantic checks on tiny
  * hand-computed inputs. (Cross-engine value equality is covered by the
  * DuckDB oracle preflight — SURVEY.md §5 L2.)
  */
class OperatorSpec extends GraftSpec {

  test("every registered query executes and matches its oracle registration") {
    val qs = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    assert(oracles.keySet.subsetOf(qs.keySet),
      s"oracle keys without query: ${oracles.keySet -- qs.keySet}")
    // Non-oracle ops are intentional and enumerated (D8):
    assert((qs.keySet -- oracles.keySet) ==
      Set("agg_approx_distinct", "agg_hll_merge",
        "agg_approx_percentile",
        "stream_approx_distinct", "udaf_topk_sketch",
        "stream_topk_sketch"))
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("weighted avg aggregator matches hand computation") {
    import spark.implicits._
    val df = Seq((2.0, 10.0, "a"), (3.0, 20.0, "a"), (1.0, 7.0, "b"))
      .toDF("w", "x", "g")
    val wavg = udaf(functions.WeightedAvgAggregator)
    val out = df.groupBy($"g").agg(wavg($"w", $"x").as("v"))
      .orderBy($"g").collect()
    // a: (2*10 + 3*20) / 5 = 16 ; b: 7
    assert(out(0).getDecimal(1).doubleValue() === 16.0)
    assert(out(1).getDecimal(1).doubleValue() === 7.0)
  }

  test("approx_count_distinct within 5% of exact (SURVEY §2.1 D)") {
    val exact = SparkEntry.queries("agg_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$k: approx=$ap exact=$ex off by >5%")
    }
  }

  test("approx_percentile within 5% of the exact interpolated percentile") {
    val exact = SparkEntry.queries("agg_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val approx = SparkEntry.queries("agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      // absolute-or-relative: a zero exact value must not divide to NaN
      assert(math.abs(a50 - e50) <= 0.05 * math.max(1.0, math.abs(e50)),
        s"$k p50: approx=$a50 exact=$e50")
      assert(math.abs(a90 - e90) <= 0.05 * math.max(1.0, math.abs(e90)),
        s"$k p90: approx=$a90 exact=$e90")
    }
  }

  test("minhash LSH candidates recall >= 0.7 vs exact jaccard truth") {
    val truth = SparkEntry.queries("llm_jaccard_pairs")(spark, sf)
      .select("doc_id", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = SparkEntry.queries("llm_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "jaccard ground truth is empty — test data changed?")
    val recall = truth.count(cands.contains).toDouble / truth.size
    assert(recall >= 0.7, s"recall $recall over ${truth.size} true pairs")
  }

  test("minhash incremental verdicts = full LSH pair set restricted to the probe") {
    // llm_minhash_lsh emits every unordered band-candidate pair; the
    // incremental op must agree with it exactly: a new doc n (id%100>=80)
    // is band_dup iff the full pair set contains {n, c} for some
    // admissible c (existing with any id, or new with c < n), with
    // dup_of = the min such c. Cross-validates the asymmetric probe +
    // collapse machinery against the independently-computed full op.
    val pairs = SparkEntry.queries("llm_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val newIds = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ % 100 >= 80).toSet
    val got = SparkEntry.queries("llm_minhash_lsh_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toList
    assert(got.map(_._1).toSet == newIds, "one verdict per new doc")
    got.foreach { case (n, stage, dupOf) =>
      val admissible = adj.getOrElse(n, Set.empty)
        .filter(c => !newIds.contains(c) || c < n)
      val expected = if (admissible.isEmpty) None else Some(admissible.min)
      assert(dupOf == expected, s"doc $n: dup_of=$dupOf expected=$expected")
      assert(stage == (if (expected.isEmpty) "kept" else "band_dup"))
    }
    assert(got.exists(_._2 == "band_dup"), "fixture has no band dups?")
  }

  test("minhash persisted verdicts = full LSH pair set below each batch doc") {
    // Under the id-ordered split every existing doc is admissible, so
    // the persisted op's contract collapses to: for each batch doc n
    // (doc_id >= thr), dup_of = min{c : {c, n} in the full band-pair
    // set, c < n}. Cross-validates the staged-index probe (rep-only
    // existing side, member-expanded batch side) against the
    // independently-computed full op.
    val thr = operators.LlmOps.epochThreshold(spark, sf)
    val pairs = SparkEntry.queries("llm_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val batchIds = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).filter(_ >= thr).toSet
    val got = SparkEntry.queries("llm_minhash_lsh_persisted")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toList
    assert(got.map(_._1).toSet == batchIds, "one verdict per batch doc")
    got.foreach { case (n, stage, dupOf) =>
      val admissible = adj.getOrElse(n, Set.empty).filter(_ < n)
      val expected = if (admissible.isEmpty) None else Some(admissible.min)
      assert(dupOf == expected, s"doc $n: dup_of=$dupOf expected=$expected")
      assert(stage == (if (expected.isEmpty) "kept" else "band_dup"))
    }
    assert(got.exists(_._2 == "band_dup"), "fixture has no band dups?")
  }

  test("hll_merge two-phase estimate == single-pass estimate, within 5% of exact") {
    import graft.Tables
    val exact = SparkEntry.queries("agg_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = SparkEntry.queries("agg_hll_merge")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // Merge invariance: union of daily sketches = one sketch over all days.
    val single = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == merged.keySet)
    merged.foreach { case (k, m) =>
      assert(m == single(k), s"$k: merged=$m single-pass=${single(k)}")
      assert(math.abs(m - exact(k)).toDouble / exact(k) <= 0.05,
        s"$k: sketch=$m exact=${exact(k)} off by >5%")
    }
  }

  test("topk_global is the true global top-100") {
    val got = SparkEntry.queries("topk_global")(spark, sf).collect()
    assert(got.length == 100)
    val maxPrice = Tables.lineitem(spark, sf)
      .agg(max(col("l_extendedprice"))).head().getDouble(0)
    assert(got.head.getDouble(2) === maxPrice)
    assert(got.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("pattern_strict: only the IMMEDIATELY next event can match (next() vs followedBy)") {
    import spark.implicits._
    val m = 60L * 1000000000L // one minute in ns
    val t0 = 1700000000000000000L
    // u1: signup, error, click   -> strict FAILS (followedBy would match)
    // u2: signup, click (30 min) -> match
    // u3: signup, click (2 h)    -> out of window
    // u4: signup, signup, click  -> first blocked by second signup;
    //                               second matches
    val dir = java.nio.file.Files.createTempDirectory("graft_strict_")
    Seq(
      (1L, t0, 101L, "signup"), (2L, t0 + 10 * m, 101L, "error"),
      (3L, t0 + 20 * m, 101L, "click"),
      (4L, t0, 102L, "signup"), (5L, t0 + 30 * m, 102L, "click"),
      (6L, t0, 103L, "signup"), (7L, t0 + 120 * m, 103L, "click"),
      (8L, t0, 104L, "signup"), (9L, t0 + 5 * m, 104L, "signup"),
      (10L, t0 + 6 * m, 104L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("events_pattern_strict")(spark, dir.toString)
      .collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    assert(got == Map(1L -> -1L, 4L -> 5L, 6L -> -1L, 8L -> -1L, 9L -> 10L))
  }

  test("pattern_until: B* counts to the FIRST C, later events ignored, open pattern null") {
    import spark.implicits._
    val m = 60L * 1000000000L // one minute in ns
    val t0 = 1700000000000000000L
    // u1: signup, 2 clicks, purchase, then MORE clicks + a purchase —
    //     count stops at the first purchase (b_count = 2);
    // u2: signup, clicks, NO purchase -> open pattern, null count;
    // u3: purchase 2 h after signup still closes (no time window).
    val dir = java.nio.file.Files.createTempDirectory("graft_until_")
    Seq(
      (1L, t0, 101L, "signup"), (2L, t0 + 5 * m, 101L, "click"),
      (3L, t0 + 10 * m, 101L, "click"), (4L, t0 + 15 * m, 101L, "purchase"),
      (5L, t0 + 20 * m, 101L, "click"), (6L, t0 + 25 * m, 101L, "purchase"),
      (7L, t0, 102L, "signup"), (8L, t0 + 5 * m, 102L, "click"),
      (9L, t0, 103L, "signup"), (10L, t0 + 120 * m, 103L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("events_pattern_until")(spark, dir.toString)
      .collect()
      .map(r => r.getLong(1) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)),
          (if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((4L, 2L)),   // closed by purchase 4, two clicks before it
      7L -> ((-1L, -1L)), // open: no purchase ever
      9L -> ((10L, 0L))), // closes beyond 1 h — until() has no window
      s"until verdicts wrong: $got")
  }

  test("csv/json round-trips carry the events table losslessly") {
    val base = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        expr("bit_xor(event_id)").as("id_xor"),
        expr("bit_xor(ts div 1000)").as("ts_us_xor"),
        sum(length(col("props"))).as("props_len_sum"),
        sum(Tables.dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    for (q <- Seq("source_csv_roundtrip", "source_json_roundtrip")) {
      val got = SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toSeq
      assert(got == base, s"$q drifted from the parquet original")
    }
  }

  test("join_bucketed equals the plain shuffle join it replaces") {
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment")).collect().map(_.toSeq).toSeq
    val got = SparkEntry.queries("join_bucketed")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got == plain)
  }

  test("top_paths returns <= 10 trigrams in (count desc, path) order") {
    val got = SparkEntry.queries("events_top_paths")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 10)
    val pairs = got.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sliding(2).forall {
      case Array((c1, p1), (c2, p2)) => c1 > c2 || (c1 == c2 && p1 < p2)
      case _ => true
    })
  }

  test("llm_dedup_keep_best: exactly one keeper per cluster, and it is " +
      "the quality argmax with min-id ties") {
    val rows = SparkEntry.queries("llm_dedup_keep_best")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      val keepers = ms.filter(_._4)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val best = ms.minBy(m => (-m._3, m._1))
      assert(keepers.head._1 == best._1,
        s"cluster $cid kept ${keepers.head._1}, argmax is ${best._1}")
    }
    // the corpus must exercise a non-trivial cluster (else the argmax
    // path is untested)
    assert(byCluster.exists(_._2.length > 1),
      "no multi-member duplicate cluster at test SF")
  }

  test("graph_pagerank is bit-identical across shuffle partitionings (D2)") {
    // The integer micro-unit + floor-division claim: the 10-iteration
    // rank vector must not depend on how partial sums associate. Run
    // the op under two different shuffle widths and require EXACT
    // equality — a double-accumulation PageRank fails this.
    def run(): Seq[(Long, Long)] =
      SparkEntry.queries("graph_pagerank")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = run()
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      run()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b, s"rank vector drifted with partitioning:\n $a\n vs $b")
    assert(a.nonEmpty && a.forall(_._2 > 0L))
  }

  test("graph_connected_components: converged labels are edge-consistent " +
      "and equal the oracle's 8-round unroll") {
    // Round-8: the op iterates until no label changes (scale-correct
    // CC) while the DuckDB oracle still unrolls 8 fixed rounds — parity
    // holds iff 8 rounds ARE the fixpoint on this corpus, so pin that
    // directly: the registered (converged) output must equal an 8-round
    // fixed unroll of the same round function. If the corpus ever grows
    // a component with min-label radius > 8 this fails, telling us to
    // raise the oracle's unroll.
    val comp = SparkEntry.queries("graph_connected_components")(spark, sf)
    val (edges8, lbl0) = operators.Relational.ccLayout(spark, sf)
    val unrolled = operators.GraphLoop.iterate(lbl0, 8)(
      l => operators.Relational.ccRound(edges8, l))
    operators.GraphLoop.release(edges8)
    assert(comp.orderBy(col("node")).collect().toSeq ==
      unrolled.orderBy(col("node")).collect().toSeq,
      "converged output diverges from the oracle's 8-round unroll")
    val e0 = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).filter(col("l_quantity") >= 48)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("u"),
        (col("l_suppkey") + lit(1000000000000L)).as("v"))
      .distinct()
    val inconsistent = e0
      .join(comp.select(col("node").as("u"), col("comp").as("cu")), Seq("u"))
      .join(comp.select(col("node").as("v"), col("comp").as("cv")), Seq("v"))
      .filter(col("cu") =!= col("cv"))
    assert(inconsistent.isEmpty,
      s"unconverged edges: ${inconsistent.count()}")
    // and labels are genuine component minima: every label is a node id
    // ≤ all nodes carrying it
    val badMin = comp.groupBy(col("comp")).agg(min(col("node")).as("mn"))
      .filter(col("comp") =!= col("mn"))
    assert(badMin.isEmpty, "a component label is not its min node id")
  }

  test("GraphLoop: pointer-jump fallback converges a diameter > cap " +
      "path graph (round-9 cap handoff)") {
    // A 300-node path has min-label radius 299: plain propagation under
    // a 4-round cap CANNOT converge (the flag must say so), and the
    // hookAndJump finisher the registered cc query hands off to must
    // still reach the true fixpoint — every node labeled 0 — in
    // O(log d) hooks. This is the scale story for the 64-round cap on
    // graph_connected_components: a capped run no longer returns
    // non-fixpoint labels on any diameter.
    import spark.implicits._
    val n = 300L
    val pairs = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val sym = operators.GraphLoop.symmetrize(pairs, "a", "b")
    val loops = sym.select(col("src")).distinct()
      .select(col("src"), col("src").as("dst"))
    val edges = operators.GraphLoop.pin(sym.unionAll(loops))
    val lbl0 = operators.GraphLoop.nodesOf(edges)
      .withColumn("comp", col("node")).localCheckpoint()
    val (capped, converged) = operators.GraphLoop.iterateMonotone(
      lbl0, 4, "comp")(l => operators.Relational.ccRound(edges, l))
    assert(!converged, "a 4-round cap cannot converge diameter 299")
    val fin = operators.GraphLoop.hookAndJump(capped, "comp")(
      l => operators.Relational.ccRound(edges, l))
    operators.GraphLoop.release(edges)
    val labels = fin.select(col("comp")).distinct()
      .as[Long].collect().toSeq
    assert(labels == Seq(0L),
      s"path graph should collapse to component 0, got $labels")
    assert(fin.count() == n, "fallback lost or duplicated nodes")
  }

  test("GraphLoop: jumpClosure throws on a label cycle instead of hanging") {
    // Round-10 ADVICE fix: jumpClosure's termination rests on the
    // documented forest precondition (label(v) <= v, labels are node
    // keys). A 2-cycle self-resolves (label(label(v)) = v), but a
    // 3-cycle 0→1→2→0 oscillates with period 2 forever; the round cap
    // must convert that spin into a loud precondition failure.
    val cyclic = spark.range(3)
      .select(col("id").as("node"), ((col("id") + 1) % 3).as("comp"))
    val e = intercept[IllegalArgumentException] {
      operators.GraphLoop.jumpClosure(cyclic, "comp", maxRounds = 6)
        .collect()
    }
    assert(e.getMessage.contains("6 rounds"), e.getMessage)
  }

  test("GraphLoop: empty state converges immediately (null metric)") {
    // Round-9 ADVICE fix: a null per-round sum (empty graph) used to
    // read as "still moving" and burn all maxRounds on no-op rounds.
    val empty = spark.range(0)
      .select(col("id").as("node"), col("id").as("comp"))
    val (_, converged) = operators.GraphLoop.iterateMonotone(
      empty, 64, "comp")(l => l)
    assert(converged, "empty state must report converged")
  }
}
