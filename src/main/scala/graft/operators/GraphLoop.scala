package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The iterative-graph loop discipline, factored once (round-8): both
  * `graph_pagerank` (sum-flow) and `graph_connected_components`
  * (min-label) had re-implemented the same four load-bearing choices
  * inline, and only pagerank's copy was plan-asserted. The discipline:
  *
  *  1. SYMMETRIZE the directed pair table into (src, dst) rows so every
  *     propagation is expressible as "aggregate incoming messages on
  *     dst" — one union, no per-round direction handling.
  *  2. PIN the loop-invariant edge table with `repartition(dst).persist()`
  *     + a materializing count — persist, NOT localCheckpoint: a
  *     checkpoint rewrites the plan to a Scan ExistingRDD whose
  *     partitioning is UNKNOWN to Catalyst, so every round would
  *     re-shuffle its (map-side-combined) messages to satisfy the dst
  *     aggregation. The cached plan keeps hashpartitioning(dst) visible
  *     (`canChangeCachedPlanOutputPartitioning` defaults false), so
  *     per-round aggs run with the partitioning in place — zero
  *     exchanges inside the loop (PlanShapeSpec asserts one round of
  *     BOTH ops).
  *  3. CUT every round with `localCheckpoint()` — the next round
  *     broadcasts the state table, and a broadcast build evaluates its
  *     subtree eagerly, so an un-cut round would replay the previous
  *     round's join inside this round's broadcast job (iteration k
  *     replaying the whole DAG k times). The state is node-cardinality —
  *     the cheap side to materialize.
  *  4. RELEASE the pinned edge cache once the loop ends: every round's
  *     state is checkpointed (lineage severed), so the final result
  *     never re-reads the cache — leaving it resident just pins executor
  *     storage for the rest of the session (measured as cross-query
  *     bench interference in the round-7 sweep).
  *
  * Per-round cost is O(nodes) bytes (the broadcast state + the combined
  * messages) however many edges exist — the Pregel message-combining
  * shape. At node counts beyond the broadcast threshold a deployment
  * drops the `broadcast()` hint inside its round function and the same
  * plan shuffles state instead (one node-sized exchange per round —
  * still never the edges).
  */
object GraphLoop {

  /** Undirect a pair table: (a, b) → rows (src=a, dst=b) ∪ (src=b,
    * dst=a). Propagations then only ever aggregate on dst. */
  def symmetrize(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionAll(pairs.select(col(b).as("src"), col(a).as("dst")))

  /** Pin the loop-invariant edge table: dst-partitioned, persisted,
    * materialized (the loop reads it every round; an unmaterialized
    * cache would race the first round's two reads). Callers MUST pair
    * with [[release]] after the loop's last checkpoint. */
  def pin(edges: DataFrame): DataFrame = {
    val e = edges.repartition(col("dst")).persist()
    e.count()
    e
  }

  /** Drop the pinned edge cache. Safe immediately after the loop: every
    * round's output is localCheckpointed, so no surviving lineage reads
    * the cache. Non-blocking — the freed blocks are not on any timing
    * path, and a blocking drop would stall the caller on executor RPC. */
  def release(edges: DataFrame): Unit =
    edges.unpersist(blocking = false)

  /** The node table: distinct src of the symmetrized edges (every node
    * appears as a src exactly because the table is symmetric). */
  def nodesOf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).distinct().localCheckpoint()

  /** Fixed-round iteration (power-iteration shape: the round count IS
    * the semantics, e.g. pagerank's 10 damped rounds). Round states
    * are LAZY localCheckpoints (r16): the next round's broadcast build
    * is each state's one materializing consumer, so an eager cut paid
    * a separate job per round for the identical lineage truncation —
    * the BpeOps merge-loop argument. */
  def iterate(init: DataFrame, rounds: Int)(
      round: DataFrame => DataFrame): DataFrame = {
    var state = init
    for (_ <- 1 to rounds) state = round(state).localCheckpoint(false)
    state
  }

  /** Exact decimal sum of `metricCol` — the monotone convergence probe.
    * decimal(38,0) keeps the sum exact at any node count × id magnitude
    * (a bigint sum overflows near 10¹⁹). Null on an empty state. */
  private def metricSum(state: DataFrame, metricCol: String)
      : java.math.BigDecimal =
    state.agg(sum(col(metricCol).cast("decimal(38,0)"))).head().getDecimal(0)

  /** Iterate until a fixpoint, detected through a MONOTONE state
    * metric: `metricCol` must be non-increasing per row across rounds
    * (min-label propagation's labels are), so the exact decimal sum is
    * strictly decreasing until — and only until — the fixpoint, and one
    * sum-equality test per round IS the no-row-changed test without
    * joining consecutive states. The per-round probe is one driver-side
    * scalar off the just-checkpointed node-cardinality state — the same
    * O(1)-row driver-read class as the adaptive-collapse prechecks, and
    * the price of being scale-correct: a fixed unroll is only true
    * convergence when every component's radius fits the unroll.
    * Detection costs one trailing no-change round (the round that
    * proves the sum stopped moving), exactly like a changed-flag loop.
    * A null metric (empty state) is converged outright — there is
    * nothing left to move, and treating null as "still moving" would
    * burn all maxRounds on no-op rounds over zero rows.
    * `maxRounds` bounds propagation-radius pathologies (a path graph
    * converges in O(diameter) rounds). Returns (state, converged);
    * converged=false means the cap hit while the sum was still
    * decreasing and the labels are NOT a fixpoint — the caller must
    * either raise the cap or hand the state to [[hookAndJump]], whose
    * pointer-jumping rounds finish any diameter in O(log d) hooks. */
  def iterateMonotone(init: DataFrame, maxRounds: Int,
      metricCol: String)(round: DataFrame => DataFrame)
      : (DataFrame, Boolean) = {
    var state = init
    var prev: java.math.BigDecimal = null
    var rounds = 0
    var moving = true
    while (moving && rounds < maxRounds) {
      // lazy cut (r16): the metric probe right below is the state's
      // first consumer and materializes the checkpoint inside its own
      // job — one job per round instead of two
      val next = round(state).localCheckpoint(false)
      val m = metricSum(next, metricCol)
      moving = m != null && (prev == null || m.compareTo(prev) != 0)
      prev = m
      state = next
      rounds += 1
    }
    (state, !moving)
  }

  /** Pointer-jump a (node, `labelCol`) state to its forest closure:
    * label(v) ← label(label(v)) per round until nothing changes. Sound
    * whenever every label value is either a node key of the state with
    * label(v) ≤ v (min-propagation states are: labels are node ids, min
    * includes self) or a TERMINAL value that is not a node key — the
    * left join leaves those unchanged, so they behave as roots (the
    * persisted-epoch closure uses this: prior cluster ids are terminal
    * labels of the batch-only state). The label map is then a forest of
    * parent pointers and each round halves every path to its root, so
    * closure lands in O(log depth) rounds however deep the capped
    * propagation left the trees. Same jump-and-flag-in-one-join shape as the dedup-cluster
    * closure (LlmOps.dedupClusters), restated here over the graph-loop
    * state schema. Guarded: a caller violating the precondition with a
    * label CYCLE (e.g. a↔b) would otherwise hang the driver, so the
    * loop throws after `maxRounds` (default 64 — a genuine forest of
    * 2^64 depth is unreachable), so cap-hit always means bad input,
    * loudly. */
  def jumpClosure(state: DataFrame, labelCol: String,
      maxRounds: Int = 64): DataFrame = {
    var cur = state.localCheckpoint()
    var done = false
    var rounds = 0
    while (!done) {
      require(rounds < maxRounds,
        s"jumpClosure did not converge in $maxRounds rounds: '$labelCol' " +
          "is not a forest (label cycle, or labels that are not node " +
          "keys) — the precondition is label(v) <= v with every label " +
          "a node key")
      rounds += 1
      val parents = cur.select(col("node").as("p_node"),
        col(labelCol).as("p_lbl"))
      val next = cur.join(parents, col(labelCol) === col("p_node"), "left")
        .select(col("node"),
          coalesce(col("p_lbl"), col(labelCol)).as(labelCol),
          (col("p_lbl").isNotNull && col("p_lbl") =!= col(labelCol))
            .as("changed"))
        .localCheckpoint(false) // materialized by the isEmpty probe
      done = next.filter(col("changed")).isEmpty
      cur = next.select(col("node"), col(labelCol))
    }
    cur
  }

  /** The log-diameter finisher [[iterateMonotone]]'s cap hands off to:
    * alternate one `hook` round (pull neighbor minima — e.g.
    * Relational.ccRound) with a full [[jumpClosure]] (collapse the
    * resulting parent forest to its roots) until the monotone sum stops
    * moving. After a closure every node carries its tree's root label,
    * so each hook merges adjacent TREES rather than adjacent nodes —
    * the Shiloach–Vishkin hook/shortcut alternation, converging in
    * O(log d) hooks on any diameter-d graph instead of O(d) plain
    * propagation rounds. No cap needed: each hook that changes nothing
    * proves the fixpoint (adjacent nodes all share labels), and one
    * that changes anything strictly decreases the exact sum. */
  def hookAndJump(init: DataFrame, metricCol: String)(
      hook: DataFrame => DataFrame): DataFrame = {
    var state = jumpClosure(init, metricCol)
    var prev = metricSum(state, metricCol)
    var moving = prev != null
    while (moving) {
      // lazy: jumpClosure's own first cut is the single materializing
      // consumer of the hook round's output
      val next = jumpClosure(hook(state).localCheckpoint(false), metricCol)
      val m = metricSum(next, metricCol)
      moving = m != null && m.compareTo(prev) != 0
      prev = m
      state = next
    }
    state
  }
}
