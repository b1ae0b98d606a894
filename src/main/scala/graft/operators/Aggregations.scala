package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.D aggregations beyond the flagship (SURVEY.md §2.1 D).
  *
  * Scale posture: every aggregate here is a partial+final hash aggregate —
  * map-side combine happens before the shuffle, so the shuffle volume is
  * O(groups), not O(rows). `agg_count_distinct` shuffles by
  * (event_type, user_id) first (Spark's two-phase exact distinct);
  * `agg_approx_distinct` replaces that with a mergeable HLL sketch — the
  * 100 TB answer when exactness isn't required.
  */
object Aggregations {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "agg_global" -> ((s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))),

    "agg_count_distinct" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))),

    // Approximate (HLL) — deterministic for fixed input but not
    // SQL-reproducible in DuckDB: rows-only check + ScalaTest ±5% bound.
    "agg_approx_distinct" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy(col("event_type"))),

    // Mergeable-sketch rollup (round-5 add): distinct users per event
    // type computed in TWO phases — a Datasketches HLL sketch per
    // (event_type, day), then hll_union_agg over the daily sketches —
    // the pre-aggregated-rollup shape of a 100 TB deployment, where
    // daily sketch tables are tiny, persistable, and re-unionable into
    // any date range without rescanning the raw corpus. Union-merge is
    // exact over sketches: the two-phase estimate IS the single-pass
    // estimate (asserted in ScalaTest, with a ±5%-of-exact bound).
    // Approximate ⇒ no DuckDB oracle (rows-only + ScalaTest).
    "agg_hll_merge" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), to_date(col("ts_utc")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("users_est"))
        .orderBy(col("event_type"))
    }),

    "agg_rollup" -> ((s, d) =>
      orders(s, d)
        .select(year(col("o_orderdate")).cast("int").as("o_year"),
          col("o_orderpriority"), col("o_totalprice"))
        .rollup(col("o_year"), col("o_orderpriority"))
        .agg(grouping(col("o_year")).cast("int").as("g_year"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("g_year"), col("g_prio"),
          asc_nulls_first("o_year"), asc_nulls_first("o_orderpriority"))),

    "agg_cube" -> ((s, d) =>
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("g_status"), col("g_prio"),
          asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))),

    // Exact interpolated percentiles (sort-based inside the aggregate, so
    // the result is partition-order independent even though the output is
    // double; rounded to 6 dp on both sides). The 100 TB variant swaps in
    // approx_percentile's mergeable sketch, mirroring agg_approx_distinct.
    "agg_percentile" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(expr("percentile(value, 0.9D)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // The mergeable-sketch percentile (KLL-style): one pass, bounded
    // memory per group, sketches merge associatively across partitions —
    // the 100 TB form of agg_percentile. Approximate ⇒ no oracle;
    // ScalaTest bounds it against the exact op.
    "agg_approx_percentile" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, 0.5, 10000)").as("p50"),
          expr("approx_percentile(value, 0.9, 10000)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // Dispersion statistics computed from exact decimal moments (D2):
    // sum(x) and sum(x²) accumulate as DECIMAL(38,6) — associative, so
    // partition order can't drift them — and only the final
    // variance/stddev arithmetic runs in double, as the identical
    // expression on both engines.
    "agg_stats_exact" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sx"),
          sum(dec(col("l_quantity") * col("l_quantity"))).cast("double")
            .as("sxx"))
        .select(col("l_returnflag"), col("n"),
          round(col("sx") / col("n"), 6).as("mean_qty"),
          // n=1 guard: Spark's double 0/0 is NaN while DuckDB's default
          // (ieee_floating_point_ops) also yields NaN/inf but not always
          // identically — both sides agree on NULL for degenerate groups
          // (when() here, NULLIF(n-1,0) in the oracle).
          when(col("n") > 1,
            round((col("sxx") - col("sx") * col("sx") / col("n")) /
              (col("n") - 1), 6)).as("var_qty"),
          when(col("n") > 1,
            round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
              (col("n") - 1)), 6)).as("stddev_qty"))
        .orderBy(col("l_returnflag"))),

    // Sample covariance + Pearson correlation of quantity vs extended
    // price per return flag (round-5 add) — the bivariate half of the
    // exact-stats story. Round-6 accumulation rework (same outputs):
    // instead of five double→DECIMAL(38,6) casts PER ROW (BigDecimal
    // materialization was the measured 2–5× cost vs neighbor aggs),
    // each row converts ONCE per column to integer micro-units —
    // quantity is integral (1..50) so `BIGINT` is exact; price has 2
    // decimals so cents (`DECIMAL(38,6) * 100 → BIGINT`, the ts_zscore
    // discipline) are exact — and every moment is a LONG product.
    // Long sums where the bound proves no overflow at any real scale
    // (Σq ≤ 50n, Σq² ≤ 2500n → safe past 10^15 rows); DECIMAL(38,0)
    // sums for the cents moments (Σpc² ≈ 10^14·n would wrap a long by
    // ~10^5 rows per partition — the decimal sum stays compact-long
    // inside Spark until it actually exceeds 10^18, so it costs ~long
    // adds). The double finish divides the micro-unit sums back
    // (/100, /10⁴) and is the IDENTICAL expression DuckDB evaluates
    // (D2: every sum is exact integer arithmetic, order-independent);
    // built-in corr()/covar_samp() would accumulate doubles in
    // partition order AND differ in formulation. n=1 groups → NULL.
    "agg_corr_covar" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_returnflag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 100" +
            " AS BIGINT)").as("pc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).cast("double").as("sx"),
          (sum(expr("CAST(pc AS DECIMAL(38,0))")).cast("double") /
            lit(100.0)).as("sy"),
          (sum(expr("CAST(q * pc AS DECIMAL(38,0))")).cast("double") /
            lit(100.0)).as("sxy"),
          sum(col("q") * col("q")).cast("double").as("sxx"),
          (sum(expr("CAST(pc * pc AS DECIMAL(38,0))")).cast("double") /
            lit(10000.0)).as("syy"))
        .select(col("l_returnflag"), col("n"),
          when(col("n") > 1,
            round((col("sxy") - col("sx") * col("sy") / col("n")) /
              (col("n") - 1), 6)).as("covar_qty_price"),
          when(col("n") > 1,
            round((col("sxy") - col("sx") * col("sy") / col("n")) /
              (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
                sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6))
            .as("corr_qty_price"))
        .orderBy(col("l_returnflag"))),

    // Ordinary-least-squares aggregate (round-5 add): slope / intercept /
    // R² of extended price on quantity per return flag, from the SAME
    // five micro-unit moment sums as agg_corr_covar (round-6: integer
    // accumulation, see that op's rationale) — built-in regr_slope/
    // regr_intercept would accumulate doubles in partition order (D2).
    // The double finish runs on the reduced aggregates only and is the
    // identical expression both engines evaluate; degenerate groups
    // (n<2 or zero x-variance) → NULL.
    "agg_regression" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_returnflag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 100" +
            " AS BIGINT)").as("pc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).cast("double").as("sx"),
          (sum(expr("CAST(pc AS DECIMAL(38,0))")).cast("double") /
            lit(100.0)).as("sy"),
          (sum(expr("CAST(q * pc AS DECIMAL(38,0))")).cast("double") /
            lit(100.0)).as("sxy"),
          sum(col("q") * col("q")).cast("double").as("sxx"),
          (sum(expr("CAST(pc * pc AS DECIMAL(38,0))")).cast("double") /
            lit(10000.0)).as("syy"))
        .select(col("l_returnflag"), col("n"),
          when(col("n") > 1 &&
              col("sxx") - col("sx") * col("sx") / col("n") =!= 0.0,
            round((col("sxy") - col("sx") * col("sy") / col("n")) /
              (col("sxx") - col("sx") * col("sx") / col("n")), 6))
            .as("slope"),
          when(col("n") > 1 &&
              col("sxx") - col("sx") * col("sx") / col("n") =!= 0.0,
            round(col("sy") / col("n") -
              ((col("sxy") - col("sx") * col("sy") / col("n")) /
                (col("sxx") - col("sx") * col("sx") / col("n"))) *
                (col("sx") / col("n")), 6))
            .as("intercept"),
          when(col("n") > 1 &&
              col("sxx") - col("sx") * col("sx") / col("n") =!= 0.0 &&
              col("syy") - col("sy") * col("sy") / col("n") =!= 0.0,
            round((col("sxy") - col("sx") * col("sy") / col("n")) *
              (col("sxy") - col("sx") * col("sy") / col("n")) /
              ((col("sxx") - col("sx") * col("sx") / col("n")) *
                (col("syy") - col("sy") * col("sy") / col("n"))), 6))
            .as("r2"))
        .orderBy(col("l_returnflag"))),

    // Exact higher-moment aggregate (round-5 add): population skewness /
    // excess kurtosis of l_quantity per return flag, from FOUR integer
    // moment sums (round-6 rework, same outputs: l_quantity is integral
    // 1..50, so q..q⁴ are exact LONG products per row — no per-row
    // decimal materialization). s1/s2 sum as longs (bounds 50n / 2500n:
    // overflow-safe past 10^15 rows); s3/s4 as DECIMAL(38,0) (q⁴ ≤
    // 6.25·10⁶ per row would wrap a long near 10^12 rows — the 100 TB
    // regime). D2 holds: every sum is exact integer arithmetic,
    // order-independent; the double finish runs on the reduced
    // aggregates only and is the identical expression DuckDB evaluates.
    // Built-in skewness()/kurtosis() would accumulate doubles in
    // partition order — the same D2 rationale as agg_corr_covar. One
    // partial+final hash agg, 5-row result.
    "agg_skew_kurt" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_returnflag"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("q")).cast("double").as("s1"),
          sum(col("q") * col("q")).cast("double").as("s2"),
          sum(expr("CAST(q * q * q AS DECIMAL(38,0))"))
            .cast("double").as("s3"),
          sum(expr("CAST(q * q * q * q AS DECIMAL(38,0))"))
            .cast("double").as("s4"))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("m2",
          col("s2") / col("n") - col("mean") * col("mean"))
        .withColumn("m3",
          col("s3") / col("n") -
            lit(3.0) * col("mean") * (col("s2") / col("n")) +
            lit(2.0) * col("mean") * col("mean") * col("mean"))
        .withColumn("m4",
          col("s4") / col("n") -
            lit(4.0) * col("mean") * (col("s3") / col("n")) +
            lit(6.0) * col("mean") * col("mean") * (col("s2") / col("n")) -
            lit(3.0) * col("mean") * col("mean") * col("mean") *
              col("mean"))
        .select(col("l_returnflag"), col("n"),
          when(col("n") > 1 && col("m2") > 0,
            round(col("m3") / (sqrt(col("m2")) * col("m2")), 6))
            .as("skewness_qty"),
          when(col("n") > 1 && col("m2") > 0,
            round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6))
            .as("kurtosis_qty"))
        .orderBy(col("l_returnflag"))),

    // Exact weighted median (round-5 add): the price-weighted median
    // quantity per return flag — order rows by quantity, take the first
    // quantity whose cumulative weight reaches half the total. Both the
    // cumulative and total weights are DECIMAL sums (D2) and the
    // half-crossing test is the decimal cross-multiplication
    // 2·cum ≥ tot (no division, no double). The crossing QUANTITY is
    // invariant to intra-tie ordering (any tie permutation crosses
    // within the same quantity group), so the result is deterministic
    // without a unique-key tie-break. One partition-keyed sort window +
    // tiny final agg.
    "agg_weighted_median" -> ((s, d) => {
      val wc = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("l_returnflag"))
      lineitem(s, d)
        .withColumn("cum", sum(dec(col("l_extendedprice"))).over(wc))
        .withColumn("tot", sum(dec(col("l_extendedprice"))).over(wt))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("weighted_median_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Shannon entropy of each event type's hour-of-day distribution
    // (round-5 add): how concentrated in the day a given event type is.
    // Float discipline is llm_ngram_lm's fixed-point idiom: each hour
    // bucket's ln(p) rounds to integer micro-nats ONCE, the per-type
    // accumulation is exact long arithmetic (partition-order
    // independent), and the finish is one round-half-up integer
    // division — no double summation anywhere.
    "agg_entropy" -> ((s, d) => {
      val hc = events(s, d)
        .groupBy(col("event_type"), hour(col("ts_utc")).as("hr"))
        .agg(count(lit(1)).as("ni"))
        .withColumn("n",
          sum(col("ni")).over(Window.partitionBy(col("event_type"))))
        .withColumn("lpm",
          round(log(col("ni").cast("double") / col("n")) * 1e6, 0)
            .cast("long"))
      hc.groupBy(col("event_type"))
        .agg(max(col("n")).as("n"), count(lit(1)).as("n_hours"),
          (-sum(col("ni") * col("lpm"))).as("p"))
        .select(col("event_type"), col("n"), col("n_hours"),
          (expr("(2 * p + n) div (2 * n)") / lit(1e6)).as("h_nats"))
        .orderBy(col("event_type"))
    }),

    // Equi-width histogram (round-5 add): per event type, `value`
    // bucketed into 20 equal-width bins over the GLOBAL [min, max] —
    // the distribution-profile aggregate of every metrics/EDA stack.
    // Scale shape: the bounds are a 1-row aggregate broadcast back over
    // the corpus (the scalar-bounds pattern — agg_heavy_hitters), the
    // histogram itself is one partial+final hash agg into ≤ |types|·20
    // cells. Exactness: the bucket index and both edges are PURE
    // INTEGER arithmetic on micro-unit longs — ((v−mn)·20) div
    // (mx−mn+1) — no IEEE op anywhere (a double-width bucket formula
    // can put a value on the wrong side of an edge; integers cannot).
    "agg_histogram" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_type"),
          (dec(col("value")) * 1000000).cast("long").as("v_us"))
      val bounds = ev.agg(min(col("v_us")).as("mn"),
        max(col("v_us")).as("mx"))
      ev.crossJoin(broadcast(bounds))
        .groupBy(col("event_type"),
          expr("((v_us - mn) * 20) div (mx - mn + 1)").as("bucket"),
          col("mn"), col("mx"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("event_type"), col("bucket"),
          (expr("CAST(mn + (bucket * (mx - mn + 1)) div 20 AS DOUBLE)")
            / lit(1e6)).as("lo"),
          (expr("CAST(mn + ((bucket + 1) * (mx - mn + 1)) div 20" +
            " AS DOUBLE)") / lit(1e6)).as("hi"),
          col("cnt"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    "agg_having" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("spend"))
        .filter(col("n_orders") > 12)
        .orderBy(col("o_custkey"))),

    // Collect-to-list aggregation (round-2 add): the segment list per
    // nation — collect_list is partition-order dependent, so the output
    // canonicalizes via array_sort before the join (and serializes, since
    // arrays are unhashable in the driver comparator). The DuckDB mirror
    // is string_agg with an explicit ORDER BY.
    "agg_collect_sorted" -> ((s, d) =>
      customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",")
          .as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
        .orderBy(col("c_nationkey"))),

    // argmax/argmin aggregates (round-2 add): the order with the
    // highest/lowest price per priority class. The ordering key is a
    // collision-free BIGINT — cents × 10^10 + orderkey — because ties on
    // price alone would let the two engines pick different rows (DuckDB
    // 1.0's max_by accepts no struct ordering key, so the tie-break is
    // packed numerically). Bounds: TPC-H o_totalprice < ~6e5 ⇒ cents
    // < 6e7, so cents × 10^10 < 6e17 < 2^63; orderkey ≈ 6M × SF stays
    // below the 10^10 slot up to SF ≈ 1600 (past that, widen the packing
    // or switch to a struct key on an engine that supports one).
    "agg_maxby_minby" -> ((s, d) => {
      val key = (round(col("o_totalprice") * 100).cast("bigint") *
        lit(10000000000L) + col("o_orderkey"))
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(max_by(col("o_orderkey"), key).as("priciest_order"),
          min_by(col("o_orderkey"), key).as("cheapest_order"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // Arbitrary GROUPING SETS (beyond rollup/cube's fixed lattices) —
    // exercised through the spark.sql surface since the DataFrame API has
    // no grouping-sets builder: the library's queries are equally usable
    // as registered views + ANSI SQL text (round-2 add).
    "agg_grouping_sets" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS cnt,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_price
        FROM graft_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio,
                 o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")
    }),

    "agg_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // Spark pivot yields NULL for absent (user, type) combos; the oracle's
      // count(CASE ...) yields 0 — align on 0.
      pivoted.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    }),

    // Exact heavy hitters (round-4 add): users generating ≥ 1.2× the mean
    // event volume (this corpus is near-uniform — verified: 2× matches
    // zero keys at every SF; 1.2× keeps 1/13/104) — the skewed-key
    // detector you run BEFORE a big join to decide which keys need
    // salting (SkewJoin.scala). All-integer comparison
    // (cnt × n_users × 10 ≥ 12 × total) so no double average can
    // flip a boundary key. Plan: one partial+final hash agg over events
    // (shuffle carries one (user, cnt) row per user), then the two
    // global scalars arrive via a broadcast cross join — no second pass
    // over the fact table, no driver collect.
    "agg_heavy_hitters" -> ((s, d) => {
      val perUser = events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val totals = perUser.agg(
        sum(col("cnt")).as("total"), count(lit(1)).as("n_users"))
      perUser.crossJoin(broadcast(totals))
        .filter(col("cnt") * col("n_users") * lit(10) >= lit(12) * col("total"))
        .select(col("user_id"), col("cnt"))
        .orderBy(col("user_id"))
    }),

    // Per-group mode with a DETERMINISTIC tie-break (round-4 add): the
    // modal event_type per user; ties (common at ~13 events per
    // (user, type)) resolve to the lexicographically smallest type, so
    // both engines pick the same row — a bare mode() would be
    // engine-defined on ties. Plan: partial+final hash agg to
    // (user, type, cnt), then one window shuffle on user_id.
    "agg_mode" -> ((s, d) => {
      // r16 note: a min_by(struct) rewrite was tried and REVERTED —
      // struct agg buffers fall back to SortAggregate, while the rank-1
      // window compiles to WindowGroupLimit (top-1 pruned on both sides
      // of the exchange); measured 0.58 s (window) vs 1.23 s (min_by).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type"))
      events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("modal_type"),
          col("cnt"))
        .orderBy(col("user_id"))
    }),

    // FILTER-clause aggregates (round-4 add): several differently-
    // predicated aggregates over ONE scan — the idiomatic replacement
    // for N self-joins or N CASE-wrapped sums. One partial+final hash
    // agg; every filter evaluates inside the aggregate, so the fact
    // table is read once regardless of how many conditions are added.
    "agg_filtered" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          sum(when(col("o_orderstatus") === "O",
            dec(col("o_totalprice")))).cast("double").as("open_value"))
        .orderBy(col("o_orderpriority"))),

    // Count-Min sketch (round-6 add): point-frequency estimation from a
    // FIXED-SIZE summary — 4 depths × 1024 cells of bigint counts
    // (≤ 32 KB) whatever the key cardinality, the third mergeable
    // sketch next to HLL (agg_hll_merge) and Misra–Gries
    // (udaf_topk_sketch). CM is a LINEAR sketch: the cell table is a
    // plain (depth, cell)-keyed count — partial/final hash agg,
    // map-side combine, and the merged sketch is IDENTICAL under any
    // partitioning or merge order (not merely within a guarantee band,
    // like MG). That linearity also makes it the one sketch with an
    // EXACT DuckDB oracle: both engines compute the same cells and the
    // same estimates. Hash = engine-portable multiplicative Knuth
    // (2654435761, the llm_sample_topk_hash constant) with a per-depth
    // offset, top-10-of-32 bits as the cell (low multiplicative bits
    // are weak). Readout: est(u) = min over depths of u's cell count —
    // ≥ true count always (only collisions inflate), for a fixed probe
    // set of users. At 100 TB the sketch ships 4096 rows per partition
    // while exact per-key counts would shuffle the key universe.
    "agg_cm_sketch" -> ((s, d) => {
      val cellExpr =
        "pmod((%s + dep * 1000003 + 1) * 2654435761, 4294967296) div 4194304"
      val cells = events(s, d)
        .select(col("user_id"),
          explode(sequence(lit(0), lit(3))).as("dep"))
        .withColumn("cell", expr(cellExpr.format("user_id")))
        .groupBy(col("dep"), col("cell"))
        .agg(count(lit(1)).as("c"))
      val probes = s.range(1, 21).select(col("id").as("q_user"))
        .select(col("q_user"), explode(sequence(lit(0), lit(3))).as("dep"))
        .withColumn("cell", expr(cellExpr.format("q_user")))
      probes.join(cells, Seq("dep", "cell"), "left")
        .groupBy(col("q_user"))
        .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))
        .orderBy(col("q_user"))
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_global" ->
      """SELECT count(*) AS n_rows,
                min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
                min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
         FROM lineitem""",

    "agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",

    "agg_percentile" ->
      """SELECT event_type,
                round(quantile_cont(value, 0.5), 6) AS p50,
                round(quantile_cont(value, 0.9), 6) AS p90,
                count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",

    "agg_stats_exact" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
                      CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                      CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))
                        AS DOUBLE) AS sxx
                    FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
                round(sx / n, 6) AS mean_qty,
                round((sxx - sx * sx / n) / NULLIF(n - 1, 0), 6) AS var_qty,
                round(sqrt((sxx - sx * sx / n) / NULLIF(n - 1, 0)), 6)
                  AS stddev_qty
         FROM m ORDER BY l_returnflag""",

    "agg_corr_covar" ->
      """WITH r AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 100
                        AS BIGINT) AS pc
                    FROM lineitem),
            m AS (SELECT l_returnflag, count(*) AS n,
                      CAST(sum(q) AS DOUBLE) AS sx,
                      CAST(sum(CAST(pc AS DECIMAL(38,0))) AS DOUBLE)
                        / 100.0 AS sy,
                      CAST(sum(CAST(q * pc AS DECIMAL(38,0))) AS DOUBLE)
                        / 100.0 AS sxy,
                      CAST(sum(q * q) AS DOUBLE) AS sxx,
                      CAST(sum(CAST(pc * pc AS DECIMAL(38,0))) AS DOUBLE)
                        / 10000.0 AS syy
                    FROM r GROUP BY 1)
         SELECT l_returnflag, n,
                round((sxy - sx * sy / n) / NULLIF(n - 1, 0), 6)
                  AS covar_qty_price,
                round((sxy - sx * sy / n) /
                  (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6)
                  AS corr_qty_price
         FROM m ORDER BY l_returnflag""",

    "agg_regression" ->
      """WITH r AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 100
                        AS BIGINT) AS pc
                    FROM lineitem),
            m AS (SELECT l_returnflag, count(*) AS n,
                      CAST(sum(q) AS DOUBLE) AS sx,
                      CAST(sum(CAST(pc AS DECIMAL(38,0))) AS DOUBLE)
                        / 100.0 AS sy,
                      CAST(sum(CAST(q * pc AS DECIMAL(38,0))) AS DOUBLE)
                        / 100.0 AS sxy,
                      CAST(sum(q * q) AS DOUBLE) AS sxx,
                      CAST(sum(CAST(pc * pc AS DECIMAL(38,0))) AS DOUBLE)
                        / 10000.0 AS syy
                    FROM r GROUP BY 1)
         SELECT l_returnflag, n,
                CASE WHEN n > 1 AND sxx - sx * sx / n <> 0 THEN
                  round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6)
                END AS slope,
                CASE WHEN n > 1 AND sxx - sx * sx / n <> 0 THEN
                  round(sy / n - ((sxy - sx * sy / n) /
                    (sxx - sx * sx / n)) * (sx / n), 6)
                END AS intercept,
                CASE WHEN n > 1 AND sxx - sx * sx / n <> 0
                       AND syy - sy * sy / n <> 0 THEN
                  round((sxy - sx * sy / n) * (sxy - sx * sy / n) /
                    ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
                END AS r2
         FROM m ORDER BY l_returnflag""",

    "agg_skew_kurt" ->
      """WITH r AS (SELECT l_returnflag,
                      CAST(l_quantity AS BIGINT) AS q
                    FROM lineitem),
            m AS (SELECT l_returnflag, count(*) AS n,
                      CAST(sum(q) AS DOUBLE) AS s1,
                      CAST(sum(q * q) AS DOUBLE) AS s2,
                      CAST(sum(CAST(q * q * q AS DECIMAL(38,0)))
                        AS DOUBLE) AS s3,
                      CAST(sum(CAST(q * q * q * q AS DECIMAL(38,0)))
                        AS DOUBLE) AS s4
                    FROM r GROUP BY 1),
            c AS (SELECT l_returnflag, n, s1, s2, s3, s4,
                    s1 / n AS mean FROM m),
            cm AS (SELECT l_returnflag, n, mean,
                     s2 / n - mean * mean AS m2,
                     s3 / n - 3.0 * mean * (s2 / n) +
                       2.0 * mean * mean * mean AS m3,
                     s4 / n - 4.0 * mean * (s3 / n) +
                       6.0 * mean * mean * (s2 / n) -
                       3.0 * mean * mean * mean * mean AS m4
                   FROM c)
       SELECT l_returnflag, n,
              CASE WHEN n > 1 AND m2 > 0 THEN
                round(m3 / (sqrt(m2) * m2), 6) END AS skewness_qty,
              CASE WHEN n > 1 AND m2 > 0 THEN
                round(m4 / (m2 * m2) - 3.0, 6) END AS kurtosis_qty
       FROM cm ORDER BY l_returnflag""",

    "agg_weighted_median" ->
      """WITH t AS (SELECT l_returnflag, l_quantity,
                      sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                        OVER (PARTITION BY l_returnflag
                              ORDER BY l_quantity, l_orderkey,
                                       l_linenumber, l_extendedprice
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
                      sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                        OVER (PARTITION BY l_returnflag) AS tot
                    FROM lineitem)
       SELECT l_returnflag, min(l_quantity) AS weighted_median_qty
       FROM t WHERE cum * 2 >= tot
       GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_entropy" ->
      """WITH hc AS (SELECT event_type, hour(CAST(ts AS TIMESTAMP)) AS hr,
                       count(*) AS ni
                     FROM events GROUP BY 1, 2),
            hp AS (SELECT event_type, ni,
                     CAST(sum(ni) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                     CAST(round(ln(CAST(ni AS DOUBLE) /
                         CAST(sum(ni) OVER (PARTITION BY event_type) AS BIGINT))
                       * 1000000, 0) AS BIGINT) AS lpm
                   FROM hc)
         SELECT event_type, max(n) AS n, count(*) AS n_hours,
                CAST((2 * CAST(-sum(ni * lpm) AS BIGINT) + max(n))
                    // (2 * max(n)) AS DOUBLE) / 1000000 AS h_nats
         FROM hp GROUP BY event_type ORDER BY event_type""",

    "agg_histogram" ->
      """WITH e AS (SELECT event_type,
                      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                        AS v_us
                    FROM events),
            b AS (SELECT min(v_us) AS mn, max(v_us) AS mx FROM e),
            h AS (SELECT event_type,
                    ((v_us - mn) * 20) // (mx - mn + 1) AS bucket, mn, mx
                  FROM e, b)
       SELECT event_type, bucket,
              CAST(mn + (bucket * (mx - mn + 1)) // 20 AS DOUBLE)
                / 1000000 AS lo,
              CAST(mn + ((bucket + 1) * (mx - mn + 1)) // 20 AS DOUBLE)
                / 1000000 AS hi,
              count(*) AS cnt
       FROM h GROUP BY event_type, bucket, mn, mx
       ORDER BY event_type, bucket""",

    "agg_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderpriority,
                CAST(GROUPING(year(o_orderdate)) AS INT) AS g_year,
                CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
                count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
         ORDER BY g_year, g_prio, o_year NULLS FIRST,
                  o_orderpriority NULLS FIRST""",

    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
                count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
                  o_orderpriority NULLS FIRST""",

    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
         FROM orders GROUP BY 1 HAVING count(*) > 12 ORDER BY 1""",

    "agg_collect_sorted" ->
      """SELECT c_nationkey,
                string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
                  AS segments,
                count(DISTINCT c_mktsegment) AS n_segments
         FROM customer GROUP BY 1 ORDER BY 1""",

    "agg_maxby_minby" ->
      """SELECT o_orderpriority,
                max_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
                  * 10000000000 + o_orderkey) AS priciest_order,
                min_by(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
                  * 10000000000 + o_orderkey) AS cheapest_order,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",

    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
                CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
                count(*) AS cnt,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                  AS sum_price
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY g_status, g_prio,
                  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "agg_pivot" ->
      """SELECT user_id,
                count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY 1 ORDER BY 1""",

    "agg_heavy_hitters" ->
      """WITH pu AS (SELECT user_id, count(*) AS cnt
                     FROM events GROUP BY 1),
            t AS (SELECT sum(cnt) AS total, count(*) AS n_users FROM pu)
         SELECT user_id, cnt
         FROM pu, t
         WHERE cnt * n_users * 10 >= 12 * total
         ORDER BY user_id""",

    "agg_mode" ->
      """SELECT user_id, event_type AS modal_type, cnt FROM (
           SELECT user_id, event_type, count(*) AS cnt,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY count(*) DESC, event_type) AS rn
           FROM events GROUP BY user_id, event_type)
         WHERE rn = 1 ORDER BY user_id""",

    "agg_filtered" ->
      """SELECT o_orderpriority,
                count(*) AS n_all,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
                count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                     FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
                  AS open_value
         FROM orders GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "agg_cm_sketch" ->
      """WITH cells AS (
           SELECT t.dep,
                  ((user_id + t.dep * 1000003 + 1) * 2654435761
                    % 4294967296) // 4194304 AS cell,
                  count(*) AS c
           FROM events, LATERAL unnest(generate_series(0, 3)) AS t(dep)
           GROUP BY 1, 2),
            probes AS (
           SELECT q.q_user, t.dep,
                  ((q.q_user + t.dep * 1000003 + 1) * 2654435761
                    % 4294967296) // 4194304 AS cell
           FROM (SELECT unnest(generate_series(1, 20)) AS q_user) q,
                LATERAL unnest(generate_series(0, 3)) AS t(dep))
       SELECT p.q_user, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS est_count
       FROM probes p
       LEFT JOIN cells c ON c.dep = p.dep AND c.cell = p.cell
       GROUP BY 1 ORDER BY 1"""
  )
}
