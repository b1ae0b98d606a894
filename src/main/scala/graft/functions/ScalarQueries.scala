package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.H scalar function families + §2.A `events_ingest` (SURVEY.md §2.1).
  *
  * One composite query per family, all built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs in these paths — whole-stage
  * codegen keeps them pipelined with the scan). Cross-engine determinism:
  * regex restricted to the Java∩RE2 subset (D5), transcendental outputs
  * rounded (D4), integer-typed outputs cast identically on both sides.
  */
object ScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "events_ingest" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), col("ts_utc"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("event_id"))),

    // Time-series densification: every hourly bucket between each key's
    // first and last event, zeros where nothing happened. The grid
    // generates from the tiny per-key bounds aggregate (O(keys) rows
    // exploding to O(keys × spans)), NOT from the event stream — so the
    // corpus is scanned once and the gap fill itself never shuffles
    // corpus-sized data.
    "ts_gapfill" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts_utc")).as("hb"))
        .agg(count(lit(1)).as("cnt"))
      val grid = hourly.groupBy(col("event_type"))
        .agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"),
            expr("INTERVAL 1 HOUR"))).as("hb"))
      grid.join(hourly, Seq("event_type", "hb"), "left")
        .select(col("event_type"), col("hb"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy(col("event_type"), col("hb"))
    }),

    // Funnel / pattern detection (round-4 add) — the batch form of the
    // CEP "A followed by B within T" shape (streaming CEP proper is out
    // of contract: SURVEY §2 end note): for every signup, the FIRST
    // purchase by the same user within 1 hour. One equi-join keyed by
    // user_id (the range rides the join condition — never a cartesian),
    // then min(struct) picks the earliest qualifying purchase with an
    // id tie-break; all comparisons in exact integer microseconds.
    // Scale: both sides shuffle once on user_id; per-user signup ×
    // purchase pair volume is bounded by the 1-hour window, not the
    // corpus.
    "events_funnel" -> ((s, d) => {
      // Since round-8 the batch CEP family compiles the SAME Pattern
      // objects the streaming processors evaluate (BatchCep emits the
      // join/min-struct legs these ops were hand-written as — plan
      // shape unchanged, spec now shared).
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.funnelPattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("purchase_id"),
          (col("purchase_ts") - col("anchor_ts")).as("us_to_convert"))
        .orderBy(col("signup_id"))
    }),

    // Three-step CEP sequence (round-4 add): signup → first click after
    // it → first purchase after THAT click, all inside 1 h of the
    // signup — the iterative-pattern half of Flink-CEP's batch story
    // (events_funnel is the 2-step base case). Each step is one
    // time-bounded equi-join on user_id + a min-struct aggregation
    // (earliest (ts, id) wins — total order, engine-independent), so the
    // chain is two shuffle joins, never a per-user nested loop; at
    // 100 TB both joins hash-partition on user_id and AQE handles any
    // hot user.
    "events_pattern_abc" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.abcPattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("click_id"), col("purchase_id"),
          (col("purchase_ts") - col("anchor_ts")).as("us_to_complete"))
        .orderBy(col("signup_id"))
    }),

    // Quantified CEP sequence (round-5 add): A B+ C within 1 h — signup,
    // ONE-OR-MORE clicks, then a purchase: Flink-CEP's
    // `Pattern.oneOrMore().greedy()` quantifier on top of the 3-step
    // chain. The bound steps stay deterministic (first click after the
    // signup, first purchase after that click); the greedy B+ is then
    // the count of EVERY click strictly between signup and the closing
    // purchase — the quantified step absorbs all Bs before the C that
    // completes the match. Unmatched chains carry null b_count (no C ⇒
    // nothing quantified). Three time-bounded equi-joins on user_id
    // (one more than the 3-step chain for the count), all
    // hash-partitioned, never a per-user nested loop.
    "events_pattern_quantified" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.quantifiedPattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("click_id"), col("purchase_id"),
          col("click_count").as("b_count"),
          (col("purchase_ts") - col("anchor_ts")).as("us_to_complete"))
        .orderBy(col("signup_id"))
    }),

    // Exact-count quantifier (round-5 add): A B{2} C within 1 h —
    // signup, TWO clicks, then a purchase: Flink-CEP's
    // `Pattern.times(2)` (relaxed contiguity) on the same deterministic
    // first-match rule as the other chains. Binding: c1 = first click
    // after the signup, c2 = first click strictly after c1, purchase =
    // first purchase after c2, all ≤ signup + 1 h; each unbound step
    // cascades null. Three time-bounded user-keyed equi-joins +
    // min-struct picks — one more chain link than the 3-step pattern,
    // identical shuffle shape (hash by user/signup, never a per-user
    // nested loop).
    "events_pattern_times" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.timesPattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("click1_id"), col("click2_id"), col("purchase_id"),
          (col("purchase_ts") - col("anchor_ts")).as("us_to_complete"))
        .orderBy(col("signup_id"))
    }),

    // Iterative-condition pattern (round-13 add): Flink-CEP's
    // `IterativeCondition` (a step predicate reading PRIOR bindings) —
    // signup → the FIRST purchase within 1 h whose value EXCEEDS the
    // signup's own value. BatchCep compiles the shared `valuePattern`:
    // the predicate is one extra conjunct on the same time-bounded
    // user-keyed equi-join, so a cheaper earlier purchase is SKIPPED
    // by the filtered min-struct pick, never a match-ender — the
    // semantics the streaming twin's filtered first-match scan pins.
    // Same shuffle shape as events_funnel (one hash join + partial
    // agg); the value columns ride the existing rows, no extra pass.
    "events_pattern_value" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.valuePattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("anchor_value").as("signup_value"),
          col("purchase_id"), col("purchase_value"),
          (col("purchase_ts") - col("anchor_ts")).as("us_to_convert"))
        .orderBy(col("signup_id"))
    }),

    // Until-condition quantifier (round-5 add): A B* until C — signup,
    // then EVERY click up to the FIRST purchase, the purchase closing
    // the loop — an ADAPTATION of Flink-CEP's
    // `oneOrMore().until(condition)` (here the loop admits zero
    // occurrences and the close is a required binding; Flink's loop
    // requires ≥ 1 and until() is a non-binding stop condition), where
    // the quantified step ends on a predicate rather than a clock. No
    // time window: the close is the stop condition itself (an OPEN
    // pattern — no purchase yet — reports a null count; the streaming
    // family deliberately has no twin, since an unbounded-window
    // buffer has no watermark to seal it — `within()` exists precisely
    // to bound CEP state, see stream_pattern_abc). Two user-keyed
    // equi-joins: min-struct first-purchase pick, then a bounded count
    // join — same shuffle shape as the windowed chains.
    "events_pattern_until" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val sg = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("ts_us").as("s_ts"))
      val ck = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          col("event_id").as("click_id"), col("ts_us").as("c_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts_us").as("p_ts"))
      val closed = sg.join(pu,
          col("user_id") === col("p_user") && col("p_ts") > col("s_ts"),
          "left")
        .groupBy(col("user_id"), col("signup_id"), col("s_ts"))
        .agg(min(when(col("purchase_id").isNotNull,
          struct(col("p_ts"), col("purchase_id")))).as("fp"))
        .select(col("user_id"), col("signup_id"), col("s_ts"),
          col("fp.purchase_id").as("purchase_id"),
          col("fp.p_ts").as("p_ts"))
      closed.join(ck,
          col("user_id") === col("c_user") &&
            col("c_ts") > col("s_ts") && col("c_ts") < col("p_ts"), "left")
        .groupBy(col("user_id"), col("signup_id"), col("purchase_id"),
          col("p_ts"), col("s_ts"))
        .agg(count(col("click_id")).as("bn"))
        .select(col("user_id"), col("signup_id"), col("purchase_id"),
          when(col("purchase_id").isNotNull, col("bn")).as("b_count"),
          (col("p_ts") - col("s_ts")).as("us_to_close"))
        .orderBy(col("signup_id"))
    }),

    // Optional-step pattern (round-5 add): A B? C within 1 h — signup,
    // OPTIONAL click, then purchase: Flink-CEP's `optional()` quantifier
    // with greedy preference. The with-click chain (first click after
    // signup, first purchase after that click) is attempted first; only
    // if it cannot COMPLETE does the match fall back to the click-skipped
    // branch (first purchase directly after the signup — possibly one
    // that PRECEDED the dangling click). A click with no chain and no
    // direct purchase still reports as a dangling step. Three
    // time-bounded user-keyed joins + min-struct picks, same scale shape
    // as the quantified pattern.
    "events_pattern_optional" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.optionalPattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("click_id"), col("purchase_id"),
          (col("purchase_ts") - col("anchor_ts")).as("us_to_complete"))
        .orderBy(col("signup_id"))
    }),

    // Absence pattern (round-5 add): signups NOT followed by a purchase
    // within 1 h — Flink-CEP's `notFollowedBy().within()`, the negation
    // CEP shape the followed-by family above can't express (a match is
    // the NON-existence of a later event). One left-anti join: the
    // signup side survives iff no same-user purchase lands in its
    // window. Scale: both sides shuffle once on user_id and the anti
    // join is a hash join (no pair materialization for matches — a
    // signup with thousands of in-window purchases costs one probe);
    // AQE handles hot users.
    "events_pattern_absence" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.absencePattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("anchor_ts").as("s_ts_us"))
        .orderBy(col("signup_id"))
    }),

    // Browse-abandonment pattern (round-7 add): signup → FIRST click
    // within 1 h, then NO purchase between that click and the signup's
    // deadline — batch twin of `stream_pattern_abandon` (the Cep-
    // composed followedBy + notFollowedBy shape). Negation scans from
    // the CLICK: an earlier purchase does not redeem the abandonment.
    // Two stages, both scale-safe: the funnel family's window-bounded
    // join + min-struct agg binds the first click in one user-keyed
    // shuffle (no pair blowup — the agg folds a signup's many clicks
    // map-side), then a left-anti join drops redeemed clicks (a signup
    // with thousands of in-window purchases costs one hash probe).
    "events_pattern_abandon" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.abandonPattern,
          "signup", graft.streaming.StreamingOps.cepTypeNames)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("click_id"), col("click_ts").as("c_ts_us"))
        .orderBy(col("signup_id"))
    }),

    // Strict-contiguity CEP step (round-5 add): Flink's `next()` — the
    // signup's verdict hangs on the user's IMMEDIATELY following event
    // (strictly later ts; earliest (ts, id) wins), not on any later
    // click: iff that very next event is a click within 1 h the signup
    // matches ("next" admits no gaps, unlike followedBy). One
    // time-bounded equi-join on user_id + min-struct agg — the funnel
    // family's plan shape; bounding the join to the 1 h window keeps a
    // signup from pairing with the user's whole future at 100 TB, and
    // loses nothing: a first-event beyond the horizon means an empty
    // window, which is already the unmatched-left NULL verdict.
    "events_pattern_strict" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      BatchCep.bindings(ev, graft.streaming.StreamingOps.strictPattern,
          "signup", graft.streaming.StreamingOps.cepAllTypeNames,
          fullAlphabet = true)
        .select(col("user_id"), col("anchor_id").as("signup_id"),
          col("click_id").as("next_click_id"))
        .orderBy(col("signup_id"))
    }),

    // Path analysis (round-5 add): the 10 most common 3-step
    // event-type sequences users take — the product-analytics /
    // curriculum-mining staple over clickstreams. Two lead() steps
    // over each user's event-time order make the trigram in ONE
    // user-keyed shuffle; the count + rank then run over the tiny
    // distinct-path aggregate (≤ |types|³ rows however large the
    // input), so the top-10 never sorts the corpus. Ties break on the
    // path string — a total order both engines share.
    "events_top_paths" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, d).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path"))
        .limit(10)
    }),

    // Count-based tumbling windows (round-5 add): per user, every
    // consecutive run of 5 events in event-time order forms one window
    // (only FULL windows emit) — Flink's `countWindow(5)`, which Spark's
    // time-based `window()` can't express. One user-keyed window rank +
    // hash agg; `value` rides as exact decimal micro-units so the
    // per-window sum is integer arithmetic on both engines (a 5-double
    // sum would drift on accumulation order, D2). The streaming twin is
    // `stream_count_window`.
    "events_count_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"),
          (dec(col("value")) * 1000000).cast("long").as("v_us"))
        .withColumn("rn", row_number().over(w) - 1)
        .withColumn("win_idx", expr("rn div 5"))
        .groupBy(col("user_id"), col("win_idx"))
        .agg(count(lit(1)).as("n"), min(col("ts_us")).as("w_first_us"),
          max(col("ts_us")).as("w_last_us"), sum(col("v_us")).as("sv"))
        .filter(col("n") === 5)
        .select(col("user_id"), col("win_idx"), col("w_first_us"),
          col("w_last_us"),
          (col("sv").cast("double") / lit(1e6)).as("sum_value"))
        .orderBy(col("user_id"), col("win_idx"))
    }),

    // Sliding count windows (round-5 add): Flink's `countWindow(5, 2)` —
    // window j covers a user's event-time ranks [2j+1, 2j+5], emitted at
    // every 2nd rank from 5 up, so each event feeds up to 3 overlapping
    // windows. No self-join and no explode: one user-keyed sort carries
    // BOTH the rank filter and a 5-row running frame (sum/min over ROWS
    // 4 PRECEDING), so overlap costs zero extra shuffle over the
    // tumbling variant — the frame's current row is each window's last
    // member. Micro-unit value sums as in events_count_window (D2). The
    // streaming twin is `stream_count_sliding`.
    "events_count_sliding" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val frame = w.rowsBetween(-4, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"),
          (dec(col("value")) * 1000000).cast("long").as("v_us"))
        .select(col("user_id"), col("ts_us"),
          row_number().over(w).as("rn"),
          min(col("ts_us")).over(frame).as("w_first_us"),
          sum(col("v_us")).over(frame).as("sv"))
        .filter(col("rn") >= 5 && (col("rn") - 5) % 2 === 0)
        .select(col("user_id"),
          ((col("rn") - 5) / 2).cast("long").as("win_idx"),
          col("w_first_us"), col("ts_us").as("w_last_us"),
          (col("sv").cast("double") / lit(1e6)).as("sum_value"))
        .orderBy(col("user_id"), col("win_idx"))
    }),

    // Linear interpolation between sparse observations (round-4 add):
    // at EVERY event on a user's timeline, the purchase `value` linearly
    // interpolated between the nearest purchase at-or-before and the
    // nearest purchase strictly-after (null outside the observed range) —
    // ts_gapfill's zero-fill upgraded to real signal reconstruction.
    // Neighbor lookup is two IGNORE NULLS window frames over ONE shuffle
    // keyed by user_id (value and its timestamp fetched by separate
    // frames — non-null on exactly the same rows, so they always come
    // from the same purchase). The lerp itself is the identical double
    // expression on both engines, rounded to 6 dp; on a purchase row
    // Δt = 0 makes it collapse to the row's own value exactly.
    "ts_interpolate" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"),
          when(col("event_type") === "purchase", col("value")).as("pv"))
      val base = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = base.rowsBetween(1, Window.unboundedFollowing)
      val pvTs = when(col("pv").isNotNull, col("ts_us"))
      ev.select(col("event_id"), col("user_id"),
          col("ts_us"),
          last(col("pv"), ignoreNulls = true).over(back).as("prev_v"),
          last(pvTs, ignoreNulls = true).over(back).as("prev_ts"),
          first(col("pv"), ignoreNulls = true).over(fwd).as("next_v"),
          first(pvTs, ignoreNulls = true).over(fwd).as("next_ts"))
        .select(col("event_id"), col("user_id"),
          round(
            when(col("next_ts") === col("prev_ts"), col("prev_v"))
              .otherwise(col("prev_v") +
                (col("next_v") - col("prev_v")) *
                  (col("ts_us") - col("prev_ts")).cast("double") /
                  (col("next_ts") - col("prev_ts")).cast("double")), 6)
            .as("interp_value"))
        .orderBy(col("event_id"))
    }),

    // Cohort retention (round-5 add): users cohorted by the epoch-week
    // of their FIRST event; for offsets 0..4 weeks, how many of each
    // cohort's users were active again — the product-analytics retention
    // matrix. Weeks are pure integer epoch arithmetic (µs → day → week),
    // no calendar/timezone semantics to disagree on. The retention
    // fraction uses the (2p+n) div (2n) integer half-up idiom (D2 — a
    // double n/n0 can land exactly on a 6-dp tie when n0 is a power of
    // two). Scale shape: activity dedups to (user, week) in one hash
    // agg, cohorts roll up from it, and the per-(cohort, offset) matrix
    // joins back against the TINY cohort-size side.
    "events_retention" -> ((s, d) => {
      // act feeds both the cohort rollup and the cells join; cells feeds
      // both the base lookup and the final join — materialize each at its
      // reuse boundary (the LlmOps stageCut idiom: ReusedExchange only
      // dedups identical subtrees inside one plan, so without the cut the
      // corpus-sized activity dedup runs twice and the cells agg twice).
      val ckpt = !s.conf.getOption("spark.graft.checkpointStages")
        .exists(_.equalsIgnoreCase("false"))
      def cut(df: DataFrame): DataFrame =
        if (ckpt) df.localCheckpoint() else df
      val act = cut(events(s, d)
        .select(col("user_id"),
          expr("((ts div 1000) div 86400000000) div 7").as("wk"))
        .distinct())
      val cohort = act.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
      val cells = cut(act.join(cohort, "user_id")
        .withColumn("off", col("wk") - col("cwk"))
        .filter(col("off") <= 4)
        .groupBy(col("cwk"), col("off"))
        .agg(countDistinct(col("user_id")).as("n_users")))
      val base = cells.filter(col("off") === 0)
        .select(col("cwk").as("bwk"), col("n_users").as("n0"))
      cells.join(base, col("cwk") === col("bwk"))
        .select(col("cwk").as("cohort_week"), col("off").as("week_offset"),
          col("n_users"),
          (expr("(2 * n_users * 1000000 + n0) div (2 * n0)") / lit(1e6))
            .as("retention"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Volume-burst detection (round-5 add): per (type, hour), the event
    // count against its baseline of the trailing 24 OBSERVED hour
    // buckets, flagged when the hour runs ≥ 3× that baseline average —
    // the ops-alerting shape next to ts_zscore's per-user value
    // anomalies. NOTE the frame semantics precisely: the window is ROWS
    // over the pre-aggregated (type, hour) cells, so hours with zero
    // events are absent (not zero-valued) and the baseline can span
    // more than 24 wall-clock hours across gaps — "trailing 24 observed
    // hours", the robust choice for alerting (a quiet night does not
    // dilute the baseline toward zero and fire on the morning ramp; a
    // gap-as-zero variant would densify the hour grid first, the
    // ts_gapfill shape). ALL-INTEGER: the flag is the cross-multiplied
    // cnt·n_trail > 3·trail_sum (never a double division), so no
    // rounding can flip a boundary hour (D2/D4). One corpus agg into
    // (type, hour) cells, one tiny type-keyed window.
    "events_burst" -> ((s, d) => {
      val hc = events(s, d)
        .groupBy(col("event_type"),
          expr("(ts div 1000) div 3600000000").as("hb"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hb"))
        .rowsBetween(-24, -1)
      hc.withColumn("trail_sum", sum(col("cnt")).over(w))
        .withColumn("n_trail", count(col("cnt")).over(w))
        .withColumn("is_burst",
          col("n_trail") > 0 &&
            col("cnt") * col("n_trail") > col("trail_sum") * 3)
        .orderBy(col("event_type"), col("hb"))
    }),

    // Conversion-lag distribution (round-5 add): the funnel's
    // signup→first-purchase lag, bucketed into 5-minute cells over the
    // 1 h window — the latency histogram behind every conversion SLA
    // dashboard. One user-keyed time-bounded join + min-struct pick
    // (the events_funnel shape), then a hash agg into ≤12 integer
    // buckets; lags and bucket edges are pure µs arithmetic.
    "events_conversion_lag" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val sg = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("ts_us").as("s_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          col("event_id").as("purchase_id"), col("ts_us").as("p_ts"))
      sg.join(pu,
          col("user_id") === col("p_user") &&
            col("p_ts") > col("s_ts") &&
            col("p_ts") <= col("s_ts") + lit(3600000000L), "inner")
        .groupBy(col("user_id"), col("signup_id"), col("s_ts"))
        .agg(min(struct(col("p_ts"), col("purchase_id"))).as("fp"))
        .select((col("fp.p_ts") - col("s_ts")).as("lag_us"))
        .withColumn("bucket_5min", expr("lag_us div 300000000"))
        .groupBy(col("bucket_5min"))
        .agg(count(lit(1)).as("n_conversions"),
          min(col("lag_us")).as("min_lag_us"),
          max(col("lag_us")).as("max_lag_us"))
        .orderBy(col("bucket_5min"))
    }),

    // Daily-actives rollup (round-5 add): per UTC day, DAU plus the
    // new/returning split and the cumulative distinct-user count — the
    // growth-accounting table of every product-analytics stack. Day =
    // epoch-µs div 86400000000 (events_retention's integer-day idiom,
    // exact on both engines). Scale shape: ONE (user, day) dedup shuffle
    // feeds both the per-day DAU agg and the per-user first-day agg;
    // everything after is day-cardinality (≤ a few thousand rows at any
    // corpus size), so the global cumulative window runs on the tiny
    // rollup, never the corpus.
    "events_dau" -> ((s, d) => {
      val ud = events(s, d)
        .select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("day"))
        .distinct()
      val fd = ud.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val nu = fd.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      dau.join(nu, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .select(col("day"), col("dau"), col("new_users"),
          (col("dau") - col("new_users")).as("returning_users"),
          sum(col("new_users")).over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cum_users"))
        .orderBy(col("day"))
    }),

    // DAU/MAU stickiness (round-5 add): per calendar month, the monthly
    // actives, the average daily actives, and their ratio — the
    // engagement-depth metric next to events_dau's growth accounting.
    // Same ONE (user, day) dedup shuffle; months and days are exact
    // integer buckets, and both ratios are a single double division of
    // exact longs (avg_dau = sum_dau/n_days, stickiness =
    // sum_dau/(n_days·mau)) evaluated identically by both engines,
    // rounded (D4).
    "events_stickiness" -> ((s, d) => {
      val ud = events(s, d)
        .select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("day"),
          (year(col("ts_utc")) * 100 + month(col("ts_utc"))).as("ym"))
        .distinct()
      val dau = ud.groupBy(col("ym"), col("day"))
        .agg(count(lit(1)).as("dau"))
      val mau = ud.select(col("user_id"), col("ym")).distinct()
        .groupBy(col("ym")).agg(count(lit(1)).as("mau"))
      dau.groupBy(col("ym"))
        .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
        .join(mau, Seq("ym"))
        .select(col("ym"), col("n_days"), col("mau"),
          round(col("sum_dau") / col("n_days"), 6).as("avg_dau"),
          round(col("sum_dau") / (col("n_days") * col("mau")), 6)
            .as("stickiness"))
        .orderBy(col("ym"))
    }),

    // Markov transition matrix (round-5 add): per user, consecutive
    // event-type pairs in (ts, id) order; per (from, to) cell, the
    // transition count and P(to | from) — the path-analysis /
    // next-action table behind every product-analytics "user flow"
    // view. Scale shape: ONE user-keyed sort gives every user's lag
    // chain, and the pair counts hash-agg into |types|² cells with
    // map-side combine, so the corpus shuffles once and the probability
    // normalization runs over the tiny cell table (a post-agg window,
    // never a second corpus pass). The fraction uses the
    // (2p+n) div (2n) integer half-up idiom (D2).
    "events_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val cells = events(s, d)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("event_type"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val tot = Window.partitionBy(col("from_type"))
      cells.withColumn("n_from", sum(col("n_trans")).over(tot))
        .select(col("from_type"), col("to_type"), col("n_trans"),
          (expr("(2 * n_trans * 1000000 + n_from) div (2 * n_from)")
            / lit(1e6)).as("prob"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Linear multi-touch attribution (round-5 add): for every purchase,
    // the clicks by the same user in the preceding hour share the
    // purchase value equally, and the most recent click is tagged as the
    // last-touch winner — the marketing-attribution join every
    // growth-analytics stack runs. One user-keyed equi-join (the hour
    // bound rides the condition — never a cartesian), per-purchase pair
    // volume bounded by the window, count + max(struct) in one agg.
    // Credit is exact: purchase value in micro-unit longs divided by the
    // touch count with the (2p+n) div (2n) half-up idiom (D2) — a double
    // value/n can land on a 6-dp tie exactly when n is a power of two.
    "events_attribution" -> ((s, d) => {
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_ts"),
          (dec(col("value")) * 1000000).cast("long").as("v_us"))
      val ck = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          col("event_id").as("click_id"), col("ts_us").as("c_ts"))
      pu.join(ck,
          col("user_id") === col("c_user") &&
            col("c_ts") < col("p_ts") &&
            col("c_ts") >= col("p_ts") - lit(3600000000L), "left")
        .groupBy(col("user_id"), col("purchase_id"), col("v_us"))
        .agg(count(col("click_id")).as("n_touch"),
          max(when(col("click_id").isNotNull,
            struct(col("c_ts"), col("click_id")))).as("lt"))
        .select(col("user_id"), col("purchase_id"), col("n_touch"),
          col("lt.click_id").as("last_click_id"),
          when(col("n_touch") > 0,
            expr("(2 * v_us + n_touch) div (2 * n_touch)") / lit(1e6))
            .as("credit_per_touch"))
        .orderBy(col("purchase_id"))
    }),

    // A/B experiment readout (round-5 add): users deterministically
    // split into two variants by a stable id rule (user_id parity — the
    // llm_split_assign discipline: NEVER rand(); swap in a
    // multiplicative hash when ids aren't uniform, per
    // llm_sample_topk_hash's note), then the Welch two-sample z on
    // purchases-per-user — the "orders per user" readout every
    // experimentation stack ends at. Scale shape: one corpus agg to
    // per-user counts, one 2-row variant rollup (cut at its reuse
    // boundary — both variant sides read it); the z arithmetic runs on
    // a 1-row frame. Exactness (the ts_zscore discipline): per-variant
    // moments are exact (Σx, Σx² longs; the n·Σx²−(Σx)² numerators in
    // DECIMAL(38,0)); means via the (2p+n) div (2n) half-up idiom; z
    // through an IDENTICAL ÷/√ expression both engines
    // (correctly-rounded ops on exactly-equal inputs).
    "events_ab_test" -> ((s, d) => {
      val ckpt = !s.conf.getOption("spark.graft.checkpointStages")
        .exists(_.equalsIgnoreCase("false"))
      val perUser = events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("k"))
        .select(pmod(col("user_id"), lit(2L)).as("variant"), col("k"))
      val v0 = perUser.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("s"),
          sum(expr("CAST(k * k AS DECIMAL(38,0))")).as("sq"))
      val v = if (ckpt) v0.localCheckpoint() else v0
      val a = v.filter(col("variant") === 0)
        .select(col("n").as("n1"), col("s").as("s1"), col("sq").as("sq1"))
      val b = v.filter(col("variant") === 1)
        .select(col("n").as("n2"), col("s").as("s2"), col("sq").as("sq2"))
      def varTerm(i: Int): String =
        s"CAST(CAST(n$i AS DECIMAL(38,0)) * sq$i" +
          s" - CAST(s$i AS DECIMAL(38,0)) * CAST(s$i AS DECIMAL(38,0))" +
          s" AS DOUBLE) / (CAST(n$i AS DOUBLE) * (n$i - 1)) / n$i"
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("s1"), col("n2"), col("s2"),
          (expr("(2 * s1 * 1000000 + n1) div (2 * n1)") / lit(1e6))
            .as("mean1"),
          (expr("(2 * s2 * 1000000 + n2) div (2 * n2)") / lit(1e6))
            .as("mean2"),
          // Welch z = (m1 − m2) / √(v1/n1 + v2/n2), every term derived
          // from exact integer moments by identical double arithmetic
          when(col("n1") > 1 && col("n2") > 1 &&
              expr(s"${varTerm(1)} + ${varTerm(2)}") > 0,
            expr("CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2") /
              sqrt(expr(s"${varTerm(1)} + ${varTerm(2)}"))).as("z"))
    }),

    // RFM user segmentation (round-5 add): per purchase-active user,
    // recency (days since their last purchase, vs the corpus max),
    // frequency (purchase count), monetary (exact micro-unit value sum);
    // each metric scored 1..5 against its exact quintile boundaries and
    // users bucketed into named segments — the classic growth-analytics
    // table. Scale shape: ONE purchase-keyed agg builds the per-user
    // metric table; the corpus max and the 12 quintile boundaries are
    // single-row aggregates BROADCAST back — scoring is a boundary
    // comparison, never a global ntile sort of the user table (the
    // ntile form needs one totally-ordered partition; boundaries keep
    // the scoring embarrassingly parallel at 10⁹ users). Boundaries are
    // percentile/quantile_cont rounded to 6 dp (the agg_percentile
    // discipline); all metrics are exact longs.
    "events_rfm" -> ((s, d) => {
      val ckpt = !s.conf.getOption("spark.graft.checkpointStages")
        .exists(_.equalsIgnoreCase("false"))
      val per = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(expr("ts div 1000")).as("last_us"),
          count(lit(1)).as("frequency"),
          sum((dec(col("value")) * 1000000).cast("long")).as("m_us"))
      val mx = per.agg(max(col("last_us")).as("mxus"))
      val rm0 = per.crossJoin(broadcast(mx))
        .select(col("user_id"),
          expr("(mxus - last_us) div 86400000000").as("recency_days"),
          col("frequency"), col("m_us"))
      val rm = if (ckpt) rm0.localCheckpoint() else rm0
      val qs = Seq(0.2, 0.4, 0.6, 0.8)
      val boundCols = Seq("recency_days" -> "rb", "frequency" -> "fb",
        "m_us" -> "mb").flatMap { case (m, p) =>
        qs.zipWithIndex.map { case (q, i) =>
          round(expr(s"percentile($m, ${q}D)"), 6).as(s"$p${i + 1}") }
      }
      val bounds = rm.agg(boundCols.head, boundCols.tail: _*)
      def score(metric: String, b: String, op: String): Column =
        (1 to 4).map(k =>
          when(expr(s"$metric $op $b$k"), 1).otherwise(0))
          .reduce(_ + _) + lit(1)
      rm.crossJoin(broadcast(bounds))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          (col("m_us").cast("double") / lit(1e6)).as("monetary"),
          score("recency_days", "rb", "<").as("r_score"),
          score("frequency", "fb", ">").as("f_score"),
          score("m_us", "mb", ">").as("m_score"))
        .withColumn("segment", expr(
          """CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                    THEN 'champion'
                  WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
                  WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                  WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
                  ELSE 'regular' END"""))
        .orderBy(col("user_id"))
    }),

    // Audience-overlap matrix (round-5 add): for every pair of event
    // types, the Jaccard overlap of their user audiences — the
    // segment-overlap view behind "users who did A also did B".
    // Scale shape: the corpus dedups to (user, type) ONCE (≤ |users|·
    // |types| rows, materialized at its three-way reuse boundary); the
    // pair source is a user-keyed self-equi-join whose per-user output
    // is ≤ C(|types|,2) — bounded by the type alphabet, never the
    // corpus — and the per-type sizes are a tiny broadcast side.
    // Jaccard via the (2p+n) div (2n) integer half-up idiom (D2).
    "events_type_overlap" -> ((s, d) => {
      val ckpt = !s.conf.getOption("spark.graft.checkpointStages")
        .exists(_.equalsIgnoreCase("false"))
      val ut0 = events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val ut = if (ckpt) ut0.localCheckpoint() else ut0
      val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val pairs = ut.as("a").join(ut.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
          col("n").as("n_a"))), Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
          col("n").as("n_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"),
          (expr("(2 * n_both * 1000000 + (n_a + n_b - n_both))" +
            " div (2 * (n_a + n_b - n_both))") / lit(1e6)).as("jaccard"))
        .orderBy(col("type_a"), col("type_b"))
    }),

    // Rolling z-score anomaly detection (round-5 add): at every event,
    // `value` scored against the user's previous ≤20 events (current row
    // excluded): z = (n·x − Σv) / √(n·Σv² − (Σv)²), |z| > 3 flags the
    // outlier — the threshold-alerting shape of every metrics pipeline.
    // Exactness discipline (the agg_regression D2 treatment): values in
    // micro-unit longs, moment sums exact (Σv long, Σv² DECIMAL(38,0) —
    // 20 squares of 1e9-scale micro-units can pass long range), every
    // subtraction done in exact integer/decimal arithmetic, and only the
    // final division + sqrt run in IEEE doubles with the IDENTICAL
    // expression on both engines (÷ and √ are correctly-rounded, so
    // exactly-equal inputs give bit-equal outputs — unlike ln, which is
    // why the LM family pre-rounds and this op doesn't need to). One
    // user-keyed sort; all three moments share the frame.
    "ts_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-20, -1)
      val denSq = "CAST(n AS DECIMAL(38,0)) * s2" +
        " - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))"
      events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("value"),
          (dec(col("value")) * 1000000).cast("long").as("v_us"))
        .withColumn("n", count(col("v_us")).over(w))
        .withColumn("s1", sum(col("v_us")).over(w))
        .withColumn("s2",
          sum(expr("CAST(v_us * v_us AS DECIMAL(38,0))")).over(w))
        .select(col("event_id"), col("user_id"), col("value"),
          when(col("n") >= 5 && expr(denSq) > 0,
            expr("CAST(n * v_us - s1 AS DOUBLE)") /
              sqrt(expr(s"CAST($denSq AS DOUBLE)"))).as("z"))
        .withColumn("is_anomaly",
          col("z").isNotNull && abs(col("z")) > lit(3.0))
        .orderBy(col("event_id"))
    }),

    // Exponentially-weighted moving average (round-5 add): at every
    // event, EWMA of `value` over the user's last 10 events (α = 1/2,
    // truncated horizon — the streaming-friendly form: state is 10 lags,
    // not the whole series). Exactness discipline: weights 2^-k over
    // micro-unit longs become INTEGER weights 2^(9-k), so numerator and
    // weight-sum accumulate in exact long arithmetic; the half-up
    // 6-dp rounding is the (2p+n) div (2n) integer idiom (no IEEE op
    // until the final display division, identical on both engines — the
    // same D2 fixed-point treatment as llm_ngram_lm/agg_entropy). Ten
    // lags over ONE user-keyed sort; no self-join.
    "ts_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val lags = (0 until 10).map { k =>
        val l = if (k == 0) col("v_us") else lag(col("v_us"), k).over(w)
        (l, lit(512L >> k))
      }
      val num = lags.map { case (l, wt) =>
        when(l.isNotNull, l * wt).otherwise(lit(0L)) }.reduce(_ + _)
      val den = lags.map { case (l, wt) =>
        when(l.isNotNull, wt).otherwise(lit(0L)) }.reduce(_ + _)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"),
          (dec(col("value")) * 1000000).cast("long").as("v_us"))
        .select(col("event_id"), col("user_id"),
          num.as("n"), den.as("dn"))
        .select(col("event_id"), col("user_id"),
          (expr("(2 * n + dn) div (2 * dn)") / lit(1e6)).as("ewma"))
        .orderBy(col("event_id"))
    }),

    // Time-series resampling to OHLC bars (round-5 add): per user,
    // 15-minute buckets of `value` → event count + open/high/low/close —
    // the downsampling shape of every metrics/market pipeline (raw ticks
    // → bars). open/close are FIRST/LAST by (ts_us, event_id) via two
    // unbounded frames over the same (user_id, bucket) sort the final
    // agg groups on, so the whole op is ONE exchange; every output is a
    // raw input value or an exact min/max/count — no arithmetic on
    // doubles anywhere (D2 trivially). 900000000 µs = 15 min.
    "ts_resample" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("value"))
        .withColumn("bkt", expr("ts_us div 900000000"))
      val full = Window.partitionBy(col("user_id"), col("bkt"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev.select(col("user_id"), col("bkt"), col("value"),
          first(col("value")).over(full).as("o"),
          last(col("value")).over(full).as("c"))
        .groupBy(col("user_id"), col("bkt"))
        .agg(count(lit(1)).as("n_events"), min(col("o")).as("open_v"),
          max(col("value")).as("high_v"), min(col("value")).as("low_v"),
          min(col("c")).as("close_v"))
        .select(col("user_id"),
          (col("bkt") * 900000000L).as("bucket_start_us"),
          col("n_events"), col("open_v"), col("high_v"), col("low_v"),
          col("close_v"))
        .orderBy(col("user_id"), col("bucket_start_us"))
    }),

    "fn_string" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        length(col("p_name")).as("len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
        lpad(col("p_size").cast("string"), 3, "0").as("lp"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("rep"),
        instr(col("p_name"), "a").as("pos"))
        .orderBy(col("p_partkey"))),

    "fn_regex" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
        col("p_brand").rlike("Brand#1[0-9]").as("is_teen_brand"))
        .orderBy(col("p_partkey"))),

    "fn_wordcount" -> ((s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("word"))),

    // URL parsing family (round-6 add): `parse_url` over URLs
    // synthesized deterministically from document attributes (the
    // llm_redact synthetic-input pattern — the corpus carries no URL
    // column, and the oracle then states the expected decomposition
    // directly instead of re-implementing a parser in SQL). Exercises
    // HOST / PATH / QUERY / per-key QUERY / PROTOCOL — the log-ingest
    // normalization family every clickstream pipeline needs. Pure
    // per-row projection: no shuffle, codegen end to end.
    "fn_url" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string"), lit("?lang="), col("lang"),
            lit("&v=2")).as("url"))
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
          expr("parse_url(url, 'PROTOCOL')").as("scheme"))
        .orderBy(col("doc_id"))),

    "fn_date" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("y"),
        month(col("o_orderdate")).cast("int").as("m"),
        dayofmonth(col("o_orderdate")).cast("int").as("dd"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("int")
          .as("days_since"),
        last_day(col("o_orderdate")).as("ldom"))
        .orderBy(col("o_orderkey"))),

    "fn_math" -> ((s, d) =>
      lineitem(s, d)
        // D1: (l_orderkey, l_linenumber) alone is not unique in this data;
        // sort on the unique triple before the projection drops the price.
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("ab"),
        floor(col("l_extendedprice")).cast("bigint").as("fl"),
        ceil(col("l_extendedprice")).cast("bigint").as("ce"),
        pow(col("l_quantity"), 2).as("pw"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(log(col("l_extendedprice")), 6).as("ln_val"),
        round(log10(col("l_extendedprice")), 6).as("lg"),
        pmod(col("l_orderkey"), lit(7L)).as("pm"))),

    "fn_conditional" -> ((s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") > 8000, lit("high"))
          .when(col("c_acctbal") > 3000, lit("mid"))
          .otherwise(lit("low")).as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
          .as("seg_or_none"),
        greatest(col("c_acctbal"), lit(5000.0)).as("gr"),
        least(col("c_acctbal"), lit(5000.0)).as("le"))
        .orderBy(col("c_custkey"))),

    "fn_array" -> ((s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("int").as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        // Serialized (not array-typed) so the driver's pandas comparator
        // can hash the column; DECIMAL(10,6) renders identically ("0.500000")
        // in Spark and DuckDB, unlike raw double formatting.
        array_join(transform(slice(col("embedding"), 1, 3),
          x => x.cast("double").cast("decimal(10,6)").cast("string")), ",")
          .as("head3"),
        array_position(col("embedding"), element_at(col("embedding"), 3))
          .cast("bigint").as("pos3"))
        .orderBy(col("vec_id"))),

    "fn_array_hof" -> ((s, d) =>
      embeddings(s, d).select(
        col("vec_id"),
        size(filter(col("embedding"), x => x > 0.0f)).cast("int")
          .as("n_pos"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 4)
          .as("sum_sq"))
        .orderBy(col("vec_id"))),

    // Bitwise family (round-2 add): and/or/xor/shifts/bit_count over the
    // integer keys — codegen'd scalar ops, identical two's-complement
    // semantics in both engines.
    "fn_bitwise" -> ((s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("band"),
        (col("o_orderkey").bitwiseOR(lit(4096L))).as("bor"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("bxor"),
        shiftleft(col("o_orderkey"), 3).as("shl"),
        shiftright(col("o_orderkey"), 2).as("shr"),
        expr("bit_count(o_orderkey)").cast("int").as("popcount"))
        .orderBy(col("o_orderkey"))),

    // Cryptographic digest family (round-2 add): md5 / sha2-256 over the
    // part name — content-addressing primitives (dedup keys, cache keys).
    // Restricted to digests both engines implement identically.
    "fn_hash" -> ((s, d) =>
      part(s, d).select(
        col("p_partkey"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"),
        length(md5(col("p_name"))).cast("int").as("len_md5"))
        .orderBy(col("p_partkey"))),

    // Map-typed family: construction (map_from_entries / create_map),
    // lookup (element_at, map_contains_key), HOFs (map_filter,
    // transform_values), merge (map_concat). Map outputs serialize to
    // sorted "k=v" strings at the boundary (maps are unhashable in the
    // driver's comparator, and map iteration order is engine-specific);
    // numeric values render via fixed-scale decimal strings. The
    // transform multiplies by 2 (exact in doubles) so no cross-engine
    // rounding tie can arise.
    "fn_map" -> ((s, d) => {
      val m = map_from_entries(array(
        struct(lit("bal"), col("c_acctbal").cast("double")),
        struct(lit("key"), col("c_custkey").cast("double")),
        struct(lit("nat"), col("c_nationkey").cast("double"))))
      def ser(mc: Column): Column =
        array_join(array_sort(transform(map_entries(mc),
          e => concat(e.getField("key"), lit("="),
            e.getField("value").cast("decimal(14,2)").cast("string")))), ";")
      customer(s, d).select(
        col("c_custkey"),
        size(m).cast("int").as("m_size"),
        element_at(m, "bal").cast("decimal(14,2)").cast("string").as("bal"),
        ser(map_filter(m, (_, v) => v >= 1000.0)).as("big_entries"),
        ser(transform_values(m, (_, v) => v * 2)).as("doubled"),
        ser(map_concat(m, map(lit("one"), lit(1.0)))).as("merged"),
        array_join(map_keys(m), ",").as("mkeys"),
        map_contains_key(m, "nat").as("has_nat"))
        .orderBy(col("c_custkey"))
    }),

    "fn_json" -> ((s, d) =>
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        // Sorted + serialized: JSON object key order is engine-specific and
        // array columns are unhashable in the driver's comparator.
        array_join(array_sort(
          map_keys(from_json(col("props"), lit("map<string,int>")))), ",")
          .as("keys"),
        size(map_keys(from_json(col("props"), lit("map<string,int>"))))
          .cast("int").as("n_keys"))
        .orderBy(col("event_id")))
  )

  val oracle: Map[String, String] = Map(
    "events_ingest" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts_utc, user_id,
                event_type, value
         FROM events ORDER BY event_id""",

    "events_funnel" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            j AS (SELECT s.user_id, s.signup_id, s.s_ts,
                    p.purchase_id, p.p_ts,
                    row_number() OVER (PARTITION BY s.signup_id
                      ORDER BY p.p_ts, p.purchase_id) AS rn
                  FROM sg s LEFT JOIN pu p
                    ON p.user_id = s.user_id
                   AND p.p_ts > s.s_ts
                   AND p.p_ts <= s.s_ts + 3600000000)
       SELECT user_id, signup_id, purchase_id,
              p_ts - s_ts AS us_to_convert
       FROM j WHERE rn = 1 ORDER BY signup_id""",

    "events_pattern_value" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       value AS s_val,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       value AS p_val,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            j AS (SELECT s.user_id, s.signup_id, s.s_val, s.s_ts,
                    p.purchase_id, p.p_val, p.p_ts,
                    row_number() OVER (PARTITION BY s.signup_id
                      ORDER BY p.p_ts, p.purchase_id) AS rn
                  FROM sg s LEFT JOIN pu p
                    ON p.user_id = s.user_id
                   AND p.p_ts > s.s_ts
                   AND p.p_ts <= s.s_ts + 3600000000
                   AND p.p_val > s.s_val)
       SELECT user_id, signup_id, s_val AS signup_value, purchase_id,
              p_val AS purchase_value, p_ts - s_ts AS us_to_convert
       FROM j WHERE rn = 1 ORDER BY signup_id""",

    "events_pattern_abc" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            ck AS (SELECT user_id, event_id AS click_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts
                   FROM events WHERE event_type = 'click'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            s1 AS (SELECT s.user_id, s.signup_id, s.s_ts,
                     c.click_id, c.c_ts,
                     row_number() OVER (PARTITION BY s.signup_id
                       ORDER BY c.c_ts, c.click_id) AS rn
                   FROM sg s LEFT JOIN ck c
                     ON c.user_id = s.user_id
                    AND c.c_ts > s.s_ts
                    AND c.c_ts <= s.s_ts + 3600000000),
            f1 AS (SELECT * FROM s1 WHERE rn = 1),
            s2 AS (SELECT f.user_id, f.signup_id, f.s_ts, f.click_id,
                     p.purchase_id, p.p_ts,
                     row_number() OVER (PARTITION BY f.signup_id
                       ORDER BY p.p_ts, p.purchase_id) AS rn
                   FROM f1 f LEFT JOIN pu p
                     ON p.user_id = f.user_id
                    AND p.p_ts > f.c_ts
                    AND p.p_ts <= f.s_ts + 3600000000)
       SELECT user_id, signup_id, click_id, purchase_id,
              p_ts - s_ts AS us_to_complete
       FROM s2 WHERE rn = 1 ORDER BY signup_id""",

    "events_pattern_quantified" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            ck AS (SELECT user_id, event_id AS click_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts
                   FROM events WHERE event_type = 'click'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            s1 AS (SELECT s.user_id, s.signup_id, s.s_ts,
                     c.click_id, c.c_ts,
                     row_number() OVER (PARTITION BY s.signup_id
                       ORDER BY c.c_ts, c.click_id) AS rn
                   FROM sg s LEFT JOIN ck c
                     ON c.user_id = s.user_id
                    AND c.c_ts > s.s_ts
                    AND c.c_ts <= s.s_ts + 3600000000),
            f1 AS (SELECT * FROM s1 WHERE rn = 1),
            s2 AS (SELECT f.user_id, f.signup_id, f.s_ts, f.click_id,
                     p.purchase_id, p.p_ts,
                     row_number() OVER (PARTITION BY f.signup_id
                       ORDER BY p.p_ts, p.purchase_id) AS rn
                   FROM f1 f LEFT JOIN pu p
                     ON p.user_id = f.user_id
                    AND p.p_ts > f.c_ts
                    AND p.p_ts <= f.s_ts + 3600000000),
            f2 AS (SELECT * FROM s2 WHERE rn = 1)
       SELECT f.user_id, f.signup_id, f.click_id, f.purchase_id,
              CASE WHEN f.purchase_id IS NOT NULL
                   THEN count(b.click_id) END AS b_count,
              f.p_ts - f.s_ts AS us_to_complete
       FROM f2 f LEFT JOIN ck b
         ON b.user_id = f.user_id
        AND b.c_ts > f.s_ts AND b.c_ts < f.p_ts
       GROUP BY f.user_id, f.signup_id, f.click_id, f.purchase_id,
                f.p_ts, f.s_ts
       ORDER BY f.signup_id""",

    "events_pattern_times" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            ck AS (SELECT user_id, event_id AS click_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts
                   FROM events WHERE event_type = 'click'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            s1 AS (SELECT s.user_id, s.signup_id, s.s_ts,
                     c.click_id AS click1_id, c.c_ts AS c1_ts,
                     row_number() OVER (PARTITION BY s.signup_id
                       ORDER BY c.c_ts, c.click_id) AS rn
                   FROM sg s LEFT JOIN ck c
                     ON c.user_id = s.user_id
                    AND c.c_ts > s.s_ts
                    AND c.c_ts <= s.s_ts + 3600000000),
            f1 AS (SELECT * FROM s1 WHERE rn = 1),
            s2 AS (SELECT f.user_id, f.signup_id, f.s_ts, f.click1_id,
                     c.click_id AS click2_id, c.c_ts AS c2_ts,
                     row_number() OVER (PARTITION BY f.signup_id
                       ORDER BY c.c_ts, c.click_id) AS rn
                   FROM f1 f LEFT JOIN ck c
                     ON c.user_id = f.user_id
                    AND c.c_ts > f.c1_ts
                    AND c.c_ts <= f.s_ts + 3600000000),
            f2 AS (SELECT * FROM s2 WHERE rn = 1),
            s3 AS (SELECT f.user_id, f.signup_id, f.s_ts, f.click1_id,
                     f.click2_id, p.purchase_id, p.p_ts,
                     row_number() OVER (PARTITION BY f.signup_id
                       ORDER BY p.p_ts, p.purchase_id) AS rn
                   FROM f2 f LEFT JOIN pu p
                     ON p.user_id = f.user_id
                    AND p.p_ts > f.c2_ts
                    AND p.p_ts <= f.s_ts + 3600000000)
       SELECT user_id, signup_id, click1_id, click2_id, purchase_id,
              p_ts - s_ts AS us_to_complete
       FROM s3 WHERE rn = 1 ORDER BY signup_id""",

    "events_pattern_until" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            ck AS (SELECT user_id, event_id AS click_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts
                   FROM events WHERE event_type = 'click'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            s1 AS (SELECT s.user_id, s.signup_id, s.s_ts,
                     p.purchase_id, p.p_ts,
                     row_number() OVER (PARTITION BY s.signup_id
                       ORDER BY p.p_ts, p.purchase_id) AS rn
                   FROM sg s LEFT JOIN pu p
                     ON p.user_id = s.user_id
                    AND p.p_ts > s.s_ts),
            f1 AS (SELECT * FROM s1 WHERE rn = 1)
       SELECT f.user_id, f.signup_id, f.purchase_id,
              CASE WHEN f.purchase_id IS NOT NULL
                   THEN count(b.click_id) END AS b_count,
              f.p_ts - f.s_ts AS us_to_close
       FROM f1 f LEFT JOIN ck b
         ON b.user_id = f.user_id
        AND b.c_ts > f.s_ts AND b.c_ts < f.p_ts
       GROUP BY f.user_id, f.signup_id, f.purchase_id, f.p_ts, f.s_ts
       ORDER BY f.signup_id""",

    "events_pattern_absence" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts_us
                     FROM events WHERE event_type = 'signup'),
            pu AS (SELECT user_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase')
       SELECT s.user_id, s.signup_id, s.s_ts_us
       FROM sg s
       WHERE NOT EXISTS (SELECT 1 FROM pu p
                         WHERE p.user_id = s.user_id
                           AND p.p_ts > s.s_ts_us
                           AND p.p_ts <= s.s_ts_us + 3600000000)
       ORDER BY s.signup_id""",

    "events_pattern_abandon" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            ck AS (SELECT user_id, event_id AS click_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts
                   FROM events WHERE event_type = 'click'),
            pu AS (SELECT user_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            s1 AS (SELECT s.user_id, s.signup_id, s.s_ts,
                     c.click_id, c.c_ts,
                     row_number() OVER (PARTITION BY s.signup_id
                       ORDER BY c.c_ts, c.click_id) AS rn
                   FROM sg s JOIN ck c
                     ON c.user_id = s.user_id
                    AND c.c_ts > s.s_ts
                    AND c.c_ts <= s.s_ts + 3600000000),
            f1 AS (SELECT * FROM s1 WHERE rn = 1)
       SELECT f.user_id, f.signup_id, f.click_id, f.c_ts AS c_ts_us
       FROM f1 f
       WHERE NOT EXISTS (SELECT 1 FROM pu p
                         WHERE p.user_id = f.user_id
                           AND p.p_ts > f.c_ts
                           AND p.p_ts <= f.s_ts + 3600000000)
       ORDER BY f.signup_id""",

    "events_pattern_strict" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            nx AS (SELECT user_id, event_id AS n_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS n_ts,
                       event_type AS n_type
                   FROM events),
            j AS (SELECT s.user_id, s.signup_id, n.n_id, n.n_type,
                    row_number() OVER (PARTITION BY s.signup_id
                      ORDER BY n.n_ts, n.n_id) AS rn
                  FROM sg s LEFT JOIN nx n
                    ON n.user_id = s.user_id
                   AND n.n_ts > s.s_ts
                   AND n.n_ts <= s.s_ts + 3600000000)
       SELECT user_id, signup_id,
              CASE WHEN n_type = 'click' THEN n_id END AS next_click_id
       FROM j WHERE rn = 1 ORDER BY signup_id""",

    "events_top_paths" ->
      """WITH seq AS (SELECT user_id, event_type,
                        lead(event_type, 1) OVER w AS t2,
                        lead(event_type, 2) OVER w AS t3
                      FROM events
                      WINDOW w AS (PARTITION BY user_id
                        ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id))
       SELECT event_type || '>' || t2 || '>' || t3 AS path,
              count(*) AS cnt
       FROM seq WHERE t3 IS NOT NULL
       GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10""",

    "events_pattern_optional" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            ck AS (SELECT user_id, event_id AS click_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS c_ts
                   FROM events WHERE event_type = 'click'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, signup_id, s_ts, click_id, c_ts FROM (
                    SELECT s.user_id, s.signup_id, s.s_ts, k.click_id,
                           k.c_ts,
                           row_number() OVER (PARTITION BY s.signup_id
                             ORDER BY k.c_ts, k.click_id) AS rn
                    FROM sg s JOIN ck k ON k.user_id = s.user_id
                      AND k.c_ts > s.s_ts
                      AND k.c_ts <= s.s_ts + 3600000000)
                  WHERE rn = 1),
            p1 AS (SELECT signup_id, purchase_id AS p1_id, p_ts AS p1_ts
                   FROM (
                     SELECT c.signup_id, p.purchase_id, p.p_ts,
                            row_number() OVER (PARTITION BY c.signup_id
                              ORDER BY p.p_ts, p.purchase_id) AS rn
                     FROM c JOIN pu p ON p.user_id = c.user_id
                       AND p.p_ts > c.c_ts
                       AND p.p_ts <= c.s_ts + 3600000000)
                   WHERE rn = 1),
            p0 AS (SELECT signup_id, purchase_id AS p0_id, p_ts AS p0_ts
                   FROM (
                     SELECT s.signup_id, p.purchase_id, p.p_ts,
                            row_number() OVER (PARTITION BY s.signup_id
                              ORDER BY p.p_ts, p.purchase_id) AS rn
                     FROM sg s JOIN pu p ON p.user_id = s.user_id
                       AND p.p_ts > s.s_ts
                       AND p.p_ts <= s.s_ts + 3600000000)
                   WHERE rn = 1)
       SELECT s.user_id, s.signup_id,
              CASE WHEN p1.p1_id IS NOT NULL THEN c.click_id
                   WHEN p0.p0_id IS NOT NULL THEN NULL
                   ELSE c.click_id END AS click_id,
              coalesce(p1.p1_id, p0.p0_id) AS purchase_id,
              CASE WHEN p1.p1_id IS NOT NULL THEN p1.p1_ts - s.s_ts
                   WHEN p0.p0_id IS NOT NULL THEN p0.p0_ts - s.s_ts
              END AS us_to_complete
       FROM sg s
       LEFT JOIN c ON c.signup_id = s.signup_id
       LEFT JOIN p1 ON p1.signup_id = s.signup_id
       LEFT JOIN p0 ON p0.signup_id = s.signup_id
       ORDER BY s.signup_id""",

    "events_count_window" ->
      """WITH e AS (SELECT user_id, event_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                        AS v_us
                    FROM events),
            r AS (SELECT e.*, row_number() OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id) - 1 AS rn
                  FROM e),
            g AS (SELECT user_id, rn // 5 AS win_idx, count(*) AS n,
                    min(ts_us) AS w_first_us, max(ts_us) AS w_last_us,
                    CAST(sum(v_us) AS BIGINT) AS sv
                  FROM r GROUP BY 1, 2)
       SELECT user_id, CAST(win_idx AS BIGINT) AS win_idx,
              w_first_us, w_last_us,
              CAST(sv AS DOUBLE) / 1000000 AS sum_value
       FROM g WHERE n = 5 ORDER BY user_id, win_idx""",

    "events_count_sliding" ->
      """WITH e AS (SELECT user_id, event_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                        AS v_us
                    FROM events),
            r AS (SELECT user_id, ts_us,
                    row_number() OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id) AS rn,
                    min(ts_us) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                      AS w_first_us,
                    CAST(sum(v_us) OVER (PARTITION BY user_id
                      ORDER BY ts_us, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                      AS sv
                  FROM e)
       SELECT user_id, CAST((rn - 5) // 2 AS BIGINT) AS win_idx,
              w_first_us, ts_us AS w_last_us,
              CAST(sv AS DOUBLE) / 1000000 AS sum_value
       FROM r WHERE rn >= 5 AND (rn - 5) % 2 = 0
       ORDER BY user_id, win_idx""",

    "ts_interpolate" ->
      """WITH ev AS (SELECT event_id, user_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                       CASE WHEN event_type = 'purchase' THEN value END AS pv
                     FROM events),
            nb AS (SELECT event_id, user_id, ts_us,
                     last_value(pv IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_v,
                     last_value(CASE WHEN pv IS NOT NULL THEN ts_us END
                                IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS prev_ts,
                     first_value(pv IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_v,
                     first_value(CASE WHEN pv IS NOT NULL THEN ts_us END
                                 IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_ts
                   FROM ev)
       SELECT event_id, user_id,
              round(CASE WHEN next_ts = prev_ts THEN prev_v
                         ELSE prev_v + (next_v - prev_v) *
                           CAST(ts_us - prev_ts AS DOUBLE) /
                           CAST(next_ts - prev_ts AS DOUBLE) END, 6)
                AS interp_value
       FROM nb ORDER BY event_id""",

    "events_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
                        (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) // 7
                          AS wk
                      FROM events),
            cohort AS (SELECT user_id, min(wk) AS cwk FROM act GROUP BY 1),
            cells AS (SELECT c.cwk, a.wk - c.cwk AS off,
                        count(DISTINCT a.user_id) AS n_users
                      FROM act a JOIN cohort c ON a.user_id = c.user_id
                      WHERE a.wk - c.cwk <= 4
                      GROUP BY 1, 2),
            base AS (SELECT cwk AS bwk, n_users AS n0 FROM cells
                     WHERE off = 0)
       SELECT c.cwk AS cohort_week, c.off AS week_offset, c.n_users,
              CAST((2 * c.n_users * 1000000 + b.n0) // (2 * b.n0)
                AS DOUBLE) / 1000000 AS retention
       FROM cells c JOIN base b ON c.cwk = b.bwk
       ORDER BY cohort_week, week_offset""",

    "events_burst" ->
      """WITH hc AS (SELECT event_type,
                       epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000
                         AS hb,
                       count(*) AS cnt
                     FROM events GROUP BY 1, 2),
            t AS (SELECT event_type, hb, cnt,
                    CAST(sum(cnt) OVER (PARTITION BY event_type
                      ORDER BY hb ROWS BETWEEN 24 PRECEDING
                      AND 1 PRECEDING) AS BIGINT) AS trail_sum,
                    CAST(count(cnt) OVER (PARTITION BY event_type
                      ORDER BY hb ROWS BETWEEN 24 PRECEDING
                      AND 1 PRECEDING) AS BIGINT) AS n_trail
                  FROM hc)
       SELECT event_type, hb, cnt, trail_sum, n_trail,
              (n_trail > 0 AND cnt * n_trail > trail_sum * 3) AS is_burst
       FROM t ORDER BY event_type, hb""",

    "events_conversion_lag" ->
      """WITH sg AS (SELECT user_id, event_id AS signup_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts
                     FROM events WHERE event_type = 'signup'),
            pu AS (SELECT user_id, event_id AS purchase_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
            j AS (SELECT s.signup_id, p.p_ts - s.s_ts AS lag_us,
                    row_number() OVER (PARTITION BY s.signup_id
                      ORDER BY p.p_ts, p.purchase_id) AS rn
                  FROM sg s JOIN pu p
                    ON p.user_id = s.user_id
                   AND p.p_ts > s.s_ts
                   AND p.p_ts <= s.s_ts + 3600000000)
       SELECT lag_us // 300000000 AS bucket_5min,
              count(*) AS n_conversions,
              min(lag_us) AS min_lag_us,
              max(lag_us) AS max_lag_us
       FROM j WHERE rn = 1
       GROUP BY 1 ORDER BY bucket_5min""",

    "events_dau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                         AS day
                     FROM events),
            fd AS (SELECT user_id, min(day) AS day FROM ud GROUP BY 1),
            dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
            nu AS (SELECT day, count(*) AS new_users FROM fd GROUP BY 1)
       SELECT d.day, d.dau,
              COALESCE(n.new_users, 0) AS new_users,
              d.dau - COALESCE(n.new_users, 0) AS returning_users,
              CAST(sum(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_users
       FROM dau d LEFT JOIN nu n ON d.day = n.day
       ORDER BY d.day""",

    "events_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
                       epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                         AS day,
                       year(CAST(ts AS TIMESTAMP)) * 100 +
                         month(CAST(ts AS TIMESTAMP)) AS ym
                     FROM events),
            dau AS (SELECT ym, day, count(*) AS dau FROM ud
                    GROUP BY 1, 2),
            mau AS (SELECT ym, count(*) AS mau FROM
                      (SELECT DISTINCT user_id, ym FROM ud)
                    GROUP BY 1),
            mo AS (SELECT ym, sum(dau) AS sum_dau, count(*) AS n_days
                   FROM dau GROUP BY 1)
       SELECT m.ym, m.n_days, u.mau,
              round(m.sum_dau / m.n_days, 6) AS avg_dau,
              round(m.sum_dau / (m.n_days * u.mau), 6) AS stickiness
       FROM mo m JOIN mau u ON m.ym = u.ym
       ORDER BY m.ym""",

    "events_transitions" ->
      """WITH e AS (SELECT user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                      event_id, event_type
                    FROM events),
            t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id) AS from_type,
                          event_type AS to_type
                  FROM e),
            c AS (SELECT from_type, to_type, count(*) AS n_trans
                  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2),
            a AS (SELECT *, sum(n_trans) OVER (PARTITION BY from_type)
                    AS n_from
                  FROM c)
       SELECT from_type, to_type, n_trans,
              CAST((2 * n_trans * 1000000 + n_from) // (2 * n_from)
                AS DOUBLE) / 1000000 AS prob
       FROM a ORDER BY from_type, to_type""",

    "events_attribution" ->
      """WITH e AS (SELECT user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                      event_id, event_type,
                      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                        AS v_us
                    FROM events),
            pu AS (SELECT user_id, event_id AS purchase_id,
                     ts_us AS p_ts, v_us
                   FROM e WHERE event_type = 'purchase'),
            ck AS (SELECT user_id AS c_user, event_id AS click_id,
                     ts_us AS c_ts
                   FROM e WHERE event_type = 'click'),
            j AS (SELECT p.user_id, p.purchase_id, p.v_us, c.click_id,
                    count(c.click_id) OVER (PARTITION BY p.purchase_id)
                      AS n_touch,
                    row_number() OVER (PARTITION BY p.purchase_id
                      ORDER BY c.c_ts DESC, c.click_id DESC) AS rn
                  FROM pu p LEFT JOIN ck c
                    ON c.c_user = p.user_id
                   AND c.c_ts < p.p_ts
                   AND c.c_ts >= p.p_ts - 3600000000)
       SELECT user_id, purchase_id, n_touch, click_id AS last_click_id,
              CASE WHEN n_touch > 0 THEN
                CAST((2 * v_us + n_touch) // (2 * n_touch) AS DOUBLE)
                  / 1000000 END AS credit_per_touch
       FROM j WHERE rn = 1 ORDER BY purchase_id""",

    "events_ab_test" ->
      """WITH f AS (SELECT user_id, user_id % 2 AS variant,
                      CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                          ELSE 0 END) AS BIGINT) AS k
                    FROM events GROUP BY 1, 2),
            v AS (SELECT variant, count(*) AS n,
                    CAST(sum(k) AS BIGINT) AS s,
                    CAST(sum(k * k) AS BIGINT) AS sq
                  FROM f GROUP BY 1),
            a AS (SELECT n AS n1, s AS s1, sq AS sq1 FROM v
                  WHERE variant = 0),
            b AS (SELECT n AS n2, s AS s2, sq AS sq2 FROM v
                  WHERE variant = 1)
       SELECT n1, s1, n2, s2,
              CAST((2 * s1 * 1000000 + n1) // (2 * n1) AS DOUBLE) / 1000000
                AS mean1,
              CAST((2 * s2 * 1000000 + n2) // (2 * n2) AS DOUBLE) / 1000000
                AS mean2,
              CASE WHEN n1 > 1 AND n2 > 1 AND
                     CAST(n1 * sq1 - s1 * s1 AS DOUBLE)
                       / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1
                     + CAST(n2 * sq2 - s2 * s2 AS DOUBLE)
                       / (CAST(n2 AS DOUBLE) * (n2 - 1)) / n2 > 0 THEN
                (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                  / sqrt(CAST(n1 * sq1 - s1 * s1 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * (n1 - 1)) / n1
                    + CAST(n2 * sq2 - s2 * s2 AS DOUBLE)
                      / (CAST(n2 AS DOUBLE) * (n2 - 1)) / n2)
              END AS z
       FROM a, b""",

    "events_rfm" -> {
      val qs = Seq(0.2, 0.4, 0.6, 0.8)
      val bcols = Seq("recency_days" -> "rb", "frequency" -> "fb",
        "m_us" -> "mb").flatMap { case (m, p) =>
        qs.zipWithIndex.map { case (q, i) =>
          s"round(quantile_cont($m, $q), 6) AS $p${i + 1}" }
      }.mkString(",\n                    ")
      def sc(metric: String, b: String, op: String): String =
        (1 to 4).map(k =>
          s"CASE WHEN $metric $op $b$k THEN 1 ELSE 0 END")
          .mkString("1 + ", " + ", "")
      s"""WITH p AS (SELECT user_id,
                       max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
                       count(*) AS frequency,
                       sum(CAST(CAST(value AS DECIMAL(38,6)) * 1000000
                         AS BIGINT)) AS m_us
                     FROM events WHERE event_type = 'purchase'
                     GROUP BY 1),
            mx AS (SELECT max(last_us) AS mxus FROM p),
            rm AS (SELECT user_id,
                     (mxus - last_us) // 86400000000 AS recency_days,
                     frequency, m_us
                   FROM p, mx),
            b AS (SELECT $bcols
                  FROM rm),
            s AS (SELECT user_id, recency_days, frequency,
                    CAST(m_us AS DOUBLE) / 1000000 AS monetary,
                    ${sc("recency_days", "rb", "<")} AS r_score,
                    ${sc("frequency", "fb", ">")} AS f_score,
                    ${sc("m_us", "mb", ">")} AS m_score
                  FROM rm, b)
       SELECT user_id, recency_days, frequency, monetary,
              r_score, f_score, m_score,
              CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                     THEN 'champion'
                   WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
                   WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                   WHEN r_score <= 2 AND f_score <= 2 THEN 'lost'
                   ELSE 'regular' END AS segment
       FROM s ORDER BY user_id"""
    },

    "events_type_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
            sz AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
            pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     count(*) AS n_both
                   FROM ut a JOIN ut b
                     ON a.user_id = b.user_id
                    AND a.event_type < b.event_type
                   GROUP BY 1, 2)
       SELECT p.type_a, p.type_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
              CAST((2 * p.n_both * 1000000 + (sa.n + sb.n - p.n_both))
                // (2 * (sa.n + sb.n - p.n_both)) AS DOUBLE) / 1000000
                AS jaccard
       FROM pr p
       JOIN sz sa ON sa.event_type = p.type_a
       JOIN sz sb ON sb.event_type = p.type_b
       ORDER BY type_a, type_b""",

    "ts_zscore" ->
      """WITH e AS (SELECT event_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
                      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                        AS v_us
                    FROM events),
            st AS (SELECT event_id, user_id, value, v_us,
                     count(v_us) OVER w AS n,
                     sum(v_us) OVER w AS s1,
                     sum(v_us * v_us) OVER w AS s2
                   FROM e
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS BETWEEN 20 PRECEDING
                                         AND 1 PRECEDING)),
            zz AS (SELECT event_id, user_id, value,
                     CASE WHEN n >= 5 AND n * s2 - s1 * s1 > 0 THEN
                       CAST(n * v_us - s1 AS DOUBLE)
                         / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) END AS z
                   FROM st)
       SELECT event_id, user_id, value, z,
              (z IS NOT NULL AND abs(z) > 3) AS is_anomaly
       FROM zz ORDER BY event_id""",

    "ts_ewma" -> {
      val lagDefs = (1 until 10).map(k =>
        s"lag(v_us, $k) OVER w AS l$k").mkString(",\n                 ")
      val numTerms = (0 until 10).map { k =>
        val wt = 512L >> k
        if (wt == 1L) s"CASE WHEN l$k IS NOT NULL THEN l$k ELSE 0 END"
        else s"CASE WHEN l$k IS NOT NULL THEN l$k * $wt ELSE 0 END"
      }.mkString(" +\n                 ")
      val denTerms = (0 until 10).map { k =>
        s"CASE WHEN l$k IS NOT NULL THEN ${512L >> k} ELSE 0 END"
      }.mkString(" +\n                 ")
      s"""WITH e AS (SELECT event_id, user_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                      CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                        AS v_us
                    FROM events),
            l AS (SELECT event_id, user_id, v_us AS l0,
                 $lagDefs
                  FROM e
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts_us, event_id)),
            a AS (SELECT event_id, user_id,
                 ($numTerms) AS n,
                 ($denTerms) AS dn
                  FROM l)
       SELECT event_id, user_id,
              CAST((2 * n + dn) // (2 * dn) AS DOUBLE) / 1000000 AS ewma
       FROM a ORDER BY event_id"""
    },

    "ts_resample" ->
      """WITH e AS (SELECT user_id, event_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
                    FROM events),
            b AS (SELECT user_id, ts_us // 900000000 AS bkt, value,
                    first_value(value) OVER (
                      PARTITION BY user_id, ts_us // 900000000
                      ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS o,
                    last_value(value) OVER (
                      PARTITION BY user_id, ts_us // 900000000
                      ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS c
                  FROM e)
       SELECT user_id, CAST(bkt * 900000000 AS BIGINT) AS bucket_start_us,
              count(*) AS n_events, min(o) AS open_v, max(value) AS high_v,
              min(value) AS low_v, min(c) AS close_v
       FROM b GROUP BY user_id, bkt
       ORDER BY user_id, bucket_start_us""",

    "ts_gapfill" ->
      """WITH h AS (SELECT event_type,
                      date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb,
                      count(*) AS cnt
                    FROM events GROUP BY 1, 2),
            bounds AS (SELECT event_type, min(hb) AS mn, max(hb) AS mx
                       FROM h GROUP BY 1),
            grid AS (SELECT event_type,
                       unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hb
                     FROM bounds)
       SELECT g.event_type, g.hb, coalesce(h.cnt, 0) AS cnt
       FROM grid g LEFT JOIN h ON h.event_type = g.event_type
         AND h.hb = g.hb
       ORDER BY g.event_type, g.hb""",

    "fn_string" ->
      """SELECT p_partkey,
                upper(p_name) AS up,
                lower(p_type) AS lo,
                substring(p_name, 1, 5) AS sub,
                CAST(length(p_name) AS INT) AS len,
                concat_ws('-', p_brand, p_type) AS cw,
                lpad(CAST(p_size AS VARCHAR), 3, '0') AS lp,
                replace(p_type, ' ', '_') AS rep,
                CAST(instr(p_name, 'a') AS INT) AS pos
         FROM part ORDER BY p_partkey""",

    "fn_regex" ->
      """SELECT p_partkey,
                regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
                regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
                regexp_matches(p_brand, 'Brand#1[0-9]') AS is_teen_brand
         FROM part ORDER BY p_partkey""",

    // States the expected decomposition of the deterministically
    // synthesized URLs directly — asserting parse_url's parts, not
    // re-implementing a parser in SQL.
    "fn_url" ->
      """SELECT doc_id,
                'https://' || source || '.example.com/docs/' || doc_id
                  || '?lang=' || lang || '&v=2' AS url,
                source || '.example.com' AS host,
                '/docs/' || doc_id AS path,
                'lang=' || lang || '&v=2' AS query,
                lang AS q_lang,
                'https' AS scheme
         FROM documents ORDER BY doc_id""",

    "fn_wordcount" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         GROUP BY 1 ORDER BY 1""",

    "fn_date" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS dd,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
                o_orderdate + INTERVAL 30 DAY AS plus30,
                CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
                last_day(o_orderdate) AS ldom
         FROM orders ORDER BY o_orderkey""",

    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
                abs(l_discount - 0.05) AS ab,
                CAST(floor(l_extendedprice) AS BIGINT) AS fl,
                CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
                pow(l_quantity, 2) AS pw,
                round(sqrt(l_extendedprice), 6) AS sq,
                round(ln(l_extendedprice), 6) AS ln_val,
                round(log10(l_extendedprice), 6) AS lg,
                l_orderkey % 7 AS pm
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""",

    "fn_conditional" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal > 8000 THEN 'high'
                     WHEN c_acctbal > 3000 THEN 'mid'
                     ELSE 'low' END AS tier,
                coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg_or_none,
                greatest(c_acctbal, 5000.0) AS gr,
                least(c_acctbal, 5000.0) AS le
         FROM customer ORDER BY c_custkey""",

    "fn_array" ->
      """SELECT vec_id,
                CAST(len(embedding) AS INT) AS dim,
                CAST(embedding[1] AS DOUBLE) AS first_val,
                array_to_string(list_transform(embedding[1:3],
                  x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(10,6))
                    AS VARCHAR)), ',') AS head3,
                CAST(list_position(embedding, embedding[3]) AS BIGINT) AS pos3
         FROM embeddings ORDER BY vec_id""",

    "fn_array_hof" ->
      """SELECT vec_id,
                CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
                round(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq
         FROM embeddings ORDER BY vec_id""",

    "fn_bitwise" ->
      """SELECT o_orderkey,
                o_orderkey & 255 AS band,
                o_orderkey | 4096 AS bor,
                xor(o_orderkey, o_custkey) AS bxor,
                o_orderkey << 3 AS shl,
                o_orderkey >> 2 AS shr,
                CAST(bit_count(o_orderkey) AS INT) AS popcount
         FROM orders ORDER BY o_orderkey""",

    "fn_hash" ->
      """SELECT p_partkey,
                md5(p_name) AS h_md5,
                sha256(p_name) AS h_sha256,
                CAST(length(md5(p_name)) AS INT) AS len_md5
         FROM part ORDER BY p_partkey""",

    "fn_map" ->
      """WITH b AS (
           SELECT c_custkey,
                  [struct_pack(k := 'bal', v := CAST(c_acctbal AS DOUBLE)),
                   struct_pack(k := 'key', v := CAST(c_custkey AS DOUBLE)),
                   struct_pack(k := 'nat', v := CAST(c_nationkey AS DOUBLE))]
                    AS ents
           FROM customer)
         SELECT c_custkey,
                CAST(len(ents) AS INT) AS m_size,
                CAST(CAST(ents[1].v AS DECIMAL(14,2)) AS VARCHAR) AS bal,
                coalesce(array_to_string(list_sort(list_transform(
                  list_filter(ents, e -> e.v >= 1000),
                  e -> e.k || '=' ||
                    CAST(CAST(e.v AS DECIMAL(14,2)) AS VARCHAR))), ';'), '')
                  AS big_entries,
                array_to_string(list_sort(list_transform(ents,
                  e -> e.k || '=' ||
                    CAST(CAST(e.v * 2 AS DECIMAL(14,2)) AS VARCHAR))), ';')
                  AS doubled,
                array_to_string(list_sort(list_transform(
                  ents || [struct_pack(k := 'one', v := CAST(1.0 AS DOUBLE))],
                  e -> e.k || '=' ||
                    CAST(CAST(e.v AS DECIMAL(14,2)) AS VARCHAR))), ';')
                  AS merged,
                array_to_string(list_transform(ents, e -> e.k), ',') AS mkeys,
                len(list_filter(ents, e -> e.k = 'nat')) > 0 AS has_nat
         FROM b ORDER BY c_custkey""",

    "fn_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INT) AS k,
                array_to_string(list_sort(json_keys(props)), ',') AS keys,
                CAST(len(json_keys(props)) AS INT) AS n_keys
         FROM events ORDER BY event_id"""
  )
}
