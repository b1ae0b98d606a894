package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.E analytic window functions (SURVEY.md §2.1 E).
  *
  * Every window is partitioned by a key (customer/brand/user) so state per
  * partition is bounded and the single shuffle is by that key — the same
  * plan a 1000-executor cluster runs. All orderings carry a unique pk
  * tie-break (D1) so ranks and frames are deterministic.
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "window_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "window_rank_dense" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc)
      part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
    }),

    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_utc"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec(col("o_totalprice"))).over(w).cast("double")
            .as("run_spend"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    "window_range_frame" -> ((s, d) => {
      // 30-day trailing spend: RANGE frame over an integer day number —
      // numeric on both sides so Spark and DuckDB agree on frame bounds.
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
        .rangeBetween(-30, 0)
      orders(s, d)
        .withColumn("day_num",
          datediff(col("o_orderdate"), lit("1995-01-01")))
        .select(col("o_custkey"), col("o_orderkey"), col("day_num"),
          sum(dec(col("o_totalprice"))).over(w).cast("double")
            .as("trail_spend"))
        .orderBy(col("o_custkey"), col("day_num"), col("o_orderkey"))
    }),

    // Batch sessionization (gaps-and-islands; round-2 add): the BATCH form
    // of stream_session — a new session starts when the gap to the
    // previous event exceeds 10 minutes; session id is the running count
    // of session starts. Two windows over ONE (user_id)-keyed sort: lag
    // and the cumulative sum share the same shuffle+sort, so the whole op
    // is a single exchange (the classic warehouse sessionize).
    "window_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_utc"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      // gap compared in exact integer MICROSECONDS on both engines: a
      // whole-second cast truncates fractional gaps and flips sessions
      // whose gap straddles the 600 s boundary by <1 s (observed sf0.01).
      events(s, d)
        .withColumn("gap_us",
          unix_micros(col("ts_utc")) -
            lag(unix_micros(col("ts_utc")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 600000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .select(col("user_id"), col("event_id"), col("sess_id"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "window_ntile_pctrank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"))
        .orderBy(col("c_custkey"))
    }),

    "window_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      part(s, d)
        .select(col("p_partkey"), col("p_brand"),
          first(col("p_name")).over(w).as("cheapest"),
          last(col("p_name")).over(w).as("priciest"))
        .orderBy(col("p_partkey"))
    }),

    // IGNORE NULLS frames (round-4 add): carry each user's last-seen
    // purchase value forward across their event timeline — the
    // fill-forward idiom for sparse observations (sensor readings,
    // prices) over a dense event clock. One window shuffle keyed by
    // user_id; the running frame is O(1) state per row.
    "window_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"),
          when(col("event_type") === "purchase", col("value")).as("pv"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          last(col("pv"), ignoreNulls = true).over(w)
            .as("last_purchase_value"))
        .orderBy(col("event_id"))
    }),

    // cume_dist + nth_value (round-5 add): each part's cumulative price
    // percentile within its brand, plus the brand's second-cheapest
    // partkey visible from each row's prefix frame. The order carries
    // the p_partkey tie-break (D1) so the prefix frame is deterministic;
    // cume_dist is a ratio of two ints evaluated by the identical
    // double division on both engines, rounded (D4). One brand-keyed
    // shuffle serves both functions.
    "window_cume_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          round(cume_dist().over(w), 6).as("price_pctile"),
          nth_value(col("p_partkey"), 2).over(wf).as("second_cheapest"))
        .orderBy(col("p_brand"), col("p_retailprice"), col("p_partkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "window_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3
         ORDER BY o_custkey, rn""",

    "window_rank_dense" ->
      """SELECT p_brand, p_partkey, p_retailprice,
                rank() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC) AS rnk,
                dense_rank() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC) AS drnk
         FROM part
         ORDER BY p_brand, p_retailprice DESC, p_partkey""",

    "window_lag_lead" ->
      """SELECT user_id, event_id, value,
                lag(value, 1) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value,
                lead(event_type, 1) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
         FROM events
         ORDER BY user_id, event_id""",

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS DOUBLE) AS run_spend
         FROM orders
         ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey, day_num,
                CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
                  PARTITION BY o_custkey ORDER BY day_num
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
                ) AS DOUBLE) AS trail_spend
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS day_num
               FROM orders)
         ORDER BY o_custkey, day_num, o_orderkey""",

    "window_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
                    FROM events),
            g AS (SELECT user_id, event_id, t,
                    CASE WHEN epoch_us(t) - lag(epoch_us(t)) OVER (
                           PARTITION BY user_id ORDER BY t, event_id)
                           <= 600000000
                         THEN 0 ELSE 1 END AS new_sess
                  FROM e)
         SELECT user_id, event_id,
                CAST(sum(new_sess) OVER (PARTITION BY user_id
                  ORDER BY t, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
         FROM g ORDER BY user_id, event_id""",

    "window_ntile_pctrank" ->
      """SELECT c_custkey, c_mktsegment,
                ntile(4) OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey) AS quartile,
                round(percent_rank() OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey), 6) AS pct_rank
         FROM customer
         ORDER BY c_custkey""",

    "window_first_last" ->
      """SELECT p_partkey, p_brand,
                first_value(p_name) OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice, p_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                ) AS cheapest,
                last_value(p_name) OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice, p_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                ) AS priciest
         FROM part
         ORDER BY p_partkey""",

    "window_ignore_nulls" ->
      """SELECT event_id, user_id, event_type,
                last_value(CASE WHEN event_type = 'purchase' THEN value END
                           IGNORE NULLS)
                  OVER (PARTITION BY user_id
                        ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS last_purchase_value
         FROM events
         ORDER BY event_id""",

    "window_cume_nth" ->
      """SELECT p_brand, p_partkey, p_retailprice,
                round(cume_dist() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice, p_partkey), 6) AS price_pctile,
                nth_value(p_partkey, 2) OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice, p_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS second_cheapest
         FROM part
         ORDER BY p_brand, p_retailprice, p_partkey"""
  )
}
