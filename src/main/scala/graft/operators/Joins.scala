package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.C joins (SURVEY.md §2.1 C) — all join shapes the engine supports.
  *
  * Scale posture per join:
  *  - dim⋈dim (`join_broadcast`, `join_cross`): explicit `broadcast()` hint
  *    so no shuffle happens regardless of statistics.
  *  - fact⋈fact (`join_shuffle_inner`, `join_theta_range`): equi-keys drive
  *    a shuffled sort-merge/hash join; the θ part rides the equi-key as a
  *    post-join filter, so there is never an unbounded range scan.
  *  - `join_asof` is the Spark-native as-of form: equi-join on the user key
  *    + time predicate, then `row_number` per left row — shuffles once by
  *    key; no driver-side state (Spark has no native ASOF join).
  */
object Joins {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "join_broadcast" -> ((s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"), "inner")
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))),

    // D1: (l_orderkey, l_linenumber) is not unique (see Relational); the
    // lineitem-grain join results tie-break on l_extendedprice before the
    // final projection drops it.
    "join_shuffle_inner" -> ((s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "inner")
        .orderBy(col("o_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_orderdate"),
          col("l_quantity"), col("o_orderstatus"))),

    "join_left_outer" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"),
          coalesce(dec(col("o_totalprice")), dec(lit(0))).cast("double")
            .as("price_or_zero"))
        .orderBy(col("c_custkey"), asc_nulls_first("o_orderkey"))),

    "join_right_outer" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d), col("c_custkey") === col("o_custkey"), "right")
        .select(col("c_custkey"), col("o_orderkey"),
          coalesce(dec(col("o_totalprice")), dec(lit(0))).cast("double")
            .as("price_or_zero"))
        .orderBy(col("c_custkey"), asc_nulls_first("o_orderkey"))),

    "join_full_outer" -> ((s, d) => {
      val su = supplier(s, d).filter(col("s_acctbal") > 8000)
      val cu = customer(s, d).filter(col("c_acctbal") > 9000)
      su.join(cu, col("s_nationkey") === col("c_nationkey"), "full")
        .groupBy(coalesce(col("s_nationkey"), col("c_nationkey"))
          .as("nationkey"))
        .agg(count(col("s_suppkey")).as("n_supp"),
          count(col("c_custkey")).as("n_cust"))
        .orderBy(col("nationkey"))
    }),

    "join_left_semi" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "join_left_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "join_cross" -> ((s, d) =>
      region(s, d).crossJoin(broadcast(nation(s, d)))
        .select(col("r_regionkey"), col("n_nationkey"), col("r_name"),
          col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))),

    "join_theta_range" -> ((s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey") &&
          datediff(col("l_shipdate"), col("o_orderdate")).between(0, 90),
          "inner")
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"))),

    "join_self_agg" -> ((s, d) => {
      val a = part(s, d).select(col("p_brand"), col("p_partkey"))
      val b = part(s, d).select(col("p_brand").as("b_brand"),
        col("p_partkey").as("b_partkey"))
      a.join(b, col("p_brand") === col("b_brand") &&
          col("p_partkey") < col("b_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("p_brand"))
    }),

    "join_asof" -> ((s, d) => {
      val e = events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts_utc").as("p_ts"),
          col("user_id"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts_utc").as("c_ts"),
          col("user_id").as("c_user"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(desc_nulls_last("c_ts"), desc_nulls_last("c_id"))
      p.join(c, col("user_id") === col("c_user") &&
          col("c_ts") <= col("p_ts"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_id"), col("p_ts"), col("c_id"), col("c_ts"))
        .orderBy(col("p_id"))
    }),

    // Forward as-of join (round-5 add): each purchase matched to the
    // FIRST click AT OR AFTER it — the next-event direction ("what did
    // the user do right after converting") that complements join_asof's
    // backward lookup. Identical scale shape: user-keyed hash equi-join
    // with the time bound as residual, one per-purchase row_number pick,
    // ascending with id tie-break (D1).
    "join_asof_forward" -> ((s, d) => {
      val e = events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts_utc").as("p_ts"),
          col("user_id"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("ts_utc").as("c_ts"),
          col("user_id").as("c_user"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(asc_nulls_last("c_ts"), asc_nulls_last("c_id"))
      p.join(c, col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_id"), col("p_ts"), col("c_id"), col("c_ts"))
        .orderBy(col("p_id"))
    }),

    // Pure interval join with NO equi-key (round-4 add): per purchase,
    // how many error events (ANY user) landed within ±1 s. Naively this
    // is a range-predicate-only join — a broadcast-nested-loop /
    // cartesian at scale. The scale-safe shape implemented here is the
    // BINNED range join: both sides key by a 1 s time bucket, the
    // narrower side explodes into its {b−1, b, b+1} neighbor buckets
    // (each real pair then meets in EXACTLY one bucket — the probe's own
    // bucket — so no dedup is needed), and the exact |Δt| ≤ 1 s residual
    // filters inside the hash join. Cost: one 3× fan-out + one
    // equi-shuffle, never O(n²); PlanShapeSpec asserts no
    // nested-loop/cartesian operator survives in the physical plan.
    "join_interval_bucketed" -> ((s, d) => {
      val BucketUs = 1000000L
      val ev = events(s, d).withColumn("ts_us", expr("ts div 1000"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts_us").as("p_ts"),
          expr(s"ts_us div $BucketUs").as("b"))
      val er = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("ts_us").as("e_ts"),
          expr(s"ts_us div $BucketUs").as("eb"))
        .withColumn("b",
          explode(array(col("eb") - 1, col("eb"), col("eb") + 1)))
      val near = pu.join(er, Seq("b"), "inner")
        .filter(abs(col("e_ts") - col("p_ts")) <= BucketUs)
        .groupBy(col("p_id")).agg(count(lit(1)).as("n_near_errors"))
      pu.select(col("p_id").as("event_id"))
        .join(near.withColumnRenamed("p_id", "event_id"),
          Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_near_errors"), lit(0L)).as("n_near_errors"))
        .orderBy(col("event_id"))
    }),

    // MERGE / upsert (round-4 add): the SCD ingest pattern — a target
    // table merged with an update batch in ONE full-outer equi-join pass
    // (matched → update, source-only → insert, target-only → keep).
    // Spark has no MERGE INTO against plain parquet, so this is the
    // DataFrame shape that implements it; at 100 TB the join shuffles
    // both sides on the key once (or zero times against a bucketed
    // target — graft.sources.Bucketing). Synthetic batches from orders:
    // target = okey%10<8, updates = okey%7=0 at 1.1× price (per-row
    // decimal cast, no aggregation, so D2/D4 can't bite).
    // Salted skew join, oracle-gated (round-5 add): the registered face
    // of [[SkewJoin.saltedJoin]] — orders ⋈ customer salted 4 ways (fact
    // rows take a deterministic row-hash salt, the dim side replicates
    // ×4), then the mktsegment rollup. The RESULT is salt-invariant by
    // construction (every salt sees the full dim), which is exactly what
    // the DuckDB plain-join oracle certifies; SkewJoinSpec additionally
    // asserts row-level equivalence with the unsalted join. The manual
    // weapon for hot keys AQE's runtime skew-split can't absorb.
    "join_skew_salted" -> ((s, d) =>
      SkewJoin.saltedJoin(orders(s, d), customer(s, d),
          "o_custkey", "c_custkey", 4)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("c_mktsegment"))),

    "merge_upsert" -> ((s, d) => {
      val tgt = orders(s, d).filter(pmod(col("o_orderkey"), lit(10)) < 8)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("t_price"))
      val src = orders(s, d).filter(pmod(col("o_orderkey"), lit(7)) === 0)
        .select(col("o_orderkey").as("sk"), col("o_totalprice").as("s_price"))
      tgt.join(src, col("k") === col("sk"), "full")
        .select(
          coalesce(col("k"), col("sk")).as("o_orderkey"),
          when(col("k").isNotNull && col("sk").isNotNull,
              dec(col("s_price") * lit(1.1)))
            .when(col("k").isNull, dec(col("s_price")))
            .otherwise(dec(col("t_price")))
            .cast("double").as("price"),
          when(col("k").isNotNull && col("sk").isNotNull, lit("update"))
            .when(col("k").isNull, lit("insert"))
            .otherwise(lit("keep")).as("action"))
        .orderBy(col("o_orderkey"))
    }),

    // SCD Type-2 merge (round-5 add): history-preserving upsert —
    // where merge_upsert overwrites (type 1), type 2 CLOSES the old
    // version (valid_to stamped) and OPENS a new one, keeping the full
    // validity timeline. One inner join closes, one projection opens,
    // one anti join keeps — all equi-keyed on the business key, union
    // at the end; against a bucketed target every leg is shuffle-free
    // (the merge_upsert/Bucketing posture). Updated rows take the
    // merge_upsert decimal discipline (1.1× through dec()).
    "merge_scd2" -> ((s, d) => {
      val tgt = customer(s, d)
        .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
          lit(0L).as("valid_from"),
          lit(null).cast("long").as("valid_to"))
      val upd = customer(s, d)
        .filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select(col("c_custkey").as("uk"),
          dec(col("c_acctbal") * lit(1.1)).cast("double").as("new_bal"))
      val closed = tgt.join(upd, col("k") === col("uk"), "inner")
        .select(col("k"), dec(col("bal")).cast("double").as("bal"),
          col("valid_from"), lit(1L).as("valid_to"))
      val opened = upd.select(col("uk").as("k"),
        col("new_bal").as("bal"), lit(1L).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
      val kept = tgt.join(upd, col("k") === col("uk"), "left_anti")
        .select(col("k"), dec(col("bal")).cast("double").as("bal"),
          col("valid_from"), col("valid_to"))
      kept.unionByName(closed).unionByName(opened)
        .orderBy(col("k"), col("valid_from"))
    })
  )

  val oracle: Map[String, String] = Map(
    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",

    "join_shuffle_inner" ->
      """SELECT o_orderkey, l_linenumber, o_orderdate, l_quantity, o_orderstatus
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         ORDER BY o_orderkey, l_linenumber, l_extendedprice""",

    "join_left_outer" ->
      """SELECT c_custkey, o_orderkey,
                CAST(coalesce(CAST(o_totalprice AS DECIMAL(38,6)),
                         CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS price_or_zero
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",

    "join_right_outer" ->
      """SELECT c_custkey, o_orderkey,
                CAST(coalesce(CAST(o_totalprice AS DECIMAL(38,6)),
                         CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS price_or_zero
         FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",

    "join_full_outer" ->
      """SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
                count(s_suppkey) AS n_supp, count(c_custkey) AS n_cust
         FROM (SELECT * FROM supplier WHERE s_acctbal > 8000) s
         FULL OUTER JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
           ON s_nationkey = c_nationkey
         GROUP BY 1 ORDER BY 1""",

    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
         FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""",

    "join_theta_range" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS lag_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           AND date_diff('day', o_orderdate, l_shipdate) BETWEEN 0 AND 90
         ORDER BY l_orderkey, l_linenumber, l_extendedprice""",

    "join_self_agg" ->
      """SELECT a.p_brand AS p_brand, count(*) AS n_pairs
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
         GROUP BY 1 ORDER BY 1""",

    "join_asof" ->
      """SELECT p.event_id AS p_id, CAST(p.ts AS TIMESTAMP) AS p_ts,
                c.event_id AS c_id, CAST(c.ts AS TIMESTAMP) AS c_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON c.user_id = p.user_id
          AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         QUALIFY row_number() OVER (PARTITION BY p.event_id
           ORDER BY CAST(c.ts AS TIMESTAMP) DESC NULLS LAST,
                    c.event_id DESC NULLS LAST) = 1
         ORDER BY p_id""",

    "join_asof_forward" ->
      """SELECT p.event_id AS p_id, CAST(p.ts AS TIMESTAMP) AS p_ts,
                c.event_id AS c_id, CAST(c.ts AS TIMESTAMP) AS c_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON c.user_id = p.user_id
          AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
         QUALIFY row_number() OVER (PARTITION BY p.event_id
           ORDER BY CAST(c.ts AS TIMESTAMP) ASC NULLS LAST,
                    c.event_id ASC NULLS LAST) = 1
         ORDER BY p_id""",

    "join_interval_bucketed" ->
      """SELECT p.event_id, count(e.event_id) AS n_near_errors
         FROM (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts
               FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_ts
                    FROM events WHERE event_type = 'error') e
           ON abs(e.e_ts - p.p_ts) <= 1000000
         GROUP BY p.event_id
         ORDER BY p.event_id""",

    "merge_scd2" ->
      """WITH upd AS (SELECT c_custkey AS uk,
                        CAST(CAST(c_acctbal * 1.1 AS DECIMAL(38,6))
                          AS DOUBLE) AS new_bal
                      FROM customer WHERE c_custkey % 7 = 0),
            kept AS (SELECT c.c_custkey AS k,
                       CAST(CAST(c.c_acctbal AS DECIMAL(38,6)) AS DOUBLE)
                         AS bal,
                       CAST(0 AS BIGINT) AS valid_from,
                       CAST(NULL AS BIGINT) AS valid_to
                     FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM upd u
                                       WHERE u.uk = c.c_custkey)),
            closed AS (SELECT c.c_custkey AS k,
                         CAST(CAST(c.c_acctbal AS DECIMAL(38,6)) AS DOUBLE)
                           AS bal,
                         CAST(0 AS BIGINT) AS valid_from,
                         CAST(1 AS BIGINT) AS valid_to
                       FROM customer c JOIN upd u ON u.uk = c.c_custkey),
            opened AS (SELECT uk AS k, new_bal AS bal,
                         CAST(1 AS BIGINT) AS valid_from,
                         CAST(NULL AS BIGINT) AS valid_to
                       FROM upd)
       SELECT * FROM kept
       UNION ALL SELECT * FROM closed
       UNION ALL SELECT * FROM opened
       ORDER BY k, valid_from""",

    "join_skew_salted" ->
      """SELECT c.c_mktsegment, count(*) AS cnt,
                CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                  AS sum_price
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    "merge_upsert" ->
      """WITH tgt AS (SELECT o_orderkey AS k, o_totalprice AS t_price
                      FROM orders WHERE o_orderkey % 10 < 8),
            src AS (SELECT o_orderkey AS sk, o_totalprice AS s_price
                    FROM orders WHERE o_orderkey % 7 = 0)
         SELECT coalesce(k, sk) AS o_orderkey,
                CAST(CASE
                       WHEN k IS NOT NULL AND sk IS NOT NULL
                         THEN CAST(s_price * 1.1 AS DECIMAL(38,6))
                       WHEN k IS NULL THEN CAST(s_price AS DECIMAL(38,6))
                       ELSE CAST(t_price AS DECIMAL(38,6))
                     END AS DOUBLE) AS price,
                CASE WHEN k IS NOT NULL AND sk IS NOT NULL THEN 'update'
                     WHEN k IS NULL THEN 'insert'
                     ELSE 'keep' END AS action
         FROM tgt FULL OUTER JOIN src ON k = sk
         ORDER BY o_orderkey"""
  )
}
