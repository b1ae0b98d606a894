package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.A scans + §2.B projection/filter + the flagship §2.D group-agg.
  *
  * Contract: SURVEY.md §2.1 tables A/B + `agg_groupby_pricing` (flagship).
  * Every query ends with a total order over a unique key (D1) and uses
  * DECIMAL(38,6) for any aggregated money (D2).
  *
  * Scale posture: filters/projections are plain Catalyst expressions so
  * pushdown + pruning reach the parquet scan (verified via PushedFilters /
  * ReadSchema in PlanShapeSpec); the group-agg is a partial+final hash
  * aggregate — the shuffle carries only (2 group cols × ~6 agg buffers),
  * not rows, so it scales to arbitrary lineitem sizes.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship TPC-H-Q1-style pricing summary (driver t1 smoke + oracle). */
  def aggGroupbyPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6)
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val queries: Map[String, Q] = Map(
    // D1 note: (l_orderkey, l_linenumber) is NOT unique in this corpus
    // (verified: 1161/11785/118144 duplicate groups at sf0.001/0.01/0.1);
    // (l_orderkey, l_linenumber, l_extendedprice) IS unique at every SF, so
    // every lineitem-grain result sorts on that triple for a total order.
    "scan_parquet" -> ((s, d) =>
      lineitem(s, d).orderBy(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))),

    "scan_pruned" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))),

    "filter_comparison" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05)
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"))),

    "filter_in_between_like" -> ((s, d) =>
      orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderdate").between(lit("1996-01-01"), lit("1996-12-31")) &&
          col("o_orderstatus").like("F%"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
          col("o_orderstatus"))
        .orderBy(col("o_orderkey"))),

    "filter_null_safe" -> ((s, d) =>
      orders(s, d)
        .withColumn("s1", nullif(col("o_orderstatus"), lit("P")))
        .withColumn("s2",
          when(col("o_orderpriority") === "5-LOW", lit(null).cast("string"))
            .otherwise(col("o_orderstatus")))
        .withColumn("same", col("s1") <=> col("s2"))
        .select(col("o_orderkey"), col("s1"), col("s2"), col("same"))
        .orderBy(col("o_orderkey"))),

    "project_expressions" -> ((s, d) =>
      lineitem(s, d)
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("double").as("revenue"),
          when(col("l_returnflag") === "R", lit("returned"))
            .when(col("l_linestatus") === "O", lit("open"))
            .otherwise(lit("done")).as("status_label"))),

    "agg_groupby_pricing" -> (aggGroupbyPricing _),

    // Correlated subqueries (round-4 add), exercised through the SQL
    // surface so Catalyst's decorrelation does the planning: EXISTS /
    // NOT EXISTS rewrite to left-semi / left-anti hash joins on
    // o_custkey — one shuffle each, no per-row re-execution, which is
    // what makes the construct viable at 100 TB (a nested-loop
    // interpretation would be O(customers × orders)).
    "subquery_exists" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("graft_customer_sq")
      orders(s, d).createOrReplaceTempView("graft_orders_sq")
      s.sql("""
        SELECT c_custkey, c_name
        FROM graft_customer_sq c
        WHERE EXISTS (SELECT 1 FROM graft_orders_sq o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM graft_orders_sq o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey""")
    }),

    // Correlated SCALAR subqueries with aggregates: orders strictly above
    // their customer's average price. The comparison is done in exact
    // integer-decimal arithmetic (price × count > sum) on BOTH engines so
    // no double-precision average can flip a boundary row (D2/D4).
    "subquery_scalar" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("graft_orders_sq")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM graft_orders_sq o
        WHERE CAST(o_totalprice AS DECIMAL(38,6)) *
                (SELECT count(*) FROM graft_orders_sq o2
                 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(38,6)))
                 FROM graft_orders_sq o3
                 WHERE o3.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice",

    "scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""",

    "filter_comparison" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
         FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
         ORDER BY l_orderkey, l_linenumber, l_extendedprice""",

    "filter_in_between_like" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority, o_orderstatus
         FROM orders
         WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
           AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
           AND o_orderstatus LIKE 'F%'
         ORDER BY o_orderkey""",

    "filter_null_safe" ->
      """SELECT o_orderkey,
                nullif(o_orderstatus,'P') AS s1,
                CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                     ELSE o_orderstatus END AS s2,
                nullif(o_orderstatus,'P') IS NOT DISTINCT FROM
                  (CASE WHEN o_orderpriority = '5-LOW' THEN NULL
                        ELSE o_orderstatus END) AS same
         FROM orders ORDER BY o_orderkey""",

    "project_expressions" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
                CASE WHEN l_returnflag = 'R' THEN 'returned'
                     WHEN l_linestatus = 'O' THEN 'open'
                     ELSE 'done' END AS status_label
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""",

    "agg_groupby_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
                count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "subquery_exists" ->
      """SELECT c_custkey, c_name
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey
                             AND o2.o_orderstatus = 'F')
         ORDER BY c_custkey""",

    "subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(38,6)) *
                 (SELECT count(*) FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey)
               > (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(38,6)))
                  FROM orders o3
                  WHERE o3.o_custkey = o.o_custkey)
         ORDER BY o_orderkey"""
  )
}
