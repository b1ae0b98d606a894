package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.F sorts/limits + §2.G set operations (SURVEY.md §2.1 F/G).
  *
  * Scale posture: `topk_global` compiles to TakeOrderedAndProject —
  * per-partition top-k then a k-row merge on the driver, never a global
  * sort. Set ops are hash-based distinct/shuffle on the single key column;
  * union_all is a zero-shuffle concatenation.
  */
object SortsSetOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "sort_multi_nulls" -> ((s, d) =>
      customer(s, d)
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .select(col("c_custkey"), col("seg"), col("c_acctbal"))
        .orderBy(asc_nulls_first("seg"), col("c_acctbal").desc,
          col("c_custkey"))),

    "topk_global" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)),

    "set_union_all" -> ((s, d) =>
      customer(s, d)
        .select(col("c_nationkey").as("nationkey"), lit("cust").as("src"))
        .unionAll(supplier(s, d)
          .select(col("s_nationkey").as("nationkey"), lit("supp").as("src")))
        .orderBy(col("nationkey"), col("src"))),

    "set_union_distinct" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(supplier(s, d).select(col("s_nationkey")))
        .distinct()
        .orderBy(col("nationkey"))),

    "set_intersect" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(supplier(s, d).select(col("s_nationkey")))
        .orderBy(col("nationkey"))),

    "set_except" -> ((s, d) =>
      nation(s, d).select(col("n_nationkey").as("nationkey"))
        .except(supplier(s, d).filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey")))
        .orderBy(col("nationkey"))),

    "set_intersect_all" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(supplier(s, d).select(col("s_nationkey")))
        .orderBy(col("nationkey"))),

    "set_except_all" -> ((s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(supplier(s, d).select(col("s_nationkey")))
        .orderBy(col("nationkey")))
  )

  val oracle: Map[String, String] = Map(
    "sort_multi_nulls" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
         FROM customer
         ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey""",

    "topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 100""",

    "set_union_all" ->
      """SELECT c_nationkey AS nationkey, 'cust' AS src FROM customer
         UNION ALL
         SELECT s_nationkey AS nationkey, 'supp' AS src FROM supplier
         ORDER BY nationkey, src""",

    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
         UNION
         SELECT s_nationkey FROM supplier
         ORDER BY nationkey""",

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey FROM supplier
         ORDER BY nationkey""",

    "set_except" ->
      """SELECT n_nationkey AS nationkey FROM nation
         EXCEPT
         SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
         ORDER BY nationkey""",

    "set_intersect_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT ALL
         SELECT s_nationkey FROM supplier
         ORDER BY nationkey""",

    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT ALL
         SELECT s_nationkey FROM supplier
         ORDER BY nationkey"""
  )
}
