package graft

import org.apache.spark.sql.functions._

/** The co-located join contract: bucketing both fact tables on the join
  * key at write time must let Catalyst plan the join with NO shuffle
  * exchange on either side — the 100 TB answer to `orders ⋈ lineitem`.
  */
class BucketingSpec extends GraftSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    sources.Bucketing.writeBucketed(
      Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    sources.Bucketing.writeBucketed(
      Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 8)

    // At test scale Spark would broadcast the small side (also shuffle-free
    // but not what we're proving); force the sort-merge path the tables
    // would take at 100 TB.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = sources.Bucketing.bucketedJoin(
      spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
    val plan = try {
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")

    // same result as the plain (shuffling) join
    val expected = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(joined.count() == expected)
  }

  test("groupBy on the bucket key also avoids the exchange") {
    if (!spark.catalog.tableExists("b_lineitem"))
      sources.Bucketing.writeBucketed(
        Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 8)
    val agg = spark.table("b_lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }
}
