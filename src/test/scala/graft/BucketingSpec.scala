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

  test("bucketed join stays exchange-free under AQE at 16x replication") {
    // The ScaleProbe `bucketed` regime's plan contract, pinned at test
    // scale: replicate both sides 16× with referentially-consistent key
    // shifts, bucket the scaled tables, and require the AQE-final plan
    // to still be a sort-merge join over bucket-aware scans with NO
    // hash exchange — i.e. growth does not tip AQE into re-planning a
    // shuffle onto the co-located path.
    val ord = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    val maxOrder = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val maxCust = cust.agg(max(col("c_custkey"))).head().getLong(0) + 1
    val ord16 = (0 until 16).map(i => ord
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrder))
        .withColumn("o_custkey", col("o_custkey") + lit(i * maxCust)))
      .reduce(_ unionAll _)
    val cust16 = (0 until 16).map(i => cust
        .withColumn("c_custkey", col("c_custkey") + lit(i * maxCust)))
      .reduce(_ unionAll _)
    sources.Bucketing.writeBucketed(ord16, "b16_orders", "o_custkey", 8)
    sources.Bucketing.writeBucketed(cust16, "b16_customer", "c_custkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = sources.Bucketing.bucketedJoin(
        spark, "b16_orders", "b16_customer", "o_custkey", "c_custkey")
        .agg(count(lit(1)).as("n"))
      val n = joined.head().getLong(0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"16x bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
      // every order matches exactly its replica's customer: 16× the base
      assert(n == 16L * ord.count(),
        s"16x join cardinality drifted: $n vs ${16L * ord.count()}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b16_orders")
      spark.sql("DROP TABLE IF EXISTS b16_customer")
    }
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
