package graft

import org.apache.spark.sql.functions._

/** Native merge-scan intersection kernel: must agree with the built-in
  * hash-based `array_intersect` on sorted-distinct input, for both element
  * types, and compose with GraftExtensions injection.
  */
class SortedIntersectSpec extends GraftSpec {

  test("sorted_intersect_size matches array_intersect on sorted strings") {
    functions.SortedIntersectSize.register(spark)
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"),
        sort_array(array_distinct(split(col("text"), " "))).as("t"))
    val pairs = df.limit(50)
      .crossJoin(df.limit(50).select(col("doc_id").as("id2"),
        col("t").as("t2")))
    val both = pairs.select(
      expr("sorted_intersect_size(t, t2)").as("fast"),
      size(array_intersect(col("t"), col("t2"))).as("ref")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("sorted_intersect_size works on array<bigint>") {
    functions.SortedIntersectSize.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1L, 3L, 7L, 9L), Array(3L, 7L, 8L)),
      (Array.empty[Long], Array(1L, 2L)),
      (Array(5L), Array(5L))).toDF("a", "b")
    assert(df.selectExpr("sorted_intersect_size(a, b)")
      .collect().map(_.getInt(0)).toSeq == Seq(2, 0, 1))
  }

  test("sorted_intersect_size stays inside whole-stage codegen") {
    functions.SortedIntersectSize.register(spark)
    val df = Tables.documents(spark, sf)
      .select(sort_array(array_distinct(split(col("text"), " "))).as("t"))
      .selectExpr("sorted_intersect_size(t, t) AS n")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[sorted_intersect_size""".r
      .findFirstIn(plan).isDefined,
      s"sorted_intersect_size not in a codegen span:\n$plan")
  }

  test("index_sequence plans as a Generate node and fans out correctly") {
    functions.IndexSequence.register(spark)
    import spark.implicits._
    val df = Seq(0, 1, 3).toDF("n")
      .selectExpr("n", "index_sequence(n) AS idx")
    assert(df.queryExecution.executedPlan.toString.contains("Generate"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows.sorted == Seq((1, 0), (3, 0), (3, 1), (3, 2)))
  }

  // NOTE: the `spark.sql.extensions=graft.plans.GraftExtensions` config
  // string (the spark-submit deployment path) is applied when the
  // SparkContext is created, so it can't be exercised against this
  // suite's shared context — the withExtensions test below covers the
  // same injector code path.
  test("GraftExtensions injects all native functions into a new session") {
    import org.apache.spark.sql.SparkSession
    spark // force fixture init so the shared SparkContext exists
    // getOrCreate() would hand back the fixture session (and silently skip
    // withExtensions), so clear the active/default session to force a new
    // SparkSession over the same SparkContext, then restore the fixture.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new plans.GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      val one = Seq((Array("a", "b"), Array("b", "c"), Array(1.0f, 0.0f),
        Array(1.0f, 0.0f))).toDF("x", "y", "u", "v")
      val row = one.selectExpr("sorted_intersect_size(x, y) AS n",
        "cosine_sim(u, v) AS c").head()
      assert(row.getInt(0) == 1 && math.abs(row.getDouble(1) - 1.0) < 1e-12)
      assert(ext.sql("SELECT index_sequence(3) AS i").count() == 3)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
