package graft

import org.apache.spark.sql.functions._

/** M5 native expression: codegen'd cosine_sim must agree bit-for-bit with
  * the HOF kernel (llm_cosine_topk) and survive whole-stage codegen.
  */
class NativeCosineSpec extends GraftSpec {

  test("expr_native_cosine equals llm_cosine_topk exactly") {
    val native = SparkEntry.queries("expr_native_cosine")(spark, sf).collect()
    val hof = SparkEntry.queries("llm_cosine_topk")(spark, sf).collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("cosine_sim evaluates correctly on a known vector pair") {
    functions.CosineSimilarity.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(0.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    val sim = df.selectExpr("cosine_sim(a, b)").head().getDouble(0)
    assert(math.abs(sim - 0.5) < 1e-12) // dot=1, |a|=|b|=sqrt(2)
  }

  test("cosine_sim stays inside whole-stage codegen") {
    functions.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val df = emb.crossJoin(emb.select(col("embedding").as("e2")).limit(1))
      .selectExpr("cosine_sim(embedding, e2) AS s")
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefix = inside a WholeStageCodegen span (explain shorthand)
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(plan).isDefined,
      s"cosine_sim not in a codegen span:\n$plan")
  }
}
