package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.K remainder — UDF surface, row generator, native-expression query.
  *
  * `udf_normalize` is the deliberate "black box to Catalyst" example; the
  * rest of the engine prefers built-in expressions (codegen'd, pushdown
  * friendly). `udtf_generate` shows the generator path: one input row →
  * N output rows via `explode(sequence(...))`, Spark's native UDTF shape.
  */
object ExtensionOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "udf_normalize" -> ((s, d) => {
      val norm = udf((t: String) =>
        if (t == null) null else t.toLowerCase.replaceAll("[^a-z0-9 ]", ""))
      documents(s, d)
        .select(col("doc_id"), norm(col("text")).as("norm_text"))
        .orderBy(col("doc_id"))
    }),

    "udtf_generate" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          explode(sequence(
            date_trunc("month", col("o_orderdate")),
            date_trunc("month", col("o_orderdate") + expr("INTERVAL 3 MONTHS")),
            expr("INTERVAL 1 MONTH"))).as("month_start"))
        .orderBy(col("o_orderkey"), col("month_start"))),

    // The native-Generator form of the UDTF surface: index_sequence is a
    // custom Catalyst Generator (graft.functions.IndexSequence), planned
    // as a Generate node like the built-in explode — per-partition
    // fan-out, no shuffle.
    "udtf_native_generate" -> ((s, d) => {
      IndexSequence.register(s)
      orders(s, d)
        .selectExpr("o_orderkey",
          "index_sequence(CAST(o_orderkey % 4 AS INT) + 1) AS idx")
        .orderBy(col("o_orderkey"), col("idx"))
    }),

    "expr_native_cosine" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = emb.select(col("vec_id").as("c_id"),
        col("embedding").as("c_vec"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("c_id"))
      c.join(broadcast(q), col("q_id") =!= col("c_id"), "inner")
        .withColumn("sim", round(expr("cosine_sim(q_vec, c_vec)"), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id").as("vec_id"), col("c_id").as("vec_id2"),
          col("sim"), col("rn"))
        .orderBy(col("vec_id"), col("rn"))
    })
  )

  val oracle: Map[String, String] = Map(
    "udf_normalize" ->
      """SELECT doc_id,
                regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS norm_text
         FROM documents ORDER BY doc_id""",

    "udtf_generate" ->
      """SELECT o_orderkey,
                unnest(generate_series(
                  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP),
                  CAST(date_trunc('month', o_orderdate + INTERVAL 3 MONTH) AS TIMESTAMP),
                  INTERVAL 1 MONTH)) AS month_start
         FROM orders ORDER BY o_orderkey, month_start""",

    "udtf_native_generate" ->
      """SELECT o_orderkey, u.i AS idx
         FROM orders, unnest(generate_series(0,
           CAST(o_orderkey % 4 AS INT))) AS u(i)
         ORDER BY o_orderkey, idx""",

    // Same kernel semantics as llm_cosine_topk (SURVEY §2.1 K): the native
    // expression computes dot/(sqrt(na)*sqrt(nb)) in identical element order.
    "expr_native_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
                    FROM embeddings),
            d AS (SELECT vec_id, vec, list_dot_product(vec, vec) AS self_dot
                  FROM e),
            s AS (SELECT q.vec_id AS vec_id, c.vec_id AS vec_id2,
                         round(list_dot_product(q.vec, c.vec)
                           / (sqrt(q.self_dot) * sqrt(c.self_dot)), 6) AS sim
                  FROM d q JOIN d c ON q.vec_id < 10 AND c.vec_id != q.vec_id)
       SELECT vec_id, vec_id2, sim, rn FROM (
         SELECT vec_id, vec_id2, sim,
                row_number() OVER (PARTITION BY vec_id
                  ORDER BY sim DESC, vec_id2) AS rn
         FROM s) WHERE rn <= 5
       ORDER BY vec_id, rn"""
  )
}
