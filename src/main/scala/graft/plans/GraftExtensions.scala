package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, IndexSequence, SortedIntersectSize}

/** Cluster-wide injection point for graft's native Catalyst expressions.
  *
  * A session built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) gets `cosine_sim` and
  * `sorted_intersect_size` as first-class SQL functions on every executor
  * and in every downstream session — the deployment story for a shared
  * cluster, where per-session `FunctionRegistry` registration (what the
  * harness queries use via `register(spark)`) doesn't reach other users'
  * sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName,
        "sorted_intersect_size"),
      (children: Seq[Expression]) =>
        SortedIntersectSize(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("index_sequence"),
      new ExpressionInfo(classOf[IndexSequence].getName, "index_sequence"),
      (children: Seq[Expression]) => IndexSequence(children.head)))
  }
}
