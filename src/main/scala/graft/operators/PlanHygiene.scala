package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimizer-hygiene helpers: places where Catalyst's default rewrite
  * is actively harmful for this engine's hot paths, each with the plan
  * evidence that motivated it. */
object PlanHygiene {

  /** `explode` of an EXPENSIVE computed array, without the
    * InferFiltersFromGenerate trap.
    *
    * `explode(arr)` lets Catalyst infer `size(arr) > 0 AND
    * isnotnull(arr)` for the generator's input and push that predicate
    * down — duplicating the ENTIRE array expression into a filter that
    * runs below every intervening exchange, at scan parallelism, on
    * every pre-collapse row. Round-9 measurement (llm_decontaminate,
    * 16× identical corpus): the pushed copy of the 8-gram hash ran
    * twice per raw row under a 3-partition scan — 30+ s of the 33 s
    * total — while the post-collapse explode it was "optimizing" cost
    * 0.9 s. The rewrite is sound row-pruning for a CHEAP array column;
    * for a computed shingle/n-gram array it multiplies the op's
    * dominant cost by (raw rows / distinct rows) and serializes it.
    *
    * `explode_outer` is exempt from the inference (an outer generate
    * emits a row regardless, so no input constraint exists), and the
    * null-filter here sits on the generator's OUTPUT attribute, which
    * cannot be pushed below the generate. Semantics: identical to
    * `explode` whenever the array's ELEMENTS are non-null (empty and
    * null arrays emit one null-`as` row, dropped by the filter; a
    * hash/shingle array never holds null elements).
    */
  def explodeNoInfer(df: DataFrame, keep: Seq[Column], arr: Column,
      as: String): DataFrame =
    df.select((keep :+ explode_outer(arr).as(as)): _*)
      .filter(col(as).isNotNull)
}
