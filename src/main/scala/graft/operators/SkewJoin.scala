package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join: the manual skew weapon for when AQE's runtime
  * skew-split (`spark.sql.adaptive.skewJoin.enabled`, on by default) can't
  * help — e.g. a hot key whose rows exceed one executor's memory even
  * after AQE splits, or a build side that must stay shuffled.
  *
  * Mechanics: each fact row gets a deterministic salt in `[0, salts)`
  * derived by hashing the whole row (xxhash64 over all columns — no
  * `rand()`, so replays and retries stay consistent), widening the hot
  * key into `salts` distinct shuffle keys. The dimension side is
  * replicated `salts` times via `explode(sequence(...))` — its shuffle
  * volume grows ×salts, which is why this targets fact⋈dim or
  * fact⋈medium joins, with `salts` sized to the observed skew ratio
  * (hot-key rows / average-key rows), not to the cluster size.
  */
object SkewJoin {

  /** The salt expression `saltedJoin` assigns to fact rows: a hash of the
    * whole row MIXED WITH a per-partition row index
    * (`monotonically_increasing_id` = partition id ‖ local counter), so
    * exactly-duplicate rows of a hot key still spread across salts —
    * hashing the row alone would pin them all to one shuffle key.
    *
    * Determinism caveat: `monotonically_increasing_id` is
    * Catalyst-nondeterministic — the id a row gets depends on the
    * upstream partitioning and within-partition order, so the map stage
    * is indeterminate (a fetch failure can force a whole-stage rerun
    * rather than a single-task retry, and a rerun under a different
    * upstream layout may assign different salts). The JOIN RESULT is
    * unaffected either way: the dim side is replicated across every
    * salt, so any salt assignment joins each fact row to the same dim
    * matches — only the physical spread of duplicate rows can vary.
    * Stable-scan inputs (one parquet snapshot, no coalesce upstream) get
    * reproducible salts in practice.
    * Exposed so tests exercise the production formula rather than a
    * copy. */
  def saltColumn(fact: DataFrame, salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id() +:
        fact.columns.map(col).toIndexedSeq: _*),
      lit(salts.toLong)).cast("int")

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * Result equals `fact.join(dim, key)` exactly; only the physical key
    * distribution differs. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already have a _salt column")
    val salted = fact.withColumn("_salt", saltColumn(fact, salts))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
          salted("_salt") === replicated("_salt"), "inner")
      .drop("_salt")
  }
}
