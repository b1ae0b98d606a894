package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The adaptive-collapse discipline, factored once (round-9): six ops
  * had re-implemented the same precheck → hash-keyed collapse →
  * expansion pattern inline (dup_spans, ngram_jaccard, repetition,
  * ngram_lm, lang_id, embedding_neardup — plus the always-on variants
  * in llm_minhash_lsh / the LSH stages). This object keeps the ONE
  * audited copy of the two load-bearing arguments:
  *
  * THE 1.25× THRESHOLD ([[decideByMass]]): collapse pays one
  * corpus-sized text/vector-keyed exchange to run the op's machinery
  * on DISTINCT inputs and expand answers back by a group-id join; the
  * direct path pays the machinery on every row. On a dup-free corpus
  * the collapse exchange is pure overhead (measured 1.82 → 3.79 s for
  * embedding_neardup at sf0.1); on a replica-heavy corpus the direct
  * path multiplies every downstream stage by the replication factor
  * (measured 74–130 s vs 3 s for dup_spans at 16×, and a 128 GiB OOM
  * for the band join at 64× — see the minhash notes). Duplication MASS
  * (rows ≥ 1.25 × distinct keys) is the cheapest deterministic signal
  * that the k× blow-up side dominates: a 0.2 %-dup corpus skips the
  * pointless shuffle, a 4×-replicated one never pays the explosion.
  *
  * COLLISIONS FORCE COLLAPSE, NEVER WRONGNESS: the precheck counts
  * countDistinct(xxhash64(keys)) — a 64-bit collision can only
  * UNDERcount distinct keys, i.e. push the decision toward the
  * (always-exact) collapse path. The collapse itself groups by the
  * FULL key tuple with the hash only as the exchange key
  * ([[withGid]]): colliding groups land in one partition where the
  * in-partition window key still separates them. Both paths are exact;
  * the conf override (`always`/`never`) exists so the both-paths spec
  * can pin that equality on a staged replica-heavy corpus.
  */
object AdaptiveCollapse {

  private def overrideOf(s: SparkSession, confKey: String)
      : Option[Boolean] =
    s.conf.getOption(confKey).flatMap {
      case v if v.equalsIgnoreCase("always") => Some(true)
      case v if v.equalsIgnoreCase("never") => Some(false)
      case _ => None
    }

  /** Duplication-mass precheck: collapse when rows ≥ 1.25 × distinct
    * `keyHash` values. One map-side-combined aggregate over 8-byte
    * hashes, one O(1)-row driver read. `confKey` = always|never
    * overrides for the both-paths tests (and skips the aggregate). */
  def decideByMass(s: SparkSession, src: DataFrame, confKey: String,
      keyHash: Column): Boolean =
    overrideOf(s, confKey).getOrElse {
      val pre = src.agg(count(lit(1)).as("n"),
        countDistinct(keyHash).as("nd")).head()
      pre.getLong(0) * 4L >= pre.getLong(1) * 5L
    }

  /** Any-duplicate precheck (the exact-vector family): collapse iff
    * any key hash repeats at all — used where in-group work is
    * QUADRATIC (k replicas → k² in-cell pairs), so even one duplicate
    * group is worth the collapse exchange. */
  def decideAnyDup(s: SparkSession, src: DataFrame, confKey: String,
      keyHash: Column): Boolean =
    overrideOf(s, confKey).getOrElse {
      val pre = src.agg(count(lit(1)).as("n"),
        countDistinct(keyHash).as("nd")).head()
      pre.getLong(0) != pre.getLong(1)
    }

  /** The stage-cut idiom: localCheckpoint a multiply-consumed stage
    * so consumers don't replay its plan, unless the spec asked for
    * lazy plans via `spark.graft.checkpointStages=false` (plan-shape
    * asserts need the full tree). */
  def stageCut(s: SparkSession)(df: DataFrame): DataFrame =
    if (s.conf.getOption("spark.graft.checkpointStages")
      .exists(_.equalsIgnoreCase("false"))) df
    else df.localCheckpoint()

  /** LAZY stage cut (r17): same lineage truncation + multi-consumer
    * dedup, but materialization folds into the FIRST consumer's job
    * instead of a dedicated eager job — the GraphLoop/BPE round-cut
    * lesson (r16), applied where the cut frame is tiny and the extra
    * eager job is pure overhead (pqServe's R·nq-row shortlist). */
  def stageCutLazy(s: SparkSession)(df: DataFrame): DataFrame =
    if (s.conf.getOption("spark.graft.checkpointStages")
      .exists(_.equalsIgnoreCase("false"))) df
    else df.localCheckpoint(false)

  /** Hash-keyed exact grouping: append `gidName` = min(`idCol`) over
    * the `keys` group (and `k` = group size when `withK`). ONE corpus
    * exchange keyed by the 8-byte xxhash64 of the keys — the explicit
    * repartition makes the shuffle key the hash, not the full
    * text/vector tuple, and since the exchange partitioning is a
    * subset of the window's clustering keys Catalyst adds only an
    * in-partition sort (the lshStages idiom, now everywhere). The
    * window still groups by the full key tuple, so hash collisions
    * cannot merge distinct groups. */
  def withGid(src: DataFrame, idCol: String, keys: Seq[String],
      gidName: String = "gid", withK: Boolean = false): DataFrame = {
    val w = Window.partitionBy((col("__ac_th") +: keys.map(col)): _*)
    val base = src.withColumn("__ac_th", xxhash64(keys.map(col): _*))
      .repartition(col("__ac_th"))
      .withColumn(gidName, min(col(idCol)).over(w))
    (if (withK) base.withColumn("k", count(lit(1)).over(w)) else base)
      .drop("__ac_th")
  }

  /** The representative rows (one per group: the member whose id IS
    * the group id). */
  def repsOf(withG: DataFrame, idCol: String,
      gidName: String = "gid"): DataFrame =
    withG.filter(col(idCol) === col(gidName))

  /** The (id → gid) membership map the expansion joins ride. */
  def membersOf(withG: DataFrame, idCol: String,
      gidName: String = "gid"): DataFrame =
    withG.select(col(idCol), col(gidName))

  /** Expansion: per-representative answers (keyed by `gidName`) back
    * to every member by ONE gid-keyed join — row count equals the
    * OUTPUT, never a blown-up intermediate. */
  def expand(withG: DataFrame, idCol: String, perRep: DataFrame,
      gidName: String = "gid"): DataFrame =
    membersOf(withG, idCol, gidName).join(perRep, Seq(gidName))
      .drop(gidName)
}
