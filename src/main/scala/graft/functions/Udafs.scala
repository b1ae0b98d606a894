package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.K `udaf_weighted_avg` — typed `Aggregator[IN, BUF, OUT]` surface.
  *
  * Quantity-weighted average extended price per return flag. The buffer
  * carries exact decimals (each double rounded to 6 dp on entry, mirroring
  * `CAST(x AS DECIMAL(38,6))` in the oracle), so merge order across
  * partitions cannot change the result (D2) — the aggregator is fully
  * mergeable and runs as partial+final, shuffling one (sum, sum) pair per
  * group per partition.
  */
object WeightedAvgAggregator
    extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), JBigDecimal] {

  private def d6(x: Double): JBigDecimal =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)

  override def zero: (JBigDecimal, JBigDecimal) =
    (JBigDecimal.ZERO, JBigDecimal.ZERO)

  // in = (weight = l_quantity, value = l_extendedprice)
  override def reduce(b: (JBigDecimal, JBigDecimal), in: (Double, Double)):
      (JBigDecimal, JBigDecimal) =
    (b._1.add(d6(in._1 * in._2)), b._2.add(d6(in._1)))

  override def merge(a: (JBigDecimal, JBigDecimal),
      b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))

  override def finish(b: (JBigDecimal, JBigDecimal)): JBigDecimal =
    if (b._2.signum == 0) null
    else b._1.divide(b._2, 6, RoundingMode.HALF_UP)

  override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)

  override def outputEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
}

/** Array-backed Misra–Gries buffer: `keys(0..n)` / `counts(0..n)` are the
  * live summary entries; the arrays keep fixed capacity K so reduce/merge
  * mutate in place with zero per-row allocation. Top-level (not nested)
  * so the product encoder's codegen never falls back to Janino-hostile
  * nested-class paths — the round-4 state-encoder lesson.
  */
final case class MgBuffer(keys: Array[Long], counts: Array[Long], var n: Int)

/** Mergeable Misra–Gries frequent-items sketch (k = 64) — the
  * heavy-hitters analog of `agg_hll_merge`'s two-phase HLL, as a custom
  * `Aggregator`: each partition builds a ≤ k-entry local summary, and
  * merge combines summaries with the (k+1)-th-count subtraction (the
  * mergeable-summaries rule), so the shuffle carries at most k
  * (key, count) pairs per partition whatever the key universe —
  * THE property that lets a 100 TB heavy-hitters query avoid shuffling
  * the full key space. Guarantee (ScalaTest-pinned, merge-order
  * independent): true_count − n/k ≤ estimate ≤ true_count, so any key
  * with frequency > n/k must survive; when distinct keys ≤ k the
  * sketch is exact. The precise estimates below the guarantee depend
  * on partition/merge order by design → no-oracle op.
  *
  * Hot-path discipline: the buffer is a pair of fixed-capacity primitive
  * arrays mutated in place — the found/append path is a ≤ 64-long linear
  * scan with no allocation, and the saturated decrement compacts in
  * place (vs the previous immutable-Map rebuild: O(K) boxing allocation
  * per saturated row). The buffer rides the product/row encoder, not
  * kryo, so spill/shuffle serialization stays on the columnar row path.
  */
object TopKSketchAggregator
    extends Aggregator[Long, MgBuffer, Seq[(Long, Long)]] {

  val K = 64

  override def zero: MgBuffer =
    MgBuffer(new Array[Long](K), new Array[Long](K), 0)

  override def reduce(b: MgBuffer, v: Long): MgBuffer = {
    val ks = b.keys; val cs = b.counts; val n = b.n
    var i = 0
    while (i < n) {
      if (ks(i) == v) { cs(i) += 1L; return b }
      i += 1
    }
    if (n < K) { ks(n) = v; cs(n) = 1L; b.n = n + 1 }
    else {
      // saturated: decrement every counter, drop zeros, compact in
      // place (the MG rule — the incoming key is NOT inserted)
      var w = 0; var j = 0
      while (j < n) {
        val c = cs(j) - 1L
        if (c > 0L) { ks(w) = ks(j); cs(w) = c; w += 1 }
        j += 1
      }
      b.n = w
    }
    b
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    if (b.n == 0) return a
    if (a.n == 0) {
      System.arraycopy(b.keys, 0, a.keys, 0, b.n)
      System.arraycopy(b.counts, 0, a.counts, 0, b.n)
      a.n = b.n
      return a
    }
    // combine into a scratch region (merge is per-partition-boundary,
    // not per-row — an allocation here is off the hot path)
    val cap = a.n + b.n
    val ks = new Array[Long](cap); val cs = new Array[Long](cap)
    System.arraycopy(a.keys, 0, ks, 0, a.n)
    System.arraycopy(a.counts, 0, cs, 0, a.n)
    var n = a.n
    var i = 0
    while (i < b.n) {
      val k = b.keys(i); val c = b.counts(i)
      var j = 0; var found = false
      while (j < a.n && !found) {
        if (ks(j) == k) { cs(j) += c; found = true }
        j += 1
      }
      if (!found) { ks(n) = k; cs(n) = c; n += 1 }
      i += 1
    }
    if (n > K) {
      // subtract the (k+1)-th largest count, keep the survivors
      // (at most K entries can exceed the (k+1)-th largest)
      val sorted = java.util.Arrays.copyOfRange(cs, 0, n)
      java.util.Arrays.sort(sorted)
      val cut = sorted(n - 1 - K)
      var w = 0; var j = 0
      while (j < n) {
        if (cs(j) > cut) { a.keys(w) = ks(j); a.counts(w) = cs(j) - cut; w += 1 }
        j += 1
      }
      a.n = w
    } else {
      System.arraycopy(ks, 0, a.keys, 0, n)
      System.arraycopy(cs, 0, a.counts, 0, n)
      a.n = n
    }
    a
  }

  /** Top-10 surviving keys by (estimate desc, key asc) — a bounded,
    * deterministic-shape readout of the summary. */
  override def finish(m: MgBuffer): Seq[(Long, Long)] =
    (0 until m.n).map(i => (m.keys(i), m.counts(i)))
      .sortBy { case (k, c) => (-c, k) }.take(10)

  override def bufferEncoder: Encoder[MgBuffer] = Encoders.product[MgBuffer]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object Udafs {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "udaf_weighted_avg" -> ((s, d) => {
      val wavg = udaf(WeightedAvgAggregator)
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(dec(wavg(col("l_quantity"), col("l_extendedprice")))
          .cast("double").as("wavg_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Approximate heavy hitters via the mergeable MG sketch (see
    // [[TopKSketchAggregator]]): top-10 users per event type. The
    // partial+final plan ships ≤ 64 pairs per partition per type — at
    // any corpus size the shuffle stays O(partitions·k), never
    // O(distinct users). No-oracle (estimates are merge-order-dependent
    // within the guarantee band); UdafSketchSpec pins the n/k error
    // bound, heavy-key recall, and the exact-when-distinct≤k case.
    "udaf_topk_sketch" -> ((s, d) => {
      val mg = udaf(TopKSketchAggregator)
      events(s, d)
        .groupBy(col("event_type"))
        .agg(mg(col("user_id")).as("top"))
        .select(col("event_type"), explode(col("top")).as("e"))
        .select(col("event_type"), col("e._1").as("user_id"),
          col("e._2").as("est_count"))
        .orderBy(col("event_type"), col("est_count").desc, col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
                CAST(CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))
                     / sum(CAST(l_quantity AS DECIMAL(38,6)))
                     AS DECIMAL(38,6)) AS DOUBLE) AS wavg_price
         FROM lineitem GROUP BY 1 ORDER BY 1"""
  )
}
