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
  */
object TopKSketchAggregator
    extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {

  val K = 64

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], v: Long): Map[Long, Long] =
    if (b.contains(v)) b.updated(v, b(v) + 1L)
    else if (b.size < K) b.updated(v, 1L)
    else b.iterator.collect { case (k, c) if c > 1 => k -> (c - 1L) }.toMap

  override def merge(a: Map[Long, Long], b: Map[Long, Long]):
      Map[Long, Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val m = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (m.size <= K) m
      else {
        // subtract the (k+1)-th largest count, keep the survivors
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(K)
        m.iterator.collect { case (k, c) if c > cut => k -> (c - cut) }
          .toMap
      }
    }

  /** Top-10 surviving keys by (estimate desc, key asc) — a bounded,
    * deterministic-shape readout of the summary. */
  override def finish(m: Map[Long, Long]): Seq[(Long, Long)] =
    m.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    Encoders.kryo[Map[Long, Long]]

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
