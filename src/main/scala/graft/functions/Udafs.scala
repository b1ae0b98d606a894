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
