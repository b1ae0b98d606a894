package graft

import org.apache.spark.sql.functions._

/** Pins the Misra–Gries sketch UDAF's guarantees (SURVEY §2.1 K,
  * `udaf_topk_sketch`) — the properties that hold under ANY
  * partition/merge order, which is exactly what the no-oracle status
  * rests on.
  */
class UdafSketchSpec extends GraftSpec {

  test("udaf_topk_sketch: estimates within [true - n/k, true] on the events corpus") {
    import spark.implicits._
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perType = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val got = SparkEntry.queries("udaf_topk_sketch")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (et, uid, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      val tru = exact((et, uid))
      val n = perType(et)
      assert(est <= tru, s"overestimate for ($et,$uid): $est > $tru")
      assert(est >= tru - n / functions.TopKSketchAggregator.K.toLong,
        s"estimate below the n/k band for ($et,$uid): $est vs $tru (n=$n)")
    }
  }

  test("udaf_topk_sketch: a key above n/k frequency always survives, across partitionings") {
    import spark.implicits._
    // 1000 rows: key 7 appears 400×, keys 1000.. appear ~once each —
    // 7 is far above n/k = 1000/64 ≈ 15 and must survive any layout.
    val rows = Seq.fill(400)(7L) ++ (0 until 600).map(i => 1000L + i)
    val mg = udaf(functions.TopKSketchAggregator)
    for (parts <- Seq(1, 7, 32)) {
      val out = rows.toDF("v").repartition(parts)
        .agg(mg(col("v")).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e._1").as("k"), col("e._2").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.contains(7L), s"heavy key evicted at parts=$parts: $out")
      assert(out(7L) <= 400 && out(7L) >= 400 - 1000 / 64,
        s"heavy-key estimate out of band at parts=$parts: ${out(7L)}")
    }
  }

  test("stream_topk_sketch: streaming MG obeys the batch guarantee band") {
    // The transformWithState twin must honor the same Misra–Gries
    // band as the batch aggregator — est ≤ true, and any surviving
    // estimate within n/k of its true count — against exact per
    // (type, user) counts from the batch events table. Also pins the
    // bounded-output shape: ≤ 10 rows per event type.
    import spark.implicits._
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val perType = exact.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val got = SparkEntry.queries("stream_topk_sketch")(spark, sf).collect()
    assert(got.nonEmpty)
    val k = functions.TopKSketchAggregator.K.toLong
    got.foreach { r =>
      val (et, uid, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      val tru = exact((et, uid))
      val n = perType(et)
      assert(est <= tru, s"overestimate for ($et,$uid): $est > $tru")
      assert(est >= tru - n / k,
        s"estimate below the n/k band for ($et,$uid): $est vs $tru (n=$n)")
    }
    got.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.length <= 10, s"more than 10 rows for $et")
    }
  }

  test("udaf_topk_sketch: exact when distinct keys <= k") {
    import spark.implicits._
    // 50 distinct keys < k=64 — MG never decrements, counts are exact
    // (and the top-10 readout matches the exact top-10) whatever the
    // partitioning.
    val rows = (0 until 50).flatMap(k => Seq.fill(k + 1)(k.toLong))
    val mg = udaf(functions.TopKSketchAggregator)
    val out = rows.toDF("v").repartition(13)
      .agg(mg(col("v")).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e._1").as("k"), col("e._2").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    val expected = (40 until 50).map(k => k.toLong -> (k + 1).toLong).sorted
    assert(out == expected, s"exact small-cardinality case drifted: $out")
  }
}
