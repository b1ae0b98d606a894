package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** L3 property-based invariants (SURVEY.md §5): generator-driven checks
  * where goldens are thin. Data is generated driver-side with fixed seeds,
  * evaluated as Spark columns (violations counted distributed-side).
  */
class PropertySpec extends GraftSpec {

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("string function invariants hold on generated inputs") {
    import spark.implicits._
    val strs = sample(Gen.asciiPrintableStr.map(_.take(40)), 300)
    val df = strs.toDF("s")
    val bad = df.filter(
      length(upper($"s")) =!= length($"s") ||
        lower(upper($"s")) =!= lower($"s") ||
        length(concat($"s", $"s")) =!= length($"s") * 2 ||
        substring($"s", 1, 5) =!= $"s".substr(1, 5))
    assert(bad.count() == 0)
  }

  test("math function invariants hold on generated doubles") {
    import spark.implicits._
    val xs = sample(Gen.choose(0.001, 1.0e6), 300)
    val df = xs.toDF("x")
    val bad = df.filter(
      sqrt($"x") * sqrt($"x") > $"x" * 1.0000001 ||
        abs($"x") =!= $"x" ||
        floor($"x") > $"x" || ceil($"x") < $"x" ||
        exp(log($"x")) > $"x" * 1.0000001 ||
        exp(log($"x")) < $"x" * 0.9999999)
    assert(bad.count() == 0)
  }

  test("window rank stays within [1, partition size]") {
    import spark.implicits._
    val rows = sample(for {
      g <- Gen.choose(0, 9)
      v <- Gen.choose(-1000, 1000)
    } yield (g, v), 500)
    val df = rows.toDF("g", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v")
    val checked = df
      .withColumn("rnk", rank().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"g")))
    assert(checked.filter($"rnk" < 1 || $"rnk" > $"n").count() == 0)
  }

  test("decimal sum is invariant under repartitioning (D2 rationale)") {
    import spark.implicits._
    val xs = sample(Gen.choose(-1.0e6, 1.0e6), 400)
    val df = xs.toDF("x").select(Tables.dec($"x").as("d"))
    val s1 = df.repartition(1).agg(sum($"d")).head().getDecimal(0)
    val s7 = df.repartition(7).agg(sum($"d")).head().getDecimal(0)
    assert(s1 == s7)
  }
}
