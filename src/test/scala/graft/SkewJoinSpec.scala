package graft

import org.apache.spark.sql.functions._

/** Salted-join contract: identical results to the plain join, and the
  * salt actually spreads a hot key across distinct shuffle keys.
  */
class SkewJoinSpec extends GraftSpec {

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // hot key: 90% of fact rows land on key 1
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 + 2 else 1, i))
      .toDF("k", "payload")
    val dim = (1 to 10).map(i => (i, s"name_$i")).toDF("dk", "name")

    val plain = fact.join(dim, col("k") === col("dk"), "inner")
      .select("k", "payload", "name")
    val salted = operators.SkewJoin.saltedJoin(fact, dim, "k", "dk", 8)
      .select("k", "payload", "name")

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads a hot key of EXACT-DUPLICATE rows over salts") {
    import spark.implicits._
    // identical rows: a row-content hash alone would map all to one salt
    val fact = (1 to 1000).map(_ => (1, 0)).toDF("k", "payload")
    val saltCard = fact
      .withColumn("_salt", operators.SkewJoin.saltColumn(fact, 8))
      .select(countDistinct(col("_salt"))).as[Long].head()
    assert(saltCard >= 6, s"hot key only spread over $saltCard salts")
  }

  test("salt is deterministic across evaluations") {
    val fact = Tables.orders(spark, sf)
    val salted = fact.withColumn("_salt",
      operators.SkewJoin.saltColumn(fact, 8))
    val a = salted.groupBy(col("_salt")).count().collect().toSet
    val b = salted.groupBy(col("_salt")).count().collect().toSet
    assert(a == b)
  }

  test("saltedJoin rejects misconfiguration instead of corrupting results") {
    import spark.implicits._
    val fact = Seq((1, 2)).toDF("k", "payload")
    val dim = Seq((1, "x")).toDF("dk", "name")
    intercept[IllegalArgumentException] {
      operators.SkewJoin.saltedJoin(fact, dim, "k", "dk", 0)
    }
    intercept[IllegalArgumentException] {
      operators.SkewJoin.saltedJoin(
        fact.withColumn("_salt", lit(1)), dim, "k", "dk", 4)
    }
  }
}
