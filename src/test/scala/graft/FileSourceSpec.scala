package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** CSV/JSON file source round-trips (SURVEY.md §2.1 A note: no CSV/JSON
  * test inputs exist, so coverage is a temp-file round-trip through the
  * stock Spark sources).
  */
class FileSourceSpec extends GraftSpec {

  test("csv round-trip preserves rows and schema") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val src = Tables.nation(spark, sf)
    src.write.option("header", "true").csv(s"$dir/nation")
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/nation")
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.orderBy(col("n_nationkey")).collect().map(_.getInt(0)).toSeq ==
      src.orderBy(col("n_nationkey")).collect().map(_.getInt(0)).toSeq)
  }

  test("json round-trip preserves rows and values") {
    val dir = Files.createTempDirectory("graft_json_").toString
    val src = Tables.region(spark, sf)
    src.write.json(s"$dir/region")
    val back = spark.read.json(s"$dir/region")
    assert(back.count() == 5)
    assert(back.select(col("r_name")).collect().map(_.getString(0)).sorted.toSeq ==
      src.select(col("r_name")).collect().map(_.getString(0)).sorted.toSeq)
  }
}
