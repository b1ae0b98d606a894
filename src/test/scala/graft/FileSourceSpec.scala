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

  test("sink_partitioned_prune: scan prunes by directory, not by row filter") {
    // The registered query's whole point is that the type predicate is
    // answered by the partition LAYOUT: the scan must carry it as a
    // partition filter and need no per-row data filter for it, and only
    // the two matching partition directories' files may be read.
    val df = SparkEntry.queries("sink_partitioned_prune")(spark, sf)
    df.collect() // force staging + execution
    // sparkPlan, not executedPlan: AQE hides the scan inside query
    // stages; partition filters are bound at planning time either way
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in plan")
    val s = scans.head
    assert(s.partitionFilters.nonEmpty,
      s"no partition filters: ${s.partitionFilters}")
    assert(!s.dataFilters.exists(_.toString.contains("event_type")),
      s"event_type leaked into data filters: ${s.dataFilters}")
    assert(s.relation.location.inputFiles.length >
      s.selectedPartitions.totalNumberOfFiles,
      "pruning read every file — partition layout not exploited")
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
