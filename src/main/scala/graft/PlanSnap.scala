package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: dump `.explain("formatted")` of named
  * registered queries to `plans/<tag>/<query>_<suffix>.txt`, so plan-shape
  * claims in OPTIMIZATION_r*.md are checkable without running Spark.
  *
  *   sbt "runMain graft.PlanSnap <tag> <suffix> <query> [query ...]"
  *   sbt "runMain graft.PlanSnap r16 before llm_ann_pq graph_pagerank"
  *
  * Uses the Bench session config (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus, UTC) so the dumped plan is the one Bench times. The
  * dump is the pre-execution formatted plan (AQE initial); stage cuts are
  * disabled (`spark.graft.checkpointStages=false`) so the full lineage is
  * auditable, same as PlanDump.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.checkpointStages", "false")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plansnap] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
