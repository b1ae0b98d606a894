package graft
import org.apache.spark.sql.SparkSession

/** Local profiling helper: time one named query from `SparkEntry.queries`
  * a few times under the Bench session config.
  *
  *   sbt "runMain graft.BenchOne <queryName> [reps] [conf=k:v ...]"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    args.drop(2).filter(_.startsWith("conf=")).foreach { a =>
      val Array(k, v) = a.stripPrefix("conf=").split(":", 2)
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // full-evaluation force, same as Bench/ScaleProbe: count() lets the
      // optimizer eliminate unique-key left joins and column reads, and
      // times two plan shapes of the SAME op differently (round-2 lesson)
      val n = Bench.force(fn(spark, sfDir))
      println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      // mirror Bench's hermetic inter-query cleanup (r16): leftover
      // localCheckpoint RDDs, memory-sink views, state-store providers
      // and collected-broadcast backlog all inflate later reps, so a
      // min-of-N here was measuring residue, not the op
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      try {
        spark.streams.active.foreach(_.stop())
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        System.gc()
      } catch { case e: Throwable =>
        System.err.println(s"[benchone] cleanup: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
