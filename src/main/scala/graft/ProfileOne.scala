package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement helper (guide §1): run one named query
  * under the Bench session config with a SparkListener recording every
  * job's wall time and call site, so the expensive *phase* of a
  * multi-job operator is identifiable without the UI.
  *
  *   sbt "runMain graft.ProfileOne <queryName> [reps]"
  *
  * Prints, per rep, the job table (duration desc) with the job group
  * description when set and the first stage's call site otherwise, plus
  * the gap time (wall − Σ jobs) that lives on the driver between jobs.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, desc: String, var start: Long = 0L,
        var end: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.details.linesIterator
            .toSeq.headOption.getOrElse("")))
          .getOrElse("?")
        jobs.synchronized {
          jobs(js.jobId) = J(js.jobId, desc, js.time)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(je.jobId).foreach(_.end = je.time)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      Bench.force(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val snap = jobs.synchronized(jobs.values.toSeq)
      val byDur = snap.filter(_.end > 0)
        .map(j => (j.end - j.start) / 1e3 -> j).sortBy(-_._1)
      println(f"[profile] $name rep $i wall $wall%.2f s, " +
        f"${snap.size} jobs, sum ${byDur.map(_._1).sum}%.2f s")
      byDur.take(40).foreach { case (sec, j) =>
        println(f"  ${sec}%7.3f s  job ${j.id}%4d  ${j.desc.take(140)}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      try {
        spark.streams.active.foreach(_.stop())
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
