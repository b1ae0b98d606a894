package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement helper: phase breakdown of ONE
  * streaming op's floor — start() latency, micro-batch execution, and
  * the engine's own per-phase durationMs from the final progress event
  * (queryPlanning, walCommit, addBatch, commitOffsets, …), so the
  * irreducible part of the per-op streaming floor is attributable.
  *
  *   sbt "runMain graft.ProfileStream <queryName> [reps]"
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      Bench.force(df)
      val t2 = System.nanoTime()
      println(f"[pstream] $name rep $i: build+run ${(t1 - t0) / 1e9}%.2f s, " +
        f"force ${(t2 - t1) / 1e9}%.2f s")
      // the op ran its streaming query inside fn(); dig out the last
      // terminated query's progress is not retained — so instead print
      // the listener-visible progress of still-registered queries (none
      // for AvailableNow) — rely on spark.streams events? Simpler: the
      // caller reads the progress lines below when the op leaves an
      // active query. For runToMemory ops everything is inside fn().
      spark.streams.active.foreach(q => println(q.lastProgress))
      try {
        spark.streams.active.foreach(_.stop())
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        System.gc()
      } catch { case _: Throwable => () }
    }
    // Phase breakdown via a listener on a representative inline query:
    // replay events through the tumbling shape with progress capture.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val progresses =
      new java.util.concurrent.CopyOnWriteArrayList[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        progresses.add(e.progress.json)
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val t0 = System.nanoTime()
    Bench.force(fn(spark, sfDir))
    val t1 = System.nanoTime()
    Thread.sleep(500)
    println(f"[pstream] listener rep total ${(t1 - t0) / 1e9}%.2f s")
    progresses.forEach(p => println(s"[pstream] progress: $p"))
    spark.stop()
  }
}
