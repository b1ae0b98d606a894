package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Force FULL evaluation: hash every output column of every row into a
    * per-row xxhash64 and XOR-fold (never overflows). `count()` is NOT a
    * fair forcing function — a parquet count reads no column data, and
    * Catalyst legitimately eliminates unique-key outer joins whose output
    * a count never references — so counting under-times queries whose
    * output is the point. */
  def force(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)")).head().getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen path once so the first timed query isn't
    // charged ~5 s of class loading; run queries in stable sorted order.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    // Two timed runs per query, min recorded: a single run makes one noisy
    // scheduler stall the recorded number (round 2's checked-in bench showed
    // several queries ~4× their controlled re-run time). The min of two is a
    // far better estimator of the query's actual cost on an idle host.
    // Optional comma-separated allowlist for local bisection of
    // cross-query interference (the driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    // Hot-box canary (r12 verdict item 6): the driver's sweep has read
    // a recurring ~uniform +15-20 s vs the same-day committed local
    // sweep every round — a contended-host signature, not a regression.
    // Time 3 cheap stable ops (scan/agg/join) FIRST, right after
    // warmup, and emit their delta vs the latest committed
    // BENCH_r*_local.json so the artifact self-labels a contaminated
    // run: canary_delta_pct far above the ~±30% idle-host jitter of
    // sub-second ops means the WHOLE sweep ran hot and per-query
    // regressions should be read against that offset (BASELINE.md
    // "Bench canary" section).
    val canaryOps = Seq("scan_parquet", "agg_groupby_pricing",
      "join_shuffle_inner")
    // min-of-2 like the sweep itself — the committed reference values
    // are min-of-2, so a single cold shot would carry a systematic
    // codegen-compile bias into every delta
    val canary = canaryOps.map { name =>
      name -> (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try force(SparkEntry.queries(name)(spark, sfDir)) catch {
          case e: Throwable =>
            System.err.println(s"[bench] canary $name: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val canaryRef: Option[(String, Double)] = try {
      val refs = java.nio.file.Files.list(java.nio.file.Paths.get("."))
        .toArray.map(_.toString.stripPrefix("./"))
        .filter(n => n.matches("BENCH_r\\d+_local\\.json")).sorted
      refs.lastOption.flatMap { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "UTF-8")
        // minimal extraction (no JSON lib on the unmanaged classpath):
        // each canary key appears once, as "name":<sec>. Whitespace
        // after the colon is tolerated (r16): merge tooling re-writes
        // BENCH_r*_local.json with json.dump's ", "/": " separators,
        // and the strict pattern silently disabled the canary
        // (ref: null) against such a reference.
        val vals = canaryOps.map { op =>
          ("\"" + op + "\":\\s*([0-9.Ee+-]+)").r
            .findFirstMatchIn(txt).map(_.group(1).toDouble)
        }
        if (vals.forall(_.isDefined)) Some((f, vals.flatten.sum)) else None
      }
    } catch { case _: Throwable => None }
    val canaryJson = {
      val per = canary.map { case (k, v) => s"\"$k\":$v" }.mkString(",")
      val sum = canary.map(_._2).sum
      canaryRef match {
        case Some((f, refSum)) if refSum > 0 =>
          val delta = (sum / refSum - 1) * 100
          s"""{$per,"ref":"$f","ref_sec":$refSum,"delta_pct":${math.round(delta * 10) / 10.0}}"""
        case _ => s"""{$per,"ref":null}"""
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        // snapshot so cleanup drops only THIS run's RDDs — unpersisting
        // someone else's localCheckpoint destroys its only copy
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)) } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // Ops with eager localCheckpoint stage boundaries (dedup audit /
        // clusters) leave their checkpoint RDDs pinned in executor
        // storage after the result is forced; in this shared-JVM sweep
        // that memory pressure inflates LATER queries (measured:
        // llm_embedding_lsh 7.9 s in-sweep vs 4.2 s isolated). Each
        // query's own timing window is closed, so dropping leftovers
        // here only isolates neighbors. BLOCKING on purpose: a lazy
        // unpersist leaves the blocks resident while the next query
        // runs — measured llm_embedding_lsh 8.0 s after the dedup
        // family with blocking=false vs 3.9 s (= isolated) blocking.
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => preexisting(id) }
          .values.foreach(_.unpersist(blocking = true))
        sec
      }
      // Hermetic sweep: every streaming op leaves residue a later query
      // must not inherit (round-4 driver bench showed the streaming tail
      // inflating up to 9× with sweep position while isolated re-runs
      // stayed flat). Three kinds, all dropped here:
      //  - the memory-sink temp views (graft_mem_N) the finished queries
      //    registered — each pins its full collected result on the heap;
      //  - any still-active StreamingQuery (defensive — AvailableNow
      //    queries self-terminate, but a failed one may not);
      //  - the loaded state-store providers + their maintenance thread
      //    (RocksDB snapshot/cleanup work keeps running for stores no
      //    future query will touch; StateStore.get restarts maintenance
      //    lazily, so stopping between queries is safe).
      try {
        spark.streams.active.foreach(_.stop())
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_mem_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        // Broadcasts and shuffle state are reclaimed by ContextCleaner
        // only after their driver-side references are GC'd; across a
        // 129-query sweep that backlog grows into real interference
        // (embeddings-family ops measured ~1.8× their isolated time
        // late in the sweep). One explicit collection per query lands
        // OUTSIDE every timing window and keeps the sweep hermetic.
        System.gc()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] cleanup after $name: ${e.getMessage}")
      }
      name -> times
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // Per-query [min,max] of the two runs: a wide spread marks timings
    // the driver should read as interference-suspect rather than cost.
    val spread = results
      .map { case (k, v) => s"\"" + k + s"\":[${v.min},${v.max}]" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2.min).sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"canary":$canaryJson,"sf":"$sfDir"}"""
    // The driver tail-captures stdout and has truncated the (one, long)
    // JSON line mid-key before (BENCH_r03.json arrived with
    // "parsed": null; the r15 line was cut the same way and the whole
    // prev-round PERF comparison was lost) — so ALSO write the full
    // line to BENCH.json in the working directory, which survives any
    // stdout capture window, and mirror it to BENCH_LINE.json (r17,
    // the r16 verdict's item 5: a fixed well-known filename the driver
    // can read even if BENCH.json is ever repurposed). Never clobber
    // the version-controlled snapshot with a filtered subset — a
    // bisection run would silently publish a partial map.
    if (only.isEmpty)
      Seq("BENCH.json", "BENCH_LINE.json").foreach { f =>
        try java.nio.file.Files.write(java.nio.file.Paths.get(f),
          (line + "\n").getBytes("UTF-8"))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $f write failed: ${e.getMessage}")
        }
      }
    // the metric JSON is the FINAL stdout line — spark.stop() runs
    // after it and must not print; sbt's success banner is suppressed
    // in build.sbt (showSuccess := false)
    println(line)
    spark.stop()
  }
}
