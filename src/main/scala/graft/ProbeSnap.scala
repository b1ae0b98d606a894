package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round evidence tool (r17): dump the formatted plan of the
  * streaming ingest ops' PER-BATCH probe — the foreachBatch body the
  * registered query runs k times, which PlanSnap cannot show (the
  * registered query returns a read of the verdict sink after the stream
  * already ran). Built exactly as PlanDump.ingestProbePlans builds it:
  * one half-corpus batch frame against a reconstructed epoch index.
  *
  *   sbt "runMain graft.ProbeSnap <tag> <suffix>"
  */
object ProbeSnap {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
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
    graft.functions.CosineSimilarity.register(spark)
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val cut = (maxId + 1) / 2
    val (bands, bits) = graft.functions.CosineLsh.geometry(emb.count())
    val existing = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    val bkU = udf((v: Seq[Float]) =>
      graft.functions.CosineLsh.bandKeys(v, bands, bits))
    val repBands = existing
      .select(col("vec_id"), explode(bkU(col("embedding"))).as("bk"))
    val (verdicts, _, _) = graft.operators.TrainingDataOps
      .embeddingVerdictsCore(batch, existing, repBands, bands, bits)
    val txt = verdicts.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(
      dir.resolve(s"stream_embedding_ingest_probe_$suffix.txt"), txt)
    println(s"[probesnap] wrote plans/$tag/stream_embedding_ingest_probe_$suffix.txt")
    spark.stop()
  }
}
