package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up probe: replicate `documents`/`embeddings` k× (ids shifted so
  * uniqueness holds) into a staged sf dir, then time the similarity /
  * dedup family against it. This answers the "would this hold at 10×?"
  * question with measurements instead of guesses — run with
  *
  *   sbt "runMain graft.ScaleProbe 4 16"
  *
  * Interpretation guide: ops whose candidate generation is blocked by
  * (lang, size-bucket) see per-block density grow k×, so candidate pairs
  * (and runtime, once compute-bound) grow ~k² within fixed blocks. That
  * is the expected curve for the *exact* pair ops (llm_jaccard_pairs,
  * llm_ngram_jaccard); the sketch-based paths (minhash bands, simhash
  * pigeonholes) add sketch-equality keys on top and should grow closer to
  * the true near-dup density. At corpus scale the block key must therefore
  * tighten as the corpus grows (more bands / finer buckets) — which these
  * measurements make visible locally.
  */
object ScaleProbe {

  private val ProbeQueries = Seq(
    "llm_exact_dedup", "llm_jaccard_pairs", "llm_ngram_jaccard",
    "llm_minhash_lsh", "llm_simhash_dedup", "llm_dedup_pipeline",
    "llm_embedding_topk_pairs", "llm_embedding_neardup", "llm_embedding_lsh",
    "llm_ann_ivf",
    "llm_lang_id", "llm_tfidf_topterms", "llm_pack_sequences",
    "llm_sample_reservoir", "llm_decontaminate", "llm_decontaminate_bloom",
    "llm_chunk_windows", "llm_mix_weights", "llm_neardup_crosslang")

  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4)
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    factors.foreach { k =>
      val dir = Files.createTempDirectory(s"graft_scale_${k}x_").toString
      try {
        stage(spark, baseSf, dir, k)
        println(s"[scaleprobe] === ${k}x corpus staged at $dir ===")
        ProbeQueries.foreach { name =>
          val t0 = System.nanoTime()
          // full-evaluation force (see Bench.force): count() would let the
          // optimizer skip column reads and unique-key join work entirely.
          val n = try Bench.force(SparkEntry.queries(name)(spark, dir))
          catch { case e: Throwable =>
            println(s"[scaleprobe] $name FAILED: ${e.getMessage}"); -1L
          }
          println(f"[scaleprobe] ${k}x $name: " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      } finally {
        // staged corpora are k× the base tables — reclaim them per factor
        import scala.jdk.CollectionConverters._
        val stream = java.nio.file.Files.walk(Paths.get(dir))
        try stream.iterator().asScala.toSeq.reverseIterator
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
        finally stream.close()
      }
    }
    spark.stop()
  }

  /** Symlink every base table; overwrite documents/embeddings with k
    * id-shifted copies (text/vectors unchanged — the worst case for
    * near-dup ops, since every replica is a true duplicate). */
  private def stage(s: SparkSession, baseSf: String, dir: String,
      k: Int): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      Files.createSymbolicLink(Paths.get(s"$dir/$t.parquet"),
        Paths.get(s"$baseSf/$t.parquet"))
    }
    val docs = s.read.parquet(s"$baseSf/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until k).map(i => docs.withColumn("doc_id",
        col("doc_id") + lit(i * maxDoc)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = s.read.parquet(s"$baseSf/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until k).map(i => emb.withColumn("vec_id",
        col("vec_id") + lit(i * maxVec)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
