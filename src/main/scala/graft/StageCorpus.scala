package graft

import org.apache.spark.sql.SparkSession

/** Stage one ScaleProbe corpus to a PERSISTENT dir (ScaleProbe deletes
  * its per-factor staging after timing, which is right for sweeps but
  * blocks per-op bisection): `runMain graft.StageCorpus <mode> <k>
  * <dir>` stages the mode's k×-scaled tables at `dir`, so BenchOne /
  * Verify can then run individual ops against it repeatedly (warm-rep
  * timing splits, plan dumps at scale). Reads the base corpus from
  * SPARK_GRAFT_SF_DIR (default sf0.1), same as the probe. */
object StageCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: StageCorpus <mode> <k> <dir>")
    val Array(mode, k, dir) = args
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
    ScaleProbe.stage(spark, baseSf, dir, k.toInt, mode)
    println(s"[stagecorpus] $mode ${k}x staged at $dir")
  }
}
