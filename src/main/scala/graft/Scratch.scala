package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  // Audit: which registered queries carry an optimizer-inferred filter
  // that re-evaluates an expensive generator input (transform/slice
  // chains duplicated into a Filter node)?
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, d)
          .queryExecution.executedPlan.toString
        val hits = plan.linesIterator.filter { l =>
          val t = l.trim
          (t.startsWith("+- Filter") || t.startsWith("Filter") ||
            t.contains("DataFilters:")) &&
          (t.contains("transform(") || t.contains("slice(") ||
            t.contains("sequence("))
        }.size
        if (hits > 0) println(s"[audit] $n: $hits heavy-expr filter line(s)")
      } catch { case e: Exception =>
        println(s"[audit] $n: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
