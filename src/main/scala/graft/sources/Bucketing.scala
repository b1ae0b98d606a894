package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing: the shuffle-free co-located join path.
  *
  * At 100 TB the dominant cost of a fact⋈fact join (`orders ⋈ lineitem`)
  * is the shuffle of both sides on the join key. Hash-bucketing both
  * tables on that key at WRITE time moves the shuffle out of the query
  * and into ingestion, paid once: every subsequent join (or groupBy) on
  * the bucket key reads co-located buckets and Catalyst elides the
  * exchange entirely (`spark.sql.sources.bucketing.enabled`, on by
  * default). `sortBy` within buckets additionally lets sort-merge join
  * skip its per-partition sort.
  *
  * Pick the bucket count once per table family: it bounds the join's max
  * parallelism (one task per bucket) and should be sized so a bucket of
  * the LARGEST co-bucketed table fits an executor's task memory — for a
  * 100 TB lineitem at 256 MB/bucket-file target that is O(100k) buckets,
  * NOT the 8 used in tests. Both sides of a co-located join must use the
  * same count (Spark otherwise shuffles the mismatched side).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session catalog.
    * Bucketing metadata lives in the catalog, so this goes through
    * `saveAsTable` (a plain `.parquet(path)` write cannot record it). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    require(!table.contains("."),
      "pass an unqualified table name (default database assumed)")
    // Overwrite mode alone won't reclaim an orphaned managed-table
    // location (e.g. from a killed run): drop + clear it explicitly.
    // The catalog lowercases table names, so the managed location under
    // the warehouse dir is the lowercased name.
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(warehouse,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    df.write.format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Co-located equi-join of two same-bucket-count tables on the bucket
    * key. The returned plan contains NO shuffle exchange for either side
    * (asserted in `BucketingSpec`). */
  def bucketedJoin(s: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    // bind each side once: the join condition must reference the SAME
    // Dataset instances as the operands (expression IDs), not fresh
    // s.table() lookups that only resolve while the relation cache is warm
    val l = s.table(left)
    val r = s.table(right)
    l.join(r, l(leftKey) === r(rightKey), "inner")
  }
}
