package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders + shared helpers for every operator in the engine.
  *
  * Design notes (100 TB posture): every loader returns a plain
  * `spark.read.parquet` DataFrame so Catalyst keeps full control of
  * predicate pushdown, column pruning and partition planning — no caching,
  * no collects. At cluster scale the same code reads a partitioned
  * directory instead of a single file; nothing here assumes one file.
  *
  * Determinism discipline (SURVEY.md §2.0):
  *  - D2: money doubles are cast to DECIMAL(38,6) *per row* before any
  *    aggregation the DuckDB oracle re-computes (decimal addition is
  *    associative, so partition order can't change results).
  *  - H1: `events.ts` has shipped in two physical encodings across
  *    testdata generations — INT64 TIMESTAMP(NANOS), which Spark 4.1.2
  *    only reads with `spark.sql.legacy.parquet.nanosAsLong=true`
  *    (arriving as a nanos BIGINT), and INT64 TIMESTAMP(MICROS)
  *    isAdjustedToUTC=false (arriving as TIMESTAMP_NTZ). `events()` sets
  *    the conf and normalizes BOTH to the engine's canonical `ts` = epoch
  *    NANOS bigint (the NTZ wall time is UTC by data contract; every
  *    harness session pins spark.sql.session.timeZone=UTC, so the cast
  *    is exact), matching DuckDB's µs view of the same column.
  */
object Tables {

  /** DECIMAL(38,6) used for all money aggregation (SURVEY §2.0 D2). */
  val Money: DecimalType = DecimalType(38, 6)

  /** Cast a (money) column to DECIMAL(38,6) — apply per row, pre-agg. */
  def dec(c: Column): Column = c.cast(Money)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Events with event-time restored: nanos (bigint after the legacy conf)
    * → microsecond timestamp `ts_utc`, plus all original columns.
    * Matches DuckDB's µs truncation of the same parquet (verified in
    * SURVEY §1.3 H1). Must set the conf here because the harness builds
    * the session without it (Verify.scala:10-15).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Integer division: `ts / 1000` would go through double and lose
    // precision at ~1.7e18 ns (observed: ±1 µs vs DuckDB's truncation).
    normalizeEventsTs(table(s, d, "events"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
  }

  /** Rewrite an events frame's `ts` to the canonical epoch-NANOS bigint
    * whatever the physical parquet encoding delivered (H1): a nanos
    * BIGINT passes through; a TIMESTAMP/TIMESTAMP_NTZ (micros encoding)
    * becomes `unix_micros * 1000` — exact integer arithmetic, no double
    * round-trip. Pure projection, so it composes with streaming reads. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
}
