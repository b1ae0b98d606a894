package graft.operators

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (`mm_decode_features`): treat media as an
  * opaque `binary` payload column with typed metadata, and run
  * decode/feature-extract as a partition-mapped stage — the Scala analog
  * of a Pandas-UDF `mapInPandas` media pipeline.
  *
  * ===== STUB DECODER =====
  * No image/audio codecs exist in this environment, so `decode` below is
  * a clearly-marked deterministic fake (byte histogram + derived fake
  * dimensions standing in for pixel decoding). The Spark-side plumbing is
  * real and tested: binary column + metadata schema, typed Dataset
  * partition mapping (no per-row driver involvement, arbitrary partition
  * counts), deterministic output.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  case class MmAsset(doc_id: Long, fmt: String, payload: Array[Byte])
  case class MmFeatures(doc_id: Long, fmt: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Double])

  /** STUB: deterministic fake decode — byte histogram moments in place of
    * a real image/audio decode. Replace with a codec call in production. */
  def decode(a: MmAsset): MmFeatures = {
    val bytes = a.payload
    val hist = new Array[Double](8)
    bytes.foreach(b => hist((b & 0xff) % 8) += 1.0)
    val n = math.max(bytes.length, 1)
    val features = hist.map(h =>
      java.math.BigDecimal.valueOf(h / n)
        .setScale(6, RoundingMode.HALF_UP).doubleValue())
    MmFeatures(a.doc_id, a.fmt, bytes.length,
      16 + (bytes.length % 64), 16 + ((bytes.length / 64) % 64), features)
  }

  case class MmFrame(doc_id: Long, frame_idx: Int, frame_hash: Long)

  /** STUB: deterministic "resize" — rescales the fake dimensions and
    * renormalizes features to the new pixel count. Replace the arithmetic
    * with a real resampling kernel in production; the signature (pure
    * row-level function, partition-mapped) is the production shape. */
  def resize(f: MmFeatures, w: Int, h: Int): MmFeatures = {
    val scale = (w.toLong * h) / math.max(f.width.toLong * f.height, 1L).toDouble
    f.copy(width = w, height = h,
      features = f.features.map(v =>
        java.math.BigDecimal.valueOf(v * scale)
          .setScale(6, RoundingMode.HALF_UP).doubleValue()))
  }

  /** STUB frame sampler: every `stride`-th 16-byte window of the payload
    * is one "frame", fingerprinted with a rolling polynomial hash — the
    * video analog of sampling one frame per second. Emits (doc, frame)
    * rows via a partition-mapped flatMap, so a 2-hour video fans out to
    * its sampled frames without any driver involvement. */
  def frameSample(a: MmAsset, stride: Int): Iterator[MmFrame] = {
    val bytes = a.payload
    // a window starting at `off` reads bytes [off, off+16), so the last
    // valid start is length-16 ⇒ exclusive bound length-15
    Iterator.range(0, math.max(bytes.length - 15, 0), 16 * stride)
      .zipWithIndex.map { case (off, idx) =>
        var h = 1125899906842597L
        var i = off
        while (i < off + 16) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
        MmFrame(a.doc_id, idx, h)
      }
  }

  /** Serialize the feature vector at the output boundary: array columns are
    * unhashable in the driver's pandas comparator, and the stub's values
    * are already 6-dp-rounded, so DECIMAL(12,6) strings are lossless. */
  private def serializeFeatures =
    array_join(transform(col("features"),
      x => x.cast("decimal(12,6)").cast("string")), ",")

  private def assets(s: SparkSession, d: String) = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(col("doc_id"), col("source").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MmAsset]
  }

  val queries: Map[String, Q] = Map(
    // Oracle-checked since round 10 — the stub decode is deterministic
    // byte arithmetic, so it mirrors in SQL (see the oracle map below);
    // MultimodalSpec additionally checks schema, determinism, and
    // partition-parallel execution.
    "mm_decode_features" -> ((s, d) => {
      import s.implicits._
      assets(s, d).mapPartitions(_.map(decode)).toDF()
        .withColumn("features", serializeFeatures)
        .orderBy(col("doc_id"))
    }),

    // decode → resize to a fixed 32×32 thumbnail grid, one fused
    // partition-mapped stage (no shuffle between the two steps).
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      assets(s, d).mapPartitions(_.map(a => resize(decode(a), 32, 32)))
        .toDF()
        .withColumn("features", serializeFeatures)
        .orderBy(col("doc_id"))
    }),

    // payload → sampled frame fingerprints (1 row per sampled frame).
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      assets(s, d).mapPartitions(_.flatMap(a => frameSample(a, 4)))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    })
  )

  /** DuckDB mirrors (round-10 graduation of all three mm ops): the
    * decode is a STUB, but a deterministic one over the UTF-8 payload
    * bytes, so it mirrors like any other arithmetic. Corpus assumption
    * (as MurmurSql): ASCII text ⇒ ord(char) == payload byte and
    * length(text) == octet length.
    *
    * - frame_sample: Java's wrapping 64-bit `31·h + b` polynomial is
    *   emulated exactly with HUGEINT mod 2^64 plus a final two's-
    *   complement signed reinterpretation; windows are the
    *   `unnest(range(...))` offset explosion (stride 64 = 16·4).
    * - decode/resize: the byte histogram is a mod-8 count; the 6-dp
    *   HALF_UP feature rounding mirrors as DuckDB round() on the same
    *   double ratio (swept at all three SFs — same D4 discipline as
    *   the cosine family); the decimal(12,6)-string serialization is
    *   CAST(CAST(v AS DECIMAL(12,6)) AS VARCHAR). */
  private def frameSampleOracleSql: String =
    s"""WITH assets AS (SELECT doc_id, text, length(text) AS len
                        FROM documents),
       frames AS (
         SELECT doc_id, text,
                CAST(unnest(range(0,
                  greatest((len - 16) // 64 + 1, 0))) AS INT) AS frame_idx
         FROM assets),
       hashed AS (
         SELECT doc_id, frame_idx,
           list_reduce(
             list_prepend(CAST(1125899906842597 AS HUGEINT),
               list_transform(range(1, 17),
                 i -> CAST(ord(substring(text,
                   frame_idx * 64 + CAST(i AS INT), 1)) AS HUGEINT))),
             (acc, x) -> (acc * 31 + x) %
               CAST('18446744073709551616' AS HUGEINT)) AS hu
         FROM frames)
       SELECT doc_id, frame_idx,
              CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
                THEN hu - CAST('18446744073709551616' AS HUGEINT)
                ELSE hu END AS BIGINT) AS frame_hash
       FROM hashed ORDER BY doc_id, frame_idx"""

  /** The decode CTE chain shared by the decode/resize oracles: ends in
    * `feat(doc_id, fmt, n_bytes, width, height, k, f)` — one row per
    * (doc, histogram slot k in 0..7) with the 6-dp-rounded feature f. */
  private def decodeCtes: String =
    s"""assets AS (SELECT doc_id, source AS fmt, text,
                     length(text) AS len FROM documents),
       bytes AS (
         SELECT doc_id,
                ord(substring(text,
                  CAST(unnest(range(1, len + 1)) AS INT), 1)) % 8 AS k
         FROM assets),
       slots AS (SELECT a.doc_id, t.k
                 FROM assets a, range(0, 8) t(k)),
       hist AS (
         SELECT s.doc_id, s.k, count(b.k) AS h
         FROM slots s LEFT JOIN bytes b
           ON b.doc_id = s.doc_id AND b.k = s.k
         GROUP BY 1, 2),
       feat AS (
         SELECT a.doc_id, a.fmt, a.len AS n_bytes,
                16 + a.len % 64 AS width,
                16 + (a.len // 64) % 64 AS height,
                h.k,
                round(CAST(h.h AS DOUBLE) / greatest(a.len, 1), 6) AS f
         FROM assets a JOIN hist h ON h.doc_id = a.doc_id)"""

  private def featuresJoin(fCol: String): String =
    s"""list_aggregate(
          list_transform(list($fCol ORDER BY k),
            v -> CAST(CAST(v AS DECIMAL(12,6)) AS VARCHAR)),
          'string_agg', ',')"""

  private def decodeOracleSql: String =
    s"""WITH $decodeCtes
       SELECT doc_id, any_value(fmt) AS fmt,
              any_value(n_bytes) AS n_bytes,
              any_value(width) AS width, any_value(height) AS height,
              ${featuresJoin("f")} AS features
       FROM feat GROUP BY doc_id ORDER BY doc_id"""

  private def resizeOracleSql: String =
    s"""WITH $decodeCtes,
       rs AS (
         SELECT doc_id, fmt, n_bytes, 32 AS width, 32 AS height, k,
                round(f * (1024.0 /
                  greatest(CAST(feat.width AS BIGINT) * feat.height, 1)),
                  6) AS f2
         FROM feat)
       SELECT doc_id, any_value(fmt) AS fmt,
              any_value(n_bytes) AS n_bytes,
              any_value(width) AS width, any_value(height) AS height,
              ${featuresJoin("f2")} AS features
       FROM rs GROUP BY doc_id ORDER BY doc_id"""

  val oracle: Map[String, String] = Map(
    "mm_frame_sample" -> frameSampleOracleSql,
    "mm_decode_features" -> decodeOracleSql,
    "mm_resize" -> resizeOracleSql)
}
