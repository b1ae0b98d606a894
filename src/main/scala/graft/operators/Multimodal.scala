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
    // Rows-only (stubbed decode has no SQL oracle); MultimodalSpec checks
    // schema, determinism, and partition-parallel execution.
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

  val oracle: Map[String, String] = Map.empty
}
