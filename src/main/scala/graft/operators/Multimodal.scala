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

  val queries: Map[String, Q] = Map(
    // Rows-only (stubbed decode has no SQL oracle); MultimodalSpec checks
    // schema, determinism, and partition-parallel execution.
    "mm_decode_features" -> ((s, d) => {
      import s.implicits._
      val assets = graft.Tables.documents(s, d)
        .select(col("doc_id"), col("source").as("fmt"),
          col("text").cast("binary").as("payload"))
        .as[MmAsset]
      assets.mapPartitions(_.map(decode)).toDF().orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map.empty
}
