package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus blocking scheme shared by the set-similarity operators
  * (`llm_jaccard_pairs`, `llm_ngram_jaccard`, the dedup pipeline):
  * candidates must share `lang` and lie within 10 chars of length. The
  * length predicate rides an equi-key — `bucket = floor(n_chars/10)`,
  * with the right side exploded to bucket ± 1 so every qualifying pair
  * meets on exactly one key — which keeps the join a shuffled hash/merge
  * join, never a cross product. Tightening this key (finer buckets, more
  * sketch bands) is THE scale lever as per-block density grows; changing
  * it here changes every consumer consistently.
  */
object Blocking {

  /** Blocked candidate pairs. `docs` must carry `doc_id, lang, n_chars,
    * bucket` plus the `payload` column; the result holds the left columns
    * and `doc_id2/lang2/n_chars2/<payload>2`, restricted to same-lang
    * (unless `langBlocked = false` — coarser blocks for cross-language
    * matching; the size bucket stays the equi-key), |Δn_chars| ≤ 10 pairs
    * ordered by id (`smallerRight` picks which side has the lower id). */
  def sizeBlockedPairs(docs: DataFrame, payload: String,
      smallerRight: Boolean = false, langBlocked: Boolean = true): DataFrame = {
    val right = docs
      .withColumn("bucket",
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
      .select(col("doc_id").as("doc_id2"), col("lang").as("lang2"),
        col("n_chars").as("n_chars2"), col(payload).as(s"${payload}2"),
        col("bucket"))
    val idCond =
      if (smallerRight) col("doc_id2") < col("doc_id")
      else col("doc_id") < col("doc_id2")
    val langCond =
      if (langBlocked) col("lang") === col("lang2") else lit(true)
    docs.join(right,
      langCond && docs("bucket") === right("bucket") &&
        idCond && abs(col("n_chars") - col("n_chars2")) <= 10, "inner")
  }
}
