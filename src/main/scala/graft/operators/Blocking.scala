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

  /** Cross-language near-dup candidates with a CONTENT-derived second
    * blocking key inside the size bucket (round-6 rework of the one
    * round-5 `weak` query). Dropping the `lang` equi-key leaves the size
    * bucket as the only blocking key, and bucket population grows
    * linearly with corpus size — so in-block pair volume grows
    * QUADRATICALLY even when the true near-dup pair count grows
    * linearly (real corpus growth: new content, not new copies). The
    * fix is the AllPairs/PPJoin prefix filter (Bayardo et al., WWW'07;
    * Xiao et al., WWW'08) hybridized with a frequent-token fallback:
    *
    *  - Global token order = (document frequency ASC, token id ASC).
    *    For Jaccard ≥ t, a doc's PREFIX is its first
    *    `n − ceil(t·n) + 1` tokens in that order (its rarest tokens).
    *    THEOREM (lossless): if J(x,y) ≥ t, the smallest shared token w
    *    lies in BOTH prefixes — x has ≤ n_x − ceil(t·n_x) tokens
    *    outside the overlap, so the first n_x − ceil(t·n_x) + 1 must
    *    include an overlap token, and every x-token ordered before w
    *    is unshared, so the first overlap token IS w (same for y).
    *  - RARE channel: index each doc's rare prefix tokens
    *    (df ≤ max(N/20, 100)); candidates join on (token, size bucket).
    *  - COMMON fallback: a degenerate corpus (tiny vocabulary — every
    *    prefix token frequent) would make the inverted index QUADRATIC
    *    per token, worse than size blocking. Docs whose prefix contains
    *    any common token fall back to the plain size-bucket join among
    *    themselves. Lossless split: if the minimal shared token w of a
    *    qualifying pair is common, both prefixes contain a common token
    *    (w itself) ⇒ both docs are in the fallback; if w is rare, at
    *    least the all-rare side proves w rare ⇒ both emit (w, bucket)
    *    rare keys ⇒ the rare channel finds the pair. The channels are
    *    DISJOINT (rare channel drops both-common pairs), so no global
    *    pair distinct across channels is needed.
    *
    * The threshold is RELATIVE (df > N/20): under real corpus growth the
    * same absolute df becomes relatively rare, moving mass from the
    * quadratic fallback into the linear inverted index — measured in
    * ScaleProbe's `distinctdocs` mode. At sf0.1 the 31-token vocabulary
    * is ~77% df, so everything rides the fallback and the op costs the
    * same as plain size blocking.
    *
    * `docs` must carry `doc_id, lang, n_chars, bucket, toks` (sorted
    * token-id array). `tau` is the common-token df threshold (the caller
    * derives it from the corpus row count — any value is lossless, it
    * only moves mass between the two channels). Returns candidate pairs
    * with both payloads, cross-lang, |Δn_chars| ≤ 10, doc_id < doc_id2,
    * each pair exactly once (superset of all J ≥ t pairs; caller
    * verifies exactly). The freq table is vocabulary-sized and AQE
    * broadcasts it when small. */
  def crossLangHybridPairs(docs: DataFrame, t: Double, tau: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs.select(explode(col("toks")).as("tid"))
      .groupBy(col("tid")).agg(count(lit(1)).as("df"))
    // r17 (guide §1.2 — compute shared stages once): `ranked` (the
    // df-join + per-doc prefix window over the corpus token stream) has
    // TWO consumers (the has_common flags agg and the rare-channel
    // index), each of which re-evaluated the whole explode+join+window
    // subtree; the cut materializes the prefix-token table once.
    val ranked = AdaptiveCollapse.stageCut(docs.sparkSession)(docs
      .select(col("doc_id"), col("lang"), col("n_chars"), col("bucket"),
        size(col("toks")).as("n"), explode(col("toks")).as("tid"))
      .join(freq, "tid")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tid"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * t) + 1)
      .withColumn("is_common", col("df") > tau))
    val flags = ranked.groupBy(col("doc_id"))
      .agg(max(col("is_common")).as("has_common"))
    val flagged = docs.join(flags, "doc_id")
    // COMMON fallback: plain size-bucket join among common-prefix docs
    val commonPairs = sizeBlockedPairs(
      flagged.filter(col("has_common")).drop("has_common"),
      "toks", langBlocked = false)
      .filter(col("lang") =!= col("lang2"))
    // RARE channel: inverted index on (rare prefix token, bucket);
    // id-only pair rows (payload joined AFTER distinct so the ~p-way
    // token fan-out never replicates the arrays through the shuffle)
    val idx = ranked.filter(!col("is_common"))
      .join(flags, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("bucket"),
        col("tid"), col("has_common"))
    val idxR = idx
      .withColumn("bucket",
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
      .select(col("doc_id").as("doc_id2"), col("lang").as("lang2"),
        col("n_chars").as("n_chars2"), col("bucket"), col("tid").as("tid2"),
        col("has_common").as("has_common2"))
    val rareIds = idx.join(idxR,
        col("tid") === col("tid2") && idx("bucket") === idxR("bucket") &&
          col("doc_id") < col("doc_id2") &&
          abs(col("n_chars") - col("n_chars2")) <= 10 &&
          col("lang") =!= col("lang2") &&
          !(col("has_common") && col("has_common2")), "inner")
      .select(col("doc_id"), col("doc_id2")).distinct()
    val payload = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      col("toks"))
    val rarePairs = rareIds
      .join(payload, "doc_id")
      .join(payload.select(col("doc_id").as("doc_id2"),
        col("lang").as("lang2"), col("n_chars").as("n_chars2"),
        col("toks").as("toks2")), "doc_id2")
    commonPairs.select(col("doc_id"), col("lang"), col("n_chars"),
        col("toks"), col("doc_id2"), col("lang2"), col("n_chars2"),
        col("toks2"))
      .unionByName(rarePairs.select(col("doc_id"), col("lang"),
        col("n_chars"), col("toks"), col("doc_id2"), col("lang2"),
        col("n_chars2"), col("toks2")))
  }
}
