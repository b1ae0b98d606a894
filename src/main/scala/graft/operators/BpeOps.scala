package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Byte-pair-encoding tokenizer training and application (round-13
  * adds; Sennrich et al. 2016 §3.2 — the tokenizer-construction step
  * every LLM data pipeline runs before token counting / packing).
  *
  * `llm_bpe_train`: learn the first [[NMerges]] merge rules over the
  * corpus word-frequency table. The classic trainer structure maps to
  * Spark in two tiers:
  *
  *  - CORPUS tier (once): one explode + word-keyed hash agg builds
  *    (word, freq) — the only corpus-scale shuffle; the corpus is
  *    never touched again (the vocab table is stage-cut). At 100 TB
  *    the vocab is bounded by distinct words, orders of magnitude
  *    below corpus bytes (real trainers additionally prune to a
  *    frequency-capped vocab before merging; the synthetic vocab is
  *    tiny so no cap is registered — the merge loop's cost model is
  *    vocab-sized either way).
  *  - VOCAB tier (per merge round): adjacent-pair explode over the
  *    current segmentations → pair-keyed agg (map-side combinable,
  *    vocab-sized) → ONE argmax row collected to the driver — the
  *    trainer's inherently sequential choice (merge r+1's counts
  *    depend on merge r having been applied); the merge itself is a
  *    narrow per-row rewrite. No corpus-scale driver loop anywhere.
  *
  * Determinism: pair counts are exact longs (position counts weighted
  * by word freq, overlapping positions counted as in the reference
  * implementation — "aaa" contributes (a,a) twice); the argmax is
  * total-ordered (count DESC, left ASC, right ASC — (left,right) is
  * the agg key, so the order has no ties); merge application is the
  * standard greedy LEFT-TO-RIGHT non-overlapping rewrite ("aaaa" +
  * (a,a) → ["aa","aa"], never ["a","aa","a"]). The DuckDB oracle
  * mirrors all three: the same agg, the same total order, and the
  * greedy rewrite as one recursive CTE per round (head-of-list state
  * machine, MATERIALIZED per-round tables so the chain evaluates each
  * round exactly once).
  *
  * `llm_bpe_tokenize`: apply the learned merges corpus-wide. Every
  * corpus word is in the training vocab by construction, so a word's
  * tokenization IS its final training segmentation — application is
  * one broadcast join (vocab-sized build side) + a doc_id-keyed agg;
  * the corpus side never shuffles before the per-doc rollup.
  * tokens_per_word is a single int/int division rounded once
  * (display-only, the llm_repetition discipline).
  */
object BpeOps {

  type Q = (SparkSession, String) => DataFrame

  /** Merge-table size. 10 rounds is enough to learn multi-char units
    * on the synthetic vocab while keeping the oracle's unrolled
    * per-round CTE chain readable; real trainers run the same loop to
    * a vocab-size budget. */
  private[graft] val NMerges = 10

  /** Greedy left-to-right non-overlapping application of ONE merge
    * rule — the reference rewrite (vocab-tier only: runs on (word,
    * seg) rows, never on corpus rows). */
  private val applyMerge = udf((seg: Seq[String], l: String, r: String) => {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == l && seg(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += seg(i); i += 1 }
    }
    out.toSeq
  })

  /** Frequency cap for the registered capped faces (r15, the r14
    * verdict's item 6): top-16 words by (freq DESC, w ASC) out of the
    * synthetic corpus's 31 distinct words — the cap genuinely prunes
    * at every SF, so the capped oracle rows differ from the uncapped
    * ones and the closed-vocab semantics (OOV words drop from
    * tokenize) are exercised for real. */
  private[graft] val CapVocab = 16

  /** The shared trainer core: ([(rank, left, right, pair_count)],
    * final (w, freq, seg) segmentation table). Stops early if no pair
    * remains (every word fully merged) — the oracle's empty-b_r CTEs
    * degrade identically. `capDefault` is the registered capped faces'
    * explicit cap; the conf (probe/spec experiments only — Verify
    * asserts it unset) takes precedence when set. */
  private def bpeCore(s: SparkSession, d: String,
      capDefault: Option[Int] = None)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val cutF = AdaptiveCollapse.stageCut(s) _
    // LAZY stage cut for the merge loop (r16): eager localCheckpoint
    // cost one materialization JOB per round on top of the argmax job;
    // lazy keeps the identical lineage truncation (the checkpoint
    // materializes inside the next argmax job's first read) at half
    // the jobs. Safe here because every cut frame is consumed in-plan
    // only — no directory-read ordering hazards (the reason other cut
    // sites stay eager).
    val lazyCut: DataFrame => DataFrame = df =>
      if (s.conf.getOption("spark.graft.checkpointStages")
        .exists(_.equalsIgnoreCase("false"))) df
      else df.localCheckpoint(false)
    // w <> '' : split keeps empty tokens for consecutive/leading/
    // trailing spaces, and a zero-length word would diverge three ways
    // (Spark's sequence(1,0) DESCENDS to [1,0] → seg ["",""], DuckDB's
    // generate_series(1,0) is empty) — filter them in BOTH engines
    val vocabAll = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // frequency-capped vocab prune (conf spark.graft.bpeVocabCap,
    // 0/unset = uncapped — the registered ops' contract): real
    // trainers prune to a capped vocab before merging because the
    // distinct-word table is the merge loop's one input that still
    // grows with corpus size at 100 TB. Deterministic top-V by
    // (freq DESC, w ASC) — compiles to TakeOrderedAndProject, never a
    // global sort. In capped mode, tokenize drops OOV words (the
    // pruned tail) by the inner vocab join — the standard
    // closed-vocab semantics.
    // defensive parse (r14 advice): a malformed conf value should name
    // itself, not surface as a bare NumberFormatException mid-plan.
    // Precedence (r15 advice): a declared capDefault WINS — the
    // registered capped faces pin CapVocab and a stray session conf
    // must not silently move them off their oracle; the conf steers
    // only the uncapped experiment path (capDefault = None).
    val cap = capDefault.orElse(
      s.conf.getOption("spark.graft.bpeVocabCap")
        .map(v => scala.util.Try(v.trim.toInt).getOrElse(
          throw new IllegalArgumentException(
            s"spark.graft.bpeVocabCap must be an integer, got '$v'")))
        .filter(_ > 0))
    val vocab = cap.fold(vocabAll)(v =>
      vocabAll.orderBy(col("freq").desc, col("w")).limit(v))
    // stage-cut: the corpus explode must run ONCE, not once per round
    // (eager — the first round has two consumers of it)
    var seg = cutF(vocab.withColumn("seg",
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")))
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= NMerges && !done) {
      val best = seg.filter(size(col("seg")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(seg) - 1),
             i -> struct(element_at(seg, i) AS l,
                         element_at(seg, i + 1) AS r))""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, rr, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rr, cnt))
        seg = lazyCut(seg.withColumn("seg",
          applyMerge(col("seg"), lit(l), lit(rr))))
        r += 1
      }
    }
    (merges.toSeq, seg)
  }

  /** The publishable tokenizer artifact: (w, n_tok) — each vocab
    * word's final-segmentation token count. `llm_bpe_tokenize` joins
    * it directly; `stream_bpe_ingest` stages it to parquet once and
    * serves every micro-batch against the frozen FileScan. */
  private[graft] def segTable(s: SparkSession, d: String,
      capDefault: Option[Int] = None): DataFrame = {
    val (_, segN) = bpeCore(s, d, capDefault)
    segN.select(col("w"), size(col("seg")).cast("long").as("n_tok"))
  }

  private def trainDf(s: SparkSession, d: String,
      capDefault: Option[Int]): DataFrame = {
    import s.implicits._
    val (merges, _) = bpeCore(s, d, capDefault)
    merges.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .select(col("merge_rank"), col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"),
        col("pair_count"))
      .orderBy(col("merge_rank"))
  }

  private def tokenizeDf(s: SparkSession, d: String,
      capDefault: Option[Int]): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(segTable(s, d, capDefault)), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        round(col("n_tokens") / col("n_words"), 6).as("tokens_per_word"))
      .orderBy(col("doc_id"))

  val queries: Map[String, Q] = Map(
    "llm_bpe_train" -> ((s, d) => trainDf(s, d, None)),

    // The 100 TB deployment shape as a REGISTERED, oracle-checked face
    // (r15, the r14 verdict's item 6): real trainers prune to a
    // frequency-capped vocab before merging because the distinct-word
    // table is the merge loop's one corpus-growing input. Deterministic
    // top-[[CapVocab]] by (freq DESC, w ASC) — compiles to
    // TakeOrderedAndProject, never a global sort; the merge loop then
    // runs UNCHANGED on the pruned vocab, and the oracle applies the
    // identical cap CTE so the capped semantics are hash-checked, not
    // spec-only.
    "llm_bpe_train_capped" -> ((s, d) => trainDf(s, d, Some(CapVocab))),

    // The tokenizer's VOCAB artifact (round-13 add): one row per
    // distinct symbol of the final segmentation — the vocab file a
    // trained tokenizer ships. corpus_freq counts every occurrence
    // position weighted by word frequency (a symbol can appear twice
    // in one word); n_vocab_words = distinct words containing it;
    // merged = multi-char (single chars are the never-merged base
    // alphabet by construction). Vocab-tier only: the corpus was
    // already folded into (word, freq) by the shared trainer.
    "llm_bpe_vocab" -> ((s, d) => {
      val (_, segN) = bpeCore(s, d)
      segN.select(col("w"), col("freq"), explode(col("seg")).as("symbol"))
        .groupBy(col("symbol"))
        .agg(sum(col("freq")).as("corpus_freq"),
          countDistinct(col("w")).as("n_vocab_words"))
        .withColumn("merged", length(col("symbol")) > 1)
        .orderBy(col("corpus_freq").desc, col("symbol"))
    }),

    "llm_bpe_tokenize" -> ((s, d) => tokenizeDf(s, d, None)),

    // Closed-vocab application (r15): tokenize against the CAPPED
    // tokenizer — OOV words (the pruned tail) drop via the inner vocab
    // join, the standard closed-vocab semantics; n_words counts only
    // in-vocab words and a doc of ONLY OOV words drops from the output
    // entirely (the oracle's inner USING(w) join mirrors both).
    "llm_bpe_tokenize_capped" ->
      ((s, d) => tokenizeDf(s, d, Some(CapVocab)))
  )

  /** One trainer round of the DuckDB mirror: pair counts (p_r), the
    * total-ordered argmax (b_r), and the greedy left-to-right rewrite
    * as a head-of-list recursive state machine (m_r: (rem, acc) — one
    * step consumes one symbol or one matched pair; a word's final
    * state is its rem = [] row). Per-round tables are MATERIALIZED:
    * without it DuckDB inlines each CTE into its consumers and the
    * 10-round chain re-evaluates the whole prefix per scalar subquery
    * (measured: non-terminating at 10 rounds; 0.3 s materialized). */
  private def mergeRoundSql(r: Int): String = {
    val prev = s"seg${r - 1}"
    s"""p$r AS MATERIALIZED (
         SELECT seg[g.i] AS l, seg[g.i+1] AS r, sum(freq) AS cnt
         FROM $prev, LATERAL unnest(generate_series(1, len(seg)-1)) AS g(i)
         WHERE len(seg) >= 2 GROUP BY 1, 2),
       b$r AS MATERIALIZED (
         SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1),
       m$r AS (
         SELECT w, freq, seg AS rem, CAST([] AS VARCHAR[]) AS acc
         FROM $prev
         UNION ALL
         SELECT w, freq,
           CASE WHEN len(rem) >= 2 AND rem[1] = (SELECT l FROM b$r)
                     AND rem[2] = (SELECT r FROM b$r)
                THEN rem[3:] ELSE rem[2:] END,
           CASE WHEN len(rem) >= 2 AND rem[1] = (SELECT l FROM b$r)
                     AND rem[2] = (SELECT r FROM b$r)
                THEN list_append(acc, rem[1] || rem[2])
                ELSE list_append(acc, rem[1]) END
         FROM m$r WHERE len(rem) > 0),
       seg$r AS MATERIALIZED (
         SELECT w, freq, acc AS seg FROM m$r WHERE len(rem) = 0)"""
  }

  /** The vocab CTE, optionally frequency-capped: the capped faces
    * prune to the top-`cap` words by the trainer's exact total order
    * (freq DESC, w ASC) before any merging — the same deterministic
    * prune `bpeCore` applies. */
  private def vocabCte(cap: Option[Int]): String = cap match {
    case None =>
      """vocab AS MATERIALIZED (
         SELECT w, count(*) AS freq FROM
           (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> '' GROUP BY 1)"""
    case Some(v) =>
      s"""vocab AS MATERIALIZED (
         SELECT w, freq FROM (
           SELECT w, count(*) AS freq FROM
             (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
           WHERE w <> '' GROUP BY 1)
         ORDER BY freq DESC, w LIMIT $v)"""
  }

  /** The shared CTE chain: vocab → seg0 → (p_r, b_r, m_r, seg_r) for
    * r = 1..NMerges. */
  private def bpeCtesSql(cap: Option[Int] = None): String =
    s"""${vocabCte(cap)},
       seg0 AS MATERIALIZED (
         SELECT w, freq,
           list_transform(generate_series(1, CAST(length(w) AS BIGINT)),
             i -> substr(w, CAST(i AS INT), 1)) AS seg
         FROM vocab),
       ${(1 to NMerges).map(mergeRoundSql).mkString(",\n       ")}"""

  private def trainOracleSql(cap: Option[Int]): String =
    s"""WITH RECURSIVE
       ${bpeCtesSql(cap)}
       ${(1 to NMerges).map(r =>
        s"""SELECT CAST($r AS INT) AS merge_rank, l AS left_sym,
            r AS right_sym, l || r AS merged,
            CAST(cnt AS BIGINT) AS pair_count FROM b$r""")
        .mkString(" UNION ALL ")}
       ORDER BY merge_rank"""

  private def tokenizeOracleSql(cap: Option[Int]): String =
    s"""WITH RECURSIVE
       ${bpeCtesSql(cap)},
       tok AS (SELECT doc_id, w FROM
                 (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents) WHERE w <> ''),
       per AS (SELECT t.doc_id, count(*) AS n_words,
                 sum(len(s.seg)) AS n_tokens
               FROM tok t JOIN seg$NMerges s USING (w) GROUP BY 1)
       SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              round(n_tokens / n_words, 6) AS tokens_per_word
       FROM per ORDER BY doc_id"""

  val oracle: Map[String, String] = Map(
    "llm_bpe_train" -> trainOracleSql(None),
    "llm_bpe_train_capped" -> trainOracleSql(Some(CapVocab)),

    "llm_bpe_vocab" ->
      s"""WITH RECURSIVE
         ${bpeCtesSql()},
         sym AS (SELECT w, freq, unnest(seg) AS symbol
                 FROM seg$NMerges)
         SELECT symbol, CAST(sum(freq) AS BIGINT) AS corpus_freq,
                CAST(count(DISTINCT w) AS BIGINT) AS n_vocab_words,
                length(symbol) > 1 AS merged
         FROM sym GROUP BY symbol
         ORDER BY corpus_freq DESC, symbol""",

    "llm_bpe_tokenize" -> tokenizeOracleSql(None),
    "llm_bpe_tokenize_capped" -> tokenizeOracleSql(Some(CapVocab))
  )
}
