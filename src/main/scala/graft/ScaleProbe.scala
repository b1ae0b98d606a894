package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up probe: stage a k×-scaled corpus into a temp sf dir, then time
  * the similarity / dedup family against it — answering "would this hold
  * at 10×?" with measurements instead of guesses. Three staging modes,
  * because the interesting scale axis differs per op family:
  *
  *  - `identical` — documents/embeddings replicated verbatim (ids
  *    shifted): the dup-heavy worst case for near-dup ops; the
  *    exact-dedup-first stages must absorb the replicas (measured FLAT
  *    for the pipeline ops since round 3).
  *  - `perturbed` — embedding replicas get deterministic ±0.5% relative
  *    per-component noise, so every replica is DISTINCT (the exact
  *    collapse absorbs nothing) but replica pairs stay near-dups
  *    (cos ≈ 0.99999). This is the axis on which a fixed LSH band
  *    geometry is quadratic — the round-3 probe could not see it; the
  *    adaptive geometry's candidate volume is measured here directly
  *    (`lsh_candidates` rows = candidate pairs before verification).
  *  - `trainheavy` — TRAIN docs replicated with per-replica token tags
  *    (so their shingles are distinct), test docs fixed: the
  *    decontamination deployment regime (benchmark suite vs 100 TB train
  *    corpus) in which the Bloom pre-filter's pruning of the train
  *    stream is supposed to win — measured instead of asserted.
  *
  *  - `bucketed` — orders/customer replicated with referentially-
  *    consistent key shifts (pmod-filter fractions preserved): the
  *    merge-family and bucketed-join growth regime, with a per-factor
  *    AQE-final plan assertion that the co-located join stays
  *    exchange-free over bucket-aware scans.
  *  - `events` — user-axis replication for the CEP/streaming family.
  *
  * Run:  sbt "runMain graft.ScaleProbe [--modes identical,perturbed]
  *            [--out PROBE.json] factor..."
  * The --out JSON ({mode → factor → op → {sec, rows}}) is the per-round
  * scaling artifact (PROBE_r04.json).
  */
object ScaleProbe {

  private val IdenticalQueries = Seq(
    "llm_exact_dedup", "llm_jaccard_pairs", "llm_ngram_jaccard",
    "llm_minhash_lsh", "llm_simhash_dedup", "llm_dedup_pipeline",
    "llm_dedup_audit", "llm_dedup_incremental", "llm_ngram_lm",
    "llm_embedding_topk_pairs", "llm_embedding_neardup", "llm_embedding_lsh",
    "llm_ann_ivf",
    "llm_lang_id", "llm_tfidf_topterms", "llm_pack_sequences",
    "llm_sample_reservoir", "llm_decontaminate", "llm_decontaminate_bloom",
    "llm_chunk_windows", "llm_mix_weights", "llm_neardup_crosslang",
    "llm_prep_pipeline", "llm_ann_lsh",
    // round-5 adds: identical replicas make every 5-gram corpus-shared
    // (nd ≥ k for all grams) — coverage stays a keyed agg, rows linear
    "llm_repetition", "llm_dup_ngram_coverage",
    // round-7 add (see PairQueries note)
    "llm_dup_spans",
    // round-13 add (DSIR): identical replicas collapse to distinct
    // texts with k/hk-weighted bucket grids, so the hashed-bigram
    // explode runs at distinct-corpus size and the grid stays ≤ 1024
    // rows at any factor — expected curve flat like llm_ngram_lm's
    // (measured 4×/16×: see PROBE_r13)
    "llm_importance_weights",
    // round-9 adds (the round-8 review's evidence gap): the ITERATIVE
    // dedup members — pointer-jump clusters, both keep-best variants —
    // were the only LLM pipeline ops with no dup-heavy curve; under
    // identical replication the exact stage collapses each replica
    // group to one verdict chain, so the expected shape is the flat
    // exact-first curve the pipeline ops measured since round 3
    "llm_dedup_clusters", "llm_dedup_keep_best",
    "llm_dedup_keep_best_incremental",
    // round-10 add: the persisted-state shape — its batch probe runs at
    // survivor scale by construction (exact-match against the survivor
    // index first), so the expected curve is the flat exact-first one;
    // measured 16× identical: continuing query 2.3-3.3 s warm vs 4.3 s
    // full recompute
    "llm_dedup_keep_best_persisted",
    // round-10 add: the sketch-family ingest shape — identical replicas
    // collapse to one banded rep per (text, lang) group before the
    // asymmetric probe, so the curve is the same flat collapse-first
    // one as llm_minhash_lsh, with the probe side additionally
    // restricted to new-carrying groups; measured 2.83 s at 4× →
    // 3.17 s at 16× → 9.85 s at 64× (linear in corpus rows, the floor
    // for any op that must scan the batch; output = one verdict per
    // new doc, 4k → 64k rows, while the full op's pair output grows
    // 1.8M → 29M over the 4×→16× range alone)
    "llm_minhash_lsh_incremental",
    // round-10 add: the simhash twin of the incremental sketch probe —
    // the collapse key is the full admissibility signature (fp, lang,
    // n_chars), so identical replicas fold to one group row and the
    // expected curve is the flat collapse-first one; measured 4.9 s at
    // 4× (cold) → 2.6 s at 16× (warm), verdict rows 4k → 16k
    "llm_simhash_incremental",
    // round-10 add: the persisted-index variant — the probe's single
    // invocation is ingest-INCLUSIVE (the per-dir staging guard fires
    // on first touch, so the timed run pays corpus banding + parquet
    // write + the continuing query); the deployment amortizes the
    // staging, so the honest scale signal here is that even the
    // inclusive cost stays flat on the replica axis (collapse-first
    // staging writes O(distinct texts · 32) rows however duplicated);
    // measured 6.12 s at 4× → 4.29 s at 16× → 5.14 s at 64× (flat
    // within noise even ingest-inclusive)
    "llm_minhash_lsh_persisted",
    // round-10 add: the LIVE streaming ingest of the sketch chain — 4
    // real micro-batches, each collapse-first (replicas fold to one
    // banded rep per (text, lang) group before the probe), so the
    // replica-axis curve should be the flat collapse-first one plus the
    // fixed 4-trigger streaming floor; the timed run includes the
    // once-per-dir batch staging (a full corpus rewrite — the honest
    // ingest-inclusive number, like the persisted op above); measured
    // 23.9 s at 4× (cold JVM) → 19.9 s at 16× (warm) — flat on the
    // replica axis even staging-inclusive, verdict rows 20k → 80k
    // (one per doc, the linear floor for any ingest)
    "stream_minhash_ingest",
    // round-10 add: the embedding-modality ingest — identical replicas
    // are the one regime that exercises its EXACT stage at scale
    // (every replica resolves against the rep index without ever
    // reaching the band probe), so the expected curve is flat band
    // work + linear exact verdicts; measured 13.7 s at 4× (cold JVM)
    // → 8.3 s at 16× (warm, = the 1× sweep cost) — the rep index stays
    // at 2k distinct vectors however many replicas flow past it
    "stream_embedding_ingest",
    // round-10 add: the selection-family ingest — replicas collapse at
    // the exact stage of the survivor probe, clusters only grow, and
    // the keeper argmax contends only affected clusters, so the
    // expected curve is the flat exact-first one (the keep_best /
    // keep_best_persisted shape) plus the 4-trigger floor; measured
    // 16.5 s at 4× → 16.4 s at 16× (staging-inclusive, state rows
    // 20k → 80k) — FLAT on the replica axis
    "stream_keep_best_ingest",
    // round-11 add: the perplexity terciles inherit llm_ngram_lm's
    // adaptive text-collapse (scores collapse to distinct texts; the
    // histogram/cutoff stage is bin-bounded at any factor), so the
    // expected curve is ngram_lm's flat collapse-first one; measured
    // 7.6 s at 4× (cold JVM) → 4.4 s at 16× — flat, as expected
    "llm_perplexity_bucket",
    // round-11 add: identical replicas inflate in-cluster populations
    // k× and pair volume k² on the direct path — measured 141.9 s at
    // 64× before the same-session adaptive exact-vector collapse
    // landed (the neardup lesson: pair machinery on distinct reps,
    // rep-level expansion theorem). With the collapse the curve is
    // FLAT: 3.4 / 2.5 / 3.6 s at 4× / 16× / 64×
    "llm_semantic_dedup",
    // round-11 add: the CCNet composition's stage 1 (exact dedup) IS
    // its collapse — identical replicas fold to one survivor before
    // the lang-ID/LM/tercile stages, so the expected curve is the
    // flat collapse-first one plus the linear dedup-window floor;
    // measured 13.4 s at 4× (cold JVM) → 9.1 s at 16× — flat
    "llm_ccnet_pipeline",
    // round-11 add: the serving read path — the query set stays fixed
    // (10 queries over 4 micro-batches) while identical replicas grow
    // the INDEX side k×, so the expected curve is linear in probed-cell
    // population (each batch scores its queries against NProbe cells of
    // a k×-bigger corpus) plus the 4-trigger streaming floor;
    // measured 7.1 s at 4× (cold JVM) → 5.1 s at 16× — the streaming
    // floor dominates, per-batch probe work stays cell-bounded
    "stream_ann_query",
    // round-11 add: the text serving gate — the model grid trains on
    // distinct texts WEIGHTED by multiplicity (O(distinct) under any
    // duplication, no adaptive decision needed), so the measured curve
    // is the per-doc scoring linear floor + 4 triggers: 14.3 s at 4×
    // → 18.1 s at 16× (every doc gets a verdict row — output 20k →
    // 80k — the same verdict-per-doc floor as the ingest quartet)
    "stream_perplexity_bucket",
    // round-13 add: the DSIR serving gate — the staged λ grid trains
    // on the k× corpus (grid stays ≤1024 rows by construction,
    // training collapse-free here since the explode is one-time
    // staging), then per-batch work is O(batch bigrams) against the
    // grid FileScan + the 4-trigger floor: expect the
    // stream_perplexity_bucket linear shape
    "stream_importance_ingest",
    // round-13: the BPE serving twin — staged tokenizer training is
    // vocab-bounded at any factor (the word agg is the only
    // corpus-scale stage), per-batch work O(batch words) against the
    // frozen seg FileScan: expect the stream_importance_ingest shape
    "stream_bpe_ingest",
    // round-12 adds, probed on arrival (the r11 lesson: new ops ship
    // with curves, not promises). stream_ccnet_ingest: identical
    // replicas collapse at the stage-1 exact dedup (first arrival
    // keeps, every replica emits one dup row against the persisted
    // survivor index), so the expected curve is the flat
    // collapse-first one plus the 4-trigger floor, the linear
    // verdict-per-doc output, and the staging-inclusive one-time
    // model training (itself survivor-sized = flat under replicas)
    "stream_ccnet_ingest",
    // stream_ann_live: identical replicas grow every epoch PREFIX k×,
    // so per-epoch work is the linear prefix centroid agg + the
    // cell-bounded probe — expected ~linear in corpus rows with the
    // 4-trigger floor: the stream_ann_query corpus-axis shape plus
    // the per-epoch quantizer re-publish
    "stream_ann_live",
    // round-12: the SemDeDup ingest under identical replicas — the
    // frozen quantizer refines on the FULL population (replicas count
    // toward cell sizes), identical vectors share their cell, and the
    // cell-local recompute collapses them to reps before the pair
    // join, so the expected curve is the collapse-first flat one plus
    // the O(corpus-so-far) state carry-forward write per epoch
    "stream_semantic_ingest",
    // round-13 adds: BPE training — identical replicas multiply word
    // FREQUENCIES but the vocab (the merge loop's working set) stays
    // fixed, so after the one corpus-scale word agg the 10 rounds are
    // factor-invariant: expected flat after the linear agg floor.
    // Tokenize = the broadcast seg join + per-doc rollup — the linear
    // verdict-per-doc floor
    "llm_bpe_train", "llm_bpe_tokenize",
    // round-13: IVF-PQ — identical replicas grow training/assignment
    // linearly (codebook stays 16×16 by construction) and the probed
    // cells k×; ADC + the fixed R=50 re-rank stay per-query bounded:
    // expected ~linear in corpus rows (the ann serving family shape)
    "llm_ann_pq",
    // round-13: PCA — the covariance outer-product explode is n·d²
    // rows into a d²-key map-side-combined agg, the model tier
    // factor-invariant (64×64 collect + driver power method):
    // expected linear in corpus rows with a flat model tail
    "llm_embedding_pca",
    // round-13: the persisted-index PQ — staging-inclusive timing (the
    // in-JVM guard fires on first touch per dir, the honest
    // deployment-amortized number, like minhash_lsh_persisted); the
    // continuing query itself reads the code FileScan + R raw rows, so
    // even inclusive the curve should track llm_ann_pq's
    "llm_ann_pq_persisted",
    // round-13: the live PQ rebuild chain — each of the 4 epochs pays
    // a prefix-linear retrain + re-encode + publish, so the chain is
    // ~the batch op's cost × the prefix sum plus the 4-trigger floor
    // (the stream_ann_live corpus-axis shape for the quantized index)
    "stream_pq_live",
    // round-16: the delta-epoch cadence — epochs 2 and 4 skip the
    // prefix-linear retrain+re-encode and pay only O(batch)
    // assignment + the serve, so the chain should undercut
    // stream_pq_live's rebuild floor (the 64× A/B vs
    // probe_pq_warm64.json is the acceptance number)
    "stream_pq_live_delta",
    // round-13: the sufficient-statistics PCA — per-epoch MODEL work
    // is O(batch·d²) into a d²-row state (never a prefix rescan), so
    // the chain cost is the linear batch scans + the prefix-linear
    // projection rewrites + the 4-trigger floor
    "stream_pca_live",
    // round-13: vocab artifact (vocab-tier after the corpus fold —
    // flat like llm_bpe_train) and the PCA-residual outlier filter
    // (the covariance linear shape + a TakeOrdered tail)
    "llm_bpe_vocab", "llm_embedding_outliers",
    // round-13: the live quarantine — stream_pca_live's state shape
    // with a per-epoch top-25 re-select instead of the prefix
    // projection rewrite (output 25·k rows at any factor)
    "stream_outliers_live",
    // round-15 adds (the r14 verdict's item 1): the perceptual-hash
    // media family on its DANGEROUS axis — identical payloads share
    // the full (fp, fmt, n_bytes) admissibility signature, so the
    // pairs face's OUTPUT is C(k,2) per duplicate group by semantics
    // (like join_interval_bucketed's density-quadratic truth); the
    // probe measures that pair GENERATION is collapse-first (band
    // machinery at group scale, expansion an equi-join growing with
    // the output) rather than k²-amplified banded candidates + a
    // corpus-pair distinct. incremental/ingest emit one verdict per
    // new doc — expected flat-to-linear like their simhash twins
    "mm_phash_dedup", "mm_phash_incremental", "stream_phash_ingest",
    // round-15 continuation adds: the clusters face (group-scale
    // verdicts by the gid-minimality theorem + pointer jumping —
    // expected the flat collapse-first curve; identical replicas
    // deepen no chain, they widen groups) and the RRF fusion (two
    // broadcast-query corpus streams + shortlist-sized fusion —
    // expected linear in corpus rows, the serving-family floor)
    "mm_phash_clusters", "llm_hybrid_rrf",
    // round-16: the ANN-backed fusion — the IVF leg's probed cells
    // grow k×, the BM25 leg's postings collapse to the distinct
    // vocabulary (identical replicas multiply tf, not terms), the
    // fusion stays shortlist-sized; expected ~linear
    "llm_hybrid_rrf_ann",
    // round-16: the trained quality classifier — 16 keyless aggs over
    // the k×-grown 20 % sample plus one k×-grown scoring projection,
    // no collapse machinery (features are per-doc folds); expected
    // ~linear with a per-iteration job floor
    "llm_quality_logreg",
    // round-15: the selection face — clusters + a min-struct argmax
    // + a cluster-keyed join back; expected the clusters curve + a
    // linear agg
    "mm_phash_keep_best",
    // round-15: the recall evaluator — its corpus cost is its two
    // rankers' (IVF probed above; the exact side is the brute-force
    // baseline's one corpus stream past 10 broadcast queries), the
    // hit join query-sized; expected ~linear
    "llm_ann_recall")

  // Exact Ω(n²) embedding ops are deliberately absent: on 32k DISTINCT
  // vectors they are the documented quadratic family whose sub-quadratic
  // alternatives (LSH sketch, IVF-ANN) are exactly what this mode measures.
  private val PerturbedQueries = Seq("llm_embedding_lsh", "llm_ann_ivf",
    // round-12 add (the r11 verdict's item 1): DISTINCT vectors are the
    // axis the identical-replica probe could not certify — the fixed
    // `label` alphabet makes the within-cell pair join O(n²/|labels|)
    // in distinct corpus size. The adaptive sub-quantization
    // (TrainingDataOps.semanticCells) refines oversized cells to
    // subcell target √n, bounding pair volume at O(n·√n); measure with
    // default conf (refined) and with
    // --conf spark.graft.semanticCellCap:999999999999 (the un-refined
    // BEFORE curve, for the record)
    "llm_semantic_dedup",
    // round-12: the live serving composition under DISTINCT-vector
    // growth — per-epoch quantizer re-publish is a linear prefix agg
    // and the probe stays cell-bounded, so the expected curve is
    // ~linear in corpus rows plus the 4-trigger floor
    "stream_ann_live",
    // round-12: the SemDeDup ingest on its pair-heavy axis — distinct
    // vectors defeat the exact collapse, so per-epoch cost is the
    // affected cells' O(n·√n)-bounded pair volume under the frozen
    // refined quantizer (every epoch recomputes its touched cells
    // from full membership; the 4-epoch chain re-pays growing
    // prefixes, so expect ~4× the batch op's own perturbed cost plus
    // the state carry-forward writes)
    "stream_semantic_ingest",
    // round-13: IVF-PQ on the distinct-vector axis (the real ANN
    // regime): Lloyd training + code assignment are linear scans
    // against the fixed 16×16 codebook, the ADC agg is linear in
    // probed-cell population, the re-rank fixed at R·nq rows —
    // expected ~linear in corpus rows, no quadratic cliff anywhere
    "llm_ann_pq",
    // round-13: PCA under distinct-vector growth — same linear
    // covariance shape as the identical axis (the explode cost
    // depends only on row count), flat model tail
    "llm_embedding_pca",
    // round-13: the live PQ rebuild on the distinct-vector axis —
    // per-epoch retrain is prefix-linear against the fixed 16×16
    // codebook, no quadratic cliff anywhere in the chain
    "stream_pq_live",
    // round-13: the sufficient-statistics PCA under distinct vectors —
    // identical shape to the identical axis (state work depends only
    // on row count)
    "stream_pca_live")

  // The pair-emitting subset of the identical regime, split out so the
  // 64× point (where a full identical sweep would mostly re-measure the
  // linear keyed-agg family) stays affordable: these are the ops whose
  // candidate-generation shape decides super- vs sub-linear growth —
  // the round-6 evidence gap named by the round-5 review.
  private val PairQueries = Seq(
    "llm_jaccard_pairs", "llm_minhash_lsh", "llm_neardup_crosslang",
    "llm_embedding_topk_pairs", "llm_embedding_neardup", "llm_embedding_lsh",
    // round-7 add: corpus-position candidate volume — the op whose 16×
    // direct path measured 74–130 s before the adaptive text collapse
    "llm_dup_spans")

  private val TrainHeavyQueries =
    Seq("llm_decontaminate", "llm_decontaminate_bloom",
      // round-10 add: the streaming ingest of exactly this regime (the
      // fixed benchmark suite watching a replicated train stream) —
      // per-batch distinct-text collapse + the staged Bloom prune
      // should keep it as flat as the bloom op; measured 8.5 s at 4×
      // → 7.9 s at 16× (staging-inclusive) even though trainheavy
      // replicas carry DISTINCT shingles the text collapse can't
      // absorb — the sketch prunes the inflated train stream before
      // any shuffle, which is the op's whole claim
      "stream_decontaminate_ingest",
      // round-12 adds (the r11 verdict's item 2): the CCNet trio on
      // the VOCABULARY axis — trainheavy's per-replica token tags make
      // every replica a DISTINCT text, so the exact collapse absorbs
      // nothing, the bigram grid and per-lang histograms grow with the
      // corpus, and the curve measures exactly the model-table growth
      // the identical-replica probe could not see. Expected shapes:
      // vocab-sized model tables grow ~linearly in distinct tokens,
      // histograms stay bin-bounded, so all three should track the
      // linear explode/score floor
      "llm_perplexity_bucket", "llm_ccnet_pipeline",
      "stream_perplexity_bucket",
      // round-12: the live CCNet build on the same vocabulary axis —
      // staging-inclusive (the frozen models train on k× distinct
      // survivor texts at stream start) plus 4 triggers of per-batch
      // classify/score; expected ~linear like its batch twin
      "stream_ccnet_ingest",
      // round-15 adds: the phash family's DISTINCT-payload axis —
      // trainheavy's per-replica token tags change byte distributions
      // and lengths, so replicas carry distinct fingerprints the
      // signature collapse cannot absorb: the banded join runs at k×
      // distinct-signature scale (the real-corpus growth regime).
      // For mm_phash_incremental the new set (doc_id%100 ≥ 80) stays
      // at 1× while the old index grows k× distinct — the asymmetric
      // deployment shape. Expected ~linear for all three
      "mm_phash_dedup", "mm_phash_incremental", "stream_phash_ingest",
      // round-15 continuation: distinct payloads grow the signature
      // group table k× — the clusters face's band join runs at that
      // scale, the member agg linear; expected ~linear (keep_best
      // adds one corpus-linear argmax agg on top)
      "mm_phash_clusters", "mm_phash_keep_best",
      // round-16 (the r15 verdict's item 6 — no empty matrix cells):
      // the retrieval trio on the DISTINCT-text axis — trainheavy
      // replicas defeat any text collapse, so the rankers' corpus
      // streams, the Jaccard token arrays, and the BM25 postings all
      // grow k× distinct; shortlists and fusion stay query-bounded.
      // Expected ~linear (the serving-family floor) for all three
      "llm_hybrid_rrf", "llm_ann_recall", "llm_hybrid_rrf_ann")

  // The iterative-graph family (round-8): the loop's claim is O(nodes)
  // shuffled bytes per round HOWEVER MANY EDGES EXIST, so the honest
  // probe grows edges with the node set FIXED — lineitem replicas
  // rewire l_suppkey by a per-replica cyclic shift (a bijection on the
  // dense supplier key space: node set unchanged, ~k× distinct
  // (cust, supp) pairs after the layout's distinct). A probe curve
  // tracking k at the per-round level would indict the loop (edges
  // re-shuffling); the expected shape is scan-linear growth of the
  // layout + the in-place agg's input, with constant broadcast sizes
  // and constant per-round output.
  private val GraphQueries =
    Seq("graph_pagerank", "graph_pagerank_personalized",
      "graph_connected_components")

  // The merge family rides the bucketed-target posture (Joins.scala's
  // merge notes): probed on a k×-scaled orders/customer pair whose key
  // shifts preserve the pmod-filter fractions, so src/tgt populations —
  // and thus the merge's work — grow exactly linearly. join_bucketed
  // itself is probed twice (ingest-inclusive cold, then staging-cache
  // warm) plus an AQE-final plan assertion per factor (see main loop).
  private val BucketedQueries = Seq("merge_upsert", "merge_scd2")

  // The CEP / interval / time-series family scales on the USER axis
  // (more users in the same time window — event volume per user is
  // bounded in any real corpus), so replicas shift user_id. Note
  // join_interval_bucketed's OUTPUT is density-quadratic by semantics
  // (±1 s pairs across all users: k× both sides ⇒ k² true pairs in the
  // fixed window) — the probe measures that the *plumbing* stays an
  // equi-join growing with the output, never a nested loop.
  private val EventQueries = Seq(
    "events_funnel", "events_pattern_abc", "events_pattern_quantified",
    "join_interval_bucketed",
    "ts_interpolate", "window_sessionize", "agg_heavy_hitters",
    "stream_funnel", "stream_pattern_abc", "stream_pattern_quantified",
    "stream_session_dynamic", "stream_stream_join_outer",
    // round-5 adds: optional/absence CEP + count windows (state per key
    // is bounded by the live horizon, so the user axis is the honest one)
    "events_pattern_optional", "stream_pattern_optional",
    "events_pattern_absence", "stream_pattern_absence",
    // round-13 add: the iterative-condition twins — the predicate is
    // one extra conjunct on the same user-keyed join / filtered buffer
    // scan, so the expected curve matches the funnel pair's
    "events_pattern_value", "stream_pattern_value",
    // round-13 add: temporal table join — the dim (customer replicas)
    // grows with the user axis and stays broadcast; expected ~linear
    // in events on top of the 4-trigger floor + k dim re-publishes.
    // NOTE the replicated corpus breaks ts-monotonicity-in-id across
    // replicas, so the probe measures the JOIN PLUMBING cost only
    // (boundaries degenerate to ~t0); correctness is the real-corpus
    // oracle's job
    "stream_temporal_join",
    // round-13 add: dynamic rules — O(|types|) broadcast per epoch,
    // expected ~linear in events on the same 4-trigger floor
    "stream_rules_apply",
    "events_count_window", "stream_count_window",
    "events_count_sliding", "stream_count_sliding",
    "ts_ewma", "stream_ewma", "events_retention",
    "events_transitions", "stream_transitions", "events_attribution",
    "ts_zscore", "stream_zscore", "events_type_overlap", "events_rfm",
    "events_ab_test", "agg_histogram",
    // round-5 continuation adds: times(2) CEP twins, forward as-of,
    // growth-accounting rollups (all user-keyed — the user axis again)
    "events_pattern_times", "stream_pattern_times",
    "join_asof_forward", "events_dau", "events_stickiness",
    // chained-stateful + sketch family (all user-axis)
    "stream_conversion_lag", "stream_dau", "udaf_topk_sketch",
    "events_pattern_until", "events_conversion_lag",
    // round-11 add: the bounded until — same buffered-window state
    // bounds as the quantified pattern, user-axis like all CEP
    "stream_pattern_until_bounded")

  private def queriesFor(mode: String): Seq[String] = mode match {
    case "identical" => IdenticalQueries
    case "pairs" => PairQueries
    case "perturbed" => PerturbedQueries
    case "trainheavy" => TrainHeavyQueries
    case "events" => EventQueries
    case "bucketed" => BucketedQueries
    case "graph" => GraphQueries
    case "queries" => Seq.empty // query-volume axis: see the main loop
    case m => throw new IllegalArgumentException(s"unknown probe mode $m")
  }

  def main(args: Array[String]): Unit = {
    var modes = Seq("identical")
    var out: Option[String] = None
    // --ops restricts each mode's list to this set (targeted re-probe of
    // one op without paying the full family sweep); unknown names error
    var opsFilter: Option[Set[String]] = None
    // --conf k:v pairs applied to the probe session (round-12: lets a
    // BEFORE/AFTER pair bracket an adaptive decision, e.g. pinning
    // spark.graft.semanticCellCap past any population)
    val confs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val factors = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--modes" => modes = args(i + 1).split(",").toSeq; i += 2
        case "--ops" => opsFilter = Some(args(i + 1).split(",").toSet); i += 2
        case "--out" => out = Some(args(i + 1)); i += 2
        case "--conf" =>
          val Array(k, v) = args(i + 1).split(":", 2); confs += (k -> v)
          i += 2
        case f => factors += f.toInt; i += 1
      }
    }
    opsFilter.foreach { ops =>
      val known = modes.flatMap(queriesFor).toSet
      require((ops -- known).isEmpty,
        s"--ops not in the selected modes' lists: ${ops -- known}")
    }
    if (factors.isEmpty) factors += 4
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    // mode → factor → op → (sec, rows)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int,
        scala.collection.mutable.LinkedHashMap[String, (Double, Long)]]]

    modes.foreach { mode =>
      val perMode = results.getOrElseUpdate(mode,
        scala.collection.mutable.LinkedHashMap.empty)
      factors.toSeq.foreach { k =>
        val dir = Files.createTempDirectory(s"graft_scale_${mode}_${k}x_")
          .toString
        val perFactor = perMode.getOrElseUpdate(k,
          scala.collection.mutable.LinkedHashMap.empty)
        try {
          stage(spark, baseSf, dir, k, mode)
          println(s"[scaleprobe] === $mode ${k}x corpus staged at $dir ===")
          def timed(name: String)(body: => Long): Unit = {
            val t0 = System.nanoTime()
            val n = try body catch { case e: Throwable =>
              println(s"[scaleprobe] $name FAILED: ${e.getMessage}"); -1L
            }
            val sec = (System.nanoTime() - t0) / 1e9
            perFactor(name) = (sec, n)
            println(f"[scaleprobe] $mode ${k}x $name: $sec%.2f s ($n rows)")
          }
          queriesFor(mode)
            .filter(n => opsFilter.forall(_.contains(n)))
            .foreach { name =>
            // snapshot BEFORE the query so cleanup can target only the
            // RDDs this query created: unpersisting a localCheckpoint
            // RDD destroys its only copy (lineage is truncated), so a
            // blanket unpersist would brick any pre-existing memoized
            // DataFrame built on a checkpoint block
            val preexisting = spark.sparkContext.getPersistentRDDs.keySet
            // full-evaluation force (see Bench.force): count() would let
            // the optimizer skip column reads and unique-key join work.
            timed(name)(Bench.force(SparkEntry.queries(name)(spark, dir)))
            // drop THIS query's leftover localCheckpoint RDDs (crosslang,
            // dedup audit) — accumulated checkpoint blocks pin storage
            // memory across the long probe session and inflate later
            // queries' sorts by whole multiples (measured: llm_ngram_lm
            // 8 s → 25 s, ts_zscore 2 s → 15 s late in a 100+-query run).
            // BLOCKING, the Bench lesson: a lazy unpersist leaves the
            // blocks resident while the NEXT query runs — round-8's
            // ngram_jaccard collapse checkpoint (k×-corpus texts) left
            // non-blocking measured llm_ngram_lm 7 s → 26 s at 16×
            spark.sparkContext.getPersistentRDDs
              .filterNot { case (id, _) => preexisting(id) }
              .values.foreach(_.unpersist(blocking = true))
          }
          if (mode == "queries") {
            // the serving read path at k× the QUERY volume over the
            // unchanged 1× corpus/index: stream_ann_query's per-batch
            // claim is O(batch queries × probed cells), so the curve
            // should be ~linear in nq above the fixed 4-trigger +
            // one-time quantizer-staging floor
            // (--ops applies here too — r12 advice: these two were
            // hardcoded past the filter)
            if (opsFilter.forall(_.contains("stream_ann_query")))
              timed(s"stream_ann_query_q${10 * k}")(
                graft.streaming.StreamingOps
                  .annQueryRun(spark, dir, 4, nq = 10 * k)._1.count())
            // the read+write composition on the same axis: each of the
            // 4 epochs re-answers the k×-sized STATIC query set against
            // its prefix, so expect ~linear in nq on top of the
            // per-epoch quantizer-re-publish floor
            if (opsFilter.forall(_.contains("stream_ann_live")))
              timed(s"stream_ann_live_q${10 * k}")(
                graft.streaming.StreamingOps
                  .annLiveRun(spark, dir, 4, nq = 10 * k)._1.count())
          }
          if (mode == "perturbed" && opsFilter.isEmpty)
            // candidate volume BEFORE verification — the quantity whose
            // growth curve decides whether the banding is sub-quadratic
            timed("lsh_candidates")(
              operators.TrainingDataOps.embeddingLshCandidates(spark, dir)
                .count())
          if (mode == "bucketed" && opsFilter.isEmpty) {
            // First join_bucketed invocation pays the bucketed INGEST
            // (writeBucketed of both k×-scaled tables — the shuffle
            // moved to write time); the second hits the per-dir staging
            // cache and times the pure bucket-local join. Both curves
            // matter: ingest is the amortized cost, the warm join is
            // what every subsequent query pays.
            timed("join_bucketed_ingest")(
              Bench.force(SparkEntry.queries("join_bucketed")(spark, dir)))
            timed("join_bucketed")(
              Bench.force(SparkEntry.queries("join_bucketed")(spark, dir)))
            // Exchange-free proof under AQE at THIS factor: disable
            // broadcast to force the sort-merge path the tables would
            // take at 100 TB (a broadcast join is also shuffle-free but
            // proves nothing about bucketing), then require the
            // AQE-final plan to be bucket-aware with no hash exchange.
            val key = s"graft_b_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
            val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
            val prev = spark.conf.get(bcastKey)
            try {
              spark.conf.set(bcastKey, "-1")
              val probe = sources.Bucketing.bucketedJoin(spark,
                  s"${key}_orders", s"${key}_customer",
                  "o_custkey", "c_custkey")
                .agg(count(lit(1)).as("n"))
              timed("join_bucketed_smj")(probe.head().getLong(0))
              val plan = probe.queryExecution.executedPlan.toString
              require(!plan.contains("Exchange hashpartitioning"),
                s"bucketed join shuffles at ${k}x:\n$plan")
              require(plan.contains("Bucketed: true"),
                s"scan not bucket-aware at ${k}x:\n$plan")
              println(s"[scaleprobe] bucketed ${k}x: AQE-final plan is " +
                "exchange-free over bucket-aware scans")
            } finally {
              spark.conf.set(bcastKey, prev)
              // managed bucketed tables are per-factor (key embeds the
              // temp dir) — drop so the warehouse dir doesn't accrete
              spark.sql(s"DROP TABLE IF EXISTS ${key}_orders")
              spark.sql(s"DROP TABLE IF EXISTS ${key}_customer")
            }
          }
        } finally {
          // staged corpora are k× the base tables — reclaim per factor
          import scala.jdk.CollectionConverters._
          val stream = java.nio.file.Files.walk(Paths.get(dir))
          try stream.iterator().asScala.toSeq.reverseIterator
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
          finally stream.close()
        }
      }
    }
    out.foreach { path =>
      val json = new StringBuilder
      json.append(s"""{"sf":"$baseSf","modes":{""")
      json.append(results.map { case (mode, perMode) =>
        s""""$mode":{""" + perMode.map { case (k, perFactor) =>
          s""""$k":{""" + perFactor.map { case (name, (sec, rows)) =>
            f""""$name":{"sec":$sec%.3f,"rows":$rows}"""
          }.mkString(",") + "}"
        }.mkString(",") + "}"
      }.mkString(","))
      json.append("}}\n")
      Files.write(Paths.get(path), json.toString.getBytes("UTF-8"))
      println(s"[scaleprobe] wrote $path")
    }
    spark.stop()
  }

  /** Symlink every base table; overwrite documents/embeddings per the
    * staging mode (see the object scaladoc). All replica content is a
    * deterministic function of (replica index, id) — no randomness. */
  private[graft] def stage(s: SparkSession, baseSf: String, dir: String,
      k: Int, mode: String): Unit = {
    val stagedTables: Set[String] = mode match {
      case "events" => Set("events")
      case "bucketed" => Set("orders", "customer")
      case "graph" => Set("orders", "lineitem")
      case _ => Set.empty
    }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").filterNot(stagedTables).foreach { t =>
      Files.createSymbolicLink(Paths.get(s"$dir/$t.parquet"),
        Paths.get(s"$baseSf/$t.parquet"))
    }
    def link(t: String): Unit =
      Files.createSymbolicLink(Paths.get(s"$dir/$t.parquet"),
        Paths.get(s"$baseSf/$t.parquet"))
    val docs = s.read.parquet(s"$baseSf/documents.parquet")
    val emb = s.read.parquet(s"$baseSf/embeddings.parquet")
    mode match {
      case "identical" | "pairs" =>
        val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
        (0 until k).map(i => docs.withColumn("doc_id",
            col("doc_id") + lit(i * maxDoc)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
        (0 until k).map(i => emb.withColumn("vec_id",
            col("vec_id") + lit(i * maxVec)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      case "perturbed" =>
        // only the embedding ops run here — docs stay at 1×
        link("documents")
        val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
        (0 until k).map { i =>
          val shifted = emb.withColumn("vec_id",
            col("vec_id") + lit(i * maxVec))
          if (i == 0) shifted
          else shifted.withColumn("embedding",
            // ±0.5% relative noise keyed by (shifted id, component):
            // replicas are distinct vectors at cos ≈ 0.99999 — true
            // near-dups the exact collapse cannot absorb
            transform(col("embedding"), (x, j) =>
              (x * (lit(1.0) +
                (pmod(xxhash64(col("vec_id"), j), lit(1000L))
                  .cast("double") / lit(1000.0) - lit(0.5)) * lit(0.01)))
                .cast("float")))
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      case "trainheavy" =>
        // TRAIN docs (doc_id%100 < 80) replicated k−1 extra times with a
        // per-replica token tag interleaved (distinct shingles per
        // replica); id shift is a multiple of 100 so the replica stays in
        // the train split. Test/val docs stay at 1×.
        link("embeddings")
        val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
        val shiftUnit = ((maxDoc + 99) / 100) * 100
        (0 until k).map { i =>
          if (i == 0) docs
          else docs.filter(pmod(col("doc_id"), lit(100L)) < 80)
            .withColumn("doc_id", col("doc_id") + lit(i * shiftUnit))
            .withColumn("text",
              regexp_replace(col("text"), " ", s" q$i"))
        }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      case "bucketed" =>
        // Key-shifted orders/customer replicas for the bucketed-join /
        // merge probes. Shifts keep referential integrity (o_custkey
        // moves with c_custkey) AND the merge ops' pmod-filter
        // fractions: the order shift is ≡ 0 (mod lcm(10,7) = 70) so
        // merge_upsert's tgt (pmod 10 < 8) and src (pmod 7 = 0) stay
        // the same proportion of every replica; the customer shift is
        // ≡ 0 (mod 7) for merge_scd2's update set. Work therefore
        // grows exactly linearly in k and any super-linear probe curve
        // indicts the operator, not the data.
        link("documents"); link("embeddings")
        val ord = s.read.parquet(s"$baseSf/orders.parquet")
        val cust = s.read.parquet(s"$baseSf/customer.parquet")
        val maxOrder = ord.agg(max("o_orderkey")).head().getLong(0) + 1
        val maxCust = cust.agg(max("c_custkey")).head().getLong(0) + 1
        val orderShift = ((maxOrder + 69) / 70) * 70
        val custShift = ((maxCust + 6) / 7) * 7
        (0 until k).map(i => ord
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * orderShift))
            .withColumn("o_custkey", col("o_custkey") + lit(i * custShift)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        (0 until k).map(i => cust
            .withColumn("c_custkey", col("c_custkey") + lit(i * custShift)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      case "graph" =>
        // EDGE-axis growth with a fixed node set (see GraphQueries):
        // order keys shift (referential integrity), custkeys stay, and
        // l_suppkey cycles by 37·i within the dense supplier key space —
        // an addition-mod-n bijection, so no new supplier nodes appear
        // and each replica contributes a distinct (cust, supp) pair set.
        link("documents"); link("embeddings")
        val ord = s.read.parquet(s"$baseSf/orders.parquet")
        val li = s.read.parquet(s"$baseSf/lineitem.parquet")
        val maxOrder = ord.agg(max("o_orderkey")).head().getLong(0) + 1
        val maxSupp = li.agg(max("l_suppkey")).head().getLong(0)
        (0 until k).map(i => ord
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * maxOrder)))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        (0 until k).map(i => li
            .withColumn("l_orderkey", col("l_orderkey") + lit(i * maxOrder))
            .withColumn("l_suppkey",
              pmod(col("l_suppkey") - 1 + lit(i * 37L), lit(maxSupp)) + 1))
          .reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      case "queries" =>
        // QUERY-VOLUME axis (round-12, the r11 verdict's item 7): the
        // corpus/index stays at 1× — only the serving query stream
        // scales (handled in the main loop via annQueryRun's nq), so
        // the curve isolates per-batch cost O(batch queries × probed
        // cells) from the corpus-axis growth r11 measured
        link("documents"); link("embeddings")
      case "events" =>
        // USER-axis growth: every replica shifts user_id AND event_id, so
        // the same time window holds k× the users (per-user history depth
        // unchanged — the realistic shape; deepening one user's history
        // k× would instead balloon per-key state). Written through
        // Tables.events' nanos conf: the staged ts column is plain INT64
        // (µs semantics preserved via `div`-based readers).
        link("documents"); link("embeddings")
        val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
        val prevNanos = s.conf.getOption(nanosKey)
        s.conf.set(nanosKey, "true")
        try {
          val ev = s.read.parquet(s"$baseSf/events.parquet")
          val mx = ev.agg(max("event_id"), max("user_id")).head()
          val maxEvent = mx.getLong(0) + 1
          val maxUser = mx.getLong(1) + 1
          // 7-aligned user shift (round-13): stream_temporal_join's dim
          // derives its update set from user/customer keys mod 7, so
          // the replica shift must preserve residues — and the dim side
          // (customer) replicates with the SAME shift so every replica
          // user still resolves (the dim grows with the user axis, the
          // realistic shape). The shift must clear BOTH key spaces:
          // customer keys run far past the event user ids, and a
          // shorter shift would alias replica customers onto original
          // keys — duplicate dim keys, output multiplied (caught live:
          // 16× read 11.5M rows instead of 1.6M)
          val maxCust = s.read.parquet(s"$baseSf/customer.parquet")
            .agg(max("c_custkey")).head().getLong(0) + 1
          val userShift = ((math.max(maxUser, maxCust) + 6) / 7) * 7
          (0 until k).map(i => ev
              .withColumn("event_id", col("event_id") + lit(i * maxEvent))
              .withColumn("user_id", col("user_id") + lit(i * userShift)))
            .reduce(_ unionAll _)
            .write.mode("overwrite").parquet(s"$dir/events.parquet")
          val cust = s.read.parquet(s"$baseSf/customer.parquet")
          (0 until k).map(i => cust
              .withColumn("c_custkey", col("c_custkey") + lit(i * userShift)))
            .reduce(_ unionAll _)
            .write.mode("overwrite").parquet(s"$dir/customer.parquet")
        } finally prevNanos match {
          // restore so staging can't leak conf into the timed probe run
          case Some(v) => s.conf.set(nanosKey, v)
          case None => s.conf.unset(nanosKey)
        }
      case m => throw new IllegalArgumentException(s"unknown probe mode $m")
    }
  }
}
