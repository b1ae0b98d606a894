package graft.operators

import java.math.RoundingMode

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  case class MmPhash(doc_id: Long, fmt: String, n_bytes: Int, fp: Long)

  /** STUB perceptual hash — the average-hash (aHash) algorithm run on
    * the decode stub's OWN feature space, the byte-value histogram
    * (the full 64-bin refinement of [[decode]]'s 8-bin one, standing
    * in for the resized luma grid a real aHash thresholds): bit i is
    * set iff value-class i = byte % 64 is over-represented vs the
    * uniform expectation — cnt_i·64 > len, compared CROSS-MULTIPLIED
    * in exact longs (the gopher_rules discipline: no division, no
    * doubles, so the DuckDB mirror is bit-exact by construction).
    * A distribution hash, not a positional one, deliberately: media
    * near-dups survive re-encode/crop-like edits that SHIFT content
    * (measured on this corpus: positional slots give min hamming 14 —
    * no near-dup structure — while the distribution bits separate
    * near-dup payloads at ≤ 3 from the blocked-pair background).
    * A real pipeline swaps bytes for decoded pixels; the hash
    * algebra, banding, and join shape are the production shape. */
  def phash(a: MmAsset): MmPhash = {
    val bytes = a.payload
    val len = bytes.length
    if (len == 0) return MmPhash(a.doc_id, a.fmt, 0, 0L)
    val cnt = new Array[Long](64)
    var i = 0
    while (i < len) { cnt((bytes(i) & 0xff) % 64) += 1; i += 1 }
    var h = 0L
    var k = 0
    while (k < 64) {
      if (cnt(k) * 64 > len) h |= (1L << k)
      k += 1
    }
    MmPhash(a.doc_id, a.fmt, len, h)
  }

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

  /** The phash table of any (doc_id, source, text) frame —
    * (doc_id, fmt, n_bytes, fp), computed in one partition-mapped
    * stage. Shared by the batch ops and the streaming ingest twin. */
  private[graft] def phashOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("source").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[MmAsset]
      .mapPartitions(_.map(phash)).toDF()
  }

  /** Pluggable admissibility blocking for the phash family (r15
    * parameter; r16 lift to ONE audited copy — the r14 verdict's
    * item 5, closed): candidates must share `fmt` and lie within
    * `window` of the `size` EXPRESSION's value. The byte-stream STUB
    * blocks on payload n_bytes; a real pipeline blocks on DECODED
    * dimensions — swap `size` for a width/height-derived expression
    * and the whole family (pairs face, clusters, incremental,
    * streaming verdicts core) follows, no operator rewrite: every
    * site routes through [[admissibleMeet]], the single copy of the
    * admissibility logic. `size` must be integral and derivable from
    * the phash row's (fmt, n_bytes) — [[compactPhashIndex]]'s
    * losslessness argument relies on that. The stub tuning cannot
    * silently become load-bearing: the DEFAULT instance's constants
    * ([[PhashBlocking.DefaultWindow]], [[PhashBlocking.HammingRadius]])
    * are interpolated into every phash DuckDB oracle, so operator and
    * oracle move together or the hash gate trips. */
  case class PhashBlocking(size: Column = col("n_bytes"),
      window: Int = PhashBlocking.DefaultWindow) {
    require(window >= 1, s"phash blocking window must be >= 1: $window")
  }

  object PhashBlocking {
    /** |Δsize| admissibility half-width of the default (byte-stub)
      * blocking — shared with the oracle SQL by interpolation. */
    val DefaultWindow = 16

    /** Near-dup hamming radius. MUST stay ≤ SimHash.Blocks − 1 for
      * the pigeonhole band join to be lossless (≤ Blocks−1 bit flips
      * ⇒ ≥ 1 identical 16-bit block) — shared with the oracle SQL by
      * interpolation. */
    val HammingRadius = 3
  }

  /** Materialize `blk.size` as the canonical block-size column `bsz`
    * — the ONLY place the pluggable size expression is evaluated.
    * From here on the family speaks `bsz`, so signature-group frames
    * (which no longer carry the raw asset columns) remain
    * admissibility-compatible. */
  private def withBlockSize(ph: DataFrame, blk: PhashBlocking): DataFrame =
    ph.withColumn("bsz", blk.size)

  /** THE one audited copy of phash admissibility (r16 — previously
    * inlined at four sites): a probe row meets a candidate row iff
    * fmt = fmt2, |bsz − bsz2| ≤ blk.window, and hamming(fp, fp2) ≤
    * [[PhashBlocking.HammingRadius]]. Plan shape: the hamming radius
    * rides the SimHash 4×16-bit block-key pigeonhole (≤ 3 flips ⇒
    * ≥ 1 identical block) and the size window rides the
    * floor(bsz/window) grid with the CANDIDATE side exploded to
    * grid ± 1, so every admissible pair meets on the (bk, fmt, g)
    * equi-key — a hash join, never a nested loop, at whatever scale
    * (row or signature-group) the caller feeds it.
    *
    * Contract: both inputs already carry `bsz` (via [[withBlockSize]]
    * or as a group key), plus (idCol resp. candIdCol, fmt, fp).
    * Output: (idCol, candIdCol, hamming), one row PER MEETING KEY —
    * callers apply their own id-ordering predicate and
    * distinct/min-aggregate on top (Catalyst pushes that filter into
    * the join condition, so post-hoc is plan-identical to inline). */
  private def admissibleMeet(probe: DataFrame, idCol: String,
      cand: DataFrame, candIdCol: String,
      blk: PhashBlocking): DataFrame = {
    val bkU = udf((fp: Long) => graft.functions.SimHash.blockKeys(fp))
    val p = probe
      .withColumn("g", floor(col("bsz") / blk.window))
      .select(col(idCol), col("fmt"), col("bsz"), col("g"), col("fp"),
        explode(bkU(col("fp"))).as("bk"))
    val c = cand
      .withColumn("g", floor(col("bsz") / blk.window))
      .withColumn("g", explode(array(col("g") - 1, col("g"),
        col("g") + 1)))
      .select(col(candIdCol), col("fmt").as("fmt2"),
        col("bsz").as("bsz2"), col("g"), col("fp").as("fp2"),
        explode(bkU(col("fp"))).as("bk2"))
    p.join(c,
        col("bk") === col("bk2") && col("fmt") === col("fmt2") &&
          p("g") === c("g") &&
          abs(col("bsz") - col("bsz2")) <= blk.window, "inner")
      .filter(expr("bit_count(fp ^ fp2)") <=
        PhashBlocking.HammingRadius)
      .select(col(idCol), col(candIdCol),
        expr("bit_count(fp ^ fp2)").cast("int").as("hamming"))
  }

  /** All near-dup pairs of a phash table (doc_id, fmt, <sizeCol>, fp):
    * (doc_id < doc_id2, hamming ≤ 3), both sides admissible under
    * `blk`. GROUP-COLLAPSED (r15, closing the r14 verdict's item 1 —
    * the llm_simhash_incremental discipline applied to the PAIRS
    * face): rows sharing the full admissibility signature (fp, fmt,
    * size) are interchangeable under both the block join and the
    * hamming verify, so the band machinery runs at GROUP scale and
    * the corpus-pair output is reconstructed by output-sized
    * equi-joins — intra-group pairs are ONE gid-keyed self-join
    * (hamming 0 by the shared fp), inter-group pairs expand each
    * admissible group pair's member cross product exactly once. The
    * output is C(k,2) per duplicate group BY SEMANTICS (the direct
    * pairwise oracle states it), but generation work is now
    * O(distinct-signature banding + output), never k²-amplified
    * banded candidates into a corpus-pair distinct (measured at 64×
    * identical replicas: 18.9 s → see PROBE_r15). */
  private[graft] def phashPairs(ph: DataFrame,
      blk: PhashBlocking = PhashBlocking()): DataFrame = {
    val pb = withBlockSize(ph, blk)
    val groups = pb.groupBy(col("fp"), col("fmt"), col("bsz"))
      .agg(min(col("doc_id")).as("gid"))
    val gsel = groups.select(col("gid"), col("fmt"), col("bsz"),
      col("fp"))
    // distinct ADMISSIBLE unordered group pairs — the only distinct in
    // the plan, at group-pair scale (a pair meets on ≤ 4 shared blocks
    // × ≤ 2 grid cells, never on corpus-pair volume)
    val gpairs = admissibleMeet(gsel, "gid",
        gsel.withColumnRenamed("gid", "gid2"), "gid2", blk)
      .filter(col("gid") < col("gid2"))
      .distinct()
    val members = pb.join(
        groups.select(col("fp"), col("fmt"), col("bsz"), col("gid")),
        Seq("fp", "fmt", "bsz"))
      .select(col("gid"), col("doc_id"))
    val intra = members.join(
        members.select(col("gid"), col("doc_id").as("doc_id2")),
        Seq("gid"))
      .filter(col("doc_id") < col("doc_id2"))
      .select(col("doc_id"), col("doc_id2"), lit(0).as("hamming"))
    val inter = gpairs
      .join(members, Seq("gid"))
      .join(members.select(col("gid").as("gid2"),
        col("doc_id").as("oid2")), Seq("gid2"))
      .select(least(col("doc_id"), col("oid2")).as("doc_id"),
        greatest(col("doc_id"), col("oid2")).as("doc_id2"),
        col("hamming"))
    intra.unionByName(inter)
  }

  /** Horizon-free arrival-order verdicts of one batch against the
    * persisted phash index: dup_of(n) = min{c < n : c admissible}
    * (same fmt, |Δn_bytes| ≤ 16, hamming ≤ 3). Index rows are all
    * EARLIER than every batch row by the monotone-arrival guard and
    * earlier-in-batch candidates have smaller ids, so the single
    * `cand_id < doc_id` rule covers both sides — which is what makes
    * the final k-epoch table batch-boundary-invariant and lets ONE
    * global SQL be the oracle. Shared by `stream_phash_ingest`.
    * Admissibility keys ride [[PhashBlocking]] (r15) — real assets
    * swap the byte-size column for decoded dimensions. */
  private[graft] def phashVerdictsCore(batchPh: DataFrame,
      indexPh: DataFrame,
      blk: PhashBlocking = PhashBlocking()): DataFrame = {
    val probe = withBlockSize(batchPh, blk)
      .select(col("doc_id"), col("fmt"), col("bsz"), col("fp"))
    val cands = withBlockSize(indexPh.unionByName(batchPh), blk)
      .select(col("doc_id").as("cand_id"), col("fmt"), col("bsz"),
        col("fp"))
    val matched = admissibleMeet(probe, "doc_id", cands, "cand_id", blk)
      .filter(col("cand_id") < col("doc_id"))
      .groupBy(col("doc_id")).agg(min(col("cand_id")).as("dup_of"))
    batchPh.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"), col("fmt"),
        when(col("dup_of").isNotNull, lit("band_dup"))
          .otherwise(lit("kept")).as("stage"),
        col("dup_of"))
  }

  /** Compact a phash index to one row per admissibility signature:
    * only min(cand_id) ever decides a verdict, and within a (fp, fmt,
    * n_bytes) group every member is interchangeable under blocking AND
    * hamming, so the group minimum is a LOSSLESS index compaction —
    * the persisted index stays O(distinct signatures) forever however
    * many duplicate assets stream past (the keep-smallest discipline,
    * exact, not a heuristic). Lossless for ANY [[PhashBlocking]] whose
    * size expression derives from (fmt, n_bytes): the compaction key
    * is then FINER than the admissibility signature, and min-of-mins
    * over a finer partition is the group min. */
  private[graft] def compactPhashIndex(ph: DataFrame): DataFrame =
    ph.groupBy(col("fp"), col("fmt"), col("n_bytes"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fmt"), col("n_bytes"), col("fp"))

  val queries: Map[String, Q] = Map[String, Q](
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
    }),

    // Perceptual-hash near-dup pairs (round-14 add; r15 rework): the
    // multimodal face of the dedup lattice — near-duplicate MEDIA
    // assets found by aHash over the opaque payload (the image-dedup
    // step every multimodal curation pipeline runs before training).
    // Same fused partition-mapped decode stage as the other mm ops
    // (phash rides the scan, no shuffle before banding), then the
    // llm_simhash_dedup pigeonhole: 4×16-bit blocks (hamming ≤ 3 ⇒
    // ≥ 1 identical block — the band join is a lossless theorem, so
    // the oracle states the direct pairwise condition), blocked by
    // [[PhashBlocking]] (default: fmt + |Δn_bytes| ≤ 16 on a ±1
    // grid; real assets swap in decoded dimensions). Pair generation
    // is collapse-first since r15 — see [[phashPairs]].
    "mm_phash_dedup" -> ((s, d) =>
      phashPairs(phashOf(graft.Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("doc_id2"))),

    // Perceptual-hash duplicate CLUSTERS (round-15 add): the media
    // modality's transitive-closure face, completing the symmetry with
    // llm_dedup_clusters — cluster = the closure of the arrival-order
    // dup forest (dup_of(n) = min admissible candidate < n, exactly
    // stream_phash_ingest's horizon-free verdict), labeled by the
    // minimal member. GROUP-SCALE verdict derivation: gid = min(group)
    // by construction, so the min admissible candidate < n is the min
    // over admissible groups' gids < n — the band machinery runs on
    // signature groups only (one rep-level equi-join, both
    // orientations + self), then ONE member-keyed min agg; the
    // pointer-jump closure is the shared GraphLoop.jumpClosure
    // (O(log chain) corpus-keyed joins, the llm_dedup_clusters
    // discipline).
    "mm_phash_clusters" -> ((s, d) =>
      phashClustersOf(phashOf(graft.Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // Perceptual-hash KEEP-BEST (round-15 add): the media modality's
    // selection face, completing the symmetry with
    // llm_dedup_keep_best — per dup cluster keep ONE asset, the
    // highest-QUALITY copy, where quality for the byte-stub is
    // n_bytes (the resolution proxy; a real pipeline swaps in decoded
    // pixel count/bitrate — the argmax shape is unchanged). Keeper =
    // argmax by (n_bytes DESC, doc_id ASC), computed as a min-struct
    // partial+final agg + one cluster-keyed join back (never a
    // per-cluster window — the llm_dedup_keep_best discipline: a
    // pathological giant cluster costs a partial agg, not a
    // single-partition sort).
    "mm_phash_keep_best" -> ((s, d) => {
      // ONE decode+hash pass (r16, the guide-§8 decode-once rule): the
      // cluster machinery and the quality join both read the same
      // stage-cut fingerprint table — before, phashOf ran twice (two
      // full asset decode scans at 100 TB)
      val ph = AdaptiveCollapse.stageCut(s)(
        phashOf(graft.Tables.documents(s, d)))
      val scored = phashClustersOf(ph)
        .join(ph.select(col("doc_id"), col("n_bytes")), Seq("doc_id"))
      val best = scored.groupBy(col("cluster_id"))
        .agg(min(struct((lit(0) - col("n_bytes")).as("nq"),
          col("doc_id").as("bid"))).as("b"))
        .select(col("cluster_id"), col("b.bid").as("best_id"))
      scored.join(best, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("n_bytes"),
          (col("doc_id") === col("best_id")).as("keep"))
        .orderBy(col("doc_id"))
    })
  ) ++ incrementalQueries

  /** The phash dup clusters of a fingerprint frame — (doc_id,
    * cluster_id), the transitive closure of the arrival-order dup
    * forest, each cluster labeled by its minimal member. Shared by
    * `mm_phash_clusters` and `mm_phash_keep_best` (which passes a
    * stage-cut `ph` so the decode pass runs once across both its
    * consumers, r16). */
  private def phashClustersOf(ph: DataFrame,
      blk: PhashBlocking = PhashBlocking()): DataFrame = {
      val pb = withBlockSize(ph, blk)
      val groups = pb.groupBy(col("fp"), col("fmt"), col("bsz"))
        .agg(min(col("doc_id")).as("gid"))
      val gsel = groups.select(col("gid"), col("fmt"), col("bsz"),
        col("fp"))
      // admissible group pairs, BOTH orientations (each probe group
      // needs every admissible neighbor's gid), plus self (a non-rep
      // member's own gid is always an admissible earlier candidate)
      val gpairs = admissibleMeet(gsel, "gid",
          gsel.withColumnRenamed("gid", "gid2"), "gid2", blk)
        .filter(col("gid") =!= col("gid2"))
        .select(col("gid"), col("gid2")).distinct()
        .unionByName(groups.select(col("gid"),
          col("gid").as("gid2")))
      val members = pb.join(
          groups.select(col("fp"), col("fmt"), col("bsz"),
            col("gid")), Seq("fp", "fmt", "bsz"))
        .select(col("gid"), col("doc_id"))
      val verdicts = members.join(gpairs, Seq("gid"), "left")
        .filter(col("gid2") < col("doc_id"))
        .groupBy(col("doc_id")).agg(min(col("gid2")).as("dup_of"))
      GraphLoop.jumpClosure(
        pb.select(col("doc_id")).join(verdicts, Seq("doc_id"), "left")
          .select(col("doc_id").as("node"),
            coalesce(col("dup_of"), col("doc_id")).as("root")),
        "root")
        .select(col("node").as("doc_id"), col("root").as("cluster_id"))
  }

  private def incrementalQueries: Map[String, Q] = Map(
    // Incremental phash dedup (round-14 add): the asymmetric
    // batch-vs-corpus split applied to the perceptual hash, completing
    // the incremental symmetry with llm_simhash_incremental /
    // llm_minhash_lsh_incremental for the MULTIMODAL modality. The
    // collapse key is the FULL admissibility signature (fp, fmt,
    // n_bytes): rows agreeing on it are interchangeable under both the
    // block join and the hamming verify, so the pair machinery runs at
    // group scale; only groups carrying a new asset ever probe, and
    // member expansion resolves earlier-new admissibility (a new asset
    // may dup an OLD one or an EARLIER new one, never a later one).
    "mm_phash_incremental" -> ((s, d) => {
      import s.implicits._
      val blk = PhashBlocking()
      val docs = withBlockSize(
          assets(s, d).mapPartitions(_.map(phash)).toDF(), blk)
        .withColumn("is_new", pmod(col("doc_id"), lit(100L)) >= 80)
      val groups = docs
        .groupBy(col("fp"), col("fmt"), col("bsz"))
        .agg(min(col("doc_id")).as("rep_id"),
          max(col("is_new")).as("has_new"))
      val probe = groups.filter(col("has_new"))
        .select(col("rep_id"), col("fmt"), col("bsz"), col("fp"))
      val index = groups.select(col("rep_id").as("rep_id2"),
        col("fmt"), col("bsz"), col("fp"))
      val repPairs = admissibleMeet(probe, "rep_id", index, "rep_id2",
          blk)
        .filter(col("rep_id") =!= col("rep_id2"))
        .select(col("rep_id"), col("rep_id2"))
        .distinct()
      val selfPairs = groups.filter(col("has_new"))
        .select(col("rep_id"), col("rep_id").as("rep_id2"))
      val members = docs
        .join(groups.select(col("fp"), col("fmt"), col("bsz"),
            col("rep_id")),
          Seq("fp", "fmt", "bsz"))
        .select(col("rep_id"), col("doc_id"), col("is_new"))
      val probes = members.filter(col("is_new"))
        .select(col("rep_id"), col("doc_id"))
      val cands = members.select(col("rep_id").as("rep_id2"),
        col("doc_id").as("cand_id"), col("is_new").as("cand_new"))
      val matched = repPairs.unionAll(selfPairs)
        .join(probes, Seq("rep_id"))
        .join(cands, Seq("rep_id2"))
        .filter(((!col("cand_new")) || col("cand_id") < col("doc_id")) &&
          col("cand_id") =!= col("doc_id"))
        .groupBy(col("doc_id")).agg(min(col("cand_id")).as("dup_of"))
      docs.filter(col("is_new"))
        .join(matched, Seq("doc_id"), "left")
        .select(col("doc_id"), col("fmt"),
          when(col("dup_of").isNotNull, lit("band_dup"))
            .otherwise(lit("kept")).as("stage"),
          col("dup_of"))
        .orderBy(col("doc_id"))
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

  /** DuckDB mirror of `mm_phash_dedup`: the aHash bits recompute from
    * the exploded payload bytes with the same cross-multiplied integer
    * comparison, pack via a recursive power-of-two table into HUGEINT
    * and reinterpret two's-complement signed (the frame_hash idiom);
    * the band join is a lossless pigeonhole theorem (hamming ≤ 3 with
    * 4×16-bit blocks ⇒ ≥ 1 identical block) and the grid ±1 blocking
    * is implied by |Δlen| ≤ 16, so the oracle states the direct
    * pairwise condition (the simhashOracleSql discipline). */
  /** The aHash recompute CTEs shared by both phash oracles: powers →
    * byte value classes → bit pack → `ph(doc_id, fmt, len, fp)`.
    * Corpus assumption (as [[decodeCtes]] / MurmurSql, restated here
    * per the r14 advice): ASCII text ⇒ DuckDB's character-based
    * ord(substring) equals the UTF-8 payload byte Spark hashes, and
    * length(text) equals the byte length that feeds both the
    * fingerprint loop and the |Δn_bytes| ≤ 16 admissibility window —
    * a non-ASCII corpus would diverge BOTH; switch the mirror to
    * octet_length + byte access before pointing it at one. */
  private def phashCtes: String =
    s"""powers(s, pw) AS (
         SELECT 0, CAST(1 AS HUGEINT)
         UNION ALL
         SELECT s + 1, pw * 2 FROM powers WHERE s < 63),
       assets AS (SELECT doc_id, source AS fmt, text,
                    length(text) AS len FROM documents),
       bytes AS (
         SELECT doc_id,
                ord(substring(text, CAST(p AS INT), 1)) % 64 AS s
         FROM assets, LATERAL unnest(range(1, len + 1)) AS t(p)),
       slots AS (SELECT doc_id, s, count(*) AS cnt
                 FROM bytes GROUP BY 1, 2),
       bitsu AS (
         SELECT a.doc_id, any_value(a.fmt) AS fmt, any_value(a.len) AS len,
           coalesce(sum(CASE WHEN sl.cnt * 64 > a.len
             THEN p.pw ELSE CAST(0 AS HUGEINT) END),
             CAST(0 AS HUGEINT)) AS hu
         FROM assets a
         LEFT JOIN slots sl ON sl.doc_id = a.doc_id
         LEFT JOIN powers p ON p.s = sl.s
         GROUP BY a.doc_id),
       ph AS (
         SELECT doc_id, fmt, len,
           CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
             THEN hu - CAST('18446744073709551616' AS HUGEINT)
             ELSE hu END AS BIGINT) AS fp
         FROM bitsu)"""

  private def phashDedupOracleSql: String =
    s"""WITH RECURSIVE
       $phashCtes
       SELECT x.doc_id, y.doc_id AS doc_id2,
              CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
       FROM ph x JOIN ph y
         ON y.fmt = x.fmt AND y.doc_id > x.doc_id
        AND abs(y.len - x.len) <= ${PhashBlocking.DefaultWindow}
       WHERE bit_count(xor(x.fp, y.fp)) <= ${PhashBlocking.HammingRadius}
       ORDER BY x.doc_id, doc_id2"""

  /** DuckDB mirror of `mm_phash_incremental`: per new asset, the min
    * admissible candidate (same fmt, |Δlen| ≤ 16, hamming ≤ 3) among
    * old assets and earlier new ones — block-key-free by the
    * pigeonhole theorem, the simhashVerdictOracleSql discipline. */
  private def phashIncrementalOracleSql: String =
    s"""WITH RECURSIVE
       $phashCtes,
       m AS (SELECT x.doc_id, min(y.doc_id) AS dup_of
             FROM ph x JOIN ph y ON y.doc_id != x.doc_id
               AND y.fmt = x.fmt AND abs(y.len - x.len) <= ${PhashBlocking.DefaultWindow}
             WHERE x.doc_id % 100 >= 80
               AND (NOT (y.doc_id % 100 >= 80) OR y.doc_id < x.doc_id)
               AND bit_count(xor(x.fp, y.fp)) <= ${PhashBlocking.HammingRadius}
             GROUP BY 1)
       SELECT p.doc_id, p.fmt,
              CASE WHEN m.dup_of IS NOT NULL THEN 'band_dup'
                   ELSE 'kept' END AS stage,
              m.dup_of
       FROM ph p LEFT JOIN m ON m.doc_id = p.doc_id
       WHERE p.doc_id % 100 >= 80 ORDER BY p.doc_id"""

  /** DuckDB mirror of `stream_phash_ingest`: the horizon-free
    * arrival-order truth — per doc (ALL docs: every one streams past),
    * dup_of = min admissible candidate with a SMALLER id; id-ordered
    * arrival makes "seen before" ≡ "smaller id" REGARDLESS of where
    * the epoch boundaries fall, so one global SQL is the oracle and a
    * hash match proves batch-boundary invariance of the whole chain. */
  private[graft] def phashIngestOracleSql: String =
    s"""WITH RECURSIVE
       $phashCtes,
       m AS (SELECT x.doc_id, min(y.doc_id) AS dup_of
             FROM ph x JOIN ph y ON y.doc_id < x.doc_id
               AND y.fmt = x.fmt AND abs(y.len - x.len) <= ${PhashBlocking.DefaultWindow}
             WHERE bit_count(xor(x.fp, y.fp)) <= ${PhashBlocking.HammingRadius}
             GROUP BY 1)
       SELECT p.doc_id, p.fmt,
              CASE WHEN m.dup_of IS NOT NULL THEN 'band_dup'
                   ELSE 'kept' END AS stage,
              m.dup_of
       FROM ph p LEFT JOIN m ON m.doc_id = p.doc_id
       ORDER BY p.doc_id"""

  /** DuckDB mirror of `mm_phash_clusters`: the horizon-free dup forest
    * (min smaller-id admissible candidate per doc — the ingest oracle's
    * `m` CTE) walked to its minimal root, the llm_dedup_clusters walk
    * discipline (v MATERIALIZED is load-bearing: the recursive arm
    * references it). The group-scale gid derivation on the Spark side
    * is invisible here by the gid-minimality theorem (min admissible
    * y < n ≡ min admissible group-min < n). */
  /** The clusters CTE chain (ends at `cl(doc_id, cluster_id)`),
    * shared by the clusters and keep-best oracles. */
  private def phashClusterCtes: String =
    s"""$phashCtes,
       m AS (SELECT x.doc_id, min(y.doc_id) AS dup_of
             FROM ph x JOIN ph y ON y.doc_id < x.doc_id
               AND y.fmt = x.fmt AND abs(y.len - x.len) <= ${PhashBlocking.DefaultWindow}
             WHERE bit_count(xor(x.fp, y.fp)) <= ${PhashBlocking.HammingRadius}
             GROUP BY 1),
       v AS MATERIALIZED (SELECT p.doc_id, m.dup_of
             FROM ph p LEFT JOIN m ON m.doc_id = p.doc_id),
       walk(doc_id, cur) AS (
         SELECT doc_id, dup_of FROM v WHERE dup_of IS NOT NULL
         UNION ALL
         SELECT w.doc_id, v2.dup_of
         FROM walk w JOIN v v2 ON v2.doc_id = w.cur
         WHERE v2.dup_of IS NOT NULL),
       roots AS (SELECT doc_id, min(cur) AS root FROM walk GROUP BY 1),
       cl AS (SELECT v.doc_id, coalesce(r.root, v.doc_id) AS cluster_id
              FROM v LEFT JOIN roots r ON r.doc_id = v.doc_id)"""

  private def phashClustersOracleSql: String =
    s"""WITH RECURSIVE
       $phashClusterCtes
       SELECT doc_id, cluster_id FROM cl ORDER BY doc_id"""

  /** Mirror of `mm_phash_keep_best`: the shared clusters chain + the
    * per-cluster quality argmax (n_bytes DESC, doc_id ASC) as a
    * cluster-partitioned row_number — the llm_dedup_keep_best oracle
    * discipline with the byte-stub's resolution proxy as quality. */
  private def phashKeepBestOracleSql: String =
    s"""WITH RECURSIVE
       $phashClusterCtes,
       sc AS (SELECT c.doc_id, c.cluster_id,
                CAST(p.len AS INT) AS n_bytes,
                row_number() OVER (PARTITION BY c.cluster_id
                  ORDER BY p.len DESC, c.doc_id) AS krn
              FROM cl c JOIN ph p ON p.doc_id = c.doc_id)
       SELECT doc_id, cluster_id, n_bytes, krn = 1 AS keep
       FROM sc ORDER BY doc_id"""

  val oracle: Map[String, String] = Map(
    "mm_frame_sample" -> frameSampleOracleSql,
    "mm_phash_clusters" -> phashClustersOracleSql,
    "mm_phash_keep_best" -> phashKeepBestOracleSql,
    "mm_decode_features" -> decodeOracleSql,
    "mm_resize" -> resizeOracleSql,
    "mm_phash_dedup" -> phashDedupOracleSql,
    "mm_phash_incremental" -> phashIncrementalOracleSql)
}
