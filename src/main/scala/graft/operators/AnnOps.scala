package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity

/** IVF-style approximate nearest neighbour search (`llm_ann_ivf`) — the
  * corpus-scale path for embedding similarity (the brute-force baseline
  * is `llm_cosine_topk` / `llm_embedding_topk_pairs`).
  *
  * Coarse quantizer: per-`label` centroids (the label column is the
  * pretrained cluster id — at real scale these come from offline k-means).
  * Queries probe the nprobe=3 nearest cells and search exactly inside
  * them only, so the scored candidate set is nprobe/ncells of the corpus
  * and the centroid table (ncells × dim) is broadcast — no all-pairs
  * shuffle at any size. Approximate wrt ground truth but oracle-checked
  * since round 10 (micro-unit centroids — see [[centroids]]); ScalaTest
  * additionally checks recall vs the brute-force truth.
  *
  * Determinism: centroid coordinates accumulate as micro-unit BIGINTs
  * (associative), so partition order can't perturb probe rankings; all
  * rankings carry id tie-breaks.
  */
object AnnOps {

  type Q = (SparkSession, String) => DataFrame

  // The synthetic clusters are loose (max pairwise cosine ≈ 0.51), so a
  // tight probe misses true neighbours; 5/10 cells still halves the
  // scored candidates while keeping recall usable.
  val NProbe = 5
  val TopK = 5

  // Shortlist length the hybrid-retrieval fusion consumes from each
  // ranker (llm_hybrid_rrf_ann): long enough that RRF has overlap to
  // fuse, small enough that every fusion input stays query-set-sized.
  val ShortK = 20

  // ---- Product quantization (`llm_ann_pq`, round-13) ----------------
  // IVFADC with exact re-rank (Jégou et al. 2011 §IV; the +R refinement
  // of §V): 16 subspaces × 4 dims, 16 codes each — 16 sub-byte codes
  // per vector, a 16× read reduction at serving time — ADC shortlist of
  // 50, then exact re-rank to top-5. Parameters were swept at sf0.001:
  // M=16/K=16/R=50 recovers EXACTLY the exact-search-in-probed-cells
  // ceiling (recall 0.56 vs global truth = the IVF probe ceiling; the
  // PQ shortlist at R=50 loses nothing), while M=8 or R=25 drop 0.04-
  // 0.16 below it.
  val PqM = 16
  val PqSubD = 4
  val PqK = 16
  val PqShortlist = 50

  /** Embedding dimensionality — a CORPUS CONTRACT, not a tunable: the
    * DuckDB mirrors hard-code it (`range(1, 65)` in [[centroidCtesSql]]
    * and every live-oracle image), so the engine may rely on it too. */
  val Dim = 64

  /** Per-label centroids in MICRO-UNIT integer arithmetic (round-10
    * rework, the llm_ngram_lm discipline): each coordinate sums
    * round(x·10⁶) as a BIGINT (round = half-away-from-zero, identical
    * in Spark and DuckDB), divides by the member count with
    * truncation toward zero (Spark `div` ≡ DuckDB `//`), and scales
    * back by 10⁻⁶ — an exactly-representable double for any
    * |mean| < 2⁴⁶. Replaces the round-1 DECIMAL(38,12) mean, whose
    * division precision/scale rules are Spark-specific and blocked the
    * DuckDB oracle; the ≤ 10⁻⁶ quantization is invisible to the
    * recall contract and makes every downstream double (probe csim,
    * cell sim) a pure function both engines compute bit-identically.
    *
    * r16 optimization (guide §2.3/§2.4): ONE label-keyed aggregate with
    * [[Dim]] per-coordinate sum columns replaces the posexplode →
    * (label, pos) agg → (label) collect_list re-agg — the explode
    * multiplied the pre-aggregation row count by Dim and the second
    * group-by was a second exchange; the fixed-width agg is legal
    * because Dim is pinned by the oracle contract (count(*) per label
    * ≡ the per-(label, pos) count when every array has exactly Dim
    * elements). Arithmetic and coordinate order are unchanged. */
  def centroids(emb: DataFrame): DataFrame =
    centroidsKeyed(emb, Seq("label")).withColumnRenamed("label", "c_label")

  /** [[centroids]] generalized over an arbitrary grouping key list —
    * the one fixed-width implementation shared with the semantic
    * sub-quantizer's (label, j) centroids. Arrays SHORTER than [[Dim]]
    * are supported for uniform-dim corpora (specs drive 8-dim frames):
    * try_element_at pads the per-coordinate sums with nulls and the
    * final slice trims the centroid to the measured dim; non-uniform
    * or > Dim inputs raise loudly instead of silently truncating. */
  private[operators] def centroidsKeyed(emb: DataFrame,
      keys: Seq[String]): DataFrame = {
    val sums = (0 until Dim).map(j =>
      sum(round(expr(s"try_element_at(embedding, ${j + 1})")
        .cast("double") * 1e6).cast("long")).as(s"sm$j"))
    val aggs = sums ++ Seq(count(lit(1)).as("n"),
      min(size(col("embedding"))).as("dmin"),
      max(size(col("embedding"))).as("dmax"))
    val dims = when(col("dmin") === col("dmax")
        && col("dmax") <= lit(Dim), col("dmax"))
      .otherwise(raise_error(concat(
        lit(s"AnnOps.centroids: embedding dims must be uniform and <= " +
          s"$Dim, got min="), col("dmin"), lit(" max="), col("dmax"))))
    emb.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(col) :+
        slice(array((0 until Dim).map(j =>
          expr(s"sm$j div n") / lit(1e6)): _*), lit(1), dims)
          .as("centroid"): _*)
  }

  /** The IVF probe + exact-score core over an explicit query frame —
    * shared by `llm_ann_ivf` and the streaming `stream_ann_query` so
    * per-batch serving verdicts are bit-identical to the batch op's.
    * `q` needs (q_id, q_vec); `emb` is the static corpus (vec_id,
    * embedding, label); `cent` its centroid table (possibly read back
    * from the staged parquet quantizer). The probe set (nqueries ×
    * nprobe rows) is broadcast so the corpus side never shuffles —
    * each cell partition scores its residents against the probes that
    * mapped to it. Returns (vec_id, vec_id2, sim, rn ≤ TopK),
    * unordered. */
  private[graft] def annIvfVerdictsCore(q: DataFrame, emb: DataFrame,
      cent: DataFrame, k: Int = TopK): DataFrame = {
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("c_label"))
    val probed = q.crossJoin(broadcast(cent))
      .withColumn("csim", expr("cosine_sim(q_vec, centroid)"))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= NProbe)
      .select(col("q_id"), col("q_vec"), col("c_label"))
    val cells = emb.select(col("vec_id").as("vec_id2"),
      col("label").as("c_label"), col("embedding").as("c_vec"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id2"))
    cells.join(broadcast(probed), Seq("c_label"))
      .filter(col("q_id") =!= col("vec_id2"))
      .withColumn("sim", round(expr("cosine_sim(q_vec, c_vec)"), 6))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= k)
      .select(col("q_id").as("vec_id"), col("vec_id2"), col("sim"),
        col("rn"))
  }

  /** Per-vector micro-unit sub-vectors: (vec_id, label, t, xm[PqSubD])
    * with xm[j] = round(embedding[t·SubD + j] · 10⁶) as BIGINT — the
    * whole PQ pipeline (codebook training, code assignment, ADC tables,
    * the exact re-rank) then runs in EXACT integer arithmetic: every
    * distance is a sum of squared long differences (≤ 64·(4·10⁶)² ≪
    * 2⁶³), so no accumulation order or engine can perturb an argmin
    * and the oracle mirrors the full trainer bit-identically.
    * `label` rides the explode (r16 optimization): the code table used
    * to be re-attached to the corpus by a codes⋈emb join — corpus-sized
    * on BOTH sides at scale — when the cell label was already on the
    * row the sub-vectors came from. */
  private def pqSubvecs(emb: DataFrame): DataFrame = {
    val subs = (0 until PqM).map { t =>
      struct(lit(t).as("t"),
        expr(s"""transform(sequence(${t * PqSubD + 1}, ${(t + 1) * PqSubD}),
          i -> cast(round(cast(element_at(embedding, i) as double) * 1e6)
                    as bigint))""").as("xm"))
    }
    emb.select(col("vec_id"), col("label"),
        explode(array(subs: _*)).as("s"))
      .select(col("vec_id"), col("label"), col("s.t").as("t"),
        col("s.xm").as("xm"))
  }

  /** Nearest-code assignment against a broadcast (t, k, cm) codebook:
    * exact-long squared distance, min_by over the unique (d2, k)
    * struct — partial-agg combinable, no per-vector window shuffle
    * (the semanticCells argmax idiom). Returns (vec_id, label, t, k,
    * xm): the argmin row's own sub-vector rides the min_by struct
    * (all candidate rows of a group share it, so the pick is
    * value-invariant), which lets [[pqUpdate]] recompute centroids
    * WITHOUT re-joining the corpus-sized xm table — at 100 TB that
    * join was a second full shuffle of the corpus per Lloyd round
    * (guide §2.4: remove shuffles outright). */
  private def pqAssign(xm: DataFrame, cb: DataFrame): DataFrame =
    xm.join(broadcast(cb), Seq("t"))
      .withColumn("d2", aggregate(zip_with(col("xm"), col("cm"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      .groupBy(col("vec_id"), col("label"), col("t"))
      .agg(expr("min_by(struct(k, xm), struct(d2, k))").as("ka"))
      .select(col("vec_id"), col("label"), col("t"),
        col("ka.k").as("k"), col("ka.xm").as("xm"))

  /** Micro-unit centroid recompute per (t, k) from an assignment frame
    * that carries its own xm (see [[pqAssign]]) — truncating integer
    * division (Spark `div` ≡ the oracle's sign-CASE `//`), the
    * AnnOps.centroids discipline kept in integer space. No corpus
    * self-join, and (r16) ONE (t, k)-keyed aggregate with [[PqSubD]]
    * per-coordinate sums instead of posexplode → (t, k, pos) agg →
    * (t, k) collect_list re-agg — same two-exchange-to-one argument as
    * [[centroids]] (xm is exactly PqSubD long by construction). */
  private def pqUpdate(a: DataFrame): DataFrame = {
    val sums = (0 until PqSubD).map(j =>
      sum(element_at(col("xm"), j + 1)).as(s"sm$j"))
    a.groupBy(col("t"), col("k"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
      .select(col("t"), col("k"),
        array((0 until PqSubD).map(j => expr(s"sm$j div n")): _*).as("cm"))
  }

  /** The trained PQ model over a corpus: (xm sub-vectors, final
    * codebook c2, per-vector codes).
    *
    * Cold start (`prev` = None — the registered `llm_ann_pq` /
    * `llm_ann_pq_persisted` contract): seeds are the PqK corpus
    * vectors ranked first by the Knuth multiplicative hash of vec_id
    * (the semanticCells seed discipline — a deterministic uniform
    * draw, no RNG; the rank window runs over the LIMITed PqK-row
    * frame, never the corpus), then two Lloyd rounds per subspace,
    * then codes against the final codebook.
    *
    * Warm start (`prev` = Some(codebook) — `stream_pq_live`'s
    * epoch ≥ 2 path, r14): the previous epoch's near-converged
    * codebook replaces the hash seeds and ONE Lloyd round refines it
    * against the advanced prefix — the standard incremental-index
    * discipline (a rebuild never re-derives seeds the last build
    * already converged). Deterministic in (prefix, prev), so the
    * per-epoch DuckDB mirror chains cb0_e := c2_{e−1} and replays the
    * identical single round. Saves the seed rank + one full
    * assign+update pass over the prefix per epoch. */
  private[graft] def pqModel(s: SparkSession, emb: DataFrame,
      prev: Option[DataFrame] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    val cutF = AdaptiveCollapse.stageCut(s) _
    val xm = cutF(pqSubvecs(emb))
    val c2 = prev match {
      case Some(cb) => cutF(pqUpdate(pqAssign(xm, cb)))
      case None =>
        val mh = pmod(pmod(col("vec_id"), lit(268435456L))
          * lit(2654435761L), lit(1000000007L))
        val sdk = emb.select(col("vec_id"), mh.as("h"))
          .orderBy(col("h"), col("vec_id")).limit(PqK)
          .withColumn("k", (row_number().over(
            Window.orderBy(col("h"), col("vec_id"))) - 1).cast("int"))
        val cb0 = sdk.join(xm, Seq("vec_id"))
          .select(col("t"), col("k"), col("xm").as("cm"))
        // c1 has exactly ONE consumer (the a2 assignment's broadcast
        // build, which materializes it once anyway) — a stage cut here
        // was pure overhead (r16 optimization); c2 keeps its cut (codes
        // assignment + serving/staging both read it)
        val c1 = pqUpdate(pqAssign(xm, cb0))
        cutF(pqUpdate(pqAssign(xm, c1)))
    }
    val codes = pqAssign(xm, c2)
    (xm, c2, codes)
  }

  /** The shared IVF-PQ serving path over explicit model frames —
    * `cent` (c_label, centroid), `cb` (t, k, cm), `codesL`
    * (vec_id2, t, k, label) — so the retrain op and the
    * persisted-index op produce bit-identical answers from the same
    * artifacts. Probe → broadcast ADC table → shortlist → exact
    * re-rank; raw vectors are fetched ONLY for the shortlist (an
    * id-keyed join BEFORE sub-vector extraction — the plan a 100 TB
    * deployment needs, where the code table is 16 bytes/vector and
    * raw embeddings live in cold storage). */
  private def pqServe(emb: DataFrame, cent: DataFrame, cb: DataFrame,
      codesL: DataFrame): DataFrame = {
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("c_label"))
    val probed = qs.crossJoin(broadcast(cent))
      .withColumn("csim", expr("cosine_sim(q_vec, centroid)"))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= NProbe)
      .select(col("q_id"), col("c_label").as("label"))
    val qxm = pqSubvecs(emb.filter(col("vec_id") < 10))
      .select(col("vec_id").as("q_id"), col("t"), col("xm").as("qm"))
    val dt = qxm.join(broadcast(cb), Seq("t"))
      .withColumn("dist", aggregate(zip_with(col("qm"), col("cm"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      .select(col("q_id"), col("t"), col("k"), col("dist"))
    val cand = codesL.join(broadcast(probed), Seq("label"))
      .filter(col("q_id") =!= col("vec_id2"))
      .join(broadcast(dt), Seq("q_id", "t", "k"))
      .groupBy(col("q_id"), col("vec_id2"))
      .agg(sum(col("dist")).as("ad"))
    val wa = Window.partitionBy(col("q_id"))
      .orderBy(col("ad"), col("vec_id2"))
    // r17 (guide §1.2/§2.4 — compute shared stages once): the shortlist
    // has TWO consumers (the raw-vector fetch's broadcast build and the
    // re-rank join's broadcast build), and each broadcast build is a
    // separate job that re-evaluates its whole subtree — so the ADC
    // aggregation over the probed candidate set (the serve path's only
    // corpus-probed stage) ran TWICE per invocation, and twice per
    // stream_pq_live epoch. Cut the R·nq-row shortlist once; both
    // broadcasts build from the materialized cut. LAZY (A/B'd): the
    // eager form measured llm_ann_pq 8.50 → 7.62 s mean but paid a
    // dedicated job per stream_pq_live epoch (means 22.7 → 24.6 s);
    // the lazy cut keeps the dedup and folds materialization into the
    // first broadcast build.
    val short = AdaptiveCollapse.stageCutLazy(emb.sparkSession)(
      cand.withColumn("arn", row_number().over(wa))
        .filter(col("arn") <= PqShortlist)
        .select(col("q_id"), col("vec_id2"), col("arn")))
    val shortVecs = pqSubvecs(emb.join(broadcast(
        short.select(col("vec_id2").as("vec_id")).distinct()),
      Seq("vec_id")))
    val rr = shortVecs.withColumnRenamed("vec_id", "vec_id2")
      .join(broadcast(short), Seq("vec_id2"))
      .join(broadcast(qxm), Seq("q_id", "t"))
      .withColumn("pd", aggregate(zip_with(col("qm"), col("xm"),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
      .groupBy(col("q_id"), col("vec_id2"), col("arn"))
      .agg(sum(col("pd")).as("ed"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("ed"), col("vec_id2"))
    rr.withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= TopK)
      .select(col("q_id").as("vec_id"), col("vec_id2"),
        round(col("ed") / lit(1e12), 6).as("adist"), col("arn"),
        col("rn"))
      .orderBy(col("vec_id"), col("rn"))
  }

  /** [[pqServe]] over a staged index read back from parquet — the
    * shared serving entry for `llm_ann_pq_persisted` (one frozen
    * index) and `stream_pq_live` (per-epoch re-published indexes):
    * explicit schemas so the read never depends on footer inference. */
  /** Explicit schema of a staged PQ codebook — shared by the serving
    * read and the warm-start read of the previous epoch's codebook. */
  private[graft] val pqCbSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("t", IntegerType),
      StructField("k", IntegerType),
      StructField("cm", ArrayType(LongType))))
  }

  private[graft] def pqServeFromDirs(s: SparkSession, emb: DataFrame,
      cbDir: String, codesDir: String, centDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val cbSchema = pqCbSchema
    val codesSchema = StructType(Seq(StructField("vec_id2", LongType),
      StructField("t", IntegerType), StructField("k", IntegerType),
      StructField("label", IntegerType)))
    val centSchema = StructType(Seq(StructField("c_label", IntegerType),
      StructField("centroid", ArrayType(DoubleType))))
    pqServe(emb, s.read.schema(centSchema).parquet(centDir),
      s.read.schema(cbSchema).parquet(cbDir),
      s.read.schema(codesSchema).parquet(codesDir))
  }

  /** Train the PQ index of `emb` and stage it to the three dirs
    * (idempotent overwrite of deterministic tables). `prev` warm-
    * starts the trainer from an existing codebook (see [[pqModel]]). */
  private[graft] def stagePqIndexTo(s: SparkSession, emb: DataFrame,
      cbDir: String, codesDir: String, centDir: String,
      prev: Option[DataFrame] = None): Unit = {
    val (_, c2, codes) = pqModel(s, emb, prev)
    c2.write.mode("overwrite").parquet(cbDir)
    // codes carries its row's label from pqSubvecs (r16) — no corpus
    // re-join to recover it
    codes.select(col("vec_id").as("vec_id2"), col("t"), col("k"),
        col("label"))
      .write.mode("overwrite").parquet(codesDir)
    centroids(emb).write.mode("overwrite").parquet(centDir)
  }

  /** DELTA-epoch code staging (r16, `stream_pq_live_delta`): assign
    * ONLY the new suffix against the codebook IN FORCE and append to
    * the previous epoch's staged codes — per-epoch assignment work is
    * O(batch·M), never a prefix re-assign, and the model tables are
    * not touched at all. The union is disjoint by the monotone-arrival
    * guard (every new vec_id exceeds every staged one). Idempotent
    * overwrite for replay/resume; an empty suffix stages a verbatim
    * copy of the previous codes (the empty-epoch contract). */
  private[graft] def stagePqCodesDelta(s: SparkSession,
      newEmb: DataFrame, cbDir: String, prevCodesDir: String,
      codesDir: String): Unit = {
    import org.apache.spark.sql.types._
    val codesSchema = StructType(Seq(StructField("vec_id2", LongType),
      StructField("t", IntegerType), StructField("k", IntegerType),
      StructField("label", IntegerType)))
    val cb = s.read.schema(pqCbSchema).parquet(cbDir)
    val newCodes = pqAssign(pqSubvecs(newEmb), cb)
      .select(col("vec_id").as("vec_id2"), col("t"), col("k"),
        col("label"))
    s.read.schema(codesSchema).parquet(prevCodesDir)
      .unionByName(newCodes)
      .write.mode("overwrite").parquet(codesDir)
  }

  /** Where the staged PQ index lives (per corpus dir): codebook /
    * codes / coarse centroids. */
  private[graft] def pqIndexDirs(d: String): (String, String, String) = {
    // key the staged index by the SANITIZED FULL corpus path plus two
    // independently-seeded 32-bit hashes of the raw path: a 32-bit
    // hash alone could collide two corpus dirs and silently serve one
    // corpus's queries against the other's staged index (r13 review)
    val safe = d.replaceAll("[^A-Za-z0-9._-]", "_") match {
      case x if x.length > 80 => x.takeRight(80)
      case x => x
    }
    val h1 = scala.util.hashing.MurmurHash3.stringHash(d, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(d, 0x1b873593)
    val base = s"${graft.Scratch.base}/graft_pq_${safe}_" +
      java.lang.Long.toHexString(((h1.toLong & 0xffffffffL) << 32)
        | (h2.toLong & 0xffffffffL))
    (s"$base/cb", s"$base/codes", s"$base/cent")
  }

  /** In-JVM staging guard (the minhash_persisted discipline: a new
    * JVM always re-stages so stale parquet from an older build can't
    * feed the serving path; within one run the once-per-index cost is
    * paid once). */
  private val stagedPq =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def stagePqIndexOnce(s: SparkSession, d: String): Unit =
    stagedPq.synchronized {
      if (!stagedPq.contains(d)) {
        val (cbDir, codesDir, centDir) = pqIndexDirs(d)
        stagePqIndexTo(s, graft.Tables.embeddings(s, d),
          cbDir, codesDir, centDir)
        stagedPq.add(d)
      }
    }

  val queries: Map[String, Q] = Map(
    // IVF-PQ ANN (round-13 add): the compressed-domain scale path —
    // IVF probe (the llm_ann_ivf stage, same NProbe) restricts to 5/10
    // cells, the ADC table (10 queries × 16 subspaces × 16 codes,
    // broadcast) scores candidates from their CODES ONLY (16 sub-byte
    // codes/vector — at 100 TB the scan reads the code table, ~16
    // bytes/vector, never the raw embeddings), the top-PqShortlist per
    // query re-rank EXACTLY on raw sub-vectors (the method's standard
    // refinement; the only stage that touches raw vectors, R·nq rows).
    // Corpus-side shape: codes join broadcast probes + broadcast ADC
    // table → (q, vec) keyed agg — no corpus shuffle before the
    // per-query rank. All distances exact longs (micro-unit space), so
    // the DuckDB oracle reproduces training + serving bit-identically.
    "llm_ann_pq" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = graft.Tables.embeddings(s, d)
      val (_, c2, codes) = pqModel(s, emb)
      val codesL = codes
        .select(col("vec_id").as("vec_id2"), col("t"), col("k"),
          col("label"))
      pqServe(emb, centroids(emb), c2, codesL)
    }),

    // Persisted-index IVF-PQ (round-13 add): the quantized family's
    // DEPLOYMENT shape, completing the persisted trio (keep_best /
    // minhash / pq) — codebook + per-vector codes + coarse centroids
    // are STAGED TO PARQUET once (the index build a deployment
    // amortizes; the in-JVM staging guard is the minhash_persisted
    // discipline — a new JVM always re-stages, repeated invocations in
    // one run pay it once), and the continuing query touches ONLY the
    // staged index: probe against the staged centroids, ADC against
    // the staged codes, raw vectors fetched for the R-row shortlist
    // alone. Output ≡ `llm_ann_pq` verbatim (training is deterministic
    // in the corpus, the parquet roundtrip exact longs/doubles), so
    // the oracle is shared and the hash-match re-proves the staged
    // derivation.
    "llm_ann_pq_persisted" -> ((s, d) => {
      CosineSimilarity.register(s)
      stagePqIndexOnce(s, d)
      val (cbDir, codesDir, centDir) = pqIndexDirs(d)
      pqServeFromDirs(s, graft.Tables.embeddings(s, d),
        cbDir, codesDir, centDir)
    }),

    "llm_ann_ivf" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = graft.Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      annIvfVerdictsCore(q, emb, centroids(emb))
        .orderBy(col("vec_id"), col("rn"))
    }),

    // ANN RECALL evaluation (round-15 add): the acceptance harness
    // every ANN deployment ships — per query, recall@5 of the IVF
    // shortlist against the exact brute-force cosine truth (the
    // llm_cosine_topk machinery, so both sides reuse their proven
    // arithmetic verbatim). Scale shape: both sides are per-query
    // shortlists (≤ 5·|q| rows), so the hit join, agg, and output are
    // query-set-sized — the corpus cost is the two rankers', already
    // probed on their own axes; a 100 TB deployment samples the query
    // set, never the corpus. Determinism: n_hits is an int count,
    // recall one exact IEEE division by 5 — no rounding discipline
    // needed on the compare path.
    "llm_ann_recall" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = graft.Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val approx = annIvfVerdictsCore(q, emb, centroids(emb))
        .select(col("vec_id"), col("vec_id2"))
      val exact = LlmOps.queries("llm_cosine_topk")(s, d)
        .select(col("vec_id"), col("vec_id2"))
      val hits = approx.join(exact, Seq("vec_id", "vec_id2"), "inner")
        .groupBy(col("vec_id")).agg(count(lit(1)).as("n_hits"))
      // every k-facing value derives from the ONE TopK constant (r16,
      // closing the r15 advice): the IVF cut, the exact-truth cut
      // (llm_cosine_topk's own TopK), the reported k column, and the
      // recall divisor move together or not at all
      emb.filter(col("vec_id") < 10).select(col("vec_id"))
        .join(hits, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          lit(TopK).as("k"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") / lit(TopK))
            .as("recall"))
        .orderBy(col("vec_id"))
    }),

    // LSH-bucketed query ANN (round-4 add): the hyperplane-sketch
    // alternative to IVF for query-time search — no pretrained cell
    // assignment needed (IVF leans on the corpus's `label` quantizer;
    // the sketch works on structureless vectors). Both sides band under
    // the corpus-size-adaptive geometry ([[graft.functions.CosineLsh]]);
    // candidates are corpus vectors sharing ≥1 band key with a query —
    // a tiny broadcast (queries × bands) against the linear corpus band
    // table, never an all-pairs scan — then the exact codegen'd cosine
    // ranks top-5. Recall bounded by ScalaTest vs the brute-force truth
    // (`llm_cosine_topk`); candidate-set growth is the same banding the
    // perturbed ScaleProbe mode measures. Oracle-checked since round 10
    // (deterministic in corpus + plane constants; see oracle map below).
    "llm_ann_lsh" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = graft.Tables.embeddings(s, d)
      val (bands, bits) = graft.functions.CosineLsh.geometry(emb.count())
      val bkU = udf((v: Seq[Float]) =>
        graft.functions.CosineLsh.bandKeys(v, bands, bits))
      val corpusBands = emb
        .select(col("vec_id").as("vec_id2"),
          explode(bkU(col("embedding"))).as("bk"))
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      // multi-probe on the query side only: exact keys + Hamming-1
      // flips — (1+bits)× more probe rows, still a tiny broadcast
      val mpU = udf((v: Seq[Float]) =>
        graft.functions.CosineLsh.bandKeysMultiProbe(v, bands, bits))
      val qBands = qs.select(col("q_id"), explode(mpU(col("q_vec"))).as("bk"))
        .distinct()
      val candIds = corpusBands.join(broadcast(qBands), Seq("bk"))
        .filter(col("q_id") =!= col("vec_id2"))
        .select(col("q_id"), col("vec_id2")).distinct()
      val wr = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id2"))
      candIds
        .join(emb.select(col("vec_id").as("vec_id2"),
          col("embedding").as("c_vec")), Seq("vec_id2"))
        .join(broadcast(qs), Seq("q_id"))
        .withColumn("sim", round(expr("cosine_sim(q_vec, c_vec)"), 6))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= TopK)
        .select(col("q_id").as("vec_id"), col("vec_id2"), col("sim"),
          col("rn"))
        .orderBy(col("vec_id"), col("rn"))
    })
  )

  /** Both ANN ops are oracle-checked since round 10 (approximate wrt
    * ground truth, deterministic in the corpus — and, for LSH, the
    * plane constants; the LSH mirror lives next to llm_embedding_lsh's,
    * sharing the sign-fold CTEs). The IVF mirror became possible when
    * [[centroids]] moved to micro-unit integer arithmetic: round —
    * half-away-from-zero, identical in both engines — then truncating
    * integer division (Spark `div` ≡ DuckDB nonneg `//`, negatives via
    * an explicit CASE), then the same double scale-back; every
    * downstream double (probe csim, cell sim) is then computed
    * bit-identically by both engines because the cosine accumulation
    * order is pinned (ordered list_dot_product = the kernel's i-order
    * loop). The probe ranking deliberately orders by the RAW csim
    * double — safe cross-engine precisely because the doubles are
    * identical, with the c_label tie-break for exact ties. */
  /** The micro-unit centroid CTEs (`cent`, `cvecs`) of the DuckDB
    * mirror — the SQL image of [[centroids]], shared verbatim by the
    * `llm_ann_ivf` and `llm_semantic_dedup` oracles so the arithmetic
    * is transcribed exactly once. */
  private[operators] val centroidCtesSql: String =
    """cent AS (
         SELECT label, j,
           CASE WHEN sm >= 0 THEN sm // n
                ELSE -((-sm) // n) END / 1000000.0 AS c
         FROM (
           SELECT e.label, t.j,
             SUM(CAST(round(CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE)
               * 1000000.0) AS BIGINT)) AS sm,
             count(*) AS n
           FROM embeddings e, range(1, 65) t(j)
           GROUP BY 1, 2)),
       cvecs AS (SELECT label AS c_label, list(c ORDER BY j) AS cv
                 FROM cent GROUP BY 1)"""

  /** The IVF mirror's CTE chain (ends at `ranked`), shared by the
    * llm_ann_ivf oracle and the r15 recall evaluator's oracle. */
  private[graft] def annIvfCtesSql: String =
    s"""$centroidCtesSql,
       qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 10),
       probes AS (
         SELECT q_id, c_label FROM (
           SELECT q.q_id, c.c_label,
             row_number() OVER (PARTITION BY q.q_id ORDER BY
               list_dot_product(q.qv, c.cv) /
                 (sqrt(list_dot_product(q.qv, q.qv))
                   * sqrt(list_dot_product(c.cv, c.cv))) DESC,
               c.c_label) AS prn
           FROM qs q, cvecs c)
         WHERE prn <= $NProbe),
       cells AS (SELECT vec_id AS vec_id2, label AS c_label,
                   CAST(embedding AS DOUBLE[]) AS cvv FROM embeddings),
       scored AS (
         SELECT p.q_id, cl.vec_id2,
           round(list_dot_product(q.qv, cl.cvv) /
             (sqrt(list_dot_product(q.qv, q.qv))
               * sqrt(list_dot_product(cl.cvv, cl.cvv))), 6) AS sim
         FROM probes p JOIN cells cl ON cl.c_label = p.c_label
         JOIN qs q ON q.q_id = p.q_id
         WHERE p.q_id <> cl.vec_id2),
       ranked AS (
         SELECT q_id AS vec_id, vec_id2, sim,
                CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY sim DESC, vec_id2) AS INTEGER) AS rn
         FROM scored)"""

  private[graft] def annIvfOracleSql: String =
    s"""WITH $annIvfCtesSql
       SELECT vec_id, vec_id2, sim, rn FROM ranked
       WHERE rn <= $TopK ORDER BY vec_id, rn"""

  /** One PQ assignment round of the DuckDB mirror: nearest code per
    * (vec, subspace) by exact-long squared distance, k tie-break —
    * grouped-row arithmetic (the integer space makes accumulation
    * order irrelevant, so rows vs arrays across engines is safe).
    * Takes FULL table names (r16) so the delta mirror can assign a
    * suffix-restricted xm against an earlier epoch's codebook. */
  private def pqAssignSql(name: String, xmTbl: String,
      cbTbl: String): String =
    s"""$name AS MATERIALIZED (
         SELECT vec_id, t, k FROM (
           SELECT x.vec_id, x.t, c.k,
             row_number() OVER (PARTITION BY x.vec_id, x.t
               ORDER BY sum((x.xmj - c.cm)*(x.xmj - c.cm)), c.k) AS rn
           FROM $xmTbl x JOIN $cbTbl c ON c.t = x.t AND c.j = x.j
           GROUP BY x.vec_id, x.t, c.k)
         WHERE rn = 1)"""

  /** One PQ centroid recompute of the mirror — the sign-CASE
    * truncating division (Spark `div`). */
  private def pqUpdateSql(name: String, aTbl: String,
      xmTbl: String): String =
    s"""$name AS MATERIALIZED (
         SELECT a.t, a.k, x.j,
           CASE WHEN sum(x.xmj) >= 0 THEN sum(x.xmj) // count(*)
                ELSE -((-sum(x.xmj)) // count(*)) END AS cm
         FROM $aTbl a JOIN $xmTbl x
           ON x.vec_id = a.vec_id AND x.t = a.t
         GROUP BY a.t, a.k, x.j)"""

  /** The full PQ mirror over corpus table `src`, every CTE name
    * suffixed `sfx` — shared verbatim by the single-corpus oracle
    * (sfx = "", src = embeddings) and the per-epoch blocks of
    * [[pqLiveOracleSql]], so the trainer/serving arithmetic is
    * transcribed exactly once. Expects a global `qs` CTE
    * (q_id, qv) to exist. Ends at `ranked$sfx`.
    *
    * `warmFrom` = Some(prevSfx) mirrors the warm-start trainer (r14):
    * cb0 := the previous epoch's converged codebook c2$prevSfx and ONE
    * refine round replaces the hash seeds + two rounds — exactly
    * [[pqModel]]'s prev path. */
  private def pqMirrorCtes(sfx: String, src: String,
      warmFrom: Option[String] = None): String =
    s"""${pqTrainCtes(sfx, src, warmFrom)},
       ${pqServeCtes(sfx, src, s"cvecs$sfx", s"c2$sfx", s"codes$sfx")}"""

  /** The training half of the PQ mirror: coarse centroids, sub-vector
    * table, Lloyd trainer (cold or warm), full-prefix code
    * assignment. Ends with `cent/cvecs/xm/c2/codes` + sfx. */
  private def pqTrainCtes(sfx: String, src: String,
      warmFrom: Option[String]): String = {
    val trainer = warmFrom match {
      case Some(p) =>
        s"""cb0$sfx AS MATERIALIZED (
             SELECT t, k, j, cm FROM c2$p),
           ${pqAssignSql(s"a1$sfx", s"xm$sfx", s"cb0$sfx")},
           ${pqUpdateSql(s"c2$sfx", s"a1$sfx", s"xm$sfx")}"""
      case None =>
        s"""sd$sfx AS MATERIALIZED (
             SELECT vec_id, srn - 1 AS k FROM (
               SELECT vec_id, CAST(row_number() OVER (ORDER BY
                 ((vec_id % 268435456) * 2654435761) % 1000000007, vec_id)
                 AS INT) AS srn
               FROM $src)
             WHERE srn <= $PqK),
           cb0$sfx AS MATERIALIZED (
             SELECT x.t, s.k, x.j, x.xmj AS cm
             FROM sd$sfx s JOIN xm$sfx x USING (vec_id)),
           ${pqAssignSql(s"a1$sfx", s"xm$sfx", s"cb0$sfx")},
           ${pqUpdateSql(s"c1$sfx", s"a1$sfx", s"xm$sfx")},
           ${pqAssignSql(s"a2$sfx", s"xm$sfx", s"c1$sfx")},
           ${pqUpdateSql(s"c2$sfx", s"a2$sfx", s"xm$sfx")}"""
    }
    s"""${pqCentXmCtes(sfx, src)},
       $trainer,
       ${pqAssignSql(s"codes$sfx", s"xm$sfx", s"c2$sfx")}"""
  }

  /** Coarse centroids + micro-unit sub-vector table of one prefix —
    * shared by the full-train and delta mirror blocks. */
  private def pqCentXmCtes(sfx: String, src: String): String =
    s"""cent$sfx AS (
         SELECT label, j,
           CASE WHEN sm >= 0 THEN sm // n
                ELSE -((-sm) // n) END / 1000000.0 AS c
         FROM (
           SELECT e.label, t.j,
             SUM(CAST(round(CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE)
               * 1000000.0) AS BIGINT)) AS sm,
             count(*) AS n
           FROM $src e, range(1, 65) t(j)
           GROUP BY 1, 2)),
       cvecs$sfx AS (SELECT label AS c_label, list(c ORDER BY j) AS cv
                     FROM cent$sfx GROUP BY 1),
       ${pqXmCte(sfx, src)}"""

  /** The micro-unit sub-vector CTE of one prefix — the one transcription
    * of the xm arithmetic, shared by the train and delta blocks. */
  private def pqXmCte(sfx: String, src: String): String =
    s"""xm$sfx AS MATERIALIZED (
         SELECT vec_id, label, t.t AS t, g.j AS j,
           CAST(round(CAST(embedding[CAST(t.t*$PqSubD + g.j AS INT)]
             AS DOUBLE) * 1000000.0) AS BIGINT) AS xmj
         FROM $src, range(0, $PqM) t(t), range(1, ${PqSubD + 1}) g(j))"""

  /** The serving half of the PQ mirror, parameterized by the model
    * tables it reads (r16 split): probe against `cvecsTbl`, ADC
    * against `cbTbl`, candidates from `codesTbl`, exact re-rank from
    * the CURRENT prefix's raw sub-vectors — so a delta epoch can
    * serve a fresh prefix from an earlier epoch's model. Ends at
    * `ranked$sfx`. */
  private def pqServeCtes(sfx: String, src: String, cvecsTbl: String,
      cbTbl: String, codesTbl: String): String =
    s"""probes$sfx AS (
         SELECT q_id, c_label FROM (
           SELECT q.q_id, c.c_label,
             row_number() OVER (PARTITION BY q.q_id ORDER BY
               list_dot_product(q.qv, c.cv) /
                 (sqrt(list_dot_product(q.qv, q.qv))
                   * sqrt(list_dot_product(c.cv, c.cv))) DESC,
               c.c_label) AS prn
           FROM qs q, $cvecsTbl c)
         WHERE prn <= $NProbe),
       qxm$sfx AS (SELECT vec_id AS q_id, t, j, xmj FROM xm$sfx
                   WHERE vec_id < 10),
       dt$sfx AS MATERIALIZED (
         SELECT q.q_id, c.t, c.k,
           sum((q.xmj - c.cm)*(q.xmj - c.cm)) AS dist
         FROM qxm$sfx q JOIN $cbTbl c ON c.t = q.t AND c.j = q.j
         GROUP BY 1, 2, 3),
       cand$sfx AS (
         SELECT p.q_id, cd.vec_id AS vec_id2, sum(d.dist) AS ad
         FROM $codesTbl cd JOIN $src e ON e.vec_id = cd.vec_id
         JOIN probes$sfx p ON p.c_label = e.label
         JOIN dt$sfx d ON d.q_id = p.q_id AND d.t = cd.t AND d.k = cd.k
         WHERE p.q_id <> cd.vec_id
         GROUP BY 1, 2),
       short$sfx AS (
         SELECT q_id, vec_id2, arn FROM (
           SELECT q_id, vec_id2, CAST(row_number() OVER (
             PARTITION BY q_id ORDER BY ad, vec_id2) AS INT) AS arn
           FROM cand$sfx)
         WHERE arn <= $PqShortlist),
       rr$sfx AS (
         SELECT s.q_id, s.vec_id2, s.arn,
           sum((q.xmj - x.xmj)*(q.xmj - x.xmj)) AS ed
         FROM short$sfx s JOIN qxm$sfx q ON q.q_id = s.q_id
         JOIN xm$sfx x ON x.vec_id = s.vec_id2 AND x.t = q.t
           AND x.j = q.j
         GROUP BY 1, 2, 3),
       ranked$sfx AS (
         SELECT q_id AS vec_id, vec_id2,
           round(ed / 1000000000000.0, 6) AS adist, arn,
           CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY ed, vec_id2) AS INT) AS rn
         FROM rr$sfx)"""

  /** One DELTA epoch of the mirror (r16, `stream_pq_live_delta`):
    * NO training — codes carry forward from the previous epoch and
    * only the new suffix (vec_id ≥ the previous prefix bound) is
    * assigned against the codebook IN FORCE (the last retrain
    * epoch's); probes and ADC read that same stale model; the exact
    * re-rank reads the CURRENT prefix. Mirrors the assign-only
    * epoch the streaming op stages. */
  private def pqDeltaCtes(sfx: String, src: String, prevSfx: String,
      inForceSfx: String, prevCutSql: String): String =
    s"""${pqXmCte(sfx, src)},
       xmnew$sfx AS (SELECT * FROM xm$sfx WHERE vec_id >= $prevCutSql),
       ${pqAssignSql(s"newc$sfx", s"xmnew$sfx", s"c2$inForceSfx")},
       codes$sfx AS MATERIALIZED (
         SELECT * FROM codes$prevSfx
         UNION ALL SELECT * FROM newc$sfx),
       ${pqServeCtes(sfx, src, s"cvecs$inForceSfx", s"c2$inForceSfx",
        s"codes$sfx")}"""

  private[graft] def annPqOracleSql: String =
    s"""WITH qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 10),
       ${pqMirrorCtes("", "embeddings")}
       SELECT vec_id, vec_id2, adist, arn, rn FROM ranked
       WHERE rn <= $TopK ORDER BY vec_id, rn"""

  /** DuckDB mirror of `stream_pq_live`: k prefix-parameterized images
    * of the PQ mirror UNION ALLed — epoch 1 cold-trains on its
    * id-ordered prefix vec_id < (max+1)·e/k (the tableBatchDir split
    * formula); every later epoch WARM-STARTS from the previous
    * epoch's converged codebook and refines with one Lloyd round on
    * its prefix (r14 — exactly [[pqModel]]'s prev path), then
    * re-answers the static query set, which is precisely what the
    * streamed run publishes per trigger (the annLiveOracleSql
    * pattern for the quantized index, chained across epochs). */
  private[graft] def pqLiveOracleSql(k: Int): String = {
    val blocks = (1 to k).map { e =>
      s"""pre$e AS (SELECT * FROM embeddings
              WHERE vec_id <
                ((SELECT max(vec_id) FROM embeddings) + 1) * $e // $k),
         ${pqMirrorCtes(s"_$e", s"pre$e",
          if (e == 1) None else Some(s"_${e - 1}"))}"""
    }
    s"""WITH qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 10),
       ${blocks.mkString(",\n       ")}
       ${(1 to k).map(e =>
        s"SELECT CAST($e AS INTEGER) AS epoch, vec_id, vec_id2, adist, " +
          s"arn, rn FROM ranked_$e WHERE rn <= $TopK")
        .mkString(" UNION ALL ")}
       ORDER BY epoch, vec_id, rn"""
  }

  /** DuckDB mirror of `stream_pq_live_delta` (r16): retrain epochs
    * (1, then every `every`-th after) are the [[pqLiveOracleSql]]
    * blocks — cold at 1, warm-refined from the codebook IN FORCE
    * otherwise; the epochs between are [[pqDeltaCtes]] blocks: codes
    * carry forward, only the new suffix is assigned, probes/ADC read
    * the stale in-force model, the re-rank reads the fresh prefix.
    * The in-force suffix is a pure function of the epoch number, so
    * the chain mirrors the streamed run exactly — including across
    * kill/resume, which recomputes it from the epoch alone. */
  private[graft] def pqLiveDeltaOracleSql(k: Int, every: Int): String = {
    def isRetrain(e: Int) = e == 1 || (e - 1) % every == 0
    def inForce(e: Int) = (1 to e).filter(isRetrain).max
    val blocks = (1 to k).map { e =>
      val pre = s"""pre$e AS (SELECT * FROM embeddings
              WHERE vec_id <
                ((SELECT max(vec_id) FROM embeddings) + 1) * $e // $k)"""
      if (isRetrain(e)) {
        val warm = if (e == 1) None else Some(s"_${inForce(e - 1)}")
        s"""$pre,
         ${pqMirrorCtes(s"_$e", s"pre$e", warm)}"""
      } else {
        val cut = s"((SELECT max(vec_id) FROM embeddings) + 1) " +
          s"* ${e - 1} // $k"
        s"""$pre,
         ${pqDeltaCtes(s"_$e", s"pre$e", s"_${e - 1}",
          s"_${inForce(e)}", cut)}"""
      }
    }
    s"""WITH qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 10),
       ${blocks.mkString(",\n       ")}
       ${(1 to k).map(e =>
        s"SELECT CAST($e AS INTEGER) AS epoch, vec_id, vec_id2, adist, " +
          s"arn, rn FROM ranked_$e WHERE rn <= $TopK")
        .mkString(" UNION ALL ")}
       ORDER BY epoch, vec_id, rn"""
  }

  /** DuckDB mirror of `stream_ann_live` (round-12): the per-epoch
    * truth as `k` prefix-parameterized images of [[annIvfOracleSql]]
    * UNION ALLed — epoch e sees exactly the id-ordered prefix
    * vec_id < (max+1)·e/k (the tableBatchDir split formula) with the
    * quantizer re-trained on that prefix, which is precisely what the
    * streamed run publishes per trigger. The CTE bodies are the proven
    * centroid/probe arithmetic with an epoch suffix. */
  private[graft] def annLiveOracleSql(k: Int): String = {
    def cos(a: String, b: String): String =
      s"""list_dot_product($a, $b)
             / (sqrt(list_dot_product($a, $a))
                * sqrt(list_dot_product($b, $b)))"""
    val blocks = (1 to k).map { e =>
      s"""pre$e AS (SELECT * FROM embeddings
              WHERE vec_id <
                ((SELECT max(vec_id) FROM embeddings) + 1) * $e // $k),
         cent$e AS (
           SELECT label, j,
             CASE WHEN sm >= 0 THEN sm // n
                  ELSE -((-sm) // n) END / 1000000.0 AS c
           FROM (
             SELECT e.label, t.j,
               SUM(CAST(round(CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE)
                 * 1000000.0) AS BIGINT)) AS sm,
               count(*) AS n
             FROM pre$e e, range(1, 65) t(j)
             GROUP BY 1, 2)),
         cvecs$e AS (SELECT label AS c_label, list(c ORDER BY j) AS cv
                     FROM cent$e GROUP BY 1),
         probes$e AS (
           SELECT q_id, c_label FROM (
             SELECT q.q_id, c.c_label,
               row_number() OVER (PARTITION BY q.q_id ORDER BY
                 ${cos("q.qv", "c.cv")} DESC, c.c_label) AS prn
             FROM qs q, cvecs$e c)
           WHERE prn <= $NProbe),
         scored$e AS (
           SELECT p.q_id, cl.vec_id AS vec_id2,
             round(${cos("q.qv", "CAST(cl.embedding AS DOUBLE[])")}, 6)
               AS sim
           FROM probes$e p JOIN pre$e cl ON cl.label = p.c_label
           JOIN qs q ON q.q_id = p.q_id
           WHERE p.q_id <> cl.vec_id),
         ranked$e AS (
           SELECT CAST($e AS INTEGER) AS epoch, q_id AS vec_id, vec_id2,
                  sim,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY sim DESC, vec_id2) AS INTEGER) AS rn
           FROM scored$e)"""
    }
    s"""WITH qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 10),
       ${blocks.mkString(",\n       ")}
       ${(1 to k).map(e =>
           s"SELECT epoch, vec_id, vec_id2, sim, rn FROM ranked$e " +
             s"WHERE rn <= $TopK").mkString(" UNION ALL ")}
       ORDER BY epoch, vec_id, rn"""
  }

  val oracle: Map[String, String] = Map(
    "llm_ann_lsh" -> TrainingDataOps.annLshOracleSql,
    "llm_ann_ivf" -> annIvfOracleSql,

    // recall mirror: the shared IVF chain (`ranked`) vs an inline
    // brute-force exact top-5 (the llm_cosine_topk mirror), hit-joined
    // per query; recall = one exact IEEE division of small ints
    "llm_ann_recall" ->
      s"""WITH $annIvfCtesSql,
         e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
                FROM embeddings),
         d2 AS (SELECT vec_id, vec, list_dot_product(vec, vec)
                  AS self_dot FROM e2),
         s2 AS (SELECT q.vec_id AS vec_id, c.vec_id AS vec_id2,
                  round(list_dot_product(q.vec, c.vec)
                    / (sqrt(q.self_dot) * sqrt(c.self_dot)), 6) AS sim
                FROM d2 q JOIN d2 c
                  ON q.vec_id < 10 AND c.vec_id != q.vec_id),
         ex AS (SELECT vec_id, vec_id2 FROM (
                  SELECT vec_id, vec_id2, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, vec_id2) AS rn
                  FROM s2) WHERE rn <= $TopK),
         ap AS (SELECT vec_id, vec_id2 FROM ranked WHERE rn <= $TopK),
         hits AS (SELECT a.vec_id, count(*) AS n_hits
                  FROM ap a JOIN ex x
                    ON x.vec_id = a.vec_id AND x.vec_id2 = a.vec_id2
                  GROUP BY 1)
         SELECT q.q_id AS vec_id, coalesce(h.n_hits, 0) AS n_hits,
                $TopK AS k,
                CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $TopK AS recall
         FROM qs q LEFT JOIN hits h ON h.vec_id = q.q_id
         ORDER BY vec_id""",
    "llm_ann_pq" -> annPqOracleSql,
    // staging is invisible (deterministic training + exact parquet
    // roundtrip) — the shared mirror re-proves the staged derivation
    "llm_ann_pq_persisted" -> annPqOracleSql)
}
