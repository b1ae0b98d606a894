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
    * cell sim) a pure function both engines compute bit-identically. */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(round(col("col").cast("double") * 1e6).cast("long"))
        .as("sm"), count(lit(1)).as("n"))
      .withColumn("c", expr("sm div n") / lit(1e6))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("c_label"),
        transform(col("pc"), x => x.getField("c")).as("centroid"))

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
      cent: DataFrame): DataFrame = {
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
      .filter(col("rn") <= TopK)
      .select(col("q_id").as("vec_id"), col("vec_id2"), col("sim"),
        col("rn"))
  }

  val queries: Map[String, Q] = Map(
    "llm_ann_ivf" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = graft.Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      annIvfVerdictsCore(q, emb, centroids(emb))
        .orderBy(col("vec_id"), col("rn"))
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

  private[graft] def annIvfOracleSql: String =
    s"""WITH $centroidCtesSql,
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
         FROM scored)
       SELECT vec_id, vec_id2, sim, rn FROM ranked
       WHERE rn <= $TopK ORDER BY vec_id, rn"""

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
    "llm_ann_ivf" -> annIvfOracleSql)
}
