package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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
  * shuffle at any size. Approximate ⇒ rows-only + ScalaTest recall vs
  * the brute-force truth.
  *
  * Determinism: centroid means accumulate as DECIMAL(38,12) (associative)
  * before the final double cast, so partition order can't perturb probe
  * rankings; all rankings carry id tie-breaks.
  */
object AnnOps {

  type Q = (SparkSession, String) => DataFrame

  // The synthetic clusters are loose (max pairwise cosine ≈ 0.51), so a
  // tight probe misses true neighbours; 5/10 cells still halves the
  // scored candidates while keeping recall usable.
  val NProbe = 5
  val TopK = 5

  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(38, 12))) / count(lit(1)))
        .cast("double").as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label").as("c_label"),
        transform(col("pc"), x => x.getField("c")).as("centroid"))

  val queries: Map[String, Q] = Map(
    "llm_ann_ivf" -> ((s, d) => {
      CosineSimilarity.register(s)
      val emb = graft.Tables.embeddings(s, d)
      val cent = centroids(emb)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
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
      // The probe set (nqueries × nprobe rows) is broadcast so the corpus
      // side never shuffles — each cell partition scores its residents
      // against the probes that mapped to it.
      cells.join(broadcast(probed), Seq("c_label"))
        .filter(col("q_id") =!= col("vec_id2"))
        .withColumn("sim", round(expr("cosine_sim(q_vec, c_vec)"), 6))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") <= TopK)
        .select(col("q_id").as("vec_id"), col("vec_id2"), col("sim"),
          col("rn"))
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

  /** `llm_ann_lsh` is oracle-checked since round 10 (approximate wrt
    * ground truth, deterministic in corpus + plane constants — the SQL
    * mirror lives next to llm_embedding_lsh's, sharing the sign-fold
    * CTEs). `llm_ann_ivf` stays no-oracle: its centroid means divide a
    * DECIMAL(38,12) sum by a bigint count under SPARK's decimal
    * division precision/scale rules before the double cast, and DuckDB
    * applies different decimal-quotient scale rules — the quotient can
    * legitimately differ in the last retained digit, so a bit-exact
    * mirror is not available without reimplementing Spark's decimal
    * division in SQL; ScalaTest checks recall@5 vs brute instead. */
  val oracle: Map[String, String] = Map(
    "llm_ann_lsh" -> TrainingDataOps.annLshOracleSql)
}
