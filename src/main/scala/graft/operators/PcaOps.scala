package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PCA projection over the embedding corpus (`llm_embedding_pca`,
  * round-13 add) — the standard dimensionality-reduction /
  * decorrelation step run before clustering, ANN index build, or
  * embedding-space visualization (Pearson 1901; every modern
  * embedding-curation pipeline ships a variant).
  *
  * Two-tier Spark mapping, like the BPE trainer:
  *
  *  - CORPUS tier: mean + covariance. Centered coordinates are exact
  *    micro-unit longs (round(x·10⁶) − truncdiv mean, the AnnOps
  *    centroid discipline), so C[i][j] = Σ c_i·c_j is an EXACT long
  *    (|c| ≤ 4·10⁶ ⇒ per-pair ≤ 1.6·10¹³, safe to ~10⁵·corpus rows;
  *    a 100 TB deployment upgrades the accumulator to DECIMAL(38) —
  *    same plan). The d² = 4096-key agg is the ONLY corpus-scale
  *    stage, fed by the per-partition Gram accumulator
  *    ([[gramPartials]]): each PARTITION emits d² partial rows (not
  *    each row — the r13 ×4096 posexplode amplification is gone), no
  *    self-join, no shuffle wider than d² keys.
  *  - MODEL tier: the 64×64 matrix is collected (bounded at ANY
  *    corpus size — the BPE-argmax rule) and the top-2 components
  *    come from TWELVE fixed power-method steps + one deflation,
  *    every fold in ascending index order with plain double
  *    multiply-add — the exact arithmetic the oracle's unrolled
  *    matvec CTEs replay via ordered `list_dot_product`, so DuckDB
  *    reproduces the doubles bit-identically (the proven cosine-
  *    kernel equality, round 10). Covariance longs cast to double at
  *    the same point in both engines.
  *
  * CONTRACT NOTE: the synthetic embeddings are near-isotropic
  * (measured var(p1)=0.028 vs var(p2)=0.026 at sf0.001), so 12 power
  * steps do NOT converge to a sharply separated principal axis — the
  * registered contract is the deterministic fixed-iteration algorithm
  * (init e₁, 12 steps, deflate, 12 steps), which both engines and the
  * PcaSpec reference compute identically; on a real anisotropic
  * corpus the same op IS the principal plane.
  */
object PcaOps {

  type Q = (SparkSession, String) => DataFrame

  private[graft] val Dim = 64
  private[graft] val Iters = 12

  /** Driver-side power method on the collected d×d matrix — every
    * fold ascending-index double multiply-add (the oracle's
    * list_dot_product order). Returns the unit vector after
    * [[Iters]] steps from init e₁. */
  private[graft] def powerIter(m: Array[Array[Double]]): Array[Double] = {
    var v = Array.tabulate(Dim)(i => if (i == 0) 1.0 else 0.0)
    var it = 0
    while (it < Iters) {
      val w = Array.tabulate(Dim) { i =>
        var s = 0.0
        var j = 0
        while (j < Dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      var n2 = 0.0
      var j = 0
      while (j < Dim) { n2 += w(j) * w(j); j += 1 }
      val nrm = math.sqrt(n2)
      // degenerate matrix (single vector / constant embeddings → all-
      // zero covariance): keep the current iterate instead of NaN-
      // poisoning every downstream projection
      if (nrm != 0.0) v = w.map(_ / nrm)
      it += 1
    }
    v
  }

  /** Top-2 components of the collected covariance matrix: power
    * method, λ₁ via the same fold order, rank-1 deflation, power
    * method again — shared by the batch op and the state-derived
    * `stream_pca_live` model so both produce bit-identical
    * eigenvectors from equal matrices. */
  private[graft] def pcaComponents(mat: Array[Array[Double]])
      : (Array[Double], Array[Double]) = {
    val v1 = powerIter(mat)
    val w1 = Array.tabulate(Dim) { i =>
      var s = 0.0
      var j = 0
      while (j < Dim) { s += mat(i)(j) * v1(j); j += 1 }
      s
    }
    var l1 = 0.0
    var j1 = 0
    while (j1 < Dim) { l1 += w1(j1) * v1(j1); j1 += 1 }
    val m2 = Array.tabulate(Dim, Dim)((i, j) =>
      mat(i)(j) - l1 * v1(i) * v1(j))
    (v1, powerIter(m2))
  }

  /** Centered micro-unit coordinate arrays (vec_id, arr[Dim] long) of
    * an embeddings frame — the truncdiv mean of THAT frame. */
  private[graft] def centeredArrays(emb: DataFrame): DataFrame = {
    val xm = emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("j"),
        round(col("col").cast("double") * 1e6).cast("long").as("xmj"))
    val mn = xm.groupBy(col("j"))
      .agg(sum(col("xmj")).as("sm"), count(lit(1)).as("n"))
      .select(col("j"), expr("sm div n").as("mj"))
    xm.join(broadcast(mn), Seq("j"))
      .withColumn("c", col("xmj") - col("mj"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("j"), col("c"))))
        .as("pc"))
      .select(col("vec_id"),
        transform(col("pc"), x => x.getField("c")).as("arr"))
  }

  /** Per-partition Gram accumulator over an `arr` column of [[Dim]]
    * long arrays: each partition folds its rows into ONE local d×d
    * long matrix and emits d² (i, j, cl) partials (1-based), so the
    * agg's input carries 4096 rows PER PARTITION instead of 4096
    * exploded structs PER ROW — the corpus tier's per-row CPU drops
    * from d² struct emissions to d² fused multiply-adds (the r13
    * review's efficiency item). Long addition is associative and
    * commutative, so the grouped sums are bit-identical to the
    * per-row outer-product aggregation the oracle mirrors. */
  private[graft] def gramPartials(src: DataFrame): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    val dim = Dim
    src.select(col("arr")).as[Seq[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](dim * dim)
        var any = false
        while (it.hasNext) {
          val a = it.next().toArray
          any = true
          var i = 0
          while (i < dim) {
            val ai = a(i); val base = i * dim; var j = 0
            while (j < dim) { acc(base + j) += ai * a(j); j += 1 }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else Iterator.tabulate(dim * dim) { x =>
          (x / dim + 1, x % dim + 1, acc(x))
        }
      }
      .toDF("i", "j", "cl")
      .groupBy(col("i"), col("j")).agg(sum(col("cl")).as("cl"))
  }

  /** Collect the d×d covariance matrix of a centered-array frame via
    * [[gramPartials]] — the bounded model-tier collect (d² rows at ANY
    * corpus size), shared by both batch PCA ops. */
  private[graft] def gramMatrix(cxa: DataFrame): Array[Array[Double]] = {
    val mat = Array.ofDim[Double](Dim, Dim)
    gramPartials(cxa).collect().foreach(r =>
      mat(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getLong(2).toDouble)
    mat
  }

  /** Project a centered-array frame onto two literal eigenvectors —
    * the shared fold (products in ascending index order, then the
    * ordered sum; ≡ the oracle's list_dot_product). */
  private[graft] def projectArrays(cxa: DataFrame, v1: Array[Double],
      v2: Array[Double]): DataFrame = {
    def proj(v: Array[Double]): org.apache.spark.sql.Column = {
      val vlit = array(v.map(lit): _*)
      round(aggregate(
        zip_with(col("arr"), vlit, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x) / lit(1e6), 6)
    }
    cxa.select(col("vec_id"), proj(v1).as("p1"), proj(v2).as("p2"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, Q] = Map(
    "llm_embedding_pca" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cutF = AdaptiveCollapse.stageCut(s) _
      val cxa = cutF(centeredArrays(emb))
      // exact-long covariance via the per-partition Gram accumulator —
      // one corpus pass, d² partial rows per partition, no self-join
      val (v1, v2) = pcaComponents(gramMatrix(cxa))
      projectArrays(cxa, v1, v2)
    }),

    // Embedding-space OUTLIER scoring (round-13 add): the curation
    // filter PCA exists to feed — a vector's residual variance OFF the
    // top-2 plane, resid = |c|²/10¹² − p1² − p2² (unrounded
    // projections; |c|² is an EXACT long Σc², so the only doubles are
    // the proven pinned-order folds), top-25 by (resid DESC, vec_id).
    // Embedding outliers are the mislabeled/corrupted-modality
    // candidates a pretraining pipeline quarantines before training.
    // Shares the whole model tier with `llm_embedding_pca`; the rank
    // compiles to TakeOrderedAndProject (never a global sort).
    "llm_embedding_outliers" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cutF = AdaptiveCollapse.stageCut(s) _
      val cxa = cutF(centeredArrays(emb))
      val (v1, v2) = pcaComponents(gramMatrix(cxa))
      outlierSelect(cxa, v1, v2)
    })
  )

  /** The top-[[Outliers]] residual quarantine over a centered-array
    * frame and two literal eigenvectors — shared by
    * `llm_embedding_outliers` and the per-epoch `stream_outliers_live`
    * emit so the batch and live faces select identically. */
  private[graft] val Outliers = 25

  private[graft] def outlierSelect(cxa: DataFrame, v1: Array[Double],
      v2: Array[Double]): DataFrame = {
    def projRaw(v: Array[Double]): org.apache.spark.sql.Column = {
      val vlit = array(v.map(lit): _*)
      aggregate(
        zip_with(col("arr"), vlit, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x) / lit(1e6)
    }
    val self = aggregate(transform(col("arr"), c => c * c), lit(0L),
      (acc, x) => acc + x).cast("double") / lit(1e12)
    cxa.select(col("vec_id"), projRaw(v1).as("p1u"),
        projRaw(v2).as("p2u"), self.as("selfv"))
      .select(col("vec_id"), round(col("p1u"), 6).as("p1"),
        round(col("p2u"), 6).as("p2"),
        round(col("selfv") - col("p1u") * col("p1u")
          - col("p2u") * col("p2u"), 6).as("resid"))
      .orderBy(col("resid").desc, col("vec_id"))
      .limit(Outliers)
  }

  /** One unrolled power step of the DuckDB mirror: matvec over the
    * ordered covariance rows, norm, normalize — `mat` selects the
    * crow1/crow2 row column; every CTE name carries `sfx`. */
  private def stepSql(sfx: String, mat: Int, r: Int,
      prev: String): String =
    s"""w${mat}_$r$sfx AS MATERIALIZED (
         SELECT c.i AS j, list_dot_product(c.row_$mat, v.v) AS wj
         FROM crow$mat$sfx c, $prev v),
       n${mat}_$r$sfx AS MATERIALIZED (
         SELECT sqrt(list_dot_product(list(wj ORDER BY j),
           list(wj ORDER BY j))) AS nrm
         FROM w${mat}_$r$sfx),
       v${mat}_$r$sfx AS MATERIALIZED (
         SELECT list(w.wj / n.nrm ORDER BY w.j) AS v
         FROM w${mat}_$r$sfx w, n${mat}_$r$sfx n GROUP BY n.nrm)"""

  /** The full PCA mirror over corpus table `src`, every CTE name
    * suffixed `sfx` — shared by the single-corpus oracle (sfx = "")
    * and the per-epoch blocks of [[pcaLiveOracleSql]]. The mirror
    * always recomputes the covariance DIRECTLY as Σ(x−m)(x−m)ᵀ: the
    * streamed op derives the identical longs from its append-only
    * (Σxxᵀ, Σx, n) state by the exact integer identity, and the
    * hash-match IS the proof of that derivation. Ends at `proj$sfx`. */
  private def pcaMirrorCtes(sfx: String, src: String): String = {
    val last1 = s"v1_$Iters$sfx"
    val last2 = s"v2_$Iters$sfx"
    s"""xm$sfx AS MATERIALIZED (
         SELECT vec_id, g.j AS j,
           CAST(round(CAST(embedding[CAST(g.j AS INT)] AS DOUBLE)
             * 1000000.0) AS BIGINT) AS xmj
         FROM $src, range(1, ${Dim + 1}) g(j)),
       mn$sfx AS MATERIALIZED (
         SELECT j, CASE WHEN sum(xmj) >= 0 THEN sum(xmj) // count(*)
                        ELSE -((-sum(xmj)) // count(*)) END AS mj
         FROM xm$sfx GROUP BY j),
       cx$sfx AS MATERIALIZED (
         SELECT x.vec_id, x.j, CAST(x.xmj - m.mj AS BIGINT) AS c
         FROM xm$sfx x JOIN mn$sfx m ON m.j = x.j),
       cov$sfx AS MATERIALIZED (
         SELECT a.j AS i, b.j AS j, CAST(sum(a.c * b.c) AS DOUBLE) AS cij
         FROM cx$sfx a JOIN cx$sfx b ON b.vec_id = a.vec_id
         GROUP BY 1, 2),
       crow1$sfx AS MATERIALIZED (
         SELECT i, list(cij ORDER BY j) AS row_1 FROM cov$sfx GROUP BY i),
       v1_0$sfx AS (SELECT list_transform(generate_series(1, $Dim),
         x -> CASE WHEN x = 1 THEN 1.0 ELSE 0.0 END) AS v),
       ${(1 to Iters).map(r =>
        stepSql(sfx, 1, r, if (r == 1) s"v1_0$sfx" else s"v1_${r - 1}$sfx"))
        .mkString(",\n       ")},
       wl$sfx AS (SELECT c.i AS j, list_dot_product(c.row_1, v.v) AS wj
              FROM crow1$sfx c, $last1 v),
       lam1$sfx AS (SELECT list_dot_product(
           (SELECT list(wj ORDER BY j) FROM wl$sfx),
           (SELECT v FROM $last1)) AS l1),
       crow2$sfx AS MATERIALIZED (
         SELECT c.i,
           list_transform(generate_series(1, $Dim),
             x -> c.row_1[CAST(x AS INT)]
               - l.l1 * v.v[CAST(c.i AS INT)] * v.v[CAST(x AS INT)])
           AS row_2
         FROM crow1$sfx c, lam1$sfx l, $last1 v),
       v2_0$sfx AS (SELECT list_transform(generate_series(1, $Dim),
         x -> CASE WHEN x = 1 THEN 1.0 ELSE 0.0 END) AS v),
       ${(1 to Iters).map(r =>
        stepSql(sfx, 2, r, if (r == 1) s"v2_0$sfx" else s"v2_${r - 1}$sfx"))
        .mkString(",\n       ")},
       proj$sfx AS (
         SELECT x.vec_id,
           round(list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
             (SELECT v FROM $last1)) / 1000000.0, 6) AS p1,
           round(list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
             (SELECT v FROM $last2)) / 1000000.0, 6) AS p2
         FROM cx$sfx x GROUP BY x.vec_id)"""
  }

  private def pcaOracleSql: String =
    s"""WITH ${pcaMirrorCtes("", "embeddings")}
       SELECT vec_id, p1, p2 FROM proj ORDER BY vec_id"""

  /** DuckDB mirror of `stream_pca_live`: k prefix-parameterized images
    * of the PCA mirror UNION ALLed — epoch e re-derives mean +
    * covariance + components on the id-ordered prefix
    * vec_id < (max+1)·e/k and re-projects the prefix, which is what
    * the streamed run's state-derived model publishes per trigger. */
  private[graft] def pcaLiveOracleSql(k: Int): String = {
    val blocks = (1 to k).map { e =>
      s"""pre$e AS (SELECT * FROM embeddings
              WHERE vec_id <
                ((SELECT max(vec_id) FROM embeddings) + 1) * $e // $k),
         ${pcaMirrorCtes(s"_$e", s"pre$e")}"""
    }
    s"""WITH ${blocks.mkString(",\n       ")}
       ${(1 to k).map(e =>
        s"SELECT CAST($e AS INTEGER) AS epoch, vec_id, p1, p2 " +
          s"FROM proj_$e").mkString(" UNION ALL ")}
       ORDER BY epoch, vec_id"""
  }

  /** DuckDB mirror of `stream_outliers_live`: per epoch, the
    * prefix-trained PCA mirror + the residual top-[[Outliers]] select
    * (the llm_embedding_outliers final stage), UNION ALLed. */
  private[graft] def outliersLiveOracleSql(k: Int): String = {
    val blocks = (1 to k).map { e =>
      s"""pre$e AS (SELECT * FROM embeddings
              WHERE vec_id <
                ((SELECT max(vec_id) FROM embeddings) + 1) * $e // $k),
         ${pcaMirrorCtes(s"_$e", s"pre$e")},
         scored_$e AS (
           SELECT x.vec_id,
             list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
               (SELECT v FROM v1_${Iters}_$e)) / 1000000.0 AS p1u,
             list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
               (SELECT v FROM v2_${Iters}_$e)) / 1000000.0 AS p2u,
             CAST(sum(x.c * x.c) AS DOUBLE) / 1000000000000.0 AS selfv
           FROM cx_$e x GROUP BY x.vec_id),
         sel_$e AS (
           SELECT vec_id, round(p1u, 6) AS p1, round(p2u, 6) AS p2,
                  round(selfv - p1u * p1u - p2u * p2u, 6) AS resid
           FROM scored_$e
           ORDER BY resid DESC, vec_id LIMIT $Outliers)"""
    }
    s"""WITH ${blocks.mkString(",\n       ")}
       ${(1 to k).map(e =>
        s"SELECT CAST($e AS INTEGER) AS epoch, vec_id, p1, p2, resid " +
          s"FROM sel_$e").mkString(" UNION ALL ")}
       ORDER BY epoch, resid DESC, vec_id"""
  }

  val oracle: Map[String, String] = Map(
    "llm_embedding_pca" -> pcaOracleSql,
    "llm_embedding_outliers" ->
      s"""WITH ${pcaMirrorCtes("", "embeddings")},
         scored AS (
           SELECT x.vec_id,
             list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
               (SELECT v FROM v1_$Iters)) / 1000000.0 AS p1u,
             list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
               (SELECT v FROM v2_$Iters)) / 1000000.0 AS p2u,
             CAST(sum(x.c * x.c) AS DOUBLE) / 1000000000000.0 AS selfv
           FROM cx x GROUP BY x.vec_id)
         SELECT vec_id, round(p1u, 6) AS p1, round(p2u, 6) AS p2,
                round(selfv - p1u * p1u - p2u * p2u, 6) AS resid
         FROM scored
         ORDER BY resid DESC, vec_id
         LIMIT 25""")
}
