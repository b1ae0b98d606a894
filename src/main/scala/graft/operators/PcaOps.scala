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
  *    same plan). The d² = 4096-key agg is map-side combinable and
  *    the ONLY corpus-scale stage: each row contributes its outer
  *    product via two chained posexplodes, no self-join, no shuffle
  *    wider than d² keys.
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
  private def powerIter(m: Array[Array[Double]]): Array[Double] = {
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
      v = w.map(_ / nrm)
      it += 1
    }
    v
  }

  val queries: Map[String, Q] = Map(
    "llm_embedding_pca" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cutF = AdaptiveCollapse.stageCut(s) _
      val xm = emb.select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("j"),
          round(col("col").cast("double") * 1e6).cast("long").as("xmj"))
      val mn = xm.groupBy(col("j"))
        .agg(sum(col("xmj")).as("sm"), count(lit(1)).as("n"))
        .select(col("j"), expr("sm div n").as("mj"))
      // centered micro-unit arrays, ordered by coordinate
      val cxa = cutF(xm.join(broadcast(mn), Seq("j"))
        .withColumn("c", col("xmj") - col("mj"))
        .groupBy(col("vec_id"))
        .agg(array_sort(collect_list(struct(col("j"), col("c"))))
          .as("pc"))
        .select(col("vec_id"),
          transform(col("pc"), x => x.getField("c")).as("arr")))
      // exact-long covariance via chained outer-product explodes —
      // one corpus pass, d²-key map-side-combined agg, no self-join
      val cov = cxa
        .select(col("arr"), posexplode(col("arr")).as(Seq("i0", "ci")))
        .select(col("i0"), col("ci"),
          posexplode(col("arr")).as(Seq("j0", "cj")))
        .groupBy(col("i0"), col("j0"))
        .agg(sum(col("ci") * col("cj")).as("cl"))
        .collect()
      val mat = Array.ofDim[Double](Dim, Dim)
      cov.foreach(r =>
        mat(r.getInt(0))(r.getInt(1)) = r.getLong(2).toDouble)
      val v1 = powerIter(mat)
      // λ₁ = v₁ᵀ C v₁ (same fold order), then deflate and re-iterate
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
      val v2 = powerIter(m2)
      def proj(v: Array[Double]): org.apache.spark.sql.Column = {
        val vlit = array(v.map(lit): _*)
        round(aggregate(
          zip_with(col("arr"), vlit, (a, b) => a.cast("double") * b),
          lit(0.0), (acc, x) => acc + x) / lit(1e6), 6)
      }
      cxa.select(col("vec_id"), proj(v1).as("p1"), proj(v2).as("p2"))
        .orderBy(col("vec_id"))
    })
  )

  /** One unrolled power step of the DuckDB mirror: matvec over the
    * ordered covariance rows, norm, normalize — `mat` selects the
    * crow1/crow2 row column. */
  private def stepSql(mat: Int, r: Int, prev: String): String =
    s"""w${mat}_$r AS MATERIALIZED (
         SELECT c.i AS j, list_dot_product(c.row_$mat, v.v) AS wj
         FROM crow$mat c, $prev v),
       n${mat}_$r AS MATERIALIZED (
         SELECT sqrt(list_dot_product(list(wj ORDER BY j),
           list(wj ORDER BY j))) AS nrm
         FROM w${mat}_$r),
       v${mat}_$r AS MATERIALIZED (
         SELECT list(w.wj / n.nrm ORDER BY w.j) AS v
         FROM w${mat}_$r w, n${mat}_$r n GROUP BY n.nrm)"""

  private def pcaOracleSql: String = {
    val last1 = s"v1_$Iters"
    val last2 = s"v2_$Iters"
    s"""WITH xm AS MATERIALIZED (
         SELECT vec_id, g.j AS j,
           CAST(round(CAST(embedding[CAST(g.j AS INT)] AS DOUBLE)
             * 1000000.0) AS BIGINT) AS xmj
         FROM embeddings, range(1, ${Dim + 1}) g(j)),
       mn AS MATERIALIZED (
         SELECT j, CASE WHEN sum(xmj) >= 0 THEN sum(xmj) // count(*)
                        ELSE -((-sum(xmj)) // count(*)) END AS mj
         FROM xm GROUP BY j),
       cx AS MATERIALIZED (
         SELECT x.vec_id, x.j, CAST(x.xmj - m.mj AS BIGINT) AS c
         FROM xm x JOIN mn m ON m.j = x.j),
       cov AS MATERIALIZED (
         SELECT a.j AS i, b.j AS j, CAST(sum(a.c * b.c) AS DOUBLE) AS cij
         FROM cx a JOIN cx b ON b.vec_id = a.vec_id
         GROUP BY 1, 2),
       crow1 AS MATERIALIZED (
         SELECT i, list(cij ORDER BY j) AS row_1 FROM cov GROUP BY i),
       v1_0 AS (SELECT list_transform(generate_series(1, $Dim),
         x -> CASE WHEN x = 1 THEN 1.0 ELSE 0.0 END) AS v),
       ${(1 to Iters).map(r =>
        stepSql(1, r, if (r == 1) "v1_0" else s"v1_${r - 1}"))
        .mkString(",\n       ")},
       wl AS (SELECT c.i AS j, list_dot_product(c.row_1, v.v) AS wj
              FROM crow1 c, $last1 v),
       lam1 AS (SELECT list_dot_product(
           (SELECT list(wj ORDER BY j) FROM wl),
           (SELECT v FROM $last1)) AS l1),
       crow2 AS MATERIALIZED (
         SELECT c.i,
           list_transform(generate_series(1, $Dim),
             x -> c.row_1[CAST(x AS INT)]
               - l.l1 * v.v[CAST(c.i AS INT)] * v.v[CAST(x AS INT)])
           AS row_2
         FROM crow1 c, lam1 l, $last1 v),
       v2_0 AS (SELECT list_transform(generate_series(1, $Dim),
         x -> CASE WHEN x = 1 THEN 1.0 ELSE 0.0 END) AS v),
       ${(1 to Iters).map(r =>
        stepSql(2, r, if (r == 1) "v2_0" else s"v2_${r - 1}"))
        .mkString(",\n       ")},
       proj AS (
         SELECT x.vec_id,
           round(list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
             (SELECT v FROM $last1)) / 1000000.0, 6) AS p1,
           round(list_dot_product(list(CAST(x.c AS DOUBLE) ORDER BY x.j),
             (SELECT v FROM $last2)) / 1000000.0, 6) AS p2
         FROM cx x GROUP BY x.vec_id)
       SELECT vec_id, p1, p2 FROM proj ORDER BY vec_id"""
  }

  val oracle: Map[String, String] = Map(
    "llm_embedding_pca" -> pcaOracleSql)
}
