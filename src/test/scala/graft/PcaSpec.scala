package graft

/** `llm_embedding_pca` semantics: exact match against an independent
  * in-test replay of the fixed-iteration power method, plus the
  * centering invariant and determinism.
  */
class PcaSpec extends GraftSpec {

  private val Dim = operators.PcaOps.Dim
  private val Iters = operators.PcaOps.Iters

  private def reference(): Map[Long, (Double, Double)] = {
    val data = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val n = data.length
    val xm = data.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6))
    }
    val mj = Array.tabulate(Dim) { j =>
      val s = xm.map(_._2(j)).sum
      if (s >= 0) s / n else -((-s) / n)
    }
    val cx = xm.map { case (id, v) =>
      id -> Array.tabulate(Dim)(j => v(j) - mj(j))
    }
    val mat = Array.ofDim[Double](Dim, Dim)
    for (i <- 0 until Dim; j <- 0 until Dim) {
      var s = 0L
      cx.foreach { case (_, c) => s += c(i) * c(j) }
      mat(i)(j) = s.toDouble
    }
    def matvec(m: Array[Array[Double]], v: Array[Double]) =
      Array.tabulate(Dim) { i =>
        var s = 0.0
        var j = 0
        while (j < Dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0
      var j = 0
      while (j < Dim) { s += a(j) * b(j); j += 1 }
      s
    }
    def power(m: Array[Array[Double]]) = {
      var v = Array.tabulate(Dim)(i => if (i == 0) 1.0 else 0.0)
      (1 to Iters).foreach { _ =>
        val w = matvec(m, v)
        val nrm = math.sqrt(dot(w, w))
        v = w.map(_ / nrm)
      }
      v
    }
    val v1 = power(mat)
    val l1 = dot(matvec(mat, v1), v1)
    val m2 = Array.tabulate(Dim, Dim)((i, j) => mat(i)(j) - l1 * v1(i) * v1(j))
    val v2 = power(m2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    cx.map { case (id, c) =>
      val cd = c.map(_.toDouble)
      id -> (r6(dot(cd, v1) / 1e6), r6(dot(cd, v2) / 1e6))
    }.toMap
  }

  test("pca projections equal the independent power-method reference") {
    val exp = reference()
    val got = SparkEntry.queries("llm_embedding_pca")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == exp.keySet)
    val bad = got.filter { case (id, p) => p != exp(id) }
    assert(bad.isEmpty,
      s"${bad.size} projections drifted; first: ${bad.headOption}")
  }

  test("embedding outliers are the top-25 by independent residual " +
      "recomputation, and residuals are nonnegative off-plane energy") {
    val data = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val n = data.length
    val xm = data.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1e6))
    }
    val mj = Array.tabulate(Dim) { j =>
      val s = xm.map(_._2(j)).sum
      if (s >= 0) s / n else -((-s) / n)
    }
    val cx = xm.map { case (id, v) =>
      id -> Array.tabulate(Dim)(j => v(j) - mj(j))
    }
    val mat = Array.ofDim[Double](Dim, Dim)
    for (i <- 0 until Dim; j <- 0 until Dim) {
      var s = 0L
      cx.foreach { case (_, c) => s += c(i) * c(j) }
      mat(i)(j) = s.toDouble
    }
    val (v1, v2) = operators.PcaOps.pcaComponents(mat)
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0
      var j = 0
      while (j < Dim) { s += a(j) * b(j); j += 1 }
      s
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = cx.map { case (id, c) =>
      val cd = c.map(_.toDouble)
      val p1 = dot(cd, v1) / 1e6
      val p2 = dot(cd, v2) / 1e6
      var s2 = 0L
      c.foreach(v => s2 += v * v)
      (id, r6(s2.toDouble / 1e12 - p1 * p1 - p2 * p2))
    }
    val exp = scored.sortBy { case (id, r) => (-r, id) }.take(25).toSeq
    val got = SparkEntry.queries("llm_embedding_outliers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == exp, s"outlier drift:\n got=$got\n exp=$exp")
    // off-plane energy can't be negative (beyond the 1e-6 round)
    assert(got.forall(_._2 >= -1e-6))
  }

  test("gramPartials equals the brute-force outer-product sum, with " +
      "empty partitions absorbed") {
    // the per-partition accumulator (r14: replaces the ×d² posexplode)
    // must reproduce the exact longs of the naive per-row outer product
    // regardless of row-to-partition placement
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(37)(i =>
      (i.toLong, Seq.fill(Dim)(rnd.between(-4000000L, 4000000L))))
    import spark.implicits._
    // 16 partitions over 37 rows → some partitions are empty-ish and
    // the accumulator's any-guard must drop them silently
    val df = rows.toDF("vec_id", "arr").repartition(16)
    val got = operators.PcaOps.gramPartials(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exp = (for (i <- 0 until Dim; j <- 0 until Dim) yield {
      var s = 0L
      rows.foreach { case (_, a) => s += a(i) * a(j) }
      (i + 1, j + 1) -> s
    }).toMap
    assert(got == exp)
    // a fully-empty frame yields zero partial rows, not a zero matrix
    assert(operators.PcaOps.gramPartials(
      spark.createDataFrame(spark.sparkContext.emptyRDD[
        org.apache.spark.sql.Row], df.schema)).count() == 0L)
  }

  test("powerIter survives the all-zero covariance of a degenerate " +
      "prefix without NaN") {
    val zero = Array.ofDim[Double](Dim, Dim)
    val v = operators.PcaOps.powerIter(zero)
    assert(v.forall(x => !x.isNaN && !x.isInfinite))
    // the guard keeps the init vector e1 rather than poisoning it
    assert(v(0) == 1.0 && v.drop(1).forall(_ == 0.0))
    val (e1, e2) = operators.PcaOps.pcaComponents(zero)
    assert(e1.forall(x => !x.isNaN) && e2.forall(x => !x.isNaN))
  }

  test("pca projections are centered and deterministic") {
    val a = SparkEntry.queries("llm_embedding_pca")(spark, sf).collect()
    val b = SparkEntry.queries("llm_embedding_pca")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    // centered data ⇒ projections sum to ~0 (only micro-round +
    // display-round noise: ≤ 1.5e-6 per row)
    val s1 = a.map(_.getDouble(1)).sum
    val s2 = a.map(_.getDouble(2)).sum
    assert(math.abs(s1) <= 1.5e-6 * a.length, s"p1 not centered: $s1")
    assert(math.abs(s2) <= 1.5e-6 * a.length, s"p2 not centered: $s2")
    // a projection axis is unit-scale: no |p| can exceed the max
    // centered vector norm (≈ 2 for these unit-ish embeddings)
    assert(a.forall(r => math.abs(r.getDouble(1)) < 10 &&
      math.abs(r.getDouble(2)) < 10))
  }
}
