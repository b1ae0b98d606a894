package graft

import graft.operators.TrainingDataOps.{LogregK, LogregT}

/** Pins for `llm_quality_logreg` (round 16) — the trained quality
  * classifier. Three claims:
  *
  *  1. The scored frame equals an INDEPENDENT plain-Scala replay —
  *     its own tokenizer (String.split with limit −1, matching Spark's
  *     trailing-empty semantics) and a pure-Long training loop. Any
  *     drift in feature arithmetic, the hard sigmoid, the truncating
  *     divisions, or the sample selection fails this exactly.
  *  2. Teacher agreement strictly beats the majority class — the
  *     student actually learned the committee, it didn't collapse to
  *     the constant predictor (the uncentered-features failure mode
  *     measured in round 16).
  *  3. The 2-of-3 vote committee wires to the teacher column as
  *     declared, pinned on crafted flip docs (the synthetic corpus
  *     never exercises some branches).
  */
class QualityLogregSpec extends GraftSpec {

  private val M = 1000000L
  private val Stops =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  private def clamp(x: Long): Long = math.max(-M, math.min(M, x))

  /** (features, teacher-y) exactly as declared — independent of the
    * op's Column expressions. JVM Long `/` truncates toward zero, the
    * same contract as Spark `div` / DuckDB `//`. */
  private def featsOf(text: String): (Array[Long], Long) = {
    val ws = text.split("[ \n]", -1)
    val nW = ws.length.toLong
    val sumLen = ws.map(_.length.toLong).sum
    val nAlpha = ws.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
    val nSym = ws.count(w => w.contains("#") || w.contains("...")).toLong
    val stopHits = ws.distinct.count(Stops).toLong
    val f = Array(M,
      clamp((math.min(nW, 100L) - 50L) * M / 50L),
      clamp((math.min(stopHits, 2L) - 1L) * M),
      clamp((9L * nW - 2L * sumLen) * M / (9L * nW)),
      clamp((10L * nAlpha - 8L * nW) * M / (10L * nW)),
      clamp((nW - 10L * nSym) * M / nW))
    val votes = (if (nW >= 50L) 1 else 0) +
      (if (stopHits >= 1L) 1 else 0) +
      (if (sumLen * 2L <= nW * 9L) 1 else 0)
    (f, if (votes >= 2) 1L else 0L)
  }

  test("llm_quality_logreg equals an independent plain-Scala replay") {
    val got = SparkEntry.queries("llm_quality_logreg")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3)))
      .toSeq
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val feats = docs.map { case (id, text) =>
      val (f, y) = featsOf(text); (id, f, y)
    }
    val train = feats.filter(_._1 % 5 == 0)
    val w = Array.fill(LogregK)(0L)
    for (_ <- 1 to LogregT) {
      val gs = Array.fill(LogregK)(0L)
      for ((_, f, y) <- train) {
        val z = (0 until LogregK).map(j => w(j) * f(j)).sum / M
        val p = (2L * M + math.max(-2L * M, math.min(2L * M, z))) / 4L
        val err = p - y * M
        for (j <- 0 until LogregK) gs(j) += f(j) * err / M
      }
      for (j <- 0 until LogregK) w(j) -= gs(j) / train.length
    }
    val want = feats.map { case (id, f, y) =>
      val z = (0 until LogregK).map(j => w(j) * f(j)).sum / M
      val p = (2L * M + math.max(-2L * M, math.min(2L * M, z))) / 4L
      (id, p, p >= 500000L, y == 1L)
    }.toSeq
    assert(got == want)
    // the trained model is not the zero model (scores must spread)
    assert(got.map(_._2).distinct.size > 1,
      "degenerate: every doc got the same score")
  }

  test("llm_quality_logreg teacher agreement beats the majority class") {
    val rows = SparkEntry.queries("llm_quality_logreg")(spark, sf)
      .collect()
    val n = rows.length
    val agree = rows.count(r => r.getBoolean(2) == r.getBoolean(3))
    val pos = rows.count(_.getBoolean(3))
    val majority = math.max(pos, n - pos)
    assert(pos > 0 && pos < n,
      s"teacher is one-class on $sf (pos=$pos of $n) — label design broken")
    assert(agree > majority,
      s"student collapsed to a constant: agree=$agree majority=$majority")
  }

  test("llm_quality_logreg teacher is the declared 2-of-3 committee") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_logreg_").toString
    // one doc per vote pattern worth pinning (3, 2, 1, 0 votes)
    val docs = Seq(
      // 0: 60 words, stops, mean len ≈ 4.1 → 3 votes, teacher true
      "the of " + Seq.fill(58)("data").mkString(" "),
      // 1: 10 words with a stop, short mean len → 2 votes, true
      "the " + Seq.fill(9)("data").mkString(" "),
      // 2: 60 long words, no stops → only the length vote, false
      Seq.fill(60)("abcdefghijkl").mkString(" "),
      // 3: 3 long words, no stops → 0 votes, false
      "abcdefghijkl abcdefghijkl abcdefghijkl",
      // 4: exactly 50 words boundary + stop → 3 votes, true
      "the " + Seq.fill(49)("data").mkString(" "),
      // 5: mean-len boundary 2·Σlen = 9·n (n=2, Σ=9: "datadata" + "a")
      //    no stops, < 50 words → 1 vote, false
      "datadata a")
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val teach = SparkEntry.queries("llm_quality_logreg")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(teach == Map(0L -> true, 1L -> true, 2L -> false,
      3L -> false, 4L -> true, 5L -> false))
  }
}
