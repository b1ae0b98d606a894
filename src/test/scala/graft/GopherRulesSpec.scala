package graft

import org.apache.spark.sql.Row

/** Rule-flip pins for `llm_gopher_rules` (round 13): the synthetic
  * corpus carries no '#'/'...'/newlines, so each rule's FAIL branch is
  * exercised here on crafted documents — one doc isolating each rule
  * with every other rule passing, plus a baseline that passes all.
  */
class GopherRulesSpec extends GraftSpec {

  private def run(texts: Seq[String]): Map[Long, Row] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_gopher_")
      .toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("llm_gopher_rules")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  // 60 words, mean len ≈ 4, two stop words, all alphabetic: passes all
  private val baseline = ("the of " + Seq.fill(58)("data").mkString(" "))

  test("llm_gopher_rules: each rule flips gopher_pass in isolation") {
    val docs = Seq(
      baseline, // 0: pass
      "the of " + Seq.fill(8)("data").mkString(" "), // 1: <50 words
      "the of " + Seq.fill(58)("a").mkString(" "), // 2: mean len < 3
      "the of " + Seq.fill(58)("abcdefghijkl").mkString(" "), // 3: >10
      // 4: 7 '#' words in 60 → 70 > 60 symbol fail
      "the of " + Seq.fill(7)("#").mkString(" ") + " " +
        Seq.fill(51)("data").mkString(" "),
      // 5: 10 lines, 9 bullet-led → 90 ≥ 90 fail (each line 6 words)
      (Seq.fill(9)("- " + Seq.fill(5)("data").mkString(" ")) :+
        ("the of " + Seq.fill(4)("data").mkString(" "))).mkString("\n"),
      // 6: 10 lines, 4 ellipsis-ended → 40 > 30 fail
      (Seq.fill(4)("the of data data data...") ++
        Seq.fill(6)(Seq.fill(6)("data").mkString(" "))).mkString("\n"),
      // 7: 20 numeric words of 60 → alpha 400 < 480 fail
      "the of " + Seq.fill(20)("123").mkString(" ") + " " +
        Seq.fill(38)("data").mkString(" "),
      // 8: only one stop word
      "the " + Seq.fill(59)("data").mkString(" "))
    val out = run(docs)
    val pass = out.view.mapValues(_.getAs[Boolean]("gopher_pass")).toMap
    assert(pass(0L), "baseline must pass")
    (1L to 8L).foreach(i => assert(!pass(i), s"doc $i must fail"))

    // signal spot-checks on the crafted fails
    assert(out(4L).getAs[Long]("n_sym") == 7L)
    assert(out(5L).getAs[Long]("n_bullet") == 9L &&
      out(5L).getAs[Long]("n_lines") == 10L)
    assert(out(6L).getAs[Long]("n_ellipsis") == 4L)
    assert(out(7L).getAs[Long]("n_alpha") == 40L)
    assert(out(8L).getAs[Int]("stop_hits") == 1)
    assert(out(2L).getAs[Double]("mean_word_len") < 3.0)
    assert(out(3L).getAs[Double]("mean_word_len") > 10.0)
  }

  test("llm_gopher_rules: boundary arithmetic is integer-exact") {
    // exactly 50 words (boundary passes), symbol ratio exactly 0.1
    // (6 of 60 → 60 ≤ 60 passes), ellipsis exactly 0.3 (3 of 10
    // lines → 30 ≤ 30 passes), bullets just under 0.9 (8 of 10 →
    // 80 < 90 passes)
    val docs = Seq(
      "the of " + Seq.fill(48)("data").mkString(" "), // 50 words
      "the of " + Seq.fill(6)("#").mkString(" ") + " " +
        Seq.fill(52)("data").mkString(" "), // 6 sym in 60
      (Seq.fill(3)("the of data data...") ++
        Seq.fill(7)(Seq.fill(6)("data").mkString(" "))).mkString("\n"),
      (Seq.fill(8)("- " + Seq.fill(5)("data").mkString(" ")) ++
        Seq.fill(2)("the of data data data data")).mkString("\n"))
    val out = run(docs)
    (0L to 3L).foreach(i =>
      assert(out(i).getAs[Boolean]("gopher_pass"), s"doc $i boundary"))
  }
}
