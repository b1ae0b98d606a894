package graft

import org.apache.spark.sql.functions._

/** BPE trainer/tokenizer semantics: independent-reference match,
  * greedy left-to-right overlap handling, tie-breaks, and the
  * train/tokenize consistency contract.
  */
class BpeSpec extends GraftSpec {

  /** Independent reference trainer (plain Scala, no Spark): overlapping
    * position counts, (count DESC, l, r) argmax, greedy LTR rewrite. */
  private def refBpe(words: Map[String, Long], n: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    def apply1(s: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.toSeq
    }
    var seg: Map[String, Seq[String]] =
      words.keys.map(w => w -> w.map(_.toString).toSeq).toMap
    val merges = scala.collection.mutable
      .ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to n if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, s) <- seg; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) =
          counts.getOrElse((s(i), s(i + 1)), 0L) + words(w)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) =
          counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        seg = seg.map { case (w, s) => w -> apply1(s, l, r) }
      }
    }
    (merges.toSeq, seg)
  }

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }

  test("bpe_train matches the independent reference on a crafted corpus") {
    // mixed lengths, shared substrings, a tie candidate pair
    val texts = Seq(
      "stream stream streams streaming batch batch",
      "sort sorted sorting sort stream batch port part",
      "abab abab baba aa")
    val dir = writeDocs(texts)
    val (refM, _) = refBpe(wordFreqs(texts), operators.BpeOps.NMerges)
    val got = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == refM,
      s"trainer drifted from reference:\n got=$got\n exp=$refM")
    // ranks are 1..k contiguous, merged = l || r
    val full = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()
    assert(full.map(_.getInt(0)).toSeq == (1 to full.length))
    assert(full.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("bpe_train counts overlapping positions but merges greedily LTR") {
    // one word "aaaa" ×3: pair (a,a) has THREE positions per word ⇒
    // count 9; the merge rewrites to [aa, aa] (greedy LTR, never
    // [a, aa, a]), so round 2's top pair is (aa, aa) with count 3.
    val dir = writeDocs(Seq("aaaa aaaa aaaa"))
    val got = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.take(2).toSeq ==
      Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)),
      s"greedy-LTR/overlap drift: ${got.toSeq}")
    // after (a,a),(aa,aa) the word is one symbol — trainer stops early
    assert(got.length == 2, s"expected early stop, got ${got.toSeq}")
  }

  test("bpe ops drop the empty words a multi-space corpus splits out") {
    // consecutive/leading/trailing spaces make split() emit "" tokens;
    // untreated they would diverge three ways (Spark's sequence(1,0)
    // DESCENDS → seg ["",""], DuckDB's generate_series(1,0) is empty,
    // the reference has no empty word) — r14 filters w <> '' in both
    // engines, so the trainer must match the reference computed on the
    // non-empty vocabulary
    val texts = Seq(
      "stream  stream   streams batch", // double/triple interior runs
      " sort sorted  sorting sort ",    // leading + trailing
      "abab abab  baba aa")
    val dir = writeDocs(texts)
    val freqs = wordFreqs(texts).filter { case (w, _) => w.nonEmpty }
    val (refM, refSeg) = refBpe(freqs, operators.BpeOps.NMerges)
    val got = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == refM, s"trainer diverged on multi-space corpus:\n$got")
    // tokenize: per-doc word/token counts over NON-empty words only
    val tok = SparkEntry.queries("llm_bpe_tokenize")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expTok = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      i.toLong -> (ws.length.toLong,
        ws.map(w => refSeg(w).length.toLong).sum)
    }.toMap
    assert(tok == expTok, s"tokenize diverged: $tok vs $expTok")
    // vocab: no empty symbol anywhere
    val vocab = SparkEntry.queries("llm_bpe_vocab")(spark, dir).collect()
    assert(vocab.forall(_.getString(0).nonEmpty))
  }

  test("frequency-capped vocab prunes to the top-V words by " +
      "(freq DESC, w) before the merge loop") {
    // the cap (r14, conf spark.graft.bpeVocabCap) bounds the merge
    // loop's vocab-tier input at 100 TB; the capped trainer must equal
    // the reference trainer run on exactly the top-V word set, and
    // must DIFFER from the uncapped run on a corpus built so the
    // pruned tail changes the best pair
    // freqs: zz 6, aaab 5, ccd 4, aab 4, bbe 3 → top-3 by
    // (freq DESC, w ASC) = {zz, aaab, aab} (the freq-4 tie breaks to
    // "aab"); the pruned ccd/bbe pairs change the full run's merges
    val texts = Seq(
      "aaab aaab aaab aaab aaab",
      "ccd ccd ccd ccd",
      "bbe bbe bbe",
      "aab aab", "aab aab",
      "zz zz zz zz zz zz")
    val dir = writeDocs(texts)
    val all = wordFreqs(texts).filter { case (w, _) => w.nonEmpty }
    val cap = 3
    val top = all.toSeq.sortBy { case (w, c) => (-c, w) }.take(cap).toMap
    val (refCapped, _) = refBpe(top, operators.BpeOps.NMerges)
    val (refFull, _) = refBpe(all, operators.BpeOps.NMerges)
    assert(refCapped != refFull,
      "corpus does not discriminate the cap — strengthen the fixture")
    spark.conf.set("spark.graft.bpeVocabCap", cap.toString)
    try {
      val got = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == refCapped,
        s"capped trainer != reference-on-top-$cap:\n$got\n$refCapped")
      // capped tokenize drops OOV words: every counted word is top-V
      val tok = SparkEntry.queries("llm_bpe_tokenize")(spark, dir)
        .collect()
      val expWords = texts.zipWithIndex.flatMap { case (t, i) =>
        val n = t.split(" ").filter(top.contains).length
        if (n == 0) None else Some(i.toLong -> n.toLong)
      }.toMap
      assert(tok.map(r => r.getLong(0) -> r.getLong(1)).toMap == expWords)
    } finally spark.conf.unset("spark.graft.bpeVocabCap")
    // conf unset ⇒ the registered uncapped contract is untouched
    val uncapped = SparkEntry.queries("llm_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(uncapped == refFull)
  }

  test("bpe_train tie-break is (count DESC, left, right)") {
    // "ba" and "ab" both appear exactly twice as adjacent pairs;
    // lexicographic pick must choose (a,b)
    val dir = writeDocs(Seq("ab ab ba ba"))
    val first = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()(0)
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }

  test("bpe_tokenize is consistent with the trained segmentation") {
    val texts = Seq(
      "stream stream streams streaming batch batch",
      "sort sorted sorting sort stream batch port part",
      "abab abab baba aa")
    val dir = writeDocs(texts)
    val (_, refSeg) = refBpe(wordFreqs(texts), operators.BpeOps.NMerges)
    val got = SparkEntry.queries("llm_bpe_tokenize")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = texts.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").toSeq
      i.toLong -> (ws.size.toLong, ws.map(w => refSeg(w).size.toLong).sum)
    }.toMap
    assert(got == exp, s"tokenize drift:\n got=$got\n exp=$exp")
  }

  test("bpe_train matches the reference on randomized corpora " +
      "(property pin: seeded, reproducible)") {
    // small alphabet forces dense pair collisions and real ties —
    // the regime where a tie-break or overlap bug actually flips a
    // merge choice
    val rnd = new scala.util.Random(20260816L)
    (1 to 10).foreach { case_ =>
      val nWords = 4 + rnd.nextInt(12)
      val texts = Seq((1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.mkString(" "))
      val dir = writeDocs(texts)
      val (refM, _) = refBpe(wordFreqs(texts), operators.BpeOps.NMerges)
      val got = SparkEntry.queries("llm_bpe_train")(spark, dir).collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == refM,
        s"case $case_ (corpus ${texts.head}):\n got=$got\n exp=$refM")
    }
  }

  test("bpe_vocab is the reference segmentation's symbol table") {
    val texts = Seq(
      "stream stream streams streaming batch batch",
      "sort sorted sorting sort stream batch port part",
      "abab abab baba aa")
    val dir = writeDocs(texts)
    val wf = wordFreqs(texts)
    val (_, refSeg) = refBpe(wf, operators.BpeOps.NMerges)
    val exp = refSeg.toSeq
      .flatMap { case (w, seg) => seg.map(sym => (sym, w, wf(w))) }
      .groupBy(_._1)
      .map { case (sym, occ) =>
        sym -> (occ.map(_._3).sum, occ.map(_._2).distinct.size.toLong)
      }
    val got = SparkEntry.queries("llm_bpe_vocab")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp, s"vocab drift:\n got=$got\n exp=$exp")
    // merged ⇔ multi-char; ordering is (corpus_freq DESC, symbol)
    val rows = SparkEntry.queries("llm_bpe_vocab")(spark, dir).collect()
    assert(rows.forall(r => r.getBoolean(3) == (r.getString(0).length > 1)))
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("bpe ops are deterministic and sane on the sf corpus") {
    val m1 = SparkEntry.queries("llm_bpe_train")(spark, sf).collect().toSeq
    val m2 = SparkEntry.queries("llm_bpe_train")(spark, sf).collect().toSeq
    assert(m1 == m2)
    assert(m1.size == operators.BpeOps.NMerges)
    val t = SparkEntry.queries("llm_bpe_tokenize")(spark, sf)
    val bad = t.filter(col("n_tokens") < col("n_words") ||
      col("n_tokens") > col("n_words") * 32).count()
    assert(bad == 0, "token counts out of [n_words, 32*n_words]")
  }
}
