package graft

import org.apache.spark.sql.functions._

/** Semantics of the non-oracle training-data ops: simhash invariants,
  * rolling-hash fingerprints, IVF recall vs brute force, multimodal
  * plumbing shape.
  */
class TrainingDataSpec extends GraftSpec {

  test("simhash: identical texts get identical fingerprints, hamming 0") {
    val a = functions.SimHash.fingerprint(Seq("x", "y", "z", "x"))
    val b = functions.SimHash.fingerprint(Seq("x", "y", "z", "x"))
    val c = functions.SimHash.fingerprint(Seq("q", "r", "s", "t", "u", "v"))
    assert(a == b)
    assert(java.lang.Long.bitCount(a ^ c) > 0)
    // order-free: votes commute
    assert(functions.SimHash.fingerprint(Seq("y", "x", "x", "z")) == a)
  }

  test("embedding neardup + topk_pairs: exact-collapse expansion matches brute force on a dup-heavy corpus") {
    // The round-6 collapse rework runs the pair machinery on DISTINCT
    // vectors and reconstructs replica answers by expansion — but the
    // stock SFs carry few exact-duplicate embeddings, so this corpus
    // exercises the expansion arithmetic directly: 8 base directions
    // replicated into groups of size 1..8, ids interleaved so group
    // reps are NOT contiguous. Truth is brute-force n² computed here.
    import spark.implicits._
    val dim = 8
    val base = (0 until 8).map { g =>
      Array.tabulate(dim)(j =>
        (math.sin(g * 1.7 + j) + (if (j == g % dim) 2.0 else 0.0)).toFloat)
    }
    // member ids: vec g gets ids {g, g+10, g+20, ...} (g+1 members)
    val rows = for (g <- 0 until 8; m <- 0 to g)
      yield (g.toLong + m * 10L, base(g), s"l${g % 3}")
    val dir = java.nio.file.Files.createTempDirectory("graft_dup_emb_")
      .toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def cos6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = rows.map(r => r._1 -> r._2).toMap
    val ids = rows.map(_._1).sorted

    // neardup truth: dup_of(x) = least y < x with cos6 >= 0.4
    val truthDup = ids.map { x =>
      x -> ids.filter(y => y < x && cos6(byId(x), byId(y)) >= 0.4)
        .minOption
    }.toMap
    val gotDup = SparkEntry.queries("llm_embedding_neardup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(gotDup == truthDup,
      s"neardup expansion drifted from brute force:\n got=$gotDup\n exp=$truthDup")

    // topk truth: top-20 pairs by (cos6 desc, id, id2)
    val allPairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j), cos6(byId(ids(i)), byId(ids(j))))
    val truthTop = allPairs.sortBy { case (a, b, s2) => (-s2, a, b) }.take(20)
    val gotTop = SparkEntry.queries("llm_embedding_topk_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(gotTop == truthTop,
      s"topk expansion drifted from brute force:\n got=$gotTop\n exp=$truthTop")
  }

  test("simhash dedup candidates are deterministic across runs") {
    val r1 = SparkEntry.queries("llm_simhash_dedup")(spark, sf).collect().toSeq
    val r2 = SparkEntry.queries("llm_simhash_dedup")(spark, sf).collect().toSeq
    assert(r1 == r2)
    // every candidate pair is a same-lang, size-blocked pair with ham ≤ 3
    r1.foreach(r => assert(r.getInt(2) <= 3))
  }

  test("rolling-hash fingerprint: equal texts collide, others don't") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(functions.RollingHash.full(t) == functions.RollingHash.full(t))
    assert(functions.RollingHash.full(t) !=
      functions.RollingHash.full(t + " again"))
    // window-min is stable under suffix growth beyond the window
    val wm = functions.RollingHash.windowMin(t, 16)
    assert(wm == functions.RollingHash.windowMin(t, 16))
    val fps = SparkEntry.queries("llm_fingerprint")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(fps.length == docs)
    // duplicate texts (engineered in the corpus) must share fp64
    val dupTexts = Tables.documents(spark, sf)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1).select(explode(col("ids"))).collect()
      .map(_.getLong(0)).toSet
    if (dupTexts.nonEmpty) {
      val byDoc = fps.map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dupFps = Tables.documents(spark, sf)
        .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1).collect()
      dupFps.foreach { row =>
        val ids = row.getSeq[Long](1)
        assert(ids.map(byDoc).distinct.size == 1,
          s"duplicate texts ${ids} got different fingerprints")
      }
    }
  }

  test("llm_embedding_neardup: keep-first invariants hold") {
    val rows = SparkEntry.queries("llm_embedding_neardup")(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val kept = r.getBoolean(1)
      // kept ⇔ no representative; a representative always has a smaller id
      assert(kept == r.isNullAt(2))
      if (!kept) assert(r.getLong(2) < r.getLong(0))
    }
    // the least vec_id can never be dropped (nothing precedes it)
    val minId = rows.map(_.getLong(0)).min
    assert(rows.find(_.getLong(0) == minId).get.getBoolean(1))
  }

  test("llm_embedding_neardup: 0.4 cutoff sits off-grid at ALL scale factors") {
    // The kept/dup verdict flips iff the two engines round a pair's
    // cosine differently across the cutoff, i.e. iff the RAW cosine sits
    // within the cross-engine drift of the 6-dp rounding boundary
    // 0.3999995 (round(cos,6) >= 0.4 ⟺ cos >= 0.3999995). Both engines
    // cast the same floats to double and sum 64 exact products, so the
    // only drift is summation order — bounded by ~n·eps·Σ|terms| ≈ 1e-12.
    // Assert every pair's raw cosine clears the boundary by ≥ 1e-6, six
    // orders above that bound. (Measured floor: ~1e-5 at sf0.1 — a 1e-4
    // rounded-value margin, as round-2 ADVICE suggested, does not exist
    // on this corpus.)
    graft.functions.CosineSimilarity.register(spark)
    import org.apache.spark.sql.functions._
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val margin = emb.select(col("vec_id"), col("embedding").as("v1"))
        .crossJoin(broadcast(emb.select(col("vec_id").as("vec_id2"),
          col("embedding").as("v2"))))
        .filter(col("vec_id") < col("vec_id2"))
        .select(min(abs(expr("cosine_sim(v1, v2)") - 0.3999995)).as("m"))
        .head().getDouble(0)
      info(s"$d: min |raw cos - boundary| = $margin")
      assert(margin >= 1e-6,
        s"$d: a raw cosine is within $margin of the rounding boundary")
    }
  }

  test("llm_embedding_lsh: precision 1, recall vs brute truth, determinism") {
    graft.functions.CosineSimilarity.register(spark)
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    // brute-force truth over exact-dedup representatives (the op's own
    // stage-0 rule: min vec_id per identical vector)
    val reps = emb.withColumn("rep", min(col("vec_id"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("embedding"))))
      .filter(col("vec_id") === col("rep"))
      .select(col("vec_id"), col("embedding"))
    val truth = reps.select(col("vec_id"), col("embedding").as("v1"))
      .crossJoin(broadcast(reps.select(col("vec_id").as("vec_id2"),
        col("embedding").as("v2"))))
      .filter(col("vec_id") < col("vec_id2"))
      .filter(round(expr("cosine_sim(v1, v2)"), 6) >= 0.4)
      .select("vec_id", "vec_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus has no near-dup pairs to measure recall on")
    val out = SparkEntry.queries("llm_embedding_lsh")(spark, sf).collect()
    val lsh = out.filter(_.getString(3) == "lsh")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification stage makes every emitted lsh pair true — precision 1
    assert(lsh.subsetOf(truth), s"false positives: ${lsh -- truth}")
    val recall = lsh.count(truth.contains).toDouble / truth.size
    info(s"cosine-LSH recall = $recall over ${truth.size} truth pairs")
    assert(recall >= 0.4, s"cosine-LSH recall = $recall vs ${truth.size} truth pairs")
    // exact stage re-emits identical-vector replicas with their keeper
    out.filter(_.getString(3) == "exact").foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) == 1.0)
    }
    val again = SparkEntry.queries("llm_embedding_lsh")(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("llm_ann_ivf recall@5 >= 0.5 vs brute-force truth") {
    val brute = SparkEntry.queries("llm_cosine_topk")(spark, sf)
      .select("vec_id", "vec_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("llm_ann_ivf")(spark, sf)
      .select("vec_id", "vec_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }

  test("llm_ann_lsh recall@5 vs brute-force truth; deterministic") {
    val brute = SparkEntry.queries("llm_cosine_topk")(spark, sf)
      .select("vec_id", "vec_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("llm_ann_lsh")(spark, sf)
      .select("vec_id", "vec_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = brute.count(lsh.contains).toDouble / brute.size
    info(s"LSH ANN recall@5 = $recall over ${brute.size} truth pairs")
    assert(recall >= 0.6, s"LSH ANN recall@5 = $recall")
    val again = SparkEntry.queries("llm_ann_lsh")(spark, sf)
      .select("vec_id", "vec_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == again, "llm_ann_lsh not deterministic across runs")
  }

  test("mm_decode_features: schema, determinism, and full coverage") {
    val out = SparkEntry.queries("mm_decode_features")(spark, sf)
    assert(out.columns.toSeq ==
      Seq("doc_id", "fmt", "n_bytes", "width", "height", "features"))
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      // features serialized at the output boundary (comma-joined 6-dp strings)
      val feats = r.getString(5).split(",").map(_.toDouble)
      assert(feats.length == 8)
      assert(math.abs(feats.sum - 1.0) < 1e-3) // histogram
      assert(r.getInt(2) > 0)
    }
    val again = SparkEntry.queries("mm_decode_features")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("mm_resize: fixed output dims, renormalized features, deterministic") {
    val out = SparkEntry.queries("mm_resize")(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getInt(3) == 32 && r.getInt(4) == 32)
      assert(r.getString(5).split(",").length == 8)
    }
    val again = SparkEntry.queries("mm_resize")(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("mm_frame_sample: stride coverage, contiguous indices, deterministic") {
    val out = SparkEntry.queries("mm_frame_sample")(spark, sf).collect()
    assert(out.nonEmpty)
    // per-doc frame indices are 0..n-1 with no gaps
    out.groupBy(_.getLong(0)).foreach { case (_, frames) =>
      val idx = frames.map(_.getInt(1)).sorted.toSeq
      assert(idx == (0 until idx.length))
    }
    // a doc's frame count matches its payload length and the stride
    val lens = Tables.documents(spark, sf)
      .selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    out.groupBy(_.getLong(0)).foreach { case (doc, frames) =>
      val expected = math.ceil(
        math.max(lens(doc) - 15, 0) / (16.0 * 4)).toInt
      assert(frames.length == expected,
        s"doc $doc: ${frames.length} frames, expected $expected")
    }
    val again = SparkEntry.queries("mm_frame_sample")(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("mm_phash_dedup equals the brute-force independent replay, and " +
      "the pigeonhole banding loses nothing") {
    // independent truth: plain-Scala aHash per doc + O(n²) pair scan
    // with the contract's admissibility (same fmt, |Δlen| ≤ 16,
    // hamming ≤ 3) — no banding, so the comparison also proves the
    // 4×16-bit block join is lossless at this threshold
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def hash(t: String): Long = {
      val b = t.getBytes("UTF-8"); val len = b.length
      if (len == 0) 0L
      else {
        val cnt = new Array[Long](64)
        b.foreach(x => cnt((x & 0xff) % 64) += 1)
        (0 until 64).foldLeft(0L)((h, k) =>
          if (cnt(k) * 64 > len) h | (1L << k) else h)
      }
    }
    val ph = docs.map { case (id, fmt, t) =>
      (id, fmt, t.getBytes("UTF-8").length, hash(t)) }
    val exp = (for {
      x <- ph; y <- ph
      if y._1 > x._1 && y._2 == x._2 && math.abs(y._3 - x._3) <= 16
      ham = java.lang.Long.bitCount(x._4 ^ y._4)
      if ham <= 3
    } yield (x._1, y._1, ham)).sorted.toSeq
    val got = SparkEntry.queries("mm_phash_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == exp, s"phash pairs drifted: got ${got.size}, " +
      s"expected ${exp.size}")
    assert(exp.nonEmpty, "degenerate fixture: no near-dup pairs at all")
    // identical payloads must pair at hamming 0 (crafted check)
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phash_").toString
    Seq((1L, "aaabbbcccddd", "en", "imgs", 12L),
        (2L, "aaabbbcccddd", "en", "imgs", 12L),
        (3L, "zzzzyyyyxxxx", "en", "imgs", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val crafted = SparkEntry.queries("mm_phash_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(crafted.contains((1L, 2L, 0)),
      s"identical payloads not paired: ${crafted.toSeq}")
  }

  test("phashPairs blocking is pluggable: a dimension-blocked variant " +
      "equals its brute-force replay (r15; registered op unchanged)") {
    // Real decoded assets block on DIMENSIONS, not payload bytes — the
    // registered op's (n_bytes, 16) key is one instance of
    // PhashBlocking (Multimodal.scala); this pins the lifted parameter
    // with a width-blocked variant (|Δwidth| ≤ 2 over the decode
    // stub's fake dims) against an O(n²) no-banding replay.
    import spark.implicits._
    import operators.Multimodal
    def phOf(d: String) = Tables.documents(spark, d)
      .select(col("doc_id"), col("source").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[Multimodal.MmAsset]
      .map { a =>
        val f = Multimodal.decode(a)
        val p = Multimodal.phash(a)
        (p.doc_id, p.fmt, f.width, p.fp)
      }.toDF("doc_id", "fmt", "width", "fp")
    val ph = phOf(sf)
    val rows = ph.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val exp = (for {
      x <- rows; y <- rows
      if y._1 > x._1 && y._2 == x._2 && math.abs(y._3 - x._3) <= 2
      ham = java.lang.Long.bitCount(x._4 ^ y._4)
      if ham <= 3
    } yield (x._1, y._1, ham)).sorted.toSeq
    val got = Multimodal.phashPairs(ph,
        Multimodal.PhashBlocking(col("width"), 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq
    assert(got == exp, s"width-blocked pairs drifted: got ${got.size}, " +
      s"expected ${exp.size}")
    assert(exp.nonEmpty, "degenerate fixture: no width-blocked pairs")
    // crafted discriminator: identical byte DISTRIBUTIONS at lengths
    // 100 vs 164 share the fp (threshold cnt·64 > len is invariant
    // under exact repetition) and the fake width (16 + len % 64), so
    // the dimension key admits the pair while the byte key (|Δ| = 64
    // > 16) rejects it — the blocking genuinely changed admissibility
    val dir = java.nio.file.Files
      .createTempDirectory("graft_phash_blk_").toString
    Seq((1L, "abcd" * 25, "en", "imgs", 100L),
        (2L, "abcd" * 41, "en", "imgs", 164L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val wPairs = Multimodal.phashPairs(phOf(dir),
        Multimodal.PhashBlocking(col("width"), 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(wPairs.contains((1L, 2L)),
      s"dimension blocking missed the same-width pair: ${wPairs.toSeq}")
    val bPairs = SparkEntry.queries("mm_phash_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!bPairs.contains((1L, 2L)),
      "byte blocking admitted a |Δn_bytes| = 64 pair — window broken")
  }

  test("phashVerdictsCore blocking is pluggable: the dimension-blocked " +
      "variant equals its brute-force replay (r16; one admissibility copy)") {
    // The streaming twin's verdicts core goes through the SAME
    // admissibleMeet copy as the batch pairs face — this pins the
    // row-scale (batch-vs-index) path under the width blocking, so a
    // future edit cannot fork the streaming admissibility from the
    // batch one without tripping a spec.
    import spark.implicits._
    import operators.Multimodal
    val ph = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source").as("fmt"),
        col("text").cast("binary").as("payload"))
      .as[Multimodal.MmAsset]
      .map { a =>
        val f = Multimodal.decode(a)
        val p = Multimodal.phash(a)
        (p.doc_id, p.fmt, f.width, p.fp)
      }.toDF("doc_id", "fmt", "width", "fp")
    val batch = ph.filter(pmod(col("doc_id"), lit(3L)) === 0)
    val index = ph.filter(pmod(col("doc_id"), lit(3L)) =!= 0)
    val got = Multimodal.phashVerdictsCore(batch, index,
        Multimodal.PhashBlocking(col("width"), 2))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).sortBy(_._1).toSeq
    val rows = ph.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val exp = rows.filter(_._1 % 3 == 0).sortBy(_._1).map { x =>
      val cands = rows.filter(y => y._1 < x._1 && y._2 == x._2 &&
        math.abs(y._3 - x._3) <= 2 &&
        java.lang.Long.bitCount(x._4 ^ y._4) <= 3).map(_._1)
      val dup = if (cands.isEmpty) None else Some(cands.min)
      (x._1, x._2, if (dup.isDefined) "band_dup" else "kept", dup)
    }.toSeq
    assert(got == exp, s"width-blocked verdicts drifted: got ${got.size}, " +
      s"expected ${exp.size}")
    assert(exp.exists(_._3 == "band_dup") && exp.exists(_._3 == "kept"),
      "degenerate fixture: width-blocked verdicts do not split")
  }

  test("mm_phash_incremental equals the brute-force asymmetric replay") {
    // per NEW asset (doc_id % 100 >= 80): dup_of = min admissible
    // candidate among OLD assets and EARLIER new ones — the group
    // collapse and banding are optimizations the replay need not share
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def hash(t: String): Long = {
      val b = t.getBytes("UTF-8"); val len = b.length
      if (len == 0) 0L
      else {
        val cnt = new Array[Long](64)
        b.foreach(x => cnt((x & 0xff) % 64) += 1)
        (0 until 64).foldLeft(0L)((h, k) =>
          if (cnt(k) * 64 > len) h | (1L << k) else h)
      }
    }
    val ph = docs.map { case (id, fmt, t) =>
      (id, fmt, t.getBytes("UTF-8").length, hash(t),
        id % 100 >= 80) }
    val exp = ph.filter(_._5).sortBy(_._1).map { x =>
      val cands = ph.filter(y => y._1 != x._1 && y._2 == x._2 &&
        math.abs(y._3 - x._3) <= 16 &&
        java.lang.Long.bitCount(x._4 ^ y._4) <= 3 &&
        (!y._5 || y._1 < x._1)).map(_._1)
      val dup = if (cands.isEmpty) None else Some(cands.min)
      (x._1, x._2, if (dup.isDefined) "band_dup" else "kept", dup)
    }.toSeq
    val got = SparkEntry.queries("mm_phash_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == exp,
      s"incremental phash drifted: got ${got.size}, exp ${exp.size}")
    assert(exp.exists(_._3 == "band_dup") && exp.exists(_._3 == "kept"),
      "degenerate fixture: verdicts do not split")
  }

  test("mm_phash_clusters equals the brute-force walk of the " +
      "horizon-free dup forest (r15)") {
    // independent truth: plain-Scala aHash → dup_of(n) = min admissible
    // candidate < n (no banding, no group collapse) → chain-walk each
    // doc to its root — pins both the gid-minimality theorem (group-
    // scale candidate derivation ≡ the direct min) and the closure
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def hash(t: String): Long = {
      val b = t.getBytes("UTF-8"); val len = b.length
      if (len == 0) 0L
      else {
        val cnt = new Array[Long](64)
        b.foreach(x => cnt((x & 0xff) % 64) += 1)
        (0 until 64).foldLeft(0L)((h, k) =>
          if (cnt(k) * 64 > len) h | (1L << k) else h)
      }
    }
    val ph = docs.map { case (id, fmt, t) =>
      (id, fmt, t.getBytes("UTF-8").length, hash(t)) }
    val dupOf = ph.map { x =>
      val cands = ph.filter(y => y._1 < x._1 && y._2 == x._2 &&
        math.abs(y._3 - x._3) <= 16 &&
        java.lang.Long.bitCount(x._4 ^ y._4) <= 3).map(_._1)
      x._1 -> (if (cands.isEmpty) None else Some(cands.min))
    }.toMap
    def root(id: Long): Long =
      dupOf(id) match { case Some(p) => root(p); case None => id }
    val exp = ph.map(_._1).sorted.map(id => (id, root(id))).toSeq
    val got = SparkEntry.queries("mm_phash_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == exp, s"phash clusters drifted: got ${got.size}, " +
      s"exp ${exp.size}")
    // sanity: clusters are non-trivial and labels never exceed members
    assert(exp.exists { case (id, c) => c != id },
      "degenerate fixture: every doc its own cluster")
    assert(got.forall { case (id, c) => c <= id })
  }

  test("mm_phash_keep_best keeps exactly the per-cluster quality " +
      "argmax (n_bytes DESC, doc_id ASC) (r15)") {
    // builds on the clusters pin above: recompute clusters from the
    // registered op (already proven vs brute force), then check the
    // keeper flag against an independent per-cluster argmax
    val cl = SparkEntry.queries("mm_phash_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("mm_phash_keep_best")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3)))
    assert(got.map(t => t._1 -> t._2).toMap == cl,
      "keep_best cluster labels drifted from mm_phash_clusters")
    val best = got.groupBy(_._2).map { case (c, ms) =>
      c -> ms.minBy(m => (-m._3, m._1))._1
    }
    got.foreach { case (id, c, _, keep) =>
      assert(keep == (best(c) == id),
        s"keeper flag wrong for doc $id in cluster $c")
    }
    // exactly one keeper per cluster, and the fixture discriminates
    // quality: some cluster's keeper is NOT its minimal member
    assert(got.filter(_._4).map(_._2).distinct.length ==
      got.map(_._2).distinct.length)
    assert(got.exists { case (id, c, _, keep) => keep && id != c },
      "degenerate fixture: every keeper is the cluster label " +
        "(quality never discriminated)")
  }

  test("llm_hybrid_rrf equals the independent dense+sparse fusion " +
      "replay (r15)") {
    // independent truth at sf: exact cosine ranks (6-dp, id ties) and
    // distinct-token Jaccard ranks recomputed in plain Scala, top-50
    // shortlists fused by RRF(60), top-5 per query by (rrf DESC, id)
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val txt = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = emb.keySet.toSeq.sorted
    val qs = ids.filter(_ < 10)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def shortlist(scores: Seq[(Long, Double)]): Map[Long, Int] =
      scores.sortBy { case (id, s) => (-s, id) }.take(50)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val exp = qs.flatMap { q =>
      val dRanks = shortlist(ids.filter(_ != q).map(c => c ->
        rnd6(dot(emb(q), emb(c)) /
          (math.sqrt(dot(emb(q), emb(q))) *
            math.sqrt(dot(emb(c), emb(c)))))))
      val qTok = txt(q).split(" ", -1).distinct.toSet
      val sRanks = shortlist(ids.filter(_ != q).map { c =>
        val cTok = txt(c).split(" ", -1).distinct.toSet
        val inter = (qTok & cTok).size
        c -> inter.toDouble / (qTok.size + cTok.size - inter)
      })
      (dRanks.keySet ++ sRanks.keySet).toSeq.map { c =>
        val rrf = dRanks.get(c).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          sRanks.get(c).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, c, dRanks.get(c), sRanks.get(c), rrf)
      }.sortBy { case (_, c, _, _, rrf) => (-rrf, c) }.take(5)
        .zipWithIndex.map { case ((qq, c, rd, rs, rrf), i) =>
          (qq, c, rd, rs, rrf, i + 1) }
    }
    val got = SparkEntry.queries("llm_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5))).toSeq
    assert(got == exp, s"rrf fusion drifted:\n got ${got.take(6)}\n " +
      s"exp ${exp.take(6)}")
    // the fusion is non-trivial: some top-5 doc is single-list
    assert(exp.exists(e => e._3.isEmpty || e._4.isEmpty),
      "degenerate fixture: every fused doc in both shortlists")
  }

  test("llm_hybrid_rrf_ann: fusion properties hold and the hybrid " +
      "loses less to ANN than the dense-only path does (r16)") {
    // ADJUDICATION of the r15 brief's literal pin ("fused recall >= the
    // dense-only llm_ann_recall baseline"): measured, it is FALSE at
    // all three SFs (e.g. 22 vs 28 hits at sf0.001) — and false by
    // construction, because llm_ann_recall's truth IS the exact dense
    // ranking, so any lexical signal the fusion adds can only displace
    // dense-true hits. The meaningful acceptance inequality, pinned
    // here instead: each retrieval stack measured against ITS OWN
    // exact counterpart — the ANN-backed hybrid vs the exact-dense-leg
    // fusion, and dense-only IVF vs exact cosine (llm_ann_recall).
    // The hybrid retains MORE of its exact truth (38 vs 28 hits at
    // sf0.001): the sparse leg is exact in both stacks and anchors the
    // fused ranking, so fusion is more robust to ANN approximation
    // than the dense leg alone — the reason the 100 TB deployment
    // shape is hybrid.
    import operators.AnnOps
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val txt = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = emb.keySet.toSeq.sorted
    val qs = ids.filter(_ < 10)
    val corpus = ids.filter(txt.contains)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def shortlist[S](scores: Seq[(Long, S)])(implicit o: Ordering[S])
        : Map[Long, Int] =
      scores.sortBy { case (id, s) => (s, id) }(
          Ordering.Tuple2(o.reverse, Ordering.Long))
        .take(AnnOps.ShortK)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // exact BM25 leg (identical in both stacks): per-term 6-dp scores
    // summed as micro-unit longs, the op's arithmetic verbatim
    val dlM = corpus.map(c => c -> txt(c).split(" ", -1).length).toMap
    val nDocs = corpus.size
    val sumDl = dlM.values.map(_.toLong).sum
    val tfM = corpus.map(c => c ->
      txt(c).split(" ", -1).groupBy(identity)
        .map { case (t, a) => t -> a.length }).toMap
    def bm25Ranks(q: Long): Map[Long, Int] = {
      val qTerms = txt(q).split(" ", -1).distinct
      val df = qTerms.map(t =>
        t -> corpus.count(c => tfM(c).contains(t))).toMap
      shortlist(corpus.filter(_ != q).flatMap { c =>
        val su = qTerms.flatMap { t =>
          tfM(c).get(t).map { tf =>
            val idf = rnd6(math.log(
              (nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0))
            math.round(rnd6(idf * (tf * 2.2) /
              (tf + 1.2 * (1.0 - 0.75 +
                0.75 * (dlM(c).toLong * nDocs).toDouble / sumDl)))
              * 1e6)
          }
        }.sum
        if (su == 0L && qTerms.forall(t => !tfM(c).contains(t))) None
        else Some(c -> su)
      })
    }
    def denseExactRanks(q: Long): Map[Long, Int] =
      shortlist(ids.filter(_ != q).map(c => c ->
        rnd6(dot(emb(q), emb(c)) /
          (math.sqrt(dot(emb(q), emb(q))) *
            math.sqrt(dot(emb(c), emb(c)))))))
    def fuseTop5(d: Map[Long, Int], sp: Map[Long, Int]): Seq[Long] =
      (d.keySet ++ sp.keySet).toSeq.map { c =>
        c -> (d.get(c).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          sp.get(c).map(r => 1.0 / (60 + r)).getOrElse(0.0))
      }.sortBy { case (c, rrf) => (-rrf, c) }.take(AnnOps.TopK)
        .map(_._1)
    val truth = qs.flatMap(q =>
      fuseTop5(denseExactRanks(q), bm25Ranks(q)).map(q -> _)).toSet
    val got = SparkEntry.queries("llm_hybrid_rrf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5))).toSeq
    // shape + rrf arithmetic recomputes from the reported ranks
    assert(got.map(r => (r._1, r._6)).sorted ==
      qs.flatMap(q => (1 to AnnOps.TopK).map(q -> _)).sorted,
      "not TopK rows per query")
    got.foreach { case (_, _, rd, rs, rrf, _) =>
      val expRrf = rd.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rs.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(rrf == expRrf, s"rrf drifted: $rrf vs $expRrf")
      assert(rd.isDefined || rs.isDefined, "candidate from no shortlist")
    }
    // RRF dominance bound: with ranks <= ShortK and the 60 constant,
    // 2/(60+ShortK) > 1/61, so every both-lists candidate outranks
    // every single-list one — the both-rows form a per-query rn prefix
    got.groupBy(_._1).foreach { case (q, rows) =>
      val bothRns = rows.filter(r => r._3.isDefined && r._4.isDefined)
        .map(_._6)
      val singleRns = rows.filter(r => r._3.isEmpty || r._4.isEmpty)
        .map(_._6)
      if (bothRns.nonEmpty && singleRns.nonEmpty)
        assert(bothRns.max < singleRns.min,
          s"q=$q: single-list row outranked a both-lists row")
    }
    val fusedHits = got.map(r => (r._1, r._2)).count(truth.contains)
    val denseHits = SparkEntry.queries("llm_ann_recall")(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(fusedHits >= denseHits,
      s"hybrid lost more to ANN ($fusedHits) than dense-only did " +
        s"($denseHits) — the sparse anchor stopped working")
    // and the evaluation is informative: neither stack is lossless
    assert(fusedHits < qs.size * AnnOps.TopK,
      "degenerate fixture: ANN-backed fusion is exact")
  }

  test("llm_dedup_clusters: roots are self-labeled, labels never exceed ids") {
    val rows = SparkEntry.queries("llm_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val label = rows.toMap
    rows.foreach { case (doc, cl) =>
      assert(cl <= doc, s"cluster id $cl exceeds doc $doc")
      assert(label(cl) == cl, s"root $cl of $doc is not self-labeled")
    }
    // exact duplicates (identical text) must land in the same cluster
    val sameText = Tables.documents(spark, sf)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1).collect()
    sameText.foreach { r =>
      val ids = r.getSeq[Long](1)
      assert(ids.map(label).distinct.size == 1,
        s"identical texts $ids split across clusters")
    }
  }

  test("llm_pack_greedy: bins respect the budget and the greedy order") {
    val rows = SparkEntry.queries("llm_pack_greedy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val byBin = docs.groupBy(_._4)
      // capacity: a bin only exceeds 512 if it is a single oversized doc
      byBin.foreach { case (_, ds) =>
        val total = ds.map(_._3).sum
        assert(total <= 512 || ds.length == 1, s"overfull bin: $ds")
      }
      // greedy order: bins numbered contiguously from 0 in doc_id order
      val binSeq = docs.sortBy(_._1).map(_._4).toSeq
      assert(binSeq.head == 0L)
      binSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b == a || b == a + 1, s"bin jump $a -> $b")
        case _ => ()
      }
    }
    val again = SparkEntry.queries("llm_pack_greedy")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("llm_lang_id beats uniform-guess accuracy") {
    val out = SparkEntry.queries("llm_lang_id")(spark, sf).collect()
    val acc = out.count(_.getBoolean(3)).toDouble / out.length
    // 5 balanced classes → uniform guessing ≈ 0.2
    assert(acc > 0.25, s"lang-id accuracy $acc not above chance")
  }

  test("llm_chunk_windows: chunk count, lengths, and coverage per doc") {
    val chunks = SparkEntry.queries("llm_chunk_windows")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getString(4)))
    val nTokens = Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) AS nt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val nt = nTokens(doc)
      val expected = if (nt <= 32) 1L else math.ceil((nt - 32) / 24.0).toLong + 1
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks, want $expected")
      // indices contiguous from 0; every chunk non-empty; window arithmetic
      assert(cs.map(_._2).sorted.toSeq == (0L until expected))
      cs.foreach { case (_, k, len, head) =>
        assert(len > 0 && len <= 32)
        assert(len == math.min(nt - k * 24, 32), s"doc $doc chunk $k len $len")
        assert(head != null)
      }
    }
  }

  test("llm_mix_weights: rates realize the 3:1 target and gating is exact") {
    val rows = SparkEntry.queries("llm_mix_weights")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    // sources are uniform 25-doc domains: odd-numbered keep everything
    // (rate 1), even-numbered keep at rate 1/3
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val odd = src.stripPrefix("src").toInt % 2 == 1
      val rate = docs.head._3
      assert(docs.forall(_._3 == rate))
      if (odd) {
        assert(rate == 1.0 && docs.forall(_._4), s"$src should keep all")
      } else {
        assert(math.abs(rate - 1.0 / 3) < 1e-6, s"$src rate $rate")
        assert(docs.exists(_._4) && docs.exists(!_._4), s"$src gating degenerate")
      }
    }
  }

  test("llm_dedup_audit: stage precedence, forest edges, pipeline agreement") {
    val rows = SparkEntry.queries("llm_dedup_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.length == Tables.documents(spark, sf).count())
    val stages = Set("exact_dup", "near_dup", "crosslang_dup",
      "embedding_dup", "kept")
    rows.foreach { case (doc, stage, dupOf) =>
      assert(stages.contains(stage), s"doc $doc unknown stage $stage")
      // kept ⇔ no representative; a representative always precedes
      assert((stage == "kept") == dupOf.isEmpty, s"doc $doc $stage $dupOf")
      dupOf.foreach(d => assert(d < doc, s"doc $doc dup_of $d not earlier"))
    }
    // stages 1–2 are llm_dedup_pipeline's rules verbatim, so the two ops
    // must agree on every exact_dup/near_dup verdict (later stages only
    // reclassify docs the pipeline KEPT)
    val pipeline = SparkEntry.queries("llm_dedup_pipeline")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    rows.foreach { case (doc, stage, _) =>
      val p = pipeline(doc)
      if (p == "exact_dup" || p == "near_dup")
        assert(stage == p, s"doc $doc: audit=$stage pipeline=$p")
      else
        assert(stage != "exact_dup" && stage != "near_dup",
          s"doc $doc: audit=$stage but pipeline kept it")
    }
  }

  test("llm_dedup_incremental: only new docs judged, keepers precede or pre-exist") {
    val rows = SparkEntry.queries("llm_dedup_incremental")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val nNew = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(100L)) >= 80).count()
    assert(rows.length == nNew)
    rows.foreach { case (doc, stage, dupOf) =>
      assert(doc % 100 >= 80, s"existing doc $doc judged")
      assert((stage == "kept") == dupOf.isEmpty)
      // keeper is an existing-corpus doc (any id — the corpus takes
      // precedence regardless of ingest order) or an EARLIER new doc
      dupOf.foreach(k =>
        assert(k % 100 < 80 || k < doc, s"doc $doc keeper $k invalid"))
    }
    // exact verdicts must agree with ground truth recomputed in-memory
    val texts = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byText = texts.groupBy(_._2)
    rows.foreach { case (doc, stage, _) =>
      val mine = texts.find(_._1 == doc).get._2
      val clash = byText(mine).exists { case (id, _) =>
        id % 100 < 80 || id < doc }
      assert((stage == "exact_dup") == clash,
        s"doc $doc exact verdict mismatch (clash=$clash, stage=$stage)")
    }
  }

  test("llm_ngram_lm: bigram counts, positive surprisal, duplicate-text equality") {
    val rows = SparkEntry.queries("llm_ngram_lm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nTokens = Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(split(text, ' ')) AS nt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == nTokens.size)
    rows.foreach { case (doc, nbg, avgNll) =>
      assert(nbg == math.max(nTokens(doc) - 1, 0), s"doc $doc bigram count")
      // add-1 smoothed probabilities are < 1 ⇒ -ln p > 0
      assert(avgNll > 0, s"doc $doc avg_nll $avgNll")
    }
    // identical texts must score identically (model is text-only)
    val byDoc = rows.map(t => t._1 -> t._3).toMap
    Tables.documents(spark, sf)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1).collect()
      .foreach { r =>
        val ids = r.getSeq[Long](1)
        assert(ids.map(byDoc).distinct.size == 1,
          s"identical texts $ids scored differently")
      }
  }

  test("llm_decontaminate: contaminated docs really share an 8-gram with train") {
    val out = SparkEntry.queries("llm_decontaminate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.nonEmpty)
    out.foreach { case (_, n, c) => assert(c == (n > 0)) }
    // recompute ground truth in-memory at this tiny SF
    def grams(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(8).filter(_.length == 8).map(_.toSeq).toSet
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val train = docs.filter(_._1 % 100 < 80).flatMap(d => grams(d._2)).toSet
    val truth = docs.filter(_._1 % 100 >= 90)
      .map { case (id, t) => id -> grams(t).exists(train.contains) }.toMap
    out.foreach { case (id, _, c) =>
      assert(c == truth(id), s"doc $id contamination verdict mismatch")
    }
  }

  /** Shared both-paths harness (round-9; was five inline copies of the
    * same staging + forced-mode driver): sf0.001's documents plus two
    * extra verbatim copies of every third doc (groups of size 3 among
    * singletons — dup mass 5/3 > the 1.25x threshold), written to a
    * temp dir. Every adaptive-collapse op pins forced-collapse ==
    * forced-direct through this one helper, so the discipline's
    * exactness claim has exactly one test shape to audit. */
  private def replicaHeavyDocsDir(tag: String): String = {
    val src = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory(s"graft_${tag}_")
      .toString
    val extra1 = src.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + lit(100000L))
    val extra2 = src.filter(col("doc_id") % 3 === 0)
      .withColumn("doc_id", col("doc_id") + lit(200000L))
    src.unionByName(extra1).unionByName(extra2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def runForced(dir: String, confKey: String, mode: String,
      query: String): Seq[String] = {
    spark.conf.set(confKey, mode)
    try SparkEntry.queries(query)(spark, dir)
      .collect().map(_.toString).toSeq
    finally spark.conf.unset(confKey)
  }

  /** Assert forced-collapse == forced-direct; returns the rows for
    * op-specific follow-up asserts. */
  private def bothPathsEqual(dir: String, confKey: String,
      query: String): Seq[String] = {
    val direct = runForced(dir, confKey, "never", query)
    val collapsed = runForced(dir, confKey, "always", query)
    assert(direct == collapsed,
      s"$query collapse path diverged: " +
        s"${collapsed.diff(direct).take(5)} vs " +
        s"${direct.diff(collapsed).take(5)}")
    assert(collapsed.nonEmpty)
    collapsed
  }

  test("llm_dedup_keep_best_incremental: a better-quality newcomer " +
      "displaces the incumbent keeper") {
    // Two staged batches via the op's doc_id % 100 split: docs 10/11
    // are the EXISTING near-dup cluster (keeper = the higher-quality
    // member), doc 85 is the ARRIVING batch member that near-dups the
    // cluster (token-set Jaccard 4/7 >= 0.5, same lang, |dn_chars| <=
    // 10) with a better quality score (no stopwords, no short words)
    // — the keeper must MOVE. Docs 20 (existing) and 90 (new) are
    // unrelated singletons pinning the retained / new_keeper verdicts.
    val dir = java.nio.file.Files.createTempDirectory("graft_kbi_")
      .toString
    import spark.implicits._
    def row(id: Long, text: String) =
      (id, text, "en", "web", text.length.toLong)
    Seq(
      row(10L, "alpha beta gamma delta the of"),
      row(11L, "alpha beta gamma delta of of"),
      row(20L, "unrelated solitary document entirely"),
      row(85L, "alpha beta gamma delta epsilon"),
      row(90L, "another lonely arrival document"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("llm_dedup_keep_best_incremental")(
        spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3), r.getString(4)))).toMap
    // one cluster rooted at 10 spans the batches; keeper moved to 85
    assert(out(10L)._1 == 10L && !out(10L)._2 &&
      out(10L)._3 == "displaced", s"incumbent: ${out(10L)}")
    assert(out(85L)._1 == 10L && out(85L)._2 &&
      out(85L)._3 == "new_keeper", s"newcomer: ${out(85L)}")
    assert(out(11L)._1 == 10L && !out(11L)._2 && out(11L)._3 == "dup")
    assert(out(20L)._3 == "retained" && out(20L)._2)
    assert(out(90L)._3 == "new_keeper" && out(90L)._2)
  }

  test("llm_ngram_jaccard collapse path equals the direct path on a " +
      "replica-heavy corpus") {
    // Covers within-group j=1 pairs, cross-group bundle expansion, and
    // the (j desc, id, id2) tie order across both kinds.
    val dir = replicaHeavyDocsDir("nj")
    val collapsed = bothPathsEqual(dir,
      "spark.graft.ngramJaccardCollapse", "llm_ngram_jaccard")
    // replica groups dominate the top: the staged corpus has j=1 pairs
    assert(collapsed.size == 20)
  }

  test("llm_lang_id collapse path equals the direct path on a " +
      "replica-heavy corpus (the k-weighted model is exact)") {
    // Training on replicas vs training on distinct texts with
    // multiplicity weights must give the SAME model (cnt(lang, w) is a
    // k-weighted sum) and hence the same per-doc argmax.
    bothPathsEqual(replicaHeavyDocsDir("li"),
      "spark.graft.langIdCollapse", "llm_lang_id")
  }

  test("llm_ngram_lm collapse path equals the direct path on a " +
      "replica-heavy corpus (the k-weighted LM is exact)") {
    bothPathsEqual(replicaHeavyDocsDir("lm"),
      "spark.graft.ngramLmCollapse", "llm_ngram_lm")
  }

  test("llm_dsir_select is exactly the Gumbel top-k over " +
      "llm_importance_weights (independent recomputation)") {
    // recompute the rank key from the REGISTERED weight table + a
    // local Gumbel: the selection must be the exact top-100 by
    // (w_micro + g_micro) desc, doc_id asc — no sampling slack
    val w = SparkEntry.queries("llm_importance_weights")(spark, sf)
      .collect().filter(r => r.getLong(1) > 0)
      .map(r => r.getLong(0) -> r.getLong(2))
    def gMicro(id: Long): Long = {
      val u = (((id % 268435456L) * 2654435761L) % 1000000L + 0.5) / 1e6
      math.round(-math.log(-math.log(u)) * 1e6)
    }
    val expect = w.map { case (id, wm) => (wm + gMicro(id), id) }
      .sortBy { case (k, id) => (-k, id) }.take(100).map(_._2).toSeq
    val got = SparkEntry.queries("llm_dsir_select")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect, s"selection diverged: got ${got.take(5)}... " +
      s"expected ${expect.take(5)}...")
    // weight matters: the selected set must not be the plain hash
    // top-100 (i.e. the Gumbel key actually mixes the weight in)
    val hashOnly = w.map { case (id, _) => (gMicro(id), id) }
      .sortBy { case (k, id) => (-k, id) }.take(100).map(_._2).toSeq
    assert(got != hashOnly, "selection ignored the importance weights")
  }

  test("llm_importance_weights collapse path equals the direct path " +
      "on a replica-heavy corpus (k/hk-weighted grids are exact)") {
    // Raw-grid counts are k-weighted, target-grid counts hk-weighted
    // (every replica of a head text is a target member), so the
    // collapsed grids — and hence λ and every per-doc Σ tf·λ — must
    // equal the direct path's bit-for-bit.
    bothPathsEqual(replicaHeavyDocsDir("dsir"),
      "spark.graft.dsirCollapse", "llm_importance_weights")
  }

  test("llm_repetition collapse path equals the direct path on a " +
      "replica-heavy corpus") {
    bothPathsEqual(replicaHeavyDocsDir("rep"),
      "spark.graft.repetitionCollapse", "llm_repetition")
  }

  test("MurmurSql corpus precondition is LOUD: the documents table is " +
      "pure ASCII, so the DuckDB UTF-16 hash mirrors are exact") {
    // The string-hash oracle mirrors (MurmurSql.stringHashCtes, the
    // fingerprint rolling hash, the mm_* payload hashes) consume UTF-16
    // code units on the JVM but Unicode codepoints in DuckDB — exact
    // only for BMP text, and byte-exact only for ASCII. A non-ASCII
    // fixture must fail HERE with a named precondition, not downstream
    // as an inscrutable oracle hash mismatch (round-10 review item 6).
    Seq("sf0.001", "sf0.01").foreach { sfn =>
      val docs = Tables.documents(spark, s"/root/testdata/$sfn")
      val offenders = docs
        .filter(col("text").rlike("[^\\x00-\\x7F]") ||
          col("lang").rlike("[^\\x00-\\x7F]"))
        .count()
      assert(offenders == 0,
        s"PRECONDITION VIOLATED ($sfn): $offenders document rows carry " +
          "non-ASCII text, but the DuckDB hash-oracle mirrors " +
          "(MurmurSql.stringHashCtes and kin) are exact only for " +
          "ASCII/BMP — fix is a UTF-16 re-expansion in the SQL mirror, " +
          "see MurmurSql scaladoc")
    }
  }

  test("llm_decontaminate collapse path equals the direct path on a " +
      "replica-heavy corpus (both bloom variants)") {
    // Round-9 collapse: the train stream shingles DISTINCT texts only
    // (replicas add no new 8-grams) and a test doc's n_shared is a
    // pure function of its text, expanded back by a gid join. The
    // replica-heavy staging shifts doc_ids by +100000/+200000 (both
    // ≡ 0 mod 100), so each replica keeps its split — train groups
    // collapse on the train side, test groups on the test side, and
    // every test replica must report its group's shared count.
    val dir = replicaHeavyDocsDir("dc")
    bothPathsEqual(dir,
      "spark.graft.decontaminateCollapse", "llm_decontaminate")
    // the bloom variant shares the body; its sketch prune must
    // commute with the collapse (it only drops non-matching train
    // shingles, whichever side of the collapse they came from)
    assert(runForced(dir, "spark.graft.decontaminateCollapse", "never",
        "llm_decontaminate_bloom") ==
      runForced(dir, "spark.graft.decontaminateCollapse", "always",
        "llm_decontaminate_bloom"))
  }

  test("llm_dup_spans text-collapse path is exact under heavy duplication") {
    // The round-7 adaptive collapse runs the position machinery on
    // DISTINCT texts and reconstructs member answers (full-coverage
    // override for k >= 2 groups, rep join-back for singletons).
    val dir = replicaHeavyDocsDir("ds")
    val collapsed = bothPathsEqual(dir,
      "spark.graft.dupSpansCollapse", "llm_dup_spans")
    // the strip op shares dupSpans - its gap reassembly must agree too
    assert(runForced(dir, "spark.graft.dupSpansCollapse", "never",
        "llm_dup_spans_strip") ==
      runForced(dir, "spark.graft.dupSpansCollapse", "always",
        "llm_dup_spans_strip"),
      "strip collapse path diverged")
    // and the replica groups really hit the full-coverage override:
    // every replicated doc reports one full span (or nothing, iff the
    // text is shorter than one 50-char window)
    val full = collapsed.map(_.stripPrefix("[").stripSuffix("]").split(","))
      .filter(a => a(0).toLong >= 100000L)
    assert(full.nonEmpty && full.forall(a =>
      a(1).toLong == 1L || a(2).toLong == 0L))
    assert(full.exists(a => a(1).toLong == 1L))
  }
  test("llm_simhash_incremental == verdicts derived from the full " +
      "simhash pair set (the minhash-incremental cross-check applied " +
      "to the simhash family)") {
    // sf0.01, not the suite default: sf0.001's 6 simhash pairs all
    // fall inside the existing (%100 < 80) side, so the dup path of
    // the incremental op would go untested there (verified by the
    // oracle-side count; sf0.01 carries 3 new-doc-admissible pairs)
    val sf01 = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("llm_simhash_incremental")(spark, sf01)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val pairs = SparkEntry.queries("llm_simhash_dedup")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val ids = Tables.documents(spark, sf01)
      .select("doc_id").collect().map(_.getLong(0))
    val isNew = ids.map(i => i -> (i % 100 >= 80)).toMap
    val newIds = ids.filter(isNew).toSet
    assert(got.keySet == newIds, "one verdict per new doc")
    newIds.foreach { n =>
      val admissible = adj.getOrElse(n, Set.empty)
        .filter(c => !isNew(c) || c < n)
      val expected =
        if (admissible.isEmpty) ("kept", None)
        else ("band_dup", Some(admissible.min))
      assert(got(n) == expected, s"doc $n: got ${got(n)} exp $expected")
    }
    // non-degenerate: at least one dup verdict and at least one kept
    assert(got.values.exists(_._1 == "band_dup"))
    assert(got.values.exists(_._1 == "kept"))
  }

  test("llm_perplexity_bucket: terciles are score-monotone intervals and reuse the llm_ngram_lm scores") {
    val rows = SparkEntry.queries("llm_perplexity_bucket")(spark, sf)
      .collect()
    val lm = SparkEntry.queries("llm_ngram_lm")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows.length == lm.size)
    rows.foreach { r =>
      val (nbg, nll) = lm(r.getLong(0))
      assert(r.getLong(1) == nbg)
      assert((if (r.isNullAt(2)) None else Some(r.getDouble(2))) == nll,
        s"doc ${r.getLong(0)} avg_nll drifted from llm_ngram_lm")
      assert((r.getString(3) == "na") == (nbg == 0L))
    }
    val byBucket = rows.groupBy(_.getString(3))
    // buckets are INTERVALS of the score axis (bin-granular): every
    // head score < every middle score < every tail score
    def nll(b: String): Array[Double] =
      byBucket.getOrElse(b, Array.empty).map(_.getDouble(2))
    Seq(("head", "middle"), ("middle", "tail")).foreach { case (lo, hi) =>
      if (nll(lo).nonEmpty && nll(hi).nonEmpty)
        assert(nll(lo).max < nll(hi).min, s"$lo/$hi overlap")
    }
    // tercile coverage: head ≥ n/3 of scored docs, head+middle ≥ 2n/3,
    // and dropping the head's BOUNDARY BIN goes under a third (the
    // cutoff bin is minimal)
    val n = rows.count(_.getString(3) != "na")
    val h = byBucket.getOrElse("head", Array.empty).length
    val mid = byBucket.getOrElse("middle", Array.empty).length
    assert(h > 0 && mid > 0 && h + mid < n, "all three buckets non-empty")
    assert(h * 3 >= n)
    assert((h + mid) * 3 >= 2 * n)
    val headBins = byBucket("head")
      .map(r => math.round(r.getDouble(2) * 1e6) / 10000)
    assert((h - headBins.count(_ == headBins.max)) * 3 < n,
      "head cutoff bin is not minimal")
  }

  // ---- SemDeDup brute-force reference (shared by the two
  // llm_semantic_dedup tests): the AnnOps.centroids arithmetic
  // re-derived independently (BigDecimal.valueOf = Spark's double
  // round path; Long./ = Spark's truncating `div`), then the keep
  // order — ascending (c_sim, vec_id) within cluster, drop iff an
  // ORDER-EARLIER member sits within cosine 0.4.
  private def huD(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cosD(a: Array[Double], b: Array[Double]): Double =
    dotD(a, b) / (math.sqrt(dotD(a, a)) * math.sqrt(dotD(b, b)))
  private def microCentroid(ms: Array[Array[Double]]): Array[Double] =
    Array.tabulate(ms.head.length) { j =>
      val sm = ms.map(v => java.math.BigDecimal.valueOf(v(j) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue).sum
      (sm / ms.length) / 1e6
    }

  /** Round-12: the full ADAPTIVE contract — per-label cells by
    * default, deterministic 2-iteration Lloyd sub-k-means for any cell
    * with p² > cap·n (seeds by Knuth hash of vec_id, argmax of
    * 6-dp cosine with subcell tie-break, micro-unit centroids),
    * cluster_id = (label+1)·2²⁰ + subcell when refined. */
  private def semanticDedupBrute(vecs: Array[(Long, Array[Double], Int)],
      cap: Long = 16L): Map[Long, (Long, Double, Boolean, Option[Long])] = {
    val n = vecs.length.toLong
    val sN = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    def mh(id: Long): Long = ((id % 268435456L) * 2654435761L) % 1000000007L
    val cellOf = scala.collection.mutable.Map.empty[Long, Long]
    val centOf = scala.collection.mutable.Map.empty[Long, Array[Double]]
    vecs.groupBy(_._3).foreach { case (l, ms) =>
      val p = ms.length.toLong
      if (p * p > cap * n) {
        val ncells = ((p + sN - 1) / sN).toInt
        val seedCents = ms.sortBy(m => (mh(m._1), m._1)).take(ncells)
          .map(_._2).zipWithIndex.map { case (v, j) => (j, v) }.toSeq
        def assign(cents: Seq[(Int, Array[Double])]): Map[Long, Int] =
          ms.map { m =>
            m._1 -> cents.maxBy { case (j, c) =>
              (huD(cosD(m._2, c), 6), -j) }._1
          }.toMap
        val a1 = assign(seedCents)
        val c1 = ms.groupBy(m => a1(m._1)).toSeq.sortBy(_._1)
          .map { case (j, mm) => (j, microCentroid(mm.map(_._2))) }
        val a2 = assign(c1)
        val c2 = ms.groupBy(m => a2(m._1))
          .map { case (j, mm) => j -> microCentroid(mm.map(_._2)) }
        ms.foreach { m =>
          val cid = (l + 1).toLong * 1048576L + a2(m._1)
          cellOf(m._1) = cid
          centOf(cid) = c2(a2(m._1))
        }
      } else {
        ms.foreach(m => cellOf(m._1) = l.toLong)
        centOf(l.toLong) = microCentroid(ms.map(_._2))
      }
    }
    val withC = vecs.map { case (id, v, _) =>
      val cid = cellOf(id)
      (id, v, cid, huD(cosD(v, centOf(cid)), 6))
    }
    withC.map { case (id, v, cid, cs) =>
      val preds = withC.filter { case (id2, v2, cid2, cs2) =>
        cid2 == cid && (cs2 < cs || (cs2 == cs && id2 < id)) &&
          huD(cosD(v, v2), 6) >= 0.4
      }
      val dupOf = if (preds.isEmpty) None else Some(preds.map(_._1).min)
      id -> ((cid, cs, dupOf.isEmpty, dupOf))
    }.toMap
  }

  private def assertSemanticMatches(dir: String, cap: Long = 16L): Unit = {
    val rows = SparkEntry.queries("llm_semantic_dedup")(spark, dir)
      .collect()
    val vecs = Tables.embeddings(spark, dir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2))
    }
    assert(rows.length == vecs.length)
    val truth = semanticDedupBrute(vecs, cap)
    rows.foreach { r =>
      val id = r.getLong(0)
      val got = (r.getLong(1), r.getDouble(2), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
      assert(got == truth(id), s"vec $id: got $got exp ${truth(id)}")
    }
    assert(rows.exists(!_.getBoolean(3)) && rows.exists(_.getBoolean(3)),
      "non-degenerate: some drops and some keeps")
  }

  test("llm_semantic_dedup: matches brute-force SemDeDup keep order") {
    assertSemanticMatches(sf)
  }

  test("llm_semantic_dedup: exact-duplicate vectors (equal c_sim) " +
      "resolve by the vec_id tie-break") {
    // The stock SFs carry no equal-c_sim pairs, so this corpus forces
    // them: each cluster holds one base direction replicated 3× with
    // NON-contiguous ids (identical vectors ⇒ identical c_sim ⇒ only
    // the (c_sim, vec_id) tie-break orders them) plus one far vector
    // that must survive as the cluster outlier.
    import spark.implicits._
    val dim = 8
    val rows =
      (for (g <- 0 until 3; m <- 0 until 3) yield ((g + 10 * m).toLong,
        Array.tabulate(dim)(j =>
          (if (j == g) 3.0 else 0.25 * math.cos(g + j)).toFloat), g)) ++
      (0 until 3).map { g => ((g + 100).toLong,
        Array.tabulate(dim)(j =>
          (if (j == (g + 4) % dim) 2.0 else 0.0).toFloat), g)
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sem_tie_").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    assertSemanticMatches(dir)
    // and concretely: within each replica trio only the min id keeps
    val got = SparkEntry.queries("llm_semantic_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    (0 until 3).foreach { g =>
      assert(got(g.toLong), s"cluster $g: min-id replica must keep")
      assert(!got(g + 10L) && !got(g + 20L),
        s"cluster $g: later replicas must drop on the id tie-break")
    }
    // collapse path ≡ direct path on the dup-heavy corpus (the
    // round-11 rep-expansion theorem, pinned the house way: force
    // each path via the conf override and compare verbatim)
    def runWith(mode: String) = {
      spark.conf.set("spark.graft.semanticCollapse", mode)
      try SparkEntry.queries("llm_semantic_dedup")(spark, dir)
        .collect().toSeq
      finally spark.conf.unset("spark.graft.semanticCollapse")
    }
    assert(runWith("always") == runWith("never"),
      "collapse path != direct path on the dup-heavy corpus")
  }

  test("llm_semantic_dedup adaptive sub-quantization: the stock corpus " +
      "stays on plain labels, the forced cap refines every cell to the " +
      "brute-force sub-k-means truth, and the collapse theorem holds " +
      "under refinement") {
    // default cap = 16 at sf0.001: max cell 63 < 4·√500 ≈ 89 — every
    // cluster_id must be a plain label (the trigger boundary is real)
    val plain = SparkEntry.queries("llm_semantic_dedup")(spark, sf)
      .collect()
    assert(plain.forall(_.getLong(1) < 1048576L),
      "stock sf0.001 corpus must not refine")
    // cap = 0 forces p² > 0 for every cell: all labels refine; the op
    // must match the independently-computed Lloyd reference exactly
    spark.conf.set("spark.graft.semanticCellCap", "0")
    try {
      assertSemanticMatches(sf, cap = 0L)
      val refined = SparkEntry.queries("llm_semantic_dedup")(spark, sf)
        .collect()
      assert(refined.forall(_.getLong(1) >= 1048576L),
        "cap=0 must put every vector in a refined subcell")
      assert(refined.map(_.getLong(1)).distinct.length > 10,
        "refinement should split the 10 labels into more subcells")
    } finally spark.conf.unset("spark.graft.semanticCellCap")
    // collapse ≡ direct WITH refinement live: the dup-heavy fixture
    // from the tie-break test, cap forced, both override paths
    import spark.implicits._
    val dim = 8
    val rows =
      (for (g <- 0 until 3; m <- 0 until 3) yield ((g + 10 * m).toLong,
        Array.tabulate(dim)(j =>
          (if (j == g) 3.0 else 0.25 * math.cos(g + j)).toFloat), g)) ++
      (0 until 3).map { g => ((g + 100).toLong,
        Array.tabulate(dim)(j =>
          (if (j == (g + 4) % dim) 2.0 else 0.0).toFloat), g)
      }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sem_requant_").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def runWith(mode: String) = {
      spark.conf.set("spark.graft.semanticCellCap", "0")
      spark.conf.set("spark.graft.semanticCollapse", mode)
      try SparkEntry.queries("llm_semantic_dedup")(spark, dir)
        .collect().toSeq
      finally {
        spark.conf.unset("spark.graft.semanticCollapse")
        spark.conf.unset("spark.graft.semanticCellCap")
      }
    }
    val always = runWith("always")
    assert(always == runWith("never"),
      "collapse path != direct path under forced refinement")
    assert(always.forall(_.getLong(1) >= 1048576L))
  }

  test("llm_ccnet_pipeline: dedup verdicts, per-lang tercile coverage, stage consistency") {
    val rows = SparkEntry.queries("llm_ccnet_pipeline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getString(3))))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length == docs.length)
    val keeperOf = docs.groupBy(_._2).values.flatMap { ds =>
      val k = ds.map(_._1).min; ds.map(d => d._1 -> k)
    }.toMap
    rows.foreach { case (id, status, dupOf, lang) =>
      if (keeperOf(id) != id) {
        assert(status == "dup", s"doc $id")
        assert(dupOf == Some(keeperOf(id)), s"doc $id dup_of")
        assert(lang.isEmpty, s"dup doc $id carries a lang")
      } else {
        assert(Set("head", "middle", "tail", "na")(status), s"doc $id")
        assert(dupOf.isEmpty && lang.nonEmpty, s"doc $id")
      }
    }
    // na ⟺ a survivor with no bigram (single-token text)
    val nTok = docs.toMap.map { case (id, t) =>
      id -> t.split(" ", -1).length }
    rows.filter(r => keeperOf(r._1) == r._1).foreach {
      case (id, status, _, _) =>
        assert((status == "na") == (nTok(id) < 2), s"doc $id na")
    }
    // per-predicted-lang tercile coverage over that lang's scored
    // survivors: head >= n/3, head+middle >= 2n/3
    rows.filter(r => keeperOf(r._1) == r._1 && r._2 != "na")
      .groupBy(_._4.get).foreach { case (lang, rs) =>
        val n = rs.size
        val h = rs.count(_._2 == "head")
        val m = rs.count(_._2 == "middle")
        assert(h * 3 >= n, s"$lang head coverage")
        assert((h + m) * 3 >= 2 * n, s"$lang head+middle coverage")
      }
    assert(rows.exists(_._2 == "head") && rows.exists(_._2 == "tail"),
      "non-degenerate buckets")
    // sf0.001/sf0.01 carry no duplicate texts, so the dup leg is
    // exercised at sf0.1 (8 duplicate rows): every dup points at the
    // min-id keeper of its text and carries no lang
    val sf1 = "/root/testdata/sf0.1"
    val dups = SparkEntry.queries("llm_ccnet_pipeline")(spark, sf1)
      .filter(col("status") === "dup").collect()
    val k1 = Tables.documents(spark, sf1).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._2).values.flatMap { ds =>
        val k = ds.map(_._1).min; ds.map(d => d._1 -> k)
      }.toMap
    assert(dups.nonEmpty, "sf0.1 must exercise the dup leg")
    dups.foreach { r =>
      assert(k1(r.getLong(0)) == r.getLong(2) && r.getLong(0) != r.getLong(2))
      assert(r.isNullAt(3), "dup doc carries a lang")
    }
  }
}
