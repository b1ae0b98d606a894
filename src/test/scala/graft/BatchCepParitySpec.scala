package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BatchCep
import graft.streaming.{Cep, StreamingOps}

/** The round-8 "provably the same pattern" artifact: for every
  * registered pattern, the BatchCep-compiled plan's bindings must equal
  * a driver-side `Cep.eval` over each anchor's collected event buffer —
  * the exact evaluator the streaming `CepPatternProcessor` runs at
  * seal. Any divergence between the batch join algebra and the sealed-
  * buffer semantics (tie-breaks, window bounds, cascade nulls, greedy
  * optional, quantifier close) fails here.
  *
  * Two corpora: the real sf0.001 events table (realistic sparsity —
  * mostly unmatched chains and cascade nulls), and a dense synthetic
  * one where every interesting branch is guaranteed to fire (matched
  * quantifiers, greedy-optional fallbacks, ties, boundary timestamps) —
  * the real corpus at this SF has only 2 signups with an in-window
  * click and zero completed chains, so it alone would vacuously pass.
  */
class BatchCepParitySpec extends GraftSpec {

  private val W = 3600000000L

  /** (events DF with user_id/event_id/ts_us/event_type, label).
    * `typeNames` is the pattern alphabet — the click/purchase pair for
    * the relaxed-contiguity family, the FULL map for strict patterns
    * (both faces must see the same universe). */
  private case class Corpus(ev: DataFrame, label: String,
      typeNames: Map[Int, String] = StreamingOps.cepTypeNames) {
    lazy val perUser: Map[Long, Seq[(Int, Long, Long)]] = {
      val tn = typeNames.map(_.swap)
      ev.collect().groupBy(_.getLong(0)).map { case (u, rows) =>
        u -> rows.toSeq.flatMap { r =>
          tn.get(r.getString(3)).map(tc => (tc, r.getLong(2), r.getLong(1)))
        }
      }
    }
    lazy val anchors: Seq[(Long, Long, Long)] =
      ev.filter(col("event_type") === "signup")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    def evalAll(p: Cep.Pattern): Map[Long, Cep.Outcome] =
      anchors.map { case (u, id, ts) =>
        id -> p.eval(ts, perUser.getOrElse(u, Nil))
      }.toMap
    def batch(p: Cep.Pattern): Map[Long, org.apache.spark.sql.Row] =
      BatchCep.bindings(ev, p, "signup", typeNames,
          fullAlphabet = typeNames == StreamingOps.cepAllTypeNames)
        .collect().map(r => r.getLong(1) -> r).toMap
  }

  private lazy val real = Corpus(
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("event_type")),
    "real-sf0.001")

  private lazy val synth = {
    import spark.implicits._
    val h = W // window length, for boundary cases
    // (user, id, ts, type) — per-user scripts covering: plain matches,
    // ties (same ts, id order decides), boundary ts (= anchor + W in,
    // + W + 1 out), cascade nulls, greedy-optional fallback (click
    // bound but chain dead while the direct purchase completes),
    // dangling partials, multi-anchor users, absent/abandon verdicts.
    val rows = Seq[(Long, Long, Long, String)](
      // u1: full chain with tie on click ts (ids 12 vs 11) + extra
      // clicks for the quantifier count; purchase closes
      (1, 10, 1000, "signup"), (1, 12, 2000, "click"), (1, 11, 2000, "click"),
      (1, 13, 2500, "click"), (1, 14, 3000, "purchase"),
      (1, 15, 3500, "click"), (1, 16, 4000, "purchase"),
      // u2: click at exactly anchor+W (in), purchase past it (out)
      (2, 20, 1000, "signup"), (2, 21, 1000 + h, "click"),
      (2, 22, 1001 + h, "purchase"),
      // u3: greedy-optional fallback — click binds but no purchase
      // AFTER it in window; a purchase BEFORE the click completes the
      // skip branch
      (3, 30, 1000, "signup"), (3, 31, 1500, "purchase"),
      (3, 32, 2000, "click"),
      // u4: no events after signup at all (all-null cascade; absence
      // verdict true)
      (4, 40, 1000, "signup"),
      // u5: two anchors sharing one event history; second signup's
      // window excludes the early purchase
      (5, 50, 1000, "signup"), (5, 51, 1200, "click"),
      (5, 52, 1400, "purchase"), (5, 53, 1300, "signup"),
      (5, 54, 1600, "click"),
      // u6: abandon shape — click then nothing (absent purchase holds)
      (6, 60, 1000, "signup"), (6, 61, 1100, "click"),
      // u7: times(2) chain with the second click tieing a later one
      (7, 70, 1000, "signup"), (7, 71, 1100, "click"),
      (7, 73, 1300, "click"), (7, 72, 1300, "click"),
      (7, 74, 1700, "purchase"))
    Corpus(rows.toDF("user_id", "event_id", "ts_us", "event_type")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type")),
      "synthetic")
  }

  private def optLong(r: org.apache.spark.sql.Row, name: String)
      : Option[Long] = {
    val i = r.fieldIndex(name)
    if (r.isNullAt(i)) None else Some(r.getLong(i))
  }

  private def checkBindings(c: Corpus, label: String, p: Cep.Pattern,
      names: Seq[String], counts: Seq[String] = Nil): Unit = {
    val oracle = c.evalAll(p)
    val got = c.batch(p)
    assert(got.keySet == oracle.keySet,
      s"[$label/${c.label}] anchor sets differ: " +
        s"extra ${got.keySet -- oracle.keySet}, " +
        s"missing ${oracle.keySet -- got.keySet}")
    got.foreach { case (aid, row) =>
      val o = oracle(aid)
      names.foreach { n =>
        assert(optLong(row, s"${n}_id") == o.id(n) &&
          optLong(row, s"${n}_ts") == o.ts(n),
          s"[$label/${c.label}] anchor $aid step $n: batch " +
            s"${optLong(row, s"${n}_id")} vs eval ${o.id(n)}")
      }
      counts.foreach { n =>
        assert(optLong(row, s"${n}_count") == o.counts.get(n),
          s"[$label/${c.label}] anchor $aid count $n: batch " +
            s"${optLong(row, s"${n}_count")} vs eval ${o.counts.get(n)}")
      }
    }
  }

  private def corpora = Seq(real, synth)

  test("funnel / abc / times / optional bindings equal Cep.eval") {
    corpora.foreach { c =>
      checkBindings(c, "funnel", StreamingOps.funnelPattern,
        Seq("purchase"))
      checkBindings(c, "abc", StreamingOps.abcPattern,
        Seq("click", "purchase"))
      checkBindings(c, "times", StreamingOps.timesPattern,
        Seq("click1", "click2", "purchase"))
      checkBindings(c, "optional", StreamingOps.optionalPattern,
        Seq("click", "purchase"))
    }
  }

  test("quantified bindings + absorbed-occurrence count equal Cep.eval, " +
      "with matched chains exercised") {
    corpora.foreach { c =>
      checkBindings(c, "quantified", StreamingOps.quantifiedPattern,
        Seq("click", "purchase"), counts = Seq("click"))
    }
    // the synthetic corpus must actually fire the interesting branches
    val o = synth.evalAll(StreamingOps.quantifiedPattern)
    assert(o.values.count(_.matched) >= 2,
      "synthetic corpus lost its matched quantified chains")
    assert(o.values.exists(_.counts.get("click").exists(_ >= 2)),
      "synthetic corpus lost its multi-click absorption case")
  }

  test("until-bounded (round-11): required-close binding + zero-or-" +
      "more count equal Cep.eval, with zero-click and open cases") {
    corpora.foreach { c =>
      checkBindings(c, "until_bounded", StreamingOps.untilBoundedPattern,
        Seq("purchase"), counts = Seq("click"))
    }
    val o = synth.evalAll(StreamingOps.untilBoundedPattern)
    assert(o.values.count(_.matched) >= 2,
      "synthetic corpus lost its closed until chains")
    assert(o.values.exists(_.counts.get("click").exists(_ >= 2)),
      "synthetic corpus lost its multi-click until absorption case")
    assert(o.values.exists(v => !v.matched),
      "synthetic corpus lost its open-within-window case")
  }

  test("absence / abandon survivors are exactly Cep.eval's matches") {
    corpora.foreach { c =>
      Seq(("absence", StreamingOps.absencePattern, Nil),
        ("abandon", StreamingOps.abandonPattern, Seq("click")))
        .foreach { case (label, p, names) =>
          val oracle = c.evalAll(p)
          val got = c.batch(p)
          val expected = oracle.filter(_._2.matched).keySet
          assert(got.keySet == expected,
            s"[$label/${c.label}] survivors: " +
              s"extra ${got.keySet -- expected}, " +
              s"missing ${expected -- got.keySet}")
          got.foreach { case (aid, row) =>
            names.foreach { n =>
              assert(optLong(row, s"${n}_id") == oracle(aid).id(n),
                s"[$label/${c.label}] anchor $aid $n binding diverges")
            }
          }
        }
    }
    val o = synth.evalAll(StreamingOps.abandonPattern)
    assert(o.values.exists(_.matched) && o.values.exists(!_.matched),
      "synthetic corpus lost its abandon/redeemed split")
  }

  test("a terminal quantifier absorbs to the window end (generator " +
      "semantics beyond the shipped patterns)") {
    val p = Cep.begin(W).oneOrMoreGreedy("click", 0)
    corpora.foreach { c =>
      checkBindings(c, "terminal-quant", p, Seq("click"),
        counts = Seq("click"))
    }
    val o = synth.evalAll(p)
    assert(o.values.exists(_.counts.get("click").exists(_ >= 2)),
      "synthetic corpus lost its terminal-absorption case")
  }

  test("strict next() bindings equal Cep.eval over the full alphabet") {
    val p = StreamingOps.strictPattern
    Seq(real.copy(typeNames = StreamingOps.cepAllTypeNames),
      synth.copy(typeNames = StreamingOps.cepAllTypeNames)).foreach { c =>
      checkBindings(c, "strict", p, Seq("click"))
    }
    // the synthetic corpus must exercise both verdicts: an immediate
    // click (u1's signup? -> first event after 1000 is the tied clicks)
    // and a broken-contiguity case (u3: purchase intervenes)
    val o = synth.copy(typeNames = StreamingOps.cepAllTypeNames)
      .evalAll(p)
    assert(o.values.exists(_.matched) && o.values.exists(!_.matched),
      "synthetic corpus lost its strict matched/broken split")
  }

  test("followedByIf (round-13): BatchCep's predicate conjunct equals " +
      "the value-carrying Cep.eval, skip case included") {
    import spark.implicits._
    // (user, id, ts, type, value): u1 skip-then-bind (the earlier
    // CHEAPER purchase must not end the match), u2 all-cheaper
    // (unmatched), u3 qualifying tie at equal ts (id decides), u4
    // qualifying purchase out of window, u5 boundary Gt (equal value
    // does not qualify)
    val rows = Seq[(Long, Long, Long, String, Double)](
      (1, 10, 1000, "signup", 50.0), (1, 11, 2000, "purchase", 40.0),
      (1, 12, 3000, "purchase", 60.0),
      (2, 20, 1000, "signup", 50.0), (2, 21, 1500, "purchase", 40.0),
      (3, 30, 1000, "signup", 10.0), (3, 32, 2000, "purchase", 20.0),
      (3, 31, 2000, "purchase", 30.0),
      (4, 40, 1000, "signup", 5.0),
      (4, 41, 1001 + W, "purchase", 50.0),
      (5, 50, 1000, "signup", 50.0), (5, 51, 1500, "purchase", 50.0))
    val ev = rows
      .toDF("user_id", "event_id", "ts_us", "event_type", "value")
    val got = BatchCep.bindings(ev, StreamingOps.valuePattern, "signup",
        StreamingOps.cepTypeNames)
      .collect().map(r => r.getLong(1) -> r).toMap
    val byUser = rows.groupBy(_._1)
    rows.filter(_._4 == "signup").foreach { case (u, sid, sTs, _, sv) =>
      val evs = byUser(u).collect {
        case (_, eid, ets, "purchase", v) => (1, ets, eid, v)
        case (_, eid, ets, "click", v) => (0, ets, eid, v)
      }
      val o = StreamingOps.valuePattern.eval(sTs, sv, evs)
      val row = got(sid)
      assert(optLong(row, "purchase_id") == o.id("purchase") &&
        optLong(row, "purchase_ts") == o.ts("purchase"),
        s"anchor $sid: batch ${optLong(row, "purchase_id")} vs " +
          s"eval ${o.id("purchase")}")
      val pvIdx = row.fieldIndex("purchase_value")
      val pv = if (row.isNullAt(pvIdx)) None else Some(row.getDouble(pvIdx))
      assert(pv == o.value("purchase"),
        s"anchor $sid value: batch $pv vs eval ${o.value("purchase")}")
    }
    // the pins themselves: skip-then-bind, reject-all, tie, window, Gt
    assert(optLong(got(10L), "purchase_id").contains(12L))
    assert(optLong(got(20L), "purchase_id").isEmpty)
    assert(optLong(got(30L), "purchase_id").contains(31L))
    assert(optLong(got(40L), "purchase_id").isEmpty)
    assert(optLong(got(50L), "purchase_id").isEmpty)
  }
}
