package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Cep

/** Unit semantics of the CEP pattern combinator on hand-computed
  * buffers: the builder must reproduce the exact verdicts the five
  * hand-built `stream_pattern_*` automata produced (their oracle
  * equivalence is re-proven end-to-end by CORRECTNESS; this pins the
  * corner cases a corpus may not exercise). Events are
  * (typeCode, tsUs, eventId); anchor at ts 0, window 100. */
class CepSpec extends AnyFunSuite {

  private val W = 100L
  private def abc = Cep.begin(W)
    .followedBy("b", 0).followedBy("c", 1)

  test("followedBy chains first-matches with id tie-break") {
    // two type-0 at the same ts: lower id binds
    val o = abc.eval(0, Seq((0, 10, 7), (0, 10, 3), (1, 20, 9)))
    assert(o.matched && o.bindings("b") == ((10L, 3L)) &&
      o.bindings("c") == ((20L, 9L)))
  }

  test("unbound step cascade-nulls the rest, partials reported") {
    val o = abc.eval(0, Seq((0, 10, 1))) // b binds, no c
    assert(!o.matched && o.id("b").contains(1L) && o.id("c").isEmpty)
    val o2 = abc.eval(0, Seq((1, 20, 9))) // c exists but no b: c never scanned
    assert(!o2.matched && o2.bindings.isEmpty)
  }

  test("within(): events past the window never bind") {
    val o = abc.eval(0, Seq((0, 10, 1), (1, 101, 2)))
    assert(!o.matched && o.id("c").isEmpty)
    // boundary is inclusive (ts <= anchor + window]
    val o2 = abc.eval(0, Seq((0, 10, 1), (1, 100, 2)))
    assert(o2.matched)
  }

  test("times(2) binds two chained firsts as name1/name2") {
    val p = Cep.begin(W).followedBy("b", 0, times = 2).followedBy("c", 1)
    val o = p.eval(0, Seq((0, 10, 1), (0, 15, 2), (0, 12, 3), (1, 50, 4)))
    // b1 = first b, b2 = first b strictly after b1 (ts 12 beats ts 15)
    assert(o.matched && o.id("b1").contains(1L) && o.id("b2").contains(3L))
    val partial = p.eval(0, Seq((0, 10, 1), (1, 50, 4)))
    assert(!partial.matched && partial.id("b1").contains(1L) &&
      partial.id("b2").isEmpty && partial.id("c").isEmpty)
  }

  test("oneOrMore greedy: pivot is the first hit, count spans the " +
      "previous binding to the closing binding") {
    val p = Cep.begin(W).oneOrMoreGreedy("b", 0).followedBy("c", 1)
    // bs at 10, 20, 40; c at 30: pivot b@10, close c@30, count bs < 30
    val o = p.eval(0,
      Seq((0, 10, 1), (0, 20, 2), (0, 40, 3), (1, 30, 4)))
    assert(o.matched && o.id("b").contains(1L) &&
      o.counts("b") == 2L && o.id("c").contains(4L))
    // no close → pivot reported, no count
    val o2 = p.eval(0, Seq((0, 10, 1)))
    assert(!o2.matched && o2.id("b").contains(1L) && o2.counts.isEmpty)
  }

  test("oneOrMore mid-pattern: occurrences before the previous step's " +
      "binding never count (relaxed contiguity, not anchor-relative)") {
    val p = Cep.begin(W).followedBy("a", 2)
      .oneOrMoreGreedy("b", 0).followedBy("c", 1)
    // b@5 precedes a@10 — it is NOT part of the a→b+→c chain
    val o = p.eval(0, Seq((0, 5, 9), (2, 10, 1), (0, 15, 2), (0, 20, 3),
      (1, 30, 4)))
    assert(o.matched && o.id("a").contains(1L) &&
      o.id("b").contains(2L) && o.counts("b") == 2L &&
      o.id("c").contains(4L))
  }

  test("oneOrMore terminal: a matched pattern with nothing after the " +
      "quantifier absorbs to the window end") {
    val p = Cep.begin(W).oneOrMoreGreedy("b", 0)
    val o = p.eval(0, Seq((0, 10, 1), (0, 50, 2), (0, 120, 3)))
    // b@120 is out of window (W=100): matched, count = the 2 in-window
    assert(o.matched && o.id("b").contains(1L) && o.counts("b") == 2L)
    assert(!p.eval(0, Seq((0, 120, 3))).matched)
  }

  test("oneOrMore close survives a skipped optional: the close is the " +
      "EARLIEST later binding, not specifically the next step's") {
    val p = Cep.begin(W).oneOrMoreGreedy("b", 0)
      .optionallyFollowedBy("o", 2).followedBy("c", 1)
    // no type-2 events: Opt skips, c@30 still closes the quantifier
    val o = p.eval(0, Seq((0, 10, 1), (0, 20, 2), (0, 40, 3), (1, 30, 4)))
    assert(o.matched && o.counts("b") == 2L && o.id("c").contains(4L))
  }

  test("optional is greedy with skip fallback and partial reporting") {
    val p = Cep.begin(W)
      .optionallyFollowedBy("b", 0).followedBy("c", 1)
    // greedy completes: b@10 then c@20
    val g = p.eval(0, Seq((0, 10, 1), (1, 20, 2)))
    assert(g.matched && g.id("b").contains(1L) && g.id("c").contains(2L))
    // greedy branch can't complete (c precedes the only b) → skip
    // branch matches the earlier c, b reported UNBOUND
    val s = p.eval(0, Seq((0, 30, 1), (1, 20, 2)))
    assert(s.matched && s.id("b").isEmpty && s.id("c").contains(2L))
    // neither completes → greedy partial (dangling b reported)
    val n = p.eval(0, Seq((0, 30, 1)))
    assert(!n.matched && n.id("b").contains(1L) && n.id("c").isEmpty)
  }

  test("notFollowedBy: matched iff absent, violation hit reported") {
    val p = Cep.begin(W).notFollowedBy("c", 1)
    assert(p.eval(0, Seq((0, 10, 1))).matched)
    val v = p.eval(0, Seq((1, 50, 9)))
    assert(!v.matched && v.id("c").contains(9L))
    // out-of-window violation doesn't count
    assert(p.eval(0, Seq((1, 150, 9))).matched)
  }

  test("notFollowedBy scans from the previous binding, not the anchor") {
    val p = Cep.begin(W).followedBy("b", 0).notFollowedBy("c", 1)
    // c BEFORE b: not a violation of "b not followed by c"
    val o = p.eval(0, Seq((1, 5, 9), (0, 10, 1)))
    assert(o.matched && o.id("b").contains(1L))
    val v = p.eval(0, Seq((0, 10, 1), (1, 15, 9)))
    assert(!v.matched)
  }

  test("next(): only the IMMEDIATELY following event can bind") {
    val p = Cep.begin(W).next("b", 0)
    // immediate type-0 → bound
    assert(p.eval(0, Seq((0, 10, 1), (1, 20, 2))).id("b").contains(1L))
    // an intervening type-1 breaks contiguity — no binding at all
    val broken = p.eval(0, Seq((1, 5, 9), (0, 10, 1)))
    assert(!broken.matched && broken.bindings.isEmpty)
    // empty window → unmatched
    assert(!p.eval(0, Seq((0, 150, 1))).matched)
    // tie at the same ts: lower id IS the next event
    assert(p.eval(0, Seq((0, 10, 3), (1, 10, 7))).id("b").contains(3L))
    assert(!p.eval(0, Seq((1, 10, 3), (0, 10, 7))).matched)
    // chains: the step after next() scans from the bound event
    val q = Cep.begin(W).next("b", 0).followedBy("c", 1)
    val o = q.eval(0, Seq((0, 10, 1), (1, 30, 2)))
    assert(o.matched && o.id("b").contains(1L) && o.id("c").contains(2L))
  }

  test("builder rejects duplicate names and post-negation steps") {
    intercept[IllegalArgumentException] {
      Cep.begin(W).followedBy("b", 0).followedBy("b", 1)
    }
    intercept[IllegalArgumentException] {
      Cep.begin(W).notFollowedBy("c", 1).followedBy("b", 0)
    }
  }

  test("wantedTypes lists exactly the referenced type codes") {
    assert(Cep.begin(W).notFollowedBy("c", 1).wantedTypes == Set(1))
    assert(abc.wantedTypes == Set(0, 1))
  }

  test("followedByIf (round-13): the value predicate REJECTS an " +
      "earlier, cheaper purchase and binds the first qualifying one") {
    val p = Cep.begin(W).followedByIf("purchase", 1, Cep.Gt)
    // anchor value 50: the ts-10 purchase (40, cheaper) is SKIPPED,
    // not a match-ender — the ts-20 purchase (60) binds
    val o = p.eval(0, 50.0, Seq((1, 10, 1, 40.0), (1, 20, 2, 60.0)))
    assert(o.matched && o.id("purchase").contains(2L))
    assert(o.value("purchase").contains(60.0))
    // only cheaper ones in window → unmatched, nothing bound
    val n = p.eval(0, 50.0, Seq((1, 10, 1, 40.0), (1, 30, 2, 50.0)))
    assert(!n.matched && n.bindings.isEmpty)
    // Gt is strict: an equal-value purchase does not qualify (above),
    // Ge admits it
    val ge = Cep.begin(W).followedByIf("purchase", 1, Cep.Ge)
    assert(ge.eval(0, 50.0, Seq((1, 30, 2, 50.0))).matched)
    // the legacy value-free eval refuses iterative-condition patterns
    intercept[IllegalArgumentException] {
      p.eval(0, Seq((1, 10, 1)))
    }
  }

  test("followedByIf ref resolves a PRIOR step's bound value") {
    // purchase must be >= the bound click's value, not the anchor's
    val p = Cep.begin(W).followedBy("click", 0)
      .followedByIf("purchase", 1, Cep.Ge, ref = "click")
    val o = p.eval(0, 999.0,
      Seq((0, 5, 1, 30.0), (1, 10, 2, 20.0), (1, 15, 3, 30.0)))
    assert(o.matched && o.id("purchase").contains(3L))
    assert(o.value("click").contains(30.0))
    // builder rejects an unknown / non-single-bind ref
    intercept[IllegalArgumentException] {
      Cep.begin(W).followedByIf("p", 1, Cep.Gt, ref = "nope")
    }
    intercept[IllegalArgumentException] {
      Cep.begin(W).followedBy("c", 0, times = 2)
        .followedByIf("p", 1, Cep.Gt, ref = "c")
    }
  }
}
