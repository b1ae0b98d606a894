package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Cep

/** Property suite for the Cep evaluator (round-9; the round-8 review
  * asked for it after two latent OneOrMore bound bugs were found by
  * hand): random bounded patterns × random event buffers, checked
  * against an independent REFERENCE evaluator. The reference is not a
  * second recursion: it enumerates the optional-step choice vectors in
  * the documented greedy preference order (with < skip, earlier step
  * most significant), runs each as a FLAT left-fold of single-candidate
  * steps (first-occurrence Bind chains, first-pivot quantifiers,
  * immediate-event Next, terminal Absent), takes the first vector that
  * fully matches, and recomputes quantifier counts DECLARATIVELY from
  * the final assignment (count occurrences strictly between the
  * quantifier's progress point and the earliest later binding). On
  * total failure the all-greedy vector's partial is the outcome — the
  * documented cascade-null contract. Any divergence between the two
  * formulations is an evaluator bug (or a contract drift worth
  * catching): the compositions generated here — Opt before a
  * quantifier, Next after Opt, double quantifiers, quantifier-final
  * absorb-to-window — go far beyond the 9 registered patterns. */
class CepPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private type Ev = (Int, Long, Long)
  // value-carrying buffer row (round-13, followedByIf coverage)
  private type EvV = (Int, Long, Long, Double)
  private val AnchorTs = 1000L
  private val WindowUs = 40L

  private def stepNames(s: Cep.Step): Seq[String] = s match {
    case Cep.Bind(n, _, t) =>
      if (t == 1) Seq(n) else (1 to t).map(k => s"$n$k")
    // the loop name never binds; the close is the bindable name
    case Cep.UntilClose(_, _, closeName, _) => Seq(closeName)
    case other => Seq(other.name)
  }

  /** Choice-enumeration reference (see class doc) — value-aware since
    * round-13: every binding's value is tracked (the eval invariant
    * values.keySet == bindings.keySet) and BindIf steps filter their
    * first-match scan through the cmp against the ref's tracked
    * value. */
  private def reference(p: Cep.Pattern, events: Seq[EvV],
      anchorVal: Double): Cep.Outcome = {
    val deadline = AnchorTs + p.windowUs
    val evs = events.sortBy(e => (e._2, e._3))
    def firstWhere(tc: Int, lo: Long, pr: Double => Boolean)
        : Option[(Long, Long, Double)] =
      evs.find(e => e._1 == tc && e._2 > lo && e._2 <= deadline
          && pr(e._4))
        .map(e => (e._2, e._3, e._4))
    def first(tc: Int, lo: Long): Option[(Long, Long, Double)] =
      firstWhere(tc, lo, _ => true)
    def cmpOk(c: Cep.Cmp, v: Double, r: Double): Boolean = c match {
      case Cep.Gt => v > r
      case Cep.Ge => v >= r
      case Cep.Lt => v < r
      case Cep.Le => v <= r
    }
    def immediate(lo: Long): Option[EvV] =
      evs.find(e => e._2 > lo && e._2 <= deadline)

    val optIdx = p.steps.zipWithIndex
      .collect { case (_: Cep.Opt, i) => i }
    // greedy preference order: all-with first; lexicographic with
    // earlier Opt most significant and with < skip
    val vectors: Seq[Map[Int, Boolean]] =
      (0 until (1 << optIdx.size)).map { bits =>
        optIdx.zipWithIndex.map { case (si, k) =>
          si -> (((bits >> (optIdx.size - 1 - k)) & 1) == 1)
        }.toMap
      }

    final case class Fold(b: Map[String, Cep.Hit], loAt: Map[Int, Long],
        m: Boolean, vals: Map[String, Double])
    def fold(skipOf: Map[Int, Boolean]): Fold = {
      var lo = AnchorTs
      var b = Map.empty[String, Cep.Hit]
      var vals = Map.empty[String, Double]
      var loAt = Map.empty[Int, Long]
      var failed = false
      var i = 0
      def bind(name: String, h: (Long, Long, Double)): Unit = {
        b += name -> ((h._1, h._2)); vals += name -> h._3; lo = h._1
      }
      while (i < p.steps.length && !failed) {
        loAt += i -> lo
        p.steps(i) match {
          case Cep.Bind(name, tc, n) =>
            var k = 1
            while (k <= n && !failed) first(tc, lo) match {
              case Some(h) =>
                bind(if (n == 1) name else s"$name$k", h); k += 1
              case None => failed = true
            }
          case Cep.BindIf(name, tc, ref, cmp) =>
            val rv = if (ref == "anchor") anchorVal else vals(ref)
            firstWhere(tc, lo, v => cmpOk(cmp, v, rv)) match {
              case Some(h) => bind(name, h)
              case None => failed = true
            }
          case Cep.OneOrMore(name, tc) =>
            first(tc, lo) match {
              case Some(h) => bind(name, h)
              case None => failed = true
            }
          case Cep.UntilClose(_, _, closeName, closeTc) =>
            // zero-or-more loop: only the REQUIRED close binds/advances
            first(closeTc, lo) match {
              case Some(h) => bind(closeName, h)
              case None => failed = true
            }
          case Cep.Opt(name, tc) =>
            first(tc, lo) match {
              case Some(h) if !skipOf(i) => bind(name, h)
              case _ => () // skip chosen, or no occurrence: lo unchanged
            }
          case Cep.Next(name, tc) =>
            immediate(lo) match {
              case Some((t, ts, id, v)) if t == tc =>
                bind(name, (ts, id, v))
              case _ => failed = true
            }
          case Cep.Absent(name, tc) =>
            first(tc, lo) match {
              case Some(h) =>
                b += name -> ((h._1, h._2)); vals += name -> h._3
                failed = true
              case None => ()
            }
        }
        i += 1
      }
      Fold(b, loAt, !failed, vals)
    }

    def countsOf(f: Fold): Map[String, Long] =
      p.steps.zipWithIndex.collect {
        case (Cep.OneOrMore(name, tc), i) =>
          val lo = f.loAt(i)
          val hi = p.steps.drop(i + 1).flatMap(stepNames)
            .flatMap(f.b.get).map(_._1)
            .minOption.getOrElse(deadline + 1L)
          name -> evs.count(e => e._1 == tc && e._2 > lo &&
            e._2 < hi && e._2 <= deadline).toLong
        case (Cep.UntilClose(name, tc, closeName, _), i) =>
          val lo = f.loAt(i)
          val hi = f.b.get(closeName).map(_._1)
            .getOrElse(deadline + 1L)
          name -> evs.count(e => e._1 == tc && e._2 > lo &&
            e._2 < hi && e._2 <= deadline).toLong
      }.toMap

    vectors.iterator.map(fold).find(_.m) match {
      case Some(f) => Cep.Outcome(f.b, countsOf(f), matched = true,
        f.vals)
      case None =>
        val g = fold(vectors.head) // the all-greedy cascade partial
        Cep.Outcome(g.b, Map.empty, matched = false, g.vals)
    }
  }

  // kinds: 0 bind, 1 bind x2, 2 opt, 3 oneOrMore, 4 next, 5 absent,
  // 6 untilClose (round-11; closes on (tc+1)%3 — a distinct type),
  // 7 followedByIf Gt vs anchor, 8 followedByIf Le vs the most recent
  // prior single-bind step (anchor when none precedes) — round-13
  private def build(kinds: Seq[Int], tcs: Seq[Int]): Cep.Pattern = {
    var p = Cep.begin(WindowUs)
    var refCand = "anchor"
    kinds.zip(tcs).zipWithIndex.foreach { case ((k, tc), i) =>
      val nm = s"s$i"
      p = k match {
        case 0 => refCand = nm; p.followedBy(nm, tc)
        case 1 => p.followedBy(nm, tc, times = 2)
        case 2 => p.optionallyFollowedBy(nm, tc)
        case 3 => p.oneOrMoreGreedy(nm, tc)
        case 4 => p.next(nm, tc)
        case 5 => p.notFollowedBy(nm, tc)
        case 6 => p.oneOrMoreUntil(nm, tc, s"${nm}c", (tc + 1) % 3)
        case 7 => refCand = nm; p.followedByIf(nm, tc, Cep.Gt)
        case 8 =>
          val r = refCand
          refCand = nm
          p.followedByIf(nm, tc, Cep.Le, ref = r)
      }
    }
    p
  }

  private val genCase: Gen[(Seq[Int], Seq[Int], Seq[Ev])] = for {
    len <- Gen.choose(1, 4)
    kinds <- Gen.listOfN(len - 1, Gen.oneOf(0, 1, 2, 3, 4, 6))
    last <- Gen.choose(0, 6)
    tcs <- Gen.listOfN(len, Gen.choose(0, 2))
    nEv <- Gen.choose(0, 12)
    evts <- Gen.listOfN(nEv, for {
      t <- Gen.choose(0, 2)
      dt <- Gen.choose(-5L, 55L) // spans both out-of-window sides
    } yield (t, AnchorTs + dt))
  } yield (kinds :+ last, tcs,
    // ids decoupled from ts order; duplicate ts values exercised
    evts.zipWithIndex.map { case ((t, ts), i) => (t, ts, 100L + i) })

  test("Cep.eval equals the choice-enumeration reference on 4000 " +
      "random pattern x buffer cases") {
    val cases = sample(genCase, 4000)
    assert(cases.size >= 3900, "generator discarded too many cases")
    var matched = 0
    var failedM = 0
    cases.zipWithIndex.foreach { case ((kinds, tcs, evs), ci) =>
      val p = build(kinds, tcs)
      // the value eval with zero values: identical semantics for the
      // value-free kinds, and the values maps compare too
      val evs4 = evs.map { case (t, ts, id) => (t, ts, id, 0.0) }
      val got = p.eval(AnchorTs, 0.0, evs4)
      val want = reference(p, evs4, 0.0)
      assert(got == want,
        s"case $ci diverged\n pattern: ${p.steps}\n events: $evs\n" +
          s" eval: $got\n ref:  $want")
      if (got.matched) matched += 1 else failedM += 1
    }
    assert(matched > 200 && failedM > 200,
      s"degenerate coverage: $matched matched / $failedM failed")
    // the interleavings the registered patterns never exercise must
    // actually occur in the generated population
    def has(pred: Seq[Int] => Boolean): Int =
      cases.count { case (kinds, _, _) => pred(kinds) }
    assert(has(k => k.contains(2) && k.contains(3)) > 20, "Opt+OneOrMore")
    assert(has(k => k.contains(2) && k.contains(4)) > 20, "Opt+Next")
    assert(has(k => k.contains(4) && k.contains(3)) > 20, "Next+OneOrMore")
    assert(has(k => k.count(_ == 3) >= 2) > 10, "double quantifier")
    assert(has(k => k.nonEmpty && k.last == 3) > 20, "terminal quantifier")
  }

  private val genCaseV: Gen[(Seq[Int], Seq[Int], Seq[EvV], Double)] =
    for {
      len <- Gen.choose(1, 4)
      kinds <- Gen.listOfN(len - 1, Gen.oneOf(0, 1, 2, 3, 4, 6, 7, 8))
      last <- Gen.choose(0, 8)
      tcs <- Gen.listOfN(len, Gen.choose(0, 2))
      av <- Gen.choose(0, 9)
      nEv <- Gen.choose(0, 12)
      evts <- Gen.listOfN(nEv, for {
        t <- Gen.choose(0, 2)
        dt <- Gen.choose(-5L, 55L)
        v <- Gen.choose(0, 9) // small alphabet → real Ge/Le/Gt ties
      } yield (t, AnchorTs + dt, v.toDouble))
    } yield (kinds :+ last, tcs,
      evts.zipWithIndex.map { case ((t, ts, v), i) =>
        (t, ts, 100L + i, v) },
      av.toDouble)

  test("value-carrying eval equals the reference over followedByIf " +
      "compositions on 3000 random cases") {
    val cases = sample(genCaseV, 3000)
    assert(cases.size >= 2900, "generator discarded too many cases")
    var withIf = 0
    cases.zipWithIndex.foreach { case ((kinds, tcs, evs, av), ci) =>
      val p = build(kinds, tcs)
      val got = p.eval(AnchorTs, av, evs)
      val want = reference(p, evs, av)
      assert(got == want,
        s"case $ci diverged\n pattern: ${p.steps}\n anchorVal: $av\n" +
          s" events: $evs\n eval: $got\n ref:  $want")
      if (kinds.exists(k => k == 7 || k == 8)) withIf += 1
    }
    assert(withIf > 500, s"degenerate coverage: only $withIf BindIf " +
      "cases")
    // a BindIf whose ref is a PRIOR BIND (not the anchor) must occur:
    // that's the iterative-condition composition the registered
    // pattern never exercises
    val priorRef = cases.count { case (kinds, _, _, _) =>
      kinds.zipWithIndex.exists { case (k, i) =>
        k == 8 && kinds.take(i).exists(x => x == 0 || x == 7 || x == 8)
      }
    }
    assert(priorRef > 50, s"only $priorRef prior-ref BindIf cases")
  }
}
