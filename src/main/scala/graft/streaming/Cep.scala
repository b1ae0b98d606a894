package graft.streaming

/** Composable CEP pattern surface — the Flink-CEP library face
  * (`Pattern.begin(...).followedBy(...).notFollowedBy(...).times(n).
  * optional().oneOrMore().within(...)`) re-expressed for the sealed-
  * buffer evaluation model the `stream_pattern_*` operators run on.
  *
  * Division of labor: the buffered-window machinery in
  * [[StreamingOps]] (per-key event buffer, watermark-sealed timers,
  * `within()`-bounded eviction) supplies WHEN a pattern window is final;
  * a [[Cep.Pattern]] supplies WHAT to match in it. A pattern compiles to
  * a pure function over the sealed buffer — evaluated exactly once per
  * anchor, in `handleExpiredTimer`, where every "first"/"count"/"absent"
  * is decidable. This keeps the library face declarative while the
  * state-bound guarantees stay in one audited place, instead of one
  * hand-built automaton per query (the round-6 parity gap: capability
  * was proven, the composable API face was missing).
  *
  * Matching semantics (deterministic, Flink relaxed contiguity):
  *  - anchor: the keyed stream's trigger event (the processor's
  *    "begin"); all step scans are bounded by (anchor ts, anchor ts +
  *    window].
  *  - `followedBy` binds the FIRST event of the step's type strictly
  *    after the previous binding (ties broken by event id) — the same
  *    total order every hand-built verdict used. `times(n)` chains n
  *    such first-matches, bound as name1..nameN.
  *  - an unbound step cascade-nulls everything after it (partial
  *    bindings are reported; `matched` = false).
  *  - `optional` is GREEDY: the with-step chain is attempted first and
  *    kept iff the REMAINDER completes; otherwise the skip branch is
  *    tried; if neither completes, the greedy partial is reported.
  *  - `oneOrMore` (greedy) binds its first occurrence as the chain
  *    pivot; once the remainder completes it absorbs every occurrence
  *    strictly between the previous step's binding and the earliest
  *    later-step binding (the window end when nothing later binds —
  *    e.g. a terminal `oneOrMore`); count exposed via
  *    [[Cep.Outcome.counts]]. Both bounds are the relaxed-contiguity
  *    reading: occurrences before the pattern's progress point or
  *    after the close never count, wherever the step sits in the chain.
  *  - `notFollowedBy` is terminal negation: decidable only at seal
  *    (any earlier emission could be voided by a late in-window event);
  *    a violating hit is reported under the step's name and fails the
  *    match.
  *
  * Events are (typeCode, tsMicros, eventId) rows — the buffer shape of
  * `AbcBufferProcessor`. The anchor event type and the string→typeCode
  * mapping are processor PARAMETERS (round-8): the processor owns the
  * input schema, the pattern owns the composition, and a query picks
  * both — `stream_funnel` anchors on signups over purchase-only
  * buffering through the same class that runs the click/purchase
  * patterns.
  */
object Cep {

  /** A bound step's match: (tsMicros, eventId). */
  type Hit = (Long, Long)

  sealed trait Step extends Serializable {
    def name: String
    def typeCode: Int
  }
  /** `times` chained first-matches of `typeCode` (followedBy = 1). */
  final case class Bind(name: String, typeCode: Int, times: Int)
    extends Step
  /** Value comparison for [[BindIf]] — DECLARATIVE by design (an
    * arbitrary Scala closure would be opaque to the batch compiler and
    * inexpressible as oracle SQL; the four comparators cover the
    * iterative-condition queries the reference surface runs). */
  sealed trait Cmp extends Serializable
  case object Gt extends Cmp
  case object Ge extends Cmp
  case object Lt extends Cmp
  case object Le extends Cmp
  /** Iterative condition (round-13; the Flink
    * `IterativeCondition`/`ctx.getEventsForPattern` analog): binds the
    * FIRST `typeCode` event strictly after the previous binding whose
    * VALUE satisfies `cmp` against the value of the `ref` binding
    * ("anchor" = the anchor event itself) — e.g. "first purchase with
    * value > the signup's value". Non-qualifying earlier events are
    * SKIPPED, not match-enders (relaxed contiguity over the predicate
    * too): a cheaper earlier purchase never blocks a later qualifying
    * one. Evaluation needs the value-carrying buffer
    * ([[Pattern.needsValues]]). */
  final case class BindIf(name: String, typeCode: Int, ref: String,
      cmp: Cmp) extends Step
  /** Greedy optional step (Flink `optional()`). */
  final case class Opt(name: String, typeCode: Int) extends Step
  /** Strict contiguity (Flink `next()`): binds iff the IMMEDIATELY
    * following event — of ANY type in the processor's alphabet — is of
    * `typeCode`; any intervening event fails the step. Patterns with a
    * Next step need the FULL alphabet buffered ([[Pattern.needsAllTypes]]
    * — "immediately following" is undecidable over a filtered buffer). */
  final case class Next(name: String, typeCode: Int) extends Step
  /** Greedy one-or-more (Flink `oneOrMore().greedy()`). */
  final case class OneOrMore(name: String, typeCode: Int) extends Step
  /** ZERO-or-more loop ended by a required closing step — an
    * ADAPTATION of Flink's `oneOrMore().until(condition)` under
    * `within()`, not parity with it: Flink's loop requires ≥ 1
    * occurrence and `until()` is a PRUNING stop condition that need
    * not fire, whereas this step is A B* C-within-window — the loop
    * admits zero occurrences (unlike [[OneOrMore]]) and the close is
    * a REQUIRED binding (unlike a stop condition). What makes the
    * bounded form sealable where the open `until` is not (§2.H
    * impossibility note) is the window: the `within()` horizon, not
    * the stop condition, bounds the buffer. Binds `closeName` to the
    * FIRST `closeTc` event after the previous binding and counts loop
    * occurrences strictly between; an open loop (no close within the
    * window) fails with no binding and a null count, the batch
    * `events_pattern_until` open-pattern shape with the window as the
    * extra horizon. */
  final case class UntilClose(name: String, typeCode: Int,
      closeName: String, closeTc: Int) extends Step
  /** Terminal negation (Flink `notFollowedBy()` + `within()`). */
  final case class Absent(name: String, typeCode: Int) extends Step

  /** One sealed-window evaluation: partial bindings survive a failed
    * match (the cascade-null outputs every pattern query emits).
    * `values` carries each bound step's event value — populated only
    * by the value-carrying eval (empty under the legacy 3-tuple one,
    * where no step reads values). */
  final case class Outcome(bindings: Map[String, Hit],
      counts: Map[String, Long], matched: Boolean,
      values: Map[String, Double] = Map.empty) {
    def id(name: String): Option[Long] = bindings.get(name).map(_._2)
    def ts(name: String): Option[Long] = bindings.get(name).map(_._1)
    def value(name: String): Option[Double] = values.get(name)
  }

  /** Start a pattern: the anchor is the processor's trigger event, all
    * steps must land within `windowUs` of it (Flink `within()`). */
  def begin(windowUs: Long): Pattern = Pattern(Vector.empty, windowUs)

  final case class Pattern(steps: Vector[Step], windowUs: Long) {

    private def append(s: Step): Pattern = {
      require(!steps.exists(_.name == s.name), s"duplicate step ${s.name}")
      require(!steps.lastOption.exists(_.isInstanceOf[Absent]),
        "notFollowedBy is terminal")
      copy(steps = steps :+ s)
    }

    def followedBy(name: String, typeCode: Int, times: Int = 1): Pattern =
      { require(times >= 1); append(Bind(name, typeCode, times)) }
    def optionallyFollowedBy(name: String, typeCode: Int): Pattern =
      append(Opt(name, typeCode))
    def oneOrMoreGreedy(name: String, typeCode: Int): Pattern =
      append(OneOrMore(name, typeCode))
    def oneOrMoreUntil(name: String, typeCode: Int,
        closeName: String, closeTc: Int): Pattern = {
      require(!steps.exists(_.name == closeName),
        s"duplicate step $closeName")
      append(UntilClose(name, typeCode, closeName, closeTc))
    }
    def notFollowedBy(name: String, typeCode: Int): Pattern =
      append(Absent(name, typeCode))
    def next(name: String, typeCode: Int): Pattern =
      append(Next(name, typeCode))
    /** Iterative condition: first `typeCode` event whose value
      * satisfies `cmp` against the `ref` binding's value ("anchor" =
      * the anchor event). `ref` must be the anchor or an already-added
      * binding step. */
    def followedByIf(name: String, typeCode: Int, cmp: Cmp,
        ref: String = "anchor"): Pattern = {
      require(ref == "anchor" || steps.exists {
        case Bind(n, _, 1) => n == ref
        case BindIf(n, _, _, _) => n == ref
        case _ => false
      }, s"followedByIf ref '$ref' is not the anchor or a prior " +
        "single-bind step")
      append(BindIf(name, typeCode, ref, cmp))
    }

    /** Event types the pattern reads — the processor buffers only these
      * (an absence pattern halves its state by skipping the rest). */
    def wantedTypes: Set[Int] = steps.flatMap {
      case UntilClose(_, tc, _, closeTc) => Seq(tc, closeTc)
      case s => Seq(s.typeCode)
    }.toSet

    /** True when an iterative-condition step is present: evaluation
      * needs the value-carrying buffer (the 4-tuple eval). */
    def needsValues: Boolean = steps.exists(_.isInstanceOf[BindIf])

    /** True when a strict-contiguity step is present: deciding "the
      * immediately following event" needs every alphabet type in the
      * buffer, so the processor must ignore [[wantedTypes]] filtering. */
    def needsAllTypes: Boolean = steps.exists(_.isInstanceOf[Next])

    /** Evaluate against one anchor's sealed window — the legacy
      * value-free buffer shape (typeCode, tsUs, eventId); only valid
      * for patterns with no iterative-condition steps. */
    def eval(anchorTs: Long, events: Seq[(Int, Long, Long)]): Outcome = {
      require(!needsValues, "pattern has followedByIf steps — " +
        "evaluate with the value-carrying eval(anchorTs, anchorVal, " +
        "events)")
      // strip the all-zero values: the legacy buffer carries none, and
      // reporting fabricated 0.0s would change Outcome equality for
      // every existing caller
      eval(anchorTs, 0.0,
        events.map { case (t, ts, id) => (t, ts, id, 0.0) })
        .copy(values = Map.empty)
    }

    /** Evaluate against one anchor's sealed window. `events` is the
      * buffered (typeCode, tsUs, eventId, value) rows; scans are
      * bounded by (anchorTs, anchorTs + windowUs]. `anchorVal` is the
      * anchor event's value — the "anchor" ref every [[BindIf]] may
      * compare against. */
    def eval(anchorTs: Long, anchorVal: Double,
        events: Seq[(Int, Long, Long, Double)]): Outcome = {
      val deadline = anchorTs + windowUs
      // (ts, id, value) of the first in-window `tc` event after `lo`
      // whose value passes `p` — the shared first-match total order
      def firstWhere(tc: Int, lo: Long, p: Double => Boolean)
          : Option[(Long, Long, Double)] =
        events.iterator
          .filter { case (t, ts, _, v) =>
            t == tc && ts > lo && ts <= deadline && p(v) }
          .reduceOption { (a, b) =>
            if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) a else b }
          .map { case (_, ts, id, v) => (ts, id, v) }
      def firstOf(tc: Int, lo: Long): Option[(Long, Long, Double)] =
        firstWhere(tc, lo, _ => true)

      // (bindings, counts, matched, bound-step values); `env` maps the
      // anchor + every already-bound single step to its value, so an
      // iterative condition resolves its ref in O(1)
      type R = (Map[String, Hit], Map[String, Long], Boolean,
        Map[String, Double])
      def go(rest: List[Step], lo: Long, env: Map[String, Double]): R =
        rest match {
        case Nil => (Map.empty, Map.empty, true, Map.empty)

        case Bind(name, tc, n) :: tail =>
          val hits = Vector.newBuilder[(String, Hit)]
          var vals = Map.empty[String, Double]
          var cur = lo
          var bound = 0
          var miss = false
          while (bound < n && !miss) firstOf(tc, cur) match {
            case Some(h) =>
              bound += 1
              val nm = if (n == 1) name else s"$name$bound"
              hits += nm -> ((h._1, h._2))
              vals += nm -> h._3
              cur = h._1
            case None => miss = true
          }
          if (miss) (hits.result().toMap, Map.empty, false, vals)
          else {
            val (b, c, m, v) = go(tail, cur, env ++ vals)
            (hits.result().toMap ++ b, c, m, vals ++ v)
          }

        case BindIf(name, tc, ref, cmp) :: tail =>
          // iterative condition: the first-match scan additionally
          // filters on the value predicate — a non-qualifying earlier
          // event is skipped, never a match-ender
          val rv = env(ref)
          firstWhere(tc, lo, v => cmpOk(cmp, v, rv)) match {
            case None => (Map.empty, Map.empty, false, Map.empty)
            case Some(h) =>
              val (b, c, m, v) = go(tail, h._1, env + (name -> h._3))
              (Map(name -> ((h._1, h._2))) ++ b, c, m,
                v + (name -> h._3))
          }

        case OneOrMore(name, tc) :: tail =>
          firstOf(tc, lo) match {
            case None => (Map.empty, Map.empty, false, Map.empty)
            case Some(pivot) =>
              val (b, c, m, v) = go(tail, pivot._1, env)
              // the close = the EARLIEST later-step binding (every hit
              // in b is from a step after this one, so the min ts is
              // the first event the remainder consumed — robust to a
              // skipped Opt or a chained quantifier head, where
              // inspecting only tail.head missed the close). A matched
              // tail with no bindings (terminal oneOrMore, or only
              // skipped/absent steps after it) absorbs to the window
              // end. Absorbed occurrences lie strictly between the
              // PREVIOUS step's binding (lo — not the anchor: for a
              // mid-pattern quantifier, occurrences before the
              // pattern's progress point never count) and the close.
              val cc = if (!m) c else {
                val hi = b.values.map(_._1).minOption
                  .getOrElse(deadline + 1L)
                c + (name -> events.count {
                  case (t, ts, _, _) =>
                    t == tc && ts > lo && ts < hi && ts <= deadline
                }.toLong)
              }
              (Map(name -> ((pivot._1, pivot._2))) ++ b, cc, m,
                v + (name -> pivot._3))
          }

        case UntilClose(name, tc, closeName, closeTc) :: tail =>
          // the close is the pattern's progress point; loop occurrences
          // count strictly between the previous binding and the close
          // (zero admitted — the loop itself binds nothing)
          firstOf(closeTc, lo) match {
            case None => (Map.empty, Map.empty, false, Map.empty)
            case Some(close) =>
              val (b, c, m, v) = go(tail, close._1,
                env + (closeName -> close._3))
              // count only on a full match, like OneOrMore's absorb
              val cc = if (!m) c else c + (name -> events.count {
                case (t, ts, _, _) => t == tc && ts > lo && ts < close._1
              }.toLong)
              (Map(closeName -> ((close._1, close._2))) ++ b, cc, m,
                v + (closeName -> close._3))
          }

        case Opt(name, tc) :: tail =>
          firstOf(tc, lo) match {
            case Some(h) =>
              val hit = (h._1, h._2)
              val greedy = go(tail, h._1, env + (name -> h._3))
              if (greedy._3)
                (Map(name -> hit) ++ greedy._1, greedy._2, true,
                  greedy._4 + (name -> h._3))
              else {
                val skip = go(tail, lo, env)
                if (skip._3) skip
                else (Map(name -> hit) ++ greedy._1, greedy._2, false,
                  greedy._4 + (name -> h._3))
              }
            case None => go(tail, lo, env)
          }

        case Next(name, tc) :: tail =>
          // first event of ANY buffered type strictly after lo — the
          // caller guarantees the buffer holds the full alphabet
          // (needsAllTypes); a non-matching immediate event fails the
          // step with no binding (strict contiguity admits no gap)
          val nxt = events.iterator
            .filter { case (_, ts, _, _) => ts > lo && ts <= deadline }
            .reduceOption { (a, b) =>
              if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) a else b }
          nxt match {
            case Some((t, ts, id, v0)) if t == tc =>
              val (b, c, m, v) = go(tail, ts, env + (name -> v0))
              (Map(name -> ((ts, id))) ++ b, c, m, v + (name -> v0))
            case _ => (Map.empty, Map.empty, false, Map.empty)
          }

        case Absent(name, tc) :: tail =>
          firstOf(tc, lo) match {
            case Some(h) =>
              val (b, c, _, v) = go(tail, lo, env)
              // the violating hit's value rides along — invariant:
              // values.keySet == bindings.keySet under the value eval
              (Map(name -> ((h._1, h._2))) ++ b, c, false,
                v + (name -> h._3))
            case None => go(tail, lo, env)
          }
      }

      val (b, c, m, v) =
        go(steps.toList, anchorTs, Map("anchor" -> anchorVal))
      Outcome(b, c, m, v)
    }
  }

  private def cmpOk(cmp: Cmp, v: Double, ref: Double): Boolean =
    cmp match {
      case Gt => v > ref
      case Ge => v >= ref
      case Lt => v < ref
      case Le => v <= ref
    }
}
