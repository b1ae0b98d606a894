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
    * match (the cascade-null outputs every pattern query emits). */
  final case class Outcome(bindings: Map[String, Hit],
      counts: Map[String, Long], matched: Boolean) {
    def id(name: String): Option[Long] = bindings.get(name).map(_._2)
    def ts(name: String): Option[Long] = bindings.get(name).map(_._1)
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

    /** Event types the pattern reads — the processor buffers only these
      * (an absence pattern halves its state by skipping the rest). */
    def wantedTypes: Set[Int] = steps.flatMap {
      case UntilClose(_, tc, _, closeTc) => Seq(tc, closeTc)
      case s => Seq(s.typeCode)
    }.toSet

    /** True when a strict-contiguity step is present: deciding "the
      * immediately following event" needs every alphabet type in the
      * buffer, so the processor must ignore [[wantedTypes]] filtering. */
    def needsAllTypes: Boolean = steps.exists(_.isInstanceOf[Next])

    /** Evaluate against one anchor's sealed window. `events` is the
      * buffered (typeCode, tsUs, eventId) rows; scans are bounded by
      * (anchorTs, anchorTs + windowUs]. */
    def eval(anchorTs: Long, events: Seq[(Int, Long, Long)]): Outcome = {
      val deadline = anchorTs + windowUs
      def firstOf(tc: Int, lo: Long): Option[Hit] =
        events.iterator
          .filter { case (t, ts, _) => t == tc && ts > lo && ts <= deadline }
          .reduceOption { (a, b) =>
            if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) a else b }
          .map { case (_, ts, id) => (ts, id) }

      def go(rest: List[Step], lo: Long)
          : (Map[String, Hit], Map[String, Long], Boolean) = rest match {
        case Nil => (Map.empty, Map.empty, true)

        case Bind(name, tc, n) :: tail =>
          val hits = Vector.newBuilder[(String, Hit)]
          var cur = lo
          var bound = 0
          var miss = false
          while (bound < n && !miss) firstOf(tc, cur) match {
            case Some(h) =>
              bound += 1
              hits += (if (n == 1) name else s"$name$bound") -> h
              cur = h._1
            case None => miss = true
          }
          if (miss) (hits.result().toMap, Map.empty, false)
          else {
            val (b, c, m) = go(tail, cur)
            (hits.result().toMap ++ b, c, m)
          }

        case OneOrMore(name, tc) :: tail =>
          firstOf(tc, lo) match {
            case None => (Map.empty, Map.empty, false)
            case Some(pivot) =>
              val (b, c, m) = go(tail, pivot._1)
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
                  case (t, ts, _) =>
                    t == tc && ts > lo && ts < hi && ts <= deadline
                }.toLong)
              }
              (Map(name -> pivot) ++ b, cc, m)
          }

        case UntilClose(name, tc, closeName, closeTc) :: tail =>
          // the close is the pattern's progress point; loop occurrences
          // count strictly between the previous binding and the close
          // (zero admitted — the loop itself binds nothing)
          firstOf(closeTc, lo) match {
            case None => (Map.empty, Map.empty, false)
            case Some(close) =>
              val (b, c, m) = go(tail, close._1)
              // count only on a full match, like OneOrMore's absorb
              val cc = if (!m) c else c + (name -> events.count {
                case (t, ts, _) => t == tc && ts > lo && ts < close._1
              }.toLong)
              (Map(closeName -> close) ++ b, cc, m)
          }

        case Opt(name, tc) :: tail =>
          firstOf(tc, lo) match {
            case Some(h) =>
              val greedy = go(tail, h._1)
              if (greedy._3) (Map(name -> h) ++ greedy._1, greedy._2, true)
              else {
                val skip = go(tail, lo)
                if (skip._3) skip
                else (Map(name -> h) ++ greedy._1, greedy._2, false)
              }
            case None => go(tail, lo)
          }

        case Next(name, tc) :: tail =>
          // first event of ANY buffered type strictly after lo — the
          // caller guarantees the buffer holds the full alphabet
          // (needsAllTypes); a non-matching immediate event fails the
          // step with no binding (strict contiguity admits no gap)
          val nxt = events.iterator
            .filter { case (_, ts, _) => ts > lo && ts <= deadline }
            .reduceOption { (a, b) =>
              if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) a else b }
          nxt match {
            case Some((t, ts, id)) if t == tc =>
              val (b, c, m) = go(tail, ts)
              (Map(name -> ((ts, id))) ++ b, c, m)
            case _ => (Map.empty, Map.empty, false)
          }

        case Absent(name, tc) :: tail =>
          firstOf(tc, lo) match {
            case Some(h) =>
              val (b, c, _) = go(tail, lo)
              (Map(name -> h) ++ b, c, false)
            case None => go(tail, lo)
          }
      }

      val (b, c, m) = go(steps.toList, anchorTs)
      Outcome(b, c, m)
    }
  }
}
