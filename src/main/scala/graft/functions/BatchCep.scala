package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.streaming.Cep

/** Batch evaluation of a [[Cep.Pattern]] — the round-8 generator that
  * makes the `events_pattern_*` batch ops and their `stream_pattern_*`
  * twins PROVABLY the same pattern: both faces now consume the one
  * Pattern object (the streaming side via `CepPatternProcessor`'s
  * sealed-buffer `Cep.eval`, this side by compiling the step list to
  * the join algebra the hand-written batch queries used), so a verdict
  * divergence can only be an engine bug, never a spec drift.
  *
  * The compilation emits exactly the four leg shapes every hand-built
  * batch pattern query was made of — nothing else, so the plans (and
  * their scale posture) are unchanged:
  *
  *  - ANCHOR scan: the anchor-typed events become one row per pending
  *    match, carrying (user_id, anchor_id, anchor_ts).
  *  - BIND leg (`followedBy` / `times` chain link / `oneOrMore` pivot):
  *    one time-bounded equi-join on user_id ((lo, anchor+W] window) +
  *    a min-struct aggregation — earliest (ts, id) wins, the same
  *    total order as `Cep.eval`'s firstOf; an unbound step cascades
  *    null through the remaining legs via the null join bound. Each
  *    leg is a hash-partitioned shuffle join + partial agg, never a
  *    per-user nested loop; AQE handles hot users.
  *  - COUNT leg (`oneOrMore` absorption): one bounded count join over
  *    (previous binding, close) where close = the earliest later
  *    binding (the window end for a terminal quantifier) — the bounds
  *    `Cep.eval` uses since the round-8 relaxed-contiguity fix.
  *  - ABSENT leg (terminal `notFollowedBy`): one left-anti join over
  *    (lo, anchor+W]. A pattern ending in negation yields MATCHED rows
  *    only (the anti-join survivors), so its earlier bind legs run as
  *    inner joins — a partially-bound anchor can never match, and the
  *    anti-join must not resurrect it through a null scan bound.
  *  - OPT branch (`optional`, greedy): the with-step chain and the
  *    skip chain are built as two leg sequences sharing the prefix
  *    state and resolved by one equi-join on anchor_id + `when`
  *    projections (kept iff the with-remainder completes, else the
  *    skip remainder, else the greedy partial) — a coalesce, not a
  *    loop, exactly the hand-written `events_pattern_optional` shape.
  *
  * Output: one row per anchor (per surviving anchor when the pattern
  * ends in `notFollowedBy`) with `user_id, anchor_id, anchor_ts` plus
  * `<step>_id`/`<step>_ts` per bound step (`<name><k>_…` for a
  * times-chain) and `<name>_count` per quantifier (null unless the
  * full pattern matched, like the streaming outcome's counts map).
  *
  * Supported compositions mirror the registered patterns; the builder
  * already guarantees negation is terminal, and this compiler
  * additionally requires at most one `optional` with only plain
  * `followedBy` steps after it, and only plain `followedBy` steps
  * after a quantifier (the close must be a deterministic binding).
  */
object BatchCep {

  /** Evaluate `pattern` over `ev` (columns `user_id, event_id, ts_us,
    * event_type`). `typeNames` maps the pattern's int type codes to
    * event_type strings; `anchorType` picks the anchor rows. */
  def bindings(ev: DataFrame, pattern: Cep.Pattern, anchorType: String,
      typeNames: Map[Int, String],
      fullAlphabet: Boolean = false): DataFrame = {
    val W = pattern.windowUs
    val matchedOnly = pattern.steps.lastOption.exists(_.isInstanceOf[Cep.Absent])
    // Strict contiguity is undecidable over a type-filtered candidate
    // set: a next() leg scans typeNames' values, so a partial map (the
    // 2-type default most patterns use) would silently yield wrong
    // strictness verdicts. The streaming twin enforces this via
    // Pattern.needsAllTypes (it buffers every configured type); here
    // the caller must OPT IN by passing the complete event alphabet
    // and saying so — round-9 guard, was doc-comment-only.
    require(!pattern.needsAllTypes || fullAlphabet,
      "BatchCep: a next() pattern decides strictness over EVERY event " +
        "type — pass the complete event alphabet as typeNames and set " +
        "fullAlphabet = true")

    // Value patterns (round-13, followedByIf) thread each binding's
    // event value through the legs as `<name>_value` columns; plain
    // patterns carry none, so their compiled plans (and output
    // schemas) stay byte-identical to pre-round-13.
    val needsVals = pattern.steps.exists(_.isInstanceOf[Cep.BindIf])

    def cand(tc: Int): DataFrame = {
      val cols = Seq(col("user_id").as("cand_user"),
        col("event_id").as("cand_id"), col("ts_us").as("cand_ts")) ++
        (if (needsVals) Seq(col("value").as("cand_value")) else Nil)
      ev.filter(col("event_type") === typeNames(tc)).select(cols: _*)
    }

    final case class State(df: DataFrame, groupCols: Vector[String],
        lo: String)

    // One bind leg: first `tc` event in (lo, anchor_ts + W], min-struct
    // pick, binding columns appended to the carried group key.
    def bindLeg(st: State, stepName: String, tc: Int,
        inner: Boolean, extraPred: Option[Column] = None): State = {
      // an iterative condition (followedByIf) is one extra conjunct on
      // the same time-bounded equi-join — the min-struct pick then
      // lands on the first QUALIFYING event, so a non-qualifying
      // earlier event is skipped exactly as Cep.eval's filtered scan
      val joined = st.df.join(cand(tc),
        extraPred.foldLeft(
          col("user_id") === col("cand_user") &&
            col("cand_ts") > col(st.lo) &&
            col("cand_ts") <= col("anchor_ts") + lit(W))(_ && _),
        if (inner) "inner" else "left")
      val structCols =
        Seq(col("cand_ts"), col("cand_id")) ++
          (if (needsVals) Seq(col("cand_value")) else Nil)
      val pick =
        if (inner) min(struct(structCols: _*))
        else min(when(col("cand_id").isNotNull, struct(structCols: _*)))
      val outCols = Seq(
        col("h.cand_ts").as(s"${stepName}_ts"),
        col("h.cand_id").as(s"${stepName}_id")) ++
        (if (needsVals) Seq(col("h.cand_value").as(s"${stepName}_value"))
         else Nil)
      val agg = joined.groupBy(st.groupCols.map(col): _*)
        .agg(pick.as("h"))
        .select(st.groupCols.map(col) ++ outCols: _*)
      val bound = Seq(s"${stepName}_ts", s"${stepName}_id") ++
        (if (needsVals) Seq(s"${stepName}_value") else Nil)
      State(agg, st.groupCols ++ bound, s"${stepName}_ts")
    }

    // Steps strictly after an Opt must be plain Binds (checked below);
    // run them as a chain and report the name list for resolution.
    def bindChain(st: State, steps: List[Cep.Step],
        inner: Boolean): (State, Vector[String]) =
      steps.foldLeft((st, Vector.empty[String])) {
        case ((s0, names), Cep.Bind(name, tc, n)) =>
          (1 to n).foldLeft((s0, names)) { case ((s1, ns), k) =>
            val nm = if (n == 1) name else s"$name$k"
            (bindLeg(s1, nm, tc, inner), ns :+ nm)
          }
        case (_, other) => throw new IllegalArgumentException(
          s"BatchCep: unsupported step after optional/quantifier: $other")
      }

    val anchorCols = Seq(col("user_id"),
      col("event_id").as("anchor_id"), col("ts_us").as("anchor_ts")) ++
      (if (needsVals) Seq(col("value").as("anchor_value")) else Nil)
    val anchors = ev.filter(col("event_type") === anchorType)
      .select(anchorCols: _*)
    var st = State(anchors,
      Vector("user_id", "anchor_id", "anchor_ts") ++
        (if (needsVals) Vector("anchor_value") else Vector.empty),
      "anchor_ts")
    // (quantifier name, type code, lo column at the quantifier's step,
    // step names bound after it — the close candidates in chain order)
    var quant: Option[(String, Int, String)] = None
    var afterQuant = Vector.empty[String]

    var rest = pattern.steps.toList
    while (rest.nonEmpty) rest match {
      case Cep.Bind(name, tc, n) :: tail =>
        (1 to n).foreach { k =>
          val nm = if (n == 1) name else s"$name$k"
          st = bindLeg(st, nm, tc, matchedOnly)
          if (quant.isDefined) afterQuant :+= nm
        }
        rest = tail

      case Cep.BindIf(name, tc, ref, cmp) :: tail =>
        // iterative condition: candidate value vs the ref binding's
        // value (the anchor's, or a prior step's carried column) as
        // one extra join conjunct — the builder guarantees the ref is
        // bound before this step, so the column exists in groupCols
        val refCol =
          if (ref == "anchor") col("anchor_value")
          else col(s"${ref}_value")
        val pred = cmp match {
          case Cep.Gt => col("cand_value") > refCol
          case Cep.Ge => col("cand_value") >= refCol
          case Cep.Lt => col("cand_value") < refCol
          case Cep.Le => col("cand_value") <= refCol
        }
        st = bindLeg(st, name, tc, matchedOnly, Some(pred))
        if (quant.isDefined) afterQuant :+= name
        rest = tail

      case Cep.Next(name, tc) :: tail =>
        // strict contiguity: one min-struct leg over the FULL alphabet
        // (the struct carries the type), resolved to a null binding
        // when the immediate event mismatches — strictness over a
        // type-filtered candidate set would be wrong, which is why
        // `typeNames` for a Next pattern must map every event type
        // (mirror of Cep.Pattern.needsAllTypes on the streaming side)
        require(!matchedOnly,
          "BatchCep: next() inside a negation pattern is unsupported")
        val allCand = ev
          .filter(col("event_type").isin(typeNames.values.toSeq: _*))
          .select(col("user_id").as("cand_user"),
            col("event_id").as("cand_id"), col("ts_us").as("cand_ts"),
            col("event_type").as("cand_type"))
        val joined = st.df.join(allCand,
          col("user_id") === col("cand_user") &&
            col("cand_ts") > col(st.lo) &&
            col("cand_ts") <= col("anchor_ts") + lit(W), "left")
        val agg = joined.groupBy(st.groupCols.map(col): _*)
          .agg(min(when(col("cand_id").isNotNull,
            struct(col("cand_ts"), col("cand_id"), col("cand_type"))))
            .as("h"))
        val isMatch = col("h.cand_type") === typeNames(tc)
        val sel = agg.select(st.groupCols.map(col) ++ Seq(
          when(isMatch, col("h.cand_ts")).as(s"${name}_ts"),
          when(isMatch, col("h.cand_id")).as(s"${name}_id")): _*)
        st = State(sel,
          st.groupCols ++ Seq(s"${name}_ts", s"${name}_id"),
          s"${name}_ts")
        if (quant.isDefined) afterQuant :+= name
        rest = tail

      case Cep.OneOrMore(name, tc) :: tail =>
        require(quant.isEmpty, "BatchCep: one quantifier per pattern")
        val loAtQuant = st.lo
        st = bindLeg(st, name, tc, matchedOnly) // the greedy pivot
        quant = Some((name, tc, loAtQuant))
        rest = tail

      case Cep.UntilClose(name, tc, closeName, closeTc) :: tail =>
        // round-11: the bounded until — one bind leg for the REQUIRED
        // close, then the shared quantifier count join with the close
        // as the (only) later binding; zero loop occurrences are
        // admitted because no pivot leg runs (the count join's
        // left-join count handles zero), and `matchedNow` in the final
        // quant block keys off the close binding exactly as eval does
        require(quant.isEmpty, "BatchCep: one quantifier per pattern")
        val loAtQuant = st.lo
        st = bindLeg(st, closeName, closeTc, matchedOnly)
        quant = Some((name, tc, loAtQuant))
        afterQuant :+= closeName
        rest = tail

      case Cep.Opt(name, tc) :: tail =>
        require(quant.isEmpty,
          "BatchCep: optional after a quantifier is unsupported")
        // greedy-branch resolution needs a completing step after the
        // Opt (names.last below) — a pattern ENDING in optional has no
        // observable with/skip distinction and is not compiled
        require(tail.nonEmpty, "BatchCep: terminal optional is unsupported")
        // GREEDY branch resolution (see object doc). Both branches
        // carry the prefix state; the skip side renames its remainder
        // bindings so the resolving join is unambiguous.
        val (withSt, names) =
          bindChain(bindLeg(st, name, tc, inner = false), tail,
            inner = false)
        val (skipSt0, _) = bindChain(st, tail, inner = false)
        val skipSt = names.foldLeft(
          skipSt0.df.select((Vector("anchor_id") ++
            names.flatMap(n => Seq(s"${n}_ts", s"${n}_id"))).map(col): _*)) {
          (df, n) => df.withColumnRenamed(s"${n}_ts", s"sk_${n}_ts")
            .withColumnRenamed(s"${n}_id", s"sk_${n}_id")
        }.withColumnRenamed("anchor_id", "sk_anchor_id")
        val last = names.last
        val withComplete = col(s"${last}_id").isNotNull
        val skipComplete = col(s"sk_${last}_id").isNotNull
        val resolved = withSt.df.join(skipSt,
            col("anchor_id") === col("sk_anchor_id"))
          .select(st.groupCols.map(col) ++ Seq(
            when(withComplete, col(s"${name}_ts"))
              .otherwise(when(skipComplete, lit(null).cast("long"))
                .otherwise(col(s"${name}_ts"))).as(s"${name}_ts"),
            when(withComplete, col(s"${name}_id"))
              .otherwise(when(skipComplete, lit(null).cast("long"))
                .otherwise(col(s"${name}_id"))).as(s"${name}_id")) ++
            names.flatMap { n => Seq(
              when(withComplete, col(s"${n}_ts"))
                .otherwise(when(skipComplete, col(s"sk_${n}_ts"))
                  .otherwise(col(s"${n}_ts"))).as(s"${n}_ts"),
              when(withComplete, col(s"${n}_id"))
                .otherwise(when(skipComplete, col(s"sk_${n}_id"))
                  .otherwise(col(s"${n}_id"))).as(s"${n}_id"))
            }: _*)
        st = State(resolved,
          st.groupCols ++ Seq(s"${name}_ts", s"${name}_id") ++
            names.flatMap(n => Seq(s"${n}_ts", s"${n}_id")),
          s"${names.last}_ts")
        rest = Nil

      case Cep.Absent(name, tc) :: Nil =>
        // terminal negation: survivors only (matchedOnly made every
        // earlier bind leg inner, so st.lo is never null here)
        val df = st.df.join(cand(tc),
          col("user_id") === col("cand_user") &&
            col("cand_ts") > col(st.lo) &&
            col("cand_ts") <= col("anchor_ts") + lit(W),
          "left_anti")
        st = State(df, st.groupCols, st.lo)
        rest = Nil

      case other :: _ => throw new IllegalArgumentException(
        s"BatchCep: unsupported step composition at $other")
      case Nil => ()
    }

    quant match {
      case None => st.df
      case Some((name, tc, loAtQuant)) =>
        // close = earliest later binding (chain bindings are monotone
        // in ts, so the first BOUND later step is the min — coalesce in
        // chain order); a terminal quantifier absorbs to the window end
        val hi: Column =
          if (afterQuant.isEmpty) col("anchor_ts") + lit(W + 1L)
          else coalesce(afterQuant.map(n => col(s"${n}_ts")) :+
            lit(null).cast("long"): _*)
        val matchedNow: Column =
          if (afterQuant.isEmpty) col(s"${name}_id").isNotNull
          else col(s"${afterQuant.last}_id").isNotNull
        st.df.join(cand(tc),
            col("user_id") === col("cand_user") &&
              col("cand_ts") > col(loAtQuant) && col("cand_ts") < hi &&
              col("cand_ts") <= col("anchor_ts") + lit(W),
            "left")
          .groupBy(st.groupCols.map(col): _*)
          .agg(count(col("cand_id")).as("qn"))
          .select(st.groupCols.map(col) :+
            when(matchedNow, col("qn")).as(s"${name}_count"): _*)
    }
  }
}
