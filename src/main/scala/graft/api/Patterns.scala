package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.types.DataType
import scala.concurrent.duration.FiniteDuration

import graft.engine.Cep

/** Public pattern-definition DSL — the SiddhiQL pattern-clause analog.
  *
  * A reference pattern like
  * {{{ from every e1=S[type=='error'] -> e2=S[type=='click']
  *     -> e3=S[type=='purchase'] within 10 min
  *     select e1.user, e1.id, e3.value }}}
  * is written as
  * {{{
  * Patterns.begin("e1")((e, _) => e.eventType == "error")
  *   .followedBy("e2")((e, _) => e.eventType == "click")
  *   .followedBy("e3")((e, _) => e.eventType == "purchase")
  *   .within(10.minutes)
  *   .select[Out](spark, sfDir) { b => ... b("e1").head ... }
  * }}}
  *
  * Predicates see the event AND the bindings accumulated so far, so
  * cross-binding conditions (`e2.value > e1.value`) are ordinary Scala:
  * `(e, b) => e.value > b("e1").head.value`. The same builder drives both
  * execution stacks: [[PatternBuilder.select]] runs the NFA inside
  * `groupByKey.flatMapGroups` (keyed shuffle + per-key time sort — the
  * shape that scales to any key cardinality), and
  * [[PatternBuilder.selectPlan]] plans it as the custom Catalyst operator
  * ([[graft.engine.plans.PatternMatchPlan]]) whose exchange/sort the
  * planner inserts from declared requirements (and elides under
  * bucketing).
  */
object Patterns {
  private[graft] lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.api.Patterns")
  /** Event record visible to predicates (ns timestamps: exact order). */
  type Ev = Cep.Ev
  /** Accumulated bindings: step name → events bound to it, in order. */
  type Bindings = Cep.Bindings
  /** Pattern predicate: (candidate event, bindings so far) → matches? */
  type Pred = (Ev, Bindings) => Boolean

  /** Start a pattern with its first condition (`every` by default —
    * every matching event spawns an overlapping run, the reference's
    * most common spawn mode). */
  def begin(name: String)(pred: Pred): PatternBuilder =
    PatternBuilder(Vector(Cep.Single(name, pred)), None, Cep.EveryMatch)

  /** Evict re-fold history that can no longer affect any future match,
    * re-anchoring the emitted-count watermark. Pure — unit-tested directly.
    *
    * Sound only under `EveryMatch` + a `within` deadline `w`, with the cut
    * at `historyMax.tsNs - w` kept EXCLUSIVE (events at exactly the cut
    * timestamp stay), because:
    *  1. runs spawn independently at every step-0 match, so a refold over
    *     a suffix of history yields exactly the original matches whose
    *     spawn event is in the suffix (no new matches, none lost among
    *     suffix-spawned ones — under `firstOnly` this fails: spawn
    *     suppression from an evicted run would differ, so no eviction);
    *  2. a run spawned at an evicted event (ts < max-w) has deadline
    *     strictly before the history max, so with in-order delivery every
    *     match it produced completed at an already-processed event — all
    *     were emitted in earlier folds;
    *  3. hence refold(kept) is precisely the already-emitted matches that
    *     survive eviction, and its count is the correct new watermark. */
  /** One per-key micro-batch step of the streaming re-fold: guard the
    * in-order precondition, evict dead history, fold, emit the suffix past
    * the watermark. Pure (state in, state out) — unit-tested directly;
    * `selectStream` is this inside `flatMapGroupsWithState`. */
  private[graft] def foldStep[Out](
      steps: IndexedSeq[Cep.PStep], withinNs: Option[Long],
      spawn: Cep.SpawnPolicy, project: Bindings => Out)(
      key: Long, prev: (Vector[Ev], Int), batch: Vector[Ev])
      : ((Vector[Ev], Int), Vector[Out]) = {
    val (hist0, emitted0) = prev
    if (hist0.nonEmpty) {
      val hMaxTs = hist0.last.tsNs; val hMaxId = hist0.last.eventId
      batch.find(e => e.tsNs < hMaxTs ||
          (e.tsNs == hMaxTs && e.eventId < hMaxId)).foreach { late =>
        throw new IllegalStateException(
          s"selectStream key=$key: event (ts=${late.tsNs}, id=" +
            s"${late.eventId}) arrived after history max (ts=$hMaxTs, " +
            s"id=$hMaxId) — per-key in-order delivery is a precondition " +
            "of the prefix-stable re-fold; watermark-buffer upstream or " +
            "use the timeout-based Streaming.cep* operators")
      }
    }
    val (hist, emitted) =
      evictHistory(steps, withinNs, spawn, project)(hist0, emitted0)
    val all = (hist ++ batch).sortBy(e => (e.tsNs, e.eventId))
    val outs = Cep.run[Out](steps, withinNs, spawn, project)(all.iterator)
      .toVector
    ((all, outs.length), outs.drop(emitted))
  }

  /** Stable identity of a completed run across re-folds: its bound
    * event ids per step (a run binds the same events in every re-fold
    * that still contains them), prefixed with the MINIMUM bound ts so
    * eviction can drop signatures that can no longer be re-derived.
    * Used by the timed (absence-capable) re-fold, where the emitted-
    * COUNT watermark is not prefix-stable: a horizon-finalized match
    * re-appears at a different position once its confirming event
    * arrives, but its signature never changes. */
  private[graft] def sigOf(b: Bindings): String = {
    val minTs = b.valuesIterator.flatten.map(_.tsNs).min
    minTs.toString + "|" + b.toSeq.sortBy(_._1).map { case (n, evs) =>
      n + ":" + evs.map(_.eventId).mkString(",") }.mkString(";")
  }
  private def sigMinTs(sig: String): Long =
    sig.takeWhile(_ != '|').toLong

  /** One per-key micro-batch step of the TIMED re-fold (the absence-
    * capable twin of [[foldStep]]): guard in-order delivery, evict dead
    * history and unreachable signatures, re-fold with the current
    * watermark as the confirmation horizon, emit matches whose
    * signature hasn't been emitted yet, and return the earliest still-
    * pending absence deadline (the next event-time timer). Pure —
    * unit-tested directly; `selectStreamTimed` is this inside
    * `flatMapGroupsWithState` with `EventTimeTimeout`. */
  private[graft] def foldStepTimed[Out](
      steps: IndexedSeq[Cep.PStep], withinNs: Option[Long],
      spawn: Cep.SpawnPolicy, project: Bindings => Out)(
      key: Long, prev: (Vector[Ev], Vector[String]), batch: Vector[Ev],
      horizonNs: Long, onDrop: (Long, Ev) => Unit = (_, _) => ())
      : ((Vector[Ev], Vector[String]), Vector[Out], Option[Long]) = {
    val (hist0, sigs0) = prev
    // A straggler sorting before the per-key history max cannot be
    // incorporated without breaking prefix stability (earlier folds
    // already emitted matches over a history it would reorder), but the
    // deployed sources ADMIT up to the watermark's allowed lateness and
    // fMGWS does not pre-filter late rows — so such an event is expected
    // operation, not corruption: it is dead-lettered (dropped) instead
    // of killing the whole streaming query, the same contract Spark
    // applies to watermark-expired rows. Each drop is REPORTED through
    // `onDrop` (never silent): selectStreamTimed counts it in a named
    // Spark accumulator and logs key/ts/id, so a genuine upstream
    // ordering regression is observable, not invisible data loss.
    val admitted =
      if (hist0.isEmpty) batch
      else {
        val hMaxTs = hist0.last.tsNs; val hMaxId = hist0.last.eventId
        val (late, ok) = batch.partition(e => e.tsNs < hMaxTs ||
          (e.tsNs == hMaxTs && e.eventId < hMaxId))
        late.foreach(onDrop(key, _))
        ok
      }
    val all = (hist0 ++ admitted).sortBy(e => (e.tsNs, e.eventId))
    val (tagged, pending) = Cep.runH[(String, Out)](steps, withinNs,
      spawn, b => (sigOf(b), project(b)), horizonNs)(all.iterator)
    val seen = sigs0.toSet
    val fresh = tagged.filterNot { case (sg, _) => seen(sg) }
    val sigs1 = sigs0 ++ fresh.map(_._1)
    // evict AFTER emission, and only up to the HORIZON: an event at
    // ts < cut can no longer be bound (runs bind within [spawn,
    // spawn+w] and future runs spawn at ≥ the history max), and every
    // run it spawned was DECIDED by cut + w ≤ horizon — so its matches
    // were all emitted by this fold. The count-based foldStep can cut
    // at history-max − w because its matches finalize AT events; an
    // absence match finalizes at the lagging watermark, so cutting
    // without the horizon bound could drop a spawn event before any
    // horizon ever confirmed its match (time-jumping batches).
    val (hist1, sigs2) = withinNs match {
      case Some(w) if spawn == Cep.EveryMatch && all.nonEmpty =>
        // The cut is safe even when an ABSENT deadline exceeds
        // spawn+within (B binding near the within edge, or forNs > w):
        // an UNDECIDED run never has an event past its spawn+w in
        // history — the NFA decides a parked run at the first such
        // event (expiry completes it if its absence deadline already
        // passed, kills it otherwise, exactly like the batch fold) —
        // so every pending run's spawn satisfies spawn ≥ lastTs − w ≥
        // cut and survives; runs spawned before the cut were decided
        // by cut+w ≤ horizon and their matches emitted above. Pinned
        // by CepNfaSpec ("absence deadline past spawn+within").
        val cut = math.min(all.last.tsNs, horizonNs) - w
        (all.dropWhile(_.tsNs < cut), sigs1.filter(sigMinTs(_) >= cut))
      case _ => (all, sigs1)
    }
    ((hist1, sigs2), fresh.map(_._2), pending.minOption)
  }

  private[graft] def evictHistory[Out](
      steps: IndexedSeq[Cep.PStep], withinNs: Option[Long],
      spawn: Cep.SpawnPolicy, project: Bindings => Out)(
      hist: Vector[Ev], emitted: Int): (Vector[Ev], Int) =
    withinNs match {
      case Some(w) if spawn == Cep.EveryMatch && hist.nonEmpty =>
        val cut = hist.last.tsNs - w
        val kept = hist.dropWhile(_.tsNs < cut) // hist is (ts,id)-sorted
        if (kept.length == hist.length) (hist, emitted)
        else (kept,
          Cep.run(steps, withinNs, spawn, project)(kept.iterator).size)
      case _ => (hist, emitted)
    }

  final case class PatternBuilder private[api] (
      steps: Vector[Cep.PStep],
      withinNs: Option[Long],
      spawn: Cep.SpawnPolicy) {

    /** `->` followed-by: non-matching events in between are skipped. */
    def followedBy(name: String)(pred: Pred): PatternBuilder =
      copy(steps = steps :+ Cep.Single(name, pred))

    /** `,` strict-next: the very next event must match or the run dies. */
    def next(name: String)(pred: Pred): PatternBuilder =
      copy(steps = steps :+ Cep.Single(name, pred, strict = true))

    /** `<min:max>` count quantifier on the most recent condition. */
    def times(min: Int, max: Int): PatternBuilder = steps.last match {
      case s: Cep.Single =>
        copy(steps = steps.init :+ s.copy(min = min, max = max))
      case other => throw new IllegalArgumentException(
        s"times() applies to a condition step, not $other")
    }

    /** `not <cond> for <T>`: succeeds iff NO matching event arrives
      * within `dur` of the previous step's last binding. */
    def notFor(name: String, dur: FiniteDuration)(pred: Pred)
        : PatternBuilder =
      copy(steps = steps :+ Cep.Absent(name, pred, dur.toNanos))

    /** Logical `A and B`: both conditions, in any order. */
    def both(nameA: String)(predA: Pred)(nameB: String)(predB: Pred)
        : PatternBuilder =
      copy(steps = steps :+ Cep.BothOf(nameA, predA, nameB, predB))

    /** Logical `A or B`: first event matching either branch binds it. */
    def either(nameA: String)(predA: Pred)(nameB: String)(predB: Pred)
        : PatternBuilder =
      copy(steps = steps :+ Cep.EitherOf(nameA, predA, nameB, predB))

    /** `within T`: whole-pattern deadline from the run's first binding. */
    def within(dur: FiniteDuration): PatternBuilder =
      copy(withinNs = Some(dur.toNanos))

    /** Suppress overlapping runs: a new run spawns only when none is
      * currently accumulating step 0 (non-`every` mode). */
    def firstOnly: PatternBuilder = copy(spawn = Cep.WhenNoneActive)

    /** Execute over the events table (keyed by user, time-ordered per
      * key), projecting each completed run's bindings. */
    def select[Out: Encoder](spark: SparkSession, dir: String)
                            (project: Bindings => Out): Dataset[Out] =
      Cep.matchPattern[Out](spark, dir, steps.toIndexedSeq, withinNs,
        spawn)(project)

    /** Execute over a LIVE streaming `Dataset[Ev]` (readStream-derived):
      * per-key NFA state inside `flatMapGroupsWithState`, emitting each
      * match exactly once as it completes (prefix-stable re-fold — the
      * already-emitted count is the state watermark).
      *
      * Restricted to patterns whose matches finalize AT an event:
      * absence steps and open final quantifiers complete at end-of-stream
      * flush, which a live stream never reaches — those stream through
      * the timeout-based operators (engine Streaming.cepAbsence*,
      * transformWithState timers) instead, and this guard says so.
      *
      * PRECONDITION — per-key event-time order across micro-batches. The
      * re-fold is prefix-stable only if each batch's events sort after the
      * stored history; a late event that sorts before already-processed
      * history would change previously-emitted matches. Spark gives no
      * such guarantee for general sources, so a violating batch FAILS FAST
      * (clear error naming the key and timestamps) rather than silently
      * mis-emitting. Buffer behind an event-time watermark upstream (or
      * use the timeout-based engine operators) for disordered sources.
      * This is deliberately STRICTER than [[selectStreamTimed]]'s
      * dead-letter policy: the timed operator's input is watermarked, so
      * a straggler there is bounded, expected operation (Spark admits
      * rows up to the allowed lateness) and dropping it mirrors Spark's
      * own late-row contract — here the input carries NO watermark, no
      * admissibility bound exists, and a late row can only mean the
      * source broke its ordering contract outright, which must surface
      * as an error, not as unbounded silent loss.
      *
      * State is bounded when the pattern has a `within` deadline and
      * `every` spawn: history older than `w` before the per-key max can no
      * longer be bound by any live or future run (every run's deadline is
      * spawn+w), so it is evicted each batch and the emitted-count
      * watermark re-anchored — see [[Patterns.evictHistory]] for the
      * proof obligations. Without `within` (or under `firstOnly`, whose
      * spawn suppression makes truncated refolds diverge) history grows
      * with the key's event count — the documented cost of exact re-fold
      * semantics. */
    def selectStream[Out: Encoder](ds: Dataset[Ev])
                                  (project: Bindings => Out): Dataset[Out] = {
      require(!steps.exists(_.isInstanceOf[Cep.Absent]),
        "absence patterns need timeout-based streaming (Streaming.cepAbsence)")
      steps.last match {
        case s: Cep.Single => require(s.min == s.max,
          "an open final quantifier completes only at end-of-stream; " +
            "not streamable via re-fold")
        case _ => ()
      }
      import ds.sparkSession.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val st = steps.toIndexedSeq
      val w = withinNs
      val sp = spawn
      ds.groupByKey(_.userId)
        .flatMapGroupsWithState[(Vector[Ev], Int), Out](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (key, batch: Iterator[Ev],
                state: GroupState[(Vector[Ev], Int)]) =>
            val (st1, outs) = Patterns.foldStep(st, w, sp, project)(
              key, state.getOption.getOrElse((Vector.empty[Ev], 0)),
              batch.toVector)
            state.update(st1)
            outs.iterator
        }
    }

    /** Execute over a LIVE watermarked stream WITH absence support: the
      * same per-key re-fold as [[selectStream]], but the confirmation
      * horizon is the event-time WATERMARK and `not X for T` deadlines
      * register event-time timers — a run parked at an absence step
      * confirms once the watermark passes its deadline (no future event
      * can violate it), so matches emit without waiting for the key's
      * next event. The input must carry a `withWatermark` tag on `ts`
      * (the timer machinery requires it).
      *
      * Emitted-match bookkeeping is a signature SET (bound event ids,
      * [[Patterns.sigOf]]) instead of [[selectStream]]'s emitted-count
      * watermark: a horizon-finalized match re-appears at a different
      * fold position once a later event arrives, so a count prefix is
      * not stable, but its signature is. The set (like the history) is
      * evicted under `within` + `every`; without `within` it grows with
      * the key's match count — the documented cost of exact re-fold
      * semantics. Per-key order handling differs from [[selectStream]]:
      * because the deployed sources admit watermark-late rows, a
      * straggler sorting before the per-key history max is DROPPED
      * (dead-lettered, prefix stability preserved) instead of failing
      * the query — every drop increments the named Spark accumulator
      * `graft.cep.droppedStragglers` and logs a WARN with key/ts/id, so
      * live-vs-batch divergence is observable. Pass `strictOrder =
      * true` to restore the [[selectStream]] fail-fast for debugging an
      * upstream ordering regression. Open final quantifiers (which only
      * an actual end of stream can close) remain refused. */
    def selectStreamTimed[Out: Encoder](
        ds: Dataset[graft.engine.Streaming.EvT],
        strictOrder: Boolean = false)
        (project: Bindings => Out): Dataset[Out] = {
      steps.last match {
        case s: Cep.Single => require(s.min == s.max,
          "an open final quantifier completes only at end-of-stream; " +
            "not streamable via re-fold")
        case _ => ()
      }
      import ds.sparkSession.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      val st = steps.toIndexedSeq
      val w = withinNs
      val sp = spawn
      val strict = strictOrder
      val dropped = ds.sparkSession.sparkContext
        .longAccumulator("graft.cep.droppedStragglers")
      val onDrop: (Long, Ev) => Unit = (key, e) =>
        if (strict) throw new IllegalStateException(
          s"selectStreamTimed key=$key (strictOrder): event " +
            s"(ts=${e.tsNs}, id=${e.eventId}) sorts before the per-key " +
            "history max — upstream per-key ordering regressed")
        else {
          dropped.add(1L)
          Patterns.log.warn(
            s"selectStreamTimed key=$key: dead-lettered straggler " +
              s"(ts=${e.tsNs}, id=${e.eventId}) sorting before the " +
              "per-key history max (prefix stability preserved; see " +
              "accumulator graft.cep.droppedStragglers)")
        }
      ds.groupByKey(_.userId)
        .flatMapGroupsWithState[(Vector[Ev], Vector[String]), Out](
          OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
          case (key, batch: Iterator[graft.engine.Streaming.EvT],
                state: GroupState[(Vector[Ev], Vector[String])]) =>
            val horizonNs = state.getCurrentWatermarkMs() * 1000000L
            val evs =
              if (state.hasTimedOut) Vector.empty[Ev]
              else batch.map(t => Cep.Ev(t.eventId, t.tsNs, t.userId,
                t.eventType, t.value)).toVector
            val (st1, outs, nextDdl) =
              Patterns.foldStepTimed(st, w, sp, project)(
                key, state.getOption.getOrElse(
                  (Vector.empty[Ev], Vector.empty[String])),
                evs, horizonNs, onDrop)
            state.update(st1)
            // wake when the watermark passes the earliest undecided
            // absence deadline (ns → ms, +1 so the timer is strictly
            // past it); with nothing pending the state sleeps until
            // the key's next event
            nextDdl.foreach(d =>
              state.setTimeoutTimestamp(d / 1000000L + 1))
            outs.iterator
        }
    }

    /** Execute through the custom Catalyst operator: the pattern becomes
      * a planner-visible [[graft.engine.plans.PatternMatchPlan]] node
      * (key-filter pushdown rule applies; exchange/sort come from the
      * operator's declared requirements). `out` is the output schema,
      * `project` returns one value per output column. */
    def selectPlan(spark: SparkSession, dir: String,
                   out: Seq[(String, DataType)])
                  (project: Bindings => Seq[Any]): DataFrame = {
      val strat = graft.engine.plans.PatternMatchStrategy
      val rule = graft.engine.plans.PatternKeyPushdown
      // check-and-append under a lock: concurrent first calls on the same
      // session must not double-register the strategy/rule
      spark.experimental.synchronized {
        if (!spark.experimental.extraStrategies.contains(strat))
          spark.experimental.extraStrategies =
            spark.experimental.extraStrategies :+ strat
        if (!spark.experimental.extraOptimizations.contains(rule))
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
      }
      val child = org.apache.spark.sql.GraftSqlBridge.analyzed(
        graft.engine.Tables.events(spark, dir)
          .selectExpr("event_id as eventId", "ts_ns as tsNs",
            "user_id as userId", "event_type as eventType", "value"))
      val attrs = out.map { case (n, t) =>
        AttributeReference(n, t, nullable = false)()
      }
      org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
        graft.engine.plans.PatternMatchPlan(steps.toIndexedSeq, withinNs,
          spawn, attrs, project, child))
    }
  }
}
