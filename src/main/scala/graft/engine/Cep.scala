package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** CEP patterns & sequences (SURVEY.md §2.6) — the genuinely novel part of
  * the reference engine.
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  * siddhi-core `query/input/stream/state/{StreamPreStateProcessor,
  * StreamPostStateProcessor,LogicalPreStateProcessor,AbsentPreStateProcessor,
  * CountPreStateProcessor}.java` + `util/parser/StateParser.java` — Siddhi
  * compiles `A -> B`, `A, B`, `not B for T`, `<m:n>`, `and/or`, `every`,
  * `within` into a chain of pre/post state processors (an NFA).
  *
  * Re-expression here: a small explicit NFA over per-key, time-ordered
  * events. Batch execution: `groupByKey(key).flatMapGroups` — Spark's
  * shuffle IS Siddhi's partition; each group is sorted by (ts, id) and the
  * NFA folds over it. The same `Nfa.run` core is reused by the streaming
  * path (`flatMapGroupsWithState`, see graft.engine.Streaming) so batch and
  * streaming share one matching engine.
  *
  * Scale notes (100 TB): one shuffle on the partition key; NFA state is
  * O(active runs) and runs expire via `within`/absence deadlines. The batch
  * path materializes one key-group at a time for the time sort — per-user
  * event counts are bounded in practice; for pathological keys pre-bucketing
  * by (key, day) bounds the group. No driver-side collection anywhere.
  */
object Cep {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Event projection used by the pattern queries (ns timestamps: exact). */
  case class Ev(eventId: Long, tsNs: Long, userId: Long, eventType: String,
                value: Double)

  type Bindings = Map[String, Vector[Ev]]

  sealed trait PStep
  /** One condition, optionally a count quantifier `<min:max>`; `strict`
    * = Siddhi `,` (the very next event must match or the run dies). */
  final case class Single(name: String, pred: (Ev, Bindings) => Boolean,
                          min: Int = 1, max: Int = 1, strict: Boolean = false)
      extends PStep
  /** Siddhi `not <cond> for <T>`: succeeds iff NO matching event arrives
    * within forNs of the previous step's last binding (or stream end). */
  final case class Absent(name: String, pred: (Ev, Bindings) => Boolean,
                          forNs: Long) extends PStep
  /** Siddhi logical `e1=A and e2=B`: both conditions, any order. */
  final case class BothOf(nameA: String, predA: (Ev, Bindings) => Boolean,
                          nameB: String, predB: (Ev, Bindings) => Boolean)
      extends PStep
  /** Siddhi logical `e1=A or e2=B`: first event matching either condition
    * binds its branch and completes the step. */
  final case class EitherOf(nameA: String, predA: (Ev, Bindings) => Boolean,
                            nameB: String, predB: (Ev, Bindings) => Boolean)
      extends PStep

  /** `every` ⇒ spawn a run at each step-0 match (overlapping runs);
    * otherwise only when no run is currently accumulating step 0 (one run
    * per contiguous island — restart after completion/kill). */
  sealed trait SpawnPolicy
  case object EveryMatch extends SpawnPolicy
  case object WhenNoneActive extends SpawnPolicy

  private final case class Run(stepIdx: Int, bindings: Bindings,
                               startNs: Long, count: Int,
                               absentDeadlineNs: Long)

  /** The NFA core: fold time-ordered events of one key, emit a projection
    * of the bindings for every completed run. Deterministic: events must be
    * strictly ordered; all transitions are greedy (current step preferred
    * over advancement, Siddhi's default). */
  def run[Out](steps: IndexedSeq[PStep], withinNs: Option[Long],
               spawn: SpawnPolicy, project: Bindings => Out)
              (events: Iterator[Ev]): Iterator[Out] =
    runH(steps, withinNs, spawn, project, Long.MaxValue)(events)
      ._1.iterator

  /** [[run]] with an explicit event-time HORIZON: end-of-iterator
    * finalization confirms only absence runs whose deadline lies
    * strictly BEFORE `horizonNs` — under the watermark contract no
    * future event can arrive with ts ≤ such a deadline, so the
    * confirmation is final even though the stream continues. Runs
    * parked at an absence step with deadline ≥ horizon stay undecided
    * (a later re-fold with a higher horizon decides them), and their
    * deadlines return as the second component — the live re-fold's
    * next event-time timer. An open final count quantifier completes
    * only at the true end of stream (horizon == Long.MaxValue, the
    * batch entry's value, which also reproduces [[run]]'s
    * confirm-everything end-of-stream behavior). */
  private[graft] def runH[Out](steps: IndexedSeq[PStep],
               withinNs: Option[Long],
               spawn: SpawnPolicy, project: Bindings => Out,
               horizonNs: Long)
              (events: Iterator[Ev]): (Vector[Out], List[Long]) = {
    var active = List.empty[Run]
    val out = scala.collection.mutable.ArrayBuffer.empty[Out]

    def bind(b: Bindings, name: String, e: Ev): Bindings =
      b.updated(name, b.getOrElse(name, Vector.empty) :+ e)

    def complete(r: Run): Unit = out += project(r.bindings)

    // Advance a run INTO step idx with event e already consumed by idx-1.
    // Returns None if the run completed.
    def enter(r: Run, idx: Int): Option[Run] =
      if (idx >= steps.length) { complete(r); None }
      else steps(idx) match {
        case Absent(_, _, forNs) =>
          Some(r.copy(stepIdx = idx, count = 0,
            absentDeadlineNs = lastBoundTs(r) + forNs))
        case _ => Some(r.copy(stepIdx = idx, count = 0))
      }

    def lastBoundTs(r: Run): Long =
      r.bindings.values.flatten.map(_.tsNs).maxOption.getOrElse(r.startNs)

    def feed(r: Run, e: Ev): Option[Run] = steps(r.stepIdx) match {
      case s @ Single(name, pred, min, max, strict) =>
        if (pred(e, r.bindings)) {
          val r2 = r.copy(bindings = bind(r.bindings, name, e),
            count = r.count + 1)
          if (r2.count >= max) enter(r2, r.stepIdx + 1) else Some(r2)
        } else if (r.count >= min) {
          // quantifier satisfied: advance — completes the run when this is
          // the final step (enter returns None), else the NEXT step tries
          // this event
          enter(r, r.stepIdx + 1) match {
            case Some(r2) => feed(r2, e)
            case None => None
          }
        } else if (strict) None // `,` semantics: next event must match
        else Some(r) // loose: ignore non-matching event
      case Absent(_, pred, _) =>
        if (e.tsNs > r.absentDeadlineNs) {
          // absence confirmed BEFORE this event; re-feed into next step
          enter(r, r.stepIdx + 1) match {
            case Some(r2) => feed(r2, e)
            case None => None
          }
        } else if (pred(e, r.bindings)) None // violation: run dies
        else Some(r)
      case BothOf(na, pa, nb, pb) =>
        val hasA = r.bindings.contains(na)
        val hasB = r.bindings.contains(nb)
        if (!hasA && pa(e, r.bindings)) {
          val r2 = r.copy(bindings = bind(r.bindings, na, e))
          if (hasB) enter(r2, r.stepIdx + 1) else Some(r2)
        } else if (!hasB && pb(e, r.bindings)) {
          val r2 = r.copy(bindings = bind(r.bindings, nb, e))
          if (hasA) enter(r2, r.stepIdx + 1) else Some(r2)
        } else Some(r)
      case EitherOf(na, pa, nb, pb) =>
        if (pa(e, r.bindings))
          enter(r.copy(bindings = bind(r.bindings, na, e)), r.stepIdx + 1)
        else if (pb(e, r.bindings))
          enter(r.copy(bindings = bind(r.bindings, nb, e)), r.stepIdx + 1)
        else Some(r)
    }

    for (e <- events) {
      // 1. expire runs whose pattern deadline passed (before this event);
      //    an expiring run parked at an Absent step whose own deadline
      //    already passed still completes (absence was confirmed in time)
      active = active.filter { r =>
        val alive = withinNs.forall(w => e.tsNs <= r.startNs + w)
        if (!alive) steps(r.stepIdx) match {
          case _: Absent if r.absentDeadlineNs < e.tsNs =>
            enter(r, r.stepIdx + 1)
          case _ => ()
        }
        alive
      }
      // 2. feed active runs
      active = active.flatMap(r => feed(r, e))
      // 3. spawn new runs at step 0
      val mayStart = spawn match {
        case EveryMatch => true
        case WhenNoneActive => !active.exists(_.stepIdx == 0)
      }
      if (mayStart) {
        val seed = Run(0, Map.empty, e.tsNs, 0, Long.MaxValue)
        steps(0) match {
          case Single(_, pred, _, _, _) if pred(e, seed.bindings) =>
            active = active ++ feed(seed, e).toList
          case BothOf(_, pa, _, pb) if pa(e, seed.bindings) ||
              pb(e, seed.bindings) =>
            active = active ++ feed(seed, e).toList
          case EitherOf(_, pa, _, pb) if pa(e, seed.bindings) ||
              pb(e, seed.bindings) =>
            active = active ++ feed(seed, e).toList
          case _ => ()
        }
      }
    }
    // end-of-iterator: absence steps with no violation are confirmed iff
    // their deadline is decided (strictly before the horizon; at
    // horizon == MaxValue — the batch end-of-stream — everything is),
    // and a final count-quantified Single with its minimum satisfied
    // completes only at the true end of stream (e.g. a pattern ending
    // in `A<3:>` — nothing else can close it)
    val pending = List.newBuilder[Long]
    active.foreach { r =>
      steps(r.stepIdx) match {
        case _: Absent =>
          if (r.absentDeadlineNs < horizonNs) enter(r, r.stepIdx + 1)
          else pending += r.absentDeadlineNs
        case Single(_, _, min, _, _)
            if horizonNs == Long.MaxValue && r.count >= min &&
              r.stepIdx == steps.length - 1 =>
          enter(r, r.stepIdx + 1)
        case _ => ()
      }
    }
    (out.toVector, pending.result())
  }

  /** Batch entry: shuffle by key, time-sort each group, run the NFA. */
  def matchPattern[Out: Encoder](spark: SparkSession, dir: String,
      steps: IndexedSeq[PStep], withinNs: Option[Long],
      spawn: SpawnPolicy)(project: Bindings => Out): Dataset[Out] = {
    import spark.implicits._
    events(spark, dir)
      .select(col("event_id").as("eventId"), col("ts_ns").as("tsNs"),
        col("user_id").as("userId"), col("event_type").as("eventType"),
        col("value"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroups { (_, it) =>
        run(steps, withinNs, spawn, project)(
          it.toVector.sortBy(e => (e.tsNs, e.eventId)).iterator)
      }
  }

  private val MIN5: Long = 5L * 60 * 1000 * 1000 * 1000 // 5 min in ns

  case class SeqMatch(user_id: Long, start_id: Long, next_id: Long,
                      next_value: Double)

  /** `from every e1=S[type=='error'] -> e2=S[type=='purchase'] within 5 min`
    * — each error spawns a run completing on the FIRST later purchase. */
  def seqFollowedBy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern[SeqMatch](s, d, IndexedSeq(
        Single("e1", (e, _) => e.eventType == "error"),
        Single("e2", (e, _) => e.eventType == "purchase")),
      Some(MIN5), EveryMatch) { b =>
        val e1 = b("e1").head; val e2 = b("e2").head
        SeqMatch(e1.userId, e1.eventId, e2.eventId, e2.value)
      }.toDF().orderBy("start_id")
  }

  case class StrictMatch(user_id: Long, first_id: Long, second_id: Long)

  /** Strict sequence `e1=S[error], e2=S[purchase]` — the very next event
    * of the same key must match. */
  def strictNext(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern[StrictMatch](s, d, IndexedSeq(
        Single("e1", (e, _) => e.eventType == "error"),
        Single("e2", (e, _) => e.eventType == "purchase", strict = true)),
      None, EveryMatch) { b =>
        StrictMatch(b("e1").head.userId, b("e1").head.eventId,
          b("e2").head.eventId)
      }.toDF().orderBy("first_id")
  }

  case class AbsenceMatch(user_id: Long, event_id: Long)

  /** Absence `every e1=S[error] -> not S[purchase] for 5 min` — errors NOT
    * followed by a purchase within 5 minutes. */
  def absence(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern[AbsenceMatch](s, d, IndexedSeq(
        Single("e1", (e, _) => e.eventType == "error"),
        Absent("no_purchase", (e, _) => e.eventType == "purchase", MIN5)),
      None, EveryMatch) { b =>
        AbsenceMatch(b("e1").head.userId, b("e1").head.eventId)
      }.toDF().orderBy("event_id")
  }

  case class CountMatch(user_id: Long, purchase_id: Long, n_clicks: Long)

  /** Count quantifier `e1=S[click]<3:>, e2=S[purchase]` (contiguous run of
    * ≥3 clicks immediately followed by a purchase; one run per island). */
  def countQuantifier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern[CountMatch](s, d, IndexedSeq(
        Single("e1", (e, _) => e.eventType == "click",
          min = 3, max = Int.MaxValue, strict = true),
        Single("e2", (e, _) => e.eventType == "purchase", strict = true)),
      None, WhenNoneActive) { b =>
        CountMatch(b("e1").head.userId, b("e2").head.eventId,
          b("e1").size.toLong)
      }.toDF().orderBy("purchase_id")
  }

  case class LogicalMatch(user_id: Long, error_id: Long, signup_id: Long)

  /** Logical `every (e1=S[error] and e2=S[signup]) within 5 min` — both in
    * any order; condition-on-prior-binding: value correlation shown in
    * ScalaTest (e2.value > e1.value predicates work via Bindings). */
  def logicalAnd(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern[LogicalMatch](s, d, IndexedSeq(
        BothOf("e1", (e, _) => e.eventType == "error",
               "e2", (e, _) => e.eventType == "signup")),
      Some(MIN5), WhenNoneActive) { b =>
        LogicalMatch(b("e1").head.userId, b("e1").head.eventId,
          b("e2").head.eventId)
      }.toDF().orderBy("error_id", "signup_id")
  }

  case class OrMatch(user_id: Long, start_id: Long, next_id: Long,
                     next_type: String)

  /** Logical-or continuation `every e1=S[error] -> (e2=S[purchase] or
    * e3=S[signup]) within 5 min` — first event of either kind completes. */
  def logicalOr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern[OrMatch](s, d, IndexedSeq(
        Single("e1", (e, _) => e.eventType == "error"),
        EitherOf("e2", (e, _) => e.eventType == "purchase",
                 "e3", (e, _) => e.eventType == "signup")),
      Some(MIN5), EveryMatch) { b =>
        val e1 = b("e1").head
        val nxt = b.get("e2").orElse(b.get("e3")).get.head
        OrMatch(e1.userId, e1.eventId, nxt.eventId, nxt.eventType)
      }.toDF().orderBy("start_id")
  }

  /** cep_pattern_exec: the SAME followed-by pattern as [[seqFollowedBy]],
    * but executed by the custom Catalyst operator
    * ([[graft.engine.plans.PatternMatchPlan]] → planner strategy →
    * [[graft.engine.plans.PatternMatchExec]]): the pattern is a
    * planner-visible node whose exchange + sort Spark inserts from the
    * operator's declared distribution/ordering requirements. Shares
    * [[seqFollowedBy]]'s oracle — two execution stacks, one semantics. */
  def patternExec(s: SparkSession, d: String): DataFrame = {
    val strat = graft.engine.plans.PatternMatchStrategy
    if (!s.experimental.extraStrategies.contains(strat))
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ strat
    val rule = graft.engine.plans.PatternKeyPushdown
    if (!s.experimental.extraOptimizations.contains(rule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ rule
    patternDf(s, d)
  }

  /** Builds the [[graft.engine.plans.PatternMatchPlan]] DataFrame WITHOUT
    * registering any runtime strategy — used by sessions whose planner
    * already knows the operator via `spark.sql.extensions`
    * (`GraftExtensions.injectPlannerStrategy`). */
  def patternDf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val child = org.apache.spark.sql.GraftSqlBridge.analyzed(
      events(s, d).select(col("event_id").as("eventId"),
        col("ts_ns").as("tsNs"), col("user_id").as("userId"),
        col("event_type").as("eventType"), col("value")))
    val out = Seq(
      AttributeReference("user_id", LongType, nullable = false)(),
      AttributeReference("start_id", LongType, nullable = false)(),
      AttributeReference("next_id", LongType, nullable = false)(),
      AttributeReference("next_value", DoubleType, nullable = false)())
    val steps: IndexedSeq[PStep] = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "error"),
      Single("e2", (e, _) => e.eventType == "purchase"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(s,
      graft.engine.plans.PatternMatchPlan(steps, Some(MIN5), EveryMatch,
        out, b => {
          val e1 = b("e1").head; val e2 = b("e2").head
          // Seq[Any] annotation matters: a bare Seq(longs..., double)
          // harmonizes to Seq[Double], silently widening the ids
          Seq[Any](e1.userId, e1.eventId, e2.eventId, e2.value)
        }, child))
      .orderBy("start_id")
  }

  case class ApiMatch(user_id: Long, error_id: Long, click_id: Long,
                      purchase_id: Long, purchase_value: Double)

  /** cep_api_builder: a three-step funnel (`every error -> click ->
    * purchase within 8 hours`) composed ENTIRELY through the public
    * pattern DSL ([[graft.api.Patterns]]) — the SiddhiQL-pattern analog a
    * library user writes. Exercises nothing engine-private: the query is
    * exactly what the README's API section shows. */
  def apiBuilder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import scala.concurrent.duration._
    graft.api.Patterns
      .begin("e1")((e, _) => e.eventType == "error")
      .followedBy("e2")((e, _) => e.eventType == "click")
      .followedBy("e3")((e, _) => e.eventType == "purchase")
      .within(8.hours)
      .select[ApiMatch](s, d) { b =>
        val e1 = b("e1").head; val e2 = b("e2").head; val e3 = b("e3").head
        ApiMatch(e1.userId, e1.eventId, e2.eventId, e3.eventId, e3.value)
      }.toDF().orderBy("error_id")
  }

  case class NotAndMatch(user_id: Long, purchase_id: Long)

  /** Logical `(not S[error] for 5 min) and e2=S[purchase]` — the
    * pattern-initial absence form (the mirror of [[absence]]'s trailing
    * `not`): a purchase matches iff NO error of the same user occurred in
    * the 5 minutes up to and including it.
    *
    * Batch form: scalable union+window formulation (same shape as the
    * as-of join) — tag error/purchase rows, one shuffle on user_id, carry
    * the last error timestamp forward with `last(..., ignoreNulls)` over
    * the (ts, side) order, keep purchases whose last error is absent or
    * out of window. Errors sort before purchases on timestamp ties, so a
    * same-instant error suppresses the match (matching the oracle's
    * `e.ts <= p.ts`). No per-purchase scan of the error set — linear
    * work per key, the plan that survives 100 TB. */
  def logicalNotAnd(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ns"), lit(0).as("side"),
        lit(null).cast("long").as("purchase_id"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), lit(1).as("side"),
        col("event_id").as("purchase_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "side")
      .rowsBetween(Long.MinValue, 0)
    err.unionByName(pur)
      .withColumn("last_err_ts_ns",
        last(when(col("side") === 0, col("ts_ns")), ignoreNulls = true)
          .over(w))
      .filter(col("side") === 1 &&
        (col("last_err_ts_ns").isNull ||
          col("last_err_ts_ns") <= col("ts_ns") - MIN5))
      .select("user_id", "purchase_id")
      .orderBy("purchase_id")
  }

  val queries: Map[String, Q] = Map(
    "cep_api_builder"     -> (apiBuilder _),
    "cep_pattern_exec"    -> (patternExec _),
    "cep_logical_not_and" -> (logicalNotAnd _),
    "cep_logical_or"      -> (logicalOr _),
    "cep_seq_followed_by" -> (seqFollowedBy _),
    "cep_strict_next"     -> (strictNext _),
    "cep_absence"         -> (absence _),
    "cep_count_quant"     -> (countQuantifier _),
    "cep_logical_and"     -> (logicalAnd _)
  )

  val oracle: Map[String, String] = Map(
    // greedy first-match chain: each error takes its FIRST later click,
    // then that run takes the FIRST purchase after the click, everything
    // within 8 h of the error (the NFA's within-deadline from step 0; the
    // deadline is wide enough that the funnel matches at sf0.01 — the
    // testdata averages one event per user per ~32 min, so a 10-min
    // funnel was vacuously empty)
    "cep_api_builder" ->
      """WITH err AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        |clk AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |pur AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'),
        |ec AS (
        |  SELECT e.user_id, e.event_id AS error_id, e.ts AS e_ts,
        |    c.event_id AS click_id, c.ts AS c_ts,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY c.ts, c.event_id) AS rk
        |  FROM err e JOIN clk c ON c.user_id = e.user_id
        |    AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 480 MINUTE),
        |ecp AS (
        |  SELECT x.user_id, x.error_id, x.click_id,
        |    p.event_id AS purchase_id, p.value AS purchase_value,
        |    row_number() OVER (PARTITION BY x.error_id
        |      ORDER BY p.ts, p.event_id) AS rk2
        |  FROM (SELECT * FROM ec WHERE rk = 1) x
        |  JOIN pur p ON p.user_id = x.user_id AND p.ts > x.c_ts
        |    AND p.ts <= x.e_ts + INTERVAL 480 MINUTE)
        |SELECT user_id, error_id, click_id, purchase_id, purchase_value
        |FROM ecp WHERE rk2 = 1 ORDER BY error_id""".stripMargin,
    // identical semantics (and oracle) to cep_seq_followed_by — the gate
    // proves the custom-operator stack emits exactly the NFA's matches
    "cep_pattern_exec" ->
      """WITH err AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        |pur AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT user_id, start_id, next_id, next_value FROM (
        |  SELECT e.user_id, e.event_id AS start_id, p.event_id AS next_id,
        |    p.value AS next_value,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY p.ts, p.event_id) AS rk
        |  FROM err e JOIN pur p ON e.user_id = p.user_id
        |    AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 5 MINUTE) t
        |WHERE rk = 1 ORDER BY start_id""".stripMargin,
    "cep_logical_not_and" ->
      """SELECT p.user_id, p.event_id AS purchase_id
        |FROM events p WHERE p.event_type = 'purchase' AND NOT EXISTS (
        |  SELECT 1 FROM events e WHERE e.event_type = 'error'
        |    AND e.user_id = p.user_id AND e.ts <= p.ts
        |    AND e.ts > p.ts - INTERVAL 5 MINUTE)
        |ORDER BY purchase_id""".stripMargin,
    "cep_logical_or" ->
      """WITH err AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        |nxt AS (SELECT user_id, event_id, ts, event_type FROM events
        |  WHERE event_type IN ('purchase', 'signup'))
        |SELECT user_id, start_id, next_id, next_type FROM (
        |  SELECT e.user_id, e.event_id AS start_id, n.event_id AS next_id,
        |    n.event_type AS next_type,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY n.ts, n.event_id) AS rk
        |  FROM err e JOIN nxt n ON e.user_id = n.user_id
        |    AND n.ts > e.ts AND n.ts <= e.ts + INTERVAL 5 MINUTE) t
        |WHERE rk = 1 ORDER BY start_id""".stripMargin,
    "cep_seq_followed_by" ->
      """WITH err AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
        |pur AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT user_id, start_id, next_id, next_value FROM (
        |  SELECT e.user_id, e.event_id AS start_id, p.event_id AS next_id,
        |    p.value AS next_value,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY p.ts, p.event_id) AS rk
        |  FROM err e JOIN pur p ON e.user_id = p.user_id
        |    AND p.ts > e.ts AND p.ts <= e.ts + INTERVAL 5 MINUTE) t
        |WHERE rk = 1 ORDER BY start_id""".stripMargin,
    "cep_strict_next" ->
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    lead(event_type) OVER w AS nxt_type,
        |    lead(event_id) OVER w AS nxt_id
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS first_id, nxt_id AS second_id FROM seq
        |WHERE event_type = 'error' AND nxt_type = 'purchase'
        |ORDER BY first_id""".stripMargin,
    "cep_absence" ->
      """SELECT e.user_id, e.event_id
        |FROM events e WHERE e.event_type = 'error' AND NOT EXISTS (
        |  SELECT 1 FROM events p WHERE p.event_type = 'purchase'
        |    AND p.user_id = e.user_id AND p.ts > e.ts
        |    AND p.ts <= e.ts + INTERVAL 5 MINUTE)
        |ORDER BY e.event_id""".stripMargin,
    "cep_count_quant" ->
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |isl AS (SELECT *, rn - row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY rn) AS grp FROM seq),
        |runs AS (SELECT user_id, grp, max(rn) AS run_end,
        |    count(*) AS n_clicks
        |  FROM isl WHERE event_type = 'click' GROUP BY user_id, grp)
        |SELECT r.user_id, s.event_id AS purchase_id, r.n_clicks
        |FROM runs r JOIN seq s ON s.user_id = r.user_id
        |  AND s.rn = r.run_end + 1 AND s.event_type = 'purchase'
        |WHERE r.n_clicks >= 3 ORDER BY purchase_id""".stripMargin,
    // cep_logical_and: the NFA's sequential restart-after-match semantics,
    // simulated exactly by a recursive-CTE state machine over the per-user
    // (error|signup) event sequence: a run spawns on the first matching
    // event while idle, completes when the OTHER type arrives within 5 min
    // of the run start, and the completing event immediately re-binds as
    // the next run's start (matching Cep.run's spawn-after-complete).
    "cep_logical_and" ->
      """WITH RECURSIVE m AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events WHERE event_type IN ('error', 'signup')),
        |sim AS (
        |  SELECT user_id, 0::BIGINT AS rn,
        |    CAST(NULL AS BIGINT) AS a_id, CAST(NULL AS BIGINT) AS b_id,
        |    CAST(NULL AS TIMESTAMP) AS start_ts,
        |    CAST(NULL AS BIGINT) AS emit_a, CAST(NULL AS BIGINT) AS emit_b
        |  FROM (SELECT DISTINCT user_id FROM m)
        |  UNION ALL
        |  SELECT s.user_id, e.rn,
        |    CASE
        |      WHEN s.start_ts IS NOT NULL
        |        AND e.ts <= s.start_ts + INTERVAL 5 MINUTE THEN
        |        CASE WHEN s.a_id IS NOT NULL AND e.event_type = 'signup'
        |               THEN NULL
        |             WHEN s.b_id IS NOT NULL AND e.event_type = 'error'
        |               THEN e.event_id
        |             ELSE s.a_id END
        |      ELSE CASE WHEN e.event_type = 'error' THEN e.event_id
        |        ELSE NULL END
        |    END AS a_id,
        |    CASE
        |      WHEN s.start_ts IS NOT NULL
        |        AND e.ts <= s.start_ts + INTERVAL 5 MINUTE THEN
        |        CASE WHEN s.a_id IS NOT NULL AND e.event_type = 'signup'
        |               THEN e.event_id
        |             WHEN s.b_id IS NOT NULL AND e.event_type = 'error'
        |               THEN NULL
        |             ELSE s.b_id END
        |      ELSE CASE WHEN e.event_type = 'signup' THEN e.event_id
        |        ELSE NULL END
        |    END AS b_id,
        |    CASE
        |      WHEN s.start_ts IS NOT NULL
        |        AND e.ts <= s.start_ts + INTERVAL 5 MINUTE THEN
        |        CASE WHEN (s.a_id IS NOT NULL AND e.event_type = 'signup')
        |               OR (s.b_id IS NOT NULL AND e.event_type = 'error')
        |               THEN e.ts
        |             ELSE s.start_ts END
        |      ELSE e.ts
        |    END AS start_ts,
        |    CASE WHEN s.start_ts IS NOT NULL
        |          AND e.ts <= s.start_ts + INTERVAL 5 MINUTE
        |          AND s.a_id IS NOT NULL AND e.event_type = 'signup'
        |           THEN s.a_id
        |         WHEN s.start_ts IS NOT NULL
        |          AND e.ts <= s.start_ts + INTERVAL 5 MINUTE
        |          AND s.b_id IS NOT NULL AND e.event_type = 'error'
        |           THEN e.event_id
        |         ELSE NULL END AS emit_a,
        |    CASE WHEN s.start_ts IS NOT NULL
        |          AND e.ts <= s.start_ts + INTERVAL 5 MINUTE
        |          AND s.a_id IS NOT NULL AND e.event_type = 'signup'
        |           THEN e.event_id
        |         WHEN s.start_ts IS NOT NULL
        |          AND e.ts <= s.start_ts + INTERVAL 5 MINUTE
        |          AND s.b_id IS NOT NULL AND e.event_type = 'error'
        |           THEN s.b_id
        |         ELSE NULL END AS emit_b
        |  FROM sim s JOIN m e ON e.user_id = s.user_id AND e.rn = s.rn + 1)
        |SELECT user_id, emit_a AS error_id, emit_b AS signup_id
        |FROM sim WHERE emit_a IS NOT NULL
        |ORDER BY error_id, signup_id""".stripMargin
  )
}
