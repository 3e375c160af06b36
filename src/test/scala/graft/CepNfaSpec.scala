package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Cep
import graft.engine.Cep._

/** Pure NFA-core tests (no Spark): golden event sequences per pattern
  * feature, mirroring the reference's per-feature TestNG style
  * (SURVEY.md §5) — send events with explicit timestamps, assert matches. */
class CepNfaSpec extends AnyFunSuite {

  private val SEC = 1000L * 1000 * 1000
  private def ev(id: Long, tSec: Long, typ: String, value: Double = 0.0,
                 user: Long = 1): Ev = Ev(id, tSec * SEC, user, typ, value)

  private def matches[T](steps: IndexedSeq[PStep],
      within: Option[Long] = None, spawn: SpawnPolicy = EveryMatch)
      (project: Bindings => T)(events: Ev*): List[T] =
    Cep.run(steps, within, spawn, project)(events.iterator).toList

  private val errThenPurchase = IndexedSeq(
    Single("e1", (e, _) => e.eventType == "A"),
    Single("e2", (e, _) => e.eventType == "B"))

  test("followed-by: first later match completes the run") {
    val out = matches(errThenPurchase)(b =>
      (b("e1").head.eventId, b("e2").head.eventId))(
      ev(1, 0, "A"), ev(2, 1, "C"), ev(3, 2, "B"), ev(4, 3, "B"))
    assert(out == List((1L, 3L))) // run completed at first B; 4 ignored
  }

  test("every: overlapping runs each complete on the same B") {
    val out = matches(errThenPurchase)(b =>
      (b("e1").head.eventId, b("e2").head.eventId))(
      ev(1, 0, "A"), ev(2, 1, "A"), ev(3, 2, "B"))
    assert(out == List((1L, 3L), (2L, 3L)))
  }

  test("within: run expires before a too-late B") {
    val out = matches(errThenPurchase, within = Some(5 * SEC))(b =>
      (b("e1").head.eventId, b("e2").head.eventId))(
      ev(1, 0, "A"), ev(2, 10, "B"), // expired
      ev(3, 11, "A"), ev(4, 13, "B")) // in time
    assert(out == List((3L, 4L)))
  }

  test("cross-binding predicate: e2.value > e1.value") {
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      Single("e2", (e, b) => e.eventType == "B" &&
        e.value > b("e1").head.value))
    val out = matches(steps)(b =>
      (b("e1").head.eventId, b("e2").head.eventId))(
      ev(1, 0, "A", value = 10), ev(2, 1, "B", value = 5), // too small
      ev(3, 2, "B", value = 20)) // matches
    assert(out == List((1L, 3L)))
  }

  test("strict `,`: non-matching next event kills the run") {
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      Single("e2", (e, _) => e.eventType == "B", strict = true))
    val out = matches(steps)(b => b("e1").head.eventId)(
      ev(1, 0, "A"), ev(2, 1, "C"), ev(3, 2, "B"), // killed by C
      ev(4, 3, "A"), ev(5, 4, "B")) // contiguous
    assert(out == List(4L))
  }

  test("absence: violation kills, quiet confirms via later event") {
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      Absent("no_b", (e, _) => e.eventType == "B", 5 * SEC))
    val out = matches(steps)(b => b("e1").head.eventId)(
      ev(1, 0, "A"), ev(2, 2, "B"), // violated
      ev(3, 10, "A"), ev(4, 20, "C")) // quiet 5s, confirmed by C at t=20
    assert(out == List(3L))
  }

  test("absence: confirmed at end of stream") {
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      Absent("no_b", (e, _) => e.eventType == "B", 5 * SEC))
    val out = matches(steps)(b => b("e1").head.eventId)(ev(1, 0, "A"))
    assert(out == List(1L))
  }

  test("count quantifier <3:∞> strict + island spawn") {
    val steps = IndexedSeq(
      Single("c", (e, _) => e.eventType == "C",
        min = 3, max = Int.MaxValue, strict = true),
      Single("p", (e, _) => e.eventType == "P", strict = true))
    def run(evs: Ev*) = matches(steps, spawn = WhenNoneActive)(b =>
      (b("p").head.eventId, b("c").size))(evs: _*)
    // 4 clicks then purchase → one match with n=4
    assert(run(ev(1, 0, "C"), ev(2, 1, "C"), ev(3, 2, "C"), ev(4, 3, "C"),
      ev(5, 4, "P")) == List((5L, 4)))
    // only 2 clicks → no match
    assert(run(ev(1, 0, "C"), ev(2, 1, "C"), ev(5, 4, "P")) == Nil)
    // interrupted island restarts the count
    assert(run(ev(1, 0, "C"), ev(2, 1, "C"), ev(3, 2, "X"), ev(4, 3, "C"),
      ev(5, 4, "C"), ev(6, 5, "C"), ev(7, 6, "P")) == List((7L, 3)))
  }

  test("logical and: both orders bind, completion on second") {
    val steps = IndexedSeq(
      BothOf("a", (e, _) => e.eventType == "A",
             "b", (e, _) => e.eventType == "B"))
    val out = matches(steps, spawn = WhenNoneActive)(b =>
      (b("a").head.eventId, b("b").head.eventId))(
      ev(1, 0, "B"), ev(2, 1, "C"), ev(3, 2, "A"))
    assert(out == List((3L, 1L)))
  }

  test("logical or: first matching branch completes, branch identity kept") {
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      EitherOf("b", (e, _) => e.eventType == "B",
               "c", (e, _) => e.eventType == "C"))
    val out = matches(steps)(b =>
      (b("e1").head.eventId,
        b.get("b").orElse(b.get("c")).get.head.eventId,
        b.contains("b")))(
      ev(1, 0, "A"), ev(2, 1, "X"), ev(3, 2, "C"), ev(4, 3, "B"))
    assert(out == List((1L, 3L, false))) // C branch won; B too late
  }

  test("property: NFA followed-by ≡ brute-force first-match (seeded random)") {
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("A", "B", "C")
      val n = 5 + rnd.nextInt(60)
      var t = 0L
      val evs = (0 until n).map { i =>
        t += 1 + rnd.nextInt(8)
        ev(i.toLong, t, types(rnd.nextInt(3)))
      }
      val within = 10L * SEC
      val got = matches(errThenPurchase, within = Some(within))(b =>
        (b("e1").head.eventId, b("e2").head.eventId))(evs: _*)
      // brute force: for every A, the first B strictly after it within T
      val want = evs.filter(_.eventType == "A").flatMap { a =>
        evs.find(b => b.eventType == "B" && b.tsNs > a.tsNs &&
          b.tsNs <= a.tsNs + within).map(b => (a.eventId, b.eventId))
      }.toList
      assert(got.sorted == want.sorted, s"seed=$seed n=$n")
    }
  }

  test("property: NFA absence ≡ brute-force not-exists (seeded random)") {
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(seed + 1000)
      val types = Vector("A", "B", "C")
      val n = 5 + rnd.nextInt(60)
      var t = 0L
      val evs = (0 until n).map { i =>
        t += 1 + rnd.nextInt(8)
        ev(i.toLong, t, types(rnd.nextInt(3)))
      }
      val forT = 10L * SEC
      val steps = IndexedSeq(
        Single("e1", (e, _) => e.eventType == "A"),
        Absent("no_b", (e, _) => e.eventType == "B", forT))
      val got = matches(steps)(b => b("e1").head.eventId)(evs: _*)
      val want = evs.filter(_.eventType == "A").filterNot { a =>
        evs.exists(b => b.eventType == "B" && b.tsNs > a.tsNs &&
          b.tsNs <= a.tsNs + forT)
      }.map(_.eventId).toList
      assert(got.sorted == want.sorted, s"seed=$seed n=$n")
    }
  }

  test("final count-quantified step completes on non-match and at EOS") {
    // `A<3:>` alone: min satisfied ⇒ a non-matching event closes the run
    val steps = IndexedSeq(
      Single("a", (e, _) => e.eventType == "A",
        min = 3, max = Int.MaxValue))
    val closedByEvent = matches(steps, spawn = WhenNoneActive)(b =>
      b("a").map(_.eventId).toList)(
      ev(1, 0, "A"), ev(2, 1, "A"), ev(3, 2, "A"), ev(4, 3, "A"),
      ev(5, 4, "X")) // X closes the greedy run with 4 As bound
    assert(closedByEvent == List(List(1L, 2L, 3L, 4L)))
    // end-of-stream closes a min-satisfied final step too
    val closedAtEos = matches(steps, spawn = WhenNoneActive)(b =>
      b("a").map(_.eventId).toList)(
      ev(1, 0, "A"), ev(2, 1, "A"), ev(3, 2, "A"))
    assert(closedAtEos == List(List(1L, 2L, 3L)))
    // under-min run emits nothing in either mode
    val underMin = matches(steps, spawn = WhenNoneActive)(b =>
      b("a").map(_.eventId).toList)(ev(1, 0, "A"), ev(2, 1, "A"))
    assert(underMin == Nil)
  }

  test("property: NFA (A and B) within T ≡ sequential reference (random)") {
    val T = 10L * SEC
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(seed)
      val types = Array("A", "B", "C")
      var t = 0L
      val evs = (0 until (5 + rnd.nextInt(50))).map { i =>
        t += 1 + rnd.nextInt(8)
        ev(i.toLong, t, types(rnd.nextInt(3)))
      }
      val nfa = matches(IndexedSeq(
          BothOf("a", (e, _) => e.eventType == "A",
                 "b", (e, _) => e.eventType == "B")),
        within = Some(T), spawn = WhenNoneActive)(b =>
        (b("a").head.eventId, b("b").head.eventId))(evs: _*)
      // independent reference: one-run state machine with restart-bind
      var state: Option[(String, Long, Long)] = None // (boundType, id, ts)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      evs.foreach { e =>
        val alive = state.exists { case (_, _, st) => e.tsNs <= st + T }
        state match {
          case Some(("A", aid, _)) if alive && e.eventType == "B" =>
            out += ((aid, e.eventId)); state = Some(("B", e.eventId, e.tsNs))
          case Some(("B", bid, _)) if alive && e.eventType == "A" =>
            out += ((e.eventId, bid)); state = Some(("A", e.eventId, e.tsNs))
          case Some(_) if alive => () // same branch or C: ignored
          case _ => // idle or expired: spawn on a matching event
            if (e.eventType == "A") state = Some(("A", e.eventId, e.tsNs))
            else if (e.eventType == "B") state = Some(("B", e.eventId, e.tsNs))
        }
      }
      assert(nfa == out.toList, s"seed=$seed")
    }
  }

  test("property: NFA A -> (B or C) ≡ brute-force first-of-either (random)") {
    val T = 10L * SEC
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(seed + 1000)
      val types = Array("A", "B", "C", "D")
      var t = 0L
      val evs = (0 until (5 + rnd.nextInt(50))).map { i =>
        t += 1 + rnd.nextInt(8)
        ev(i.toLong, t, types(rnd.nextInt(4)))
      }
      val nfa = matches(IndexedSeq(
          Single("a", (e, _) => e.eventType == "A"),
          EitherOf("b", (e, _) => e.eventType == "B",
                   "c", (e, _) => e.eventType == "C")),
        within = Some(T), spawn = EveryMatch)(b =>
        (b("a").head.eventId,
          b.get("b").orElse(b.get("c")).get.head.eventId))(evs: _*)
      val want = evs.filter(_.eventType == "A").flatMap { a =>
        evs.find(x => (x.eventType == "B" || x.eventType == "C") &&
          x.tsNs > a.tsNs && x.tsNs <= a.tsNs + T)
          .map(x => (a.eventId, x.eventId))
      }.toList
      assert(nfa.sorted == want.sorted, s"seed=$seed")
    }
  }

  test("three-step chain A -> B -> C collects all bindings") {
    val steps = IndexedSeq(
      Single("a", (e, _) => e.eventType == "A"),
      Single("b", (e, _) => e.eventType == "B"),
      Single("c", (e, _) => e.eventType == "C"))
    val out = matches(steps)(b =>
      (b("a").head.eventId, b("b").head.eventId, b("c").head.eventId))(
      ev(1, 0, "A"), ev(2, 1, "B"), ev(3, 2, "X"), ev(4, 3, "C"))
    assert(out == List((1L, 2L, 4L)))
  }

  // ---- streaming re-fold step (Patterns.foldStep / evictHistory) ----

  private val abSteps = IndexedSeq(
    Single("a", (e, _) => e.eventType == "A"),
    Single("b", (e, _) => e.eventType == "B"))
  private def proj(b: Bindings): (Long, Long) =
    (b("a").head.eventId, b("b").head.eventId)

  test("foldStep: batched fold with eviction ≡ one-shot batch fold, " +
       "and history stays bounded by the within horizon") {
    val T = 20 * SEC
    for (seed <- 1 to 40) {
      val rnd = new scala.util.Random(seed)
      val types = Array("A", "B", "C")
      var t = 0L
      val evs = (1 to 400).map { i =>
        t += 1 + rnd.nextInt(5)
        ev(i.toLong, t, types(rnd.nextInt(3)))
      }.toVector
      val oneShot =
        Cep.run(abSteps, Some(T), EveryMatch, proj)(evs.iterator).toVector

      // deliver in random-sized in-order batches, folding the step fn
      var state = (Vector.empty[Ev], 0)
      val emitted = Vector.newBuilder[(Long, Long)]
      var maxHist = 0
      var rest = evs
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(30)
        val (batch, tail) = rest.splitAt(n)
        val (st1, outs) = graft.api.Patterns.foldStep(
          abSteps, Some(T), EveryMatch, proj)(1L, state, batch)
        state = st1
        maxHist = math.max(maxHist, st1._1.length)
        emitted ++= outs
        rest = tail
      }
      assert(emitted.result() == oneShot, s"seed=$seed")
      // ts gaps average ~3s, horizon 20s + max batch 30 events → history
      // must stay far below the 400-event total (unbounded growth would
      // show ~400 here)
      assert(maxHist < 80, s"seed=$seed: history grew to $maxHist")
    }
  }

  test("foldStep: an event older than stored history max fails fast") {
    val (st1, _) = graft.api.Patterns.foldStep(
      abSteps, Some(20 * SEC), EveryMatch, proj)(
      7L, (Vector.empty, 0), Vector(ev(1, 10, "A"), ev(2, 12, "B")))
    val err = intercept[IllegalStateException] {
      graft.api.Patterns.foldStep(abSteps, Some(20 * SEC), EveryMatch,
        proj)(7L, st1, Vector(ev(3, 5, "A"))) // sorts before history max
    }
    assert(err.getMessage.contains("key=7"))
    assert(err.getMessage.contains("in-order"))
  }

  test("evictHistory: identity without `within` and under firstOnly") {
    val hist = Vector(ev(1, 0, "A"), ev(2, 100, "B"), ev(3, 200, "A"))
    assert(graft.api.Patterns.evictHistory(abSteps, None, EveryMatch,
      proj)(hist, 1) == ((hist, 1)))
    assert(graft.api.Patterns.evictHistory(abSteps, Some(5 * SEC),
      WhenNoneActive, proj)(hist, 1) == ((hist, 1)))
    // with within + EveryMatch, events past the horizon go and the
    // watermark re-anchors to the kept refold's match count
    val (kept, wm) = graft.api.Patterns.evictHistory(abSteps,
      Some(5 * SEC), EveryMatch, proj)(hist, 1)
    assert(kept == Vector(ev(3, 200, "A")))
    assert(wm == 0) // a lone A yields no matches over the kept prefix
  }

  // ---- timed (absence-capable) re-fold: Patterns.foldStepTimed ----

  private val absSteps = IndexedSeq(
    Single("e1", (e, _) => e.eventType == "A"),
    Absent("no_b", (e, _) => e.eventType == "B", 300 * SEC)) // 5 min
  private def aproj(b: Bindings): Long = b("e1").head.eventId

  test("foldStepTimed: absence confirms at the watermark horizon, " +
       "emits once, re-arms the timer") {
    type St = (Vector[Ev], Vector[String])
    var st: St = (Vector.empty, Vector.empty)
    def fold(batch: Vector[Ev], horizonSec: Long): Vector[Long] = {
      val (st1, outs, _) = graft.api.Patterns.foldStepTimed(
        absSteps, None, EveryMatch, aproj)(
        1L, st, batch, horizonSec * SEC)
      st = st1; outs
    }
    // fold 1: A@0 violated by B@120; horizon 0 → nothing
    assert(fold(Vector(ev(1, 0, "A"), ev(2, 120, "B")), 0).isEmpty)
    // fold 2: fresh A@600 (deadline 900); horizon 180 → undecided
    val (st2, o2, ddl2) = graft.api.Patterns.foldStepTimed(
      absSteps, None, EveryMatch, aproj)(
      1L, st, Vector(ev(3, 600, "A")), 180 * SEC)
    st = st2
    assert(o2.isEmpty)
    assert(ddl2.contains(900 * SEC)) // the pending timer
    // fold 3: no data, watermark past the deadline → the match emits
    assert(fold(Vector.empty, 901) == Vector(3L))
    // fold 4: later refold re-derives the same match under a higher
    // horizon — the signature set suppresses the duplicate; the new A
    // spawns a fresh pending run
    val (st4, o4, ddl4) = graft.api.Patterns.foldStepTimed(
      absSteps, None, EveryMatch, aproj)(
      1L, st, Vector(ev(4, 1000, "A")), 905 * SEC)
    st = st4
    assert(o4.isEmpty)
    assert(ddl4.contains(1300 * SEC))
    // fold 5: final flush horizon → only the NEW match emits
    assert(fold(Vector.empty, 100000) == Vector(4L))
  }

  test("foldStepTimed: a straggler sorting before the history max is " +
       "dead-lettered THROUGH onDrop, never silently") {
    // watermark-admissible stragglers are expected operation on the
    // timed channel (the sources admit up to the allowed lateness);
    // the contract is drop + REPORT, not drop + silence — every
    // dropped event flows through the onDrop callback with its key
    val dropped = Vector.newBuilder[(Long, Long)]
    val (st1, o1, _) = graft.api.Patterns.foldStepTimed(
      absSteps, None, EveryMatch, aproj)(
      9L, (Vector.empty, Vector.empty),
      Vector(ev(1, 100, "A"), ev(2, 120, "C")), 0L)
    assert(o1.isEmpty)
    val (st2, _, _) = graft.api.Patterns.foldStepTimed(
      absSteps, None, EveryMatch, aproj)(
      9L, st1, Vector(ev(3, 50, "A"), ev(4, 130, "C")), 0L,
      (k, e) => dropped += ((k, e.eventId)))
    // the straggler (ts 50 < history max 120) is dropped and reported;
    // the in-order event is admitted into history
    assert(dropped.result() == Vector((9L, 3L)))
    assert(!st2._1.exists(_.eventId == 3L))
    assert(st2._1.exists(_.eventId == 4L))
  }

  test("foldStepTimed: time-jumping batch with a lagging watermark — " +
       "event-driven confirmation emits once, eviction waits for the " +
       "horizon") {
    // within=10min, absence-for=5min: an error at t=0, then a batch
    // jumping to t=20min while the WATERMARK still lags at 0. The
    // jumping event itself confirms the absence (event-driven NFA
    // path), so the match emits in THAT fold even at horizon 0; later
    // horizon-driven refolds must not re-emit it, and eviction is
    // HORIZON-bounded — history survives until the watermark passes,
    // then shrinks to the (lag + within) band.
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      Absent("no_b", (e, _) => e.eventType == "B", 300 * SEC))
    val w = Some(600 * SEC)
    var st: (Vector[Ev], Vector[String]) = (Vector.empty, Vector.empty)
    def fold(batch: Vector[Ev], hSec: Long): Vector[Long] = {
      val (st1, outs, _) = graft.api.Patterns.foldStepTimed(
        steps, w, EveryMatch, aproj)(1L, st, batch, hSec * SEC)
      st = st1; outs
    }
    assert(fold(Vector(ev(1, 0, "A")), 0).isEmpty)
    // the jumping event confirms the pending absence event-driven
    assert(fold(Vector(ev(2, 1200, "C")), 0) == Vector(1L))
    // horizon 0 → nothing evicted yet (the watermark hasn't ratified
    // anything); the emitted signature survives with its events
    assert(st._1.exists(_.eventId == 1L))
    // horizon catches up: no duplicate, and eviction proceeds
    assert(fold(Vector.empty, 301).isEmpty)
    val (st2, o2, _) = graft.api.Patterns.foldStepTimed(
      steps, w, EveryMatch, aproj)(1L, st, Vector.empty, 1200 * SEC)
    assert(o2.isEmpty)
    assert(st2._1.forall(_.tsNs >= (1200 - 600) * SEC))
  }

  test("foldStepTimed: absence deadline past spawn+within — the pending " +
       "run's spawn survives eviction, and the first event past within " +
       "decides it exactly like the batch fold") {
    val steps = IndexedSeq(
      Single("e1", (e, _) => e.eventType == "A"),
      Single("e2", (e, _) => e.eventType == "B"),
      Absent("no_c", (e, _) => e.eventType == "C", 300 * SEC))
    val w = Some(600 * SEC)
    def prj(b: Bindings): Long = b("e1").head.eventId
    // batch reference: with B binding at 590 (just inside within=600)
    // the absence deadline is 890, PAST spawn+within — and an event at
    // 650 (past within, before the deadline) KILLS the undecided run
    assert(Cep.run(steps, w, EveryMatch, prj)(Iterator(
      ev(1, 0, "A"), ev(2, 590, "B"), ev(3, 650, "A"))).isEmpty)
    var st: (Vector[Ev], Vector[String]) = (Vector.empty, Vector.empty)
    def fold(batch: Vector[Ev], hSec: Long): Vector[Long] = {
      val (st1, outs, _) = graft.api.Patterns.foldStepTimed(
        steps, w, EveryMatch, prj)(1L, st, batch, hSec * SEC)
      st = st1; outs
    }
    assert(fold(Vector(ev(1, 0, "A"), ev(2, 590, "B")), 0).isEmpty)
    // undecided at horizon 700 (> spawn+within, < deadline): the cut
    // min(lastTs, horizon) - within must keep the pending run's spawn —
    // a pending run binds no event past spawn+within, so lastTs (590)
    // caps the cut below the spawn
    assert(fold(Vector.empty, 700).isEmpty)
    assert(st._1.exists(_.eventId == 1L),
      "pending run's spawn evicted before its absence deadline")
    // horizon passes the deadline with no C in (590, 890] → emits once
    assert(fold(Vector.empty, 900) == Vector(1L))
    // a later in-order event re-folds to the batch kill — the emitted
    // signature is final: no duplicate, no retraction
    assert(fold(Vector(ev(3, 650, "A")), 905).isEmpty)
    assert(fold(Vector.empty, 100000).isEmpty)
  }

  test("foldStepTimed: watermark-admissible straggler is dead-lettered " +
       "(dropped), not fatal, and already-folded prefixes stay stable") {
    var st: (Vector[Ev], Vector[String]) = (Vector.empty, Vector.empty)
    def fold(batch: Vector[Ev], hSec: Long): Vector[Long] = {
      val (st1, outs, _) = graft.api.Patterns.foldStepTimed(
        absSteps, None, EveryMatch, aproj)(1L, st, batch, hSec * SEC)
      st = st1; outs
    }
    // two pending absences: A@0 (deadline 300) and A@200 (deadline 500),
    // neither decided at horizon 0
    assert(fold(Vector(ev(1, 0, "A"), ev(2, 200, "A")), 0).isEmpty)
    // a B@100 straggler sorts before the history max (200): admitted it
    // would violate run 1 — the fold drops it instead of throwing, so
    // both matches confirm once the horizon passes the deadlines
    assert(fold(Vector(ev(3, 100, "B")), 1000).sorted == Vector(1L, 2L))
    assert(st._1.forall(_.eventId != 3L), "straggler entered history")
  }

  test("foldStepTimed: batched fold over random sequences ≡ one-shot " +
       "batch fold once the horizon passes everything; no duplicates; " +
       "with and without `within` eviction") {
    for (seed <- 1 to 25; within <- Seq(None, Some(900 * SEC))) {
      val rnd = new scala.util.Random(seed)
      val types = Array("A", "B", "C")
      var t = 0L
      val evs = (1 to 300).map { i =>
        t += 1 + rnd.nextInt(120)
        ev(i.toLong, t, types(rnd.nextInt(3)))
      }.toVector
      val oneShot = Cep.run(absSteps, within, EveryMatch, aproj)(
        evs.iterator).toVector
      var st: (Vector[Ev], Vector[String]) = (Vector.empty, Vector.empty)
      var maxHist = 0
      val emitted = Vector.newBuilder[Long]
      var rest = evs
      var wm = 0L // lagging watermark: max seen ts - 60s
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(25)
        val (batch, tail) = rest.splitAt(n)
        val (st1, outs, _) = graft.api.Patterns.foldStepTimed(
          absSteps, within, EveryMatch, aproj)(1L, st, batch, wm)
        st = st1
        maxHist = math.max(maxHist, st._1.length)
        emitted ++= outs
        wm = math.max(wm, batch.last.tsNs - 60 * SEC)
        rest = tail
      }
      // final flush: horizon past every deadline
      val (_, fin, _) = graft.api.Patterns.foldStepTimed(
        absSteps, within, EveryMatch, aproj)(
        1L, st, Vector.empty, Long.MaxValue - 1)
      emitted ++= fin
      val got = emitted.result()
      assert(got.distinct == got, s"seed=$seed/$within: duplicates")
      assert(got.sorted == oneShot.sorted, s"seed=$seed/$within")
      // under within, the horizon-bounded eviction keeps history near
      // the (within + watermark-lag) band, far below all 300 events
      if (within.nonEmpty)
        assert(maxHist < 120,
          s"seed=$seed: history grew to $maxHist under eviction")
    }
  }
}
