package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.engine.{Cep, Tables}

/** [[SiddhiQL]]'s live deployment: the Structured Streaming topology
  * builder (deployApp), the LiveFold channel (keyed/bucketed state,
  * windowed flush folds, enrichment joins, rate folds), and the
  * parquet-generation fold runner. Mixed into `object SiddhiQL`. */
private[api] trait SiddhiQlLive extends Serializable {
  self: SiddhiQlFrontend with SiddhiQlCompiler =>
  // ---------- live deployment ----------
  /** The single source watermark bound: every deployed topology
    * declares `withWatermark("ts", <delay>)` at the source, and the
    * compaction split freezes buckets only at or below
    * (batch max ts_ns − delay). ONE value feeds both — a larger delay
    * with an unchanged freeze predicate would shed buckets still
    * reachable by late rows, silently corrupting as-of enrichment
    * with no gate failure at default compactEvery. The default is
    * 60 s; a deployment with later-arriving data raises it through
    * ONE validated knob (`graft.live.watermark`, seconds), captured
    * once per deployment so the two cannot drift apart. */
  private[api] final val DefaultWatermarkNs: Long = 60000000000L
  private[api] def watermarkNs(sp: SparkSession): Long =
    sp.conf.getOption("graft.live.watermark").map { s =>
      val n = try s.trim.toLong catch {
        case _: NumberFormatException =>
          fail(s"graft.live.watermark must be a positive integer " +
            s"(seconds); got '$s'")
      }
      if (n <= 0) fail(s"graft.live.watermark must be a positive " +
        s"integer (seconds); got '$s'")
      n * 1000000000L
    }.getOrElse(DefaultWatermarkNs)

  /** Small shared pool for the fold runner's independent per-state
    * Spark jobs (touched-bucket probes, generation writes): a fold
    * trigger is a handful of ~100 ms jobs whose cost is scheduling
    * latency, not data — overlapping them cuts the per-trigger wall.
    * Daemon threads; actions on a SparkSession are thread-safe. */
  private lazy val foldEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        r => { val t = new Thread(r, "graft-fold"); t.setDaemon(true); t }))

  /** `graft.live.compactEvery`, validated: a malformed or
    * non-positive value fails at deploy time with the key named
    * (mirroring the other deploy-time fail-fasts) instead of an
    * uncontextualized NumberFormatException or a modulo that never
    * fires. */
  private[api] def compactEveryConf(sp: SparkSession): Option[Int] =
    sp.conf.getOption("graft.live.compactEvery").map { s =>
      val n = try s.trim.toInt catch {
        case _: NumberFormatException =>
          fail(s"graft.live.compactEvery must be a positive " +
            s"integer; got '$s'")
      }
      if (n <= 0) fail(s"graft.live.compactEvery must be a positive " +
        s"integer; got '$s'")
      n
    }
  /** Deploy a compiled app as a LIVE Structured Streaming topology over a
    * streaming events DataFrame (columns `event_id, ts_ns, user_id,
    * event_type, value, ts`) — the SiddhiProcess analog: the same text a
    * batch replay verifies runs as a continuous query. Returns the
    * UN-STARTED streaming DataFrame of the `out` query plus its required
    * output mode, requested ordering, and whether the caller must feed
    * watermark-flush sentinels ([[graft.engine.Streaming.FlushNs]]) so a
    * FINITE replay closes the last windows — callers pick the sink,
    * trigger, and checkpoint location (the restart contract lives there).
    *
    * Stage support (v1): stateless filter/projection chains (append),
    * ONE aggregation stage as the final query — global (complete mode)
    * or windowed timeBatch/cron/session (APPEND mode: the source-level
    * event-time watermark lets every pane emit exactly once when the
    * watermark passes its end, and its state row is EVICTED — bounded
    * state on a long-running stream, vs Complete mode's
    * keep-every-bucket-forever) — and pattern clauses via the per-key
    * NFA re-fold ([[Patterns.PatternBuilder.selectStream]], append; its
    * quantifier/absence restrictions and event-time-order precondition
    * apply). Chaining is plan composition on the streaming Dataset, so
    * Catalyst still optimizes the whole topology as one incremental
    * query — exactly the batch path's property, which is why batch
    * replay is a valid oracle for the deployed result.
    *
    * Watermark design: ONE `withWatermark("ts", "1 minute")` node sits
    * at the SOURCE, above nothing — so every event (and every flush
    * sentinel) reaches it before any user filter. User filters are
    * OR-extended with the sentinel region (`f OR ts >= flushCutoff`):
    * the predicate then references the event-time column, which stops
    * Catalyst's pushdown from moving it below the watermark node and
    * dropping a sentinel before it advances the watermark. Stateful
    * stages drop the sentinels themselves right above their
    * aggregation (`ts < flushCutoff`), and stateless stages carry the
    * watermarked `ts` (+ `ts_ns`) through their projections so a
    * downstream window can still bucket and evict by event time.
    *
    * Table DML stages deploy through [[deployApp]] (a `foreachBatch`
    * keyed MERGE cannot be expressed as one unstarted DataFrame) —
    * this entry fails fast on them. */
  def deployAppOn(src: DataFrame, app: String, out: String)
      : (DataFrame, OutputMode, Seq[Column], Boolean) = {
    val (stages, dml) = deployStages(src, app, out)
    dml.foreach { _ =>
      fail("live deployment of this stage (table DML / unique:last / " +
        "sort / frequent) runs through deployApp (a foreachBatch keyed " +
        "fold) — deployAppOn returns a single unstarted DataFrame and " +
        "cannot express a folded sink")
    }
    val (df, kind, ordCols) = stages.getOrElse(
      fail(s"app has no query named or inserting into '$out'"))
    // kind 4 (Update-mode global agg): the caller's sink receives only
    // the groups each trigger changed and is expected to upsert them
    // keyed on the group columns — __ukey is the runner's internal
    // collapse handle, not part of the user-facing schema
    (if (kind == 4) df.drop("__ukey") else df,
      if (kind == 1) OutputMode.Complete()
      else if (kind == 4) OutputMode.Update()
      else OutputMode.Append(),
      ordCols, kind == 2)
  }

  /** `define table T (col type, ...)` → its schema, None otherwise. */
  private[api] def parseTableDef(body: String): Option[(String, StructType)] = {
    val p = new P(lex(body))
    p.eatKw("define")
    if (!p.tryKw("table")) None
    else {
      val tname = p.ident()
      p.eatSym("(")
      val fields = List.newBuilder[StructField]
      def one(): StructField = {
        val c = p.ident(); StructField(c, typeOf(p.ident()))
      }
      fields += one()
      while (p.trySym(",")) fields += one()
      p.eatSym(")")
      Some(tname -> StructType(fields.result()))
    }
  }

  /** How a [[LiveFold]] state is materialized between triggers.
    *
    *  - [[FullState]]: the fold rewrites the WHOLE state every
    *    micro-batch. Reserved for states tiny by contract (sort(N)'s
    *    N rows) where rewrite cost is O(N), not O(data).
    *  - [[AppendState]]: the state only ever grows; the fold returns
    *    the batch's DELTA rows and the runner appends them as a new
    *    generation file. Per-trigger write cost is O(batch) by
    *    construction; reading the state unions the generation files.
    *  - [[KeyedState]]: the fold is a per-key merge on `keys`. The
    *    state parquet is hash-bucketed on those keys; each trigger the
    *    runner computes the buckets the batch touches (`batchKeys`
    *    projects the batch's key values, cast to the state key types
    *    so both sides hash identically), hands the fold ONLY those
    *    buckets' rows, and rewrites only those buckets. Per-trigger
    *    write cost is O(batch-touched buckets), not O(state) — the
    *    form that survives a keyed table with millions of keys at
    *    100 TB scale (bucket count rises with the key domain via
    *    `graft.live.stateBuckets`). */
  private[api] sealed trait StateMode
  private[api] case object FullState extends StateMode
  private[api] case object AppendState extends StateMode

  /** Test probe: when set, [[deployApp]]'s fold runner records
    * (generation, state name, rows written) for KEYED states so a
    * spec can assert per-trigger write cost tracks the batch's keys,
    * not the accumulated state size. */
  private[graft] var foldWriteProbe
      : Option[scala.collection.mutable.Buffer[(Int, String, Long)]] =
    None

  /** Test probe: when set, [[deployApp]]'s Update-mode collapse
    * records each trigger's emitted-row count so a spec can assert
    * per-trigger sink volume tracks the batch's changed groups, not
    * the total group count. */
  private[graft] var updateEmitProbe
      : Option[scala.collection.mutable.Buffer[Long]] = None

  /** Test probe: when set, [[deployApp]]'s fold runner records
    * (generation, state name, rows read) each time a fold pulls a
    * state's FULL relation, so a spec can assert per-trigger read
    * I/O tracks the live band + compacted base, not the accumulated
    * bucket history. */
  private[graft] var foldReadProbe
      : Option[scala.collection.mutable.Buffer[(Int, String, Long)]] =
    None

  /** Max distinct batch keys a keyed-state read collects to the
    * driver (see [[LiveState.fullForKeys]]): below it the key relation
    * becomes a LocalRelation (one probe job per trigger, semi-join
    * prune evaluates nothing); above it the read keeps the original
    * relation and only bucket ids cross the driver. A trigger's
    * distinct keys are bounded by its batch size, so at harness SF the
    * fast path always hits; the cap is a driver-memory bound, not a
    * correctness switch. */
  private[api] val keyLocalCap = 20000

  /** Profiling probe: when set, [[deployApp]] records (phase, ms) for
    * its harness phases — compile, query start, each trigger round,
    * flush sentinels, stop, finish — so the suite-cost work can see
    * which fixed cost dominates a gate instead of guessing. */
  private[graft] var deployPhaseProbe
      : Option[scala.collection.mutable.Buffer[(String, Long)]] = None
  @inline private[api] def phased[A](tag: String)(body: => A): A =
    deployPhaseProbe match {
      case None => body
      case Some(buf) =>
        val t0 = System.nanoTime()
        val r = body
        buf += ((tag, (System.nanoTime() - t0) / 1000000L)); r
    }

  /** Label the Spark jobs `body` runs (thread-local `callSite.short`)
    * so a job-census listener (ProfGate) can attribute a trigger's
    * jobs to the fold runner's sections instead of one opaque start
    * site. Zero-cost beyond two local-property writes. */
  @inline private[api] def tagged[A](sp: SparkSession, tag: String)
      (body: => A): A = {
    val k = "callSite.short"
    val prev = sp.sparkContext.getLocalProperty(k)
    sp.sparkContext.setLocalProperty(k, tag)
    try body finally sp.sparkContext.setLocalProperty(k, prev)
  }

  /** Single-JOB, single-STAGE distinct of a one-int-column relation
    * (r18, guide §2.4): `.distinct().collect()` plans an Exchange, so
    * every per-trigger bucket probe paid a two-stage round trip for a
    * handful of ints. Partition-local sets + a driver-side union remove
    * the exchange; the sets are bounded by the bucket-id domain
    * (nBuckets), so driver volume is O(partitions × nBuckets) ints.
    * Sorted so downstream path lists stay deterministic. */
  private[api] def distinctIntsLocal(df: DataFrame): Seq[Int] =
    df.rdd.mapPartitions(it =>
      it.map(_.getInt(0)).toSet.iterator).collect().toSet.toSeq.sorted
  private[api] final case class KeyedState(keys: Seq[String],
      batchKeys: (SparkSession, String, DataFrame) => DataFrame,
      // every N generations the runner hands the fold the WHOLE state
      // as its slice (touched = all buckets) and the fold may rewrite
      // it entirely — the compaction lever that lets a time-banded
      // partial store shed frozen buckets into a compacted base
      // without per-trigger O(history) reads or writes. None = the
      // plain keyed merge (touched buckets only, every trigger).
      compactEvery: Option[Int] = None)
    extends StateMode

  /** A [[LiveFold]] state as the fold sees it: `slice` is what the
    * fold may MERGE INTO and must return the replacement of (the
    * touched buckets for [[KeyedState]], the whole state for
    * [[FullState]], empty for [[AppendState]] — append folds return
    * their delta); `full` lazily reads the entire accumulated state
    * for folds that must JOIN against it; `fullFor` restricts that
    * read to the buckets a given key-value relation hashes into
    * ([[KeyedState]] stores only — other modes fall back to `full`),
    * so a join that can name its key domain up front (the enrichment
    * read: only batch-event keys can match) scans O(touched buckets)
    * files instead of the whole accumulated state. */
  private[api] final case class LiveState(slice: DataFrame,
      full: () => DataFrame,
      // true on the generations where this state's [[KeyedState]]
      // compactEvery fired: the slice IS the whole state and the
      // fold's return replaces every bucket (rows it drops are gone)
      compacting: Boolean = false,
      // keyDf columns must cover the state's key columns BY NAME
      // (cast to the state's key types) — the runner hashes them with
      // the same bucketCol the write path uses. Returns the
      // bucket-restricted state AND the key relation the caller should
      // prune with: when the batch's distinct key set is small the
      // runner hands back a COLLECTED LocalRelation (one Spark job
      // total, and the consumer's semi-join needs no re-evaluation of
      // the batch pipeline); above the cap it returns `keyDf`
      // unchanged (the bounded-driver scale path).
      fullForKeys: Option[DataFrame => (DataFrame, DataFrame)] = None) {
    def fullFor(keyDf: DataFrame): DataFrame = keyedRead(keyDf)._1
    def keyedRead(keyDf: DataFrame): (DataFrame, DataFrame) =
      fullForKeys.fold((full(), keyDf))(f => f(keyDf))
  }

  /** A live stage whose semantics are a per-micro-batch keyed FOLD
    * rather than one incremental Spark plan: table DML (keyed MERGE),
    * `unique:last` (keep-last upsert), `sort(N)` (running top-N),
    * `frequent(N)` (per-key algebraic components), and the enrichment
    * join reading a DML-maintained table. [[deployApp]] runs
    * `fold(spark, dir, states, batch)` in `foreachBatch` over parquet
    * generations — one NAMED state per entry in `schemas`, so a fold
    * can carry several pieces of state (the maintained table AND the
    * accumulated enrichment output) — then `finish(spark, states)`
    * shapes the final table. Each state stays one-batch-lineage deep
    * and survives a restart, and its storage/rewrite granularity is
    * its [[StateMode]]. State is bounded by contract: the
    * table/unique key domain, N rows, or the key domain's component
    * rows (the enrichment OUTPUT accumulation mirrors a sink, not
    * operator state). */
  private[api] final case class LiveFold(feed: DataFrame,
      schemas: Seq[(String, StructType, StateMode)],
      fold: (SparkSession, String, Map[String, LiveState], DataFrame)
        => Map[String, DataFrame],
      finish: (SparkSession, Map[String, DataFrame]) => DataFrame,
      ordCols: Seq[Column],
      // Siddhi limit/offset compose ONCE at finish, after ordCols
      // orders the finalized output (offset skips, limit caps — the
      // batch compile's order) — chunking-invariant by construction,
      // exactly like the having-at-finish filter
      limit: Option[Long] = None, offset: Option[Long] = None,
      // true when the feed contains an OUTER watermarked join: its
      // null-padded rows only materialize once the watermark passes
      // their band, so the runner must append the two flush-sentinel
      // batches after the data (the sentinels are dropped above the
      // join — they advance the watermark and produce no feed rows)
      needsFlush: Boolean = false)

  /** [[StateMode]] of a DML-maintained table state: insert-only DML
    * appends (the fold's output IS the batch delta when folded into an
    * empty slice), keyed DML (delete/update/upsert) bucket-merges on
    * its `on` key columns. The batch-key probe replays the DML stage's
    * filter+select over the batch and projects the `on` RHS
    * expressions CAST to the table key types, so batch rows and state
    * rows hash into the same buckets. */
  private[api] def dmlStateMode(ast: Ast, act: Action, schema: StructType,
      srcName: String, fnsSnap: Map[String, ScriptFn],
      envOf: (SparkSession, String, DataFrame) => Map[String, DataFrame])
      : StateMode = {
    val onOpt = act match {
      case _: InsertInto           => None
      case UpdateTable(_, _, on)   => Some(on)
      case UpsertTable(_, _, on)   => Some(on)
      case DeleteTable(_, on)      => Some(on)
    }
    onOpt match {
      case None => AppendState
      case Some(on) =>
        val keys = keyEqsOf(on, act.target)
        KeyedState(keys.map(_._1), (sp, d2, batch) => {
          scriptFns = fnsSnap
          val env = envOf(sp, d2, batch)
          val base0 = loadTable(sp, d2, srcName, env)
          val base = (ast.stream match {
            case ss: SingleStream => ss.filter
            case _                => None
          }).fold(base0)(f => applyFilter(sp, d2, base0, f, env))
          val items = itemsOf(expandStar(ast, base0.columns))
          val seld = base.select(items.map { case (it, a, _) =>
            expr(sqlOf(it.e)).as(a) }: _*)
          seld.select(keys.map { case (tc, rhs) =>
            expr(rhs).cast(schema(tc).dataType).as(tc) }: _*)
        })
    }
  }

  /** [[dmlStateMode]] for a MULTI-writer table: keyed DML
    * bucket-merges on the shared key columns with the batch-key probe
    * the UNION of every writer's filter+select key projection —
    * `delete` sweepers contribute their key projection too, so the
    * buckets a tombstone wipes are read into (and rewritten by) the
    * fold; insert-only writer groups append, UNLESS the caller
    * supplies `fallbackKeys` (the enrichment fold passes its JOIN key
    * columns): an insert-only log read per-event wants a KEYED store
    * so `fullFor` can bucket-restrict the per-trigger read — an
    * insert's key values are its own key-column outputs, so the
    * keyed merge (slice ∪ batch rows) IS the append. */
  private[api] def dmlStateModeMulti(
      writers: List[(Ast, Action, StructType, String)], tName: String,
      schema: StructType, fnsSnap: Map[String, ScriptFn],
      envOf: (SparkSession, String, DataFrame) => Map[String, DataFrame],
      fallbackKeys: Seq[String] = Nil)
      : StateMode = {
    val keysM = writers.map(_._2).collectFirst {
      case UpsertTable(_, _, on) =>
        keyEqsOf(on, tName).map(_._1).distinct.sorted
      case DeleteTable(_, on) =>
        keyEqsOf(on, tName).map(_._1).distinct.sorted
    }.getOrElse(fallbackKeys.distinct.sorted.toList)
    if (keysM.isEmpty) AppendState
    else KeyedState(keysM, (sp, d2, batch) => {
      scriptFns = fnsSnap
      val benv = envOf(sp, d2, batch)
      writers.map { case (wAst, wAct, _, wSrc) =>
        val onO = wAct match {
          case UpsertTable(_, _, o) => Some(o)
          case DeleteTable(_, o)    => Some(o)
          // an INSERT row's key values are its own key-column outputs
          case _: InsertInto        => None
          case a2 => fail("multi-writer table DML (v1) mixes only " +
            s"`insert into`, `update or insert` and `delete` " +
            s"writers; got '${a2.getClass.getSimpleName}'")
        }
        val b0 = loadTable(sp, d2, wSrc, benv)
        val b1 = (wAst.stream match {
          case ss: SingleStream => ss.filter
          case _ => None
        }).fold(b0)(f => applyFilter(sp, d2, b0, f, benv))
        val items2 = itemsOf(expandStar(wAst, b0.columns))
        val seld = b1.select(items2.map { case (it, a2, _) =>
          expr(sqlOf(it.e)).as(a2) }: _*)
        onO match {
          case Some(on) =>
            val keys = keyEqsOf(on, tName)
            seld.select(keysM.map { kc =>
              expr(keys.find(_._1 == kc).get._2)
                .cast(schema(kc).dataType).as(kc) }: _*)
          case None =>
            seld.select(keysM.map { kc =>
              col(kc).cast(schema(kc).dataType).as(kc) }: _*)
        }
      }.reduce(_ unionByName _)
    })
  }

  /** LIVE windowed-aggregate table DML (the canonical Siddhi store
    * pattern — `from S#window.timeBatch(T) select k, agg(x) group by k
    * update or insert into T`, deployed): fold state is the
    * per-(window bucket ∪ group keys) algebraic PARTIALS of the flush
    * aggregates — a bucket that spans micro-batches merges
    * componentwise (the FoldAlg algebra), so the fold is
    * chunking-invariant where a per-batch [[applyDml]] would
    * double-apply the straddling bucket. finish finalizes the flush
    * rows (one per bucket × group, `__g_ord` = bucket start) and runs
    * the SAME emission-order merge as the batch compile
    * ([[applyEmissions]]), which is why the batch oracle is the live
    * gate's truth. State size = the flush relation itself (bucket ×
    * keys — the contract the live grain cascade already carries);
    * per-trigger write cost O(batch-touched buckets) via KeyedState. */
  private[api] def windowedDmlFold(feed: DataFrame, ast: Ast, act: Action,
      schema: StructType, tNs: Long,
      fnsSnap: Map[String, ScriptFn]): LiveFold = {
    val ss = ast.stream.asInstanceOf[SingleStream]
    val items = itemsOf(ast)
    val outCols = items.map(_._2)
    flushPartialFold(feed, ss.filter, ast.groupBy, items, tNs, fnsSnap,
      Nil, (sp, flush) => {
        val emis = flush.select(outCols.map(col) :+
          struct((col("__wb") * lit(tNs)).cast("long").as("ts_ns"),
            lit(0L).as("event_id")).as("__g_ord"): _*)
        applyEmissions(act, schema, emptyOf(sp, schema), emis, outCols)
      })._1
  }

  /** LIVE deployment of a multi-writer table with AT LEAST ONE
    * windowed writer (r14, deleting the "windowed writers stay
    * single-writer" live bound — e.g. the range-partition
    * windowed-DML split, two user-authored windowed stores, or a
    * windowed store MIXED with per-event writers and sweepers on one
    * table): each WINDOWED writer holds one flush-partial state — the
    * [[windowedDmlFold]] construction per writer, cross-trigger
    * bucket partials merging componentwise — and each PER-EVENT
    * writer holds an APPEND-ONLY emission log (its dmlEmissions
    * relation per trigger, the delta the AppendState mode persists as
    * parquet generations — O(events) rows like the event-log
    * enrichment stores, never driver state). Finish reconstructs
    * every writer's emission relation (flush emissions get `__g_ord`
    * = (bucket start, 0, statement index); logged per-event emissions
    * keep their (ts_ns, event_id) and gain the statement index —
    * exactly how applyDmlMulti extends them) and feeds
    * [[mergeEmissions]], the BATCH multi-writer merge tail: live ≡
    * batch by SHARED code, not re-implementation, including the
    * flush-between-events interleave the per-trigger incremental
    * merge could not express. All-per-event groups keep the existing
    * per-trigger applyDmlMulti fold (O(table keys) state — strictly
    * smaller than a log). */
  private[api] def multiWindowedDmlFold(srcTs: DataFrame,
      writers: List[(Ast, Action, StructType, String)],
      schema: StructType, fnsSnap: Map[String, ScriptFn],
      envOf: (SparkSession, String, DataFrame) => Map[String, DataFrame])
      : LiveFold = {
    val sp0 = srcTs.sparkSession
    val protoEnv = envOf(sp0, "", emptyOf(sp0, srcTs.schema))
    // per writer: Left(flush pieces) for windowed, Right(emission-log
    // schema + output columns) for per-event
    val infos: List[Either[FlushPieces, (StructType, Seq[String])]] =
      writers.map { case (wAst, act2, _, wSrc) =>
        val ss = wAst.stream.asInstanceOf[SingleStream]
        ss.window match {
          case Some(wtb @ WindowSpec(n, tn :: _, _))
              if n.equalsIgnoreCase("timebatch") =>
            requireEpochTb(wtb, "live multi-writer windowed DML")
            Left(flushPiecesOf(loadTable(sp0, "", wSrc, protoEnv),
              ss.filter, wAst.groupBy, itemsOf(wAst), tn))
          case Some(w) => fail("live multi-writer windowed DML: " +
            s"#window.timeBatch(T) only (got '#window.${w.name}')")
          case None =>
            val (protoSel, outCols) =
              dmlEmissions(sp0, "", wAst, act2, schema, protoEnv)
            Right((protoSel.schema, outCols))
        }
      }
    def emisOf(st: Map[String, DataFrame])
        : List[(DataFrame, Seq[String], Action)] =
      writers.zipWithIndex.map { case ((_, act2, _, _), i) =>
        infos(i) match {
          case Left(p) =>
            val sel = p.flushOf(st(s"w$i")).select(p.outCols.map(col) :+
              struct((col("__wb") * lit(p.tNs)).cast("long").as("ts_ns"),
                lit(0L).as("event_id"), lit(i.toLong).as("w"))
                .as("__g_ord"): _*)
            (sel, p.outCols, act2)
          case Right((_, outCols)) =>
            (st(s"w$i").withColumn("__g_ord",
              struct(col("__g_ord.ts_ns"), col("__g_ord.event_id"),
                lit(i.toLong).as("w"))), outCols, act2)
        }
      }
    // deploy-time probe: the merge plan must build over empty states
    mergeEmissions(writers, schema, emptyOf(sp0, schema),
      emisOf(writers.indices.map(i => s"w$i" -> emptyOf(sp0,
        infos(i).fold(_.stateSchema, _._1))).toMap))
    LiveFold(srcTs,
      writers.indices.map(i => (s"w$i",
        infos(i).fold(_.stateSchema, _._1),
        infos(i) match {
          case Left(p) => KeyedState(p.keys, (sp, d2, batch) => {
            scriptFns = fnsSnap
            p.probeSel(loadTable(sp, d2, writers(i)._4,
              envOf(sp, d2, batch)))
          })
          case Right(_) => AppendState
        })),
      (sp, d2, st, batch) => {
        scriptFns = fnsSnap
        val env = envOf(sp, d2, batch)
        writers.indices.map { i =>
          s"w$i" -> (infos(i) match {
            case Left(p) => p.merge(st(s"w$i").slice,
              p.partialOf(loadTable(sp, d2, writers(i)._4, env)))
            case Right(_) =>
              dmlEmissions(sp, d2, writers(i)._1, writers(i)._2,
                schema, env)._1
          })
        }.toMap
      },
      (sp, st) => {
        scriptFns = fnsSnap
        mergeEmissions(writers, schema,
          emptyOf(sp, schema), emisOf(st))
      }, Nil)
  }

  /** The shared core of the live windowed folds ([[windowedDmlFold]],
    * rate-over-window): per-(bucket ∪ group keys) algebraic flush
    * PARTIALS merged componentwise per trigger; `finish` receives the
    * finalized flush relation (`__wb` + group keys + output attrs) —
    * also evaluated over an EMPTY flush at build time, so a bad stage
    * fails at deploy and the caller gets the result prototype. */
  /** Per-writer machinery of one flush-partial fold: derived once at
    * deploy from (filter, groupBy, items, tNs) over a prototype feed
    * frame, reused per trigger. Factored out of [[flushPartialFold]]
    * (r14) so [[multiWindowedDmlFold]] can hold one instance per
    * writer of an all-windowed multi-writer group. */
  private[api] final case class FlushPieces(stateSchema: StructType,
      keys: Seq[String], tNs: Long, outCols: Seq[String],
      partialOf: DataFrame => DataFrame,
      merge: (DataFrame, DataFrame) => DataFrame,
      flushOf: DataFrame => DataFrame,
      probeSel: DataFrame => DataFrame)

  private[api] def flushPiecesOf(proto: DataFrame, filter: Option[Expr],
      groupBy: List[String], items: List[(SelItem, String, Boolean)],
      tNs: Long): FlushPieces = {
    val comps = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Option[Expr])]
    def rw(e: Expr): Expr = e match {
      case Call(None, n, args0) if aggNames(n.toLowerCase) =>
        val base = s"__p${comps.length}"
        comps += ((base, n.toLowerCase, args0.headOption))
        FoldAlg.rewrite(n.toLowerCase, base)
      case Call(ns2, n, as2) => Call(ns2, n, as2.map(rw))
      case Bin(op, l, r) => Bin(op, rw(l), rw(r))
      case Not(x) => Not(rw(x))
      case Neg(x) => Neg(rw(x))
      case other => other
    }
    val finals: Seq[(String, Expr)] = items.map { case (it, a, isAgg) =>
      a -> (if (isAgg) rw(it.e) else it.e)
    }
    comps.foreach { case (_, n, argO) =>
      if (n != "count" && argO.isEmpty) fail(s"$n(...) needs an argument")
    }
    val keys = "__wb" +: groupBy
    def keyedSel(df: DataFrame): DataFrame = {
      val f = filter.fold(df)(ff => df.where(expr(sqlOf(ff))))
      f.select(expr(s"ts_ns div ${tNs}L").as("__wb") +:
        (groupBy.map(col) ++ comps.toSeq.flatMap {
          case (base, _, argO) =>
            argO.map(arg => expr(sqlOf(arg)).as(s"${base}_x")).toSeq
        }): _*)
    }
    def partialOf(df: DataFrame): DataFrame = {
      val aggs: Seq[Column] = comps.toSeq.flatMap { case (base, n, argO) =>
        FoldAlg.partialCols(n, base, argO.map(_ => col(s"${base}_x")))
      }
      keyedSel(df).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    // componentwise merge semantics live in FoldAlg (sum partials keep
    // SQL null semantics; stdDev merges Chan moments; distinctCount
    // unions value sets)
    val stateSchema = partialOf(proto).schema
    FlushPieces(stateSchema, keys, tNs, items.map(_._2),
      partialOf = partialOf,
      merge = (acc, u) =>
        // <=> so a null group key merges with itself across triggers
        acc.as("t").join(u.as("u"),
            keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _),
            "full_outer")
          .select(keys.map(k =>
            coalesce(col(s"u.$k"), col(s"t.$k")).as(k)) ++
            comps.toSeq.flatMap { case (b2, n, _) =>
              FoldAlg.mergeCols(n, b2) }: _*),
      // the finalized flush relation: __wb + output attrs (group keys
      // appear among the outputs — the select-item checks enforce it)
      flushOf = acc => acc.select(col("__wb") +:
        finals.map { case (a, e) => expr(sqlOf(e)).as(a) }: _*),
      probeSel = df => keyedSel(df).select(keys.map(col): _*))
  }

  private[api] def flushPartialFold(feed: DataFrame, filter: Option[Expr],
      groupBy: List[String], items: List[(SelItem, String, Boolean)],
      tNs: Long, fnsSnap: Map[String, ScriptFn], ordCols: Seq[Column],
      finish: (SparkSession, DataFrame) => DataFrame)
      : (LiveFold, DataFrame) = {
    val empty = emptyOf(feed.sparkSession, feed.schema)
    val p = flushPiecesOf(empty, filter, groupBy, items, tNs)
    // deploy-time validation + the caller's result prototype
    val proto = finish(feed.sparkSession, p.flushOf(p.partialOf(empty)))
    (singleFold(feed, p.stateSchema,
      (sp, _, acc, batch) => {
        scriptFns = fnsSnap
        p.merge(acc, p.partialOf(batch))
      },
      (sp, acc) => {
        scriptFns = fnsSnap
        finish(sp, p.flushOf(acc))
      }, ordCols,
      KeyedState(p.keys, (sp, _, batch) => {
        scriptFns = fnsSnap
        p.probeSel(batch)
      })), proto)
  }

  /** The one-state [[LiveFold]] shape every pre-enrichment fold stage
    * uses (table DML, unique:last, sort, frequent). */
  private[api] def singleFold(feed: DataFrame, schema: StructType,
      fold: (SparkSession, String, DataFrame, DataFrame) => DataFrame,
      finish: (SparkSession, DataFrame) => DataFrame,
      ordCols: Seq[Column],
      mode: StateMode = FullState,
      limit: Option[Long] = None, offset: Option[Long] = None): LiveFold =
    LiveFold(feed, Seq(("state", schema, mode)),
      (sp, d, st, b) => Map("state" -> fold(sp, d, st("state").slice, b)),
      (sp, st) => finish(sp, st("state")), ordCols, limit, offset)

  /** Stage compiler shared by [[deployAppOn]] and [[deployApp]]:
    * returns the `out` query's streaming DataFrame (with its stage
    * kind 0=stateless / 1=complete-agg / 2=windowed-append-agg and
    * ordering), or — when `out` names a table-DML statement — the DML
    * spec (ast, action, table schema, feeding stream name + its
    * streaming DataFrame) for the caller's foreachBatch merge. */
  private[api] def deployStages(src: DataFrame, app: String, out: String)
      : (Option[(DataFrame, Int, Seq[Column])], Option[LiveFold]) = {
    val need = Seq("event_id", "ts_ns", "user_id", "event_type", "value")
    need.foreach { c =>
      if (!src.columns.contains(c))
        fail(s"deployAppOn source lacks required column '$c'")
    }
    import src.sparkSession.implicits._
    import graft.engine.Streaming
    lazy val evDs = src.select(col("event_id").as("eventId"),
      col("ts_ns").as("tsNs"), col("user_id").as("userId"),
      col("event_type").as("eventType"), col("value")).as[Cep.Ev]
    // per-stage state behavior when deployed (see scaladoc)
    val KStateless = 0; val KComplete = 1; val KWindowAgg = 2
    val KFold = 3 // handled via foldResult; no streaming sink of its own
    val KUpdate = 4 // global agg in Update mode → keyed upsert collapse
    val srcTs =
      if (src.columns.contains("ts")) src
      else src.withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    // captured ONCE per deployment: the same value becomes the source
    // watermark delay AND the compaction freeze bound (see scaladoc
    // at DefaultWatermarkNs) — they move in lockstep by construction
    val wmNs = watermarkNs(src.sparkSession)
    var env = Map[String, DataFrame](
      "events" -> srcTs.withWatermark("ts",
        s"${wmNs / 1000000000L} seconds"))
    var statefulStreams = Set.empty[String]
    var tableDefs = Map.empty[String, StructType]
    var liveWindowDefs = Map.empty[String, WindowSpec]
    var liveAggDefs = Map.empty[String, AggDef]
    var liveTriggerDefs = Map.empty[String, Long] // name -> interval ns
    var result: Option[(DataFrame, Int, Seq[Column])] = None
    var foldResult: Option[LiveFold] = None
    // (ast, action, table schema, feeding stream) per DML writer, keyed
    // by target table — the enrichment-join compiler reads these
    var dmlInfos = Map.empty[String, List[(Ast, Action, StructType,
      String)]]
    // stateless insert-into stages in textual order, re-compilable
    // against a BATCH env — the fold channel derives its feeds from the
    // raw source through these (so one foreachBatch serves stages that
    // need several derived feeds: the DML's and the enrichment's)
    var statelessAsts = List.empty[(String, Ast)]
    // Batch twin of the stateless stage environment: re-derives every
    // stateless derived stream from one micro-batch of the SOURCE via
    // the batch compiler (stateless plans are chunking-invariant, so
    // the derived batch rows ARE the derived stream's rows for that
    // trigger). Plan construction only — nothing executes until used.
    def batchEnv(sp: SparkSession, d2: String, rawBatch: DataFrame,
        defs: List[(String, Ast)]): Map[String, DataFrame] = {
      var benv = Map[String, DataFrame]("events" -> rawBatch)
      defs.foreach { case (t, a) =>
        val df = compileAst(sp, d2, a, benv)
        benv += t -> (benv.get(t) match {
          case Some(prev) => prev.unionByName(df)
          case None => df
        })
      }
      benv
    }
    // `f OR ts >= flushCutoff`: keeps the user predicate above the
    // source watermark node (it now references the event-time column)
    // and lets flush sentinels through; real rows (ts < cutoff) see
    // exactly the original predicate, null semantics included
    def liveWhere(df: DataFrame, f: Expr): DataFrame =
      if (df.columns.contains("ts"))
        df.where(expr(sqlOf(f)) || col("ts") >= Streaming.flushCutoff)
      else df.where(expr(sqlOf(f)))
    // Epoch-aligned tumbling aggregation deployed in APPEND mode: group
    // by the built-in `window()` over the source-watermarked event-time
    // column, so every pane emits exactly once when the watermark
    // passes its end and its state row is EVICTED (engine twin:
    // Streaming.timeBatchSum). The guard drops flush sentinels right
    // above the watermark node — the predicate references `ts`, so
    // pushdown keeps it there. `window()` floors to epoch-aligned
    // buckets, matching the batch compile's `(ts_ns div T) * T` for the
    // non-negative timestamps the event-time contract requires.
    def windowedAgg(ast: Ast, base: DataFrame, keyName: String,
        ivNs: Long, offNs: Long = 0L): DataFrame = {
      if (!base.columns.contains("ts"))
        fail("a live windowed aggregation needs the event-time column " +
          "'ts'")
      val items = itemsOf(ast)
      val aggCols = items.collect { case (it, a, true) =>
        expr(sqlOf(it.e)).as(a) }
      if (aggCols.isEmpty) fail("a windowed query needs an aggregate " +
        "select")
      items.collect { case (it, _, false) => it }.foreach { it =>
        it.e match {
          case Ref(parts) if ast.groupBy.contains(parts.last) => ()
          case _ => fail(s"non-aggregate select item '${sqlOf(it.e)}' " +
            "must be a group by column")
        }
      }
      val guarded = base.filter(col("ts") < Streaming.flushCutoff)
      // start-time alignment (r17) rides the built-in window()'s
      // native startTime offset — same epoch + k·T + s boundaries as
      // the batch compile's shifted div
      val w =
        if (offNs == 0L) window(col("ts"), s"${ivNs / 1000} microseconds")
        else window(col("ts"), s"${ivNs / 1000} microseconds",
          s"${ivNs / 1000} microseconds", s"${offNs / 1000} microseconds")
      val agged = guarded.groupBy(w +: ast.groupBy.map(col): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      val hav = ast.having.fold(agged)(h => agged.where(expr(sqlOf(h))))
      hav.select(unix_millis(col("window.start")).as(keyName) +:
        items.map { case (it, a, isAgg) =>
          if (isAgg) col(a)
          else it.e match { case Ref(parts) => col(parts.last).as(a)
                            case _ => col(a) } }: _*)
    }
    // one `from ...` stage: compiles onto the live topology, updating
    // env / statefulStreams / result / dmlResult. `view` is the stage's
    // read environment (a partition block overrides its stream with the
    // keyed/labeled view); `partKey` marks partition-block queries.
    def runStage(name: Option[String], ast0L: Ast,
        view: Map[String, DataFrame], partKey: Option[String]): Unit = {
        // reading a defined window compiles as fed-stream#spec (the
        // batch replay's named-window sharing, on the incremental
        // plan) — on single-stream reads AND join sides (r16)
        def namedWinL(ss: SingleStream): SingleStream =
          if (liveWindowDefs.contains(ss.table) && ss.window.isEmpty) {
            if (!env.contains(ss.table))
              fail(s"named window '${ss.table}' has not been fed — " +
                s"add an `insert into ${ss.table}` query first")
            ss.copy(window = Some(liveWindowDefs(ss.table)))
          } else ss
        val ast = ast0L.stream match {
          case ss: SingleStream => ast0L.copy(stream = namedWinL(ss))
          case j: JoinStream => ast0L.copy(stream = j.copy(
            left = namedWinL(j.left), right = namedWinL(j.right)))
          case _ => ast0L
        }
        // rate over pattern matches deploys through the fold channel
        // (see the PatternStream case); snapshot keeps the batch
        // compiler's refusal, named identically on both surfaces
        if (ast.rate.exists(_.mode == "snapshot") &&
            ast.stream.isInstanceOf[PatternStream])
          fail("output snapshot over a pattern (v1): insert the " +
            "matches into a stream and snapshot that stream")
        val dmlAct = ast.action.filter {
          case InsertInto(t) => tableDefs.contains(t)
          case _             => true
        }
        if (dmlAct.nonEmpty) {
          // table DML from a partition block never reaches this arm
          // with a partKey: the partition branch HOISTS it to
          // top-level writer AST(s) first (keyed windowed → key
          // prepended to group by; range → range conditions folded
          // into the writer filter — the batch compiler's exact r14
          // rewrite) and re-enters runStage partKey-less, so the DML
          // capture below sees only legitimate top-level writers.
          // table DML deployed LIVE: captured here, executed by
          // deployApp as a per-micro-batch keyed MERGE over the
          // accumulated table (engine twin: Streaming.tableUpsert).
          // Statement-at-once batch semantics survive the micro-batch
          // split because applyDml's merge is a per-key fold: set RHS
          // may reference the triggering event only (enforced there),
          // so last-update-wins composes across batches.
          val act = dmlAct.get
          val schema = tableDefs.getOrElse(act.target, fail(
            s"'${act.target}' is not a defined table — add " +
              s"`define table ${act.target}(...)` before the DML query"))
          val srcName = ast.stream match {
            case ss: SingleStream => ss.table
            case _ => fail("table DML (v1) requires a single un-joined " +
              "source stream")
          }
          if (statefulStreams.contains(srcName))
            fail(s"live deployment (v1): '$srcName' is an aggregation " +
              "output — it cannot feed table DML")
          val feed = envLookup(view, srcName).getOrElse(fail("live deployment " +
            s"reads declared streams; '$srcName' is neither the " +
            "source nor an earlier insert-into target"))
          // build the merge plan NOW over empty frames so a bad app
          // fails at deploy time, not at the first trigger
          applyDml(feed.sparkSession, "", ast, act, schema,
            emptyOf(feed.sparkSession, schema),
            Map(srcName -> emptyOf(feed.sparkSession, feed.schema)))
          // reads of a DML-maintained table deploy through the
          // enrichment-join fold (the JoinStream branch below); any
          // other read shape is diagnosed via the aggregation-output
          // path
          statefulStreams += act.target
          dmlInfos += act.target -> (dmlInfos.getOrElse(act.target, Nil)
            :+ ((ast, act, schema, srcName)))
          if (name.contains(out) || act.target == out) {
            val fnsSnap = scriptFns // restore on the micro-batch thread
            val winSpec = ast.stream match {
              case ss: SingleStream => ss.window
              case _ => None
            }
            val allWriters = dmlInfos(act.target)
            if (allWriters.length > 1 && !dmlComposable(allWriters))
              fail(s"multi-writer table '${act.target}' (v1) deploys " +
                "ORDER-COMPOSABLE writer groups only (all insert / " +
                "all implicit-set upsert / all identical-fold upsert " +
                "/ insert + implicit-set upsert multiset groups / " +
                "any of those + keyed delete sweepers on the same " +
                "key) — the remaining heterogeneous pipelines " +
                "(insert + expr-set fold upserts, update/upsert-expr " +
                "mixes, mixed keys) are row-level replays, batch " +
                "surfaces by design")
            if (allWriters.length > 1) {
              // MULTI-WRITER table deployed LIVE: the fold applies
              // every registered writer's emissions per trigger in
              // per-event interleaved order (applyDmlMulti — the same
              // merged algebra as the batch compile, which is why the
              // batch replay is the oracle). Each writer's feed
              // re-derives from the source batch, so every writer must
              // read the source (or a stateless derived stream).
              // Groups with ANY windowed writer — all-windowed or
              // MIXED with per-event writers/sweepers — deploy via
              // per-writer states + the batch merge tail (r14,
              // multiWindowedDmlFold); all-per-event groups keep the
              // per-trigger incremental merge (O(table keys) state).
              val winN = allWriters.count { case (wAst, _, _, _) =>
                wAst.stream match {
                  case ss: SingleStream => ss.window.nonEmpty
                  case _                => false
                }
              }
              allWriters.foreach { case (_, _, _, wSrc) =>
                val derivable = Set("events") ++ statelessAsts.map(_._1)
                if (!derivable.contains(wSrc))
                  fail(s"multi-writer table '${act.target}' (v1): " +
                    s"writer source '$wSrc' must be the source stream " +
                    "or a stateless derived stream")
              }
              val statelessSnap = statelessAsts
              val sp00 = srcTs.sparkSession
              // deploy-time probe: shape checks fail NOW, not at the
              // first trigger
              applyDmlMulti(sp00, "", allWriters, schema,
                emptyOf(sp00, schema), batchEnv(sp00, "",
                  emptyOf(sp00, srcTs.schema), statelessSnap))
              foldResult = Some(
                if (winN > 0)
                  multiWindowedDmlFold(srcTs, allWriters, schema,
                    fnsSnap, (sp, d2, batch) =>
                      batchEnv(sp, d2, batch, statelessSnap))
                else singleFold(srcTs, schema,
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnap
                    applyDmlMulti(sp, d2, allWriters, schema, acc,
                      batchEnv(sp, d2, batch, statelessSnap))
                  },
                  (_, acc) => acc, Nil,
                  dmlStateModeMulti(allWriters, act.target, schema,
                    fnsSnap, (sp, d2, batch) =>
                      batchEnv(sp, d2, batch, statelessSnap))))
            } else winSpec match {
              case Some(WindowSpec(_, tNs :: _, _)) =>
                // windowed-aggregate DML (the Siddhi store pattern)
                // LIVE: a per-batch applyDml would double-apply a
                // window bucket that spans two triggers, so the fold
                // keeps per-(bucket ∪ group keys) algebraic PARTIALS
                // instead and runs the emission merge once, at finish
                foldResult = Some(windowedDmlFold(feed, ast, act,
                  schema, tNs, fnsSnap))
              case _ =>
                foldResult = Some(singleFold(feed, schema,
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnap
                    applyDml(sp, d2, ast, act, schema, acc,
                      Map(srcName -> batch))
                  },
                  (_, acc) => acc, Nil,
                  // insert-only DML appends generation deltas; keyed
                  // DML bucket-merges — per-trigger write cost
                  // O(batch), not O(accumulated table)
                  dmlStateMode(ast, act, schema, srcName, fnsSnap,
                    (_, _, batch) => Map(srcName -> batch))))
            }
          }
        } else {
        var carriedNow: Seq[String] = Nil
        // rate over pattern matches: register the accumulate-then-rank
        // fold (AppendState match log; finish = the BATCH selection,
        // rateOverMatches, so both surfaces share one code path)
        def patternRateFold(matches: DataFrame, r: Rate,
            outCols: Seq[String], schemaR: StructType,
            needsFl: Boolean): (DataFrame, Int) = {
          val keyP = name.orElse(ast.action.map(_.target))
          if (keyP.contains(out) || name.contains(out))
            foldResult = Some(LiveFold(matches,
              Seq(("m", schemaR, AppendState)),
              (_, _, _, batch) => Map("m" -> batch),
              (_, st) => rateOverMatches(st("m"), outCols, r),
              ast.orderBy.map { case (c, a) =>
                if (a) col(c).asc else col(c).desc },
              needsFlush = needsFl))
          (emptyOf(matches.sparkSession, schemaR), KFold)
        }
        // END-OF-REPLAY table READ (r14): the maintained table's fold
        // for a `from T select ...` OUT stage — the same
        // constructions the DML-capture branch deploys (multi-writer
        // interleave / windowed flush partials / plain keyed merge),
        // so the read rides whatever store the writers already built
        def tableFoldFor(tName: String): LiveFold = {
          val allWriters = dmlInfos(tName)
          val schema = tableDefs(tName)
          val fnsSnap = scriptFns
          val statelessSnap = statelessAsts
          def feedOf(wSrc: String): DataFrame =
            envLookup(view, wSrc).getOrElse(fail("live deployment " +
              s"reads declared streams; table writer source '$wSrc' " +
              "is neither the source nor an earlier insert-into " +
              "target"))
          if (allWriters.length > 1) {
            // the DML-capture branch validates composability and
            // writer shapes when a DML stage IS the out — a read-out
            // app validates here, with the same rules
            if (!dmlComposable(allWriters))
              fail(s"multi-writer table '$tName' (v1) deploys " +
                "ORDER-COMPOSABLE writer groups only — see the DML " +
                s"diagnostics; got [${dmlKinds(allWriters)
                  .mkString(", ")}]")
            val winN = allWriters.count { case (wAst, _, _, _) =>
              wAst.stream match {
                case ss: SingleStream => ss.window.nonEmpty
                case _                => false
              }
            }
            allWriters.foreach { case (_, _, _, wSrc) =>
              val derivable = Set("events") ++ statelessSnap.map(_._1)
              if (!derivable.contains(wSrc))
                fail(s"multi-writer table '$tName' (v1): writer " +
                  s"source '$wSrc' must be the source stream or a " +
                  "stateless derived stream")
            }
            if (winN > 0)
              multiWindowedDmlFold(srcTs, allWriters, schema, fnsSnap,
                (sp, d2, batch) =>
                  batchEnv(sp, d2, batch, statelessSnap))
            else singleFold(srcTs, schema,
              (sp, d2, acc, batch) => {
                scriptFns = fnsSnap
                applyDmlMulti(sp, d2, allWriters, schema, acc,
                  batchEnv(sp, d2, batch, statelessSnap))
              },
              (_, acc) => acc, Nil,
              dmlStateModeMulti(allWriters, tName, schema, fnsSnap,
                (sp, d2, batch) =>
                  batchEnv(sp, d2, batch, statelessSnap)))
          } else {
            val (wAst, wAct, _, wSrc) = allWriters.head
            val winSpec = wAst.stream match {
              case ss: SingleStream => ss.window
              case _ => None
            }
            winSpec match {
              case Some(wtb @ WindowSpec(_, tNs :: _, _)) =>
                requireEpochTb(wtb, "live windowed table DML")
                windowedDmlFold(feedOf(wSrc), wAst, wAct, schema,
                  tNs, fnsSnap)
              case _ =>
                singleFold(feedOf(wSrc), schema,
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnap
                    applyDml(sp, d2, wAst, wAct, schema, acc,
                      Map(wSrc -> batch))
                  },
                  (_, acc) => acc, Nil,
                  dmlStateMode(wAst, wAct, schema, wSrc, fnsSnap,
                    (_, _, batch) => Map(wSrc -> batch)))
            }
          }
        }
        val (df, kind) = ast.stream match {
          // `from AggName within ... per '...'` reading a LIVE
          // `define aggregation`: the grain cascade compiles onto the
          // keyed bucket-merge fold channel. State is the FINEST-grain
          // partial table keyed by (bucket, group keys) — each trigger
          // computes the batch's partials and merges only the
          // batch-touched buckets (per-trigger write cost
          // O(batch-touched buckets), not O(state)); the read's
          // roll-up / within bound / finalize runs at finish exactly
          // as the batch path's aggRollUp, which is why the batch
          // incremental-aggregation oracle is the live gate's truth.
          // `from T ...` reading a LIVE `define trigger`: tick
          // generation is event-time-span driven in the replay (the
          // batch compile's exact rule — aligned interval starts over
          // [min, max] of the stream's ts_ns), tracked incrementally:
          // fold state is ONE (lo, hi) row of aligned bucket bounds,
          // merged per trigger; finish explodes the tick sequence
          // (O(span/iv) rows) and runs the read query's batch compile
          // over it — filters/projections/joins against ticks all
          // compose. A wall-clock deployment swaps the span state for
          // a rate source; everything above the tick relation is
          // unchanged.
          case s: SingleStream if liveTriggerDefs.contains(s.table) =>
            if (partKey.nonEmpty)
              fail("a trigger read inside a partition block is not " +
                "deployed (v1)")
            val ivNs = liveTriggerDefs(s.table)
            val ivMs = ivNs / 1000000L
            val tname = s.table
            val fnsSnap = scriptFns
            val sp0 = srcTs.sparkSession
            val spanSchema = StructType(Seq(
              StructField("lo", LongType), StructField("hi", LongType)))
            def ticksOf(acc: DataFrame): DataFrame =
              acc.select(explode(sequence(col("lo"), col("hi"),
                lit(ivMs))).as("tick_ms"))
            // deploy-time validation over an empty tick relation (also
            // rejects reads of anything besides the trigger — the
            // finish recompile carries no table directory)
            val protoT = compileAst(sp0, "", ast,
              Map(tname -> ticksOf(emptyOf(sp0, spanSchema))))
            val keyT = name.orElse(ast.action.map(_.target))
            if (keyT.contains(out) || name.contains(out))
              foldResult = Some(singleFold(srcTs, spanSchema,
                (_, _, acc, batch) => {
                  val b2 = batch.agg(
                    expr(s"min((ts_ns div ${ivNs}L) * ${ivMs}L)")
                      .as("lo"),
                    expr(s"max((ts_ns div ${ivNs}L) * ${ivMs}L)")
                      .as("hi"))
                  acc.unionByName(b2)
                    .agg(min("lo").as("lo"), max("hi").as("hi"))
                    .where(col("lo").isNotNull)
                },
                (sp, acc) => {
                  scriptFns = fnsSnap
                  compileAst(sp, "", ast, Map(tname -> ticksOf(acc)))
                },
                ast.orderBy.map { case (c2, asc) =>
                  if (asc) col(c2).asc else col(c2).desc }))
            carriedNow = Nil
            (emptyOf(sp0, protoT.schema), KFold)
          case s: SingleStream if liveAggDefs.contains(s.table) =>
            if (partKey.nonEmpty)
              fail("an aggregation read inside a partition block is " +
                "not deployed (v1)")
            val adef = liveAggDefs(s.table)
            val (perMs, lo, hi) = aggReadSpec(s, adef)
            val (pCols, cCols, fMap) = aggPlanCols(adef)
            if (ast.groupBy.nonEmpty || ast.having.nonEmpty)
              fail("an aggregation read is a projection over stored " +
                "attributes (no group by / having)")
            val items = itemsOf(ast)
            items.foreach { case (_, a2, isAgg) =>
              if (isAgg) fail("an aggregation read selects stored " +
                s"attributes (no re-aggregation, v1): '$a2'")
            }
            val fnsSnap = scriptFns
            def readProj(stored: DataFrame): DataFrame =
              stored.select(col("bucket_start_ms") +:
                items.map { case (it, a2, _) =>
                  expr(sqlOf(it.e)).as(a2) }: _*)
            val sp0 = srcTs.sparkSession
            val finestMs = grainMsOf(adef.grains.head)
            val stateKeys = "__gb" +: adef.groupBy
            // prototype over an empty frame: deploy-time validation
            // (schema, filter, read projection) + the state schema
            val proto = aggGrainPartial(
              emptyOf(sp0, srcTs.schema), adef, pCols)
            readProj(aggRollUp(proto, adef, perMs, lo, hi, cCols, fMap))
            def mergeFold(sp: SparkSession, acc: DataFrame,
                batch: DataFrame): DataFrame = {
              scriptFns = fnsSnap
              val u = aggGrainPartial(batch, adef, pCols)
              acc.as("t").join(u.as("u"),
                  stateKeys.map(k2 => col(s"t.$k2") <=> col(s"u.$k2"))
                    .reduce(_ && _), "full_outer")
                .select(stateKeys.map(k2 => coalesce(col(s"u.$k2"),
                    col(s"t.$k2")).as(k2)) ++ aggMergeCols(adef): _*)
            }
            val keyA = name.orElse(ast.action.map(_.target))
            if (keyA.contains(out) || name.contains(out))
              foldResult = Some(singleFold(srcTs, proto.schema,
                (sp, _, acc, batch) => mergeFold(sp, acc, batch),
                (_, acc) => {
                  scriptFns = fnsSnap
                  readProj(aggRollUp(acc, adef, perMs, lo, hi,
                    cCols, fMap))
                },
                ast.orderBy.map { case (c2, asc) =>
                  if (asc) col(c2).asc else col(c2).desc },
                KeyedState(stateKeys, (_, _, batch) => {
                  val f = adef.filter.fold(batch)(ff =>
                    batch.where(expr(sqlOf(ff))))
                  f.select(expr(s"(${adef.tsAttr} div " +
                    s"${finestMs * 1000000L}L) * ${finestMs}L")
                    .as("__gb") +: adef.groupBy.map(col): _*)
                })))
            carriedNow = Nil
            (emptyOf(sp0, proto.schema), KFold)
          case s: SingleStream if dmlInfos.contains(s.table) =>
            // `from T select ...` over a DML-maintained table (r14):
            // an END-OF-REPLAY snapshot read — the table fold runs as
            // usual and the read query's filter/projection/order
            // apply at finish (the batch 'read' stage's semantics; a
            // table is not a stream, per-event reads are the
            // enrichment join). v1: stateless projection only.
            if (ast.select.exists(it => containsAgg(it.e)) ||
                ast.groupBy.nonEmpty || ast.having.nonEmpty)
              fail("a live table read projects columns (v1) — for " +
                "aggregates use an on-demand store query (compileApp) " +
                "or aggregate the stream feeding the table")
            if (s.window.nonEmpty)
              fail("a live table read takes no window (v1) — the " +
                "table is an end-of-replay snapshot, not a stream")
            if (ast.rate.nonEmpty)
              fail("a live table read takes no output rate limiting " +
                "(v1) — rate the stream feeding the table instead")
            if (partKey.nonEmpty)
              fail("a live table read inside a partition block is " +
                "not deployed (v1)")
            val baseLf = tableFoldFor(s.table)
            val fnsSnapR = scriptFns
            val itemsR = itemsOf(expandStar(ast,
              tableDefs(s.table).fieldNames))
            def projectT(t: DataFrame): DataFrame = {
              scriptFns = fnsSnapR
              val f = s.filter.fold(t)(ff => t.where(expr(sqlOf(ff))))
              f.select(itemsR.map { case (it, a2, _) =>
                expr(sqlOf(it.e)).as(a2) }: _*)
            }
            // deploy-time fail-fast + output schema
            val protoT = projectT(
              emptyOf(srcTs.sparkSession, tableDefs(s.table)))
            val keyT = name.orElse(ast.action.map(_.target))
            if (keyT.contains(out) || name.contains(out))
              foldResult = Some(baseLf.copy(
                finish = (sp, st) => projectT(baseLf.finish(sp, st)),
                ordCols = ast.orderBy.map { case (c2, a2) =>
                  if (a2) col(c2).asc else col(c2).desc },
                limit = ast.limit, offset = ast.offset))
            (protoT, KFold)
          case s: SingleStream =>
            if (statefulStreams.contains(s.table))
              fail(s"live deployment (v1): '${s.table}' is an " +
                "aggregation output — it must be the app's final sink, " +
                "not a feed for further stages")
            val base0 = envLookup(view, s.table).getOrElse(fail("live deployment " +
              s"reads declared streams; '${s.table}' is neither the " +
              "source nor an earlier insert-into target"))
            val base = s.filter.fold(base0)(f => liveWhere(base0, f))
            s.window match {
              case None if ast.rate.exists(r => r.mode == "last" &&
                  r.timeNs.nonEmpty && r.count.isEmpty) &&
                  !ast.select.exists(it => containsAgg(it.e)) =>
                // `output last every T` LIVE: an interval's LAST event
                // is only known when the interval closes — an
                // Append-mode time-window aggregation:
                // max_by(projected row, (ts_ns, event_id)) per
                // window(ts, T); the watermark emits and EVICTS each
                // interval once it has passed (bounded state; batch
                // twin: compileRateLimited's first|last arm, engine
                // twin: Ops.rateLimit's last_id)
                if (ast.groupBy.nonEmpty || ast.having.nonEmpty)
                  fail("output rate limiting (v1) applies to plain " +
                    "`from S[filter] select ...` (no group by / having)")
                Seq("ts", "ts_ns", "event_id").foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"live rate limiting needs column '$c'"))
                val tNs = ast.rate.get.timeNs.get
                val items = itemsOf(ast)
                val rowC = struct(items.map { case (it, a, _) =>
                  expr(sqlOf(it.e)).as(a) }: _*)
                val lastDf = base
                  .filter(col("ts") < Streaming.flushCutoff)
                  .groupBy(window(col("ts"),
                    s"${tNs / 1000} microseconds"))
                  .agg(max_by(rowC,
                    struct(col("ts_ns"), col("event_id"))).as("__row"))
                  .select(col("__row.*"))
                (lastDf, KWindowAgg)
              case None if ast.rate.exists(r => r.mode == "snapshot" &&
                  r.timeNs.nonEmpty && r.count.isEmpty) &&
                  !ast.select.exists(it => containsAgg(it.e)) =>
                // `output snapshot every T` LIVE: the latest projected
                // row as of each interval end, gap intervals carrying
                // the previous snapshot forward (batch twin:
                // compileRateLimited's snapshot arm; engine twin:
                // Ops.rateLimitSnapshot). The per-interval keep-latest
                // is a keyed fold on the interval id — bucketed
                // generations rewrite only the intervals the batch
                // touches — and the gap fill runs once at finish over
                // the O(span/T) snapshot rows.
                if (ast.groupBy.nonEmpty || ast.having.nonEmpty)
                  fail("output rate limiting (v1) applies to plain " +
                    "`from S[filter] select ...` (no group by / having)")
                Seq("ts_ns", "event_id").foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"live rate limiting needs column '$c'"))
                val tNs = ast.rate.get.timeNs.get
                val ivMs = tNs / 1000000L
                val items = itemsOf(ast)
                val outCols = items.map(_._2)
                def partialSnap(df: DataFrame): DataFrame =
                  df.select(items.map { case (it, a, _) =>
                      expr(sqlOf(it.e)).as(a) } :+
                      expr(s"ts_ns div ${tNs}L").as("__iv") :+
                      struct(col("ts_ns"), col("event_id")).as("__ord")
                      : _*)
                    .groupBy("__iv")
                    .agg(max_by(struct(outCols.map(col): _*),
                      col("__ord")).as("__row"),
                      max(col("__ord")).as("__ord"))
                val schemaS = partialSnap(base).schema
                val keyR = name.orElse(ast.action.map(_.target))
                val fnsSnapR = scriptFns
                if (keyR.contains(out) || name.contains(out))
                  foldResult = Some(singleFold(base, schemaS,
                    (_, _, acc, batch) => {
                      scriptFns = fnsSnapR
                      acc.unionByName(partialSnap(batch))
                        .groupBy("__iv")
                        .agg(max_by(col("__row"), col("__ord"))
                          .as("__row"), max(col("__ord")).as("__ord"))
                    },
                    (_, acc) => {
                      val ticks = acc
                        .agg(min("__iv").as("__lo"),
                          max("__iv").as("__hi"))
                        .where(col("__lo").isNotNull)
                        .select(explode(sequence(col("__lo"),
                          col("__hi"))).as("__iv"))
                      val w = org.apache.spark.sql.expressions.Window
                        .orderBy("__iv")
                        .rowsBetween(org.apache.spark.sql.expressions
                          .Window.unboundedPreceding, 0)
                      ticks.join(acc, Seq("__iv"), "left_outer")
                        .select(col("__iv") +: outCols.map(c =>
                          last(col(s"__row.$c"), ignoreNulls = true)
                            .over(w).as(c)): _*)
                        .select(((col("__iv") + 1) * ivMs)
                          .as("w_end_ms") +: outCols.map(col): _*)
                    },
                    ast.orderBy.map { case (c, a2) =>
                      if (a2) col(c).asc else col(c).desc },
                    KeyedState(Seq("__iv"), (_, _, batch) =>
                      batch.select(expr(s"ts_ns div ${tNs}L")
                        .as("__iv")))))
                (emptyOf(base.sparkSession, schemaS), KFold)
              case None
                  if ast.rate.exists(r =>
                    r.count.nonEmpty &&
                      (r.mode == "first" || r.mode == "last")) =>
                // COUNT-based `output first|last every N events` LIVE:
                // chunk boundaries are GLOBAL arrival ranks (the batch
                // twin's guarded single-sequence semantics), so the
                // stage folds per micro-batch against one counter row —
                // state = the counter + the pending chunk-tail; output
                // is append-only (emitted rows with their rank). `last`
                // additionally emits the trailing partial chunk's tail
                // at finish, exactly as the batch twin's max-rank pick
                // does.
                if (ast.select.exists(it => containsAgg(it.e)) ||
                    ast.groupBy.nonEmpty)
                  fail("output rate limiting (v1) select cannot " +
                    "aggregate")
                if (partKey.nonEmpty)
                  fail("count-based rate limiting inside a partition " +
                    "block is not deployed (v1)")
                val rC = ast.rate.get
                val mR = rC.mode; val nEv = rC.count.get
                val itemsR = itemsOf(ast)
                Seq("ts_ns", "event_id").foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"output rate limiting needs '$c' on the " +
                      "stream to define emission order"))
                def projR(df: DataFrame): DataFrame =
                  df.select(itemsR.map { case (it, a2, _) =>
                    expr(sqlOf(it.e)).as(a2) } :+ col("__rn"): _*)
                val outSchema =
                  projR(base.withColumn("__rn", lit(0L))).schema
                val pendSchema = StructType(
                  base.schema.fields :+ StructField("__rn", LongType))
                val keyR = name.orElse(ast.action.map(_.target))
                // state = the pending chunk-tail row only: its __rn IS
                // the running arrival count (the rank of the last
                // filtered arrival), so no separate counter row exists
                if (keyR.contains(out) || name.contains(out))
                  foldResult = Some(LiveFold(base,
                    Seq(("out", outSchema, AppendState),
                      ("pend", pendSchema, FullState)),
                    (_, _, st, batch0) => {
                      val prior = st("pend").slice.collect()
                        .headOption.map(_.getAs[Long]("__rn"))
                        .getOrElse(0L)
                      val batch = batch0.withColumn("__rn",
                        expr("row_number() over (order by ts_ns, " +
                          "event_id)") + lit(prior))
                      val kept =
                        if (mR == "first")
                          batch.filter((col("__rn") - 1) % nEv === 0)
                        else batch.filter(col("__rn") % nEv === 0)
                      Map(
                        "out" -> projR(kept),
                        "pend" -> batch.orderBy(col("__rn").desc)
                          .limit(1).unionByName(
                            st("pend").slice.limit(1))
                          .orderBy(col("__rn").desc).limit(1))
                    },
                    (_, st) => {
                      val total = st("pend").collect()
                        .headOption.map(_.getAs[Long]("__rn"))
                        .getOrElse(0L)
                      val fin =
                        if (mR == "last" && total % nEv != 0)
                          st("out").unionByName(projR(st("pend")))
                        else st("out")
                      fin.orderBy("__rn").drop("__rn")
                    },
                    ast.orderBy.map { case (c2, a2) =>
                      if (a2) col(c2).asc else col(c2).desc }))
                (emptyOf(base.sparkSession, outSchema), KFold)
              case None =>
                val agg = ast.select.exists(it => containsAgg(it.e))
                // `output first every T` LIVE: streaming dropDuplicates
                // on the interval id — the first event of each interval
                // emits AS IT ARRIVES; the watermark evicts interval
                // state once the interval has passed (bounded state at
                // any runtime length; engine twin:
                // Streaming.rateLimitFirst). `output all every T` only
                // batches EMISSION, never content — deployed as the
                // pass-through it is.
                val rated = ast.rate match {
                  case None => base
                  case Some(_) if agg => fail("live rate limiting " +
                    "applies to stateless stages (v1)")
                  case Some(Rate("all", _, _)) => base
                  case Some(Rate("first", Some(tNs), None)) =>
                    if (!base.columns.contains("ts"))
                      fail("live rate limiting needs the event-time " +
                        "column 'ts'")
                    // the interval id is a TIMESTAMP event-time column
                    // carrying the watermark tag AND serving as the
                    // dedup key: Spark only evicts streaming-dedup state
                    // when a watermarked column is among the keys, so a
                    // derived LONG id would accumulate state forever
                    // (engine twin: Streaming.rateLimitFirst). The tag
                    // is attached as metadata — a second withWatermark
                    // NODE below the source one would be a disallowed
                    // redefinition; the watermark VALUE still comes from
                    // the source node, and __w <= ts so eviction is
                    // sound (an interval's state drops once the
                    // watermark passes its start).
                    val mdw = new MetadataBuilder()
                      .putLong("spark.watermarkDelayMs", 60000L).build()
                    base.select(col("*"),
                        timestamp_millis(
                          expr(s"(ts_ns div ${tNs}L) * ${tNs / 1000000}L"))
                          .as("__w", mdw))
                      .dropDuplicates("__w")
                      .drop("__w")
                  case Some(r) => fail("live deployment (v1) supports " +
                    "time-based `output first|last|all|snapshot every " +
                    s"<time>`; got mode '${r.mode}'" +
                    r.count.fold("")(_ => " with an event count"))
                }
                // carry the watermarked event-time columns through the
                // projection (dropped again if this stage is the sink)
                // so a downstream window can bucket and evict by them
                val carryCols =
                  if (agg) Nil
                  else {
                    val aliases = itemsOf(ast).map(_._2).toSet
                    Seq("ts", "ts_ns").filter(c =>
                      rated.columns.contains(c) && !aliases.contains(c))
                  }
                carriedNow = carryCols
                val outDf = selectOrAggregate(ast, rated, Nil,
                  windowed = false, carry = carryCols.map(col))
                if (!agg) (outDf, KStateless)
                else {
                  // live global (unwindowed) aggregation runs UPDATE
                  // mode: each trigger emits only the groups the batch
                  // changed — sink volume O(batch keys) per trigger,
                  // not O(all groups) as Complete-mode re-emission
                  // would be. The runner collapses the emissions into
                  // a keyed upsert (last write per group wins), the
                  // scale-safe shape of the reference's ever-updating
                  // aggregate. `__ukey` carries the group identity to
                  // the collapse and is dropped at the sink; when the
                  // group key is not projected there is no upsert
                  // identity, so the stage keeps bounded-state
                  // Complete re-emission.
                  if (ast.groupBy.isEmpty)
                    (outDf.withColumn("__ukey", lit(0L)), KUpdate)
                  else if (ast.groupBy.forall(outDf.columns.contains))
                    (outDf.withColumn("__ukey",
                      struct(ast.groupBy.map(col): _*)), KUpdate)
                  else (outDf, KComplete)
                }
              case Some(WindowSpec(n, args, _))
                  if n.equalsIgnoreCase("timebatch") =>
                ast.rate match {
                  case Some(rW) =>
                    // rate OVER the windowed aggregation LIVE: the
                    // same fold channel as the store pattern — state
                    // = per-bucket algebraic flush partials (a bucket
                    // straddling triggers merges componentwise), and
                    // finish runs the BATCH rate selection over the
                    // finalized flushes, so live ≡ batch by
                    // construction (incl. interval boundaries)
                    if (partKey.nonEmpty)
                      fail("windowed rate limiting inside a partition " +
                        "block is not deployed (v1)")
                    if (ast.groupBy.nonEmpty)
                      fail("output rate limiting over a windowed " +
                        "aggregation (v1) is ungrouped — one flush row " +
                        "per window")
                    val itemsW = itemsOf(ast)
                    itemsW.foreach { case (it, a2, isAgg) =>
                      if (!isAgg && refsAttr(it.e))
                        fail(s"rate-limited windowed select item '$a2' " +
                          "must aggregate (or be a constant)")
                    }
                    if (!itemsW.exists(_._3))
                      fail("a rate-limited windowed query needs an " +
                        "aggregate select item")
                    requireEpochTb(s.window.get,
                      "rate limiting over a windowed aggregation")
                    val tNsW = args.head
                    val fnsSnapW = scriptFns
                    val (lfW, protoW) = flushPartialFold(base, None,
                      Nil, itemsW, tNsW, fnsSnapW,
                      ast.orderBy.map { case (c2, a2) =>
                        if (a2) col(c2).asc else col(c2).desc },
                      (_, flush) => rateOverFlushes(flush,
                        itemsW.map(_._2), tNsW / 1000000L, rW))
                    val keyW = name.orElse(ast.action.map(_.target))
                    if (keyW.contains(out) || name.contains(out))
                      foldResult = Some(lfW)
                    carriedNow = Nil
                    (emptyOf(base.sparkSession, protoW.schema), KFold)
                  case None =>
                    (windowedAgg(ast, base, "w_start_ms", args.head,
                      tbOffNs(s.window.get)),
                      KWindowAgg)
                }
              case Some(WindowSpec(n2, _, sargs2))
                  if n2.equalsIgnoreCase("unique:first") =>
                // live unique:first = streaming dropDuplicates on the
                // key (engine twin: Streaming.dedupKeys) — the first
                // event per distinct key emits as it arrives; later
                // duplicates are suppressed by keyed state
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a unique window")
                if (ast.select.exists(it => containsAgg(it.e)) ||
                    ast.groupBy.nonEmpty)
                  fail("live unique:first projects columns (v1)")
                if (sargs2.isEmpty)
                  fail("unique:first needs an attribute argument")
                sargs2.foreach(a2 => if (!base.columns.contains(a2))
                  fail(s"unique:first key '$a2' is not a column"))
                // keyed dedup state is held forever BY CONTRACT —
                // unique:first must remember every key it has seen, so
                // state is bounded by the key domain, not the watermark
                (selectOrAggregate(ast,
                  base.dropDuplicates(sargs2.head, sargs2.tail: _*),
                  Nil, windowed = false), KStateless)
              case Some(WindowSpec(n2, _, sargs2))
                  if n2.equalsIgnoreCase("expression") =>
                // live retain-while window: the batch fold's eviction
                // rule running inside flatMapGroupsWithState — on each
                // arrival evict from the FRONT until the retention
                // predicate holds, re-evaluate select items over the
                // retained buffer ([[bufEval]] again); buffer size is
                // bounded by the predicate itself
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above an expression window")
                val retTxt = sargs2.headOption.getOrElse(
                  fail("expression window needs a quoted retention " +
                    "expression"))
                val ret = new P(lex(retTxt)).expr()
                val key = ast.groupBy match {
                  case k :: Nil => k
                  case _ => fail("live expression window (v1) needs " +
                    "exactly one group by key to partition the fold")
                }
                val items = itemsOf(ast)
                val schema2 = StructType(evOutTypes(items).map {
                  case (n3, t) => StructField(n3, t) })
                implicit val enc2: org.apache.spark.sql.Encoder[
                  org.apache.spark.sql.Row] =
                  org.apache.spark.sql.Encoders.row(schema2)
                import org.apache.spark.sql.Encoders
                import org.apache.spark.sql.streaming.GroupStateTimeout
                val folded = base.select(col("event_id").as("eventId"),
                    col("ts_ns").as("tsNs"), col("user_id").as("userId"),
                    col("event_type").as("eventType"), col("value"))
                  .as[Cep.Ev](Encoders.product[Cep.Ev])
                  .groupByKey(e =>
                    String.valueOf(field(e, key)))(Encoders.STRING)
                  .flatMapGroupsWithState[Vector[Cep.Ev],
                    org.apache.spark.sql.Row](
                    OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
                    (_, it2, st) =>
                      var buf = st.getOption.getOrElse(
                        Vector.empty[Cep.Ev])
                      val out = it2.toVector
                        .sortBy(e => (e.tsNs, e.eventId)).map { e =>
                          buf = buf :+ e
                          while (buf.nonEmpty &&
                              !bufEval(ret, buf, e)
                                .asInstanceOf[Boolean])
                            buf = buf.tail
                          org.apache.spark.sql.Row.fromSeq(
                            items.map { case (it3, _, _) =>
                              bufEval(it3.e, buf, e) })
                        }
                      st.update(buf)
                      out.iterator
                  }
                (folded.toDF(), KStateless)
              case Some(WindowSpec(n2, _, sargs2))
                  if n2.equalsIgnoreCase("cron") =>
                // cron live: the epoch-aligned fixed-interval Quartz
                // forms ARE a cron-aligned timeBatch — same Append-mode
                // watermark-evicted buckets, keyed cron_tick_ms
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a cron aggregation")
                val spec = sargs2.headOption.getOrElse(
                  fail("cron needs a quoted Quartz expression argument"))
                (windowedAgg(ast, base, "cron_tick_ms",
                  cronIntervalNs(spec)), KWindowAgg)
              case Some(WindowSpec(n2, args2, _))
                  if n2.equalsIgnoreCase("delay") =>
                // delay(T) live: the same stateless re-timestamp the
                // batch compile uses — downstream stages (incl. further
                // live windows) bucket by the delayed time. The shifted
                // `ts` is a NEW attribute, so the source watermark tag
                // would be lost: re-attach the delay metadata
                // explicitly so a downstream Append aggregation still
                // sees a watermarked event-time column (the watermark
                // VALUE keeps coming from the source node — shifted
                // windows simply close `T` later, which is the point of
                // a delay).
                val tNs2 = args2.headOption.getOrElse(
                  fail("delay needs a duration argument"))
                val md = new MetadataBuilder()
                  .putLong("spark.watermarkDelayMs", 60000L).build()
                val others = base.columns
                  .filterNot(c => c == "ts" || c == "ts_ns").map(col)
                val shifted = base.select(others ++ Seq(
                  (col("ts_ns") + lit(tNs2)).as("ts_ns"),
                  expr(s"timestampadd(MICROSECOND, ${tNs2 / 1000}L, ts)")
                    .as("ts", md)): _*)
                val agg2 = ast.select.exists(it => containsAgg(it.e))
                val carry2 =
                  if (agg2) Nil
                  else {
                    val aliases = itemsOf(ast).map(_._2).toSet
                    Seq("ts", "ts_ns").filterNot(aliases.contains)
                  }
                carriedNow = carry2
                (selectOrAggregate(ast, shifted, Nil, windowed = false,
                  carry = carry2.map(col)),
                  if (agg2) KComplete else KStateless)
              case Some(WindowSpec(n2, args2, _))
                  if n2.equalsIgnoreCase("timelength") =>
                // live timeLength(T, N): per-key ring of the last N
                // events; select items evaluate over the subset still
                // within T of the current event (same inclusive bound as
                // the batch compile) — state is ≤ N events per key
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a timeLength window")
                val tNs2 = args2.head
                val nCap = args2(1).toInt
                val key = ast.groupBy match {
                  case k :: Nil => k
                  case _ => fail("live timeLength window (v1) needs " +
                    "exactly one group by key to partition the ring")
                }
                val items = itemsOf(ast)
                val schema2 = StructType(evOutTypes(items).map {
                  case (n3, t) => StructField(n3, t) })
                implicit val enc2: org.apache.spark.sql.Encoder[
                  org.apache.spark.sql.Row] =
                  org.apache.spark.sql.Encoders.row(schema2)
                import org.apache.spark.sql.Encoders
                import org.apache.spark.sql.streaming.GroupStateTimeout
                val folded = base.select(col("event_id").as("eventId"),
                    col("ts_ns").as("tsNs"), col("user_id").as("userId"),
                    col("event_type").as("eventType"), col("value"))
                  .as[Cep.Ev](Encoders.product[Cep.Ev])
                  .groupByKey(e =>
                    String.valueOf(field(e, key)))(Encoders.STRING)
                  .flatMapGroupsWithState[Vector[Cep.Ev],
                    org.apache.spark.sql.Row](
                    OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
                    (_, it2, st) =>
                      var ring = st.getOption.getOrElse(
                        Vector.empty[Cep.Ev])
                      val out = it2.toVector
                        .sortBy(e => (e.tsNs, e.eventId)).map { e =>
                          ring = (ring :+ e).takeRight(nCap)
                          val win = ring.filter(
                            _.tsNs >= e.tsNs - tNs2)
                          org.apache.spark.sql.Row.fromSeq(
                            items.map { case (it3, _, _) =>
                              bufEval(it3.e, win, e) })
                        }
                      st.update(ring)
                      out.iterator
                  }
                (folded.toDF(), KStateless)
              case Some(WindowSpec(n2, _, sargs2))
                  if n2.equalsIgnoreCase("unique:last") ||
                    n2.equalsIgnoreCase("unique:ever") =>
                // live unique:last: keep-LAST per key — the emitted-row
                // retraction (Update-mode semantics) Spark sinks can't
                // express becomes a per-micro-batch keyed fold: each
                // batch's rows merge into one state row per distinct
                // key (the unique-window contract bounds state by the
                // key domain, exactly like unique:first's dedup state).
                // unique:ever retains the latest row per key forever —
                // the identical fold. Composite keys (r17) fold on the
                // attribute struct.
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a unique window")
                if (ast.select.exists(it => containsAgg(it.e)) ||
                    ast.groupBy.nonEmpty)
                  fail(s"live $n2 projects columns (v1)")
                if (sargs2.isEmpty)
                  fail(s"$n2 needs an attribute argument")
                (sargs2 ++ Seq("ts_ns", "event_id")).foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"live $n2 needs column '$c'"))
                val items = itemsOf(ast)
                def selLast(df: DataFrame): DataFrame =
                  df.select(items.map { case (it, a, _) =>
                    expr(sqlOf(it.e)).as(a) } ++ Seq(
                    struct(sargs2.map(col): _*).as("__ukey"),
                    col("ts_ns").as("__uord_ts"),
                    col("event_id").as("__uord_id")): _*)
                val schemaU = selLast(base).schema
                val helperCols = Seq("__ukey", "__uord_ts", "__uord_id")
                val keyU = name.orElse(ast.action.map(_.target))
                val fnsSnap = scriptFns // for the micro-batch thread
                if (keyU.contains(out) || name.contains(out))
                  foldResult = Some(singleFold(base, schemaU,
                    (_, _, acc, batch) =>
                      { scriptFns = fnsSnap; acc }.unionByName(selLast(batch))
                        .withColumn("__rn", expr("row_number() over " +
                          "(partition by __ukey order by __uord_ts " +
                          "desc, __uord_id desc)"))
                        .where(col("__rn") === 1).drop("__rn"),
                    (_, acc) => acc.drop(helperCols: _*),
                    ast.orderBy.map { case (c, asc) =>
                      if (asc) col(c).asc else col(c).desc },
                    // keep-last is a per-__ukey merge: only buckets
                    // the batch's keys hash into are read and rewritten
                    KeyedState(Seq("__ukey"), (_, _, batch) =>
                      batch.select(struct(sargs2.map(col): _*)
                        .cast(schemaU("__ukey").dataType)
                        .as("__ukey")))))
                (emptyOf(base.sparkSession, schemaU), KFold)
              case Some(WindowSpec(n2, args2, sargs2))
                  if n2.equalsIgnoreCase("sort") =>
                // live sort(N, attr, dir): running top-N retention —
                // per micro-batch the kept set folds as
                // topN(kept ∪ batch); N full rows of state, composable
                // across any batch split because top-N is associative.
                // Select items (usually aggregates) evaluate over the
                // FINAL kept set, the batch compile's semantics.
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a sort window")
                val nKeep = args2.headOption.getOrElse(
                  fail("sort needs a count argument")).toInt
                Seq("ts_ns", "event_id").foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"live sort window needs column '$c'"))
                // multi-attribute comparator (r17) — the batch
                // compile's shared sortComparator, so live ≡ batch
                val ordS = sortComparator(sargs2, base.columns) ++
                  Seq(col("ts_ns").asc, col("event_id").asc)
                val astS = ast
                val keyS = name.orElse(ast.action.map(_.target))
                if (keyS.contains(out) || name.contains(out))
                  foldResult = Some(singleFold(base, base.schema,
                    (_, _, acc, batch) =>
                      acc.unionByName(
                          batch.select(acc.columns.map(col): _*))
                        .orderBy(ordS: _*).limit(nKeep),
                    (_, acc) => selectOrAggregate(astS, acc, Nil,
                      windowed = false),
                    astS.orderBy.map { case (c, a2) =>
                      if (a2) col(c).asc else col(c).desc }))
                (emptyOf(base.sparkSession, base.schema), KFold)
              case Some(WindowSpec(n2, args2, sargs2))
                  if n2.equalsIgnoreCase("frequent") =>
                // live frequent(N, attr): per-key ALGEBRAIC components
                // (count/sum/min/max fold componentwise across batches;
                // state = one component row per distinct key), with the
                // top-N-by-frequency retention applied at read time —
                // the batch compile's exact-count truth, incrementally
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a frequent window")
                if (ast.having.nonEmpty)
                  fail("live frequent window (v1) has no having clause")
                val nKeep = args2.headOption.getOrElse(
                  fail("frequent needs a count argument")).toInt
                val attr = sargs2.headOption.getOrElse(
                  fail("frequent needs an attribute argument"))
                if (ast.groupBy != List(attr))
                  fail("live frequent window (v1) groups by its " +
                    s"attribute ('group by $attr')")
                if (!base.columns.contains(attr))
                  fail(s"live frequent window needs column '$attr'")
                val items = itemsOf(ast)
                // per select item: (component aggregate, merge of the
                // two sides' components, output projection)
                val comps: Seq[(String, Column, Column)] =
                  items.zipWithIndex.flatMap {
                    case ((it, a, false), _) => it.e match {
                      case Ref(parts) if parts.last == attr => Nil
                      case _ => fail("live frequent window (v1) " +
                        s"non-aggregate item '$a' must be the attribute")
                    }
                    case ((it, a, true), i) =>
                      val cn = s"__c$i"
                      def tu(c: String) = (coalesce(col(s"t.$c"), lit(0))
                        + coalesce(col(s"u.$c"), lit(0))).as(c)
                      it.e match {
                        case Call(None, "count", Nil) =>
                          Seq((cn, count(lit(1)).as(cn), tu(cn)))
                        case Call(None, "sum", arg :: Nil) =>
                          Seq((cn, sum(expr(sqlOf(arg))).as(cn), tu(cn)))
                        case Call(None, "min", arg :: Nil) =>
                          Seq((cn, min(expr(sqlOf(arg))).as(cn),
                            least(col(s"t.$cn"), col(s"u.$cn")).as(cn)))
                        case Call(None, "max", arg :: Nil) =>
                          Seq((cn, max(expr(sqlOf(arg))).as(cn),
                            greatest(col(s"t.$cn"), col(s"u.$cn"))
                              .as(cn)))
                        case _ => fail("live frequent window (v1) " +
                          "supports bare count()/sum(x)/min(x)/max(x) " +
                          s"aggregates; got '${sqlOf(it.e)}'")
                      }
                  }
                def partialOf(df: DataFrame): DataFrame =
                  df.groupBy(col(attr)).agg(count(lit(1)).as("__cnt"),
                    comps.map(_._2): _*)
                val schemaF = partialOf(base).schema
                val keyF = name.orElse(ast.action.map(_.target))
                if (keyF.contains(out) || name.contains(out))
                  foldResult = Some(singleFold(base, schemaF,
                    (_, _, acc, batch) => {
                      val u = partialOf(batch)
                      acc.as("t").join(u.as("u"),
                          col(s"t.$attr") === col(s"u.$attr"),
                          "full_outer")
                        .select(coalesce(col(s"u.$attr"),
                            col(s"t.$attr")).as(attr) +:
                          (coalesce(col("t.__cnt"), lit(0L)) +
                            coalesce(col("u.__cnt"), lit(0L)))
                            .as("__cnt") +:
                          comps.map(_._3): _*)
                    },
                    (_, acc) => acc
                      .withColumn("__rk", expr("row_number() over " +
                        s"(order by __cnt desc, $attr)"))
                      .where(col("__rk") <= nKeep)
                      .select(items.map { case (it, a, isAgg) =>
                        if (!isAgg) col(attr).as(a)
                        else {
                          val i = items.indexWhere(_._2 == a)
                          col(s"__c$i").as(a)
                        }
                      }: _*),
                    ast.orderBy.map { case (c, a2) =>
                      if (a2) col(c).asc else col(c).desc },
                    // component rows merge per attr value: only the
                    // batch's attr buckets are read and rewritten
                    KeyedState(Seq(attr), (_, _, batch) =>
                      batch.select(col(attr)
                        .cast(schemaF(attr).dataType).as(attr)))))
                (emptyOf(base.sparkSession, schemaF), KFold)
              case Some(WindowSpec(n2, args2, _))
                  if n2.equalsIgnoreCase("length") =>
                // live per-key sliding length window: a
                // flatMapGroupsWithState ring of the last N events per
                // key, select items re-evaluated over the ring on every
                // arrival ([[bufEval]] — the same interpreter the batch
                // expression window folds with; engine twin:
                // Streaming.lengthSliding). State is N events per key,
                // forever-bounded.
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a length window")
                val nRing = args2.head.toInt
                val key = ast.groupBy match {
                  case k :: Nil => k
                  case _ => fail("live length window (v1) needs exactly " +
                    "one group by key to partition the per-key ring")
                }
                val need2 = Seq("event_id", "ts_ns", "user_id",
                  "event_type", "value")
                need2.foreach(c => if (!base.columns.contains(c))
                  fail(s"live length window reads event streams; " +
                    s"'${s.table}' lacks '$c'"))
                val items = itemsOf(ast)
                val schema2 = StructType(evOutTypes(items).map {
                  case (n3, t) => StructField(n3, t) })
                implicit val enc2: org.apache.spark.sql.Encoder[
                  org.apache.spark.sql.Row] =
                  org.apache.spark.sql.Encoders.row(schema2)
                import org.apache.spark.sql.Encoders
                import org.apache.spark.sql.streaming.GroupStateTimeout
                val folded = base.select(col("event_id").as("eventId"),
                    col("ts_ns").as("tsNs"), col("user_id").as("userId"),
                    col("event_type").as("eventType"), col("value"))
                  .as[Cep.Ev](Encoders.product[Cep.Ev])
                  .groupByKey(e =>
                    String.valueOf(field(e, key)))(Encoders.STRING)
                  .flatMapGroupsWithState[Vector[Cep.Ev],
                    org.apache.spark.sql.Row](
                    OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
                    (_, it2, st) =>
                      var ring = st.getOption.getOrElse(
                        Vector.empty[Cep.Ev])
                      val out = it2.toVector
                        .sortBy(e => (e.tsNs, e.eventId)).map { e =>
                          ring = (ring :+ e).takeRight(nRing)
                          org.apache.spark.sql.Row.fromSeq(
                            items.map { case (it3, _, _) =>
                              bufEval(it3.e, ring, e) })
                        }
                      st.update(ring)
                      out.iterator
                  }
                (folded.toDF(), KStateless)
              case Some(WindowSpec(n2, args2, _))
                  if n2.equalsIgnoreCase("session") =>
                // live session aggregation: built-in session_window in
                // APPEND mode (engine twin: Streaming.session) — a
                // session emits (merged, final) once the watermark
                // passes its close, then its state is dropped; output
                // columns mirror the batch text compile exactly
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a session aggregation")
                val items = itemsOf(ast)
                val aggCols = items.collect { case (it, a2, true) =>
                  expr(sqlOf(it.e)).as(a2) }
                if (aggCols.isEmpty) fail("session window needs an " +
                  "aggregate")
                items.collect { case (it, _, false) => it }.foreach {
                  it => it.e match {
                    case Ref(c :: Nil) if ast.groupBy.contains(c) => ()
                    case _ => fail("non-aggregate select item must be " +
                      "grouped")
                  }
                }
                val sw = session_window(col("ts"),
                  s"${args2.head / 1000000} milliseconds")
                val agged = base
                  .filter(col("ts") < Streaming.flushCutoff)
                  .groupBy(sw +: ast.groupBy.map(col): _*)
                  .agg(aggCols.head, aggCols.tail: _*)
                val hav = ast.having.fold(agged)(h =>
                  agged.where(expr(sqlOf(h))))
                (hav.select(
                  unix_millis(col("session_window.start"))
                    .as("w_start_ms") +:
                  unix_millis(col("session_window.end")).as("w_end_ms") +:
                  items.map { case (_, a2, _) => col(a2) }: _*),
                  KWindowAgg)
              case Some(w) => fail("live deployment (v1) supports " +
                "stateless stages, timeBatch/session aggregation, and " +
                s"patterns; got window '${w.name}'")
            }
          case pt: PatternStream =>
            val (b, sel, outSchema) = patternParts(ast, pt)
            // rate over pattern matches LIVE (r14): matches accumulate
            // in an append-only fold carrying their emission order
            // (closing bound event's ts, spawn tie-break), and finish
            // runs the BATCH selection (rateOverMatches) — live ≡
            // batch by construction, the same accumulate-then-rank
            // trade the r12 count-mode outer joins made (rate is a
            // globally-ordered pick, inherently total-order; the
            // accumulated state is O(matches), distributed in parquet
            // generations, never driver-resident).
            val rateP = ast.rate
            val outSchemaR =
              if (rateP.isEmpty) outSchema
              else outSchema ++ Seq(("__emit_ns", LongType),
                ("__sp_ts", LongType), ("__sp_id", LongType))
            val schema = StructType(outSchemaR.map { case (n, t) =>
              StructField(n, t) })
            implicit val enc: org.apache.spark.sql.Encoder[
              org.apache.spark.sql.Row] =
              org.apache.spark.sql.Encoders.row(schema)
            val proj = (bnd: Cep.Bindings) => {
              val base = sel.map { case (_, _, _, extract) =>
                extract(bnd) }
              org.apache.spark.sql.Row.fromSeq(
                if (rateP.isEmpty) base
                else {
                  // the batch rate arm's exact order columns
                  // (compilePattern): emit at the max-ts bound event,
                  // tie-break by the spawning (first) bound event
                  val evs = bnd.valuesIterator.flatten.toSeq
                  val sp2 = evs.minBy(e => (e.tsNs, e.eventId))
                  base ++ Seq(evs.map(_.tsNs).max, sp2.tsNs, sp2.eventId)
                })
            }
            if (b.steps.exists(_.isInstanceOf[Cep.Absent])) {
              // ABSENCE-bearing pattern (`not X for T`) deployed LIVE:
              // the timed re-fold — absence deadlines register
              // event-time timers against the source watermark, so a
              // "nothing arrived" match emits when the watermark
              // passes its deadline, not at a next event that may
              // never come (engine twins: Streaming.cepAbsence /
              // cepAbsenceTws). Reads the WATERMARKED declared view
              // (clean under @OnError); flush sentinels drop here,
              // above the source watermark node, and KWindowAgg makes
              // the finite-replay harness feed them so the last
              // deadlines resolve.
              val evT = envLookup(view, "events").getOrElse(
                fail("a live absence pattern reads the watermarked " +
                  "'events' stream"))
                .filter(col("ts") < Streaming.flushCutoff)
                .select(col("event_id").as("eventId"),
                  col("ts_ns").as("tsNs"), col("user_id").as("userId"),
                  col("event_type").as("eventType"), col("value"),
                  col("ts"))
                .as[Streaming.EvT]
              rateP match {
                case None =>
                  (b.selectStreamTimed(evT)(proj).toDF(), KWindowAgg)
                case Some(r) =>
                  // absence deadlines resolve off the watermark, so
                  // the fold needs the flush-sentinel batches
                  patternRateFold(
                    b.selectStreamTimed(evT)(proj).toDF(), r,
                    outSchema.map(_._1), schema, needsFl = true)
              }
            } else rateP match {
              case None =>
                (b.selectStream(evDs)(proj).toDF(), KStateless)
              case Some(r) =>
                patternRateFold(b.selectStream(evDs)(proj).toDF(), r,
                  outSchema.map(_._1), schema, needsFl = false)
            }
          // ENRICHMENT JOIN deployed LIVE: a query joins the table a
          // sibling DML stage maintains — the reference's canonical
          // enrichment loop (a stream updates UserState, a sibling
          // query enriches against it). Semantics are PER-EVENT: an
          // event sees the table as of its own position in the stream
          // (definition order makes an event's own update visible:
          // `<=` on the (ts_ns, event_id) arrival order), which makes
          // the live result independent of micro-batch boundaries —
          // the batch asof oracle and the live run agree for ANY
          // chunking. Runs in the foreachBatch fold channel: per
          // trigger the maintained table folds first, then the batch's
          // events fill their enrichment state from (accumulated
          // generations ∪ same-batch updates at-or-before them) in ONE
          // keyed window pass — a single shuffle on the table key,
          // exactly the partitioning a 100× scale-up wants (state and
          // events co-partition; no per-event lookups, no broadcast of
          // unbounded state).
          case jx: JoinStream
              if dmlInfos.contains(jx.left.table) ||
                 dmlInfos.contains(jx.right.table) =>
            if (partKey.nonEmpty)
              fail("enrichment joins inside a partition block are not " +
                "deployed (v1)")
            // an INNER enrichment join is symmetric: a table on the
            // LEFT auto-swaps (Siddhi accepts either side); outer
            // directions keep the stream-left convention
            val j =
              if (dmlInfos.contains(jx.left.table) &&
                  !dmlInfos.contains(jx.right.table) &&
                  jx.joinType == "inner")
                jx.copy(left = jx.right, leftAlias = jx.rightAlias,
                  right = jx.left, rightAlias = jx.leftAlias)
              else jx
            if (dmlInfos.contains(j.left.table))
              fail("an OUTER enrichment join puts the maintained " +
                "table on the RIGHT side (v1) — swap the join sides " +
                "(inner joins swap automatically)")
            if (j.unidirectional)
              fail("live enrichment joins are already one-directional " +
                "(events trigger, the table holds state) — drop " +
                "`unidirectional`")
            val tSide = j.right; val sSide = j.left
            val tName = tSide.table
            if (tSide.window.nonEmpty)
              fail("live enrichment joins read the whole maintained " +
                s"table '$tName' (v1) — no window on the table side")
            if (sSide.window.nonEmpty)
              fail("live enrichment joins are per-event lookups (v1) — " +
                "no window on the stream side")
            val writers = dmlInfos(tName)
            val (dAst, dAct, dSchema, dSrc) = writers.head
            val sName = sSide.table
            if (statefulStreams.contains(sName))
              fail(s"live deployment (v1): '$sName' is an aggregation " +
                "output — it cannot feed an enrichment join")
            val derivable = Set("events") ++ statelessAsts.map(_._1)
            (sName +: writers.map(_._4)).foreach { n2 =>
              if (!derivable.contains(n2))
                fail(s"live enrichment joins derive their feeds from " +
                  s"the source through stateless stages; '$n2' is not " +
                  "(windowed/rate-limited/joined stages cannot be " +
                  "re-derived per batch)")
            }
            val statelessSnap = statelessAsts
            val sp0 = src.sparkSession
            val hasAggE = ast.select.exists(it => containsAgg(it.e)) ||
              ast.groupBy.nonEmpty
            // table maintenance for the fold channel: single-writer =
            // the plain keyed DML merge; multi-writer = the interleaved
            // emission-order merge (applyDmlMulti), batch-key probes =
            // the union of every writer's key projection
            def tApply(sp: SparkSession, d2: String, accT: DataFrame,
                benv: Map[String, DataFrame]): DataFrame =
              if (writers.length == 1)
                applyDml(sp, d2, dAst, dAct, dSchema, accT, benv)
              else applyDmlMulti(sp, d2, writers, dSchema, accT, benv)
            def tModeOf(fnsSnap2: Map[String, ScriptFn]): StateMode = {
              val m0 =
                if (writers.length == 1)
                  dmlStateMode(dAst, dAct, dSchema, dSrc, fnsSnap2,
                    (sp, d2, batch) =>
                      batchEnv(sp, d2, batch, statelessSnap))
                else dmlStateModeMulti(writers, tName, dSchema, fnsSnap2,
                  (sp, d2, batch) =>
                    batchEnv(sp, d2, batch, statelessSnap))
              // insert-only log tables read by THIS enrichment join
              // get a KEYED store on the join key columns (instead of
              // AppendState), so the per-trigger read bucket-restricts
              // to the batch's event keys — otherwise the table's
              // per-trigger scan grows with deployment lifetime
              m0 match {
                case AppendState
                    if dAct.isInstanceOf[InsertInto] =>
                  dmlStateModeMulti(writers, tName, dSchema, fnsSnap2,
                    (sp, d2, batch) =>
                      batchEnv(sp, d2, batch, statelessSnap),
                    fallbackKeys = {
                      val sAliasM = j.leftAlias.getOrElse(sName)
                      keyEqsOf(j.on, tName, {
                        case q :: c :: Nil
                            if q.equalsIgnoreCase(sAliasM) ||
                              q.equalsIgnoreCase(sName) => c
                        case parts => parts.mkString(".")
                      }).map(_._1).distinct
                    })
                case m => m
              }
            }
            // r13 (VERDICT r12 #1): only keys present in THIS batch's
            // events can produce join output this trigger — every
            // other accumulated row enters the as-of window pass and
            // is filtered at `__isE` without touching any event. So
            // the per-trigger table read PRUNES to the batch's event
            // join-key domain: bucket-restricted at the file level
            // (the keyed store hashes on the DML keys, which the
            // deploy-time prototype asserts equal the join keys) and
            // null-safe-semi-joined at the row level (the window pass
            // partitions null keys together, so === would drop a
            // null-keyed event's state). Acute for event-log tables,
            // whose live row count grows with deployment lifetime:
            // the un-pruned read is O(all live rows); this is O(rows
            // of batch-touched keys). Lazy: the join-key extraction
            // must not run before the prototype's own diagnostics.
            lazy val enrichJoinKeys: List[(String, String)] = {
              val sAliasK = j.leftAlias.getOrElse(sName)
              keyEqsOf(j.on, tName, {
                case q :: c :: Nil if q.equalsIgnoreCase(sAliasK) ||
                    q.equalsIgnoreCase(sName) => c
                case parts => parts.mkString(".")
              })
            }
            var enrichReadGen = 0
            def batchKeyRel(sp: SparkSession, d2: String,
                batch: DataFrame,
                benv: Map[String, DataFrame]): DataFrame = {
              val keyCols = enrichJoinKeys.map(_._1).distinct
              val sb0 = envLookup(benv, sName).getOrElse(batch)
              val sb = sSide.filter.fold(sb0)(f =>
                applyFilter(sp, d2, sb0, f, benv))
              sb.select(keyCols.map { kc =>
                expr(enrichJoinKeys.find(_._1 == kc).get._2)
                  .cast(dSchema(kc).dataType).as(kc) }: _*).distinct()
            }
            // null-safe key-domain prune of any table-side relation
            // (the accumulated table or a flush relation): only rows
            // of batch-event keys can produce join output this
            // trigger. Falls through when the relation doesn't carry
            // the key columns (defensive; the prototype asserts it).
            def pruneToBatchKeys(rel: DataFrame, kdf: DataFrame)
                : DataFrame = {
              val keyCols = enrichJoinKeys.map(_._1).distinct
              if (!keyCols.forall(rel.columns.contains)) {
                // defensive fallback — RECORD it so an unexpected
                // unpruned read shows in the read-prune gate instead
                // of silently regressing the O(batch) guarantee
                foldReadProbe.foreach { buf =>
                  enrichReadGen += 1
                  buf += ((enrichReadGen,
                    s"__prune_fallback:$tName", -1L))
                }
                rel
              } else {
                val pruned = rel.as("t").join(kdf.as("k"),
                  keyCols.map(c => col(s"t.$c")
                      .cast(dSchema(c).dataType) <=> col(s"k.$c"))
                    .reduce(_ && _), "left_semi")
                  .select(rel.columns.toSeq.map(c => col(s"t.$c")): _*)
                foldReadProbe.foreach { buf =>
                  enrichReadGen += 1
                  buf += ((enrichReadGen, tName, pruned.count()))
                }
                pruned
              }
            }
            // null-safe row-level prune of an __mk*-keyed state read
            // against the key relation keyedRead handed back (a
            // LocalRelation for small batches) — shared by every
            // channel that keys a store on its join-key projections
            def pruneMkG(rel: DataFrame, kdf2: DataFrame,
                mkCols2: Seq[String]): DataFrame =
              rel.as("t").join(kdf2.as("k"),
                  mkCols2.map(c2 =>
                    col(s"t.$c2") <=> col(s"k.$c2"))
                    .reduce(_ && _), "left_semi")
                .select(rel.columns.toSeq
                  .map(c2 => col(s"t.$c2")): _*)
            def tReadPruned(sp: SparkSession, d2: String,
                acc: Map[String, LiveState], batch: DataFrame,
                benv: Map[String, DataFrame]): DataFrame = {
              // keyedRead hands back the key relation to prune with —
              // a collected LocalRelation when the batch's key set is
              // small, so the whole per-trigger read costs ONE probe
              // job and the semi-join re-evaluates nothing
              val (rel, kdfEff) = acc(tName)
                .keyedRead(batchKeyRel(sp, d2, batch, benv))
              pruneToBatchKeys(rel, kdfEff)
            }
            /** The shared "aggregation ABOVE the enrichment join"
              * tail (r16 — one definition for the per-event, windowed
              * and windowed event-log read channels, deleting two
              * near-identical inline copies): validates the v1
              * contract (group keys = the aliases of the
              * non-aggregate select items, stream-side), rewrites the
              * read to its per-pair PROJECTION form (`astRows` — the
              * branch runs it per trigger with whatever override
              * mechanism it maintains), and folds the per-trigger
              * enriched rows as FoldAlg algebraic partials keyed on
              * the group aliases. having/limit/offset compose ONCE at
              * finish over the finalized groups — chunking-invariant
              * by construction, because every stream event (and so
              * every per-pair row) lands in exactly one trigger. */
            final class EnrichAggTail {
              private val items = itemsOf(ast)
              private val keyItems = items.filter(!_._3)
              private val keyAliases = keyItems.map(_._2)
              if (ast.groupBy.sorted != keyAliases.sorted.toList)
                fail("live enrichment aggregation (v1) groups by " +
                  "exactly the aliases of its non-aggregate select " +
                  s"items (non-aggregate [${keyAliases.mkString(", ")}" +
                  s"], group by [${ast.groupBy.mkString(", ")}])")
              private val comps = scala.collection.mutable.Buffer
                .empty[(String, String, Option[Expr])]
              private def rw(e: Expr): Expr = e match {
                case Call(None, n, args0) if aggNames(n.toLowerCase) =>
                  val base = s"__g${comps.length}"
                  comps += ((base, n.toLowerCase, args0.headOption))
                  FoldAlg.rewrite(n.toLowerCase, base)
                case Call(ns2, n, as2) => Call(ns2, n, as2.map(rw))
                case Bin(op, l2, r2) => Bin(op, rw(l2), rw(r2))
                case Not(x) => Not(rw(x))
                case Neg(x) => Neg(rw(x))
                case other2 => other2
              }
              private val finals: Seq[(String, Expr)] = items.map {
                case (it, a2, isAgg) =>
                  a2 -> (if (isAgg) rw(it.e) else Ref(List(a2)))
              }
              comps.foreach { case (_, n, argO) =>
                if (n != "count" && argO.isEmpty)
                  fail(s"$n(...) needs an argument")
              }
              if (comps.isEmpty)
                fail("live enrichment aggregation selects at least " +
                  "one aggregate")
              // group keys are STREAM-side expressions (v1): the
              // touched-bucket probe evaluates them on the raw batch,
              // before any state is read
              keyItems.foreach { case (it, _, _) =>
                if (refsTable(it.e, tName) ||
                    j.rightAlias.exists(refsTable(it.e, _)))
                  fail("live enrichment aggregation group keys are " +
                    "STREAM-side expressions (v1) — a table-side " +
                    "key needs the projection form + a downstream " +
                    "stage")
              }
              private val sAliasA = j.leftAlias.getOrElse(sName)
              private def streamKeySql(e: Expr): String = sqlOfWith(e, {
                case q2 :: c :: Nil if q2.equalsIgnoreCase(sAliasA) ||
                    q2.equalsIgnoreCase(sName) => c
                case c :: Nil => c
                case parts => fail("live enrichment aggregation " +
                  "group keys are stream-side (v1); got " +
                  s"'${parts.mkString(".")}'")
              })
              private val keySqls = keyItems.map { case (it, a2, _) =>
                (streamKeySql(it.e), a2) }
              // per-event rows: group-key exprs + aggregate arguments
              private val rowsSel = keyItems.map { case (it, a2, _) =>
                SelItem(it.e, Some(a2)) } ++
                comps.toList.flatMap { case (base, _, argO) =>
                  argO.map(a0 =>
                    SelItem(a0, Some(s"${base}_x"))).toList }
              val astRows: Ast = ast.copy(select = rowsSel,
                groupBy = Nil, having = None, orderBy = Nil,
                limit = None, offset = None)
              private val keys = if (keyAliases.isEmpty) Seq("__k")
                                 else keyAliases
              private def withK(df: DataFrame): DataFrame =
                if (keyAliases.isEmpty) df.withColumn("__k", lit(0L))
                else df
              private def partialOf(df: DataFrame): DataFrame = {
                val aggs: Seq[Column] = comps.toSeq.flatMap {
                  case (base, n, argO) =>
                    FoldAlg.partialCols(n, base,
                      argO.map(_ => col(s"${base}_x")))
                }
                df.groupBy(keys.map(col): _*)
                  .agg(aggs.head, aggs.tail: _*)
              }
              // deploy-time prototypes: fail fast + schemas (routes
              // astRows through the branch-shared batch validations)
              private val protoRows = enrichCompile(sp0, "", astRows,
                j, writers, emptyOf(sp0, dSchema),
                batchEnv(sp0, "", emptyOf(sp0, srcTs.schema),
                  statelessSnap))
              private val schemaA = partialOf(withK(protoRows)).schema
              val protoOut: DataFrame = emptyOf(sp0, schemaA)
                .select(finals.map { case (a2, e2) =>
                  expr(sqlOf(e2)).as(a2) }: _*)
              /** The keyed partial state this tail folds into. */
              def stateEntry(stName: String,
                  fnsSnap: Map[String, ScriptFn])
                  : (String, StructType, StateMode) =
                (stName, schemaA, KeyedState(keys, (sp, d2, batch) => {
                  scriptFns = fnsSnap
                  if (keyAliases.isEmpty)
                    batch.select(lit(0L).as("__k"))
                  else {
                    val benv = batchEnv(sp, d2, batch, statelessSnap)
                    val sb0 = envLookup(benv, sName).getOrElse(batch)
                    val sb = sSide.filter.fold(sb0)(f =>
                      applyFilter(sp, d2, sb0, f, benv))
                    sb.select(keySqls.map { case (sq, a2) =>
                      expr(sq).as(a2) }: _*)
                  }
                }))
              /** Merge this trigger's enriched per-pair rows into the
                * accumulated keyed partials (componentwise FoldAlg). */
              def mergeInto(slice: DataFrame, enriched: DataFrame)
                  : DataFrame = {
                val u = partialOf(withK(enriched))
                slice.as("t").join(u.as("u"),
                    keys.map(k2 =>
                      col(s"t.$k2") <=> col(s"u.$k2"))
                      .reduce(_ && _), "full_outer")
                  .select(keys.map(k2 => coalesce(col(s"u.$k2"),
                      col(s"t.$k2")).as(k2)) ++
                    comps.toSeq.flatMap { case (b2, n, _) =>
                      FoldAlg.mergeCols(n, b2) }: _*)
              }
              /** Finalize + having (limit/offset ride the LiveFold). */
              def finish(acc: DataFrame): DataFrame = {
                val fin = acc.select(finals.map { case (a2, e2) =>
                  expr(sqlOf(e2)).as(a2) }: _*)
                ast.having.fold(fin)(h => fin.where(expr(sqlOf(h))))
              }
            }
            // built on demand: the constructor VALIDATES, so only
            // hasAggE arms may touch it
            lazy val aggTail = new EnrichAggTail
            val winWriterTNs: Option[Long] = dAst.stream match {
              case ss2: SingleStream =>
                if (ss2.window.nonEmpty && ss2.window.get.args.isEmpty)
                  fail(s"windowed DML writer on '$tName' has a " +
                    "window with no duration")
                ss2.window.foreach(
                  requireEpochTb(_, "enrichment-read writer windows"))
                ss2.window.map(_.args.head)
              case _ => None
            }
            val winTNsPer: List[Option[Long]] = writers.map {
              case (wAst2, _, _, _) => wAst2.stream match {
                case ss2: SingleStream => ss2.window match {
                  case Some(w2 @ WindowSpec(n2, t2 :: _, _))
                      if n2.equalsIgnoreCase("timebatch") =>
                    requireEpochTb(w2,
                      "enrichment-read writer windows")
                    Some(t2)
                  case Some(w2) => fail("windowed-writer enrichment " +
                    s"reads a timeBatch writer (v1); '#window." +
                    s"${w2.name}' flush emissions have no per-event " +
                    "visibility instant")
                  case None => None
                }
                case _ => None
              }
            }
            val hasInsL = writers.exists(_._2.isInstanceOf[InsertInto])
            if (hasInsL && winTNsPer.exists(_.nonEmpty)) {
              // LIVE per-event reads of EVENT-LOG tables with
              // WINDOWED members (r15, deleting the last live/batch
              // asymmetry of the composition matrix): each windowed
              // (timeBatch) writer holds cross-trigger flush PARTIALS
              // — flushOf(fullPost) is the complete per-bucket
              // emission relation at TRUE ords (a bucket whose end ≤
              // an event's ts is complete by in-order arrival, and
              // open buckets sort after every current event) — and
              // each per-event writer holds its tagged EMISSION LOG
              // (dmlEmissions rows + ord). BOTH kinds of state are
              // keyed on the JOIN keys (r16 for the flush partials),
              // so every per-trigger read bucket-prunes to the
              // batch's event keys — O(batch-key history), never the
              // whole accumulated log/partial store. Per
              // trigger, enrichCompile's event-log construction runs
              // over (pruned prior logs ∪ this batch's emissions) and
              // the flush relations — everything at true ords, so the
              // per-trigger pass IS the batch construction restricted
              // to the batch's keys: chunking-invariant by
              // construction, live ≡ batch by shared code.
              // aggregation (r16, VERDICT r15 #2): the shared
              // EnrichAggTail folds the same per-pair relation the
              // projection arm emits — each read event lands in
              // exactly one trigger with its COMPLETE pair set (the
              // emission relations carry all prior history for its
              // keys), so per-trigger partials sum to the batch
              // aggregation under any chunking
              val fnsSnapL = scriptFns
              val protoEnvL = batchEnv(sp0, "",
                emptyOf(sp0, srcTs.schema), statelessSnap)
              // deploy-time prototype WITHOUT overrides — routes
              // through enrichLogCompile's own validations (windowed
              // forms, key checks, shape routing); the agg arm routes
              // them through aggTail's projection-form prototype
              // instead (enrichCompile is projection-only by design)
              val protoL =
                if (hasAggE) aggTail.protoOut
                else enrichCompile(sp0, "", ast, j, writers,
                  emptyOf(sp0, dSchema), protoEnvL)
              val keyOrderL = enrichJoinKeys.map(_._1).distinct.sorted
              val mkColsL = keyOrderL.indices.map(j2 => s"__mk$j2")
              def keyRhsOf(wi: Int): List[(String, String)] =
                writers(wi)._2 match {
                  case UpsertTable(_, _, on2) => keyEqsOf(on2, tName)
                  case DeleteTable(_, on2) => keyEqsOf(on2, tName)
                  // an insert row's key values are its own outputs
                  case _ => keyOrderL.map(kc => kc -> kc).toList
                }
              def withMkL(rel: DataFrame, wi: Int): DataFrame = {
                val rhs = keyRhsOf(wi)
                rel.select(keyOrderL.zipWithIndex.map {
                  case (kc, j2) =>
                    expr(rhs.find(_._1 == kc).get._2)
                      .cast(dSchema(kc).dataType).as(s"__mk$j2") } ++
                  rel.columns.toSeq.map(col): _*)
              }
              def pruneMkL(rel: DataFrame, kdf2: DataFrame)
                  : DataFrame =
                rel.as("t").join(kdf2.as("k"),
                    mkColsL.map(c2 =>
                      col(s"t.$c2") <=> col(s"k.$c2"))
                      .reduce(_ && _), "left_semi")
                  .select(rel.columns.toSeq
                    .map(c2 => col(s"t.$c2")): _*)
              // a per-event writer's tagged emission delta: its
              // dmlEmissions rows + the 3-field replay ord
              def logDelta(sp: SparkSession, d2: String, wi: Int,
                  benv: Map[String, DataFrame]): DataFrame =
                dmlEmissions(sp, d2, writers(wi)._1, writers(wi)._2,
                  dSchema, benv)._1
                  .withColumn("__ord", struct(col("__g_ord.ts_ns"),
                    col("__g_ord.event_id"), lit(wi.toLong).as("w")))
                  .drop("__g_ord")
              val infosL: List[Either[FlushPieces, StructType]] =
                writers.zipWithIndex.map {
                  case ((wAst2, wAct2, _, wSrc2), wi) =>
                    winTNsPer(wi) match {
                      case Some(t2)
                          if !wAct2.isInstanceOf[DeleteTable] =>
                        val ss2 =
                          wAst2.stream.asInstanceOf[SingleStream]
                        Left(flushPiecesOf(
                          loadTable(sp0, "", wSrc2, protoEnvL),
                          ss2.filter, wAst2.groupBy, itemsOf(wAst2),
                          t2))
                      case _ =>
                        Right(withMkL(
                          logDelta(sp0, "", wi, protoEnvL), wi).schema)
                    }
                }
              // (r16, VERDICT r15 #1) key each windowed member's
              // flush-partial store on the JOIN-key projections
              // (__mk*) — the elog discipline applied to the wst
              // states — so the per-trigger read can bucket-restrict
              // to the batch's keys via keyedRead instead of the r15
              // full() scan (that state grows one row per (key,
              // bucket) FOREVER under log semantics, so the unpruned
              // scan was O(history) per trigger). The table key
              // columns must be NON-AGGREGATE outputs of the windowed
              // writer: an aggregate-valued key changes as partials
              // merge, which would move state rows across buckets.
              // Non-agg key item exprs evaluate over BOTH the partial
              // state rows (group columns survive partialOf) and the
              // writer's raw source rows (the touched-bucket probe).
              // (r17, VERDICT r16 #3 / ADVICE) an AGGREGATE-valued or
              // non-output key no longer REFUSES: that member keeps
              // the r15 full() read on a (bucket, group)-keyed store —
              // correct (merge stability never mattered for the
              // unkeyed store), just key-unpruned — restoring the
              // apps the r16 fail-fast had narrowed out.
              val winKeyExprsL: Map[Int, List[(String, Expr)]] =
                writers.indices.flatMap { wi =>
                  infosL(wi).left.toOption.flatMap { _ =>
                    val items2 = itemsOf(writers(wi)._1)
                    val picked = keyOrderL.map { kc =>
                      items2.find(_._2 == kc) match {
                        case Some((it2, _, false)) => Some(kc -> it2.e)
                        case _ => None
                      }
                    }
                    if (picked.exists(_.isEmpty)) None
                    else Some(wi -> picked.flatten)
                  }
                }.toMap
              def mkOfW(wi: Int, rel: DataFrame): DataFrame =
                rel.select(keyOrderL.zipWithIndex.map {
                  case (kc, j2) =>
                    expr(sqlOf(winKeyExprsL(wi)
                        .find(_._1 == kc).get._2))
                      .cast(dSchema(kc).dataType).as(s"__mk$j2") } ++
                  rel.columns.toSeq.map(col): _*)
              val keyL = name.orElse(ast.action.map(_.target))
              if (keyL.contains(out) || name.contains(out)) {
                val statesL: Seq[(String, StructType, StateMode)] =
                  writers.indices.map { wi =>
                    infosL(wi) match {
                      case Left(p) if winKeyExprsL.contains(wi) =>
                        (s"wst$wi",
                          mkOfW(wi, emptyOf(sp0, p.stateSchema)).schema,
                          KeyedState(mkColsL, (sp, d2, batch) => {
                            scriptFns = fnsSnapL
                            val benv =
                              batchEnv(sp, d2, batch, statelessSnap)
                            val base0 =
                              loadTable(sp, d2, writers(wi)._4, benv)
                            val base = (writers(wi)._1.stream match {
                              case ss3: SingleStream => ss3.filter
                              case _                 => None
                            }).fold(base0)(f =>
                              applyFilter(sp, d2, base0, f, benv))
                            // key exprs are non-agg writer outputs —
                            // they evaluate over raw source rows, so
                            // the probe needs no partial aggregation
                            mkOfW(wi, base)
                              .select(mkColsL.map(col): _*)
                          }))
                      case Left(p) =>
                        // aggregate-keyed member fallback (r17): the
                        // (bucket, group)-keyed store with the r15
                        // full() read
                        (s"wst$wi", p.stateSchema,
                          KeyedState(p.keys, (sp, d2, batch) => {
                            scriptFns = fnsSnapL
                            p.probeSel(loadTable(sp, d2,
                              writers(wi)._4,
                              batchEnv(sp, d2, batch, statelessSnap)))
                          }))
                      case Right(sch) => (s"elog$wi", sch,
                        KeyedState(mkColsL, (sp, d2, batch) => {
                          scriptFns = fnsSnapL
                          withMkL(logDelta(sp, d2, wi,
                            batchEnv(sp, d2, batch, statelessSnap)),
                            wi).select(mkColsL.map(col): _*)
                        }))
                    }
                  } :+ (if (hasAggE)
                          aggTail.stateEntry("aggst", fnsSnapL)
                        else ("__out", protoL.schema, AppendState))
                // one trigger's state advance: merge every writer's
                // state and assemble the per-writer emission
                // relations (both arms share it verbatim)
                def stepL(sp: SparkSession, d2: String,
                    acc: Map[String, LiveState], batch: DataFrame,
                    benv: Map[String, DataFrame])
                    : (Map[String, DataFrame], Map[Int, DataFrame]) = {
                    val kdf = batchKeyRel(sp, d2, batch, benv)
                    val kdfMk = kdf.select(keyOrderL.zipWithIndex
                      .map { case (kc, j2) =>
                        col(kc).as(s"__mk$j2") }: _*)
                    var emisM = Map.empty[Int, DataFrame]
                    val stUpd = writers.indices.map { wi =>
                      infosL(wi) match {
                        case Left(p) =>
                          val keyedWi = winKeyExprsL.contains(wi)
                          val st1 = p.merge(
                            if (keyedWi)
                              acc(s"wst$wi").slice.drop(mkColsL: _*)
                            else acc(s"wst$wi").slice,
                            p.partialOf(loadTable(sp, d2,
                              writers(wi)._4, benv)))
                          // bucket-restricted read of the batch's
                          // keys (r16): only batch-event keys can
                          // emit this trigger, and the store is keyed
                          // on the same __mk* projection — so the
                          // read scans O(batch-key buckets), not the
                          // whole ever-growing partial history.
                          // Aggregate-keyed members (r17 fallback)
                          // keep the full() read.
                          val full0 =
                            if (keyedWi) {
                              val (priorW, kdfWEff) =
                                acc(s"wst$wi").keyedRead(kdfMk)
                              val r = pruneMkL(priorW, kdfWEff)
                                .drop(mkColsL: _*)
                              foldReadProbe.foreach { buf =>
                                enrichReadGen += 1
                                buf += ((enrichReadGen, s"wst$wi",
                                  r.count()))
                              }
                              r
                            } else acc(s"wst$wi").full()
                          val fullPost = full0.as("t")
                            .join(st1.select(p.keys.map(col): _*)
                                .distinct().as("u"),
                              p.keys.map(k2 =>
                                col(s"t.$k2") <=> col(s"u.$k2"))
                                .reduce(_ && _), "left_anti")
                            .select(full0.columns.toSeq
                              .map(c2 => col(s"t.$c2")): _*)
                            .unionByName(st1)
                          emisM += wi ->
                            pruneToBatchKeys(p.flushOf(fullPost), kdf)
                              .withColumn("__ord", struct(
                                ((col("__wb") + lit(1L)) * lit(p.tNs))
                                  .cast("long").as("ts_ns"),
                                lit(0L).as("event_id"),
                                lit(wi.toLong).as("w")))
                              .drop("__wb")
                          s"wst$wi" ->
                            (if (keyedWi) mkOfW(wi, st1) else st1)
                        case Right(_) =>
                          val delta = logDelta(sp, d2, wi, benv)
                          val (priorRel, kdfEff) =
                            acc(s"elog$wi").keyedRead(kdfMk)
                          emisM += wi ->
                            pruneMkL(priorRel, kdfEff)
                              .drop(mkColsL: _*).unionByName(delta)
                          s"elog$wi" -> acc(s"elog$wi").slice
                            .unionByName(withMkL(delta, wi))
                      }
                    }.toMap
                    (stUpd, emisM)
                }
                foldResult = Some(LiveFold(srcTs, statesL,
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnapL
                    val benv = batchEnv(sp, d2, batch, statelessSnap)
                    val (stUpd, emisM) =
                      stepL(sp, d2, acc, batch, benv)
                    if (hasAggE)
                      stUpd + ("aggst" -> aggTail.mergeInto(
                        acc("aggst").slice,
                        enrichCompile(sp, d2, aggTail.astRows, j,
                          writers, emptyOf(sp, dSchema), benv,
                          emisOverride = emisM)))
                    else
                      stUpd + ("__out" -> enrichCompile(sp, d2, ast,
                        j, writers, emptyOf(sp, dSchema), benv,
                        emisOverride = emisM))
                  },
                  (_, acc) =>
                    if (hasAggE) aggTail.finish(acc("aggst"))
                    else acc("__out"),
                  ast.orderBy.map { case (c2, asc) =>
                    if (asc) col(c2).asc else col(c2).desc },
                  if (hasAggE) ast.limit else None,
                  if (hasAggE) ast.offset else None))
              }
              (emptyOf(sp0, protoL.schema), KFold)
            } else if (writers.length > 1 &&
                winTNsPer.exists(_.nonEmpty)) {
              // MIXED windowed + per-event writer group read LIVE
              // through the as-of join (r14, deleting the last
              // read-during-replay bound for the implicit-set case):
              // the key insight is that with in-order replay every
              // PRIOR trigger's update is admissible to every current
              // event, and among one last-wins writer's updates for a
              // key only the LATEST can ever win a future as-of pick —
              // so each per-event writer's cross-trigger history
              // collapses to a latest-row-per-key state CARRYING ITS
              // TRUE `__ord` (O(key domain), no log growth), each
              // windowed writer keeps its flush partials, and per
              // trigger enrichCompile runs the one keyed window pass
              // with (prior latest rows ∪ this batch's rows) as each
              // per-event writer's update relation (uRelOverride) and
              // each windowed writer's post-merge flush relation
              // (winFlush) — true ords everywhere, so flushes
              // interleave between per-event updates exactly as the
              // batch replay orders them. v1 scope: implicit-set
              // upsert writers (accumulator folds need frozen-delta
              // sums, sweepers need tombstone segments — both named
              // below); aggregation via a downstream stage.
              val groupKinds = writers.map { case (_, wAct2, _, _) =>
                wAct2 match {
                  case UpsertTable(_, set2, _) if set2.isEmpty =>
                    "upsert"
                  case UpsertTable(_, set2, _) if set2.forall {
                    case (c2, e2) => foldSetOf(tName, c2, e2).nonEmpty
                  } => "fold"
                  case _: DeleteTable => "delete"
                  case _ => "other"
                }
              }.distinct.sorted
              // composable mixed-read shapes: all-implicit-set,
              // all-fold, implicit ± tombstone sweepers (a prior
              // tombstone history collapses to the LAST tombstone per
              // key — the only mark that can still decide a future
              // as-of pick), and — r15 — implicit + fold SHAPE mixes
              // (an implicit upsert is a segment RESET; the fold
              // writers' two-row collapse re-scopes past the latest
              // PAST reset at every merge — see the pass-2 scoping
              // below). Fold + sweepers stays refused: sweeps SEGMENT
              // the running sums, so the two-row collapse would need
              // per-segment recomputation on every tombstone arrival.
              if (groupKinds != List("upsert") &&
                  groupKinds != List("fold") &&
                  groupKinds != List("delete", "upsert") &&
                  groupKinds != List("fold", "upsert"))
                fail("live enrichment reads of a MIXED windowed + " +
                  s"per-event writer group on '$tName' (v1) take " +
                  "implicit-set and/or accumulator-fold `update or " +
                  "insert` writers, implicit ± tombstone sweepers — " +
                  "general expr-set shapes and fold + sweeper " +
                  "mixes (sweeps segment the running sums) keep the " +
                  "recorded bound: keep those writers on their own " +
                  "table, or read the mixed table at end of replay " +
                  s"(`from $tName select ...`)")
              val isFoldGroup = groupKinds == List("fold")
              val isShapeMix = groupKinds == List("fold", "upsert")
              // per-writer shape (parallel to `writers`): "upsert"
              // (implicit reset), "fold", or "delete"
              val wKinds: List[String] = writers.map {
                case (_, wAct2, _, _) => wAct2 match {
                  case UpsertTable(_, set2, _) if set2.isEmpty =>
                    "upsert"
                  case _: UpsertTable => "fold"
                  case _ => "delete"
                }
              }
              if (hasAggE)
                fail("live enrichment aggregation over a MIXED " +
                  "windowed + per-event writer group (v1): use the " +
                  "projection form and aggregate in a downstream stage")
              val fnsSnapM = scriptFns
              val protoEnvM = batchEnv(sp0, "",
                emptyOf(sp0, srcTs.schema), statelessSnap)
              val keysPer: List[List[(String, String)]] =
                writers.map { case (_, wAct2, _, _) => wAct2 match {
                  case UpsertTable(_, _, on2) => keyEqsOf(on2, tName)
                  case DeleteTable(_, on2)    => keyEqsOf(on2, tName)
                  case _ => Nil
                } }
              val keyOrderM = keysPer.head.map(_._1).distinct.sorted
              val nK = keyOrderM.length
              val mkCols = (0 until nK).map(j2 => s"__mk$j2")
              def withMk(rel: DataFrame, wi: Int): DataFrame =
                rel.select(keyOrderM.zipWithIndex.map { case (kc, j2) =>
                  expr(keysPer(wi).find(_._1 == kc).get._2)
                    .cast(dSchema(kc).dataType).as(s"__mk$j2") } ++
                  rel.columns.toSeq.map(col): _*)
              // fold groups (r14): every state/batch row carries a
              // PRE-EVALUATED `__fd` delta struct (uTagUpd consumes it
              // by name), because the collapsed sum rows below have no
              // per-row delta expression — their delta IS the sum
              val foldSpecsPerM: List[List[(String, (String, Expr))]] =
                writers.map { case (_, wAct2, _, _) => wAct2 match {
                  case UpsertTable(_, set2, _) => set2.flatMap {
                    case (c2, e2) => foldSetOf(tName, c2, e2)
                      .map(f2 => c2 -> f2) }
                  case _ => Nil
                } }
              val foldColsM: List[String] =
                if (isFoldGroup || isShapeMix)
                  foldSpecsPerM.find(_.nonEmpty)
                    .getOrElse(Nil).map(_._1)
                else Nil
              def fdEval(rel: DataFrame, wi: Int): DataFrame =
                if (!(isFoldGroup ||
                    (isShapeMix && wKinds(wi) == "fold"))) rel
                else {
                  val outC = rel.columns.toSet
                  def dSql(e2: Expr): String = sqlOfWith(e2, {
                    case c2 :: Nil if outC.contains(c2) => c2
                    case parts => fail(s"fold delta reference " +
                      s"'${parts.mkString(".")}' is not a DML select " +
                      "output attribute")
                  })
                  rel.withColumn("__fd", struct(foldColsM.map { c2 =>
                    expr(dSql(foldSpecsPerM(wi)
                      .find(_._1 == c2).get._2._2))
                      .cast(dSchema(c2).dataType).as(c2) }: _*))
                }
              // per writer: Left(flush pieces) / Right(per-event-state
              // schema) — both derived over empty prototypes at deploy
              val infosM: List[Either[FlushPieces, StructType]] =
                writers.zipWithIndex.map {
                  case ((wAst2, wAct2, _, wSrc2), wi) =>
                    winTNsPer(wi) match {
                      // a windowed DELETE never gets flush pieces —
                      // the deploy-time enrichCompile prototype below
                      // refuses it by name (uTagDel's window check)
                      case Some(t2)
                          if !wAct2.isInstanceOf[DeleteTable] =>
                        val ss2 = wAst2.stream.asInstanceOf[SingleStream]
                        Left(flushPiecesOf(
                          loadTable(sp0, "", wSrc2, protoEnvM),
                          ss2.filter, wAst2.groupBy, itemsOf(wAst2), t2))
                      case _ =>
                        val (protoRel, _) = perEventURel(sp0, "",
                          wAst2, wSrc2, wi, protoEnvM)
                        Right(withMk(fdEval(protoRel, wi), wi).schema)
                    }
                }
              // r15 (VERDICT r14 #2): the single-windowed path's
              // TIME-BANDED base compaction, generalized PER WRITER —
              // every compactEvery generations each windowed writer's
              // flush-partial state sheds FROZEN buckets (bucket end ≤
              // the batch's max ts − wmNs) into a compacted base of
              // ONE latest flush row per group key, so long-horizon
              // per-trigger reads stay O(live band + key domain), not
              // O(every bucket ever flushed). Safe by the same freeze
              // argument: a bucket frozen at generation g is
              // admissible to EVERY event of later generations
              // (in-order replay ⇒ their ts exceed the gen-g bound),
              // and among ONE writer's admissible flushes per key only
              // the LATEST ord can win the as-of pick — an older flush
              // always loses to its own writer's newer one. Implicit-
              // set (± sweeper) groups only: FOLD flush rows are
              // DELTAS — every frozen delta still sums into future
              // as-of values and the group's min-ord row can seed the
              // 'a' pick, so latest-per-key collapse would be wrong;
              // fold groups keep the un-compacted band (reads stay
              // key-pruned).
              val compactInfoM: Map[Int, (Int, Seq[String], StructType)] =
                if (isFoldGroup) Map.empty
                else writers.indices.flatMap { wi =>
                  infosM(wi) match {
                    // implicit-set windowed writers only: a FOLD
                    // writer's flush rows are deltas (see above)
                    case Left(p) if wKinds(wi) == "upsert" =>
                      val gb = writers(wi)._1.groupBy
                      val flushSch =
                        p.flushOf(emptyOf(sp0, p.stateSchema)).schema
                      val fCols = flushSch.map(_.name).toSet
                      if (gb.nonEmpty && gb.forall(fCols.contains))
                        Some(wi -> ((compactEveryConf(sp0).getOrElse(8),
                          gb: Seq[String], flushSch)))
                      else None
                    case _ => None
                  }
                }.toMap
              // (r17, VERDICT r16 #1) __mk*-keyed flush-partial
              // stores for this branch's WINDOWED members — the
              // discipline the event-log branch proved in r16: a
              // windowed member whose join keys are NON-AGGREGATE
              // writer outputs (bucket membership stable under
              // partial merge; the key item exprs evaluate over raw
              // source rows AND partial state rows) keys its wst
              // store and compacted wbase on the join-key
              // projections, so per-trigger reads bucket-restrict to
              // the trigger's key domain (batch keys ∪ — for shape
              // mixes — the fold-touched keys pass 2 reads flushes
              // for) instead of scanning the whole accumulated
              // state. A member whose keys are aggregate-valued or
              // not bare writer outputs keeps the r15 full() read —
              // a fallback, not a refusal: correct, compaction-
              // bounded, just key-unpruned.
              def mkOfKes(kes: List[(String, String, Expr)],
                  rel: DataFrame, fromFlush: Boolean): DataFrame =
                rel.select(kes.zipWithIndex.map {
                  case ((kc, a2, e2), j2) =>
                    (if (fromFlush) col(a2) else expr(sqlOf(e2)))
                      .cast(dSchema(kc).dataType).as(s"__mk$j2") } ++
                  rel.columns.toSeq.map(col): _*)
              // SHAPE MIXES keep the r16 (bucket, group)-keyed stores
              // and full() reads end-to-end: pass 2 scopes fold
              // collapses with windowed flushes for fold-TOUCHED keys
              // (a superset of the batch's), and restricting the read
              // through kdfMk ∪ foldKeys re-evaluates the fold delta
              // lineage inside the keyread collect — measured SLOWER
              // than the full read it replaced (shapemix 10× arm
              // +28%). The keyed discipline applies to every other
              // mixed group.
              val winMkM: Map[Int, List[(String, String, Expr)]] =
                if (isShapeMix) Map.empty
                else writers.indices.flatMap { wi =>
                  infosM(wi).left.toOption.flatMap { p =>
                    scala.util.Try {
                      val items2 = itemsOf(writers(wi)._1)
                      val picked = keyOrderM.map { kc =>
                        val rhs =
                          keysPer(wi).find(_._1 == kc).get._2.trim
                        val byAlias =
                          if (rhs.matches("[A-Za-z_][A-Za-z0-9_]*"))
                            items2.find(_._2 == rhs)
                          else None
                        byAlias.orElse(items2.find(_._2 == kc)) match {
                          case Some((it2, a2, false)) =>
                            Some((kc, a2, it2.e))
                          case _ => None
                        }
                      }
                      if (picked.exists(_.isEmpty)) None
                      else {
                        val kes = picked.flatten
                        // deploy-time analysis: the key exprs must
                        // resolve over the partial-state schema, the
                        // raw source proto AND the flush schema — any
                        // failure keeps the full-read path
                        mkOfKes(kes,
                          emptyOf(sp0, p.stateSchema), false).schema
                        mkOfKes(kes, loadTable(sp0, "",
                          writers(wi)._4, protoEnvM), false).schema
                        mkOfKes(kes, emptyOf(sp0, p.flushOf(
                          emptyOf(sp0, p.stateSchema)).schema),
                          true).schema
                        Some(wi -> kes)
                      }
                    }.toOption.flatten
                  }
                }.toMap
              def mkOfM(wi: Int, rel: DataFrame): DataFrame =
                mkOfKes(winMkM(wi), rel, fromFlush = false)
              def mkOfFlM(wi: Int, rel: DataFrame): DataFrame =
                mkOfKes(winMkM(wi), rel, fromFlush = true)
              // latest update per key, true __ord kept: max of
              // (__ord, payload) per __mk* — __ord is unique per row
              def latestMerge(prior: DataFrame, delta: DataFrame)
                  : DataFrame = {
                val all = prior.unionByName(delta)
                val payCols = all.columns.filterNot(mkCols.contains)
                all.groupBy(mkCols.map(col): _*)
                  .agg(max(struct(col("__ord").as("o"),
                    struct(payCols.map(col): _*).as("p"))).as("m"))
                  .select(mkCols.map(col) ++
                    payCols.map(c2 => col(s"m.p.$c2").as(c2)): _*)
              }
              // FOLD state = the as-of injection rows themselves: per
              // key an 'a' row (the group's FIRST per-event upsert —
              // true ord, own delta, insert values: the window pass's
              // st0/f0 row unless an earlier FLUSH beats it) and a 'b'
              // row (Σ of all later per-event deltas at (last ord ts,
              // id, MaxValue−1) — after its 'a', before every future
              // event under in-order replay; sums commute, so its
              // position among flush deltas is free). Merge = one
              // keyed groupBy over prior rows ∪ batch rows: 'a' = the
              // min-ord row ('b' rows never win — their ord ≥ their
              // own 'a'), total = Σ __fd, new 'b' = total − a's own
              // delta. O(2 rows per key), no emission-log growth.
              // SHAPE MIXES (r15) scope the collapse past the latest
              // PAST reset per key (`rst`: __mk* + max __rord with
              // ord ≤ the batch's max ts): rows at or before the
              // reset are dead for every FUTURE event (in-order
              // replay ⇒ future ts ≥ this batch's max ts ≥ reset ts),
              // and because any reset newer than the last merge sorts
              // after the prior 'b' row, a 'b' sum never straddles a
              // reset — the drop is always whole-rows, never a split.
              def foldMerge(prior: DataFrame, delta: DataFrame,
                  rst: Option[DataFrame] = None): DataFrame = {
                val all0 = prior.unionByName(delta)
                val all = rst match {
                  case None => all0
                  case Some(r) =>
                    all0.as("t").join(r.as("r"),
                        mkCols.map(c2 =>
                          col(s"t.$c2") <=> col(s"r.$c2"))
                          .reduce(_ && _), "left_outer")
                      .filter(col("r.__rord").isNull ||
                        col("t.__ord") > col("r.__rord"))
                      .select(all0.columns.toSeq
                        .map(c2 => col(s"t.$c2")): _*)
                }
                val payCols = all.columns.filterNot(mkCols.contains)
                val aggs = Seq(
                  min(struct(col("__ord").as("o"),
                    struct(payCols.map(col): _*).as("p"))).as("a"),
                  max(col("__ord")).as("mo")) ++
                  foldColsM.map(c2 =>
                    sum(col(s"__fd.$c2")).as(s"__t_$c2"))
                val aggd = all.groupBy(mkCols.map(col): _*)
                  .agg(aggs.head, aggs.tail: _*)
                val bStruct = struct(payCols.map {
                  case "__ord" => struct(col("mo.ts_ns").as("ts_ns"),
                    col("mo.event_id").as("event_id"),
                    lit(Long.MaxValue - 1L).as("w")).as("__ord")
                  case "__fd" => struct(foldColsM.map { c2 =>
                    (col(s"__t_$c2") - col(s"a.p.__fd.$c2"))
                      .cast(dSchema(c2).dataType).as(c2) }: _*)
                    .as("__fd")
                  case c2 => col(s"a.p.$c2").as(c2)
                }: _*)
                aggd.select(mkCols.map(col) :+
                  explode(array(col("a.p"), bStruct)).as("r"): _*)
                  .select(mkCols.map(col) ++
                    payCols.map(c2 => col(s"r.$c2").as(c2)): _*)
              }
              def peMerge(prior: DataFrame, delta: DataFrame)
                  : DataFrame =
                if (isFoldGroup) foldMerge(prior, delta)
                else latestMerge(prior, delta)
              // ord of a windowed writer's flush rows (bucket END,
              // event 0, statement index) — the reset ord for
              // windowed IMPLICIT members of a shape mix
              def flushOrdC(wi: Int, tNs2: Long): Column =
                struct(((col("__wb") + lit(1L)) * lit(tNs2))
                  .cast("long").as("ts_ns"),
                  lit(0L).as("event_id"), lit(wi.toLong).as("w"))
              def pruneMk(rel: DataFrame, kdf2: DataFrame): DataFrame =
                rel.as("t").join(kdf2.as("k"),
                    mkCols.map(c2 => col(s"t.$c2") <=> col(s"k.$c2"))
                      .reduce(_ && _), "left_semi")
                  .select(rel.columns.toSeq.map(c2 => col(s"t.$c2")): _*)
              // deploy-time prototype: fail fast + output schema
              val protoM = enrichCompile(sp0, "", ast, j, writers,
                emptyOf(sp0, dSchema), protoEnvM)
              val keyM = name.orElse(ast.action.map(_.target))
              if (keyM.contains(out) || name.contains(out)) {
                val states: Seq[(String, StructType, StateMode)] =
                  (writers.indices.map { wi =>
                    infosM(wi) match {
                      case Left(p) if winMkM.contains(wi) =>
                        // keyed on the join-key projections: the
                        // probe evaluates the non-agg key exprs over
                        // the writer's raw filtered source rows
                        (s"wst$wi",
                          mkOfM(wi, emptyOf(sp0, p.stateSchema)).schema,
                          KeyedState(mkCols, (sp, d2, batch) => {
                            scriptFns = fnsSnapM
                            val benv =
                              batchEnv(sp, d2, batch, statelessSnap)
                            val base0 =
                              loadTable(sp, d2, writers(wi)._4, benv)
                            val base = (writers(wi)._1.stream match {
                              case ss3: SingleStream => ss3.filter
                              case _                 => None
                            }).fold(base0)(f =>
                              applyFilter(sp, d2, base0, f, benv))
                            mkOfM(wi, base)
                              .select(mkCols.map(col): _*)
                          }, compactEvery =
                            compactInfoM.get(wi).map(_._1)))
                      case Left(p) => (s"wst$wi", p.stateSchema,
                        KeyedState(p.keys, (sp, d2, batch) => {
                          scriptFns = fnsSnapM
                          p.probeSel(loadTable(sp, d2, writers(wi)._4,
                            batchEnv(sp, d2, batch, statelessSnap)))
                        }, compactEvery =
                          compactInfoM.get(wi).map(_._1)))
                      case Right(sch) => (s"pst$wi", sch,
                        KeyedState(mkCols, (sp, d2, batch) => {
                          scriptFns = fnsSnapM
                          withMk(perEventURel(sp, d2, writers(wi)._1,
                            writers(wi)._4, wi,
                            batchEnv(sp, d2, batch, statelessSnap))._1,
                            wi).select(mkCols.map(col): _*)
                        }))
                    }
                  } ++ compactInfoM.toSeq.sortBy(_._1).map {
                    // per-writer base: rewrites ONLY on compaction
                    // generations (empty batchKeys ⇒ no touched
                    // buckets ⇒ the runner skips its write between)
                    case (wi, (e, bks, fSch))
                        if winMkM.contains(wi) =>
                      val bSch =
                        mkOfFlM(wi, emptyOf(sp0, fSch)).schema
                      (s"wbase$wi", bSch, KeyedState(mkCols,
                        (sp, _, _) => emptyOf(sp, StructType(
                          bSch.filter(f => mkCols.contains(f.name))
                            .toArray)),
                        compactEvery = Some(e)))
                    case (wi, (e, bks, fSch)) =>
                      (s"wbase$wi", fSch, KeyedState(bks,
                        (sp, _, _) => emptyOf(sp, StructType(
                          fSch.filter(f => bks.contains(f.name))
                            .toArray)),
                        compactEvery = Some(e)))
                  }) :+ (("__out", protoM.schema, AppendState))
                foldResult = Some(LiveFold(srcTs, states,
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnapM
                    val benv = batchEnv(sp, d2, batch, statelessSnap)
                    val kdf = batchKeyRel(sp, d2, batch, benv)
                    val kdfMk = kdf.select(keyOrderM.zipWithIndex
                      .map { case (kc, j2) =>
                        col(kc).as(s"__mk$j2") }: _*)
                    var winFlushM = Map.empty[Int, DataFrame]
                    var uRelM = Map.empty[Int, DataFrame]
                    var flushAllM = Map.empty[Int, DataFrame]
                    var deltaMkM = Map.empty[Int, DataFrame]
                    // pass 1a: per-event writers — their deltas feed
                    // the uRel overrides and (shape mixes) the
                    // fold-key relation pass 2 scopes with;
                    // SHAPE-MIX fold writers only derive their
                    // deltas here — their state merge needs the
                    // trigger's reset relation (pass 2)
                    val stUpdR = writers.indices.flatMap { wi =>
                      infosM(wi) match {
                        case Right(_) =>
                          val (deltaRel0, _) = perEventURel(sp, d2,
                            writers(wi)._1, writers(wi)._4, wi, benv)
                          val deltaRel = fdEval(deltaRel0, wi)
                          val (priorRel, kdfEff) =
                            acc(s"pst$wi").keyedRead(kdfMk)
                          uRelM += wi ->
                            pruneMk(priorRel, kdfEff)
                              .drop(mkCols: _*).unionByName(deltaRel)
                          val dMk = withMk(deltaRel, wi)
                          deltaMkM += wi -> dMk
                          if (isShapeMix && wKinds(wi) == "fold") Nil
                          else Seq(s"pst$wi" -> peMerge(
                            acc(s"pst$wi").slice, dMk))
                        case _ => Nil
                      }
                    }
                    val foldWis = writers.indices.filter(wi =>
                      isShapeMix && infosM(wi).isRight &&
                        wKinds(wi) == "fold")
                    val foldKeysO: Option[DataFrame] =
                      if (foldWis.isEmpty) None
                      else Some(foldWis.map(wi =>
                        acc(s"pst$wi").slice
                          .select(mkCols.map(col): _*)
                          .unionByName(deltaMkM(wi)
                            .select(mkCols.map(col): _*)))
                        .reduce(_ unionByName _).distinct())
                    // pass 1b: windowed writers (flush partials ∪
                    // compacted base) merge
                    val stUpd1 = writers.indices.flatMap { wi =>
                      infosM(wi) match {
                        case Left(p) =>
                          val keyedWi = winMkM.contains(wi)
                          val st1 = p.merge(
                            if (keyedWi)
                              acc(s"wst$wi").slice.drop(mkCols: _*)
                            else acc(s"wst$wi").slice,
                            p.partialOf(loadTable(sp, d2,
                              writers(wi)._4, benv)))
                          // post-merge flush relation: untouched
                          // buckets + this trigger's merged buckets.
                          // A KEYED store bucket-restricts the prior
                          // read to the trigger's key domain BEFORE
                          // the anti-join merge (r17): only those
                          // keys' flushes can join this trigger, so
                          // the read scans O(touched-key buckets),
                          // not the whole accumulated partial history
                          val full0 =
                            if (keyedWi) {
                              val (priorW, kEff) =
                                acc(s"wst$wi").keyedRead(kdfMk)
                              val r = pruneMkG(priorW, kEff, mkCols)
                                .drop(mkCols: _*)
                              foldReadProbe.foreach { buf =>
                                enrichReadGen += 1
                                buf += ((enrichReadGen, s"wst$wi",
                                  r.count()))
                              }
                              r
                            } else acc(s"wst$wi").full()
                          val fullPost = full0.as("t")
                            .join(st1.select(p.keys.map(col): _*)
                                .distinct().as("u"),
                              p.keys.map(k2 =>
                                col(s"t.$k2") <=> col(s"u.$k2"))
                                .reduce(_ && _), "left_anti")
                            .select(full0.columns.toSeq
                              .map(c2 => col(s"t.$c2")): _*)
                            .unionByName(st1)
                          // frozen history re-enters as the compacted
                          // base — finished flush rows at TRUE __wb,
                          // so their as-of ords are exact
                          val flushAll = compactInfoM.get(wi) match {
                            case Some(_) =>
                              val baseRel =
                                if (keyedWi) {
                                  val (pb, kbEff) = acc(s"wbase$wi")
                                    .keyedRead(kdfMk)
                                  val r =
                                    pruneMkG(pb, kbEff, mkCols)
                                      .drop(mkCols: _*)
                                  foldReadProbe.foreach { buf =>
                                    enrichReadGen += 1
                                    buf += ((enrichReadGen,
                                      s"wbase$wi", r.count()))
                                  }
                                  r
                                } else acc(s"wbase$wi").full()
                              p.flushOf(fullPost)
                                .unionByName(baseRel)
                            case None => p.flushOf(fullPost)
                          }
                          flushAllM += wi -> flushAll
                          winFlushM += wi ->
                            pruneToBatchKeys(flushAll, kdf)
                          def wrapSt(r: DataFrame): DataFrame =
                            if (keyedWi) mkOfM(wi, r) else r
                          compactInfoM.get(wi) match {
                            case None => Seq(s"wst$wi" -> wrapSt(st1))
                            case Some((_, bks, fSch)) =>
                              val bSchW =
                                if (keyedWi)
                                  mkOfFlM(wi,
                                    emptyOf(sp, fSch)).schema
                                else fSch
                              if (!acc(s"wst$wi").compacting)
                                Seq(s"wst$wi" -> wrapSt(st1),
                                  s"wbase$wi" -> emptyOf(sp, bSchW))
                              else {
                                val maxTs = batch
                                  .agg(max(col("ts_ns"))).collect()(0)
                                if (maxTs.isNullAt(0))
                                  Seq(s"wst$wi" -> wrapSt(st1),
                                    s"wbase$wi" ->
                                      acc(s"wbase$wi").slice)
                                else {
                                  val w = maxTs.getLong(0) - wmNs
                                  val frozenP = (col("__wb") + lit(1L)) *
                                    lit(p.tNs) <= lit(w)
                                  val fresh0 =
                                    p.flushOf(st1.filter(frozenP))
                                  val fresh =
                                    if (keyedWi) mkOfFlM(wi, fresh0)
                                    else fresh0
                                  val ww = org.apache.spark.sql
                                    .expressions.Window
                                    .partitionBy(bks.map(col): _*)
                                    .orderBy(col("__wb").desc)
                                  val base2 = acc(s"wbase$wi").slice
                                    .unionByName(fresh)
                                    .withColumn("__rn",
                                      row_number().over(ww))
                                    .where(col("__rn") === 1)
                                    .drop("__rn")
                                  Seq(s"wst$wi" ->
                                      wrapSt(st1.filter(!frozenP)),
                                    s"wbase$wi" -> base2)
                                }
                              }
                          }
                        case _ => Nil
                      }
                    }
                    // pass 2 (shape mixes): per fold-touched key, the
                    // latest PAST reset — implicit per-event latest
                    // rows (state ∪ batch) and windowed implicit
                    // flushes whose bucket END ≤ the batch's max ts
                    // (an OPEN bucket's flush must not scope: events
                    // before its end still admit earlier deltas) —
                    // then the scoped two-row collapses
                    val stUpd2 = foldKeysO match {
                      case None => Nil
                      case Some(foldKeys) =>
                        val perEvR = writers.indices.collect {
                          case wj if infosM(wj).isRight &&
                              wKinds(wj) == "upsert" =>
                            val (pj, kj) =
                              acc(s"pst$wj").keyedRead(foldKeys)
                            pruneMk(pj, kj).select(mkCols.map(col) :+
                                col("__ord").as("__rord"): _*)
                              .unionByName(deltaMkM(wj)
                                .select(mkCols.map(col) :+
                                  col("__ord").as("__rord"): _*))
                        }
                        val maxTsRow =
                          batch.agg(max(col("ts_ns"))).collect()(0)
                        val winR =
                          if (maxTsRow.isNullAt(0)) Nil
                          else writers.indices.collect {
                            case wj if infosM(wj).isLeft &&
                                wKinds(wj) == "upsert" =>
                              pruneMk(withMk(flushAllM(wj), wj),
                                  foldKeys)
                                .select(mkCols.map(col) :+
                                  flushOrdC(wj, winTNsPer(wj).get)
                                    .as("__rord"): _*)
                                .where(col("__rord.ts_ns") <=
                                  lit(maxTsRow.getLong(0)))
                          }
                        val rsts = perEvR ++ winR
                        val rstO =
                          if (rsts.isEmpty) None
                          else Some(rsts.reduce(_ unionByName _)
                            .groupBy(mkCols.map(col): _*)
                            .agg(max(col("__rord")).as("__rord")))
                        foldWis.map(wi => s"pst$wi" -> foldMerge(
                          acc(s"pst$wi").slice, deltaMkM(wi), rstO))
                      }
                    val stUpd = (stUpdR ++ stUpd1 ++ stUpd2).toMap
                    stUpd + ("__out" -> enrichCompile(sp, d2, ast, j,
                      writers, emptyOf(sp, dSchema), benv,
                      winFlush = winFlushM, uRelOverride = uRelM))
                  },
                  (_, acc) => acc("__out"),
                  ast.orderBy.map { case (c2, asc) =>
                    if (asc) col(c2).asc else col(c2).desc }))
              }
              (emptyOf(sp0, protoM.schema), KFold)
            } else if (winWriterTNs.nonEmpty) {
              // PER-EVENT AS-OF enrichment of a WINDOWED-aggregate
              // store (the Siddhi store pattern read back through a
              // join, r11): each event sees the latest COMPLETED
              // flush for its key — a flush row is an update row
              // visible from its bucket END, and enrichCompile's
              // keyed union+window pass reconstructs the as-of state
              // exactly like per-event writers. The fold keeps the
              // store pattern's per-(bucket ∪ group keys) algebraic
              // PARTIALS (a bucket spanning triggers merges
              // componentwise); per trigger it merges the batch's
              // partials, derives the POST-merge flush relation, and
              // runs the as-of pass over THIS batch's events —
              // chunking-invariant because an event only reads
              // flushes whose bucket closed at or before its own
              // timestamp, whose data (in-order replay) has already
              // arrived. The batch compile runs the identical
              // construction over the whole replay, so it is the
              // oracle. An AGGREGATING read folds the same as-of rows
              // as algebraic keyed partials (the enrich-agg recipe).
              if (dSrc != "events")
                fail("windowed-writer enrichment (v1) reads a table " +
                  s"whose writer consumes the source stream; '$tName' " +
                  s"is written from derived stream '$dSrc'")
              val fnsSnapW = scriptFns
              val tNsW = winWriterTNs.get
              val ssW = dAst.stream.asInstanceOf[SingleStream]
              // flush-partial fold with an IDENTITY finish (its
              // finish(acc) is the flush relation, __wb + outputs) +
              // the per-trigger post-merge flush derivation shared by
              // the projection and aggregation sub-branches.
              //
              // The partial store is TIME-BANDED (r12): every
              // `graft.live.compactEvery` generations the fold sheds
              // FROZEN buckets — bucket end at or below the batch's
              // watermark (max ts − the source's 1-minute bound), so
              // in-order arrival means no later row can merge into
              // them, and every later event admits them all, so only
              // the LATEST per group key can ever win the as-of pick —
              // into a compacted BASE of one finished flush row per
              // key. Per-trigger full-state reads are then O(live
              // band + base ≈ key domain), not O(every bucket partial
              // ever written) — the bound a long-running deployment
              // needs.
              def winFoldOf(): (
                  (SparkSession, Map[String, LiveState], DataFrame)
                    => DataFrame,
                  (SparkSession, Map[String, LiveState], DataFrame,
                    DataFrame) => DataFrame,
                  Seq[(String, StructType, StateMode)],
                  (SparkSession, Map[String, LiveState], DataFrame,
                    DataFrame) => Map[String, DataFrame]) = {
                val p = flushPiecesOf(emptyOf(sp0, srcTs.schema),
                  ssW.filter, dAst.groupBy, itemsOf(dAst), tNsW)
                val stSch = p.stateSchema
                val keysP = p.keys
                val flushSchema =
                  p.flushOf(emptyOf(sp0, stSch)).schema
                val flushCols = flushSchema.map(_.name).toSet
                // (r17, VERDICT r16 #1) __mk*-keyed store — the r16
                // event-log discipline extended to this channel: when
                // every enrichment join key is a NON-AGGREGATE writer
                // output (its item expr evaluates over raw source
                // rows AND partial state rows — group columns survive
                // partialOf — so bucket membership is stable under
                // partial merge), the flush-partial store and its
                // compacted base key on the join-key projections and
                // the per-trigger read bucket-restricts to the
                // batch's event keys: O(batch-key history) instead of
                // O(live band + whole key-domain base). Anything else
                // (aggregate-valued or non-output join keys, exprs
                // that don't analyze over the partial schema) keeps
                // the r15 full() read — a fallback, not a refusal:
                // reads stay compaction-bounded, just key-unpruned.
                val mkInfoW: Option[(List[String],
                    DataFrame => DataFrame, DataFrame => DataFrame)] =
                  scala.util.Try {
                    val items2 = itemsOf(dAst)
                    val keyCols = enrichJoinKeys.map(_._1).distinct
                    val picked = keyCols.map { kc =>
                      items2.find(_._2 == kc) match {
                        case Some((it2, _, false)) => Some(kc -> it2.e)
                        case _ => None
                      }
                    }
                    if (keyCols.isEmpty || picked.exists(_.isEmpty))
                      None
                    else {
                      val kes = picked.flatten
                      val mkCols =
                        kes.indices.map(j2 => s"__mk$j2").toList
                      def addSt(rel: DataFrame): DataFrame =
                        rel.select(kes.zipWithIndex.map {
                          case ((kc, e2), j2) =>
                            expr(sqlOf(e2))
                              .cast(dSchema(kc).dataType)
                              .as(s"__mk$j2") } ++
                          rel.columns.toSeq.map(col): _*)
                      def addFl(rel: DataFrame): DataFrame =
                        rel.select(kes.zipWithIndex.map {
                          case ((kc, _), j2) =>
                            col(kc).cast(dSchema(kc).dataType)
                              .as(s"__mk$j2") } ++
                          rel.columns.toSeq.map(col): _*)
                      // deploy-time analysis over the partial/flush
                      // schemas: a key expr that doesn't resolve
                      // there keeps the full-read path
                      addSt(emptyOf(sp0, stSch)).schema
                      addFl(emptyOf(sp0, flushSchema)).schema
                      Some((mkCols, addSt _, addFl _))
                    }
                  }.toOption.flatten
                val stSchM = mkInfoW.fold(stSch)(i =>
                  i._2(emptyOf(sp0, stSch)).schema)
                // a group key must appear among the flush outputs for
                // the base to key itself; otherwise keep the un-pruned
                // store (correct, just O(history) — and the select-item
                // checks make this branch unreachable in practice)
                // default 8: short replays (the 4-chunk gates) never
                // reach a compaction generation and pay zero overhead;
                // a long-running deployment compacts every 8 triggers,
                // bounding the store at the live band + 8 triggers of
                // bucket growth
                val compactN: Option[Int] =
                  if (dAst.groupBy.forall(flushCols.contains))
                    Some(compactEveryConf(sp0).getOrElse(8))
                  else None
                val baseKeys: Seq[String] =
                  if (dAst.groupBy.nonEmpty) dAst.groupBy
                  else Seq("__wb")
                val stMode0: StateMode = mkInfoW match {
                  case Some((mkCols, addSt, _)) =>
                    KeyedState(mkCols, (sp, _, batch) => {
                      scriptFns = fnsSnapW
                      val f = ssW.filter.fold(batch)(ff =>
                        batch.where(expr(sqlOf(ff))))
                      addSt(f).select(mkCols.map(col): _*)
                    }, compactEvery = compactN)
                  case None =>
                    KeyedState(keysP, (sp, _, batch) => {
                      scriptFns = fnsSnapW
                      p.probeSel(batch)
                    }, compactEvery = compactN)
                }
                val baseSch = mkInfoW.fold(flushSchema)(i =>
                  i._3(emptyOf(sp0, flushSchema)).schema)
                val schemas2: Seq[(String, StructType, StateMode)] =
                  compactN match {
                    case Some(e) => Seq(
                      ("state", stSchM, stMode0),
                      // the base only rewrites on compaction
                      // generations (batchKeys empty ⇒ no touched
                      // buckets ⇒ the runner skips its write)
                      ("base", baseSch, mkInfoW match {
                        case Some((mkCols, _, _)) =>
                          KeyedState(mkCols,
                            (sp, _, _) => emptyOf(sp, StructType(
                              baseSch.filter(f =>
                                mkCols.contains(f.name)).toArray)),
                            Some(e))
                        case None =>
                          KeyedState(baseKeys,
                            (sp, _, _) => emptyOf(sp, StructType(
                              flushSchema.filter(f =>
                                baseKeys.contains(f.name)).toArray)),
                            Some(e))
                      }))
                    case None => Seq(("state", stSchM, stMode0))
                  }
                def mergeSt1(sp: SparkSession,
                    acc: Map[String, LiveState], batch: DataFrame)
                    : DataFrame = {
                  scriptFns = fnsSnapW
                  val s0 = mkInfoW.fold(acc("state").slice)(i =>
                    acc("state").slice.drop(i._1: _*))
                  p.merge(s0, p.partialOf(batch))
                }
                def split(sp: SparkSession,
                    acc: Map[String, LiveState], st1: DataFrame,
                    batch: DataFrame): Map[String, DataFrame] = {
                  def wrapSt(r: DataFrame): DataFrame =
                    mkInfoW.fold(r)(i => i._2(r))
                  def wrapFl(r: DataFrame): DataFrame =
                    mkInfoW.fold(r)(i => i._3(r))
                  if (compactN.isEmpty) Map("state" -> wrapSt(st1))
                  else if (!acc("state").compacting)
                    Map("state" -> wrapSt(st1),
                      "base" -> emptyOf(sp, baseSch))
                  else {
                    val maxTs = batch.agg(max(col("ts_ns"))).collect()(0)
                    if (maxTs.isNullAt(0))
                      Map("state" -> wrapSt(st1),
                        "base" -> acc("base").slice)
                    else {
                      val w = maxTs.getLong(0) - wmNs
                      val frozenP =
                        (col("__wb") + lit(1L)) * lit(tNsW) <= lit(w)
                      val fresh =
                        wrapFl(p.flushOf(st1.filter(frozenP)))
                      // latest flush per group key wins the base;
                      // UNGROUPED writers keep one global latest row —
                      // TakeOrderedAndProject (distributed), not a
                      // row_number window over one all-rows partition
                      val base2 =
                        if (dAst.groupBy.isEmpty)
                          acc("base").slice.unionByName(fresh)
                            .orderBy(col("__wb").desc).limit(1)
                        else {
                          val ww = org.apache.spark.sql.expressions
                            .Window
                            .partitionBy(dAst.groupBy.map(col): _*)
                            .orderBy(col("__wb").desc)
                          acc("base").slice.unionByName(fresh)
                            .withColumn("__rn", row_number().over(ww))
                            .where(col("__rn") === 1).drop("__rn")
                        }
                      Map("state" -> wrapSt(st1.filter(!frozenP)),
                        "base" -> base2)
                    }
                  }
                }
                def flushRelOf(sp: SparkSession,
                    acc: Map[String, LiveState], st1: DataFrame,
                    kdf: DataFrame): DataFrame = {
                  // post-merge partials: untouched buckets from the
                  // live-band state (pruned by the compaction split),
                  // touched buckets replaced by st1 — then the frozen
                  // history re-enters as the compacted base (one
                  // latest-flush row per key, always admissible). The
                  // keyed store bucket-restricts both reads to the
                  // batch's event keys BEFORE the anti-join merge
                  // (only batch-key rows can join this trigger; st1
                  // unions in unpruned, and the caller's
                  // pruneToBatchKeys re-prunes at the row level).
                  val (full0, baseRel) = mkInfoW match {
                    case Some((mkCols, _, _)) =>
                      val keyCols = enrichJoinKeys.map(_._1).distinct
                      val kdfMk = kdf.select(keyCols.zipWithIndex.map {
                        case (kc, j2) => col(kc).as(s"__mk$j2") }: _*)
                      val (priorW, kEff) =
                        acc("state").keyedRead(kdfMk)
                      val f0 = pruneMkG(priorW, kEff, mkCols)
                        .drop(mkCols: _*)
                      foldReadProbe.foreach { buf =>
                        enrichReadGen += 1
                        buf += ((enrichReadGen, "state", f0.count()))
                      }
                      val b0 = acc.get("base").map { b =>
                        val (pb, kbEff) = b.keyedRead(kdfMk)
                        val r = pruneMkG(pb, kbEff, mkCols)
                          .drop(mkCols: _*)
                        foldReadProbe.foreach { buf =>
                          enrichReadGen += 1
                          buf += ((enrichReadGen, "base", r.count()))
                        }
                        r
                      }
                      (f0, b0)
                    case None =>
                      (acc("state").full(),
                        acc.get("base").map(_.full()))
                  }
                  val fullPost = full0.as("t")
                    .join(st1.select(keysP.map(col): _*).distinct()
                        .as("u"),
                      keysP.map(k2 =>
                        col(s"t.$k2") <=> col(s"u.$k2"))
                        .reduce(_ && _), "left_anti")
                    .select(full0.columns.toSeq
                      .map(c2 => col(s"t.$c2")): _*)
                    .unionByName(st1)
                  val flushLive = p.flushOf(fullPost)
                  baseRel.fold(flushLive)(b =>
                    flushLive.unionByName(b))
                }
                (mergeSt1, flushRelOf, schemas2, split)
              }
              if (hasAggE) {
                // AGGREGATION ABOVE the as-of join: the shared
                // EnrichAggTail, fed per trigger by the same
                // post-merge flush relation the projection arm below
                // maintains (winFlush)
                val keyWA = name.orElse(ast.action.map(_.target))
                if (keyWA.contains(out) || name.contains(out)) {
                  val (wfMerge, wfFlushRel, wfSchemas, wfSplit) =
                    winFoldOf()
                  foldResult = Some(LiveFold(srcTs,
                    wfSchemas :+ aggTail.stateEntry("aggst", fnsSnapW),
                    (sp, d2, acc, batch) => {
                      scriptFns = fnsSnapW
                      val st1 = wfMerge(sp, acc, batch)
                      val benv = batchEnv(sp, d2, batch, statelessSnap)
                      // flush rows prune to the batch's event keys:
                      // only those keys can join this trigger (the
                      // time-banded store bounds the HISTORY axis,
                      // this bounds the KEY axis)
                      val kdf = batchKeyRel(sp, d2, batch, benv)
                      val flushRel = pruneToBatchKeys(
                        wfFlushRel(sp, acc, st1, kdf), kdf)
                      val enriched = enrichCompile(sp, d2,
                        aggTail.astRows, j, writers,
                        emptyOf(sp, dSchema), benv,
                        winFlush = Map(0 -> flushRel))
                      wfSplit(sp, acc, st1, batch) + ("aggst" ->
                        aggTail.mergeInto(acc("aggst").slice,
                          enriched))
                    },
                    (_, acc) => aggTail.finish(acc("aggst")),
                    ast.orderBy.map { case (c2, asc) =>
                      if (asc) col(c2).asc else col(c2).desc },
                    ast.limit, ast.offset))
                }
                (emptyOf(sp0, aggTail.protoOut.schema), KFold)
              } else {
              // deploy-time prototype: fail fast + output schema (the
              // dmlEmissions path recomputes flushes from the raw
              // stream over an empty env)
              val protoW = enrichCompile(sp0, "", ast, j, writers,
                emptyOf(sp0, dSchema),
                batchEnv(sp0, "", emptyOf(sp0, srcTs.schema),
                  statelessSnap))
              val keyW = name.orElse(ast.action.map(_.target))
              if (keyW.contains(out) || name.contains(out)) {
                val (wfMerge, wfFlushRel, wfSchemas, wfSplit) =
                  winFoldOf()
                foldResult = Some(LiveFold(srcTs,
                  wfSchemas :+ (("__out", protoW.schema, AppendState)),
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnapW
                    val st1 = wfMerge(sp, acc, batch)
                    val benv = batchEnv(sp, d2, batch, statelessSnap)
                    val kdf = batchKeyRel(sp, d2, batch, benv)
                    val flushRel = pruneToBatchKeys(
                      wfFlushRel(sp, acc, st1, kdf), kdf)
                    val enriched = enrichCompile(sp, d2, ast, j,
                      writers, emptyOf(sp, dSchema), benv,
                      winFlush = Map(0 -> flushRel))
                    wfSplit(sp, acc, st1, batch) +
                      ("__out" -> enriched)
                  },
                  (_, acc) => acc("__out"),
                  ast.orderBy.map { case (c2, asc) =>
                    if (asc) col(c2).asc else col(c2).desc }))
              }
              (emptyOf(sp0, protoW.schema), KFold)
              }
            } else if (hasAggE) {
              // AGGREGATION ABOVE the enrichment join: the shared
              // EnrichAggTail over the per-event as-of rows (the
              // join-agg fold recipe — O(batch-touched buckets)
              // state writes; the batch compile aggregates the
              // identical as-of rows globally, so it is the oracle
              // under any chunking)
              val keyE2 = name.orElse(ast.action.map(_.target))
              if (keyE2.contains(out) || name.contains(out)) {
                val fnsSnap = scriptFns
                val tMode = tModeOf(fnsSnap)
                foldResult = Some(LiveFold(srcTs,
                  Seq((tName, dSchema, tMode),
                    aggTail.stateEntry("state", fnsSnap)),
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnap
                    val benv = batchEnv(sp, d2, batch, statelessSnap)
                    val enriched = enrichCompile(sp, d2,
                      aggTail.astRows, j, writers,
                      tReadPruned(sp, d2, acc, batch, benv), benv)
                    Map(
                      tName -> tApply(sp, d2, acc(tName).slice, benv),
                      "state" -> aggTail.mergeInto(
                        acc("state").slice, enriched))
                  },
                  (_, acc) => aggTail.finish(acc("state")),
                  ast.orderBy.map { case (c2, asc) =>
                    if (asc) col(c2).asc else col(c2).desc },
                  ast.limit, ast.offset))
              }
              (emptyOf(sp0, aggTail.protoOut.schema), KFold)
            } else {
            // fail fast at deploy time + learn the output schema
            val proto = enrichCompile(sp0, "", ast, j, writers,
              emptyOf(sp0, dSchema),
              batchEnv(sp0, "", emptyOf(sp0, srcTs.schema),
                statelessSnap))
            val keyE = name.orElse(ast.action.map(_.target))
            if (keyE.contains(out) || name.contains(out)) {
              val fnsSnap = scriptFns
              // the maintained table bucket-merges on its DML keys
              // (write cost O(batch-touched buckets)); the enrichment
              // OUTPUT is a sink-like accumulation — each trigger
              // appends its delta generation, never rewriting history
              val tMode = tModeOf(fnsSnap)
              foldResult = Some(LiveFold(srcTs,
                Seq((tName, dSchema, tMode),
                    ("__out", proto.schema, AppendState)),
                (sp, d2, acc, batch) => {
                  scriptFns = fnsSnap
                  val benv = batchEnv(sp, d2, batch, statelessSnap)
                  Map(
                    tName -> tApply(sp, d2, acc(tName).slice, benv),
                    // the pre-batch table read is PRUNED to the
                    // batch's event keys (tReadPruned): events may
                    // reference keys this batch didn't UPDATE, but
                    // never keys this batch's events don't carry
                    "__out" -> enrichCompile(sp, d2, ast, j, writers,
                      tReadPruned(sp, d2, acc, batch, benv), benv))
                },
                (_, acc) => acc("__out"),
                ast.orderBy.map { case (c2, asc) =>
                  if (asc) col(c2).asc else col(c2).desc }))
            }
            (emptyOf(sp0, proto.schema), KFold)
            }

          case j: JoinStream
              if liveAggDefs.contains(j.left.table) ||
                 liveAggDefs.contains(j.right.table) =>
            // named bound, not a confusing window diagnostic: the
            // stream ⋈ aggregation `within … per` join stays a batch
            // surface (sql_join_aggregation); live reads of the
            // cascade go through the aggregation-read fold
            // (sql_app_incremental_live)
            fail("live deployment (v1) does not join a `define " +
              "aggregation` table — read it with `from <agg> within " +
              "… per '…'` (deployed via the keyed fold), or use the " +
              "batch replay (compileApp) for the stream-aggregation " +
              "join")
          case j: JoinStream => (j.left.window, j.right.window) match {
            // windowed stream-stream join deployed LIVE: Spark's
            // watermarked interval join — the band [-Tl, Tr] becomes
            // the event-time range condition Structured Streaming uses
            // to size and EVICT both sides' join state (the engine twin
            // Streaming.streamStreamJoin's exact machinery)
            case (Some(lw2 @ WindowSpec(ln, largs, _)),
                  Some(rw2 @ WindowSpec(rn, rargs, _)))
                if Seq(ln, rn).forall(n2 =>
                  n2.equalsIgnoreCase("time") ||
                    n2.equalsIgnoreCase("timebatch")) =>
              Seq(lw2, rw2).foreach(
                requireEpochTb(_, "stream-stream join sides"))
              // timeBatch sides ride the SAME watermarked interval
              // join: bucket co-membership implies |Δts| < T, so the
              // [-T, T] hull is the eviction band Spark needs and the
              // bucket rule refines it as a residual conjunct
              if (!hasEqui(j.on))
                fail("a windowed stream-stream join needs an equality " +
                  "conjunct in its on-clause")
              // outer directions ride the SAME watermarked interval
              // join: Spark emits the null-padded side once the
              // watermark passes the band (state eviction doubles as
              // the no-match proof), so outer needs the flush-sentinel
              // Append channel (KWindowAgg) where inner emits matches
              // as they arrive (KStateless)
              val jType = j.joinType match {
                case "inner" | "left_outer" | "right_outer" |
                     "full_outer" => j.joinType
                case other => fail("live windowed joins are inner or " +
                  s"left/right/full outer (v1), got '$other'")
              }
              val joinAgg = ast.select.exists(it => containsAgg(it.e)) ||
                ast.groupBy.nonEmpty
              val la = j.leftAlias.getOrElse(fail("windowed join sides " +
                "need aliases to qualify their timestamps"))
              val ra = j.rightAlias.getOrElse(fail("windowed join sides " +
                "need aliases to qualify their timestamps"))
              def sideDf(ss: SingleStream, alias: String): DataFrame = {
                if (statefulStreams.contains(ss.table))
                  fail(s"live deployment (v1): '${ss.table}' is an " +
                    "aggregation output — it cannot feed a join")
                val b0 = envLookup(view, ss.table).getOrElse(fail("live deployment " +
                  s"reads declared streams; '${ss.table}' is neither " +
                  "the source nor an earlier insert-into target"))
                val b1 = ss.filter.fold(b0)(f => liveWhere(b0, f))
                if (!b1.columns.contains("ts"))
                  fail(s"join side '${ss.table}' lost its 'ts' column — " +
                    "live windowed joins need the event-time column")
                // flush sentinels ride through every liveWhere filter
                // (OR-extended) to keep advancing the watermark; drop
                // them HERE, above the source watermark node, so they
                // never enter the join — an outer join would otherwise
                // pair each sentinel with itself across the two sides
                val b2 = b1.filter(
                  col("ts") < graft.engine.Streaming.flushCutoff)
                // the source watermark tag propagates through the
                // rename (`alias_ts` keeps the -T60000ms annotation), so
                // re-declaring it here would be a disallowed watermark
                // redefinition — the interval join's state eviction
                // keys off the inherited tag
                b2.columns.foldLeft(b2)((d, c) =>
                  d.withColumnRenamed(c, s"${alias}_$c"))
              }
              def qual(parts: List[String]): String = parts match {
                case q :: f :: Nil => s"${q}_$f"
                case f :: Nil => fail(s"qualify '$f' with its side's " +
                  "alias in a windowed join")
                case other => fail(s"bad reference ${other.mkString(".")}")
              }
              val cond = sqlOfWith(j.on, qual)
              val isTb = (n2: String) => n2.equalsIgnoreCase("timebatch")
              val anyTb = isTb(ln) || isTb(rn)
              val (lo, hi) =
                if (anyTb) {
                  val h = math.max(largs.head, rargs.head)
                  if (j.unidirectional) (0L, h) else (-h, h)
                } else if (j.unidirectional) (0L, rargs.head)
                else (-largs.head, rargs.head)
              // tl - tr ∈ [lo, hi]  ⇔  r_ts ∈ [l_ts - hi, l_ts - lo]
              def ivl(ns: Long): String =
                s"interval ${math.abs(ns / 1000000L)} milliseconds"
              val band =
                s"${ra}_ts >= ${la}_ts - ${ivl(hi)} and " +
                  s"${ra}_ts ${if (lo <= 0) "<=" else "<="} ${la}_ts " +
                  s"${if (lo <= 0) "+" else "-"} ${ivl(lo)}"
              val aSide = sideDf(j.left.copy(window = None), la)
              val bSide = sideDf(j.right.copy(window = None), ra)
              // per-direction retention residual when a side is a
              // tumbling chunk: the EARLIER side's rule applies at the
              // later event's arrival (arrival order = (ts_ns,
              // event_id), so every pair belongs to one direction)
              val resid =
                if (!anyTb) ""
                else {
                  Seq((la, aSide), (ra, bSide)).foreach { case (al, df2) =>
                    Seq("ts_ns", "event_id").foreach(c =>
                      if (!df2.columns.contains(s"${al}_$c"))
                        fail(s"timeBatch join sides need '$c' for " +
                          s"arrival order; side '$al' lost it"))
                  }
                  def beforeL(x: String, y: String) =
                    s"(${x}_ts_ns < ${y}_ts_ns or (${x}_ts_ns = " +
                      s"${y}_ts_ns and ${x}_event_id < ${y}_event_id))"
                  def ret(later: String, earlier: String, n2: String,
                      t: Long) =
                    if (isTb(n2))
                      s"(${earlier}_ts_ns div ${t}L) = " +
                        s"(${later}_ts_ns div ${t}L)"
                    else s"${later}_ts_ns - ${earlier}_ts_ns <= ${t}L"
                  val d1 = s"(${beforeL(ra, la)} and " +
                    s"${ret(la, ra, rn, rargs.head)})"
                  val d2 = s"(${beforeL(la, ra)} and " +
                    s"${ret(ra, la, ln, largs.head)})"
                  " and (" +
                    (if (j.unidirectional) d1 else s"$d1 or $d2") + ")"
                }
              val joined = aSide
                .join(bSide, expr(s"($cond) and ($band)$resid"), jType)
              if (ast.rate.nonEmpty && !joinAgg) {
                // output rate limiting OVER the live windowed join: the
                // rated events are the pair EMISSIONS — emission
                // instant greatest(l.ts, r.ts), tie-broken by the side
                // event ids (the batch rateOverJoin's exact order; an
                // OUTER join's null-padded row emits at its preserved
                // side's own arrival instant — greatest skips the null
                // side, ids coalesce to -1, the batch's exact rule).
                // Time modes fold per-interval extreme picks
                // (KeyedState on the interval — chunking-invariant: a
                // row's interval is a function of its own emit ts, so
                // cross-trigger merges commute NO MATTER WHICH trigger
                // materializes it — which is what makes outer rows,
                // materialized only at watermark expiry, safe here);
                // count modes over an INNER join ride the running
                // pair counter (the single-stream count-rate fold
                // shape — pair emission is trigger-monotone under the
                // in-order replay). Count modes over an OUTER join
                // (r12) cannot: a null-pad materializes at watermark
                // expiry, AFTER later-emission pairs were already
                // counted. The emission ORDER itself is still total
                // (emit ts + side ids), so the outer form accumulates
                // emissions with their order key — sink-like append,
                // the same state class as the enrichment __out
                // channel — and applies the every-Nth pick ONCE at
                // finish over the ordered emissions, the batch
                // rateOverJoin's exact rank-and-pick
                // (chunking-invariant by construction).
                val rJ = ast.rate.get
                val itemsJ = itemsOf(ast)
                Seq(la, ra).foreach { al =>
                  Seq("ts_ns", "event_id").foreach(c =>
                    if (!joined.columns.contains(s"${al}_$c"))
                      fail(s"rate over a join needs '$al.$c' to " +
                        "define pair emission order"))
                }
                val emitTs = greatest(col(s"${la}_ts_ns"),
                  col(s"${ra}_ts_ns"))
                val ordJ = struct(emitTs.as("t"),
                  coalesce(col(s"${la}_event_id"), lit(-1L)).as("il"),
                  coalesce(col(s"${ra}_event_id"), lit(-1L)).as("ir"))
                val outColsJ = itemsJ.map(_._2)
                val feedJ = joined.select(itemsJ.map { case (it, a2, _) =>
                  expr(sqlOfWith(it.e, qual)).as(a2) } :+
                  emitTs.as("__emit_ts") :+ ordJ.as("__emit_ord"): _*)
                val ordFin = ast.orderBy.map { case (c2, asc) =>
                  if (asc) col(c2).asc else col(c2).desc }
                val keyJ2 = name.orElse(ast.action.map(_.target))
                carriedNow = Nil
                (rJ.mode, rJ.timeNs, rJ.count) match {
                  case ("all", _, _) => // emission batching only; an
                    // outer join still needs the sentinel Append
                    // channel for its tail null-pads
                    (feedJ.drop("__emit_ts", "__emit_ord"),
                      if (jType == "inner") KStateless else KWindowAgg)
                  case (m @ ("first" | "last"), Some(t), None) =>
                    val withIv = feedJ.withColumn("__iv",
                      expr(s"__emit_ts div ${t}L")).drop("__emit_ts")
                    val schemaR = withIv.schema
                    def pickRow(df2: DataFrame): DataFrame = {
                      val rowS = struct(withIv.columns.map(col): _*)
                      val pick =
                        if (m == "first") min_by(rowS, col("__emit_ord"))
                        else max_by(rowS, col("__emit_ord"))
                      df2.groupBy("__iv").agg(pick.as("__row"))
                        .select(withIv.columns.map(c =>
                          col(s"__row.$c").as(c)): _*)
                    }
                    if (keyJ2.contains(out) || name.contains(out))
                      foldResult = Some(singleFold(withIv, schemaR,
                        (_, _, acc, batch) =>
                          pickRow(acc.unionByName(batch)),
                        (_, acc) => acc.select(outColsJ.map(col): _*),
                        ordFin,
                        KeyedState(Seq("__iv"), (_, _, batch) =>
                          batch.select(col("__iv"))))
                        .copy(needsFlush = jType != "inner"))
                    (emptyOf(joined.sparkSession, schemaR), KFold)
                  case (m @ ("first" | "last"), None, Some(nEv))
                      if jType != "inner" =>
                    // OUTER count mode: rank-and-pick at finish (see
                    // the channel comment above)
                    val schemaC = feedJ.drop("__emit_ts").schema
                    val protoC = feedJ.drop("__emit_ts", "__emit_ord")
                    if (keyJ2.contains(out) || name.contains(out))
                      foldResult = Some(LiveFold(feedJ,
                        Seq(("out", schemaC, AppendState)),
                        (_, _, _, batch) =>
                          Map("out" -> batch.drop("__emit_ts")),
                        (_, st) => {
                          val ranked = globalRank(st("out"),
                            Seq(col("__emit_ord")), "__rn")
                          val kept =
                            if (m == "first")
                              ranked.filter((col("__rn") - 1) % nEv === 0)
                            else ranked.filter(col("__rn") % nEv === 0)
                          kept.orderBy("__rn")
                            .select(outColsJ.map(col): _*)
                        }, ordFin).copy(needsFlush = true))
                    (emptyOf(joined.sparkSession, protoC.schema), KFold)
                  case (m @ ("first" | "last"), None, Some(nEv)) =>
                    val rankedSchema = StructType(feedJ
                      .drop("__emit_ts", "__emit_ord").schema.fields :+
                      StructField("__rn", LongType))
                    if (keyJ2.contains(out) || name.contains(out))
                      foldResult = Some(LiveFold(feedJ,
                        Seq(("out", rankedSchema, AppendState),
                          ("pend", rankedSchema, FullState)),
                        (_, _, st, batch0) => {
                          val prior = st("pend").slice.collect()
                            .headOption.map(_.getAs[Long]("__rn"))
                            .getOrElse(0L)
                          val batch = batch0.withColumn("__rn",
                            expr("row_number() over (order by " +
                              "__emit_ord)") + lit(prior))
                            .drop("__emit_ts", "__emit_ord")
                          val kept =
                            if (m == "first")
                              batch.filter((col("__rn") - 1) % nEv === 0)
                            else batch.filter(col("__rn") % nEv === 0)
                          Map("out" -> kept,
                            "pend" -> batch.orderBy(col("__rn").desc)
                              .limit(1).unionByName(
                                st("pend").slice.limit(1))
                              .orderBy(col("__rn").desc).limit(1))
                        },
                        (_, st) => {
                          val total = st("pend").collect()
                            .headOption.map(_.getAs[Long]("__rn"))
                            .getOrElse(0L)
                          val fin =
                            if (m == "last" && total % nEv != 0)
                              st("out").unionByName(st("pend"))
                            else st("out")
                          fin.orderBy("__rn").drop("__rn")
                        }, ordFin))
                    (emptyOf(joined.sparkSession, rankedSchema), KFold)
                  case ("snapshot", _, _) =>
                    fail("output snapshot over a join (v1): insert the " +
                      "join into a stream and snapshot that stream — a " +
                      "snapshot of pair state has no single emission row")
                  case _ =>
                    fail("unreachable: rate clause validated at parse")
                }
              } else if (joinAgg) {
                if (ast.rate.nonEmpty)
                  fail("live rate limiting above a join aggregation is " +
                    "not deployed (v1) — rate the join, aggregate in a " +
                    "downstream stage")
                // ONE-STAGE windowed-join aggregation: `join … select
                // agg(...) group by …` compiles to the watermarked
                // interval join feeding a per-micro-batch ALGEBRAIC
                // keyed fold (FoldAlg algebra partials merged
                // componentwise across triggers — state is one
                // component row per group, per-trigger write cost
                // O(batch-touched buckets)). The batch twin is the
                // global aggregation over all band pairs, so the fold
                // equals batch replay under any chunking. Spark itself
                // cannot chain an unwindowed Update-mode aggregation
                // above a stream-stream join, which is exactly why
                // this runs through the fold channel; a time-windowed
                // aggregation above a join stays the chained
                // stateful-operator form (insert into a named stream,
                // then #window.timeBatch it).
                // OUTER joins fold too (r11): the keyed algebraic
                // merge is arrival-agnostic, so a null-padded row
                // materializing at watermark expiry folds into its
                // group whenever its trigger carries it — the runner's
                // flush-sentinel batches (needsFlush) make the tail's
                // pads materialize before finish, and null group keys
                // merge via the null-safe key equality below
                // having/limit/offset apply ONCE at finish over the
                // finalized groups (alias refs, like the batch
                // compile); limit/offset compose with the runner's
                // finish ordering — see [[LiveFold.limit]]
                val items = itemsOf(ast)
                val keyItems = items.filter(!_._3)
                val keyAliases = keyItems.map(_._2)
                if (ast.groupBy.sorted != keyAliases.sorted.toList)
                  fail("live join aggregation (v1) groups by exactly " +
                    "the aliases of its non-aggregate select items " +
                    s"(non-aggregate [${keyAliases.mkString(", ")}], " +
                    s"group by [${ast.groupBy.mkString(", ")}])")
                // (component name, agg fn, argument) per aggregate
                // sub-call; the select item's scalar wrapper is
                // re-evaluated at finish over the merged components
                val comps = scala.collection.mutable.Buffer
                  .empty[(String, String, Option[Expr])]
                def rw(e: Expr): Expr = e match {
                  case Call(None, n, args0)
                      if aggNames(n.toLowerCase) =>
                    val base = s"__g${comps.length}"
                    comps += ((base, n.toLowerCase, args0.headOption))
                    FoldAlg.rewrite(n.toLowerCase, base)
                  case Call(ns2, n, as2) => Call(ns2, n, as2.map(rw))
                  case Bin(op, l2, r2) => Bin(op, rw(l2), rw(r2))
                  case Not(x) => Not(rw(x))
                  case Neg(x) => Neg(rw(x))
                  case other2 => other2
                }
                val finals: Seq[(String, Expr)] = items.map {
                  case (it, a2, isAgg) =>
                    a2 -> (if (isAgg) rw(it.e) else Ref(List(a2)))
                }
                comps.foreach { case (_, n, argO) =>
                  if (n != "count" && argO.isEmpty)
                    fail(s"$n(...) needs an argument")
                }
                // a group-by-less aggregate folds under one constant
                // key (single component row of state)
                val keys =
                  if (keyAliases.isEmpty) Seq("__k") else keyAliases
                val feed0 = joined.select(keyItems.map {
                  case (it, a2, _) =>
                    expr(sqlOfWith(it.e, qual)).as(a2) } ++
                  comps.toSeq.flatMap { case (base, _, argO) =>
                    argO.map(arg => expr(sqlOfWith(arg, qual))
                      .as(s"${base}_x")).toSeq }: _*)
                val feed = if (keyAliases.isEmpty)
                  feed0.withColumn("__k", lit(0L)) else feed0
                def partialOf(df: DataFrame): DataFrame = {
                  val aggs: Seq[Column] = comps.toSeq.flatMap {
                    case (base, n, argO) =>
                      FoldAlg.partialCols(n, base,
                        argO.map(_ => col(s"${base}_x")))
                  }
                  df.groupBy(keys.map(col): _*)
                    .agg(aggs.head, aggs.tail: _*)
                }
                def mergeComp(base: String, n: String): Seq[Column] =
                  FoldAlg.mergeCols(n, base)
                val schemaJ = partialOf(feed).schema
                val keyJ = name.orElse(ast.action.map(_.target))
                if (keyJ.contains(out) || name.contains(out))
                  foldResult = Some(singleFold(feed, schemaJ,
                    (_, _, acc, batch) => {
                      val u = partialOf(batch)
                      // <=> so a null group key merges with itself
                      // across triggers instead of spawning a fresh
                      // null-key group per batch
                      acc.as("t").join(u.as("u"),
                          keys.map(k =>
                            col(s"t.$k") <=> col(s"u.$k"))
                            .reduce(_ && _), "full_outer")
                        .select(keys.map(k => coalesce(col(s"u.$k"),
                            col(s"t.$k")).as(k)) ++
                          comps.toSeq.flatMap { case (b2, n, _) =>
                            mergeComp(b2, n) }: _*)
                    },
                    (_, acc) => {
                      val fin = acc.select(finals.map {
                        case (a2, e2) => expr(sqlOf(e2)).as(a2) }: _*)
                      ast.having.fold(fin)(h =>
                        fin.where(expr(sqlOf(h))))
                    },
                    ast.orderBy.map { case (c2, asc) =>
                      if (asc) col(c2).asc else col(c2).desc },
                    KeyedState(keys, (_, _, batch) =>
                      batch.select(keys.map(col): _*)),
                    ast.limit, ast.offset)
                    .copy(needsFlush = jType != "inner"))
                carriedNow = Nil
                (emptyOf(joined.sparkSession, schemaJ), KFold)
              } else {
              // carry the non-nullable side's watermarked event-time
              // columns through the projection (dropped again if this
              // join is the sink) so a downstream Append-mode window
              // stage can bucket and evict by them — Spark's chained
              // stateful-operator path (interval join → time-window
              // aggregation); the alias metadata keeps the watermark
              // tag. full outer has no never-null side, so nothing
              // carries (a downstream window stage diagnoses the
              // missing 'ts' itself).
              val carrySide = jType match {
                case "inner" | "left_outer" => Some(la)
                case "right_outer" => Some(ra)
                case _ => None
              }
              val aliases = itemsOf(ast).map(_._2).toSet
              val carry = carrySide.fold(Seq.empty[String])(s0 =>
                Seq("ts", "ts_ns").filter(c =>
                  joined.columns.contains(s"${s0}_$c") &&
                    !aliases.contains(c)))
              carriedNow = carry
              (joined.select(itemsOf(ast).map { case (it, a2, _) =>
                expr(sqlOfWith(it.e, qual)).as(a2) } ++
                carry.map(c =>
                  col(s"${carrySide.get}_$c").as(c)): _*),
                if (jType == "inner") KStateless else KWindowAgg)
              }
            case _ => fail("live deployment joins need #window.time(T) " +
              "or #window.timeBatch(T) on both sides (the watermarked " +
              "stream-stream join); count-window join sides need the " +
              "global arrival rank and are batch-replay surfaces (v1)")
          }
        }
        val key = name.orElse(ast.action.map(_.target))
        ast.action.foreach {
          case InsertInto(t) =>
            if (kind != KStateless) statefulStreams += t
            // only genuinely chunking-invariant stages are
            // batch-re-derivable (plain filter/projection): windowed,
            // rate-limited, joined, and fMGWS stages all carry state
            // across triggers, so re-deriving them per BATCH would
            // diverge from their streaming semantics — a fold feed
            // through one is diagnosed instead
            else if (partKey.isEmpty && ast.rate.isEmpty &&
                (ast.stream match {
                  case ss: SingleStream => ss.window.isEmpty
                  case _ => false
                }))
              statelessAsts :+= (t -> ast)
            // multi-writer fan-in: union, as in compileApp — but an
            // aggregated writer cannot merge with another stream
            // mid-topology
            env += t -> (env.get(t) match {
              case Some(prev) =>
                if (kind != KStateless || statefulStreams.contains(t))
                  fail(s"live deployment (v1): multi-writer stream '$t' " +
                    "cannot take an aggregated writer")
                if (prev.columns.toSet != df.columns.toSet)
                  fail(s"queries inserting into '$t' disagree on its " +
                    s"schema: [${prev.columns.mkString(", ")}] vs " +
                    s"[${df.columns.mkString(", ")}]")
                prev.unionByName(df)
              case None => df
            })
          case a => fail(s"live deployment (v1) cannot run table DML " +
            s"('${a.target}') — deploy onto the engine's upsert sink")
        }
        val ordCols = ast.orderBy.map { case (c, asc) =>
          if (asc) col(c).asc else col(c).desc }
        if (kind != KFold && (key.contains(out) || name.contains(out)))
          // the sink never shows the carried event-time helper columns
          result = Some((
            if (carriedNow.nonEmpty) df.drop(carriedNow: _*) else df,
            kind, ordCols))
        } // end non-DML stage
    }
    scriptFns = Map.empty // live apps carry their own defines
    val liveStmts = splitStatements(app)
    // @OnError(action='STREAM') deploys LIVE too: the fault/clean
    // split is a stateless pair of filters over the watermarked
    // source, so it composes onto the incremental plan exactly as it
    // does onto the batch replay (onErrorSplit) — `!S` and S's clean
    // view go into the read environment before any stage compiles
    liveStmts.collect { case (_, b, true) =>
      val p0 = new P(lex(b))
      p0.eatKw("define")
      if (!p0.tryKw("stream"))
        fail("@OnError annotates a `define stream` (v1)")
      p0.ident()
    }.foreach { sN =>
      val baseDf = envLookup(env, sN).getOrElse(fail("@OnError live deployment " +
        s"annotates the source stream; '$sN' is not declared"))
      val (fault, clean) = onErrorSplit(baseDf, liveStmts, sN)
      env += ("!" + sN) -> fault
      env += sN -> clean
    }
    liveStmts.foreach { case (name, body, _) =>
      val head = body.split("\\s+", 2).headOption.getOrElse("")
      if (head.equalsIgnoreCase("define")) {
        // stream schemas come from the source; function defines compile
        // (they inline into the incremental plan like any expression);
        // table defines declare the mutable state live DML targets
        val defKind = body.split("\\s+", 3).lift(1).map(_.toLowerCase)
        if (defKind.contains("function")) registerScriptFn(body)
        else if (defKind.contains("table"))
          parseTableDef(body).foreach { case (t, sch) =>
            tableDefs += t -> sch }
        else if (defKind.contains("window")) {
          // `define window W (cols) spec` deployed LIVE: readers
          // compile as fed-stream#spec, exactly like the batch replay
          // — silently reading W as a plain stream would miscompile
          val p2 = new P(lex(body))
          p2.eatKw("define"); p2.eatKw("window")
          val wname = p2.ident()
          p2.eatSym("(")
          var done2 = false
          while (!done2) { p2.ident(); p2.ident()
            if (!p2.trySym(",")) { p2.eatSym(")"); done2 = true } }
          liveWindowDefs += wname -> p2.windowNameArgs()
        }
        else if (defKind.contains("aggregation")) {
          // `define aggregation` deployed LIVE: the grain cascade's
          // finest-grain partial table becomes keyed fold state (see
          // the aggregation-read case in runStage)
          val p2 = new P(lex(body))
          p2.eatKw("define"); p2.eatKw("aggregation")
          val (aname, adef) = parseAggDefRest(p2)
          if (!adef.source.equalsIgnoreCase("events"))
            fail("a live `define aggregation` (v1) aggregates the " +
              s"source stream 'events'; got '${adef.source}'")
          liveAggDefs += aname -> adef
        }
        else if (defKind.contains("trigger")) {
          // `define trigger T at every <iv>` deployed LIVE: the replay
          // twin of a rate source — tick generation is driven by the
          // STREAM'S event-time span, tracked incrementally in fold
          // state (see the trigger-read case in runStage); a real
          // deployment points the same read at a wall-clock rate
          // source (engine twin: Ops.triggerGapfill)
          val p2 = new P(lex(body))
          p2.eatKw("define"); p2.eatKw("trigger")
          val tname = p2.ident()
          p2.eatKw("at"); p2.eatKw("every")
          liveTriggerDefs += tname -> p2.duration()
        }
      }
      else if (head.equalsIgnoreCase("partition")) {
        // partition with (<spec> of S) begin ... end deployed LIVE:
        // Spark's shuffle IS the partition (the batch compile's
        // property holds unchanged on the incremental plan) — the key
        // prepends to every inner grouping, so the reference's per-key
        // query instances become ONE keyed streaming plan, per-key
        // parallel at any executor count
        val (innerBody, keyAttr, ranges, srcName) = parsePartition(body)
        if (statefulStreams.contains(srcName))
          fail(s"live deployment (v1): '$srcName' is an aggregation " +
            "output — it cannot feed a partition block")
        val baseDf = envLookup(env, srcName).getOrElse(fail("live deployment " +
          s"reads declared streams; '$srcName' is neither the source " +
          "nor an earlier insert-into target"))
        val (partKey, view) = keyAttr match {
          case Some(attr) =>
            if (!baseDf.columns.contains(attr))
              fail(s"partition attribute '$attr' is not a column of " +
                s"'$srcName'")
            (attr, baseDf)
          case None =>
            // first matching range labels the event; unmatched events
            // leave the partition. The OR keeps the label filter above
            // the source watermark node so flush sentinels (which may
            // match no range) still advance the watermark.
            val keyCol = ranges.tail.foldLeft(
              when(expr(sqlOf(ranges.head._1)), lit(ranges.head._2))) {
              case (acc, (c, l)) => acc.when(expr(sqlOf(c)), lit(l))
            }
            ("partition_key",
              baseDf.withColumn("partition_key", keyCol)
                .where(col("partition_key").isNotNull ||
                  col("ts") >= Streaming.flushCutoff))
        }
        innerBody.split(";").map(_.trim).filter(_.nonEmpty)
          .flatMap(stripAnnotations).foreach { case (qName, qBody, _) =>
          val ast0 = new P(lex(qBody)).query()
          val dmlAct0 = ast0.action.filter {
            case InsertInto(t2) => tableDefs.contains(t2)
            case _              => true
          }
          if (dmlAct0.nonEmpty) {
            // table DML hoists to top-level writer AST(s) — the batch
            // compiler's r14 rewrite verbatim (see the partition arm
            // in SiddhiQlCompiler for the four-case derivation):
            // keyed per-event verbatim, keyed windowed with the key
            // prepended to group by, range per-event with the OR of
            // range conditions folded into the filter, range windowed
            // as one first-match-filtered writer per label (>1 label
            // then hits the live multi-writer windowed bound, which
            // names itself). The hoisted stages re-enter runStage
            // partKey-less over the GLOBAL env: the rewritten AST
            // carries the partition's whole semantics, so enrichment
            // reads and live folds recompile it correctly everywhere.
            val ss0 = ast0.stream match {
              case ss: SingleStream =>
                if (!ss.table.equalsIgnoreCase(srcName))
                  fail("partitioned queries read the partitioned " +
                    s"stream '$srcName' (v1)")
                ss
              case _ => fail("partition blocks hold single-stream " +
                "queries (v1; joins/patterns stay outside)")
            }
            val winOrAgg = ss0.window.nonEmpty ||
              ast0.select.exists(it => containsAgg(it.e)) ||
              ast0.groupBy.nonEmpty
            def andF(f: Option[Expr], c: Expr): Option[Expr] =
              Some(f.fold(c)(f0 => Bin("and", c, f0)))
            keyAttr match {
              case Some(k) =>
                val ast1 =
                  if (winOrAgg && !ast0.groupBy.contains(k))
                    ast0.copy(groupBy = k :: ast0.groupBy)
                  else ast0
                runStage(qName, ast1, env, None)
              case None =>
                val conds = ranges.map(_._1)
                if (!winOrAgg)
                  runStage(qName, ast0.copy(stream = ss0.copy(
                    filter = andF(ss0.filter,
                      conds.reduce((a, b) => Bin("or", a, b))))),
                    env, None)
                else conds.zipWithIndex.foreach { case (c, idx) =>
                  val firstM =
                    if (idx == 0) c
                    else Bin("and", c, Not(conds.take(idx)
                      .reduce((a, b) => Bin("or", a, b))))
                  runStage(
                    if (idx == 0) qName else qName.map(_ + s"__r$idx"),
                    ast0.copy(stream =
                      ss0.copy(filter = andF(ss0.filter, firstM))),
                    env, None)
                }
            }
          } else {
          val ast = ast0.stream match {
            case ss: SingleStream if ss.table.equalsIgnoreCase(srcName) =>
              val needsKey = (ss.window.nonEmpty ||
                ast0.select.exists(it => containsAgg(it.e))) &&
                !ast0.groupBy.contains(partKey)
              if (needsKey) ast0.copy(groupBy = partKey :: ast0.groupBy)
              else ast0
            case _: SingleStream => fail("partitioned queries read the " +
              s"partitioned stream '$srcName' (v1)")
            case _ => fail("partition blocks hold single-stream queries " +
              "(v1; joins/patterns stay outside)")
          }
          runStage(qName, ast, env + (srcName -> view), Some(partKey))
          }
        }
      }
      else if (head.equalsIgnoreCase("from"))
        runStage(name, new P(lex(body)).query(), env, None)
      else if (head.equalsIgnoreCase("update") ||
               head.equalsIgnoreCase("delete"))
        // the on-demand store mutations (batch surface, r16)
        fail("on-demand DML is point-in-time by definition — it has " +
          "no stream to trigger it live; run it on the batch surface " +
          "(compileApp) against the replayed state")
      else fail(s"live deployment cannot run: '${body.take(40)}...'")
    }
    (result, foldResult)
  }

  /** Harness-side deployment: feed the events table through a
    * MemoryStream in `chunks` micro-batches, run the deployed topology to
    * completion on a memory sink, return the final (ordered) table —
    * the live twin the batch-replay oracle checks.
    *
    * `graft.live.fastGates` (set by [[graft.Bench]] only — Verify and
    * `sbt test` keep the full replay) caps the replay at 2
    * micro-batches: every live channel is chunking-invariant by
    * spec-pinned contract, so the RESULT is identical and only the
    * fixed per-trigger machinery cost (checkpoint round trips, state
    * generations) halves — the suite-cost lever the r11 verdict asked
    * for, with zero correctness surface change. Two chunks, not one,
    * so every cross-trigger state merge stays exercised even in the
    * fast profile. */
  def deployApp(spark: SparkSession, dir: String, app: String, out: String,
                chunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val chunksEff =
      if (spark.conf.getOption("graft.live.fastGates").contains("true"))
        math.min(chunks, 2)
      else chunks
    val rows = graft.engine.Streaming.feedRows(spark, dir)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Cep.Ev]
    val src = ms.toDF()
      .select(col("eventId").as("event_id"), col("tsNs").as("ts_ns"),
        col("userId").as("user_id"), col("eventType").as("event_type"),
        col("value"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val (stages, dmlOpt) = phased("compile")(deployStages(src, app, out))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // replay-harness shuffle width: 4 keeps per-trigger checkpoint-file
    // overhead low for the (majority) light topologies; a validated
    // knob so state-heavy topologies can widen it — state-store work
    // parallelizes per shuffle partition, so a stream-stream join's
    // per-trigger job time scales down with width (r14 A/B in
    // PLANS.md). A real deployment sizes this to its cluster.
    val livePartitions = spark.conf
      .getOption("graft.live.shufflePartitions").getOrElse("4")
    require(scala.util.Try(livePartitions.toInt).toOption
        .exists(_ > 0), "graft.live.shufflePartitions must be a " +
        s"positive integer; got '$livePartitions'")
    spark.conf.set("spark.sql.shuffle.partitions", livePartitions)
    // Replay-loop AQE default: OFF (r17). Every per-trigger job here
    // (probe collects, keyed-state reads, fold writes) runs over a few
    // KB-to-MB of state/batch data, where AQE's one-job-per-query-stage
    // materialization only multiplies driver scheduling round trips —
    // re-measured after the r17 batch-persist change: interleaved A/B
    // over 8 fold gates, AQE-off won 7/8 by 5-30% (the r14 A/B that
    // called it neutral predates the persist, when re-executed feed
    // plans dominated). `graft.live.aqe=true` restores adaptive
    // planning — a REAL deployment with non-toy per-trigger volumes
    // wants it for adaptive broadcast/skew handling on the fold joins.
    val prevAqe = spark.conf
      .getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled",
      spark.conf.getOption("graft.live.aqe").getOrElse("false"))
    // the flush design is DATA-batch driven (sentinels advance the
    // watermark, the batch after them emits under it), so Spark's
    // extra no-data micro-batch per watermark advance only doubles the
    // per-trigger checkpoint cost of a finite replay — a long-running
    // deployment would leave it on for idle-stream timer progress
    val prevNd = spark.conf
      .getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      "false")
    // NOTE (r18): an attempt to pack tiny state-generation files into
    // fewer scan tasks via scoped openCostInBytes=0 + minPartitionNum=1
    // was MEASURED AND REVERTED — it also collapses the event-log
    // table loads (loadTable parquet scans inside enrich folds) into
    // one serial task, regressing the elog gates 2-3× (A/B in
    // OPTIMIZATION_r18.md). The tiny-file fan-out is addressed by the
    // stateBuckets default below instead.
    // HARNESS scratch: streaming checkpoints (offsets/commits/state
    // deltas, fsync'd once per trigger) go to RAM-backed storage when
    // the platform offers it — the replay loop's bottleneck is the
    // per-trigger checkpoint round trip, not operator work, and a
    // REAL deployment points this at durable storage instead
    val ckptRoot = java.nio.file.Paths.get(
      graft.engine.Streaming.scratchDir("graft_ckpt"))
    def ckpt(tag: String): String = s"$ckptRoot/$tag"
    try {
      val per = math.max(rows.length / chunksEff, 1)
      dmlOpt match {
        case Some(lf) =>
          // folded stage LIVE (table DML / unique:last / sort /
          // frequent / enrichment): every micro-batch folds into the
          // accumulated state — parquet generations materialize it
          // between triggers (engine twin: Streaming.tableUpsert), so
          // lineage stays one-batch deep and a restart resumes from
          // the last generations. Generations are written at each
          // state's [[StateMode]] granularity: KEYED states are
          // hash-bucketed and only the buckets the batch touches are
          // read into the fold and rewritten (per-trigger write cost
          // O(batch-touched buckets), not O(state)); APPEND states
          // write the batch delta only; FULL states (tiny by
          // contract) rewrite whole.
          val tmp = graft.engine.Streaming.scratchDir("graft_live_fold")
          // default bucket count 4 (r18; was 16): per-trigger cost has a
          // component per touched bucket (scan splits, write tasks, one
          // file per bucket per generation), and at replay granularity
          // 16 buckets is pure fan-out waste — measured ~300-800 ms of
          // 16-task stages per write job. Results are bucketing-invariant
          // (internal layout only; oracle-pinned). A real deployment
          // sizes `graft.live.stateBuckets` to its key domain (the
          // per-trigger write cost O(touched buckets) contract needs
          // bucket count >> concurrent hot keys at 100 TB).
          val nBuckets = spark.conf.getOption("graft.live.stateBuckets")
            .map(_.toInt).getOrElse(4)
          var gen = 0
          // (state, bucket) -> generation holding that bucket's latest
          // rows; bucket -1 = the whole state (FullState). AppendState
          // keeps every generation that wrote a delta.
          val latest = scala.collection.mutable.Map.empty[(String, Int),
            Int]
          val appendGens = scala.collection.mutable.Map
            .empty[String, List[Int]].withDefaultValue(Nil)
          val schemaOf = lf.schemas.map { case (n, s2, _) => n -> s2 }
            .toMap
          def path(n: String, g: Int, b: Int): String =
            s"$tmp/gen$g/$n" + (if (b >= 0) s"/__b=$b" else "")
          def hasFiles(p: String): Boolean = {
            val f = new java.io.File(p)
            f.exists && f.listFiles != null &&
              f.listFiles.exists(_.getName.endsWith(".parquet"))
          }
          def bucketCol(keys: Seq[String]): Column = {
            val h = hash(keys.map(col): _*)
            (h % nBuckets + lit(nBuckets)) % nBuckets
          }
          def readPaths(sp: SparkSession, n: String, ps: Seq[String])
              : DataFrame = {
            val live = ps.filter(hasFiles)
            if (live.isEmpty) emptyOf(sp, schemaOf(n))
            else sp.read.schema(schemaOf(n)).parquet(live: _*)
          }
          def fullState(sp: SparkSession, n: String, m: StateMode)
              : DataFrame = m match {
            case FullState => readPaths(sp, n,
              latest.get((n, -1)).map(g => path(n, g, -1)).toSeq)
            case AppendState => readPaths(sp, n,
              appendGens(n).map(g => path(n, g, -1)))
            case _: KeyedState => readPaths(sp, n,
              (0 until nBuckets).flatMap(b =>
                latest.get((n, b)).map(g => path(n, g, b))))
          }
          def allStates(sp: SparkSession): Map[String, DataFrame] =
            lf.schemas.map { case (n, _, m) =>
              n -> fullState(sp, n, m) }.toMap
          // decided ONCE per deployment from the feed's logical plan:
          // a feed carrying a join / aggregation / window / stateful
          // map is expensive enough that each trigger caches its batch
          // (see the persist note inside the foreachBatch below)
          val cacheFeed = {
            import org.apache.spark.sql.catalyst.plans.logical._
            lf.feed.queryExecution.logical.collectFirst {
              case _: Join => (); case _: Aggregate => ()
              case _: Window => (); case _: FlatMapGroupsWithState => ()
            }.nonEmpty
          }
          val q = phased("start")(lf.feed.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt("fold"))
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val sp = batch.sparkSession
              // persist the trigger's batch ONCE when the feed plan is
              // worth not re-running: every consumer below — the
              // per-state bucket probes, keyedRead, the fold, and each
              // state's write — otherwise RE-EXECUTES the whole
              // micro-batch plan per action, the documented foreachBatch
              // hazard the kind-4 update sink already guards against
              // (ProfGate r17: probe:state ≈ write:state ≈ 0.6 s EACH on
              // the stream-stream-join topologies = one full plan
              // execution per job). Feeds that are a bare projection of
              // the MemoryStream batch are cheaper to re-run than to
              // cache, so only stateful/join/window feeds persist.
              if (cacheFeed) batch.persist()
              try {
              // buckets each keyed state's merge can touch — from the
              // batch's key values, before the fold reads any state; a
              // compaction generation (compactEvery) touches ALL
              // buckets so the fold may rewrite the state whole
              // the per-state probes are independent tiny Spark jobs;
              // running them concurrently overlaps their scheduling
              // latency (the fold trigger's cost is many ~100 ms jobs,
              // not data) — each closure re-pins scriptFns on its own
              // thread, and the session is shared safely
              val touched: Map[String, Seq[Int]] =
                scala.concurrent.Await.result(
                  scala.concurrent.Future.sequence(
                    lf.schemas.collect {
                      case (n, _, KeyedState(keys, batchKeys, ce)) =>
                        scala.concurrent.Future {
                          n -> (if (ce.exists(e => (gen + 1) % e == 0))
                              (0 until nBuckets): Seq[Int]
                            else if (!latest.keysIterator.exists(
                                _._1 == n))
                              // no generation of this state exists yet
                              // (every first trigger): there is nothing
                              // to read whatever the batch's keys are,
                              // and the write side lays files out by
                              // partitionBy(__b) regardless — so skip
                              // the probe JOB entirely and claim all
                              // buckets (readPaths/hasFiles filter the
                              // never-written ones on later reads)
                              (0 until nBuckets): Seq[Int]
                            else tagged(sp, s"probe:$n")(
                              distinctIntsLocal(
                                batchKeys(sp, dir, batch)
                                  .select(bucketCol(keys).cast("int")
                                    .as("__b")))))
                        }(foldEc)
                    })(
                      scala.collection.BuildFrom.buildFromIterableOps,
                      foldEc),
                  // bounded like the write phase: probes are tiny
                  // collects; a wedged one fails the trigger loudly
                  scala.concurrent.duration.Duration(30,
                    java.util.concurrent.TimeUnit.MINUTES)).toMap
              val compactingNow: Set[String] = lf.schemas.collect {
                case (n, _, KeyedState(_, _, Some(e)))
                    if (gen + 1) % e == 0 => n
              }.toSet
              val states = lf.schemas.map { case (n, sch, m) =>
                n -> LiveState(
                  m match {
                    case FullState => fullState(sp, n, m)
                    case AppendState => emptyOf(sp, sch)
                    case _: KeyedState => readPaths(sp, n,
                      touched(n).flatMap(b =>
                        latest.get((n, b)).map(g => path(n, g, b))))
                  },
                  () => {
                    val f = fullState(sp, n, m)
                    foldReadProbe.foreach(_ += ((gen + 1, n, f.count())))
                    f
                  },
                  compacting = compactingNow(n),
                  fullForKeys = m match {
                    case KeyedState(ks, _, _) => Some((kdf: DataFrame) =>
                      // bucket-restricted read: the key values hash
                      // with the SAME bucketCol the write path
                      // partitions on, so only their buckets' latest
                      // generations are scanned — O(batch key-buckets)
                      // file I/O per trigger, not O(state). Guard: a
                      // caller whose key relation doesn't cover the
                      // state keys by name gets the full read — and
                      // RECORDS it (an unexpected full read must show
                      // in the read-prune gate, not pass silently).
                      if (!ks.forall(kdf.columns.contains)) {
                        foldReadProbe.foreach(
                          _ += ((gen + 1, s"__fullread_fallback:$n",
                            -1L)))
                        (fullState(sp, n, m), kdf)
                      } else if (!latest.keysIterator.exists(
                          _._1 == n)) {
                        // no generation of this state yet (every first
                        // trigger): the pruned read is empty whatever
                        // the keys are — skip the keyread job
                        (readPaths(sp, n, Nil), kdf)
                      } else {
                        // ONE job: distinct keys + their bucket. Small
                        // key sets (every harness batch; bounded by
                        // keyLocalCap at scale) come back as a
                        // LocalRelation so the caller's semi-join
                        // re-evaluates nothing; bigger batches fall
                        // back to bucket ids only + the original
                        // relation (driver stays O(cap)).
                        // r18: partition-LOCAL distinct (capped per
                        // partition at keyLocalCap+1) + driver distinct
                        // — drops the `.distinct()` Exchange, making
                        // this a one-STAGE job. A partition whose local
                        // distinct exceeds the cap implies the global
                        // distinct does too, so the over-cap fallback
                        // decision below is unchanged.
                        val kCols = kdf.columns.toSeq
                        val rows = tagged(sp, s"keyread:$n")(kdf
                          .select(kCols.map(col) :+
                            bucketCol(ks).cast("int").as("__b"): _*)
                          .rdd.mapPartitions { it =>
                            val seen = scala.collection.mutable
                              .LinkedHashSet
                              .empty[org.apache.spark.sql.Row]
                            while (it.hasNext &&
                                seen.size <= keyLocalCap)
                              seen += it.next()
                            seen.iterator
                          }.collect().distinct)
                        // over-cap: RECORD the fallback (r15 — the
                        // scale path must show in the probe, so a
                        // rehearsal can assert it actually fired)
                        if (rows.length > keyLocalCap)
                          foldReadProbe.foreach(
                            _ += ((gen + 1, s"__keycap_fallback:$n",
                              rows.length.toLong)))
                        val bs =
                          if (rows.length > keyLocalCap)
                            tagged(sp, s"keyread2:$n")(
                              distinctIntsLocal(kdf
                                .select(bucketCol(ks).cast("int")
                                  .as("__b"))))
                          else rows.map(_.getAs[Int]("__b"))
                            .distinct.toSeq
                        val kdfEff =
                          if (rows.length > keyLocalCap) kdf
                          else sp.createDataFrame(
                            java.util.Arrays.asList(rows.map(r =>
                              org.apache.spark.sql.Row.fromSeq(
                                r.toSeq.dropRight(1))): _*),
                            StructType(kdf.schema.fields))
                        (readPaths(sp, n, bs.flatMap(b =>
                          latest.get((n, b)).map(g => path(n, g, b)))),
                          kdfEff)
                      })
                    case _ => None
                  })
              }.toMap
              val next = lf.fold(sp, dir, states, batch)
              val g1 = gen + 1
              // state writes run CONCURRENTLY (independent parquet
              // jobs — overlapping them hides per-job scheduling
              // latency); bookkeeping thunks apply sequentially after,
              // so `latest`/`appendGens` stay driver-thread-only
              val bookkeeping: Seq[() => Unit] =
                try scala.concurrent.Await.result(
                  scala.concurrent.Future.sequence(
                    lf.schemas.map { case (n, _, m) =>
                      scala.concurrent.Future[() => Unit] { m match {
                        case FullState =>
                          tagged(sp, s"write:$n")(
                            next(n).write.mode("overwrite")
                              .parquet(path(n, g1, -1)))
                          () => latest((n, -1)) = g1
                        case AppendState =>
                          tagged(sp, s"write:$n")(
                            next(n).write.mode("overwrite")
                              .parquet(path(n, g1, -1)))
                          () => appendGens(n) = appendGens(n) :+ g1
                        case KeyedState(keys, _, _) =>
                          // the fold is a per-key merge, so its output
                          // holds exactly the touched buckets' new
                          // content; untouched buckets keep their prior
                          // generation untouched — and an untouched
                          // STATE (a compacted base between
                          // compactions) skips its write entirely
                          if (touched(n).nonEmpty) {
                            tagged(sp, s"write:$n")(
                              next(n).withColumn("__b", bucketCol(keys))
                                .repartition(
                                  math.max(touched(n).size, 1),
                                  col("__b"))
                                .write.mode("overwrite")
                                .partitionBy("__b")
                                .parquet(s"$tmp/gen$g1/$n"))
                            // probe appends cross future threads —
                            // synchronize the buffer (test-only path)
                            foldWriteProbe.foreach { b =>
                              val c = next(n).count()
                              b.synchronized { b += ((g1, n, c)) }
                            }
                            () => touched(n)
                              .foreach(b => latest((n, b)) = g1)
                          } else () => ()
                      } }(foldEc)
                    })(
                      scala.collection.BuildFrom.buildFromIterableOps,
                      foldEc),
                  // bounded: a wedged write job must fail the trigger,
                  // not hang it forever (generous — harness triggers
                  // are seconds; scale writes are minutes)
                  scala.concurrent.duration.Duration(30,
                    java.util.concurrent.TimeUnit.MINUTES))
                catch { case e: Throwable =>
                  // one failed/timed-out write discards the deferred
                  // bookkeeping of siblings that already wrote: state
                  // stays consistent (`latest` never advanced), but
                  // their gen$g1 files would leak in scratch — remove
                  // the whole generation before rethrowing
                  scala.util.Try {
                    import scala.reflect.io.Directory
                    new Directory(new java.io.File(s"$tmp/gen${g1}"))
                      .deleteRecursively()
                  }
                  throw e
                }
              bookkeeping.foreach(_.apply())
              gen = g1
              } finally { if (cacheFeed) batch.unpersist(); () }
            }.start())
          rows.grouped(per).foreach { g =>
            phased("trigger") {
              ms.addData(g.toSeq); q.processAllAvailable()
            }
          }
          if (lf.needsFlush) (0 to 1).foreach { k =>
            // outer-join feeds: two watermark-flush sentinel batches
            // (the stages channel's exact rule) so the tail's
            // null-padded rows materialize before finish
            phased("flush") {
              ms.addData(Seq(Cep.Ev(Long.MaxValue - 2 + k,
                graft.engine.Streaming.FlushNs + k * 3600000000000L,
                -1L, "__flush", 0.0)))
              q.processAllAvailable()
            }
          }
          phased("stop")(q.stop())
          val fin = lf.finish(spark, allStates(spark))
          val ord =
            if (lf.ordCols.nonEmpty) fin.orderBy(lf.ordCols: _*) else fin
          // Siddhi limit/offset: offset skips M ordered rows, limit
          // caps what follows (the batch compile's composition order)
          val off = lf.offset.fold(ord)(m => ord.offset(m.toInt))
          lf.limit.fold(off)(n => off.limit(n.toInt))
        case None =>
          val (df, kind, ordCols) = stages.getOrElse(
            fail(s"app has no query named or inserting into '$out'"))
          if (kind == 4) {
            // UPDATE-mode global aggregation: the stream emits only
            // the groups each trigger changed; the keyed upsert sink
            // (last write per __ukey wins) is the SAME hash-bucketed
            // parquet-generation store the fold runner uses — each
            // trigger rewrites only the buckets its changed groups
            // hash into, so BOTH per-trigger sink volume (O(changed
            // groups)) and per-trigger write cost (O(touched buckets))
            // survive scale, and nothing accumulates on the driver.
            val tmpU = graft.engine.Streaming.scratchDir("graft_upd")
            val nB = spark.conf.getOption("graft.live.stateBuckets")
              .map(_.toInt).getOrElse(4) // r18: see fold runner's note
            val latestU = scala.collection.mutable.Map
              .empty[Int, Int] // bucket -> generation
            var genU = 0
            val schemaU = df.schema
            def pathU(g: Int, b: Int) = s"$tmpU/gen$g/__b=$b"
            def bCol: Column =
              (hash(col("__ukey")) % nB + lit(nB)) % nB
            val q = df.writeStream.outputMode("update")
              .option("checkpointLocation", ckpt("update"))
              .foreachBatch { (batch: DataFrame, _: Long) =>
                val sp = batch.sparkSession
                val bt = batch.withColumn("__b", bCol.cast("int"))
                // persist: the batch feeds the touched-bucket probe,
                // the anti-join, and the union — one evaluation
                bt.persist()
                updateEmitProbe.foreach(_ += bt.count())
                val touched = distinctIntsLocal(bt.select(col("__b")))
                val prior = {
                  val ps = touched.flatMap(b =>
                    latestU.get(b).map(g => pathU(g, b)))
                    .filter(p => new java.io.File(p).exists)
                  if (ps.isEmpty)
                    emptyOf(sp, schemaU).withColumn("__b",
                      lit(0).cast("int"))
                  else sp.read.schema(schemaU).parquet(ps: _*)
                    .withColumn("__b", bCol.cast("int"))
                }
                val g1 = genU + 1
                prior.join(bt.select("__ukey"), Seq("__ukey"),
                    "left_anti")
                  .unionByName(bt)
                  .repartition(math.max(touched.size, 1), col("__b"))
                  .write.mode("overwrite").partitionBy("__b")
                  .parquet(s"$tmpU/gen$g1")
                bt.unpersist()
                touched.foreach(b => latestU(b) = g1)
                genU = g1
              }.start()
            rows.grouped(per).foreach { g =>
              phased("trigger") {
                ms.addData(g.toSeq); q.processAllAvailable()
              }
            }
            phased("stop")(q.stop())
            val live = latestU.toSeq.map { case (b, g) => pathU(g, b) }
              .filter(p => new java.io.File(p).exists)
            val t =
              (if (live.isEmpty) emptyOf(spark, schemaU)
               else spark.read.schema(schemaU).parquet(live: _*))
                .drop("__ukey")
            return (if (ordCols.nonEmpty) t.orderBy(ordCols: _*) else t)
          }
          val mode = if (kind == 1) OutputMode.Complete()
                     else OutputMode.Append()
          val sinkName = s"graft_deploy_$out"
          val q = phased("start")(
            df.writeStream.format("memory").queryName(sinkName)
              .option("checkpointLocation", ckpt("sink"))
              .outputMode(mode).start())
          rows.grouped(per).foreach { g =>
            phased("trigger") {
              ms.addData(g.toSeq); q.processAllAvailable()
            }
          }
          if (kind == 2) (0 to 1).foreach { k =>
            // two watermark-flush sentinel batches (engine twin:
            // Streaming.runStream): the first advances the watermark
            // past every real window, the second runs a batch UNDER
            // that advanced watermark so all remaining state emits and
            // evicts
            phased("flush") {
              ms.addData(Seq(Cep.Ev(Long.MaxValue - 2 + k,
                graft.engine.Streaming.FlushNs + k * 3600000000000L,
                -1L, "__flush", 0.0)))
              q.processAllAvailable()
            }
          }
          phased("stop")(q.stop())
          val t = spark.table(sinkName)
          if (ordCols.nonEmpty) t.orderBy(ordCols: _*) else t
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      prevAqe match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.enabled", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.enabled")
      }
      prevNd match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.noDataMicroBatches.enabled")
      }
      scala.util.Try {
        import scala.reflect.io.Directory
        new Directory(ckptRoot.toFile).deleteRecursively()
      }
    }
  }
}
