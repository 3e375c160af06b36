package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.engine.{Cep, Tables}

/** SiddhiQL front-end: compile the reference's query TEXT onto the
  * engine's combinators, so a user's existing queries run verbatim.
  * Everything outside the surface below fails fast with a message
  * naming the construct.
  *
  * {{{
  * -- single queries (compile):
  * from <stream>[<filter>] (#window.<w>(args))?
  *   select <expr (as alias)?, ...>
  *   (group by ...)? (having ...)? (output first|last|all|snapshot
  *   every N sec|events)? (order by ...)? (limit N)? (offset M)?
  *   (insert into Out)?
  * from A as a join B as b on cond select ...       -- incl. left outer;
  *   a side may be `AggTable within lo, hi per 'grain'`
  * from (every)? e1=S[cond](<m:n>)? (->|,) e2=S[c] (and|or e3=S[c])?
  *   (-> not S[cond] for T)? (within T)?
  *   select e1.f | e1[0].f | e1[last].f | coalesce(e2.f, e3.f) ...
  *
  * -- apps (compileApp / deployApp): `define stream|table|window|
  * -- trigger|aggregation` + @info-annotated queries chained through
  * -- named streams; stream→table DML (insert/update/update or
  * -- insert/delete ... on); `partition with (...) begin ... end`;
  * -- aggregation reads `from A within lo, hi per 'grain'`;
  * -- @app:/@source/@sink annotations tolerated as deployment config
  * }}}
  *
  * Windows: timeBatch, lengthBatch, session, length, time,
  * externalTime(attr, T), externalTimeBatch(attr, T),
  * sort(N, attr, 'asc'|'desc'), unique:first/last(attr),
  * frequent(N, attr), delay(T), cron('quartz'), timeLength(T, N),
  * expression('retain-while predicate'). Function namespaces: str:,
  * math:, time:, json:, regex: (rendered to codegen'd SQL, never
  * UDFs). Multiple queries inserting into one named stream union (the
  * reference's StreamJunction fan-in); `select *` expands to the
  * source schema; `attr in Table` filters compile to semi/anti joins;
  * `from T on cond` runs the on-demand store-query form.
  *
  * Batch-replay semantics identical to the engine's oracle-gated
  * queries: tumbling windows become group keys (the window identity is
  * emitted as a leading implicit column — `w_start_ms`, `chunk_id`,
  * `bucket_start_ms`, or `w_start_ms`/`w_end_ms` for session), sliding
  * windows become frame-bounded window functions partitioned by the
  * `group by` keys, DML statements collapse to one keyed MERGE shuffle,
  * and pattern clauses compile onto the [[Patterns]] NFA through the
  * custom Catalyst operator path
  * ([[Patterns.PatternBuilder.selectPlan]]). [[deployApp]] runs the
  * same app text as a LIVE Structured Streaming topology.
  *
  * Scale notes: everything lowers to the same declarative plans the rest
  * of the engine emits (Catalyst sees groupBy/window/join/pattern
  * operators, never an interpreter); the only interpreted code is the
  * pattern-step PREDICATE, which the NFA already takes as a function.
  * Global-count shapes (lengthBatch chunks, sliding frames, count-based
  * output rate) compile through the distributed prefix-sum rank
  * ([[globalRank]]) and band joins — no single-task data-sized window
  * anywhere (the r9 guardGlobalWindow fail-fast family is retired).
  */
object SiddhiQL extends Serializable {

  // ---------- AST ----------
  sealed trait Expr
  private final case class Num(text: String) extends Expr
  private final case class Str(value: String) extends Expr
  private final case class Ref(parts: List[String]) extends Expr
  private final case class Call(ns: Option[String], name: String,
                                args: List[Expr]) extends Expr
  private final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private final case class Not(e: Expr) extends Expr
  private final case class Neg(e: Expr) extends Expr

  /** Indexed event access in pattern selects: `e1[0].value`,
    * `e1[last].value` (idx None = last; `first` parses as Some(0)). */
  private final case class IdxRef(binding: String, idx: Option[Int],
      field: String) extends Expr

  /** `select *` — expanded to the source's full column list at compile
    * time (single-stream, join, and DML paths; meaningless in pattern
    * selects, where sqlOf rejects it naming the clause). */
  private case object Star extends Expr

  /** `<expr> in TableName` membership filter (SURVEY §2.2: semi-join
    * semantics) — compiled to a LEFT SEMI join (LEFT ANTI under `not`),
    * never a row-at-a-time lookup. */
  private final case class InTable(e: Expr, table: String) extends Expr

  private final case class SelItem(e: Expr, alias: Option[String])
  private final case class WindowSpec(name: String, args: List[Long],
      sargs: List[String] = Nil)
  private sealed trait StreamClause
  private final case class SingleStream(table: String, filter: Option[Expr],
      window: Option[WindowSpec], aggWithin: Option[(Expr, Expr)] = None,
      aggPer: Option[String] = None) extends StreamClause
  private final case class JoinStream(left: SingleStream,
      leftAlias: Option[String], joinType: String, right: SingleStream,
      rightAlias: Option[String], on: Expr,
      unidirectional: Boolean = false) extends StreamClause
  private sealed trait PatStep
  private final case class PatCond(binding: String, table: String,
      cond: Expr, quant: Option[(Int, Int)] = None,
      strict: Boolean = false) extends PatStep
  private final case class PatAbsent(table: String, cond: Expr,
      forNs: Long) extends PatStep
  /** Logical pair `e2=S[c] and|or e3=S[c]` (both / either-of). */
  private final case class PatPair(isAnd: Boolean, b1: String, t1: String,
      c1: Expr, b2: String, t2: String, c2: Expr) extends PatStep
  private final case class PatternStream(every: Boolean,
      steps: List[PatStep], withinNs: Option[Long]) extends StreamClause

  /** Query output action: plain stream insert, or one of the reference's
    * stream→table DML forms (`update … on`, `update or insert into … on`,
    * `delete … on`). */
  private sealed trait Action { def target: String }
  private final case class InsertInto(target: String) extends Action
  private final case class UpdateTable(target: String,
      set: List[(String, Expr)], on: Expr) extends Action
  private final case class UpsertTable(target: String,
      set: List[(String, Expr)], on: Expr) extends Action
  private final case class DeleteTable(target: String, on: Expr)
      extends Action

  /** `output first|last|all every <T>` / `every <N> events` /
    * `output snapshot every <T>` — exactly one of timeNs/count is set
    * (snapshot is time-only). */
  private final case class Rate(mode: String, timeNs: Option[Long],
      count: Option[Long])

  private final case class Ast(stream: StreamClause, select: List[SelItem],
      groupBy: List[String], having: Option[Expr],
      orderBy: List[(String, Boolean)], limit: Option[Long],
      offset: Option[Long], rate: Option[Rate], action: Option[Action])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"SiddhiQL: $msg")

  /** Distributed running total of `value` in GLOBAL `sortCols` order —
    * the scale-safe form of `sum(value) over (order by … rows
    * unbounded preceding)`: rows range-partition by the sort key, each
    * partition computes its local running total in parallel, and the
    * per-partition totals (ONE row per partition) cumsum into offsets
    * that broadcast back onto the rows. The only order-by-without-
    * partition window left touches the P-row offset relation, so no
    * data-sized single-task stage remains; the sort key must be
    * total (unique) for the result to be deterministic. */
  private def runningTotal(df: DataFrame, sortCols: Seq[Column],
      value: Column, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__rpid", spark_partition_id())
    val w = Window.partitionBy("__rpid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = parted.groupBy("__rpid")
      .agg(sum(value).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(
        Window.orderBy("__rpid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__rpid").as("__opid"), col("__off"))
    parted.withColumn("__loc", sum(value).over(w))
      .join(broadcast(offs), col("__rpid") === col("__opid"))
      .withColumn(out, col("__loc") + col("__off"))
      .drop("__rpid", "__opid", "__loc", "__off")
  }

  /** Distributed GLOBAL arrival rank (1-based) in `sortCols` order —
    * [[runningTotal]] of the constant 1: the scale-safe replacement for
    * `row_number() over (order by …)` with no partition key. Every
    * global-count shape (lengthBatch chunks, count-based output rate,
    * sliding count frames) is a consumer of this rank; the r9
    * guardGlobalWindow fail-fast family is retired on it. The sort key
    * must be a total (unique) order for determinism. */
  private def globalRank(df: DataFrame, sortCols: Seq[Column],
      out: String): DataFrame =
    runningTotal(df, sortCols, lit(1L), out)

  // ---------- lexer ----------
  private sealed trait Tok
  private final case class TId(s: String) extends Tok
  private final case class TNum(s: String) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TSym(s: String) extends Tok
  private case object TEof extends Tok

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < n && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += TId(q.substring(j, i))
      } else if (c.isDigit) {
        val j = i
        while (i < n && (q(i).isDigit || q(i) == '.')) i += 1
        out += TNum(q.substring(j, i))
      } else if (c == '\'') {
        val j = i + 1
        i += 1
        while (i < n && q(i) != '\'') i += 1
        if (i >= n) fail("unterminated string literal")
        out += TStr(q.substring(j, i)); i += 1
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("->", "==", "!=", "<=", ">=")(two)) {
          out += TSym(two); i += 2
        } else { out += TSym(c.toString); i += 1 }
      }
    }
    out += TEof
    out.result()
  }

  // ---------- parser ----------
  private final class P(toks: Vector[Tok]) {
    private var p = 0
    def peek: Tok = toks(p)
    def peek2: Tok = toks(math.min(p + 1, toks.length - 1))
    def advance(): Tok = { val t = toks(p); p += 1; t }
    def isKw(s: String): Boolean = peek match {
      case TId(x) => x.equalsIgnoreCase(s)
      case _ => false
    }
    def tryKw(s: String): Boolean = if (isKw(s)) { p += 1; true } else false
    def eatKw(s: String): Unit =
      if (!tryKw(s)) fail(s"expected '$s', got $peek")
    def isSym(s: String): Boolean = peek match {
      case TSym(x) => x == s
      case _ => false
    }
    def trySym(s: String): Boolean = if (isSym(s)) { p += 1; true } else false
    def eatSym(s: String): Unit =
      if (!trySym(s)) fail(s"expected '$s', got $peek")
    def ident(): String = advance() match {
      case TId(s) => s
      case t => fail(s"expected identifier, got $t")
    }
    def intLit(): Long = advance() match {
      case TNum(s) if !s.contains('.') => s.toLong
      case t => fail(s"expected integer, got $t")
    }

    private val clauseKw = Set("select", "group", "having", "order",
      "limit", "insert", "within", "from")

    // duration: INT unit (ms | sec | min | hour and long forms) → ns
    def duration(): Long = {
      val v = intLit()
      val unit = ident().toLowerCase
      val ns = unit match {
        case "ms" | "millisecond" | "milliseconds" => 1000000L
        case "sec" | "second" | "seconds"          => 1000000000L
        case "min" | "minute" | "minutes"          => 60L * 1000000000L
        case "hour" | "hours"                      => 3600L * 1000000000L
        case u => fail(s"unknown time unit '$u'")
      }
      v * ns
    }

    // ---- expressions (precedence: or < and < not < cmp < add < mul) ----
    def expr(): Expr = orExpr()
    /** One partition-range branch: `and`-level, so the spec's `or`
      * separates branches instead of being swallowed by the condition. */
    def rangeExpr(): Expr = andExpr()
    private def orExpr(): Expr = {
      var l = andExpr()
      while (isKw("or")) { advance(); l = Bin("or", l, andExpr()) }
      l
    }
    private def andExpr(): Expr = {
      var l = notExpr()
      while (isKw("and")) { advance(); l = Bin("and", l, notExpr()) }
      l
    }
    private def notExpr(): Expr =
      if (tryKw("not")) Not(notExpr()) else cmpExpr()
    private def cmpExpr(): Expr = {
      val l = addExpr()
      peek match {
        case TSym(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=")) =>
          advance(); Bin(op, l, addExpr())
        case _ => if (tryKw("in")) InTable(l, ident()) else l
      }
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      var done = false
      while (!done) peek match {
        case TSym(op @ ("+" | "-")) => advance(); l = Bin(op, l, mulExpr())
        case _ => done = true
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = unary()
      var done = false
      while (!done) peek match {
        case TSym(op @ ("*" | "/" | "%")) => advance(); l = Bin(op, l, unary())
        case _ => done = true
      }
      l
    }
    private def unary(): Expr =
      if (trySym("-")) Neg(unary()) else primary()
    private def primary(): Expr = advance() match {
      case TNum(s) => Num(s)
      case TStr(s) => Str(s)
      case TSym("(") => val e = expr(); eatSym(")"); e
      case TId(name) =>
        val idxAhead = isSym("[") && (peek2 match {
          case TNum(s) => !s.contains('.')
          case TId(x) => x.equalsIgnoreCase("last") ||
            x.equalsIgnoreCase("first")
          case _ => false
        })
        if (trySym(":")) { // namespaced call: str:upper(...)
          val fn = ident(); eatSym("(")
          Call(Some(name.toLowerCase), fn, argList())
        } else if (trySym("(")) {
          Call(None, name, argList())
        } else if (idxAhead) { // e1[0].value / e1[last].value
          eatSym("[")
          val idx = advance() match {
            case TNum(s) => Some(s.toInt)
            case TId(x) if x.equalsIgnoreCase("first") => Some(0)
            case _ => None // last
          }
          eatSym("]"); eatSym(".")
          IdxRef(name, idx, ident())
        } else if (isSym(".")) { // qualified ref e1.value
          val parts = List.newBuilder[String]
          parts += name
          while (trySym(".")) parts += ident()
          Ref(parts.result())
        } else Ref(List(name))
      case t => fail(s"unexpected token $t in expression")
    }
    private def argList(): List[Expr] = {
      if (trySym(")")) return Nil
      val args = List.newBuilder[Expr]
      args += expr()
      while (trySym(",")) args += expr()
      eatSym(")")
      args.result()
    }

    // ---- clauses ----
    def selItems(): List[SelItem] = {
      val items = List.newBuilder[SelItem]
      def one(): SelItem = {
        if (trySym("*")) SelItem(Star, None)
        else {
          val e = expr()
          val a = if (tryKw("as")) Some(ident()) else None
          SelItem(e, a)
        }
      }
      items += one()
      while (trySym(",")) items += one()
      items.result()
    }

    def windowSpec(): WindowSpec = {
      eatSym("#"); eatKw("window"); eatSym(".")
      windowNameArgs()
    }

    /** `<name>(args)` with optional `ns:name` — shared by `#window.`
      * clauses and `define window` declarations. */
    def windowNameArgs(): WindowSpec = {
      val name0 = ident()
      val name = // namespaced windows: unique:first, unique:last
        if (trySym(":")) s"$name0:${ident()}" else name0
      eatSym("(")
      val args = List.newBuilder[Long]
      val sargs = List.newBuilder[String]
      if (!trySym(")")) {
        def arg(): Unit = peek match {
          case TId(_) => sargs += ident() // attribute-name argument
          case TStr(s) => advance(); sargs += s // 'asc' / 'desc'
          case _ => peek2 match {
            case TId(_) => args += duration() // "1 min" — number + unit
            case _ => args += intLit()
          }
        }
        arg()
        while (trySym(",")) arg()
        eatSym(")")
      }
      WindowSpec(name, args.result(), sargs.result())
    }

    def streamClause(): StreamClause = {
      val every = tryKw("every")
      // pattern iff `every`/`not` leads, or binding '=' follows the
      // first identifier
      val isPattern = every || isKw("not") || (peek match {
        case TId(_) => peek2 == TSym("=")
        case _ => false
      })
      if (isPattern) {
        def step(): PatStep =
          if (tryKw("not")) {
            val tbl = ident()
            eatSym("["); val cond = expr(); eatSym("]")
            eatKw("for")
            PatAbsent(tbl, cond, duration())
          } else {
            val b = ident(); eatSym("="); val tbl = ident()
            eatSym("["); val cond = expr(); eatSym("]")
            // count quantifier `<m:n>` on the condition (`<m:>` = open max)
            val quant = if (trySym("<")) {
              val m = intLit(); eatSym(":")
              val n = if (isSym(">")) Int.MaxValue else intLit().toInt
              eatSym(">")
              Some((m.toInt, n))
            } else None
            PatCond(b, tbl, cond, quant)
          }
        // a condition step may extend to a logical pair:
        // `e2=S[c] and|or e3=S[c]` (both-of / either-of)
        def stepOrPair(): PatStep = {
          val first = step()
          val logical =
            if (tryKw("and")) Some(true)
            else if (tryKw("or")) Some(false)
            else None
          (logical, first) match {
            case (None, s) => s
            case (Some(isAnd), PatCond(b1, t1, c1, None, false)) =>
              step() match {
                case PatCond(b2, t2, c2, None, false) =>
                  PatPair(isAnd, b1, t1, c1, b2, t2, c2)
                case _ => fail("a logical pair joins two plain " +
                  "condition steps")
              }
            case _ => fail("a logical pair joins two plain condition " +
              "steps (no quantifiers/absence)")
          }
        }
        val steps = List.newBuilder[PatStep]
        steps += stepOrPair()
        var more = true
        while (more) {
          if (trySym("->")) steps += stepOrPair()
          else if (trySym(",")) steps += (stepOrPair() match {
            // `,` strict-next: the very NEXT event must match
            case c: PatCond => c.copy(strict = true)
            case _ => fail("strict-next ',' precedes a plain condition " +
              "step")
          })
          else more = false
        }
        val w = if (tryKw("within")) Some(duration()) else None
        PatternStream(every, steps.result(), w)
      } else {
        def single(): (SingleStream, Option[String]) = {
          // `from !S` reads S's fault stream (@OnError(action='STREAM'))
          val tbl = if (trySym("!")) "!" + ident() else ident()
          val a = if (tryKw("as")) Some(ident()) else None
          val filt = if (trySym("[")) {
            val e = expr(); eatSym("]"); Some(e)
          } else None
          val win = if (isSym("#")) Some(windowSpec()) else None
          // aggregation read: `within lo, hi per 'grain'` (Siddhi's
          // incremental-aggregation query clause)
          val aw = if (tryKw("within")) {
            val lo = expr(); eatSym(","); val hi = expr(); Some((lo, hi))
          } else None
          val ap = if (tryKw("per")) Some(advance() match {
            case TStr(g) => g
            case TId(g)  => g
            case t => fail(s"per expects a grain name, got $t")
          }) else None
          (SingleStream(tbl, filt, win, aw, ap), a)
        }
        val (l, la) = single()
        // `unidirectional` on the LEFT side: only left arrivals trigger
        // the join (the right side just holds its window)
        val unidir = tryKw("unidirectional")
        val jt =
          if (tryKw("join")) Some("inner")
          else if (isKw("left")) {
            eatKw("left"); eatKw("outer"); eatKw("join"); Some("left_outer")
          } else if (isKw("right")) {
            eatKw("right"); eatKw("outer"); eatKw("join")
            Some("right_outer")
          } else if (isKw("full")) {
            eatKw("full"); eatKw("outer"); eatKw("join")
            Some("full_outer")
          } else None
        if (unidir && jt.isEmpty)
          fail("`unidirectional` must precede `join`")
        jt match {
          case None =>
            // store-query condition: `from T on cond select …` (the
            // reference's on-demand query form against tables, named
            // windows, and aggregations) — a filter, AND-combined with
            // any `[bracket]` filter
            if (tryKw("on")) {
              val c = expr()
              l.copy(filter = Some(l.filter.fold(c)(f => Bin("and", f, c))))
            } else l
          case Some(t) =>
            val (r, ra) = single()
            // `unidirectional` AFTER the right side: only right arrivals
            // trigger — compiled by swapping sides so the triggering
            // stream is always the left of the band
            val rUnidir = tryKw("unidirectional")
            if (unidir && rUnidir)
              fail("`unidirectional` may mark only one join side")
            // windowed join sides are allowed for time(T) on BOTH sides
            // (the stream#window ⋈ stream#window form) — compileJoin
            // validates the combination
            eatKw("on")
            val on = expr()
            if (rUnidir) {
              if (t != "inner")
                fail("right-side `unidirectional` supports inner joins " +
                  "(v1) — outer direction would flip under the swap")
              JoinStream(r, ra, t, l, la, on, unidirectional = true)
            } else JoinStream(l, la, t, r, ra, on, unidirectional = unidir)
        }
      }
    }

    def query(): Ast = {
      eatKw("from")
      val stream = streamClause()
      eatKw("select")
      val sel = selItems()
      val grp = if (tryKw("group")) {
        eatKw("by")
        val g = List.newBuilder[String]
        g += ident()
        while (trySym(",")) g += ident()
        g.result()
      } else Nil
      val hav = if (tryKw("having")) Some(expr()) else None
      def rateClause(): Option[Rate] = if (tryKw("output")) {
        val mode = ident().toLowerCase
        if (!Set("first", "last", "all", "snapshot")(mode))
          fail(s"output rate mode must be first|last|all|snapshot, " +
            s"got '$mode'")
        eatKw("every")
        val v = intLit()
        val unit = ident().toLowerCase
        if (unit == "events" || unit == "event") {
          if (mode == "snapshot")
            fail("output snapshot is time-based: `every N sec/min`")
          Some(Rate(mode, None, Some(v)))
        } else {
          val ns = unit match {
            case "ms" | "millisecond" | "milliseconds" => 1000000L
            case "sec" | "second" | "seconds"          => 1000000000L
            case "min" | "minute" | "minutes"          => 60L * 1000000000L
            case "hour" | "hours"                      => 3600L * 1000000000L
            case u => fail(s"unknown time unit '$u' in output clause")
          }
          Some(Rate(mode, Some(v * ns), None))
        }
      } else None
      // `output ...` sits after `having` in the reference grammar; the
      // order/limit extensions may precede or follow it
      val rate0 = rateClause()
      val ord = if (tryKw("order")) {
        eatKw("by")
        val o = List.newBuilder[(String, Boolean)]
        def one(): (String, Boolean) = {
          val c = ident()
          val asc = if (tryKw("desc")) false else { tryKw("asc"); true }
          (c, asc)
        }
        o += one()
        while (trySym(",")) o += one()
        o.result()
      } else Nil
      val lim = if (tryKw("limit")) Some(intLit()) else None
      val off = if (tryKw("offset")) Some(intLit()) else None
      val rate = rate0.orElse(rateClause())
      // `set T.col = expr, ...` — optional in both update forms; without
      // it every output attribute updates its same-named table column
      def setClause(target: String): List[(String, Expr)] =
        if (!tryKw("set")) Nil
        else {
          val out = List.newBuilder[(String, Expr)]
          def one(): (String, Expr) = {
            val t = ident(); eatSym("."); val c = ident()
            if (!t.equalsIgnoreCase(target))
              fail(s"set target '$t.$c' must be qualified by the " +
                s"updated table '$target'")
            eatSym("=")
            (c, expr())
          }
          out += one()
          while (trySym(",")) out += one()
          out.result()
        }
      val act: Option[Action] =
        if (tryKw("insert")) { eatKw("into"); Some(InsertInto(ident())) }
        else if (tryKw("delete")) {
          val t = ident(); eatKw("on"); Some(DeleteTable(t, expr()))
        } else if (tryKw("update")) {
          if (tryKw("or")) {
            eatKw("insert"); eatKw("into")
            val t = ident(); val st = setClause(t); eatKw("on")
            Some(UpsertTable(t, st, expr()))
          } else {
            val t = ident(); val st = setClause(t); eatKw("on")
            Some(UpdateTable(t, st, expr()))
          }
        } else None
      peek match {
        case TEof => ()
        case t => fail(s"trailing input at $t")
      }
      Ast(stream, sel, grp, hav, ord, lim, off, rate, act)
    }
  }

  // ---------- expression → Spark SQL text ----------
  private val aggNames =
    Set("sum", "count", "avg", "min", "max", "distinctcount", "stddev")

  /** Does the expression reference any stream attribute (vs a pure
    * constant expression)? */
  private def refsAttr(e: Expr): Boolean = e match {
    case Ref(_) | Star => true
    case Bin(_, l, r) => refsAttr(l) || refsAttr(r)
    case Not(x) => refsAttr(x)
    case Neg(x) => refsAttr(x)
    case Call(_, _, as) => as.exists(refsAttr)
    case InTable(e2, _) => refsAttr(e2)
    case _ => false
  }

  private def containsAgg(e: Expr): Boolean = e match {
    case Call(None, n, args) =>
      aggNames(n.toLowerCase) || args.exists(containsAgg)
    case Call(_, _, args) => args.exists(containsAgg)
    case Bin(_, l, r) => containsAgg(l) || containsAgg(r)
    case Not(x) => containsAgg(x)
    case Neg(x) => containsAgg(x)
    case _ => false
  }

  // ---------- script functions (define function) ----------
  /** `define function f[javascript] return <type> { return <expr>; }` —
    * the reference's script UDFs (`SI:core/function/Script.java` +
    * `EXT:siddhi-script-js` [public repo paths, unverified]). Instead of
    * embedding a JS engine we compile the single-`return` JS EXPRESSION
    * subset natively to Catalyst SQL: arguments are `data[i]`; operators
    * `+ - * / %`, comparisons (`== != === !== < <= > >=`), `&& || !`,
    * the ternary `c ? a : b`, parentheses, number/string literals (both
    * quote styles), and `Math.*` calls. In a STRING-returning function
    * `+` is JS concatenation (the canonical Siddhi JS example). The body
    * INLINES into the calling query's plan as `cast(<expr> as <type>)`
    * — whole-stage codegen'd, no script engine at any row, and Catalyst
    * can optimize through it (a filter over a script fn still prunes).
    * Functions may call earlier-defined functions; cycles are diagnosed
    * by a depth guard at render time. */
  private final case class ScriptFn(name: String, argc: Int, body: Expr,
      sqlType: String)
  // Per-THREAD script-function registry: each compile/compileApp/
  // deployApp entry resets its own thread's registry, so concurrent
  // compilations (parallel test suites, two sessions sharing the
  // object) can no longer cross-contaminate or drop definitions
  // mid-compile. Fold closures that re-render SQL on a streaming
  // micro-batch thread capture a snapshot and restore it there.
  private val scriptFnsTL = new ThreadLocal[Map[String, ScriptFn]] {
    override def initialValue: Map[String, ScriptFn] = Map.empty
  }
  private val scriptDepthTL = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }
  private def scriptFns: Map[String, ScriptFn] = scriptFnsTL.get
  private def scriptFns_=(m: Map[String, ScriptFn]): Unit =
    scriptFnsTL.set(m)
  private def scriptDepth: Int = scriptDepthTL.get
  private def scriptDepth_=(v: Int): Unit = scriptDepthTL.set(v)

  private def jsLex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_' || c == '$') {
        val j = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_' ||
          src(i) == '$')) i += 1
        out += TId(src.substring(j, i))
      } else if (c.isDigit) {
        val j = i
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        out += TNum(src.substring(j, i))
      } else if (c == '\'' || c == '"') {
        val q = c
        val j = i + 1
        i += 1
        while (i < n && src(i) != q) i += 1
        if (i >= n) fail("define function: unterminated string in body")
        out += TStr(src.substring(j, i)); i += 1
      } else {
        val three = if (i + 2 < n) src.substring(i, i + 3) else ""
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (three == "===") { out += TSym("=="); i += 3 }
        else if (three == "!==") { out += TSym("!="); i += 3 }
        else if (Set("==", "!=", "<=", ">=", "&&", "||")(two)) {
          out += TSym(two); i += 2
        } else { out += TSym(c.toString); i += 1 }
      }
    }
    out += TEof
    out.result()
  }

  /** Recursive-descent parser for the JS expression subset → [[Expr]]
    * (ternary lowers to ifThenElse, && || ! to and/or/not, `Math.pow` /
    * `Math.sign` to their math: names — everything else math: validates). */
  private final class JsP(toks: Vector[Tok]) {
    private var p = 0
    private def peek: Tok = toks(p)
    private def advance(): Tok = { val t = toks(p); p += 1; t }
    private def eat(sym: String): Unit = advance() match {
      case TSym(s) if s == sym => ()
      case t => fail(s"define function: expected '$sym', got $t in body")
    }
    def done: Boolean = peek == TEof
    def ternary(): Expr = {
      val c = or()
      if (peek == TSym("?")) {
        advance()
        val a = ternary(); eat(":"); val b = ternary()
        Call(None, "ifThenElse", List(c, a, b))
      } else c
    }
    private def or(): Expr = {
      var l = and()
      while (peek == TSym("||")) { advance(); l = Bin("or", l, and()) }
      l
    }
    private def and(): Expr = {
      var l = cmp()
      while (peek == TSym("&&")) { advance(); l = Bin("and", l, cmp()) }
      l
    }
    private def cmp(): Expr = {
      val l = add()
      peek match {
        case TSym(op @ ("==" | "!=" | "<" | "<=" | ">" | ">=")) =>
          advance(); Bin(op, l, add())
        case _ => l
      }
    }
    private def add(): Expr = {
      var l = mul()
      var go = true
      while (go) peek match {
        case TSym(op @ ("+" | "-")) => advance(); l = Bin(op, l, mul())
        case _ => go = false
      }
      l
    }
    private def mul(): Expr = {
      var l = unary()
      var go = true
      while (go) peek match {
        case TSym(op @ ("*" | "/" | "%")) =>
          advance(); l = Bin(op, l, unary())
        case _ => go = false
      }
      l
    }
    private def unary(): Expr = peek match {
      case TSym("-") => advance(); Neg(unary())
      case TSym("!") => advance(); Not(unary())
      case _ => primary()
    }
    private def args(): List[Expr] = {
      eat("(")
      if (peek == TSym(")")) { advance(); return Nil }
      val as = List.newBuilder[Expr]
      as += ternary()
      while (peek == TSym(",")) { advance(); as += ternary() }
      eat(")")
      as.result()
    }
    private def primary(): Expr = advance() match {
      case TNum(s) => Num(s)
      case TStr(s) => Str(s)
      case TSym("(") => val e = ternary(); eat(")"); e
      case TId("data") =>
        eat("[")
        val ix = advance() match {
          case TNum(s) if !s.contains('.') => s.toInt
          case t => fail(s"define function: data[<int>] expected, got $t")
        }
        eat("]")
        Ref(List(s"__data_$ix"))
      case TId("Math") =>
        eat(".")
        val fn = advance() match {
          case TId(f) => f
          case t => fail(s"define function: Math.<fn> expected, got $t")
        }
        val mapped = fn match {
          case "pow" => "power"
          case "sign" => "signum"
          case other => other
        }
        Call(Some("math"), mapped, args())
      case TId(other) if peek == TSym("(") =>
        // a call to another (earlier-defined) script function
        Call(None, other, args())
      case t => fail(s"define function: unsupported body construct $t — " +
        "the JS-expression subset is data[i], literals, + - * / %, " +
        "comparisons, && || !, ?:, Math.*, and earlier-defined functions")
    }
  }

  /** Parse + register one `define function f[lang] return <type>
    * { return <expr>; }` statement (compiled natively — ScriptFn
    * scaladoc; the [lang] tag is accepted as-written since no script
    * engine runs). Shared by compileApp and the live deployAppOn path. */
  private def registerScriptFn(body: String): Unit = {
    val m = ("(?is)^define\\s+function\\s+([A-Za-z_]\\w*)\\s*\\[" +
      "\\s*([A-Za-z]+)\\s*\\]\\s*return\\s+([A-Za-z]+)\\s*\\{(.*)" +
      "\\}\\s*$").r.findFirstMatchIn(body).getOrElse(fail(
        "malformed define function: expected `define function " +
          "<name>[<lang>] return <type> { return <expr>; }`"))
    val (fname, rtype, fbody) = (m.group(1), m.group(3), m.group(4))
    val rm = "(?is)^\\s*return\\b(.*?);?\\s*$".r
      .findFirstMatchIn(fbody).getOrElse(fail(
        s"define function '$fname': only single-`return <expr>;` " +
          "bodies compile (the JS-expression subset; " +
          "multi-statement scripts are out of scope)"))
    val sqlType = rtype.toLowerCase match {
      case "int" => "int"
      case "long" => "bigint"
      case "float" => "float"
      case "double" => "double"
      case "string" => "string"
      case "bool" => "boolean"
      case other =>
        fail(s"define function: unknown return type '$other'")
    }
    val jp = new JsP(jsLex(rm.group(1)))
    var bodyExpr = jp.ternary()
    if (!jp.done)
      fail(s"define function '$fname': trailing tokens after the " +
        "return expression")
    if (sqlType == "string") bodyExpr = plusToConcat(bodyExpr)
    scriptFns += fname.toLowerCase ->
      ScriptFn(fname, maxDataIdx(bodyExpr) + 1, bodyExpr, sqlType)
  }

  private def maxDataIdx(e: Expr): Int = e match {
    case Ref(List(d)) if d.startsWith("__data_") => d.substring(7).toInt
    case Bin(_, l, r) => math.max(maxDataIdx(l), maxDataIdx(r))
    case Not(x) => maxDataIdx(x)
    case Neg(x) => maxDataIdx(x)
    case Call(_, _, as) =>
      as.foldLeft(-1)((m, a) => math.max(m, maxDataIdx(a)))
    case _ => -1
  }

  /** JS `+` means concatenation when the function returns string. */
  private def plusToConcat(e: Expr): Expr = e match {
    case Bin("+", l, r) =>
      Call(None, "__concat", List(plusToConcat(l), plusToConcat(r)))
    case Bin(op, l, r) => Bin(op, plusToConcat(l), plusToConcat(r))
    case Not(x) => Not(plusToConcat(x))
    case Neg(x) => Neg(plusToConcat(x))
    case Call(ns, n, as) => Call(ns, n, as.map(plusToConcat))
    case other => other
  }

  private def renderCall(ns: Option[String], name: String,
                         argc: Int, a: List[String]): String = {
    def std(n: String) = s"$n(${a.mkString(", ")})"
    (ns.map(_.toLowerCase), name.toLowerCase) match {
      case (None, "count") if argc == 0 => "count(*)"
      case (None, n) if aggNames(n) && n != "distinctcount" &&
          n != "stddev" => std(n)
      case (None, "distinctcount") => s"count(DISTINCT ${a.head})"
      // Siddhi stdDev is POPULATION stddev; Spark's bare stddev is sample
      case (None, "stddev") => s"stddev_pop(${a.head})"
      case (None, "ifthenelse") => s"if(${a.mkString(", ")})"
      case (None, "coalesce") => std("coalesce")
      case (None, "convert") =>
        // convert(x, 'double') — the reference's cast; type name travels
        // as a string literal, so strip the quotes the renderer added
        val t = a(1).stripPrefix("'").stripSuffix("'").toLowerCase match {
          case "int" => "int"
          case "long" => "bigint"
          case "float" => "float"
          case "double" => "double"
          case "string" => "string"
          case "bool" => "boolean"
          case other => fail(s"convert: unknown type '$other'")
        }
        s"cast(${a(0)} as $t)"
      case (Some("str"), n @ ("upper" | "lower" | "length" | "trim" |
                              "concat" | "reverse" | "repeat")) => std(n)
      case (Some("str"), "contains") => s"(instr(${a(0)}, ${a(1)}) > 0)"
      // Siddhi str:substr / str:charAt are 0-based [public doc,
      // unverified]; SQL substring is 1-based
      case (Some("str"), "substr") =>
        s"substring(${a(0)}, ${a(1)} + 1, ${a(2)})"
      case (Some("str"), "charat") =>
        s"substring(${a(0)}, ${a(1)} + 1, 1)"
      case (Some("str"), "replaceall") =>
        s"regexp_replace(${a(0)}, ${a(1)}, ${a(2)})"
      case (Some("str"), "equalsignorecase") =>
        s"(lower(${a(0)}) = lower(${a(1)}))"
      // str:split(src, splitter, index) returns the index-th piece,
      // 0-based [public doc, unverified]. The splitter is a LITERAL
      // string (Siddhi and the DuckDB oracle both split literally);
      // Spark's split() is regex, so quote it with \Q...\E at runtime
      case (Some("str"), "split") => // NULL when the piece doesn't exist
        s"try_element_at(split(${a(0)}, " +
          s"concat('\\\\Q', ${a(1)}, '\\\\E')), ${a(2)} + 1)"
      case (Some("str"), "strcmp") =>
        s"(case when ${a(0)} < ${a(1)} then -1 " +
          s"when ${a(0)} = ${a(1)} then 0 else 1 end)"
      case (Some("str"), "hex") => s"lower(hex(${a(0)}))"
      case (Some("str"), "unhex") => s"cast(unhex(${a(0)}) as string)"
      case (Some("math"), n @ ("abs" | "round" | "sqrt" | "floor" |
                               "ceil" | "power" | "exp" | "sin" | "cos" |
                               "tan" | "log10" | "log2")) => std(n)
      case (Some("math"), "log") => s"ln(${a(0)})"
      case (Some("math"), "min") => s"least(${a.mkString(", ")})"
      case (Some("math"), "max") => s"greatest(${a.mkString(", ")})"
      case (Some("math"), "signum") => s"sign(${a(0)})"
      case (Some("math"), "cbrt") => std("cbrt")
      case (Some("math"), "todegrees") => s"degrees(${a(0)})"
      case (Some("math"), "toradians") => s"radians(${a(0)})"
      case (Some("math"), "pi") => "pi()"
      case (Some("math"), "e") => "e()"
      case (Some("math"), "parseint") => s"cast(${a(0)} as int)"
      case (Some("math"), "parselong") => s"cast(${a(0)} as bigint)"
      case (Some("math"), "parsefloat") => s"cast(${a(0)} as float)"
      case (Some("math"), "parsedouble") => s"cast(${a(0)} as double)"
      case (Some("math"), "isnan") => s"isnan(${a(0)})"
      case (Some("math"), "isinfinite") =>
        s"(abs(${a(0)}) = double('Infinity'))"
      // time:extract('hour', epochMs) — unit names the SQL extractor
      case (Some("time"), "extract") =>
        val u = a(0).stripPrefix("'").stripSuffix("'").toLowerCase
        if (!Set("year", "month", "day", "hour", "minute", "second")(u))
          fail(s"time:extract: unknown unit '$u'")
        s"$u(timestamp_millis(cast(${a(1)} as bigint)))"
      // time:dateFormat(epochMs, 'pattern') — Java pattern letters shared
      // by Siddhi and Spark for the common y/M/d/H/m/s forms
      case (Some("time"), "dateformat") =>
        s"date_format(timestamp_millis(cast(${a(0)} as bigint)), ${a(1)})"
      // time:dateAdd(epochMs, amount, 'unit') / dateSub — fixed-width
      // units compile to epoch arithmetic; calendar units (month/year)
      // are diagnosed (they need a calendar, not a factor)
      case (Some("time"), n @ ("dateadd" | "datesub")) =>
        val u = a(2).stripPrefix("'").stripSuffix("'").toLowerCase
        val factor = u match {
          case "second" => 1000L
          case "minute" => 60000L
          case "hour" => 3600000L
          case "day" => 86400000L
          case other => fail(s"time:$n: unit '$other' unsupported " +
            "(fixed-width units second/minute/hour/day compile to epoch " +
            "arithmetic; month/year need calendar semantics)")
        }
        val sign = if (n == "dateadd") "+" else "-"
        s"(cast(${a(0)} as bigint) $sign (${a(1)}) * $factor)"
      // time:dateDiff(epochMs1, epochMs2) → whole days between, FLOOR
      // semantics (a negative difference of part of a day is -1 day,
      // matching DuckDB's `//`; Spark's `div` truncates toward zero)
      case (Some("time"), "datediff") =>
        val d = s"(cast(${a(0)} as bigint) - cast(${a(1)} as bigint))"
        s"(($d div 86400000) + " +
          s"(case when ($d % 86400000) < 0 then -1 else 0 end))"
      case (Some("time"), "dayofweek") =>
        s"date_format(timestamp_millis(cast(${a(0)} as bigint)), 'EEEE')"
      // geo:distance(lat1, lon1, lat2, lon2) — haversine meters [public
      // doc, unverified re: unit]; pure trig, codegen'd
      case (Some("geo"), "distance") =>
        s"(2.0d * 6371000.0d * asin(sqrt(" +
          s"pow(sin(radians(${a(2)} - ${a(0)}) / 2), 2) + " +
          s"cos(radians(${a(0)})) * cos(radians(${a(2)})) * " +
          s"pow(sin(radians(${a(3)} - ${a(1)}) / 2), 2))))"
      // unitconversion: — the extension is a factor table; plain
      // literal-factor arithmetic (representatives; same factors as the
      // engine's fn_unitconvert)
      case (Some("unitconversion"), n) =>
        val factor: Option[String] = n match {
          case "kmtom" => Some("* 1000.0d")
          case "mtokm" => Some("/ 1000.0d")
          case "kmtomi" => Some("* 0.621371192d")
          case "kgtog" => Some("* 1000.0d")
          case "kgtolb" => Some("* 2.20462262d")
          case "htoms" => Some("* 3600000.0d")
          case "mintos" => Some("* 60.0d")
          case "ctof" => None
          case other => fail(s"unitconversion:$other unsupported (add " +
            "its factor to the table)")
        }
        factor match {
          case Some(f) => s"(${a(0)} $f)"
          case None => s"(${a(0)} * 9.0d / 5.0d + 32.0d)"
        }
      // list:/map: families — constructed collections + accessors; gets
      // are try_element_at (NULL on missing, matching Siddhi's null)
      case (Some("list"), "create") => s"array(${a.mkString(", ")})"
      case (Some("list"), "size") => s"size(${a(0)})"
      case (Some("list"), "contains") =>
        s"array_contains(${a(0)}, ${a(1)})"
      case (Some("list"), "get") =>
        s"try_element_at(${a(0)}, ${a(1)} + 1)"
      case (Some("list"), "sort") => s"array_sort(${a(0)})"
      // list:join(list, sep): flatten a collection to a scalar string —
      // the registry-safe projection for collection results (the driver's
      // comparator sorts rows with pandas, which cannot sort raw arrays)
      case (Some("list"), "join") => s"array_join(${a(0)}, ${a(1)})"
      case (Some("list"), "distinct") => s"array_distinct(${a(0)})"
      case (Some("list"), "isempty") => s"(size(${a(0)}) = 0)"
      case (Some("map"), "create") => s"map(${a.mkString(", ")})"
      case (Some("map"), "get") => s"try_element_at(${a(0)}, ${a(1)})"
      case (Some("map"), "containskey") =>
        s"map_contains_key(${a(0)}, ${a(1)})"
      case (Some("map"), "size") => s"size(${a(0)})"
      case (Some("map"), "keys") => s"array_sort(map_keys(${a(0)}))"
      case (Some("map"), "values") => s"array_sort(map_values(${a(0)}))"
      // instanceOfX — schema-static in Spark; typeof() answers it
      case (None, n) if n.startsWith("instanceof") && argc == 1 =>
        val t = n.stripPrefix("instanceof") match {
          case "boolean" => "boolean"
          case "double" => "double"
          case "float" => "float"
          case "integer" => "int"
          case "long" => "bigint"
          case "string" => "string"
          case other => fail(s"unknown instanceOf type '$other'")
        }
        s"(typeof(${a(0)}) = '$t')"
      case (Some("json"), "isexists") =>
        s"(get_json_object(${a(0)}, ${a(1)}) is not null)"
      case (Some("json"), "getbool") =>
        s"cast(get_json_object(${a(0)}, ${a(1)}) as boolean)"
      case (Some("json"), "getstring") =>
        s"get_json_object(${a(0)}, ${a(1)})"
      case (Some("json"), "getdouble") =>
        s"cast(get_json_object(${a(0)}, ${a(1)}) as double)"
      case (Some("json"), ("getlong" | "getint")) =>
        s"cast(get_json_object(${a(0)}, ${a(1)}) as bigint)"
      // Siddhi regex:* takes (regex, input[, group]) [public doc,
      // unverified]; find = substring search, matches = whole-string
      case (Some("regex"), "find") => s"(${a(1)} rlike ${a(0)})"
      case (Some("regex"), "matches") =>
        "(" + a(1) + " rlike concat('^(?:', " + a(0) + ", ')$'))"
      case (Some("regex"), "group") =>
        s"regexp_extract(${a(1)}, ${a(0)}, ${a(2)})"
      case (None, "__concat") => std("concat")
      case (None, n) if scriptFns.contains(n) =>
        val f = scriptFns(n)
        if (argc != f.argc)
          fail(s"function '${f.name}' takes ${f.argc} argument(s), " +
            s"got $argc")
        if (scriptDepth > 16)
          fail(s"function '${f.name}': recursive script functions are " +
            "unsupported (call cycle detected)")
        scriptDepth += 1
        try {
          val bodySql = sqlOfWith(f.body, {
            case List(d) if d.startsWith("__data_") =>
              s"(${a(d.substring(7).toInt)})"
            case other => fail(s"unknown identifier " +
              s"'${other.mkString(".")}' in function '${f.name}' body")
          })
          s"cast(($bodySql) as ${f.sqlType})"
        } finally scriptDepth -= 1
      case (nsx, n) =>
        fail(s"unsupported function ${nsx.fold("")(_ + ":")}$n")
    }
  }

  private def sqlOfWith(e: Expr, ref: List[String] => String): String =
    e match {
      case IdxRef(b, _, f) => fail(s"indexed event access ('$b[...].$f') " +
        "is a pattern-select construct")
      case Star => fail("`select *` is supported in single-stream, " +
        "join, and DML queries only (not in this clause)")
      case InTable(_, t) => fail(s"`in $t` is a stream-filter construct " +
        "(it compiles to a semi join) — not usable in this clause")
      case Num(t) => t
      case Str(v) => "'" + v.replace("'", "''") + "'"
      case Ref(parts) => ref(parts)
      case Not(x) => s"(NOT ${sqlOfWith(x, ref)})"
      case Neg(x) => s"(- ${sqlOfWith(x, ref)})"
      case Bin(op, l, r) =>
        val o = op match { case "==" => "="; case x => x }
        s"(${sqlOfWith(l, ref)} $o ${sqlOfWith(r, ref)})"
      case Call(ns, name, args) =>
        renderCall(ns, name, args.length, args.map(sqlOfWith(_, ref)))
    }

  private def sqlOf(e: Expr): String = sqlOfWith(e, _.mkString("."))

  // ---------- pattern predicate interpreter ----------
  private def field(e: Cep.Ev, name: String): Any = name match {
    case "event_id"   => e.eventId
    case "ts_ns"      => e.tsNs
    case "user_id"    => e.userId
    case "event_type" => e.eventType
    case "value"      => e.value
    case f => fail(s"unknown event field '$f'")
  }
  private def fieldType(name: String): DataType = name match {
    case "event_id" | "ts_ns" | "user_id" => LongType
    case "event_type"                     => StringType
    case "value"                          => DoubleType
    case f => fail(s"unknown event field '$f'")
  }

  private def num(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case x => fail(s"expected number, got $x")
  }

  private def evalPred(cond: Expr): (Cep.Ev, Cep.Bindings) => Boolean = {
    def ev(e: Expr, cur: Cep.Ev, b: Cep.Bindings): Any = e match {
      case Num(t) => if (t.contains('.')) t.toDouble else t.toLong
      case Str(v) => v
      case Ref(f :: Nil) => field(cur, f)
      case Ref(bn :: f :: Nil) =>
        field(b.getOrElse(bn, fail(s"unbound pattern ref '$bn'")).head, f)
      case Ref(p) => fail(s"bad reference ${p.mkString(".")}")
      case IdxRef(bn, idx, f) =>
        val evs = b.getOrElse(bn, fail(s"unbound pattern ref '$bn'"))
        idx match {
          case Some(ix) =>
            if (ix < evs.size) field(evs(ix), f)
            else fail(s"$bn[$ix] out of range in a pattern predicate " +
              s"(${evs.size} events bound)")
          case None => field(evs.last, f)
        }
      case Not(x) => !ev(x, cur, b).asInstanceOf[Boolean]
      case Neg(x) => -num(ev(x, cur, b))
      case Bin(op, l, r) =>
        op match {
          case "and" => ev(l, cur, b).asInstanceOf[Boolean] &&
            ev(r, cur, b).asInstanceOf[Boolean]
          case "or" => ev(l, cur, b).asInstanceOf[Boolean] ||
            ev(r, cur, b).asInstanceOf[Boolean]
          case "==" | "!=" =>
            val (lv, rv) = (ev(l, cur, b), ev(r, cur, b))
            val eq = (lv, rv) match {
              case (a: String, c: String) => a == c
              case (a, c) => num(a) == num(c)
            }
            if (op == "==") eq else !eq
          case "<" => num(ev(l, cur, b)) < num(ev(r, cur, b))
          case "<=" => num(ev(l, cur, b)) <= num(ev(r, cur, b))
          case ">" => num(ev(l, cur, b)) > num(ev(r, cur, b))
          case ">=" => num(ev(l, cur, b)) >= num(ev(r, cur, b))
          case "+" => num(ev(l, cur, b)) + num(ev(r, cur, b))
          case "-" => num(ev(l, cur, b)) - num(ev(r, cur, b))
          case "*" => num(ev(l, cur, b)) * num(ev(r, cur, b))
          case "/" => num(ev(l, cur, b)) / num(ev(r, cur, b))
          case "%" => num(ev(l, cur, b)) % num(ev(r, cur, b))
          case o => fail(s"operator '$o' unsupported in pattern predicate")
        }
      case Call(_, n, _) =>
        fail(s"function '$n' unsupported in pattern predicates")
      case other =>
        fail(s"'${other.getClass.getSimpleName}' unsupported in " +
          "pattern predicates")
    }
    (cur, b) => ev(cond, cur, b).asInstanceOf[Boolean]
  }

  // ---------- compiler ----------
  def compile(spark: SparkSession, dir: String, query: String): DataFrame = {
    scriptFns = Map.empty // single queries can't define functions
    compileOne(spark, dir, query, Map.empty)
  }

  /** Compile a whole Siddhi APP: `define stream ...;` declarations plus
    * `@info(name='q') from ... insert into Out;` queries, where later
    * queries may read earlier outputs BY NAME (`from Out`) — the chained
    * topology a SiddhiProcess deploys. Returns every named output stream
    * (query name from @info, else the insert-into target, else `q<i>`).
    * Chaining is pure plan composition: each stage extends the previous
    * stage's logical plan, so Catalyst optimizes the WHOLE app as one
    * tree (filters from late stages can reach the scan). */
  def compileApp(spark: SparkSession, dir: String,
                 app: String): Map[String, DataFrame] = {
    val stmts = splitStatements(app)
    scriptFns = Map.empty // defs are per-app, registered in textual order
    var env = Map.empty[String, DataFrame]
    var tableDefs = Map.empty[String, StructType]
    // `insert into Out` from MULTIPLE queries is the reference's fan-in:
    // the named stream carries the UNION of every writer (a
    // StreamJunction merging publishers). Tables are excluded — their
    // multi-writer semantics are the keyed MERGE in applyDml.
    def feed(target: String, df: DataFrame): DataFrame = {
      val next = env.get(target) match {
        case Some(prev) if !tableDefs.contains(target) =>
          if (prev.columns.toSet != df.columns.toSet)
            fail(s"queries inserting into '$target' disagree on its " +
              s"schema: [${prev.columns.mkString(", ")}] vs " +
              s"[${df.columns.mkString(", ")}]")
          prev.unionByName(df)
        case _ => df
      }
      env += target -> next
      next
    }
    var aggDefs = Map.empty[String, AggDef]
    var windowDefs = Map.empty[String, WindowSpec]
    var results = Map.empty[String, DataFrame]
    // DML writers per table, for the per-event enrichment-join route —
    // the batch twin of the live fold's dmlInfos
    var dmlWriters = Map.empty[String, List[(Ast, Action, StructType,
      String)]]
    // @OnError(action='STREAM') prepass: an annotated stream S gets a
    // fault twin `!S` BEFORE any query compiles. v1 fault class =
    // integer divide/modulo by zero (Siddhi's runtime-exception routing
    // re-expressed as the routing predicate the expressions imply —
    // engine twin: Ops.faultStream's validation-predicate union): every
    // query reading S contributes the zero-divisor conditions of its
    // filter/select/having expressions; rows matching any condition
    // route to !S with _error, and S's own readers see only the clean
    // complement (an erroring event produces no main output).
    val onErrStreams = stmts.collect { case (_, b, true) =>
      val p0 = new P(lex(b))
      p0.eatKw("define")
      if (!p0.tryKw("stream"))
        fail("@OnError annotates a `define stream` (v1)")
      p0.ident()
    }
    onErrStreams.foreach { sN =>
      val (fault, clean) =
        onErrorSplit(loadTable(spark, dir, sN, env), stmts, sN)
      env += ("!" + sN) -> fault
      env += sN -> clean
    }
    var i = 0
    stmts.foreach { case (name, body, _) =>
      val head = body.split("\\s+", 2).headOption.getOrElse("")
      if (head.equalsIgnoreCase("define")) {
        // `define table T (col type, ...)` declares mutable state the DML
        // forms target; `define stream` stays a no-op (schemas come from
        // parquet)
        val p = new P(lex(body))
        p.eatKw("define")
        if (p.tryKw("table")) {
          val tname = p.ident()
          p.eatSym("(")
          val fields = List.newBuilder[StructField]
          def one(): StructField = {
            val c = p.ident()
            StructField(c, typeOf(p.ident()))
          }
          fields += one()
          while (p.trySym(",")) fields += one()
          p.eatSym(")")
          val schema = StructType(fields.result())
          tableDefs += tname -> schema
          env += tname -> spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        } else if (p.tryKw("window")) {
          // `define window W (col type, ...) timeBatch(1 min)` — a SHARED
          // window: queries `insert into W` feed it, any number of later
          // queries `from W` read THROUGH the same window spec (the
          // reference's named-window sharing; engine twin:
          // named_window_shared). Batch replay: the fed rows carry the
          // spec, each reader compiles as fed-stream#window.spec — plan
          // composition again, so Catalyst fuses feeder and readers
          val wname = p.ident()
          p.eatSym("(")
          // schema comes from the feeding query; names are declarative
          var done = false
          while (!done) { p.ident(); p.ident()
            if (!p.trySym(",")) { p.eatSym(")"); done = true } }
          windowDefs += wname -> p.windowNameArgs()
        } else if (p.tryKw("trigger")) {
          // `define trigger T at every 10 min` — a tick stream. Batch
          // replay spans the replayed feed's event-time range (aligned
          // ticks over [min, max] of events.ts_ns); a deployment would
          // drive the same plan from wall-clock (engine twin:
          // graft.engine.Ops.triggerGapfill / a rate source)
          val tname = p.ident()
          p.eatKw("at"); p.eatKw("every")
          val ivNs = p.duration()
          val ivMs = ivNs / 1000000L
          val ticks = Tables.events(spark, dir)
            .agg(expr(s"(min(ts_ns) div ${ivNs}L) * ${ivMs}L").as("__lo"),
              expr(s"(max(ts_ns) div ${ivNs}L) * ${ivMs}L").as("__hi"))
            .select(explode(sequence(col("__lo"), col("__hi"),
              lit(ivMs))).as("tick_ms"))
          env += tname -> ticks
        } else if (p.tryKw("function")) {
          registerScriptFn(body)
        } else if (p.tryKw("aggregation")) {
          val (aname, adef) = parseAggDefRest(p)
          aggDefs += aname -> adef
        }
      } else if (head.equalsIgnoreCase("partition")) {
        // partition with (user_id of S) / (cond as 'label' or ... of S)
        // begin <queries> end — per-key isolated query instances
        // (SURVEY §1.1; engine twins: graft.engine.Ops.partitionPerKey /
        // partitionRange). Spark's shuffle IS the partition: the key
        // prepends to every inner grouping and partitions lengthBatch
        // chunking, so the reference's per-key instances become ONE
        // keyed plan — per-key parallel at any executor count (and the
        // global-lengthBatch single-task caveat disappears inside a
        // partition: chunks count per key)
        val (innerBody, keyAttr, rs, srcName) = parsePartition(body)
        val baseDf = loadTable(spark, dir, srcName, env)
        val (partKey, view) = keyAttr match {
          case Some(attr) =>
            if (!baseDf.columns.contains(attr))
              fail(s"partition attribute '$attr' is not a column of " +
                s"'$srcName'")
            (attr, baseDf)
          case None =>
            // first matching range labels the event; unmatched events
            // leave the partition (Siddhi range-partition semantics)
            val keyCol = rs.tail.foldLeft(
              when(expr(sqlOf(rs.head._1)), lit(rs.head._2))) {
              case (acc, (c, l)) => acc.when(expr(sqlOf(c)), lit(l))
            }
            ("partition_key",
              baseDf.withColumn("partition_key", keyCol)
                .where(col("partition_key").isNotNull))
        }
        val envInner = env + (srcName -> view)
        innerBody.split(";").map(_.trim).filter(_.nonEmpty)
          .flatMap(stripAnnotations).foreach { case (qName, qBody, _) =>
          val ast0 = new P(lex(qBody)).query()
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
          val df = compileAst(spark, dir, ast, envInner, aggDefs,
            partKey = Some(partKey))
          val key = qName.orElse(ast.action.map(_.target)).getOrElse {
            i += 1; s"q$i"
          }
          ast.action.foreach(a => feed(a.target, df))
          results += key -> df
        }
      } else if (head.equalsIgnoreCase("from")) {
        val ast = new P(lex(body)).query()
        val dml = ast.action.filter {
          case InsertInto(t) => tableDefs.contains(t)
          case _             => true
        }
        dml match {
          case Some(act) =>
            val schema = tableDefs.getOrElse(act.target, fail(
              s"'${act.target}' is not a defined table — add " +
                s"`define table ${act.target}(...)` before the DML query"))
            val next =
              applyDml(spark, dir, ast, act, schema, env(act.target), env)
            env += act.target -> next
            ast.stream match {
              case ss: SingleStream =>
                dmlWriters += act.target ->
                  (dmlWriters.getOrElse(act.target, Nil)
                    :+ ((ast, act, schema, ss.table)))
              case _ => () // applyDml already failed non-single streams
            }
            val key = name
              .orElse(Some(act.target).filterNot(results.contains))
              .getOrElse { i += 1; s"q$i" }
            results += key -> next
          case None =>
            // reading a named window compiles as fed-stream#window.spec
            val ast1 = ast.stream match {
              case ss: SingleStream if windowDefs.contains(ss.table) &&
                  ss.window.isEmpty =>
                if (!env.contains(ss.table))
                  fail(s"named window '${ss.table}' has not been fed — " +
                    "add an `insert into ${ss.table}` query first")
                ast.copy(stream = ss.copy(
                  window = Some(windowDefs(ss.table))))
              case _ => ast
            }
            val df = ast1.stream match {
              // joining a DML-maintained table = the per-event
              // enrichment join (the event sees the table as of its
              // own stream position, not the end-of-replay state) —
              // the same construction the live fold runs per batch,
              // called once here with an empty seed over the whole
              // replay
              case j2: JoinStream
                  if dmlWriters.contains(j2.right.table) ||
                     dmlWriters.contains(j2.left.table) =>
                if (dmlWriters.contains(j2.left.table))
                  fail("live enrichment joins put the maintained " +
                    "table on the RIGHT side (v1) — swap the join " +
                    "sides")
                val ws = dmlWriters(j2.right.table)
                if (ws.length > 1)
                  fail("live enrichment joins read a table with ONE " +
                    s"DML writer (v1); '${j2.right.table}' has " +
                    s"${ws.length}")
                val enr = enrichCompile(spark, dir, ast1, j2, ws.head,
                  emptyOf(spark, ws.head._3), env)
                val ordered =
                  if (ast1.orderBy.isEmpty) enr
                  else enr.orderBy(ast1.orderBy.map { case (c, asc) =>
                    if (asc) col(c).asc else col(c).desc }: _*)
                ordered
              case _ => compileAst(spark, dir, ast1, env, aggDefs)
            }
            val key = name.orElse(ast.action.map(_.target)).getOrElse {
              i += 1; s"q$i"
            }
            ast.action.foreach(a => feed(a.target, df))
            results += key -> df
        }
      } else fail(s"unsupported statement: '${body.take(40)}...'")
    }
    results
  }

  /** Split an app into `(optional @info name, statement body)` pairs:
    * ';' outside string literals separates statements, except inside
    * `partition with (...) begin q1; q2; end` blocks, whose segments are
    * re-joined into one statement. */
  private def splitStatements(app: String)
      : List[(Option[String], String, Boolean)] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var inDq = false // JS double-quoted strings inside function bodies
    var brace = 0    // `define function ... { return ...; }` bodies
    app.foreach {
      case '\'' if !inDq => inStr = !inStr; cur += '\''
      case '"' if !inStr => inDq = !inDq; cur += '"'
      case '{' if !inStr && !inDq => brace += 1; cur += '{'
      case '}' if !inStr && !inDq => brace -= 1; cur += '}'
      case ';' if !inStr && !inDq && brace == 0 =>
        out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    val flat = out.result().map(_.trim).filter(_.nonEmpty)
    val joined = List.newBuilder[String]
    val block = new StringBuilder
    var depth = 0
    def words(s: String, w: String): Int =
      ("(?i)\\b" + w + "\\b").r.findAllIn(s).length
    flat.foreach { seg =>
      val d = words(seg, "begin") - words(seg, "end")
      if (depth == 0 && d == 0) joined += seg
      else {
        if (block.nonEmpty) block.append("; ")
        block.append(seg)
        depth += d
        if (depth == 0) { joined += block.toString; block.clear() }
        else if (depth < 0) fail("unbalanced begin/end")
      }
    }
    if (depth != 0) fail("partition block missing 'end'")
    joined.result().flatMap(stripAnnotations)
  }

  /** Strip leading `@name(...)` / `@ns:name(...)` annotations from a
    * statement — real reference apps open with `@app:name('…')` and
    * decorate streams with `@source(type='kafka', @map(type='json'))` /
    * `@sink(...)` transport config (deployment concerns, documented
    * delta SURVEY §7.4; nested annotations and quoted strings are
    * skipped with a balanced scan). `@info(name='x')` is kept as the
    * query name; an annotation-only statement (e.g. a bare `@app:name`)
    * dissolves. */
  private def stripAnnotations(stmt: String)
      : Option[(Option[String], String, Boolean)] = {
    var s = stmt
    var name: Option[String] = None
    var onErr = false
    var go = true
    while (go) {
      val m = "(?s)^@\\s*([A-Za-z_][A-Za-z0-9_]*(?::[A-Za-z_][A-Za-z0-9_]*)?)\\s*\\("
        .r.findFirstMatchIn(s)
      m match {
        case None => go = false
        case Some(mm) =>
          // balanced-paren scan from the annotation's '(' — respects
          // single-quoted strings and nested @map(...) annotations
          var i = mm.end - 1
          var depth = 0
          var inStr = false
          var endAt = -1
          while (endAt < 0 && i < s.length) {
            s(i) match {
              case '\'' => inStr = !inStr
              case '(' if !inStr => depth += 1
              case ')' if !inStr =>
                depth -= 1
                if (depth == 0) endAt = i
              case _ => ()
            }
            i += 1
          }
          if (endAt < 0) fail(s"unbalanced annotation: '${s.take(40)}...'")
          val ann = mm.group(1).toLowerCase
          if (ann == "info") {
            val body = s.substring(mm.end, endAt)
            name = "name\\s*=\\s*'([^']*)'".r.findFirstMatchIn(body)
              .map(_.group(1)).orElse(name)
          }
          if (ann == "onerror") {
            // `@OnError(action='STREAM')` — the annotated stream gets a
            // fault twin readable as `from !S` (other actions are sink
            // retry policy, out of engine scope)
            val body = s.substring(mm.end, endAt)
            if ("(?i)action\\s*=\\s*'STREAM'".r.findFirstIn(body).isEmpty)
              fail("@OnError supports action='STREAM' (v1); got " +
                s"'@OnError($body)'")
            onErr = true
          }
          s = s.substring(endAt + 1).trim
      }
    }
    if (s.isEmpty) None else Some((name, s, onErr))
  }

  // ---------- incremental aggregation (define aggregation + within/per) --
  /** Grain ladder, finest first (`sec ... day` ranges expand over this). */
  private val grainLadder = List("sec" -> 1000L, "min" -> 60000L,
    "hour" -> 3600000L, "day" -> 86400000L)
  private def grainKey(g: String): String = g.toLowerCase match {
    case "sec" | "second" | "seconds" => "sec"
    case "min" | "minute" | "minutes" => "min"
    case "hour" | "hours"             => "hour"
    case "day" | "days"               => "day"
    case other => fail(s"unknown aggregation grain '$other' " +
      "(sec|min|hour|day)")
  }
  private def grainMsOf(g: String): Long =
    grainLadder.find(_._1 == g).get._2

  /** A parsed `define aggregation`: the stored-select shape plus the
    * grain range it maintains. */
  private final case class AggDef(source: String, filter: Option[Expr],
      select: List[SelItem], groupBy: List[String], tsAttr: String,
      grains: List[String])

  private def typeOf(t: String): DataType = t.toLowerCase match {
    case "int"    => IntegerType
    case "long"   => LongType
    case "float"  => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "bool"   => BooleanType
    case other => fail(s"define table: unknown type '$other'")
  }

  /** One stream→table DML statement under batch-replay semantics: the
    * source replays in event order (`ts_ns, event_id`), so per key the
    * FIRST event is the row an upsert would have inserted and the LAST
    * event carries the values the final update applied. That collapses
    * the whole replay into one `groupBy(key).agg(min_by, max_by, count)`
    * plus one keyed join against the table state — one shuffle on the
    * table key regardless of stream size, no per-event loop anywhere
    * (the 100 TB shape; a 1000-executor MERGE looks exactly like this).
    *
    * v1 restrictions (fail fast, named): single un-joined source, plain
    * filtered projection (no window/group/order), `on` must be a
    * conjunction of `Table.col == <stream expr>` equalities, and `set`
    * right-hand sides reference the stream's output attributes only —
    * `set T.n = T.n + 1`-style table folds are NOT last-event-wins
    * collapsible and stay on the engine's micro-batch upsert path
    * (graft.engine.Streaming.tableUpsert). */
  /** A table-DML / enrichment-join `on` clause → List[(table column,
    * sql over the stream side)]: a conjunction of `T.col == <expr>`
    * equalities where the non-table side may not reference `T`.
    * `qual` renders the stream-side references (the enrichment join
    * strips its stream alias with it; DML keeps plain dotted paths). */
  private def keyEqsOf(on: Expr, t: String,
      qual: List[String] => String = _.mkString(".")
      ): List[(String, String)] = {
    def rhsSql(e: Expr): String = sqlOfWith(e, {
      case tn :: _ if tn.equalsIgnoreCase(t) =>
        fail(s"'on' comparison value may not reference table '$t' " +
          "columns on both sides")
      case parts => qual(parts)
    })
    on match {
      case Bin("and", l, r) => keyEqsOf(l, t, qual) ++ keyEqsOf(r, t, qual)
      case Bin("==", Ref(tn :: c :: Nil), rhs)
          if tn.equalsIgnoreCase(t) => List((c, rhsSql(rhs)))
      case Bin("==", lhs, Ref(tn :: c :: Nil))
          if tn.equalsIgnoreCase(t) => List((c, rhsSql(lhs)))
      case other => fail("table DML 'on' must be a conjunction of " +
        s"$t.<col> == <stream expr> equalities, got '${sqlOf(other)}'")
    }
  }

  /** The per-event ENRICHMENT JOIN: `from S join T on T.k == k
    * select ...` where `T` is a table maintained by a sibling
    * `update or insert` DML stage. Siddhi processes events one at a
    * time, so the join sees the table AS OF each event's position in
    * the stream (the event's own update is visible — the DML stage is
    * declared first). Compiled as ONE keyed window pass: update rows,
    * accumulated state seeds (ordered before everything), and arriving
    * events union into a per-key timeline ordered by (ts_ns, event_id,
    * updates-before-events); `last(state, ignoreNulls)` over the
    * running frame fills each event's as-of row. One shuffle on the
    * table key — state and events co-partition, no per-event lookups,
    * no broadcast of unbounded state. Because the construction never
    * references batch boundaries, the SAME code serves both channels:
    * the live fold calls it per micro-batch with the accumulated table
    * as `accTable`, and the batch replay calls it once with an empty
    * seed over the whole-replay environment — chunking-invariance by
    * construction. */
  private def enrichCompile(sp: SparkSession, dir: String, ast: Ast,
      j: JoinStream, dmlInfo: (Ast, Action, StructType, String),
      accTable: DataFrame, env: Map[String, DataFrame]): DataFrame = {
    val (dAst, dAct, dSchema, dSrc) = dmlInfo
    val tSide = j.right; val sSide = j.left
    val tName = tSide.table
    if (j.unidirectional)
      fail("live enrichment joins are already one-directional " +
        "(events trigger, the table holds state) — drop " +
        "`unidirectional`")
    if (tSide.window.nonEmpty)
      fail("live enrichment joins read the whole maintained table " +
        s"'$tName' (v1) — no window on the table side")
    if (sSide.window.nonEmpty)
      fail("live enrichment joins are per-event lookups (v1) — no " +
        "window on the stream side")
    if (ast.select.exists(it => containsAgg(it.e)) ||
        ast.groupBy.nonEmpty || ast.having.nonEmpty)
      fail("live enrichment joins project columns (v1) — aggregate " +
        "in a downstream stage")
    if (ast.limit.nonEmpty || ast.offset.nonEmpty)
      fail("live enrichment joins have no limit/offset (v1)")
    // the maintaining DML must be PER-EVENT: a windowed-aggregate
    // writer emits at flush times, so "as-of this event" would need
    // flush-aligned state reconstruction — read it at finish instead
    dAst.stream match {
      case ss: SingleStream if ss.window.nonEmpty =>
        fail(s"live enrichment joins read a table maintained by " +
          s"per-event DML (v1) — '$tName' is maintained by a windowed " +
          "aggregate, which emits at flush times; read it as the " +
          "app's final output instead")
      case _ => ()
    }
    // implicit set (last-event-wins) or ALL-accumulator-fold set
    // (`set T.c = T.c + expr`) — the two per-event-reconstructible
    // shapes: last-wins reconstructs as a running last() window,
    // folds as a running sum of per-event deltas
    val (dOn, dFolds) = dAct match {
      case UpsertTable(_, set, on) =>
        val parsed = set.map { case (c, e) =>
          (c, foldSetOf(tName, c, e)) }
        if (parsed.exists(_._2.isEmpty) && set.nonEmpty)
          fail("live enrichment joins read a table maintained by " +
            "`update or insert` with an IMPLICIT set or accumulator " +
            s"folds (`set $tName.c = $tName.c + expr`) (v1) — other " +
            "set expressions are not per-event reconstructible")
        (on, parsed.collect { case (c, Some(f)) => c -> f })
      case a2 => fail("live enrichment joins read a table maintained " +
        s"by `update or insert` (v1); '$tName' takes " +
        s"'${a2.getClass.getSimpleName}'")
    }
    val joinKind = j.joinType match {
      case "inner" | "left_outer" => j.joinType
      case other => fail("live enrichment joins are inner or left " +
        s"outer (v1), got '$other'")
    }
    val sName = sSide.table
    val tAlias = j.rightAlias.getOrElse(tName)
    val sAlias = j.leftAlias.getOrElse(sName)
    val dmlKeys = keyEqsOf(dOn, tName)
    // join-key stream refs evaluate over the FLAT event columns —
    // strip the stream alias
    val joinKeys = keyEqsOf(j.on, tName, {
      case q :: c :: Nil
          if q.equalsIgnoreCase(sAlias) || q.equalsIgnoreCase(sName) =>
        c
      case parts => parts.mkString(".")
    })
    val keyOrder = dmlKeys.map(_._1).distinct.sorted
    if (joinKeys.map(_._1).distinct.sorted != keyOrder)
      fail("live enrichment joins match on the SAME table columns " +
        s"the DML keys on (${keyOrder.mkString(", ")}); the join " +
        s"uses (${joinKeys.map(_._1).distinct.sorted.mkString(", ")})")
    val tCols = dSchema.fieldNames.toSet
    val items = itemsOf(ast)
    // U = the DML feed's update rows (its select output) in arrival
    // order — the same projection applyDml folds
    val uBase0 = loadTable(sp, dir, dSrc, env)
    val uBase = dAst.stream match {
      case ss: SingleStream => ss.filter.fold(uBase0)(f =>
        applyFilter(sp, dir, uBase0, f, env))
      case _ => uBase0 // unreachable: DML is single-stream
    }
    val uItems = itemsOf(expandStar(dAst, uBase0.columns))
    val uSel = uBase.select(uItems.map { case (it, a2, _) =>
      expr(sqlOf(it.e)).as(a2) } :+
      struct(col("ts_ns"), col("event_id")).as("__ord"): _*)
    val updC = struct(dSchema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val updType = StructType(dSchema.fields)
    def keyC(exprs: Seq[String]): Column =
      struct(keyOrder.zip(exprs).map { case (kc, ex) =>
        expr(ex).as(s"__k_$kc") }: _*)
    val eBase0 = loadTable(sp, dir, sName, env)
    val eBase = sSide.filter.fold(eBase0)(f =>
      applyFilter(sp, dir, eBase0, f, env))
    Seq("ts_ns", "event_id").foreach(c =>
      if (!eBase.columns.contains(c))
        fail(s"live enrichment joins need '$c' on the stream side; " +
          s"'$sName' lost it — select it through"))
    val evtC = struct(eBase.columns.toSeq.map(col): _*)
    val evtType = StructType(eBase.schema.fields)
    // per-event fold deltas of the DML's update rows (null on event
    // rows, zero on the accumulated seed — its values already carry
    // every prior fold)
    val uOut = uItems.map(_._2)
    def deltaSql(e: Expr): String = sqlOfWith(e, {
      case c :: Nil if uOut.contains(c) => c
      case parts => fail(s"fold delta reference '${parts.mkString(".")}'" +
        " is not a DML select output attribute")
    })
    val fdType = StructType(dFolds.map { case (c, _) =>
      StructField(c, dSchema(c).dataType) })
    def fdOf(mk: String => Column): Column =
      struct(dFolds.map { case (c, (_, d)) =>
        mk(c).cast(dSchema(c).dataType).as(c) }: _*)
    val uTag = uSel.select(
      (Seq(keyC(keyOrder.map(c => dmlKeys.find(_._1 == c).get._2))
          .as("__key"),
        col("__ord"), updC.as("__upd")) ++
        (if (dFolds.isEmpty) Nil else Seq(fdOf(c =>
          expr(deltaSql(dFolds.find(_._1 == c).get._2._2)))
          .as("__fd")))): _*)
    // accumulated state seeds sort before every batch row
    val accTag = accTable.select(
      (Seq(keyC(keyOrder).as("__key"),
        struct(lit(Long.MinValue).as("ts_ns"),
          lit(Long.MinValue).as("event_id")).as("__ord"),
        updC.as("__upd")) ++
        (if (dFolds.isEmpty) Nil
         else Seq(fdOf(_ => lit(0)).as("__fd")))): _*)
    val uAll = uTag.unionByName(accTag)
      .withColumn("__isE", lit(false))
      .withColumn("__evt", lit(null).cast(evtType))
    val eTag = eBase.select(
      (Seq(keyC(keyOrder.map(c => joinKeys.find(_._1 == c).get._2))
          .as("__key"),
        struct(col("ts_ns"), col("event_id")).as("__ord"),
        lit(null).cast(updType).as("__upd")) ++
        (if (dFolds.isEmpty) Nil
         else Seq(lit(null).cast(fdType).as("__fd"))) ++
        Seq(lit(true).as("__isE"), evtC.as("__evt"))): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__key")
      .orderBy(col("__ord"), col("__isE"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val filled =
      if (dFolds.isEmpty)
        uAll.unionByName(eTag)
          .withColumn("__state",
            last(col("__upd"), ignoreNulls = true).over(w))
          .where(col("__isE"))
      else {
        // fold reconstruction: the first update/seed row fixes the
        // non-fold values and the fold base; each later update adds
        // its delta — running sum minus the first row's own delta
        // (an upsert-INSERT's values ride in its row, not its delta)
        val foldMap = dFolds.toMap
        val st0 = uAll.unionByName(eTag)
          .withColumn("__st0",
            first(col("__upd"), ignoreNulls = true).over(w))
        val withCums = dFolds.foldLeft(st0) { case (df, (c, _)) =>
          df.withColumn(s"__cum_$c", sum(col(s"__fd.$c")).over(w))
            .withColumn(s"__f0_$c",
              first(col(s"__fd.$c"), ignoreNulls = true).over(w))
        }
        val stateC = struct(dSchema.fields.toSeq.map { f =>
          val c = f.name
          (foldMap.get(c) match {
            case Some(("+", _)) => col(s"__st0.$c") +
              (col(s"__cum_$c") - col(s"__f0_$c"))
            case Some((_, _)) => col(s"__st0.$c") -
              (col(s"__cum_$c") - col(s"__f0_$c"))
            case None => col(s"__st0.$c")
          }).cast(f.dataType).as(c)
        }: _*)
        withCums.withColumn("__state",
          when(col("__st0").isNotNull, stateC)
            .otherwise(lit(null).cast(updType)))
          .where(col("__isE"))
      }
    // table-side filter `T[cond]`: a state row failing the condition
    // is NOT an enrichment match at that event — inner drops the
    // event, left outer null-pads it (per-event semantics: the filter
    // applies to the AS-OF state, so an event can match while a later
    // one of the same key doesn't)
    val stateFiltered = tSide.filter match {
      case None => filled
      case Some(f) =>
        val fSql = sqlOfWith(f, {
          case q :: c :: Nil if q.equalsIgnoreCase(tAlias) ||
              q.equalsIgnoreCase(tName) =>
            if (!tCols.contains(c))
              fail(s"'$c' is not a column of table '$tName'")
            s"__state.$c"
          case c :: Nil =>
            if (!tCols.contains(c))
              fail(s"table filter on '$tName' references its columns; " +
                s"'$c' is not one")
            s"__state.$c"
          case parts => fail(s"table filter on '$tName' references " +
            s"its columns; got '${parts.mkString(".")}'")
        })
        filled.withColumn("__state",
          when(col("__state").isNotNull && expr(fSql), col("__state"))
            .otherwise(lit(null).cast(updType)))
    }
    val kept =
      if (joinKind == "inner")
        stateFiltered.where(col("__state").isNotNull)
      else stateFiltered
    def qual(parts: List[String]): String = parts match {
      case q :: c :: Nil
          if q.equalsIgnoreCase(tAlias) || q.equalsIgnoreCase(tName) =>
        if (!tCols.contains(c))
          fail(s"'$c' is not a column of table '$tName'")
        s"__state.$c"
      case q :: c :: Nil
          if q.equalsIgnoreCase(sAlias) || q.equalsIgnoreCase(sName) =>
        s"__evt.$c"
      case c :: Nil =>
        val inT = tCols.contains(c)
        val inS = eBase.columns.contains(c)
        if (inT && inS) fail(s"'$c' is ambiguous — qualify it with " +
          s"'$tAlias.' or '$sAlias.'")
        else if (inT) s"__state.$c"
        else s"__evt.$c"
      case other => fail(s"bad reference ${other.mkString(".")}")
    }
    kept.select(items.map { case (it, a2, _) =>
      expr(sqlOfWith(it.e, qual)).as(a2) }: _*)
  }

  /** Does `e` reference a column of table `t` (qualified)? */
  private def refsTable(e: Expr, t: String): Boolean = e match {
    case Ref(q :: _ :: Nil) => q.equalsIgnoreCase(t)
    case Bin(_, l, r) => refsTable(l, t) || refsTable(r, t)
    case Not(x) => refsTable(x, t)
    case Neg(x) => refsTable(x, t)
    case Call(_, _, as) => as.exists(refsTable(_, t))
    case _ => false
  }

  /** Accumulator-fold set form: `set T.c = T.c + e` (or `e + T.c`, or
    * `T.c - e`) with `e` over stream attributes only → Some((op, e)).
    * These folds ARE batch-replay collapsible because per-key they
    * compose additively: final = prior ± Σ per-event deltas — one
    * keyed aggregate, no per-event loop, the same algebra the grain
    * cascade rides. Anything else (cross-column, multiplicative,
    * conditional on the table) is order-dependent and stays refused. */
  private def foldSetOf(t: String, c: String, rhs: Expr)
      : Option[(String, Expr)] = {
    def self(e: Expr): Boolean = e match {
      case Ref(q :: c2 :: Nil) =>
        q.equalsIgnoreCase(t) && c2.equalsIgnoreCase(c)
      case _ => false
    }
    rhs match {
      case Bin("+", l, r) if self(l) && !refsTable(r, t) => Some(("+", r))
      case Bin("+", l, r) if self(r) && !refsTable(l, t) => Some(("+", l))
      case Bin("-", l, r) if self(l) && !refsTable(r, t) => Some(("-", r))
      case _ => None
    }
  }

  private def applyDml(spark: SparkSession, dir: String, ast: Ast,
      act: Action, schema: StructType, table: DataFrame,
      env: Map[String, DataFrame]): DataFrame = {
    val s = ast.stream match {
      case ss: SingleStream => ss
      case _ => fail("table DML (v1) requires a single un-joined source " +
        "stream")
    }
    if (ast.having.nonEmpty || ast.orderBy.nonEmpty || ast.limit.nonEmpty ||
        ast.offset.nonEmpty || ast.rate.nonEmpty)
      fail("table DML (v1) has no having/order/limit/output rate — the " +
        "table is keyed state, not a result stream")
    val base0 = loadTable(spark, dir, s.table, env)
    if (!base0.columns.contains("ts_ns") ||
        !base0.columns.contains("event_id"))
      fail(s"table DML needs 'ts_ns' and 'event_id' on '${s.table}' to " +
        "define replay order")
    val base =
      s.filter.fold(base0)(f => applyFilter(spark, dir, base0, f, env))
    val items = itemsOf(expandStar(ast, base0.columns))
    val outCols = items.map(_._2)
    // Emission rows in replay order: one row per EVENT for the plain
    // form, one row per WINDOW-FLUSH × group for the aggregating
    // timeBatch form (Siddhi's canonical store pattern: windowed
    // aggregate → `update or insert into T`). Everything downstream —
    // merge, accumulator folds, delete — is emission-order algebra, so
    // the two forms share it via `__g_ord`.
    val sel: DataFrame = s.window match {
      case None =>
        if (ast.groupBy.nonEmpty)
          fail("group by in table DML needs a batch window " +
            "(#window.timeBatch(T)) to define flush emissions")
        items.foreach { case (_, a, isAgg) =>
          if (isAgg) fail(s"aggregating table DML ('$a') needs a batch " +
            "window (#window.timeBatch(T)) to define flush emissions")
        }
        base.select(items.map { case (it, a, _) =>
          expr(sqlOf(it.e)).as(a)
        } :+ struct(col("ts_ns"), col("event_id")).as("__g_ord"): _*)
      case Some(WindowSpec(n, tNs :: _, _))
          if n.equalsIgnoreCase("timebatch") =>
        items.foreach { case (it, a, isAgg) =>
          if (!isAgg) it.e match {
            case Ref(c :: Nil)
                if ast.groupBy.exists(_.equalsIgnoreCase(c)) => ()
            case e if !refsAttr(e) => () // constant: evaluates per flush
            case _ => fail("windowed table DML: non-aggregate select " +
              s"item '$a' must be a group-by attribute or a constant")
          }
        }
        val aggItems = items.collect { case (it, a, true) =>
          expr(sqlOf(it.e)).as(a) }
        if (aggItems.isEmpty)
          fail("windowed table DML needs at least one aggregate select " +
            "item (drop the window for per-event DML)")
        val flush = base
          .withColumn("__bucket", expr(s"ts_ns div ${tNs}L"))
          .groupBy(col("__bucket") +: ast.groupBy.map(col): _*)
          .agg(aggItems.head, aggItems.tail: _*)
        // flushes emit in bucket order; within one flush each group
        // emits exactly once, so (bucket start, 0) totally orders the
        // emissions any one merge key sees
        flush.select(items.map { case (it, a, isAgg) =>
          (if (isAgg) col(a) else expr(sqlOf(it.e))).as(a)
        } :+ struct((col("__bucket") * lit(tNs)).cast("long").as("ts_ns"),
          lit(0L).as("event_id")).as("__g_ord"): _*)
      case Some(w) =>
        fail("table DML windows (v1): #window.timeBatch(T) only — " +
          s"'#window.${w.name}' emissions are not batch-replay " +
          "collapsible here")
    }
    applyEmissions(act, schema, table, sel, outCols)
  }

  /** Merge EMISSION rows — the select output attributes plus a
    * `__g_ord` replay-order struct — into `table` per the DML action.
    * An emission is one event for plain DML and one window-flush ×
    * group row for the aggregating form; the merge algebra (first/
    * last row per key + additive accumulator folds) is identical, so
    * the batch compile and the live windowed fold's finish share it. */
  private def applyEmissions(act: Action, schema: StructType,
      table: DataFrame, sel: DataFrame, outCols: Seq[String])
      : DataFrame = {
    def keyEqs(on: Expr, t: String): List[(String, String)] =
      keyEqsOf(on, t)

    // set RHS over the per-key LAST update event's output row
    def lastSql(e: Expr, t: String): String = sqlOfWith(e, {
      case c :: Nil if outCols.contains(c) => s"__last.$c"
      case tn :: c :: Nil if tn.equalsIgnoreCase(t) =>
        fail(s"set RHS may reference the stream's output attributes only " +
          s"— general '$t.$c' table folds are not batch-replay " +
          "collapsible (accumulator folds `T.c = T.c + expr` ARE, and " +
          "collapse algebraically)")
      case parts => fail(s"set RHS reference '${parts.mkString(".")}' is " +
        "not a select output attribute")
    })
    // per-event fold contribution expression over the select outputs
    def streamSql(e: Expr): String = sqlOfWith(e, {
      case c :: Nil if outCols.contains(c) => c
      case parts => fail(s"fold delta reference '${parts.mkString(".")}'" +
        " is not a select output attribute")
    })

    def requireCovers(form: String): Unit = {
      val missing = schema.fieldNames.filterNot(outCols.contains)
      if (missing.nonEmpty)
        fail(s"$form: select output must cover every table column " +
          s"(missing: ${missing.mkString(", ")})")
    }

    /** Shared update/upsert merge; `insertMissing` = upsert. */
    def merge(t: String, set: List[(String, Expr)], on: Expr,
              insertMissing: Boolean): DataFrame = {
      val keys = keyEqs(on, t)
      val keyCols = keys.map(_._1).toSet
      keyCols.foreach { c =>
        if (!schema.fieldNames.contains(c))
          fail(s"'on' references unknown table column '$t.$c'")
      }
      if (insertMissing) requireCovers(s"update or insert into $t")
      // per set column: Left(lastSql) = last-event-wins expression,
      // Right((op, deltaSql)) = additive accumulator fold
      val eff: Map[String, Either[String, (String, String)]] =
        if (set.nonEmpty) set.map { case (c, e) =>
          if (!schema.fieldNames.contains(c))
            fail(s"set targets unknown table column '$t.$c'")
          c -> (foldSetOf(t, c, e) match {
            case Some((op, d)) => Right((op, streamSql(d)))
            case None => Left(lastSql(e, t))
          })
        }.toMap
        else schema.fieldNames.toList
          .filter(c => outCols.contains(c) && !keyCols(c))
          .map(c => c -> Left(s"__last.$c")).toMap
      val folds: List[(String, (String, String))] = eff.toList.collect {
        case (c, Right(f)) => c -> f }.sortBy(_._1)
      val row = struct(outCols.map(col): _*)
      // fold deltas aggregate per key alongside the first/last rows:
      // Σ delta over all update events, plus the FIRST event's delta
      // (subtracted when that event is an upsert-INSERT — the insert
      // row carries its values directly, later events fold on top)
      val foldAggs: Seq[Column] = folds.flatMap { case (c, _) =>
        Seq(sum(col(s"__fd_$c")).as(s"__fs_$c"),
          min_by(col(s"__fd_$c"), col("__g_ord")).as(s"__ffv_$c"))
      }
      val uAgg = sel
        .select((keys.zipWithIndex.map { case ((_, rhs), i) =>
          expr(rhs).as(s"__k$i")
        } ++ Seq(row.as("__row"), col("__g_ord")) ++
          folds.map { case (c, (_, d)) => expr(d).as(s"__fd_$c") }): _*)
        .groupBy(keys.indices.map(i => col(s"__k$i")): _*)
        .agg(min_by(col("__row"), col("__g_ord")).as("__first"),
          (max_by(col("__row"), col("__g_ord")).as("__last") +:
            count(lit(1)).as("__n") +: foldAggs): _*)
        .withColumn("__has_u", lit(true))
      val tt = table.withColumn("__has_t", lit(true))
      val cond = keys.zipWithIndex.map { case ((tc, _), i) =>
        tt(tc) === uAgg(s"__k$i")
      }.reduce(_ && _)
      val joined = tt.join(uAgg, cond,
        if (insertMissing) "full_outer" else "left_outer")
      val out = schema.fields.map { f =>
        val c = f.name
        val hasT = col("__has_t").isNotNull
        val hasU = col("__has_u").isNotNull
        val v: Column =
          if (keyCols(c)) {
            val i = keys.indexWhere(_._1 == c)
            coalesce(col(c), col(s"__k$i"))
          } else eff.get(c) match {
            case Some(Left(sqlLast)) if insertMissing =>
              // matched, or inserted-then-updated (≥2 events): last
              // update wins; single inserting event: the insert row
              when(hasT && hasU, expr(sqlLast))
                .when(!hasT && hasU && col("__n") > 1, expr(sqlLast))
                .when(!hasT && hasU, col(s"__first.$c"))
                .otherwise(col(c))
            case Some(Left(sqlLast)) =>
              when(hasU, expr(sqlLast)).otherwise(col(c))
            case Some(Right((op, _))) =>
              // accumulator fold: matched → prior ± Σ deltas; upsert
              // insert → first row's value, then ± deltas of the
              // LATER events (Σ − first's delta)
              val fs = col(s"__fs_$c"); val ff = col(s"__ffv_$c")
              def app(b2: Column, d2: Column): Column =
                if (op == "+") b2 + d2 else b2 - d2
              if (insertMissing)
                when(hasT && hasU, app(col(c), fs))
                  .when(!hasT && hasU,
                    app(col(s"__first.$c"), fs - ff))
                  .otherwise(col(c))
              else when(hasU, app(col(c), fs)).otherwise(col(c))
            case None if insertMissing =>
              when(hasT, col(c)).otherwise(col(s"__first.$c"))
            case None => col(c)
          }
        v.cast(f.dataType).as(c)
      }
      joined.select(out.toSeq: _*)
    }

    act match {
      case InsertInto(t) =>
        requireCovers(s"insert into $t")
        table.unionByName(sel.select(schema.fields.map(f =>
          col(f.name).cast(f.dataType).as(f.name)).toSeq: _*))
      case DeleteTable(t, on) =>
        val keys = keyEqs(on, t)
        val kdf = sel.select(keys.zipWithIndex.map { case ((_, rhs), i) =>
          expr(rhs).as(s"__k$i")
        }: _*).distinct()
        val cond = keys.zipWithIndex.map { case ((tc, _), i) =>
          table(tc) === kdf(s"__k$i")
        }.reduce(_ && _)
        table.join(kdf, cond, "left_anti")
      case UpdateTable(t, set, on) => merge(t, set, on, insertMissing = false)
      case UpsertTable(t, set, on) => merge(t, set, on, insertMissing = true)
    }
  }

  private def compileOne(spark: SparkSession, dir: String, query: String,
                         env: Map[String, DataFrame]): DataFrame =
    compileAst(spark, dir, new P(lex(query)).query(), env)

  private def compileAst(spark: SparkSession, dir: String, ast: Ast,
                         env: Map[String, DataFrame],
                         aggDefs: Map[String, AggDef] = Map.empty,
                         partKey: Option[String] = None): DataFrame = {
    ast.action.foreach {
      case _: InsertInto => ()
      case a => fail(s"table DML targeting '${a.target}' needs an app " +
        "context: use compileApp with a `define table` declaration")
    }
    val selected = (ast.rate, ast.stream) match {
      case (Some(r), s: SingleStream) =>
        compileRateLimited(spark, dir, ast, s, r, env)
      case (Some(r), jn: JoinStream) =>
        compileJoin(spark, dir, ast, jn, env, aggDefs, Some(r))
      case (Some(r), pt: PatternStream) =>
        compilePattern(spark, dir, ast, pt, Some(r))
      case (None, s: SingleStream) if aggDefs.contains(s.table) =>
        compileAggQuery(spark, dir, ast, s, aggDefs(s.table), env)
      case (None, s: SingleStream) =>
        if (s.aggWithin.nonEmpty || s.aggPer.nonEmpty)
          fail(s"within/per reads require `define aggregation " +
            s"${s.table}` in an app context (compileApp)")
        compileSingle(spark, dir, ast, s, env, partKey)
      case (None, j: JoinStream) =>
        compileJoin(spark, dir, ast, j, env, aggDefs)
      case (None, pt: PatternStream) => compilePattern(spark, dir, ast, pt)
    }
    val ordered =
      if (ast.orderBy.isEmpty) selected
      else selected.orderBy(ast.orderBy.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc
      }: _*)
    // Siddhi's limit/offset: offset skips M output rows, limit caps what
    // follows (Spark's offset/limit compose in that order)
    val off = ast.offset.fold(ordered)(m => ordered.offset(m.toInt))
    ast.limit.fold(off)(n => off.limit(n.toInt))
  }

  /** Evaluate a select/retention expression over a buffered window of
    * events: aggregates fold over `buf`, plain refs read the CURRENT
    * event. Shared by the batch expression window and the live length
    * window — the per-key buffered-fold interpreter. */
  private def bufEval(e: Expr, buf: scala.collection.Seq[Cep.Ev],
      cur: Cep.Ev): Any = e match {
    case Num(t) => if (t.contains('.')) t.toDouble else t.toLong
    case Str(v) => v
    case Ref(f :: Nil) => field(cur, f)
    case Call(None, "count", Nil) => buf.size.toLong
    case Call(None, n2 @ ("sum" | "avg" | "min" | "max"),
        List(Ref(f :: Nil))) =>
      val xs: Seq[Double] = buf.map(ev2 => num(field(ev2, f))).toSeq
      n2 match {
        case "sum" => xs.sum
        case "avg" => xs.sum / xs.size
        case "min" => xs.min
        case "max" => xs.max
      }
    case Call(Some("math"), "round", List(x, Num(d))) =>
      BigDecimal(num(bufEval(x, buf, cur)))
        .setScale(d.toInt, BigDecimal.RoundingMode.HALF_UP).toDouble
    case Not(x) => !bufEval(x, buf, cur).asInstanceOf[Boolean]
    case Neg(x) => -num(bufEval(x, buf, cur))
    case Bin(op, l, r) => op match {
      case "and" => bufEval(l, buf, cur).asInstanceOf[Boolean] &&
        bufEval(r, buf, cur).asInstanceOf[Boolean]
      case "or" => bufEval(l, buf, cur).asInstanceOf[Boolean] ||
        bufEval(r, buf, cur).asInstanceOf[Boolean]
      case "==" => num(bufEval(l, buf, cur)) == num(bufEval(r, buf, cur))
      case "!=" => num(bufEval(l, buf, cur)) != num(bufEval(r, buf, cur))
      case "<"  => num(bufEval(l, buf, cur)) < num(bufEval(r, buf, cur))
      case "<=" => num(bufEval(l, buf, cur)) <= num(bufEval(r, buf, cur))
      case ">"  => num(bufEval(l, buf, cur)) > num(bufEval(r, buf, cur))
      case ">=" => num(bufEval(l, buf, cur)) >= num(bufEval(r, buf, cur))
      case "+" => num(bufEval(l, buf, cur)) + num(bufEval(r, buf, cur))
      case "-" => num(bufEval(l, buf, cur)) - num(bufEval(r, buf, cur))
      case "*" => num(bufEval(l, buf, cur)) * num(bufEval(r, buf, cur))
      case "/" => num(bufEval(l, buf, cur)) / num(bufEval(r, buf, cur))
      case o => fail(s"operator '$o' unsupported in a buffered window")
    }
    case other2 => fail("unsupported construct in a buffered window: " +
      other2.getClass.getSimpleName)
  }

  /** Output schema of a buffered-fold select list (what [[bufEval]]
    * actually returns per item). */
  private def evOutTypes(items: Seq[(SelItem, String, Boolean)])
      : Seq[(String, DataType)] = items.map { case (it, a, isAgg) =>
    val t: DataType = it.e match {
      case Call(None, "count", Nil) => LongType
      case _ if isAgg => DoubleType
      case Ref(f :: Nil) => f match {
        case "event_type" => StringType
        case "value" => DoubleType
        case _ => LongType
      }
      case _ => DoubleType
    }
    (a, t)
  }

  /** An AND-chain contains at least one equality — the key a windowed
    * band join shards on (a pure time-band join would be a nested loop
    * at scale). */
  private def hasEqui(e: Expr): Boolean = e match {
    case Bin("and", a, b) => hasEqui(a) || hasEqui(b)
    case Bin("==", _, _) => true
    case _ => false
  }

  /** Expand `select *` (alone or among other items) to the source's
    * column list, keeping any explicitly named items around it. */
  private def expandStar(ast: Ast, cols: Seq[String]): Ast =
    if (!ast.select.exists(_.e == Star)) ast
    else ast.copy(select = ast.select.flatMap {
      case SelItem(Star, Some(_)) => fail("`*` cannot take an alias")
      case SelItem(Star, None) => cols.map(c => SelItem(Ref(List(c)), None))
      case it => List(it)
    })

  private def alias(it: SelItem, i: Int): String = it.alias.getOrElse(
    it.e match {
      case Ref(parts) => parts.last
      case _ => s"col$i"
    })

  /** Select-item bookkeeping shared by the single-stream, windowed, and
    * join paths: (item, output alias, is-aggregate). */
  private def itemsOf(ast: Ast) = ast.select.zipWithIndex.map {
    case (it, i) => (it, alias(it, i), containsAgg(it.e))
  }

  /** Grouped aggregation over `df` (plus any window-derived implicit
    * keys), or a plain projection when no item aggregates. */
  private def selectOrAggregate(ast: Ast, df: DataFrame,
      implicitKeys: Seq[(String, Column)], windowed: Boolean,
      carry: Seq[Column] = Nil): DataFrame = {
    val items = itemsOf(ast)
    val aggCols = items.collect { case (it, a, true) =>
      expr(sqlOf(it.e)).as(a)
    }
    if (aggCols.isEmpty) {
      if (windowed) fail("a windowed query needs an aggregate select")
      if (ast.having.nonEmpty) fail("having needs an aggregation")
      df.select(items.map { case (it, a, _) =>
        expr(sqlOf(it.e)).as(a)
      } ++ carry: _*)
    } else {
      items.collect { case (it, _, false) => it }.foreach { it =>
        it.e match {
          // a bare or stream-qualified column that is a group key
          // (the key may have been rewritten to its qualified form by
          // the join path's ambiguity resolution)
          case Ref(parts) if ast.groupBy.contains(parts.last) ||
              ast.groupBy.contains(parts.mkString(".")) => ()
          case _ => fail(s"non-aggregate select item " +
            s"'${sqlOf(it.e)}' must be a group by column")
        }
      }
      val keyCols = implicitKeys.map(_._2) ++ ast.groupBy.map(col)
      val agged = df.groupBy(keyCols: _*)
        .agg(aggCols.head, aggCols.tail: _*)
      val out = implicitKeys.map { case (n, _) => col(n) } ++
        items.map { case (it, a, isAgg) =>
          if (isAgg) col(a)
          else it.e match { case Ref(parts) => col(parts.last).as(a)
                            case _ => col(a) }
        }
      val hav = ast.having.fold(agged)(h => agged.where(expr(sqlOf(h))))
      hav.select(out: _*)
    }
  }

  /** Quartz cron → a fixed tick interval, for the forms whose marks ARE
    * epoch-aligned fixed intervals: `0 0/M * * * ?` with M dividing 60
    * (Quartz resets the 0/M sequence each hour, so M ∤ 60 would drift
    * from epoch alignment), `0 0 0/H * * ?` with H dividing 24, and
    * `0 0 * * * ?` (hourly). Sparse calendar fields (day-of-week, month
    * lists) have no fixed-interval batch-replay equivalent — fail fast. */
  private def cronIntervalNs(spec: String): Long = {
    val f = spec.trim.split("\\s+")
    def every(field: String): Option[Long] =
      if (field.startsWith("0/") || field.startsWith("*/"))
        Some(field.drop(2).toLong) else None
    val ns: Option[Long] =
      if (f.length == 6 && f(0) == "0" && f(3) == "*" && f(4) == "*")
        every(f(1)) match {
          case Some(m) if f(2) == "*" && m > 0 && 60 % m == 0 =>
            Some(m * 60L * 1000000000L)
          case None if f(1) == "0" =>
            every(f(2)) match {
              case Some(h) if h > 0 && 24 % h == 0 =>
                Some(h * 3600L * 1000000000L)
              case None if f(2) == "*" => Some(3600L * 1000000000L)
              case _ => None
            }
          case _ => None
        }
      else None
    ns.getOrElse(fail(s"unsupported cron expression '$spec' — supported" +
      " forms: '0 0/M * * * ?' (M | 60), '0 0 0/H * * ?' (H | 24), " +
      "'0 0 * * * ?' (hourly); sparse calendar schedules have no " +
      "fixed-interval batch-replay equivalent"))
  }


  /** `@OnError(action='STREAM')` split for stream `sN`: (fault twin,
    * clean view). v1 fault class = integer divide/modulo by zero,
    * derived from the zero-divisor conditions implied by every query
    * reading `sN` in the app (engine twin: Ops.faultStream's
    * validation-predicate union) — single-stream queries, partition
    * blocks over `sN` (inner queries + range-label conditions), and
    * the `sN` side of joins / pattern steps (side-local expressions
    * only: a divisor referencing the OTHER join side cannot be
    * evaluated per-`sN`-event, so it contributes nothing — the pair
    * fault routes with the erroring event, out of v1 scope). Stream
    * names match case-insensitively, like the rest of the compiler.
    * Rows matching any condition route to `!sN` with `_error`; clean
    * readers see the exact complement (an erroring event produces no
    * main output). Shared by the batch replay and the live deployment:
    * both split filters are OR-extended with the flush-sentinel region
    * (`ts >= flushCutoff`) so they stay above the source watermark
    * node and sentinels reach BOTH branches — a stateful live reader
    * of `!sN` (or of the clean view when a divisor happens to be zero
    * on the sentinel's synthetic values) still sees the watermark
    * advance; stateful operators drop sentinels right above
    * themselves, and the batch replay has no `ts` in that region so
    * the extension is the identity there. */
  private def onErrorSplit(base: DataFrame,
      stmts: List[(Option[String], String, Boolean)], sN: String)
      : (DataFrame, DataFrame) = {
    def divisors(e: Expr): List[Expr] = e match {
      case Bin(op, l, r) if op == "/" || op == "%" =>
        r :: divisors(l) ::: divisors(r)
      case Bin(_, l, r) => divisors(l) ::: divisors(r)
      case Not(x) => divisors(x)
      case Neg(x) => divisors(x)
      case Call(_, _, args) => args.flatMap(divisors)
      case _ => Nil
    }
    def isSn(t: String): Boolean = t.equalsIgnoreCase(sN)
    // Rewrite a divisor to `sN`-local form: refs qualified by an `sN`
    // alias/binding drop the qualifier; refs qualified by another
    // stream's alias make the divisor non-local → None (dropped).
    def localize(e: Expr, snQ: Set[String], otherQ: Set[String])
        : Option[Expr] = e match {
      case Ref(q :: c :: Nil) if snQ.exists(_.equalsIgnoreCase(q)) =>
        Some(Ref(c :: Nil))
      case Ref(q :: _) if otherQ.exists(_.equalsIgnoreCase(q)) => None
      case Ref(_) | Num(_) | Str(_) => Some(e)
      case Bin(op, l, r) => for { a <- localize(l, snQ, otherQ)
                                  b <- localize(r, snQ, otherQ) }
                            yield Bin(op, a, b)
      case Not(x) => localize(x, snQ, otherQ).map(Not)
      case Neg(x) => localize(x, snQ, otherQ).map(Neg)
      case Call(ns, n, as) =>
        val ls = as.map(localize(_, snQ, otherQ))
        if (ls.forall(_.nonEmpty)) Some(Call(ns, n, ls.map(_.get)))
        else None
      case _ => None
    }
    def fromAst(ast: Ast): List[Expr] = ast.stream match {
      case ss: SingleStream if isSn(ss.table) =>
        (ss.filter.toList ++ ast.select.map(_.e) ++
          ast.having.toList).flatMap(divisors)
      case j: JoinStream if isSn(j.left.table) || isSn(j.right.table) =>
        val sides = List(j.left -> j.leftAlias, j.right -> j.rightAlias)
        val snQ = sides.collect { case (s, a) if isSn(s.table) =>
          a.getOrElse(s.table) }.toSet
        val otherQ = sides.collect { case (s, a) if !isSn(s.table) =>
          a.getOrElse(s.table) }.toSet
        val local = sides.collect { case (s, _) if isSn(s.table) =>
          s.filter.toList }.flatten.flatMap(divisors)
        val shared = (j.on :: ast.select.map(_.e) ++ ast.having.toList)
          .flatMap(divisors)
        local ::: shared.flatMap(localize(_, snQ, otherQ))
      case p: PatternStream =>
        val snBind = p.steps.flatMap {
          case PatCond(b2, t, _, _, _) if isSn(t) => List(b2)
          case PatPair(_, b1, t1, _, b2, t2, _) =>
            (if (isSn(t1)) List(b1) else Nil) :::
              (if (isSn(t2)) List(b2) else Nil)
          case _ => Nil
        }.toSet
        val otherBind = p.steps.flatMap {
          case PatCond(b2, t, _, _, _) if !isSn(t) => List(b2)
          case PatPair(_, b1, t1, _, b2, t2, _) =>
            (if (!isSn(t1)) List(b1) else Nil) :::
              (if (!isSn(t2)) List(b2) else Nil)
          case _ => Nil
        }.toSet
        val stepLocal = p.steps.flatMap {
          case PatCond(_, t, c, _, _) if isSn(t) => divisors(c)
          case PatAbsent(t, c, _) if isSn(t) => divisors(c)
          case PatPair(_, _, t1, c1, _, t2, c2) =>
            (if (isSn(t1)) divisors(c1) else Nil) :::
              (if (isSn(t2)) divisors(c2) else Nil)
          case _ => Nil
        }
        if (snBind.isEmpty && stepLocal.isEmpty) Nil
        else stepLocal.flatMap(localize(_, snBind, otherBind)) :::
          (ast.select.map(_.e) ++ ast.having.toList).flatMap(divisors)
            .flatMap(localize(_, snBind, otherBind))
      case _ => Nil
    }
    val conds: Seq[Column] = stmts.flatMap { case (_, b, _) =>
      val head = b.split("\\s+", 2).headOption.getOrElse("")
      if (head.equalsIgnoreCase("from"))
        scala.util.Try(fromAst(new P(lex(b)).query())).getOrElse(Nil)
      else if (head.equalsIgnoreCase("partition")) scala.util.Try {
        val (innerBody, _, ranges, srcName) = parsePartition(b)
        if (!isSn(srcName)) Nil
        else ranges.map(_._1).flatMap(divisors) :::
          innerBody.split(";").map(_.trim).filter(_.nonEmpty).toList
            .flatMap(stripAnnotations).flatMap { case (_, qb, _) =>
              scala.util.Try {
                val a = new P(lex(qb)).query()
                a.stream match {
                  case ss: SingleStream if isSn(ss.table) ||
                      ss.table.equalsIgnoreCase(srcName) => fromAst(
                    a.copy(stream = ss.copy(table = sN)))
                  case _ => fromAst(a)
                }
              }.getOrElse(Nil)
            }
      }.getOrElse(Nil)
      else Nil
    }.map(sqlOf).distinct.flatMap { rTxt =>
      scala.util.Try {
        val c = expr(rTxt)
        base.select(c).schema.head.dataType match {
          case LongType | IntegerType | ShortType | ByteType =>
            Some(c === 0)
          case _ => None // double division never faults (IEEE inf)
        }
      }.toOption.flatten
    }
    val faultAny = coalesce(
      conds.reduceOption(_ || _).getOrElse(lit(false)), lit(false))
    // both branches keep the sentinel region (no-op for batch replay —
    // real data never reaches ts >= flushCutoff)
    val sentinel: Column =
      if (base.columns.contains("ts"))
        col("ts") >= graft.engine.Streaming.flushCutoff
      else lit(false)
    (base.filter(faultAny || sentinel)
       .withColumn("_error", when(sentinel, lit(null).cast("string"))
         .otherwise(lit("divide_by_zero"))),
      base.filter(!faultAny || sentinel))
  }

  /** Env lookup matching the compiler's case-insensitive stream-name
    * semantics: exact key first (the common case, free), then a
    * case-insensitive scan — so `from Events` reads the same declared
    * view (e.g. an @OnError clean split) as `from events` instead of
    * silently falling through to the raw table. */
  private def envLookup(env: Map[String, DataFrame], name: String)
      : Option[DataFrame] =
    env.get(name).orElse(env.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v })

  private def loadTable(spark: SparkSession, dir: String, name: String,
                        env: Map[String, DataFrame]): DataFrame =
    envLookup(env, name).getOrElse(
      if (name.startsWith("!"))
        fail(s"fault stream '$name' needs an app context with " +
          s"`@OnError(action='STREAM') define stream ${name.drop(1)} " +
          "(...)`")
      else if (name.equalsIgnoreCase("events")) Tables.events(spark, dir)
      else Tables.table(spark, dir, name))

  /** Apply a stream filter that may contain `<expr> in Table` membership
    * conjuncts: each positive conjunct becomes a LEFT SEMI join against
    * the table (LEFT ANTI under `not`), the residual predicate stays a
    * WHERE. Key resolution: a same-named table column if the left side
    * is a bare attribute, else the table's single column. The join side
    * is distinct'd; the strategy is left to Catalyst/AQE — a small
    * lookup table broadcasts, a large one shuffles (never a per-row
    * lookup, never forced into driver memory). */
  private def applyFilter(spark: SparkSession, dir: String, df: DataFrame,
      f: Expr, env: Map[String, DataFrame]): DataFrame = {
    def conjuncts(e: Expr): List[Expr] = e match {
      case Bin("and", l, r) => conjuncts(l) ++ conjuncts(r)
      case x => List(x)
    }
    def isMem(e: Expr): Boolean = e match {
      case InTable(_, _) | Not(InTable(_, _)) => true
      case _ => false
    }
    val (mems, rest) = conjuncts(f).partition(isMem)
    if (mems.isEmpty) return df.where(expr(sqlOf(f)))
    val withWhere =
      if (rest.isEmpty) df
      else df.where(expr(sqlOf(rest.reduceLeft(Bin("and", _, _)))))
    mems.foldLeft(withWhere) { (cur, m) =>
      val (neg, it) = m match {
        case Not(x: InTable) => (true, x)
        case x: InTable => (false, x)
        case _ => fail("unreachable membership conjunct")
      }
      val tbl = loadTable(spark, dir, it.table, env)
      val jt = if (neg) "left_anti" else "left_semi"
      it.e match {
        case Ref(p :: Nil) if tbl.columns.contains(p) =>
          cur.join(tbl.select(p).distinct(), Seq(p), jt)
        case lhs if tbl.columns.length == 1 =>
          val k = tbl.columns.head
          cur.join(tbl.select(col(k).as("__in_key")).distinct(),
            expr(sqlOf(lhs)) === col("__in_key"), jt)
        case other => fail(s"`in ${it.table}`: '${sqlOf(other)}' has no " +
          s"same-named column in '${it.table}' and the table is not " +
          "single-column — name the membership key")
      }
    }
  }

  private def compileJoin(spark: SparkSession, dir: String, ast: Ast,
                          j: JoinStream,
                          env: Map[String, DataFrame],
                          aggDefs: Map[String, AggDef] = Map.empty,
                          rate: Option[Rate] = None
                         ): DataFrame = {
    def side(ss: SingleStream, a: Option[String]): DataFrame = {
      if (aggDefs.contains(ss.table)) {
        // `from S join AggTable within … per 'grain'` — the enrichment
        // join over the grain cascade's stored table (all stored attrs
        // joinable/selectable); the rolled aggregate is tiny next to the
        // stream, so Catalyst broadcasts it
        val stored = aggStored(spark, dir, ss, aggDefs(ss.table), env)
        return a.fold(stored)(stored.alias)
      }
      if (ss.aggWithin.nonEmpty || ss.aggPer.nonEmpty)
        fail(s"within/per requires `define aggregation ${ss.table}` in " +
          "an app context")
      val b0 = loadTable(spark, dir, ss.table, env)
      val b1 = ss.filter.fold(b0)(f => applyFilter(spark, dir, b0, f, env))
      a.fold(b1)(b1.alias)
    }
    val joined = (j.left.window, j.right.window) match {
      case (None, None) =>
        side(j.left, j.leftAlias)
          .join(side(j.right, j.rightAlias), expr(sqlOf(j.on)), j.joinType)
      case (Some(WindowSpec(ln, largs, _)), Some(WindowSpec(rn, rargs, _)))
          if ln.equalsIgnoreCase("time") && rn.equalsIgnoreCase("time") =>
        // stream#window.time(Tl) ⋈ stream#window.time(Tr): a pair (l, r)
        // matches when each event lies within the OTHER side's window —
        // when l arrives, r must still be retained (0 ≤ tl-tr ≤ Tr), or
        // vice versa (0 ≤ tr-tl ≤ Tl); the union is the symmetric band
        // tl-tr ∈ [-Tl, Tr]. Compiled as the on-condition AND the band —
        // with an equality conjunct the plan is a shuffled equi join
        // with a range residual (the watermarked stream-stream join's
        // batch twin), never a nested loop, so we REQUIRE one.
        if (!hasEqui(j.on))
          fail("a windowed stream-stream join needs an equality conjunct " +
            "in its on-clause (the join key that shards the band join; " +
            "a pure time-band join would be a nested loop at scale)")
        val la = j.leftAlias.getOrElse(fail("windowed join sides need " +
          "aliases (`from S as a#window.time(...) join S as b...`) to " +
          "qualify their timestamps"))
        val ra = j.rightAlias.getOrElse(fail("windowed join sides need " +
          "aliases (`from S as a#window.time(...) join S as b...`) to " +
          "qualify their timestamps"))
        // unidirectional: only LEFT arrivals trigger, so the band keeps
        // just the "r already retained when l arrives" direction
        val band =
          if (j.unidirectional)
            s"($la.ts_ns - $ra.ts_ns) between 0L and ${rargs.head}L"
          else s"($la.ts_ns - $ra.ts_ns) " +
            s"between ${-largs.head}L and ${rargs.head}L"
        side(j.left.copy(window = None), j.leftAlias)
          .join(side(j.right.copy(window = None), j.rightAlias),
            expr(s"(${sqlOf(j.on)}) and $band"), j.joinType)
      case (Some(WindowSpec(ln, largs, _)), Some(WindowSpec(rn, rargs, _)))
          if ln.equalsIgnoreCase("length") &&
             rn.equalsIgnoreCase("length") =>
        // stream#window.length(Nl) ⋈ stream#window.length(Nr): a pair
        // (l, r) matches at the LATER event's arrival, when the earlier
        // one is still among the last N retained on its side. Count
        // windows are arrival-RANK bands: give each side a global
        // arrival sequence (__seq) and each event the count of the
        // OTHER side's arrivals before it (__cnt, one running-sum pass
        // over the interleaved marks); then "r still retained when l
        // arrives" is the integer band  seqB(r) > cntB(l) − Nr  — the
        // count twin of the time join's [-Tl, Tr] band, compiled the
        // same way: a shuffled EQUI join on the required key with the
        // band as residual. The global sequence is the inherently
        // sequential part of Siddhi's length-window semantics, so both
        // sides ride the guarded single-task window (shard bigger
        // streams with `partition with`, as the guard says).
        if (!hasEqui(j.on))
          fail("a windowed stream-stream join needs an equality conjunct " +
            "in its on-clause (the join key that shards the band join; " +
            "a pure band join would be a nested loop at scale)")
        val la = j.leftAlias.getOrElse(fail("windowed join sides need " +
          "aliases (`from S as a#window.length(...) join S as b...`) " +
          "to qualify their columns"))
        val ra = j.rightAlias.getOrElse(fail("windowed join sides need " +
          "aliases (`from S as a#window.length(...) join S as b...`) " +
          "to qualify their columns"))
        val nL = largs.head; val nR = rargs.head
        // global arrival ranks/counts via [[runningTotal]] — the
        // All four rank/count quantities come from ONE distributed
        // prefix-sum pass over the interleaved marks — NOT a
        // single-task order-by-all window (the r8 perf_weak; the
        // guardGlobalWindow refusal is gone with it). Rows
        // range-partition ONCE on (ts_ns, event_id); per partition,
        // TWO in-partition running sums over the same exchange use
        // opposite __isB tie orders, so an event that appears on BOTH
        // sides of a self-join (identical (ts_ns, event_id) marks)
        // never counts its own twin as an other-side arrival "before"
        // it — matching the strict `before()` order, under which a
        // self-pair never joins. Reading each side's own total at its
        // own mark makes it the arrival RANK (self-inclusive):
        //   A-mark: __seqA = cumA (desc tie: includes itself),
        //           __cntB = cumB (asc tie: B twin excluded);
        //   B-mark: __seqB = cumB (asc tie: includes itself),
        //           __cntA = cumA (desc tie: A twin excluded).
        // The partition-offset cumsum touches one row per PARTITION.
        def sideOf(ss: SingleStream): DataFrame = {
          val df = side(ss.copy(window = None), None)
          Seq("ts_ns", "event_id").foreach(c =>
            if (!df.columns.contains(c))
              fail(s"length-window join sides need '$c' for arrival " +
                s"order; '${ss.table}' lost it"))
          df
        }
        val aSide = sideOf(j.left)
        val bSide = sideOf(j.right)
        val marks = {
          import org.apache.spark.sql.expressions.Window
          val m0 = aSide.select(col("ts_ns"), col("event_id"),
              lit(0L).as("__isB"))
            .unionByName(bSide.select(col("ts_ns"), col("event_id"),
              lit(1L).as("__isB")))
            .repartitionByRange(col("ts_ns"), col("event_id"))
            .withColumn("__rpid", spark_partition_id())
          val wAsc = Window.partitionBy("__rpid")
            .orderBy(col("ts_ns"), col("event_id"), col("__isB"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val wDesc = Window.partitionBy("__rpid")
            .orderBy(col("ts_ns"), col("event_id"), col("__isB").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val offs = m0.groupBy("__rpid")
            .agg(sum(col("__isB")).as("__btot"),
              sum(lit(1L) - col("__isB")).as("__atot"))
            .withColumn("__boff", coalesce(sum(col("__btot")).over(
              Window.orderBy("__rpid")
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .withColumn("__aoff", coalesce(sum(col("__atot")).over(
              Window.orderBy("__rpid")
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .select(col("__rpid").as("__opid"), col("__boff"),
              col("__aoff"))
          m0.withColumn("__cumB", sum(col("__isB")).over(wAsc))
            .withColumn("__cumA", sum(lit(1L) - col("__isB")).over(wDesc))
            .join(broadcast(offs), col("__rpid") === col("__opid"))
            .select(col("event_id"), col("__isB"),
              (col("__cumB") + col("__boff")).as("__cumB"),
              (col("__cumA") + col("__aoff")).as("__cumA"))
        }
        val aCnt = marks.filter(col("__isB") === 0)
          .select(col("event_id").as("__aid"),
            col("__cumA").as("__seqA"), col("__cumB").as("__cntB"))
        val bCnt = marks.filter(col("__isB") === 1)
          .select(col("event_id").as("__bid"),
            col("__cumB").as("__seqB"), col("__cumA").as("__cntA"))
        val aFull = aSide.join(aCnt, aSide("event_id") === col("__aid"))
          .drop("__aid").alias(la)
        val bFull = bSide.join(bCnt, bSide("event_id") === col("__bid"))
          .drop("__bid").alias(ra)
        def before(x: String, y: String): String =
          s"($x.ts_ns < $y.ts_ns or ($x.ts_ns = $y.ts_ns and " +
            s"$x.event_id < $y.event_id))"
        val dir1 = s"(${before(ra, la)} and $ra.__seqB > " +
          s"$la.__cntB - ${nR}L)"
        val dir2 = s"(${before(la, ra)} and $la.__seqA > " +
          s"$ra.__cntA - ${nL}L)"
        val band2 = if (j.unidirectional) dir1 else s"($dir1 or $dir2)"
        aFull.join(bFull, expr(s"(${sqlOf(j.on)}) and $band2"),
            j.joinType)
          .drop("__seqA", "__seqB", "__cntA", "__cntB")
      case (Some(lw), Some(rw))
          if Seq(lw, rw).forall(w => w.name.equalsIgnoreCase("time") ||
              w.name.equalsIgnoreCase("length") ||
              w.name.equalsIgnoreCase("timebatch") ||
              w.name.equalsIgnoreCase("lengthbatch")) =>
        // MIXED / timeBatch join sides: each direction applies the
        // EARLIER side's own retention rule at the later event's
        // arrival — time contributes its [0, T] event-time band,
        // length its arrival-rank band (seq > cnt − N), and timeBatch
        // its tumbling-bucket co-membership (the chunk window holds
        // exactly the current bucket's events, flushed at the
        // boundary: floor(earlier/T) == floor(later/T)). Arrival order
        // (ties included) is (ts_ns, event_id), so every pair belongs
        // to exactly one direction.
        if (!hasEqui(j.on))
          fail("a windowed stream-stream join needs an equality conjunct " +
            "in its on-clause (the join key that shards the band join; " +
            "a pure band join would be a nested loop at scale)")
        val la = j.leftAlias.getOrElse(fail("windowed join sides need " +
          "aliases to qualify their columns"))
        val ra = j.rightAlias.getOrElse(fail("windowed join sides need " +
          "aliases to qualify their columns"))
        // length AND lengthBatch sides need the arrival rank/count
        // helpers; lengthBatch's chunk = arrivals since the last flush
        // (ranks above the last full multiple of N)
        def isLen(w: WindowSpec) =
          w.name.equalsIgnoreCase("length") ||
            w.name.equalsIgnoreCase("lengthbatch")
        def sided(ss: SingleStream, w: WindowSpec, tag: String)
            : DataFrame = {
          val df = side(ss.copy(window = None), None)
          Seq("ts_ns", "event_id").foreach(c =>
            if (!df.columns.contains(c))
              fail(s"windowed join sides need '$c' for arrival order; " +
                s"'${ss.table}' lost it"))
          if (isLen(w))
            // distributed prefix rank — see the pure-length case
            runningTotal(df, Seq(col("ts_ns"), col("event_id")),
              lit(1L), s"__seq$tag")
          else df
        }
        val aS = sided(j.left, lw, "A")
        val bS = sided(j.right, rw, "B")
        // arrival counts of the LENGTH side(s), seen by the other side
        def marksOf(me: DataFrame, other: DataFrame): DataFrame =
          // __o tie-break: the reading side's own mark (__o=0) sorts
          // first at identical (ts_ns, event_id), so a self-join
          // twin never counts as an other-side arrival "before" it
          // (deterministic; matches beforeM's strict order);
          // distributed prefix sum — see the pure-length case
          runningTotal(
            me.select(col("ts_ns"), col("event_id"), lit(0L).as("__o"))
              .unionByName(other.select(col("ts_ns"), col("event_id"),
                lit(1L).as("__o"))),
            Seq(col("ts_ns"), col("event_id"), col("__o")),
            col("__o"), "__cnt")
            .filter(col("__o") === 0)
            .select(col("event_id").as("__mid"), col("__cnt"))
        val aF0 = if (isLen(rw)) {
          val m = marksOf(aS, bS)
            .withColumnRenamed("__cnt", "__cntB")
          aS.join(m, aS("event_id") === col("__mid")).drop("__mid")
        } else aS
        val bF0 = if (isLen(lw)) {
          val m = marksOf(bS, aS)
            .withColumnRenamed("__cnt", "__cntA")
          bS.join(m, bS("event_id") === col("__mid")).drop("__mid")
        } else bS
        val aF = aF0.alias(la); val bF = bF0.alias(ra)
        def beforeM(x: String, y: String): String =
          s"($x.ts_ns < $y.ts_ns or ($x.ts_ns = $y.ts_ns and " +
            s"$x.event_id < $y.event_id))"
        // direction "l later": r retained per the RIGHT side's rule
        def retain(later: String, earlier: String, w: WindowSpec,
            seqC: String, cntC: String): String =
          if (w.name.equalsIgnoreCase("length"))
            s"$earlier.$seqC > $later.$cntC - ${w.args.head}L"
          else if (w.name.equalsIgnoreCase("lengthbatch"))
            s"$earlier.$seqC > " +
              s"($later.$cntC div ${w.args.head}L) * ${w.args.head}L"
          else if (w.name.equalsIgnoreCase("timebatch"))
            s"($earlier.ts_ns div ${w.args.head}L) = " +
              s"($later.ts_ns div ${w.args.head}L)"
          else s"$later.ts_ns - $earlier.ts_ns <= ${w.args.head}L"
        val dir1 = s"(${beforeM(ra, la)} and " +
          s"${retain(la, ra, rw, "__seqB", "__cntB")})"
        val dir2 = s"(${beforeM(la, ra)} and " +
          s"${retain(ra, la, lw, "__seqA", "__cntA")})"
        val bandM = if (j.unidirectional) dir1 else s"($dir1 or $dir2)"
        aF.join(bF, expr(s"(${sqlOf(j.on)}) and $bandM"), j.joinType)
          .drop("__seqA", "__seqB", "__cntA", "__cntB")
      case _ =>
        fail("join sides support #window.time(T) / #window.length(N) " +
          "on BOTH sides, in any combination (the stream-stream " +
          "windowed joins); other join-side window types are not " +
          "supported (v1)")
    }
    // a group key whose select item is a SIDE-QUALIFIED ref (a.user_id
    // as user_id … group by user_id) must group by the qualified
    // column — the bare name is ambiguous when both join sides carry
    // it (the self-join shape); post-aggregation the key column is
    // single-part again, so downstream resolution is unchanged
    val expanded = expandStar(ast, joined.columns.distinct)
    val astG = expanded.copy(groupBy = expanded.groupBy.map { g =>
      itemsOf(expanded).collectFirst {
        case (it, a, false) if a == g => it.e } match {
        case Some(Ref(parts)) if parts.length > 1 => parts.mkString(".")
        case _ => g
      }
    })
    rate match {
      case None => selectOrAggregate(astG, joined, Nil, windowed = false)
      case Some(r) => rateOverJoin(astG, joined, j, r)
    }
  }

  /** Output rate limiting over a JOIN: the rated events are the join's
    * OUTPUT pairs, each emitted at the instant its LATER side arrived
    * (an outer join's unmatched row emits at its own arrival —
    * `greatest` skips the null side). Both sides must be aliased event
    * streams so the emission order (`emit ts`, left id, right id) is
    * total. first/last per rate interval partition by the emission
    * interval — fully parallel; count-based rates need the global
    * emission rank and ride the guarded single-task window. */
  private def rateOverJoin(ast: Ast, joined: DataFrame,
      j: JoinStream, rate: Rate): DataFrame = {
    if (ast.groupBy.nonEmpty || ast.select.exists(it => containsAgg(it.e)))
      fail("output rate limiting over a join rates the join's OUTPUT " +
        "events (v1) — no group by / aggregates (aggregate in a " +
        "downstream stage)")
    val (laS, raS) = (j.leftAlias, j.rightAlias) match {
      case (Some(a), Some(b)) => (a, b)
      case _ => fail("output rate limiting over a join needs ALIASED " +
        "stream sides (v1) to define the pair emission order")
    }
    Seq(laS, raS).foreach { a =>
      Seq("ts_ns", "event_id").foreach { c =>
        if (scala.util.Try(joined(s"$a.$c")).isFailure)
          fail(s"output rate limiting over a join needs '$c' on side " +
            s"'$a' — pair emission order is (later ts, left id, " +
            "right id)")
      }
    }
    val emitTs = greatest(col(s"$laS.ts_ns"), col(s"$raS.ts_ns"))
    val df = joined
      .withColumn("__emit_ts", emitTs)
      .withColumn("__emit_ord", struct(emitTs.as("t"),
        coalesce(col(s"$laS.event_id"), lit(-1L)).as("il"),
        coalesce(col(s"$raS.event_id"), lit(-1L)).as("ir")))
    def proj(kept: DataFrame): DataFrame =
      selectOrAggregate(ast, kept.drop("__emit_ts", "__emit_ord"), Nil,
        windowed = false)
    import org.apache.spark.sql.expressions.Window
    (rate.mode, rate.timeNs, rate.count) match {
      case ("all", _, _) => proj(df) // replayed batches ≡ the output
      case (m @ ("first" | "last"), Some(t), None) =>
        val w = Window.partitionBy(expr(s"__emit_ts div ${t}L"))
          .orderBy(if (m == "first") col("__emit_ord").asc
            else col("__emit_ord").desc)
        proj(df.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1))
      case (m @ ("first" | "last"), None, Some(n)) =>
        // emission ranks from the distributed prefix sum over the
        // total emission order (struct sorts lexicographically), then
        // a chunk-partitioned pick — no global single-task window
        val pick = if (m == "first") "min" else "max"
        proj(globalRank(df, Seq(col("__emit_ord")), "__rn")
          .withColumn("__keep", expr(s"$pick(__rn) over (partition by " +
            s"(__rn - 1) div ${n}L)"))
          .where(col("__rn") === col("__keep")))
      case ("snapshot", _, _) =>
        fail("output snapshot over a join (v1): insert the join into a " +
          "stream and snapshot that stream — a snapshot of pair state " +
          "has no single emission row")
      case _ => fail("unreachable: rate clause validated at parse")
    }
  }

  private def compileSingle(spark: SparkSession, dir: String, ast0: Ast,
                            s: SingleStream,
                            env: Map[String, DataFrame],
                            partKey: Option[String] = None): DataFrame = {
    val base0 = loadTable(spark, dir, s.table, env)
    val ast = expandStar(ast0, base0.columns)
    val base =
      s.filter.fold(base0)(f => applyFilter(spark, dir, base0, f, env))
    val items = itemsOf(ast)
    def aggCols = items.collect { case (it, a, true) =>
      expr(sqlOf(it.e)).as(a)
    }
    def keyRefs = items.collect { case (it, a, false) => (it, a) }

    def grouped(implicitKeys: Seq[(String, Column)],
                df: DataFrame): DataFrame =
      selectOrAggregate(ast, df, implicitKeys, windowed = true)

    /** Distributed sliding frame over the GLOBAL total order (no
      * group by): anchors and data rows equi-join on a band BUCKET —
      * every data row duplicates into the (at most two) buckets whose
      * anchors can need it, the exact frame condition filters inside
      * the join, and each anchor's frame aggregates via the FoldAlg
      * components (so the full mergeable algebra, stdDev and
      * distinctCount included, works on global sliding frames). No
      * data-sized single-task window remains — the r9
      * guardGlobalWindow refusal on unpartitioned sliding shapes is
      * retired. Work is O(2n) join rows, each bucket a frame-width
      * slice, parallel across buckets. */
    def slidingBand(lenN: Option[Long], timeNs: Option[Long],
        timeAttr: String): DataFrame = {
      if (ast.having.nonEmpty) fail("having needs a tumbling window")
      val comps = scala.collection.mutable.Buffer
        .empty[(String, String, Option[Expr])]
      def rwS(e: Expr): Expr = e match {
        case Call(None, n2, args0) if aggNames(n2.toLowerCase) =>
          val b = s"__s${comps.length}"
          comps += ((b, n2.toLowerCase, args0.headOption))
          FoldAlg.rewrite(n2.toLowerCase, b)
        case Call(ns2, n2, as2) => Call(ns2, n2, as2.map(rwS))
        case Bin(op, l, r) => Bin(op, rwS(l), rwS(r))
        case Not(x) => Not(rwS(x))
        case Neg(x) => Neg(rwS(x))
        case other => other
      }
      val finalsS: Seq[(String, Expr)] = items.map { case (it, a, isAgg) =>
        a -> (if (isAgg) rwS(it.e) else it.e)
      }
      comps.foreach { case (_, n2, argO) =>
        if (n2 != "count" && argO.isEmpty)
          fail(s"$n2(...) needs an argument")
      }
      if (comps.isEmpty)
        fail("a sliding window selects at least one aggregate")
      // the anchor key: global arrival rank (unique); rows frames also
      // consume it as the band coordinate
      val ranked = globalRank(base, Seq(col("ts_ns"), col("event_id")),
        "__ark")
      def bucketOf(rk: String, ts: String): Column = lenN match {
        case Some(n2) => expr(s"($rk - 1) div ${n2}L")
        case None => expr(s"$ts div ${timeNs.get}L")
      }
      val anchors = ranked.withColumn("__ab", bucketOf("__ark", timeAttr))
      val data = ranked.select(col("__ark").as("__drk") +:
        col(timeAttr).as("__dts") +:
        comps.toSeq.flatMap { case (b, _, argO) =>
          argO.map(a0 => expr(sqlOf(a0)).as(s"${b}_x")).toSeq }: _*)
        .withColumn("__db", explode(array(bucketOf("__drk", "__dts"),
          bucketOf("__drk", "__dts") + lit(1L))))
      val frameCond = (lenN.map(n2 =>
          col("__drk") >= col("__ark") - lit(n2 - 1) &&
            col("__drk") <= col("__ark")).toList ++
        timeNs.map(t =>
          col("__dts") >= col(timeAttr) - lit(t) &&
            col("__dts") <= col(timeAttr)).toList).reduce(_ && _)
      val aggsS = comps.toSeq.flatMap { case (b, n2, argO) =>
        FoldAlg.partialCols(n2, b, argO.map(_ => col(s"${b}_x"))) }
      val agged = anchors.select(col("__ark"), col("__ab"),
          col(timeAttr))
        .join(data, col("__ab") === col("__db") && frameCond)
        .groupBy("__ark").agg(aggsS.head, aggsS.tail: _*)
        .withColumnRenamed("__ark", "__grk")
      anchors.join(agged, col("__ark") === col("__grk"))
        .select(finalsS.map { case (a, e2) =>
          expr(sqlOf(e2)).as(a) }: _*)
    }

    def sliding(frame: String): DataFrame = {
      val part = if (ast.groupBy.isEmpty) ""
                 else s"partition by ${ast.groupBy.mkString(", ")} "
      val w = s"(${part}order by $frame)"
      // attach the frame at the AGGREGATE CALL, not around the whole item
      // expression — `round(sum(x), 2)` must render as
      // `round(sum(x) over w, 2)`, never `round(sum(x), 2) over w`
      def windowed(e: Expr): String = e match {
        case Call(None, n, _) if aggNames(n.toLowerCase) =>
          s"${sqlOf(e)} over $w"
        case Call(ns, n, args) =>
          renderCall(ns, n, args.length,
            args.map(x => if (containsAgg(x)) windowed(x) else sqlOf(x)))
        case Bin(op, l, r) =>
          val o = if (op == "==") "=" else op
          s"(${windowed(l)} $o ${windowed(r)})"
        case Not(x) => s"(NOT ${windowed(x)})"
        case Neg(x) => s"(- ${windowed(x)})"
        case other => sqlOf(other)
      }
      val cols = items.map { case (it, a, isAgg) =>
        if (isAgg) expr(windowed(it.e)).as(a)
        else expr(sqlOf(it.e)).as(a)
      }
      if (ast.having.nonEmpty) fail("having needs a tumbling window")
      base.select(cols: _*)
    }

    s.window match {
      case None => selectOrAggregate(ast, base, Nil, windowed = false)
      case Some(WindowSpec(n, args, _)) => n.toLowerCase match {
        case "timebatch" =>
          val tNs = args.head
          val withW = base.withColumn("w_start_ms",
            expr(s"(ts_ns div ${tNs}L) * ${tNs / 1000000}L"))
          grouped(Seq("w_start_ms" -> col("w_start_ms")), withW)
        case "lengthbatch" =>
          // inside `partition with`, chunks count per key and the
          // window parallelizes across keys; the GLOBAL form's arrival
          // ranks ride the distributed prefix sum (the r9
          // guardGlobalWindow refusal is gone) — chunking is then a
          // plain rank consumer, floor(rank/N)
          val withC = partKey match {
            case Some(k) => base.withColumn("chunk_id", expr(
              s"(row_number() over (partition by $k " +
                s"order by ts_ns, event_id) - 1) div ${args.head}"))
            case None =>
              globalRank(base, Seq(col("ts_ns"), col("event_id")), "__rk")
                .withColumn("chunk_id",
                  expr(s"(__rk - 1) div ${args.head}"))
                .drop("__rk")
          }
          grouped(Seq("chunk_id" -> col("chunk_id")), withC)
        case "session" =>
          val gap = s"${args.head / 1000000} milliseconds"
          val sw = session_window(col("ts"), gap)
          if (aggCols.isEmpty) fail("session window needs an aggregate")
          keyRefs.foreach { case (it, _) => it.e match {
            case Ref(c :: Nil) if ast.groupBy.contains(c) => ()
            case _ => fail("non-aggregate select item must be grouped")
          }}
          val agged = base
            .groupBy(sw +: ast.groupBy.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
          val hav = ast.having.fold(agged)(h => agged.where(expr(sqlOf(h))))
          hav.select(
            unix_millis(col("session_window.start")).as("w_start_ms") +:
            unix_millis(col("session_window.end")).as("w_end_ms") +:
            items.map { case (_, a, _) => col(a) }: _*)
        case "length" =>
          if (ast.groupBy.isEmpty)
            slidingBand(Some(args.head), None, "ts_ns")
          else sliding(s"ts_ns, event_id rows between ${args.head - 1} " +
            "preceding and current row")
        case "time" =>
          if (ast.groupBy.isEmpty)
            slidingBand(None, Some(args.head), "ts_ns")
          else sliding(s"ts_ns range between ${args.head} " +
            "preceding and current row")
        case "externaltime" =>
          // sliding time window driven by a NAMED ns-epoch attribute
          // (engine twin: window_external_time); `time` drives off ts_ns
          val attr = s.window.get.sargs.headOption.getOrElse(
            fail("externalTime needs a timestamp attribute argument"))
          if (ast.groupBy.isEmpty)
            slidingBand(None, Some(args.head), attr)
          else sliding(s"$attr range between ${args.head} " +
            "preceding and current row")
        case "externaltimebatch" =>
          val attr = s.window.get.sargs.headOption.getOrElse(
            fail("externalTimeBatch needs a timestamp attribute argument"))
          val tNs = args.head
          val withW = base.withColumn("w_start_ms",
            expr(s"($attr div ${tNs}L) * ${tNs / 1000000}L"))
          grouped(Seq("w_start_ms" -> col("w_start_ms")), withW)
        case "sort" =>
          // sort(N, attr, 'asc'|'desc'): retain the N first events by
          // attr order. orderBy(...).limit(N) plans as a DISTRIBUTED
          // TakeOrdered (per-partition top-N + merge), never a global
          // sort — the shape that survives 100 TB
          val n = args.headOption.getOrElse(
            fail("sort needs a count argument")).toInt
          val sa = s.window.get.sargs
          val attr = sa.headOption.getOrElse(
            fail("sort needs an attribute argument"))
          val asc = sa.drop(1).headOption.forall(_ equalsIgnoreCase "asc")
          val ord = if (asc)
            Seq(col(attr).asc, col("ts_ns").asc, col("event_id").asc)
          else Seq(col(attr).desc, col("ts_ns").asc, col("event_id").asc)
          val kept = base.orderBy(ord: _*).limit(n)
          selectOrAggregate(ast, kept, Nil, windowed = false)
        case n @ ("unique:first" | "unique:last") =>
          // dedup retention window: keep the first/last event per
          // distinct key value (engine twin: Windows uniqueFirst/Last) —
          // one row_number shuffle on the key, fully parallel
          val attr = s.window.get.sargs.headOption.getOrElse(
            fail(s"$n needs an attribute argument"))
          if (!base.columns.contains("ts_ns") ||
              !base.columns.contains("event_id"))
            fail(s"$n needs 'ts_ns' and 'event_id' to define arrival order")
          val o = if (n == "unique:first") "ts_ns, event_id"
                  else "ts_ns desc, event_id desc"
          val kept = base.withColumn("__rn", expr(
              s"row_number() over (partition by $attr order by $o)"))
            .where(col("__rn") === 1).drop("__rn")
          selectOrAggregate(ast, kept, Nil, windowed = false)
        case "frequent" =>
          // frequent(N, attr): retain events whose key is among the N
          // most frequent. Batch replay computes the EXACT top-N the
          // Misra–Gries window approximates (engine twin with sketch
          // bounds: Sketches.frequent); the counts table is tiny, so the
          // retention join broadcasts
          val n = args.headOption.getOrElse(
            fail("frequent needs a count argument")).toInt
          val attr = s.window.get.sargs.headOption.getOrElse(
            fail("frequent needs an attribute argument"))
          val top = base.groupBy(attr)
            .agg(count(lit(1)).as("__cnt"))
            .withColumn("__rk", expr(
              s"row_number() over (order by __cnt desc, $attr)"))
            .where(col("__rk") <= n)
            .select(attr)
          val kept = base.join(broadcast(top), Seq(attr), "left_semi")
          selectOrAggregate(ast, kept, Nil, windowed = false)
        case "delay" =>
          // `delay(T)`: events re-timestamped T later (engine twin:
          // Windows.delay). The shift lands BEFORE select, so a chained
          // app's downstream window buckets by the delayed time
          val tNs = args.headOption.getOrElse(
            fail("delay needs a duration argument"))
          val shifted0 = base.withColumn("ts_ns", col("ts_ns") + lit(tNs))
          val shifted =
            if (base.columns.contains("ts"))
              shifted0.withColumn("ts",
                expr(s"timestampadd(MICROSECOND, ${tNs / 1000}L, ts)"))
            else shifted0
          selectOrAggregate(ast, shifted, Nil, windowed = false)
        case "cron" =>
          // `cron('0 0/15 * * * ?')`: contents emitted on the cron marks
          // ⇒ aggregation per cron-aligned bucket (engine twin:
          // Extras.cronWindow)
          val spec = s.window.get.sargs.headOption.getOrElse(
            fail("cron needs a quoted Quartz expression argument"))
          val ivNs = cronIntervalNs(spec)
          val withW = base.withColumn("cron_tick_ms",
            expr(s"(ts_ns div ${ivNs}L) * ${ivNs / 1000000}L"))
          grouped(Seq("cron_tick_ms" -> col("cron_tick_ms")), withW)
        case "timelength" =>
          // `timeLength(T, N)`: the window holds the LAST min(N,
          // #within-T) events (engine twin: Extras.timeLength). The
          // last-N buffer is a bounded rows frame (collect_list of at
          // most N tiny structs — scale-safe), and the time bound prunes
          // INSIDE it via a higher-order filter whose lambda compares
          // each buffered ts against the current row's; aggregates then
          // fold the pruned buffer. All codegen'd built-ins, no UDFs.
          val tNs = args.headOption.getOrElse(
            fail("timeLength needs a duration argument"))
          val n = args.drop(1).headOption.getOrElse(
            fail("timeLength needs a count argument")).toInt
          if (n > 4096)
            fail(s"timeLength($n) would materialize an $n-struct buffer " +
              "per output row — for large counts use time()/timeBatch()" +
              " (the time bound alone) instead")
          if (ast.groupBy.isEmpty)
            // global timeLength = the band join with BOTH bounds:
            // rank band (last N) ∩ time band (within T)
            return slidingBand(Some(n.toLong), Some(tNs), "ts_ns")
          val part = s"partition by ${ast.groupBy.mkString(", ")} "
          def refsIn(e: Expr): List[String] = e match {
            case Ref(p) => List(p.last)
            case Call(_, _, as) => as.flatMap(refsIn)
            case Bin(_, l, r) => refsIn(l) ++ refsIn(r)
            case Not(x) => refsIn(x)
            case Neg(x) => refsIn(x)
            case _ => Nil
          }
          val attrs = ("ts_ns" :: items.collect {
            case (it, _, true) => refsIn(it.e) }.flatten).distinct
          val fields = attrs.map(a => s"'$a', $a").mkString(", ")
          val frame = s"(${part}order by ts_ns, event_id " +
            s"rows between ${n - 1} preceding and current row)"
          val withWin = base
            .withColumn("__buf",
              expr(s"collect_list(named_struct($fields)) over $frame"))
            .withColumn("__win",
              expr(s"filter(__buf, s -> s.ts_ns >= ts_ns - ${tNs}L)"))
          def over(e: Expr): String = e match {
            case Call(None, "count", Nil) => "cast(size(__win) as bigint)"
            case Call(None, "sum", List(Ref(p))) =>
              s"aggregate(__win, cast(0.0 as double), " +
                s"(a, s) -> a + cast(s.${p.last} as double))"
            case Call(None, "avg", List(Ref(p))) =>
              s"(${over(Call(None, "sum", List(Ref(p))))} / size(__win))"
            case Call(None, "min", List(Ref(p))) =>
              s"array_min(transform(__win, s -> s.${p.last}))"
            case Call(None, "max", List(Ref(p))) =>
              s"array_max(transform(__win, s -> s.${p.last}))"
            case Call(None, nm, _) if aggNames(nm.toLowerCase) =>
              fail("timeLength aggregates are count()/sum/avg/min/max " +
                s"over a column (got '$nm')")
            case Call(ns2, nm, as2) =>
              renderCall(ns2, nm, as2.length, as2.map(over))
            case Bin(op, l, r) =>
              val o = if (op == "==") "=" else op
              s"(${over(l)} $o ${over(r)})"
            case Not(x) => s"(NOT ${over(x)})"
            case Neg(x) => s"(- ${over(x)})"
            case otherE => sqlOf(otherE)
          }
          if (ast.having.nonEmpty) fail("having needs a tumbling window")
          withWin.select(items.map { case (it, a, isAgg) =>
            if (isAgg) expr(over(it.e)).as(a) else expr(sqlOf(it.e)).as(a)
          }: _*)
        case "expression" =>
          // retain-while window (engine twin: Extras.expressionWindow):
          // on each arrival evict from the FRONT until the retention
          // expression holds again; select aggregates recompute over the
          // retained buffer (whose size the predicate itself bounds).
          // A keyed fold — parallel over keys, one exchange.
          val srcTxt = s.window.get.sargs.headOption.getOrElse(
            fail("expression window needs a quoted retention expression"))
          val ret = new P(lex(srcTxt)).expr()
          val key = (ast.groupBy, partKey) match {
            case (k :: Nil, _) => k
            case (Nil, Some(k)) => k
            case _ => fail("expression window (v1) needs exactly one " +
              "group by key to partition the fold")
          }
          val need = Seq("event_id", "ts_ns", "user_id", "event_type",
            "value")
          need.foreach(c => if (!base.columns.contains(c))
            fail(s"expression window reads event streams; '${s.table}' " +
              s"lacks '$c'"))
          val outTypes: Seq[(String, DataType)] = evOutTypes(items)
          if (ast.having.nonEmpty) fail("having needs a tumbling window")
          val schema2 = StructType(outTypes.map { case (n2, t) =>
            StructField(n2, t) })
          implicit val enc: org.apache.spark.sql.Encoder[
            org.apache.spark.sql.Row] =
            org.apache.spark.sql.Encoders.row(schema2)
          import org.apache.spark.sql.Encoders
          val selItems2 = items
          base.select(col("event_id").as("eventId"),
              col("ts_ns").as("tsNs"), col("user_id").as("userId"),
              col("event_type").as("eventType"), col("value"))
            .as[Cep.Ev](org.apache.spark.sql.Encoders.product[Cep.Ev])
            .groupByKey(e => String.valueOf(field(e, key)))(Encoders.STRING)
            .flatMapGroups { (_, it2) =>
              val buf = scala.collection.mutable.Queue.empty[Cep.Ev]
              it2.toVector.sortBy(e => (e.tsNs, e.eventId)).iterator
                .map { e =>
                  buf.enqueue(e)
                  var evict = !bufEval(ret, buf, e).asInstanceOf[Boolean]
                  while (evict) {
                    buf.dequeue()
                    evict = buf.nonEmpty &&
                      !bufEval(ret, buf, e).asInstanceOf[Boolean]
                  }
                  org.apache.spark.sql.Row.fromSeq(selItems2.map {
                    case (it, _, _) => bufEval(it.e, buf, e) })
                }
            }(enc)
            .toDF()
        case other => fail(s"unsupported window '$other' (supported: " +
          "timeBatch, lengthBatch, session, length, time, externalTime, " +
          "externalTimeBatch, sort, unique:first, unique:last, frequent, " +
          "delay, cron, timeLength, expression)")
      }
    }
  }

  /** An aggregation read (`from A within lo, hi per 'grain' select …`)
    * compiled as the Siddhi incremental-aggregation CASCADE (engine twin:
    * graft.engine.Aggregates.incrementalAgg / incrementalCascade): the
    * FINEST defined grain is the stored partial table (sum/count/min/max
    * partials — avg is stored as sum+count, never averaged early), and
    * the requested `per` grain is a rollup OF THOSE PARTIALS, never a
    * re-scan at the coarse grain. The `within` range is pushed down to
    * the source scan as a row-level time filter (grain-aligned, so
    * parquet min/max pruning applies) — at 100 TB a `within 1 day` read
    * touches one day of row groups, not the corpus. */
  /** The STORED table of an aggregation read (`bucket_start_ms` + group
    * keys + defined aliases) at the requested grain and range — used
    * directly by [[compileAggQuery]] and as a JOIN SIDE (the reference's
    * `from S join AggTable within … per …` enrichment idiom). */
  /** `define aggregation A from S[f] select ... group by ... aggregate
    * by ts every sec ... day` — the parser body after `define
    * aggregation` is consumed (shared by the batch compile and the
    * live deployment). */
  private def parseAggDefRest(p: P): (String, AggDef) = {
    val aname = p.ident()
    p.eatKw("from")
    val tbl = p.ident()
    val filt = if (p.trySym("[")) {
      val e = p.expr(); p.eatSym("]"); Some(e)
    } else None
    p.eatKw("select")
    val sel = p.selItems()
    val grp = if (p.tryKw("group")) {
      p.eatKw("by")
      val g = List.newBuilder[String]
      g += p.ident()
      while (p.trySym(",")) g += p.ident()
      g.result()
    } else Nil
    p.eatKw("aggregate"); p.eatKw("by")
    val tsAttr = p.ident()
    p.eatKw("every")
    val g1 = grainKey(p.ident())
    val grains: List[String] =
      if (p.trySym(".")) { // `sec ... day` range over the ladder
        p.eatSym("."); p.eatSym(".")
        val g2 = grainKey(p.ident())
        val names = grainLadder.map(_._1)
        val (i1, i2) = (names.indexOf(g1), names.indexOf(g2))
        if (i1 > i2) fail(s"grain range '$g1 ... $g2' is inverted")
        names.slice(i1, i2 + 1)
      } else {
        val gs = List.newBuilder[String]
        gs += g1
        while (p.trySym(",")) gs += grainKey(p.ident())
        val names = grainLadder.map(_._1)
        gs.result().distinct.sortBy(names.indexOf)
      }
    (aname, AggDef(tbl, filt, sel, grp, tsAttr, grains))
  }

  /** Validate + resolve an aggregation read's `per` grain and `within`
    * range (shared by the batch read and the live deployment). */
  private def aggReadSpec(s: SingleStream, adef: AggDef)
      : (Long, Long, Long) = {
    val per = grainKey(s.aggPer.getOrElse(
      fail(s"reading aggregation '${s.table}' needs `per '<grain>'`")))
    if (!adef.grains.contains(per))
      fail(s"per '$per' is outside the defined grain set " +
        s"(${adef.grains.mkString(" ... ")})")
    val (loE, hiE) = s.aggWithin.getOrElse(
      fail(s"reading aggregation '${s.table}' needs `within lo, hi`"))
    def boundMs(e: Expr): Long = e match {
      case Num(t) => t.toLong
      case Str(v) => java.time.LocalDateTime.parse(v,
          java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail("within bound must be an epoch-ms number or " +
        s"'yyyy-MM-dd HH:mm:ss' literal, got '${sqlOf(other)}'")
    }
    val (lo, hi) = (boundMs(loE), boundMs(hiE))
    if (hi <= lo) fail(s"within range is empty: $lo ... $hi")
    if (s.filter.nonEmpty || s.window.nonEmpty)
      fail("an aggregation read takes no filter/window (v1)")
    (grainMsOf(per), lo, hi)
  }

  /** The live fold algebra — one (rewrite, partial, merge) component
    * recipe per MERGEABLE aggregate, shared by every componentwise-
    * merge channel: the windowed flush folds (windowed table DML,
    * rate-over-window), the keyed join/enrichment aggregation folds,
    * and the define-aggregation live grain cascade's two-way state
    * merge. Extending an aggregate here deploys it on all of them.
    *
    *   - count/sum/min/max — one partial column, trivially mergeable
    *     (sum partials keep SQL null semantics: null iff all inputs
    *     null; least/greatest skip single-side nulls);
    *   - avg — (sum, count) components, finalized as s/n;
    *   - stdDev — Chan/Welford moment components (n, mean, M2) with
    *     M2 = var_pop·n, merged by the pairwise update rule
    *     (Chan et al. 1979's parallel-variance merge — numerically
    *     stable at any merge depth, the property that matters when a
    *     long-running deployment folds millions of micro-batches);
    *     finalized as sqrt(M2/n) — POPULATION stddev, Siddhi's
    *     stdDev;
    *   - distinctCount — exact value-set partials (collect_set),
    *     merged by array union, finalized as cardinality. Per-group
    *     state grows with the distinct-value count — the documented
    *     cost of the exact form (the approx twin is the HLL-backed
    *     `sketch_approx_distinct`). */
  private object FoldAlg {
    /** Final-stage Expr over the merged partial columns of `base`. */
    def rewrite(kind: String, base: String): Expr = kind match {
      case "count" | "sum" | "min" | "max" => Ref(List(base))
      case "avg" => Bin("/", Ref(List(base + "s")), Ref(List(base + "n")))
      case "stddev" => Call(Some("math"), "sqrt",
        List(Bin("/", Ref(List(base + "q")), Ref(List(base + "n")))))
      case "distinctcount" => // cast: count(DISTINCT) is bigint
        Call(None, "convert", List(
          Call(Some("list"), "size", List(Ref(List(base)))), Str("long")))
    }
    /** One micro-batch's partial agg columns; `x` is the argument
      * column (absent only for bare count()). */
    def partialCols(kind: String, base: String,
        x: Option[Column]): Seq[Column] = kind match {
      case "count" => Seq(x.fold(count(lit(1)))(count).as(base))
      case "sum" => Seq(sum(x.get).as(base))
      case "min" => Seq(min(x.get).as(base))
      case "max" => Seq(max(x.get).as(base))
      case "avg" => Seq(sum(x.get).as(base + "s"),
        count(x.get).as(base + "n"))
      case "stddev" => Seq(count(x.get).as(base + "n"),
        avg(x.get).as(base + "m"),
        (var_pop(x.get) * count(x.get)).as(base + "q"))
      case "distinctcount" => Seq(collect_set(x.get).as(base))
    }
    /** Componentwise merge of accumulated (`t.*`) and batch (`u.*`)
      * partials — each output column keeps the partial's name. */
    def mergeCols(kind: String, base: String): Seq[Column] = {
      def add(c: String) = (coalesce(col(s"t.$c"), lit(0)) +
        coalesce(col(s"u.$c"), lit(0))).as(c)
      def addSum(c: String) =
        when(col(s"t.$c").isNull && col(s"u.$c").isNull, lit(null))
          .otherwise(coalesce(col(s"t.$c"), lit(0)) +
            coalesce(col(s"u.$c"), lit(0))).as(c)
      kind match {
        case "count" => Seq(add(base))
        case "sum" => Seq(addSum(base))
        case "min" => Seq(least(col(s"t.$base"), col(s"u.$base"))
          .as(base))
        case "max" => Seq(greatest(col(s"t.$base"), col(s"u.$base"))
          .as(base))
        case "avg" => Seq(addSum(base + "s"), add(base + "n"))
        case "stddev" =>
          // Chan pairwise update: n = n₁+n₂; m = m₁ + δ·n₂/n;
          // M2 = M2₁ + M2₂ + δ²·n₁n₂/n — a single-side-absent merge
          // degenerates to the present side
          val nt = coalesce(col(s"t.${base}n"), lit(0L))
          val nu = coalesce(col(s"u.${base}n"), lit(0L))
          val n = nt + nu
          val mt = coalesce(col(s"t.${base}m"), lit(0d))
          val mu = coalesce(col(s"u.${base}m"), lit(0d))
          Seq(
            add(base + "n"),
            when(n === 0, lit(null))
              .otherwise(mt + (mu - mt) * nu / n).as(base + "m"),
            when(n === 0, lit(null))
              .otherwise(coalesce(col(s"t.${base}q"), lit(0d)) +
                coalesce(col(s"u.${base}q"), lit(0d)) +
                when(nt === 0 || nu === 0, lit(0d))
                  .otherwise(pow(mu - mt, 2) * nt * nu / n))
              .as(base + "q"))
        case "distinctcount" =>
          Seq(when(col(s"t.$base").isNull, col(s"u.$base"))
            .when(col(s"u.$base").isNull, col(s"t.$base"))
            .otherwise(array_union(col(s"t.$base"), col(s"u.$base")))
            .as(base))
      }
    }
  }

  /** Partial / combine / final column triples per defined select item
    * — the algebraic decomposition that makes the grain cascade (and
    * the live bucket-merge) correct: partials live at the FINEST
    * grain, any coarser read (or a later micro-batch) combines them. */
  private def aggPlanCols(adef: AggDef)
      : (Seq[Column], Seq[Column], Map[String, Column]) = {
    val keys = adef.groupBy
    val partials = List.newBuilder[Column]
    val combines = List.newBuilder[Column]
    val finals = List.newBuilder[(String, Column)]
    adef.select.zipWithIndex.foreach { case (it, i) =>
      val a = alias(it, i)
      it.e match {
        case Ref(k :: Nil) if keys.contains(k) => () // group key
        case Call(None, fn, args) =>
          def argSql = sqlOf(args.head)
          fn.toLowerCase match {
            case "sum" =>
              partials += expr(s"sum($argSql)").as(s"__p_$a")
              combines += sum(col(s"__p_$a")).as(a)
              finals += a -> col(a)
            case "count" =>
              partials += (if (args.isEmpty) count(lit(1)).as(s"__p_$a")
                           else expr(s"count($argSql)").as(s"__p_$a"))
              combines += sum(col(s"__p_$a")).as(a)
              finals += a -> col(a)
            case "min" =>
              partials += expr(s"min($argSql)").as(s"__p_$a")
              combines += min(col(s"__p_$a")).as(a)
              finals += a -> col(a)
            case "max" =>
              partials += expr(s"max($argSql)").as(s"__p_$a")
              combines += max(col(s"__p_$a")).as(a)
              finals += a -> col(a)
            case "avg" => // stored as sum+count, finalized at read grain
              partials += expr(s"sum($argSql)").as(s"__ps_$a")
              partials += expr(s"count($argSql)").as(s"__pc_$a")
              combines += sum(col(s"__ps_$a")).as(s"__s_$a")
              combines += sum(col(s"__pc_$a")).as(s"__c_$a")
              finals += a -> (col(s"__s_$a") / col(s"__c_$a")).as(a)
            case "stddev" => // Chan moments (n, mean, M2) per bucket
              partials += expr(s"count($argSql)").as(s"__p_${a}n")
              partials += expr(s"avg($argSql)").as(s"__p_${a}m")
              partials += expr(s"var_pop($argSql) * count($argSql)")
                .as(s"__p_${a}q")
              // rollup across buckets via the moment-sum identity:
              // M2 = Σ(q + n·m²) − (Σ n·m)² / Σn
              combines += sum(col(s"__p_${a}n")).as(s"__n_$a")
              combines += sum(col(s"__p_${a}n") * col(s"__p_${a}m"))
                .as(s"__s1_$a")
              combines += sum(col(s"__p_${a}q") + col(s"__p_${a}n") *
                col(s"__p_${a}m") * col(s"__p_${a}m")).as(s"__s2_$a")
              finals += a -> when(col(s"__n_$a") === 0, lit(null))
                .otherwise(sqrt(greatest(lit(0d), (col(s"__s2_$a") -
                  col(s"__s1_$a") * col(s"__s1_$a") / col(s"__n_$a")) /
                  col(s"__n_$a")))).as(a)
            case "distinctcount" => // exact value-set partials
              partials += expr(s"collect_set($argSql)").as(s"__p_$a")
              combines += expr("cast(size(array_distinct(flatten(" +
                s"collect_list(__p_$a)))) as bigint)").as(a)
              finals += a -> col(a)
            case other => fail(s"aggregation definitions support " +
              s"sum/count/min/max/avg/stdDev/distinctCount, got '$other'")
          }
        case _ => fail(s"aggregation select item '${sqlOf(it.e)}' must " +
          "be a group key or an aggregate call")
      }
    }
    val pCols = partials.result()
    if (pCols.isEmpty) fail("aggregation definition has no aggregates")
    (pCols, combines.result(), finals.result().toMap)
  }

  /** Componentwise merge of two finest-grain partial tables aliased
    * `t` (accumulated state) and `u` (the batch's partials), for the
    * LIVE fold: sum partials stay null iff both sides are (SQL
    * sum-over-all-null semantics), counts add with absent-side 0,
    * min/max take least/greatest (which skip single-side nulls). */
  private def aggMergeCols(adef: AggDef): Seq[Column] = {
    def add(c: String) = (coalesce(col(s"t.$c"), lit(0)) +
      coalesce(col(s"u.$c"), lit(0))).as(c)
    def addSum(c: String) =
      when(col(s"t.$c").isNull && col(s"u.$c").isNull, lit(null))
        .otherwise(coalesce(col(s"t.$c"), lit(0)) +
          coalesce(col(s"u.$c"), lit(0))).as(c)
    adef.select.zipWithIndex.flatMap { case (it, i) =>
      val a = alias(it, i)
      it.e match {
        case Ref(k :: Nil) if adef.groupBy.contains(k) => Nil
        case Call(None, fn, _) => fn.toLowerCase match {
          case "sum" => Seq(addSum(s"__p_$a"))
          case "count" => Seq(add(s"__p_$a"))
          case "min" => Seq(least(col(s"t.__p_$a"),
            col(s"u.__p_$a")).as(s"__p_$a"))
          case "max" => Seq(greatest(col(s"t.__p_$a"),
            col(s"u.__p_$a")).as(s"__p_$a"))
          case "avg" => Seq(addSum(s"__ps_$a"), add(s"__pc_$a"))
          case "stddev" => FoldAlg.mergeCols("stddev", s"__p_$a")
          case "distinctcount" =>
            FoldAlg.mergeCols("distinctcount", s"__p_$a")
          case _ => Nil // aggPlanCols already diagnosed
        }
        case _ => Nil
      }
    }
  }

  /** Finest-grain partial table of `src` (already schema-checked):
    * one row per (bucket, group keys) with the partial columns. */
  private def aggGrainPartial(src0: DataFrame, adef: AggDef,
      pCols: Seq[Column]): DataFrame = {
    if (!src0.columns.contains(adef.tsAttr))
      fail(s"aggregation timestamp attribute '${adef.tsAttr}' is not a " +
        s"column of '${adef.source}' (nanosecond epoch expected)")
    val src = adef.filter.fold(src0)(f => src0.where(expr(sqlOf(f))))
    val finestMs = grainMsOf(adef.grains.head)
    val ts = adef.tsAttr
    // `__gb` (grain bucket), NOT `__b` — the live fold runner uses
    // `__b` for its hash-bucket parquet partitioning and would
    // clobber a same-named state column
    src.withColumn("__gb",
        expr(s"($ts div ${finestMs * 1000000L}L) * ${finestMs}L"))
      .groupBy(col("__gb") +: adef.groupBy.map(col): _*)
      .agg(pCols.head, pCols.tail: _*)
  }

  /** Roll a finest-grain partial table up to the read grain, bound it
    * by the within range, finalize derived aggregates. */
  private def aggRollUp(grainTable: DataFrame, adef: AggDef,
      perMs: Long, lo: Long, hi: Long, cCols: Seq[Column],
      fMap: Map[String, Column]): DataFrame = {
    val keys = adef.groupBy
    val rolled = grainTable
      .withColumn("__bp", expr(s"(__gb div ${perMs}L) * ${perMs}L"))
      .groupBy(col("__bp") +: keys.map(col): _*)
      .agg(cCols.head, cCols.tail: _*)
      .withColumnRenamed("__bp", "bucket_start_ms")
      .where(col("bucket_start_ms") >= lo && col("bucket_start_ms") < hi)
    // finalize derived aggregates (avg = sum/count), keep keys
    rolled.select(col("bucket_start_ms") +:
      (keys.map(col) ++ adef.select.zipWithIndex.map { case (it, i) =>
        val a = alias(it, i)
        it.e match {
          case Ref(k :: Nil) if keys.contains(k) => col(k)
          case _ => fMap(a)
        }
      }): _*)
  }

  private def aggStored(spark: SparkSession, dir: String,
      s: SingleStream, adef: AggDef,
      env: Map[String, DataFrame]): DataFrame = {
    val (perMs, lo, hi) = aggReadSpec(s, adef)
    val (pCols, cCols, fMap) = aggPlanCols(adef)
    val src0 = loadTable(spark, dir, adef.source, env)
    if (!src0.columns.contains(adef.tsAttr))
      fail(s"aggregation timestamp attribute '${adef.tsAttr}' is not a " +
        s"column of '${adef.source}' (nanosecond epoch expected)")
    // push the within range to the scan: a per-grain bucket B survives
    // iff lo <= B < hi; its rows have ts in [B, B + per), so the row
    // bound is [ceil(lo/per)*per, (floor((hi-1)/per)+1)*per) — aligned,
    // exact, and pushdown-visible
    val rowLoNs = ((lo + perMs - 1) / perMs) * perMs * 1000000L
    val rowHiNs = (((hi - 1) / perMs) + 1) * perMs * 1000000L
    val ranged = src0.where(col(adef.tsAttr) >= rowLoNs &&
      col(adef.tsAttr) < rowHiNs)
    val grainTable = aggGrainPartial(ranged, adef, pCols)
    aggRollUp(grainTable, adef, perMs, lo, hi, cCols, fMap)
  }

  private def compileAggQuery(spark: SparkSession, dir: String, ast: Ast,
      s: SingleStream, adef: AggDef,
      env: Map[String, DataFrame]): DataFrame = {
    if (ast.groupBy.nonEmpty || ast.having.nonEmpty)
      fail("an aggregation read is a projection over stored attributes " +
        "(no group by / having — grouping happened at definition time)")
    val stored = aggStored(spark, dir, s, adef, env)
    // the read's select is a projection over bucket_start_ms + stored attrs
    val items = itemsOf(ast)
    items.foreach { case (_, a, isAgg) =>
      if (isAgg) fail("an aggregation read selects stored attributes " +
        s"(no re-aggregation, v1): '$a'")
    }
    stored.select(col("bucket_start_ms") +: items.map { case (it, a, _) =>
      expr(sqlOf(it.e)).as(a)
    }: _*)
  }

  /** Output rate limiting under batch replay (SURVEY §2.7; engine twins:
    * graft.engine.Ops.rateLimit / rateLimitEvents / rateLimitSnapshot).
    *
    *   - `output first|last every T`   → per time-interval first/last row
    *     (row_number over the interval, pruned to 1 — one shuffle on the
    *     interval id, fully parallel across intervals);
    *   - `output first|last every N events` → per-chunk-of-N first/last
    *     in global arrival order (inherently sequential, same caveat as
    *     `lengthBatch` — the reference's single-threaded emission order);
    *   - `output all every ...`        → identity under batch replay (the
    *     buffered batches concatenate to exactly the input);
    *   - `output snapshot every T`     → the latest row as of every
    *     interval end across the stream's span, gaps carrying the prior
    *     snapshot forward (emitted with a leading `w_end_ms`, the same
    *     implicit-column convention as timeBatch's `w_start_ms`).
    *
    * v1: plain filtered projections only — windows/aggregations combine
    * with rate limiting in ways batch replay can't reproduce faithfully,
    * so they fail fast rather than mis-compile. */
  private def compileRateLimited(spark: SparkSession, dir: String, ast: Ast,
      s: SingleStream, rate: Rate,
      env: Map[String, DataFrame]): DataFrame = {
    if (ast.having.nonEmpty)
      fail("output rate limiting (v1) has no having clause")
    s.window match {
      case Some(w) =>
        return compileRateWindowed(spark, dir, ast, s, w, rate, env)
      case None => ()
    }
    if (ast.groupBy.nonEmpty)
      fail("output rate limiting (v1) applies to plain `from S[filter] " +
        "select ...` queries, or to an UNGROUPED windowed aggregation " +
        "(add #window.timeBatch(T)); grouped rates are not defined")
    val items = itemsOf(ast)
    items.foreach { case (_, a, isAgg) =>
      if (isAgg) fail(s"output rate limiting over an aggregate ('$a') " +
        "needs a batch window (#window.timeBatch(T)) to define flush " +
        "emissions")
    }
    val base0 = loadTable(spark, dir, s.table, env)
    if (!base0.columns.contains("ts_ns") ||
        !base0.columns.contains("event_id"))
      fail(s"output rate limiting needs 'ts_ns' and 'event_id' on " +
        s"'${s.table}' to define emission order")
    val base = s.filter.fold(base0)(f => base0.where(expr(sqlOf(f))))
    val outCols = items.map(_._2)
    def proj(df: DataFrame): DataFrame =
      df.select(items.map { case (it, a, _) =>
        expr(sqlOf(it.e)).as(a)
      }: _*)
    val ordAsc = "ts_ns, event_id"
    val ordDesc = "ts_ns desc, event_id desc"
    (rate.mode, rate.timeNs, rate.count) match {
      case ("all", _, _) => proj(base) // replayed batches ≡ the input
      case (m @ ("first" | "last"), Some(t), None) =>
        val ord = if (m == "first") ordAsc else ordDesc
        proj(base
          .withColumn("__rn", expr(s"row_number() over (partition by " +
            s"ts_ns div ${t}L order by $ord)"))
          .where(col("__rn") === 1))
      case (m @ ("first" | "last"), None, Some(n)) =>
        // arrival ranks ride the DISTRIBUTED prefix sum; the chunk
        // pick is a chunk-PARTITIONED window — no data-sized global
        // single-task stage (the r9 guardGlobalWindow refusal is gone)
        val pick = if (m == "first") "min" else "max"
        proj(globalRank(base, Seq(col("ts_ns"), col("event_id")), "__rn")
          .withColumn("__keep", expr(s"$pick(__rn) over (partition by " +
            s"(__rn - 1) div ${n}L)"))
          .where(col("__rn") === col("__keep")))
      case ("snapshot", Some(t), None) =>
        val ivMs = t / 1000000L
        val rows = base.select(items.map { case (it, a, _) =>
          expr(sqlOf(it.e)).as(a)
        } :+ expr(s"ts_ns div ${t}L").as("__iv")
          :+ struct(col("ts_ns"), col("event_id")).as("__ord"): _*)
        val lastPer = rows.groupBy("__iv")
          .agg(max_by(struct(outCols.map(col): _*), col("__ord"))
            .as("__row"))
        val ticks = lastPer
          .agg(min("__iv").as("__lo"), max("__iv").as("__hi"))
          .select(explode(sequence(col("__lo"), col("__hi"))).as("__iv"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("__iv")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        // gap intervals carry the previous snapshot forward; snapshot
        // cardinality is one row per interval, so the single-task global
        // window is O(span/T), not O(events)
        val filled = ticks.join(lastPer, Seq("__iv"), "left_outer")
          .select(col("__iv") +: outCols.map(c =>
            last(col(s"__row.$c"), ignoreNulls = true).over(w).as(c)): _*)
        filled.select(
          ((col("__iv") + 1) * ivMs).as("w_end_ms") +:
            outCols.map(col): _*)
      case _ => fail("unreachable: rate clause validated at parse")
    }
  }

  /** Output rate limiting OVER a windowed aggregation: the rated
    * "events" are the window's FLUSH rows (one per timeBatch bucket —
    * ungrouped, v1), emitted at the bucket's end (`w_end_ms`).
    * `first/last every T` keeps one flush row per rate interval
    * (interval = w_end_ms div T), `every N events` chunks flush rows
    * by arrival, `snapshot` carries the latest flush across empty
    * intervals. Flush cardinality is span/Tw, so every rank window
    * here is O(flushes), never O(events). */
  private def compileRateWindowed(spark: SparkSession, dir: String,
      ast: Ast, s: SingleStream, w: WindowSpec, rate: Rate,
      env: Map[String, DataFrame]): DataFrame = {
    val twNs = w.name.toLowerCase match {
      case "timebatch" => w.args.head
      case other => fail("output rate limiting over a window (v1) " +
        s"supports #window.timeBatch(T); '#window.$other' emissions " +
        "are per-event or unordered")
    }
    if (ast.groupBy.nonEmpty)
      fail("output rate limiting over a windowed aggregation (v1) is " +
        "ungrouped — one flush row per window (shard per-key streams " +
        "with `partition with`)")
    val items = itemsOf(ast)
    items.foreach { case (it, a, isAgg) =>
      if (!isAgg && refsAttr(it.e))
        fail(s"rate-limited windowed select item '$a' must aggregate " +
          "(or be a constant) — the flush row is the emission")
    }
    val aggCols = items.collect { case (it, a, true) =>
      expr(sqlOf(it.e)).as(a) }
    if (aggCols.isEmpty)
      fail("a rate-limited windowed query needs an aggregate select " +
        "item (drop the window to rate-limit raw events)")
    val base0 = loadTable(spark, dir, s.table, env)
    if (!base0.columns.contains("ts_ns"))
      fail(s"windowed rate limiting needs 'ts_ns' on '${s.table}'")
    val base =
      s.filter.fold(base0)(f => applyFilter(spark, dir, base0, f, env))
    val outCols = items.map(_._2)
    val flush = base
      .groupBy(expr(s"ts_ns div ${twNs}L").as("__wb"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("__wb") +:
        items.map { case (it, a, isAgg) =>
          (if (isAgg) col(a) else expr(sqlOf(it.e))).as(a) }: _*)
    rateOverFlushes(flush, outCols, twNs / 1000000L, rate)
  }

  /** Pattern clause → (builder, select extractors, output schema) —
    * shared by the batch plan path ([[compilePattern]] → selectPlan) and
    * the live deployment path ([[deployAppOn]] → selectStream). */
  private def patternParts(ast: Ast, pt: PatternStream)
      : (Patterns.PatternBuilder,
         List[(String, String, String, Cep.Bindings => Any)],
         Seq[(String, DataType)]) = {
    if (ast.groupBy.nonEmpty || ast.having.nonEmpty)
      fail("group by / having do not apply to pattern clauses")
    pt.steps.foreach { st =>
      val tbls = st match {
        case PatCond(_, t, _, _, _) => Seq(t)
        case PatAbsent(t, _, _) => Seq(t)
        case PatPair(_, _, t1, _, _, t2, _) => Seq(t1, t2)
      }
      tbls.foreach { tbl =>
        if (!tbl.equalsIgnoreCase("events"))
          fail(s"pattern streams read 'events', got '$tbl'")
      }
    }
    pt.steps.head match {
      case _: PatAbsent => fail("a pattern cannot start with an absence")
      case _: PatPair => fail("a logical pair starts from the second " +
        "step (v1)")
      case _: PatCond => ()
    }
    val bindings = pt.steps.flatMap {
      case PatCond(b, _, _, _, _) => Seq(b)
      case PatPair(_, b1, _, _, b2, _, _) => Seq(b1, b2)
      case _: PatAbsent => Nil
    }.toSet
    // extractor per select item — picks the bound event(s): head for
    // plain refs, position/last for indexed refs (a quantified binding
    // holds several events); an UNBOUND declared binding (the untaken
    // branch of an or-pair) and out-of-range indexes yield null, the
    // reference's missing-event semantics, so `coalesce(e2.f, e3.f)`
    // projects whichever branch matched
    def extractorOf(e: Expr): (Cep.Bindings => Any, DataType, String) =
      e match {
        case Ref(bn :: f :: Nil) =>
          if (!bindings(bn)) fail(s"select references unknown binding " +
            s"'$bn'")
          ((bnd: Cep.Bindings) =>
            bnd.get(bn).map(evs => field(evs.head, f)).orNull,
            fieldType(f), s"${bn}_$f")
        case IdxRef(bn, idx, f) =>
          if (!bindings(bn)) fail(s"select references unknown binding " +
            s"'$bn'")
          ((bnd: Cep.Bindings) => bnd.get(bn) match {
            case None => null
            case Some(evs) => idx match {
              case Some(ix) => if (ix < evs.size) field(evs(ix), f)
                               else null
              case None => field(evs.last, f)
            }
          }, fieldType(f), s"${bn}_$f")
        case Call(None, n, args)
            if n.equalsIgnoreCase("coalesce") && args.nonEmpty =>
          val subs = args.map(extractorOf)
          ((bnd: Cep.Bindings) =>
            subs.iterator.map(_._1(bnd)).find(_ != null).orNull,
            subs.head._2, "coalesce")
        case other => fail("pattern select items must be binding.field " +
          "/ binding[i].field references or coalesce(...) of them, " +
          s"got '${sqlOf(other)}'")
      }
    val sel: List[(String, String, String, Cep.Bindings => Any)] =
      ast.select.zipWithIndex.map { case (it, i) =>
        val (ex, dt, base) = extractorOf(it.e)
        val a = it.alias.getOrElse(if (base == "coalesce") s"col$i"
                                   else base)
        ("", dtName(dt), a, ex)
      }
    var b = pt.steps.head match {
      case PatCond(bn, _, cond, q, _) =>
        val b0 = Patterns.begin(bn)(evalPred(cond))
        q.fold(b0) { case (m, n) => b0.times(m, n) }
      case _ => fail("unreachable: head checked above")
    }
    pt.steps.tail.zipWithIndex.foreach {
      case (PatCond(bn, _, cond, q, strict), _) =>
        b = if (strict) b.next(bn)(evalPred(cond))
            else b.followedBy(bn)(evalPred(cond))
        q.foreach { case (m, n) => b = b.times(m, n) }
      case (PatPair(isAnd, b1, _, c1, b2, _, c2), _) =>
        b = if (isAnd) b.both(b1)(evalPred(c1))(b2)(evalPred(c2))
            else b.either(b1)(evalPred(c1))(b2)(evalPred(c2))
      case (PatAbsent(_, cond, forNs), i) =>
        b = b.notFor(s"__not$i",
          scala.concurrent.duration.Duration.fromNanos(forNs))(
          evalPred(cond))
    }
    pt.withinNs.foreach { w =>
      b = b.within(scala.concurrent.duration.Duration.fromNanos(w))
    }
    if (!pt.every) b = b.firstOnly
    val out = sel.map { case (_, tn, a, _) => (a, typeOfName(tn)) }
    (b, sel, out)
  }

  private def dtName(dt: DataType): String = dt match {
    case LongType => "long"
    case DoubleType => "double"
    case StringType => "string"
    case other => fail(s"unsupported pattern output type $other")
  }
  private def typeOfName(n: String): DataType = n match {
    case "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case other => fail(s"unsupported pattern output type '$other'")
  }

  private def compilePattern(spark: SparkSession, dir: String, ast: Ast,
                             pt: PatternStream,
                             rate: Option[Rate] = None): DataFrame = {
    val (b, sel, out) = patternParts(ast, pt)
    rate match {
      case None =>
        b.selectPlan(spark, dir, out) { bnd =>
          sel.map { case (_, _, _, extract) => extract(bnd) }
        }
      case Some(r) =>
        // rate limiting over a PATTERN: the rated events are the
        // MATCHES, each emitted at its closing (max-ts) bound event;
        // matches closed by the same event (one e2 completing several
        // `every` runs at once) tie-break by SPAWN order — the first
        // bound event — Siddhi's in-chunk emission order.
        val out2 = out ++ Seq(("__emit_ns", LongType),
          ("__sp_ts", LongType), ("__sp_id", LongType))
        val df = b.selectPlan(spark, dir, out2) { bnd =>
          val evs = bnd.valuesIterator.flatten.toSeq
          val sp = evs.minBy(e => (e.tsNs, e.eventId))
          sel.map { case (_, _, _, extract) => extract(bnd) } ++
            Seq(evs.map(_.tsNs).max, sp.tsNs, sp.eventId)
        }
        val outCols = out.map(_._1)
        def proj(kept: DataFrame): DataFrame =
          kept.select(outCols.map(col): _*)
        import org.apache.spark.sql.expressions.Window
        val ordAsc = Seq(col("__emit_ns").asc, col("__sp_ts").asc,
          col("__sp_id").asc)
        val ordDesc = Seq(col("__emit_ns").desc, col("__sp_ts").desc,
          col("__sp_id").desc)
        (r.mode, r.timeNs, r.count) match {
          case ("all", _, _) => proj(df) // emission batching only
          case (m @ ("first" | "last"), Some(t), None) =>
            val w = Window.partitionBy(expr(s"__emit_ns div ${t}L"))
              .orderBy((if (m == "first") ordAsc else ordDesc): _*)
            proj(df.withColumn("__rn", row_number().over(w))
              .where(col("__rn") === 1))
          case (m @ ("first" | "last"), None, Some(n)) =>
            // match-emission ranks from the distributed prefix sum;
            // chunk-partitioned pick — no global single-task window
            val pick = if (m == "first") "min" else "max"
            proj(globalRank(df, Seq(col("__emit_ns"), col("__sp_ts"),
                col("__sp_id")), "__rn")
              .withColumn("__keep", expr(s"$pick(__rn) over (partition " +
                s"by (__rn - 1) div ${n}L)"))
              .where(col("__rn") === col("__keep")))
          case ("snapshot", _, _) =>
            fail("output snapshot over a pattern (v1): insert the " +
              "matches into a stream and snapshot that stream")
          case _ => fail("unreachable: rate clause validated at parse")
        }
    }
  }

  // ---------- live deployment ----------
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
  private def parseTableDef(body: String): Option[(String, StructType)] = {
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

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

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
  private sealed trait StateMode
  private case object FullState extends StateMode
  private case object AppendState extends StateMode

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
  private final case class KeyedState(keys: Seq[String],
      batchKeys: (SparkSession, String, DataFrame) => DataFrame)
    extends StateMode

  /** A [[LiveFold]] state as the fold sees it: `slice` is what the
    * fold may MERGE INTO and must return the replacement of (the
    * touched buckets for [[KeyedState]], the whole state for
    * [[FullState]], empty for [[AppendState]] — append folds return
    * their delta); `full` lazily reads the entire accumulated state
    * for folds that must JOIN against it (the enrichment join reads
    * the whole maintained table even when only a few keys changed). */
  private final case class LiveState(slice: DataFrame,
      full: () => DataFrame)

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
  private final case class LiveFold(feed: DataFrame,
      schemas: Seq[(String, StructType, StateMode)],
      fold: (SparkSession, String, Map[String, LiveState], DataFrame)
        => Map[String, DataFrame],
      finish: (SparkSession, Map[String, DataFrame]) => DataFrame,
      ordCols: Seq[Column])

  /** [[StateMode]] of a DML-maintained table state: insert-only DML
    * appends (the fold's output IS the batch delta when folded into an
    * empty slice), keyed DML (delete/update/upsert) bucket-merges on
    * its `on` key columns. The batch-key probe replays the DML stage's
    * filter+select over the batch and projects the `on` RHS
    * expressions CAST to the table key types, so batch rows and state
    * rows hash into the same buckets. */
  private def dmlStateMode(ast: Ast, act: Action, schema: StructType,
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
  private def windowedDmlFold(feed: DataFrame, ast: Ast, act: Action,
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

  /** Rate-mode selection over FLUSH rows (`__wb` bucket + output
    * attrs) — the tail of [[compileRateWindowed]], shared with the
    * live flush-fold's finish so live rate-over-window semantics are
    * the batch code itself. */
  private def rateOverFlushes(flush0: DataFrame, outCols: Seq[String],
      twMs: Long, rate: Rate): DataFrame = {
    val flush = flush0
      .withColumn("w_end_ms", (col("__wb") + 1) * lit(twMs))
    val sel = col("w_end_ms") +: outCols.map(col)
    (rate.mode, rate.timeNs, rate.count) match {
      case ("all", _, _) => flush.select(sel: _*)
      case (m @ ("first" | "last"), Some(t), None) =>
        val trMs = t / 1000000L
        val ord = if (m == "first") "__wb" else "__wb desc"
        flush.withColumn("__rn", expr("row_number() over (partition " +
            s"by w_end_ms div ${trMs}L order by $ord)"))
          .where(col("__rn") === 1).select(sel: _*)
      case (m @ ("first" | "last"), None, Some(n)) =>
        val pick = if (m == "first") "min" else "max"
        flush.withColumn("__rn",
            expr("row_number() over (order by __wb)"))
          .withColumn("__keep", expr(s"$pick(__rn) over (partition by " +
            s"(__rn - 1) div ${n}L)"))
          .where(col("__rn") === col("__keep")).select(sel: _*)
      case ("snapshot", Some(t), None) =>
        val trMs = t / 1000000L
        val lastPer = flush
          .withColumn("__iv", expr(s"w_end_ms div ${trMs}L"))
          .groupBy("__iv")
          .agg(max_by(struct(outCols.map(col): _*), col("__wb"))
            .as("__row"))
        val ticks = lastPer
          .agg(min("__iv").as("__lo"), max("__iv").as("__hi"))
          .select(explode(sequence(col("__lo"), col("__hi"))).as("__iv"))
        val wn = org.apache.spark.sql.expressions.Window.orderBy("__iv")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        // gap intervals carry the previous snapshot forward; snapshot
        // cardinality is one row per interval — O(span/T)
        ticks.join(lastPer, Seq("__iv"), "left_outer")
          .select(((col("__iv") + 1) * trMs).as("w_end_ms") +:
            outCols.map(c =>
              last(col(s"__row.$c"), ignoreNulls = true).over(wn).as(c))
            : _*)
      case _ => fail("unreachable: rate clause validated at parse")
    }
  }

  /** The shared core of the live windowed folds ([[windowedDmlFold]],
    * rate-over-window): per-(bucket ∪ group keys) algebraic flush
    * PARTIALS merged componentwise per trigger; `finish` receives the
    * finalized flush relation (`__wb` + group keys + output attrs) —
    * also evaluated over an EMPTY flush at build time, so a bad stage
    * fails at deploy and the caller gets the result prototype. */
  private def flushPartialFold(feed: DataFrame, filter: Option[Expr],
      groupBy: List[String], items: List[(SelItem, String, Boolean)],
      tNs: Long, fnsSnap: Map[String, ScriptFn], ordCols: Seq[Column],
      finish: (SparkSession, DataFrame) => DataFrame)
      : (LiveFold, DataFrame) = {
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
    def mergeComp(base: String, n: String): Seq[Column] =
      FoldAlg.mergeCols(n, base)
    val empty = emptyOf(feed.sparkSession, feed.schema)
    val stateSchema = partialOf(empty).schema
    // the finalized flush relation: __wb + output attrs (group keys
    // appear among the outputs — the select-item checks enforce it)
    def flushOf(acc: DataFrame): DataFrame =
      acc.select(col("__wb") +:
        finals.map { case (a, e) => expr(sqlOf(e)).as(a) }: _*)
    // deploy-time validation + the caller's result prototype
    val proto = finish(feed.sparkSession, flushOf(partialOf(empty)))
    (singleFold(feed, stateSchema,
      (sp, _, acc, batch) => {
        scriptFns = fnsSnap
        val u = partialOf(batch)
        // <=> so a null group key merges with itself across triggers
        acc.as("t").join(u.as("u"),
            keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _),
            "full_outer")
          .select(keys.map(k =>
            coalesce(col(s"u.$k"), col(s"t.$k")).as(k)) ++
            comps.toSeq.flatMap { case (b2, n, _) => mergeComp(b2, n) }
            : _*)
      },
      (sp, acc) => {
        scriptFns = fnsSnap
        finish(sp, flushOf(acc))
      }, ordCols,
      KeyedState(keys, (sp, _, batch) => {
        scriptFns = fnsSnap
        keyedSel(batch).select(keys.map(col): _*)
      })), proto)
  }

  /** The one-state [[LiveFold]] shape every pre-enrichment fold stage
    * uses (table DML, unique:last, sort, frequent). */
  private def singleFold(feed: DataFrame, schema: StructType,
      fold: (SparkSession, String, DataFrame, DataFrame) => DataFrame,
      finish: (SparkSession, DataFrame) => DataFrame,
      ordCols: Seq[Column],
      mode: StateMode = FullState): LiveFold =
    LiveFold(feed, Seq(("state", schema, mode)),
      (sp, d, st, b) => Map("state" -> fold(sp, d, st("state").slice, b)),
      (sp, st) => finish(sp, st("state")), ordCols)

  /** `partition with (<spec>) begin <queries> end` → (inner query text,
    * keyed attribute OR range branches, partitioned stream name).
    * Shared by the batch compile and the live deployment. */
  private def parsePartition(body: String)
      : (String, Option[String], List[(Expr, String)], String) = {
    val m = ("(?is)^partition\\s+with\\s*\\((.*)\\)\\s*" +
      "begin\\b(.*?)\\bend\\s*$").r.findFirstMatchIn(body)
      .getOrElse(fail("malformed partition: expected `partition " +
        "with (<spec> of <stream>) begin <queries> end`"))
    val (spec, innerBody) = (m.group(1), m.group(2))
    val sp = new P(lex(spec))
    val ranges = List.newBuilder[(Expr, String)]
    var keyAttr: Option[String] = None
    var done = false
    while (!done) {
      val e = sp.rangeExpr()
      if (sp.tryKw("as")) {
        val label = sp.advance() match {
          case TStr(l) => l
          case t => fail(s"range label must be a string, got $t")
        }
        ranges += ((e, label))
        if (!sp.tryKw("or")) done = true
      } else {
        e match {
          case Ref(attr :: Nil) => keyAttr = Some(attr); done = true
          case other => fail("partition spec must be `<attr> of S` " +
            s"or `cond as 'label' or ... of S`, got '${sqlOf(other)}'")
        }
      }
    }
    sp.eatKw("of")
    val srcName = sp.ident()
    (innerBody, keyAttr, ranges.result(), srcName)
  }

  /** Stage compiler shared by [[deployAppOn]] and [[deployApp]]:
    * returns the `out` query's streaming DataFrame (with its stage
    * kind 0=stateless / 1=complete-agg / 2=windowed-append-agg and
    * ordering), or — when `out` names a table-DML statement — the DML
    * spec (ast, action, table schema, feeding stream name + its
    * streaming DataFrame) for the caller's foreachBatch merge. */
  private def deployStages(src: DataFrame, app: String, out: String)
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
    var env = Map[String, DataFrame](
      "events" -> srcTs.withWatermark("ts", "1 minute"))
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
        ivNs: Long): DataFrame = {
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
      val w = window(col("ts"), s"${ivNs / 1000} microseconds")
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
        // batch replay's named-window sharing, on the incremental plan)
        val ast = ast0L.stream match {
          case ss: SingleStream if liveWindowDefs.contains(ss.table) &&
              ss.window.isEmpty =>
            if (!env.contains(ss.table))
              fail(s"named window '${ss.table}' has not been fed — " +
                s"add an `insert into ${ss.table}` query first")
            ast0L.copy(stream = ss.copy(
              window = Some(liveWindowDefs(ss.table))))
          case _ => ast0L
        }
        if (ast.rate.nonEmpty && ast.stream.isInstanceOf[PatternStream])
          fail("live deployment (v1) does not rate-limit pattern " +
            "matches — insert the matches into a stream and rate that " +
            "stream, or use the batch replay (compileApp)")
        val dmlAct = ast.action.filter {
          case InsertInto(t) => tableDefs.contains(t)
          case _             => true
        }
        if (dmlAct.nonEmpty) {
          if (partKey.nonEmpty)
            fail("table DML inside a partition block is not deployed " +
              "(v1) — batch replay diagnoses it the same way")
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
            winSpec match {
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
                    (windowedAgg(ast, base, "w_start_ms", args.head),
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
                val attr = sargs2.headOption.getOrElse(
                  fail("unique:first needs an attribute argument"))
                if (!base.columns.contains(attr))
                  fail(s"unique:first key '$attr' is not a column")
                // keyed dedup state is held forever BY CONTRACT —
                // unique:first must remember every key it has seen, so
                // state is bounded by the key domain, not the watermark
                (selectOrAggregate(ast, base.dropDuplicates(attr), Nil,
                  windowed = false), KStateless)
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
                  if n2.equalsIgnoreCase("unique:last") =>
                // live unique:last: keep-LAST per key — the emitted-row
                // retraction (Update-mode semantics) Spark sinks can't
                // express becomes a per-micro-batch keyed fold: each
                // batch's rows merge into one state row per distinct
                // key (the unique-window contract bounds state by the
                // key domain, exactly like unique:first's dedup state)
                if (ast.rate.nonEmpty)
                  fail("live rate limiting applies to stateless stages " +
                    "(v1) — not above a unique window")
                if (ast.select.exists(it => containsAgg(it.e)) ||
                    ast.groupBy.nonEmpty)
                  fail("live unique:last projects columns (v1)")
                val attr = sargs2.headOption.getOrElse(
                  fail("unique:last needs an attribute argument"))
                Seq(attr, "ts_ns", "event_id").foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"live unique:last needs column '$c'"))
                val items = itemsOf(ast)
                def selLast(df: DataFrame): DataFrame =
                  df.select(items.map { case (it, a, _) =>
                    expr(sqlOf(it.e)).as(a) } ++ Seq(
                    col(attr).as("__ukey"), col("ts_ns").as("__uord_ts"),
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
                      batch.select(col(attr)
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
                val attr = sargs2.headOption.getOrElse(
                  fail("sort needs an attribute argument"))
                val asc =
                  sargs2.drop(1).headOption.forall(_ equalsIgnoreCase "asc")
                Seq(attr, "ts_ns", "event_id").foreach(c =>
                  if (!base.columns.contains(c))
                    fail(s"live sort window needs column '$c'"))
                val ordS =
                  if (asc) Seq(col(attr).asc, col("ts_ns").asc,
                    col("event_id").asc)
                  else Seq(col(attr).desc, col("ts_ns").asc,
                    col("event_id").asc)
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
            val schema = StructType(outSchema.map { case (n, t) =>
              StructField(n, t) })
            implicit val enc: org.apache.spark.sql.Encoder[
              org.apache.spark.sql.Row] =
              org.apache.spark.sql.Encoders.row(schema)
            val proj = (bnd: Cep.Bindings) =>
              org.apache.spark.sql.Row.fromSeq(
                sel.map { case (_, _, _, extract) => extract(bnd) })
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
              (b.selectStreamTimed(evT)(proj).toDF(), KWindowAgg)
            } else
              (b.selectStream(evDs)(proj).toDF(), KStateless)
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
          case j: JoinStream
              if dmlInfos.contains(j.left.table) ||
                 dmlInfos.contains(j.right.table) =>
            if (partKey.nonEmpty)
              fail("enrichment joins inside a partition block are not " +
                "deployed (v1)")
            if (dmlInfos.contains(j.left.table))
              fail("live enrichment joins put the maintained table on " +
                "the RIGHT side (v1) — swap the join sides")
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
            if (writers.length > 1)
              fail("live enrichment joins read a table with ONE DML " +
                s"writer (v1); '$tName' has ${writers.length}")
            val dmlInfo = writers.head
            val (dAst, dAct, dSchema, dSrc) = dmlInfo
            val sName = sSide.table
            if (statefulStreams.contains(sName))
              fail(s"live deployment (v1): '$sName' is an aggregation " +
                "output — it cannot feed an enrichment join")
            val derivable = Set("events") ++ statelessAsts.map(_._1)
            Seq(sName, dSrc).foreach { n2 =>
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
            val winWriterTNs: Option[Long] = dAst.stream match {
              case ss2: SingleStream =>
                if (ss2.window.nonEmpty && ss2.window.get.args.isEmpty)
                  fail(s"windowed DML writer on '$tName' has a " +
                    "window with no duration")
                ss2.window.map(_.args.head)
              case _ => None
            }
            if (winWriterTNs.nonEmpty) {
              // READ-AT-FINISH enrichment of a WINDOWED-aggregate
              // store (the Siddhi store pattern read back through a
              // join): flush rows materialize at window flushes and
              // have no per-event as-of, so — exactly like the batch
              // compile, where a query joining the table sees the
              // final flush-merged relation — the live form folds the
              // windowed DML with the store pattern's per-(bucket ∪
              // group keys) partial state, APPENDS the stream side's
              // rows per trigger, and runs the join ONCE at finish
              // against the finished table. Siddhi-matching semantics:
              // the table IS its latest flush state.
              if (hasAggE)
                fail("live enrichment aggregation over a windowed-" +
                  "writer table is not deployed (v1) — project the " +
                  "join, aggregate in a downstream stage")
              if (ast.having.nonEmpty || ast.limit.nonEmpty ||
                  ast.offset.nonEmpty)
                fail("windowed-writer enrichment (v1) has no " +
                  "having/limit/offset")
              if (dSrc != "events")
                fail("windowed-writer enrichment (v1) reads a table " +
                  s"whose writer consumes the source stream; '$tName' " +
                  s"is written from derived stream '$dSrc'")
              val joinKindW = j.joinType match {
                case "inner" | "left_outer" => j.joinType
                case other => fail("windowed-writer enrichment joins " +
                  s"are inner or left outer (v1), got '$other'")
              }
              val tAliasW = j.rightAlias.getOrElse(tName)
              val sAliasW = j.leftAlias.getOrElse(sName)
              val itemsW = itemsOf(ast)
              val fnsSnapW = scriptFns
              def evOf(sp: SparkSession, d2: String,
                  batch: DataFrame): DataFrame = {
                scriptFns = fnsSnapW
                val benv = batchEnv(sp, d2, batch, statelessSnap)
                val b0 = loadTable(sp, d2, sName, benv)
                sSide.filter.fold(b0)(f =>
                  applyFilter(sp, d2, b0, f, benv))
              }
              def joinFin(table: DataFrame, evs: DataFrame)
                  : DataFrame = {
                scriptFns = fnsSnapW
                evs.as(sAliasW).join(table.as(tAliasW),
                    expr(sqlOfWith(j.on, _.mkString("."))), joinKindW)
                  .select(itemsW.map { case (it, a2, _) =>
                    expr(sqlOfWith(it.e, _.mkString("."))).as(a2) }: _*)
              }
              // deploy-time prototypes: fail fast + output schema
              val protoEv = evOf(sp0, "", emptyOf(sp0, srcTs.schema))
              val protoW = joinFin(emptyOf(sp0, dSchema),
                protoEv.limit(0))
              val keyW = name.orElse(ast.action.map(_.target))
              if (keyW.contains(out) || name.contains(out)) {
                val wf = windowedDmlFold(
                  emptyOf(sp0, srcTs.schema), dAst, dAct, dSchema,
                  winWriterTNs.get, fnsSnapW)
                foldResult = Some(LiveFold(srcTs,
                  wf.schemas :+ (("__ev", protoEv.schema, AppendState)),
                  (sp, d2, acc, batch) =>
                    wf.fold(sp, d2, acc, batch) +
                      ("__ev" -> evOf(sp, d2, batch)),
                  (sp, acc) => joinFin(wf.finish(sp, acc), acc("__ev")),
                  ast.orderBy.map { case (c2, asc) =>
                    if (asc) col(c2).asc else col(c2).desc }))
              }
              (emptyOf(sp0, protoW.schema), KFold)
            } else if (hasAggE) {
              // AGGREGATION ABOVE the enrichment join: each batch's
              // enriched rows compute exactly like the projection
              // form (same per-event as-of window pass), then fold as
              // ALGEBRAIC keyed partials — the FoldAlg algebra
              // components merged componentwise across triggers (the
              // join-agg fold recipe; O(batch-touched buckets) state
              // writes). The batch compile aggregates the identical
              // as-of rows globally, so it is the oracle under any
              // chunking.
              if (ast.having.nonEmpty)
                fail("live enrichment aggregation (v1) has no having")
              if (ast.limit.nonEmpty || ast.offset.nonEmpty)
                fail("live enrichment aggregation (v1) has no " +
                  "limit/offset")
              val items = itemsOf(ast)
              val keyItems = items.filter(!_._3)
              val keyAliases = keyItems.map(_._2)
              if (ast.groupBy.sorted != keyAliases.sorted.toList)
                fail("live enrichment aggregation (v1) groups by " +
                  "exactly the aliases of its non-aggregate select " +
                  s"items (non-aggregate [${keyAliases.mkString(", ")}]" +
                  s", group by [${ast.groupBy.mkString(", ")}])")
              val comps = scala.collection.mutable.Buffer
                .empty[(String, String, Option[Expr])]
              def rw(e: Expr): Expr = e match {
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
              val finals: Seq[(String, Expr)] = items.map {
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
                    "STREAM-side expressions (v1) — a table-side key " +
                    "needs the projection form + a downstream stage")
              }
              val sAliasL = j.leftAlias.getOrElse(sName)
              def streamKeySql(e: Expr): String = sqlOfWith(e, {
                case q2 :: c :: Nil if q2.equalsIgnoreCase(sAliasL) ||
                    q2.equalsIgnoreCase(sName) => c
                case c :: Nil => c
                case parts => fail("live enrichment aggregation group " +
                  s"keys are stream-side (v1); got " +
                  s"'${parts.mkString(".")}'")
              })
              val keySqls = keyItems.map { case (it, a2, _) =>
                (streamKeySql(it.e), a2) }
              // per-event rows: group-key exprs + aggregate arguments
              val rowsSel = keyItems.map { case (it, a2, _) =>
                SelItem(it.e, Some(a2)) } ++
                comps.toList.flatMap { case (base, _, argO) =>
                  argO.map(a0 => SelItem(a0, Some(s"${base}_x"))).toList }
              val astRows = ast.copy(select = rowsSel, groupBy = Nil,
                having = None, orderBy = Nil, limit = None,
                offset = None)
              val keys = if (keyAliases.isEmpty) Seq("__k")
                         else keyAliases
              def withK(df: DataFrame): DataFrame =
                if (keyAliases.isEmpty) df.withColumn("__k", lit(0L))
                else df
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
              // deploy-time prototypes (fail fast + schemas)
              val protoRows = enrichCompile(sp0, "", astRows, j, dmlInfo,
                emptyOf(sp0, dSchema),
                batchEnv(sp0, "", emptyOf(sp0, srcTs.schema),
                  statelessSnap))
              val schemaA = partialOf(withK(protoRows)).schema
              val protoOut = emptyOf(sp0, schemaA).select(finals.map {
                case (a2, e2) => expr(sqlOf(e2)).as(a2) }: _*)
              val keyE2 = name.orElse(ast.action.map(_.target))
              if (keyE2.contains(out) || name.contains(out)) {
                val fnsSnap = scriptFns
                val tMode = dmlStateMode(dAst, dAct, dSchema, dSrc,
                  fnsSnap, (sp, d2, batch) =>
                    batchEnv(sp, d2, batch, statelessSnap))
                foldResult = Some(LiveFold(srcTs,
                  Seq((tName, dSchema, tMode),
                    ("state", schemaA, KeyedState(keys,
                      (sp, d2, batch) => {
                        scriptFns = fnsSnap
                        if (keyAliases.isEmpty)
                          batch.select(lit(0L).as("__k"))
                        else {
                          val benv = batchEnv(sp, d2, batch,
                            statelessSnap)
                          val sb0 = envLookup(benv, sName)
                            .getOrElse(batch)
                          val sb = sSide.filter.fold(sb0)(f =>
                            applyFilter(sp, d2, sb0, f, benv))
                          sb.select(keySqls.map { case (sq, a2) =>
                            expr(sq).as(a2) }: _*)
                        }
                      }))),
                  (sp, d2, acc, batch) => {
                    scriptFns = fnsSnap
                    val benv = batchEnv(sp, d2, batch, statelessSnap)
                    val enriched = enrichCompile(sp, d2, astRows, j,
                      dmlInfo, acc(tName).full(), benv)
                    val u = partialOf(withK(enriched))
                    val merged = acc("state").slice.as("t")
                      .join(u.as("u"),
                        keys.map(k2 =>
                          col(s"t.$k2") <=> col(s"u.$k2"))
                          .reduce(_ && _), "full_outer")
                      .select(keys.map(k2 => coalesce(col(s"u.$k2"),
                          col(s"t.$k2")).as(k2)) ++
                        comps.toSeq.flatMap { case (b2, n, _) =>
                          mergeComp(b2, n) }: _*)
                    Map(
                      tName -> applyDml(sp, d2, dAst, dAct, dSchema,
                        acc(tName).slice, benv),
                      "state" -> merged)
                  },
                  (_, acc) => acc("state").select(finals.map {
                    case (a2, e2) => expr(sqlOf(e2)).as(a2) }: _*),
                  ast.orderBy.map { case (c2, asc) =>
                    if (asc) col(c2).asc else col(c2).desc }))
              }
              (emptyOf(sp0, protoOut.schema), KFold)
            } else {
            // fail fast at deploy time + learn the output schema
            val proto = enrichCompile(sp0, "", ast, j, dmlInfo,
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
              val tMode = dmlStateMode(dAst, dAct, dSchema, dSrc,
                fnsSnap, (sp, d2, batch) =>
                  batchEnv(sp, d2, batch, statelessSnap))
              foldResult = Some(LiveFold(srcTs,
                Seq((tName, dSchema, tMode),
                    ("__out", proto.schema, AppendState)),
                (sp, d2, acc, batch) => {
                  scriptFns = fnsSnap
                  val benv = batchEnv(sp, d2, batch, statelessSnap)
                  Map(
                    tName -> applyDml(sp, d2, dAst, dAct, dSchema,
                      acc(tName).slice, benv),
                    // the join reads the WHOLE pre-batch table (events
                    // may reference keys this batch didn't update)
                    "__out" -> enrichCompile(sp, d2, ast, j, dmlInfo,
                      acc(tName).full(), benv))
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
            case (Some(WindowSpec(ln, largs, _)),
                  Some(WindowSpec(rn, rargs, _)))
                if Seq(ln, rn).forall(n2 =>
                  n2.equalsIgnoreCase("time") ||
                    n2.equalsIgnoreCase("timebatch")) =>
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
                // event ids (the batch rateOverJoin's exact order).
                // Time modes fold per-interval extreme picks
                // (KeyedState on the interval — chunking-invariant: a
                // pair's interval is a function of its own emit ts, so
                // cross-trigger merges commute); count modes ride the
                // running pair counter (the single-stream count-rate
                // fold shape — pair emission is trigger-monotone under
                // the in-order replay, the same contract that fold
                // already carries).
                if (jType != "inner")
                  fail("live rate limiting over an OUTER join is not " +
                    "deployed (v1) — null-padded rows only materialize " +
                    "at watermark expiry, with no pair emission instant")
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
                  col(s"${la}_event_id").as("il"),
                  col(s"${ra}_event_id").as("ir"))
                val outColsJ = itemsJ.map(_._2)
                val feedJ = joined.select(itemsJ.map { case (it, a2, _) =>
                  expr(sqlOfWith(it.e, qual)).as(a2) } :+
                  emitTs.as("__emit_ts") :+ ordJ.as("__emit_ord"): _*)
                val ordFin = ast.orderBy.map { case (c2, asc) =>
                  if (asc) col(c2).asc else col(c2).desc }
                val keyJ2 = name.orElse(ast.action.map(_.target))
                carriedNow = Nil
                (rJ.mode, rJ.timeNs, rJ.count) match {
                  case ("all", _, _) => // emission batching only
                    (feedJ.drop("__emit_ts", "__emit_ord"), KStateless)
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
                          batch.select(col("__iv")))))
                    (emptyOf(joined.sparkSession, schemaR), KFold)
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
                if (jType != "inner")
                  fail("aggregation above an OUTER live windowed join " +
                    "is not deployed (v1) — null-padded rows only " +
                    "materialize at watermark expiry, after the fold; " +
                    "use an inner join or the chained two-query form")
                if (ast.having.nonEmpty)
                  fail("live join aggregation (v1) has no having clause")
                if (ast.limit.nonEmpty || ast.offset.nonEmpty)
                  fail("live join aggregation (v1) has no limit/offset")
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
                    (_, acc) => acc.select(finals.map {
                      case (a2, e2) => expr(sqlOf(e2)).as(a2) }: _*),
                    ast.orderBy.map { case (c2, asc) =>
                      if (asc) col(c2).asc else col(c2).desc },
                    KeyedState(keys, (_, _, batch) =>
                      batch.select(keys.map(col): _*))))
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
      else if (head.equalsIgnoreCase("from"))
        runStage(name, new P(lex(body)).query(), env, None)
      else fail(s"live deployment cannot run: '${body.take(40)}...'")
    }
    (result, foldResult)
  }

  /** Harness-side deployment: feed the events table through a
    * MemoryStream in `chunks` micro-batches, run the deployed topology to
    * completion on a memory sink, return the final (ordered) table —
    * the live twin the batch-replay oracle checks. */
  def deployApp(spark: SparkSession, dir: String, app: String, out: String,
                chunks: Int = 4): DataFrame = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = graft.engine.Streaming.feedRows(spark, dir)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Cep.Ev]
    val src = ms.toDF()
      .select(col("eventId").as("event_id"), col("tsNs").as("ts_ns"),
        col("userId").as("user_id"), col("eventType").as("event_type"),
        col("value"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    val (stages, dmlOpt) = deployStages(src, app, out)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // the flush design is DATA-batch driven (sentinels advance the
    // watermark, the batch after them emits under it), so Spark's
    // extra no-data micro-batch per watermark advance only doubles the
    // per-trigger checkpoint cost of a finite replay — a long-running
    // deployment would leave it on for idle-stream timer progress
    val prevNd = spark.conf
      .getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
      "false")
    // HARNESS scratch: streaming checkpoints (offsets/commits/state
    // deltas, fsync'd once per trigger) go to RAM-backed storage when
    // the platform offers it — the replay loop's bottleneck is the
    // per-trigger checkpoint round trip, not operator work, and a
    // REAL deployment points this at durable storage instead
    val ckptRoot = java.nio.file.Paths.get(
      graft.engine.Streaming.scratchDir("graft_ckpt"))
    def ckpt(tag: String): String = s"$ckptRoot/$tag"
    try {
      val per = math.max(rows.length / chunks, 1)
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
          val nBuckets = spark.conf.getOption("graft.live.stateBuckets")
            .map(_.toInt).getOrElse(16)
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
            case KeyedState(_, _) => readPaths(sp, n,
              (0 until nBuckets).flatMap(b =>
                latest.get((n, b)).map(g => path(n, g, b))))
          }
          def allStates(sp: SparkSession): Map[String, DataFrame] =
            lf.schemas.map { case (n, _, m) =>
              n -> fullState(sp, n, m) }.toMap
          val q = lf.feed.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt("fold"))
            .foreachBatch { (batch: DataFrame, _: Long) =>
              val sp = batch.sparkSession
              // buckets each keyed state's merge can touch — from the
              // batch's key values, before the fold reads any state
              val touched: Map[String, Seq[Int]] =
                lf.schemas.collect {
                  case (n, _, KeyedState(keys, batchKeys)) =>
                    n -> batchKeys(sp, dir, batch)
                      .select(bucketCol(keys).cast("int").as("__b"))
                      .distinct().collect().map(_.getInt(0)).toSeq
                }.toMap
              val states = lf.schemas.map { case (n, sch, m) =>
                n -> LiveState(
                  m match {
                    case FullState => fullState(sp, n, m)
                    case AppendState => emptyOf(sp, sch)
                    case KeyedState(_, _) => readPaths(sp, n,
                      touched(n).flatMap(b =>
                        latest.get((n, b)).map(g => path(n, g, b))))
                  },
                  () => fullState(sp, n, m))
              }.toMap
              val next = lf.fold(sp, dir, states, batch)
              val g1 = gen + 1
              lf.schemas.foreach { case (n, _, m) => m match {
                case FullState =>
                  next(n).write.mode("overwrite").parquet(path(n, g1, -1))
                  latest((n, -1)) = g1
                case AppendState =>
                  next(n).write.mode("overwrite").parquet(path(n, g1, -1))
                  appendGens(n) = appendGens(n) :+ g1
                case KeyedState(keys, _) =>
                  // the fold is a per-key merge, so its output holds
                  // exactly the touched buckets' new content; untouched
                  // buckets keep their prior generation untouched
                  next(n).withColumn("__b", bucketCol(keys))
                    .repartition(math.max(touched(n).size, 1),
                      col("__b"))
                    .write.mode("overwrite").partitionBy("__b")
                    .parquet(s"$tmp/gen$g1/$n")
                  touched(n).foreach(b => latest((n, b)) = g1)
                  foldWriteProbe.foreach(_ += ((g1, n, next(n).count())))
              }}
              gen = g1
            }.start()
          rows.grouped(per).foreach { g =>
            ms.addData(g.toSeq); q.processAllAvailable()
          }
          q.stop()
          val fin = lf.finish(spark, allStates(spark))
          if (lf.ordCols.nonEmpty) fin.orderBy(lf.ordCols: _*) else fin
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
              .map(_.toInt).getOrElse(16)
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
                val touched = bt.select(col("__b")).distinct()
                  .collect().map(_.getInt(0)).toSeq
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
              ms.addData(g.toSeq); q.processAllAvailable()
            }
            q.stop()
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
          val q = df.writeStream.format("memory").queryName(sinkName)
            .option("checkpointLocation", ckpt("sink"))
            .outputMode(mode).start()
          rows.grouped(per).foreach { g =>
            ms.addData(g.toSeq); q.processAllAvailable()
          }
          if (kind == 2) (0 to 1).foreach { k =>
            // two watermark-flush sentinel batches (engine twin:
            // Streaming.runStream): the first advances the watermark
            // past every real window, the second runs a batch UNDER
            // that advanced watermark so all remaining state emits and
            // evicts
            ms.addData(Seq(Cep.Ev(Long.MaxValue - 2 + k,
              graft.engine.Streaming.FlushNs + k * 3600000000000L,
              -1L, "__flush", 0.0)))
            q.processAllAvailable()
          }
          q.stop()
          val t = spark.table(sinkName)
          if (ordCols.nonEmpty) t.orderBy(ordCols: _*) else t
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
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
