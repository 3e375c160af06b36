package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filter / projection / joins / set ops (SURVEY.md §2.2, §2.5, §2.9).
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  *   - filter:      siddhi-core `query/processor/filter/FilterProcessor.java`
  *   - projection:  siddhi-core `query/selector/QuerySelector.java`
  *   - `in Table`:  siddhi-core
  *     `executor/condition/InConditionExpressionExecutor.java`
  *   - joins:       siddhi-core `query/input/stream/join/JoinProcessor.java`
  *
  * Everything here is a declarative DataFrame combinator: Catalyst handles
  * predicate pushdown, column pruning and join strategy selection. Dimension
  * tables that stay small at any scale factor (nation, region) carry explicit
  * `broadcast()` hints; fact-to-fact joins shuffle on their keys and rely on
  * AQE for skew handling at the 100 TB target.
  */
object Relational {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** `from events[value > 100 and event_type == 'error'] select …`
    * The PowerSurgeDetection filter shape (siddhi-operator example app).
    * Predicate reaches the parquet scan as PushedFilters. */
  def filterThreshold(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("value") > 100 && col("event_type") === "error")
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  /** Arithmetic + alias projection (`select a*b as c`); Siddhi math
    * executors `executor/math/…` map to codegen'd Catalyst BinaryArithmetic. */
  def projectionArithmetic(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey"),
      col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).as("charge"),
      (col("l_extendedprice") - col("l_discount") * col("l_extendedprice"))
        .as("discounted"),
      (col("l_quantity") % lit(7.0)).as("qty_mod"),
      (-col("l_quantity")).as("neg_qty")
    ).orderBy("l_orderkey", "l_linenumber")

  /** Siddhi `a in TableName` membership predicate ⇒ left-semi join (NOT the
    * SQL `IN (list)`): orders whose customer has acctbal > 5000. */
  def joinSemiInTable(s: SparkSession, d: String): DataFrame = {
    val rich = customer(s, d).filter(col("c_acctbal") > 5000)
      .select("c_custkey")
    orders(s, d)
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Anti-join (Siddhi `not (… in Table)`): customers with no BIG order
    * (totalprice > 400k). The subquery is selective so the anti set is
    * non-empty at every SF — the filter pushes into the orders scan and
    * the anti side stays a pruned 1-column shuffle. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Stream ⋈ table ⋈ table (Siddhi stream-table join chain): revenue per
    * nation. `nation` is broadcast (bounded cardinality at any SF);
    * orders⋈customer shuffles on the key — the scalable default. */
  def joinMultiway(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")

  /** Left-outer stream⋈table keeping unmatched left rows (Siddhi
    * `left outer join`): per-customer order count incl. zero. */
  def joinLeftOuter(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spend"))
      .orderBy("c_custkey")

  /** Full-outer join (Siddhi `full outer join`): nations vs supplier homes. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(supplier(s, d).groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_suppliers")),
        col("n_nationkey") === col("s_nationkey"), "full_outer")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("n_nationkey")

  /** Theta (non-equi) join — Siddhi compiles arbitrary `on` conditions;
    * Spark plans broadcast-nested-loop with the small side broadcast. */
  def joinTheta(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(supplier(s, d)),
        col("s_acctbal") > col("c_acctbal"), "inner")
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_richer_suppliers"))
      .orderBy("c_custkey")

  /** Right-outer join (Siddhi `right outer join`): every customer keeps a
    * row even with no orders — the mirror of [[joinLeftOuter]], exercising
    * the planner's right-side-preserving path. */
  def joinRightOuter(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"),
        "right_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(max(coalesce(col("o_totalprice"), lit(0.0))), 2)
          .as("max_order"))
      .orderBy("c_custkey")

  /** As-of join (absent in Siddhi; the classic event↔latest-state lookup).
    * For each purchase: the most recent error of the same user at or
    * before it.
    *
    * Scalable formulation: NOT a range join (which explodes to
    * O(pairs-in-range) and at 100 TB to a broadcast-nested-loop) — tag
    * both sides, union, and take `last(error_id) ignore nulls` over a
    * per-user (ts, side) window: one shuffle on the user key, linear work,
    * identical partitioning to every other per-key operator here. Errors
    * are pre-deduped per (user, ts) to keep the tie-break deterministic. */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val err = ev.filter(col("event_type") === "error")
      .groupBy("user_id", "ts_ns")
      .agg(max("event_id").as("err_id"))
      .select(col("user_id"), col("ts_ns"), col("err_id"),
        lit(0).as("side"), lit(null).cast("long").as("purchase_id"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"),
        lit(null).cast("long").as("err_id"), lit(1).as("side"),
        col("event_id").as("purchase_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "side")
      .rowsBetween(Long.MinValue, 0)
    err.unionByName(pur)
      .withColumn("asof_error_id", last("err_id", ignoreNulls = true).over(w))
      .withColumn("asof_error_ts_ns",
        last(when(col("side") === 0, col("ts_ns")), ignoreNulls = true)
          .over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"), col("asof_error_id"),
        (expr("ts_ns div 1000000") - expr("asof_error_ts_ns div 1000000"))
          .as("gap_ms"))
      .orderBy("purchase_id")
  }

  /** Bloom-filter semi join — the 100 TB join-pruning pattern: build a
    * Bloom filter over the small side's keys (one aggregate), prune the
    * big side with `might_contain` BEFORE the shuffle, then exact
    * semi-join the survivors. False positives cost only wasted shuffle
    * rows, never wrong results, so the output equals the plain semi join
    * and the oracle checks it exactly. */
  def joinBloomSemi(s: SparkSession, d: String): DataFrame = {
    val rich = customer(s, d).filter(col("c_acctbal") > 9000)
      .select("c_custkey")
    // distributed build via stat.bloomFilter (one aggregation of the small
    // side, merged on the driver — the same prep cost as a broadcast-join
    // build), then shipped to every task as a broadcast variable
    val bf = rich.stat.bloomFilter("c_custkey", 10000L, 0.01)
    val bcBf = s.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcBf.value.mightContainLong(k))
    orders(s, d)
      .filter(mightContain(col("o_custkey")))
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
  }

  /** Unidirectional join (Siddhi `S1 unidirectional join S2#window.time`):
    * only the LEFT side triggers output — each purchase, on arrival, joins
    * against the errors currently held in the right side's 5-minute window
    * (errors at or before the purchase, not older than 5 minutes). Errors
    * arriving later never re-emit pairs — that one-sidedness is exactly the
    * `e.ts <= p.ts` half of the band, so the batch form is a plain
    * key-equi join with a time-band filter: one shuffle on user_id, the
    * band applied post-join (at 100 TB the watermarked streaming twin
    * bounds right-side state to the 5-minute window). */
  def joinUnidirectional(s: SparkSession, d: String): DataFrame = {
    val WIN = 5L * 60 * 1000 * 1000 * 1000
    val ev = events(s, d)
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_ns").as("p_ts"))
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("ts_ns").as("e_ts"))
    pur.join(err, Seq("user_id"))
      .filter(col("e_ts") <= col("p_ts") && col("e_ts") > col("p_ts") - WIN)
      .select("user_id", "purchase_id", "error_id")
      .orderBy("purchase_id", "error_id")
  }

  /** Union (Siddhi: N queries inserting into one stream). */
  def setopUnion(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    ev.filter(col("event_type") === "error")
      .select("event_id", "event_type", "value")
      .unionByName(
        ev.filter(col("event_type") === "purchase" && col("value") > 150)
          .select("event_id", "event_type", "value"))
      .orderBy("event_id")
  }

  /** Intersect/except (absent in Siddhi — free upgrade, SURVEY §2.9). */
  def setopIntersectExcept(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val buyers  = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct()
    val erring  = ev.filter(col("event_type") === "error")
      .select("user_id").distinct()
    buyers.intersect(erring).withColumn("set_kind", lit("both"))
      .unionByName(
        buyers.except(erring).withColumn("set_kind", lit("purchase_only")))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "filter_threshold"       -> (filterThreshold _),
    "projection_arithmetic"  -> (projectionArithmetic _),
    "join_semi_in_table"     -> (joinSemiInTable _),
    "join_anti"              -> (joinAnti _),
    "join_multiway"          -> (joinMultiway _),
    "join_left_outer"        -> (joinLeftOuter _),
    "join_full_outer"        -> (joinFullOuter _),
    "join_theta"             -> (joinTheta _),
    "setop_union"            -> (setopUnion _),
    "setop_intersect_except" -> (setopIntersectExcept _),
    "join_right_outer"       -> (joinRightOuter _),
    "join_asof"              -> (joinAsof _),
    "join_unidirectional"    -> (joinUnidirectional _),
    "join_bloom_semi"        -> (joinBloomSemi _)
  )

  val oracle: Map[String, String] = Map(
    "filter_threshold" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE value > 100 AND event_type = 'error' ORDER BY event_id""".stripMargin,
    "projection_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
        |  l_extendedprice - l_discount * l_extendedprice AS discounted,
        |  fmod(l_quantity, 7.0) AS qty_mod,
        |  -l_quantity AS neg_qty
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_semi_in_table" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY o_orderkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "join_multiway" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """SELECT n_nationkey, n_name, coalesce(n_suppliers, 0) AS n_suppliers
        |FROM nation FULL OUTER JOIN (
        |  SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
        |  GROUP BY s_nationkey) sup ON n_nationkey = s_nationkey
        |ORDER BY n_nationkey""".stripMargin,
    "join_theta" ->
      """SELECT c_custkey, count(*) AS n_richer_suppliers
        |FROM customer JOIN supplier ON s_acctbal > c_acctbal
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "setop_union" ->
      """SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
        |UNION ALL
        |SELECT event_id, event_type, value FROM events
        |WHERE event_type = 'purchase' AND value > 150
        |ORDER BY event_id""".stripMargin,
    "join_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(max(coalesce(o_totalprice, 0.0)), 2) AS max_order
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_asof" ->
      """WITH err AS (
        |  SELECT user_id, ts, max(event_id) AS err_id FROM events
        |  WHERE event_type = 'error' GROUP BY user_id, ts),
        |pur AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |  e.err_id AS asof_error_id,
        |  epoch_ms(p.ts) - epoch_ms(e.ts) AS gap_ms
        |FROM pur p ASOF LEFT JOIN err e
        |  ON p.user_id = e.user_id AND p.ts >= e.ts
        |ORDER BY purchase_id""".stripMargin,
    // bloom prune never changes the result (FPs verified by the exact
    // join), so the oracle is the plain semi join
    "join_bloom_semi" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin,
    "join_unidirectional" ->
      """SELECT p.user_id, p.event_id AS purchase_id, e.event_id AS error_id
        |FROM events p JOIN events e ON p.event_type = 'purchase'
        |  AND e.event_type = 'error' AND e.user_id = p.user_id
        |  AND e.ts <= p.ts AND e.ts > p.ts - INTERVAL 5 MINUTE
        |ORDER BY purchase_id, error_id""".stripMargin,
    "setop_intersect_except" ->
      """WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
        |     erring AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |SELECT user_id, 'both' AS set_kind FROM buyers INTERSECT
        |  SELECT user_id, 'both' FROM erring
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS set_kind FROM
        |  (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM erring)
        |ORDER BY user_id""".stripMargin
  )
}
