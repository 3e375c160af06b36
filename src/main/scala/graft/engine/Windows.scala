package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window operators (SURVEY.md §2.3) — the heart of Siddhi.
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  * siddhi-core `query/processor/stream/window/{TimeBatchWindowProcessor,
  * TimeWindowProcessor, LengthWindowProcessor, LengthBatchWindowProcessor,
  * SessionWindowProcessor, SortWindowProcessor, DelayWindowProcessor,
  * ExternalTimeBatchWindowProcessor}.java`; dedup windows
  * `siddhi-execution-unique`.
  *
  * Each operator is exposed as a batch DataFrame combinator over the event
  * table (driver-contract shape); the same combinators run under Structured
  * Streaming (`groupBy(window(…))` / `session_window` with watermarks) — the
  * streaming path is exercised in ScalaTest with MemoryStream.
  *
  * Scale notes: time/session windows are hash-aggregations keyed by
  * (window, keys) — one shuffle, map-side partial aggregation, no global
  * sort. Count-based windows (length/lengthBatch/sort) are per-key
  * `Window.partitionBy(user)` analytics — they shuffle by key and sort
  * within partitions only (no global orderBy before the final presentation
  * sort, which is oracle-determinism only and sits atop a reduced result).
  */
object Windows {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** `#window.timeBatch(1 min)` + sum — tumbling event-time window
    * (the PowerSurgeDetection aggregate). Exact Spark built-in match. */
  def timeBatchSum(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(round(sum("value"), 2).as("sum_value"), count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("sum_value"), col("cnt"))
      .orderBy("w_start_ms")

  /** `#window.time(5 min)` sliding — per-pane emission via Spark's sliding
    * `window(ts, 5 min, 1 min)`: each event contributes to 5 panes
    * (pane-replication is Spark's sliding-agg execution model). */
  def timeSlidingCount(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("event_type"), col("cnt"))
      .orderBy("w_start_ms", "event_type")

  /** `#window.session(10 min, user)` — built-in session_window. */
  def sessionAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("sess_start_ms"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start_ms")

  /** Dynamic-gap session window (beyond Siddhi's fixed gap): the gap is a
    * per-event EXPRESSION — purchases hold a session open 20 minutes,
    * everything else 10 — via `session_window(ts, gapExpr)` (Spark-native
    * dynamic sessionization; same one-shuffle hash-agg shape as the fixed
    * version). */
  def sessionDynamic(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts"),
          when(col("event_type") === "purchase", "20 minutes")
            .otherwise("10 minutes")).as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("sess_start_ms"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "sess_start_ms")

  /** `#window.lengthBatch(50)` per key — tumbling count window: batch id =
    * floor(rank/50) over per-user event order. */
  def lengthBatch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", ((col("rn") - 1) / 50).cast("long"))
      .groupBy("user_id", "batch_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "batch_id")
  }

  /** `#window.length(20)` per key — sliding count window, one output per
    * event carrying the last-20 running aggregate. */
  def lengthSliding(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(-19, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"),
        round(sum("value").over(w), 2).as("sum_last20"),
        count(lit(1)).over(w).as("n_last20"))
      .orderBy("event_id")
  }

  /** `#window.sort(3, value, 'desc')` per key — bounded top-K buffer. */
  def sortTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    events(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("user_id", "rk", "event_id", "value")
      .orderBy("user_id", "rk")
  }

  /** `extrema:bottomK` — the mirror of [[sortTopK]]: per-key bottom-3 by
    * value (two-phase at scale exactly like top-K: partition-local rank,
    * tiny global survivors). */
  def sortBottomK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").asc, col("event_id"))
    events(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("user_id", "rk", "event_id", "value")
      .orderBy("user_id", "rk")
  }

  /** `#window.delay(5 min)` — events re-timestamped T later. */
  def delay(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        (expr("ts_ns div 1000000") + lit(5L * 60 * 1000)).as("delayed_ts_ms"))
      .orderBy("event_id")

  /** `unique:first` dedup window — first event per (user, type) by time. */
  def uniqueFirst(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_ns", "event_id")
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  /** `unique:last`/`unique:ever` dedup window — the LATEST event per
    * (user, type): the mirror of [[uniqueFirst]], keeping the newest
    * occupant as older ones are displaced. */
  def uniqueLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  /** `externalTimeBatch` — tumbling window on an event attribute clock
    * (here: daily buckets of l_shipdate). In Spark every window is an
    * event-time window, so this is the same primitive. */
  def externalTimeBatch(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(window(col("l_shipdate"), "30 days"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start").cast("timestamp"))
          .as("w_start_ms"),
        col("sum_qty"), col("cnt"))
      .orderBy("w_start_ms")

  val queries: Map[String, Q] = Map(
    "window_timebatch_sum"   -> (timeBatchSum _),
    "window_time_sliding"    -> (timeSlidingCount _),
    "window_session"         -> (sessionAgg _),
    "window_length_batch"    -> (lengthBatch _),
    "window_length_sliding"  -> (lengthSliding _),
    "window_sort_topk"       -> (sortTopK _),
    "window_sort_bottomk"    -> (sortBottomK _),
    "window_delay"           -> (delay _),
    "window_unique_first"    -> (uniqueFirst _),
    "window_unique_last"     -> (uniqueLast _),
    "window_external_time"   -> (externalTimeBatch _),
    "window_session_dynamic" -> (sessionDynamic _)
  )

  val oracle: Map[String, String] = Map(
    "window_timebatch_sum" ->
      """SELECT epoch_ms(date_trunc('minute', ts)) AS w_start_ms,
        |  round(sum(value), 2) AS sum_value, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_time_sliding" ->
      """SELECT epoch_ms(date_trunc('minute', ts) - INTERVAL (o.i) MINUTE) AS w_start_ms,
        |  event_type, count(*) AS cnt
        |FROM events CROSS JOIN (SELECT unnest(range(0, 5)) AS i) o
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // dynamic gap: session end extends to the RUNNING MAX of (ts + gap)
    // over all earlier members (intervals [ts, ts+gap] merge on overlap),
    // so the boundary test is ts > cummax(prev ends), not a lag diff
    "window_session_dynamic" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 20 MINUTE
        |      ELSE INTERVAL 10 MINUTE END AS w_end
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    max(w_end) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max_end
        |  FROM g),
        |flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev_max_end IS NULL OR ts > prev_max_end
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM m),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, epoch_ms(min(ts)) AS sess_start_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start_ms""".stripMargin,
    "window_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              <= INTERVAL 10 MINUTE THEN 0 ELSE 1 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, epoch_ms(min(ts)) AS sess_start_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start_ms""".stripMargin,
    "window_length_batch" ->
      """WITH ranked AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, CAST((rn - 1) // 50 AS BIGINT) AS batch_id,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "window_length_sliding" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 2) AS sum_last20,
        |  count(*) OVER w AS n_last20
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "window_sort_topk" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |SELECT user_id, rk, event_id, value FROM ranked
        |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin,
    "window_sort_bottomk" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value ASC, event_id) AS rk
        |  FROM events)
        |SELECT user_id, rk, event_id, value FROM ranked
        |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin,
    "window_delay" ->
      """SELECT event_id, epoch_ms(ts) + 300000 AS delayed_ts_ms
        |FROM events ORDER BY event_id""".stripMargin,
    "window_unique_first" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, value FROM ranked
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "window_unique_last" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, value FROM ranked
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "window_external_time" ->
      """SELECT epoch_ms(to_timestamp(
        |    floor(epoch(l_shipdate) / 2592000) * 2592000)) AS w_start_ms,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
