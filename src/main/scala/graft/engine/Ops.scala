package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining runtime semantics (SURVEY.md §1.1 partitions/triggers,
  * §2.7 output rate limiting, fault streams, on-demand queries).
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  *   - partition:  `core/partition/PartitionRuntimeImpl.java`,
  *     `PartitionStreamReceiver.java` — per-key isolated query instances
  *   - rate limit: `core/query/output/ratelimit/...` (first/last/all per
  *     time or event count, snapshot)
  *   - trigger:    `core/trigger/` (`define trigger T at every 5 sec`)
  *   - fault:      `core/util/error/handler/...` (@OnError(action='STREAM'))
  *   - on-demand:  `core/query/OnDemandQueryRuntime.java` (store queries)
  */
object Ops {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** partition_per_key: `partition with (user_id of S) begin ... end` —
    * Spark's shuffle IS the partition: per-user isolated fold (here a
    * max-drawdown scan, a genuinely order-dependent per-key computation)
    * via groupByKey.mapGroups. Deterministic per-key sort inside the group.
    * Scale: one shuffle; state O(1) per key during the fold. */
  def partitionPerKey(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(col("event_id").as("eventId"), col("ts_ns").as("tsNs"),
        col("user_id").as("userId"), col("event_type").as("eventType"),
        col("value"))
      .as[Cep.Ev]
      .groupByKey(_.userId)
      .mapGroups { (uid, it) =>
        val evs = it.toVector.sortBy(e => (e.tsNs, e.eventId))
        var runMax = Double.MinValue
        var maxDd = 0.0
        evs.foreach { e =>
          runMax = math.max(runMax, e.value)
          maxDd = math.max(maxDd, runMax - e.value)
        }
        (uid, evs.length.toLong,
          BigDecimal(maxDd).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
      .toDF("user_id", "n_events", "max_drawdown")
      .orderBy("user_id")
  }

  /** partition_range: Siddhi range partition
    * (`partition with (value < 50 as 'low' or ... of S)`) — a derived
    * partition key via when/otherwise, then per-range aggregation. */
  def partitionRange(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("band",
        when(col("value") < 50, "low")
          .when(col("value") < 150, "mid")
          .otherwise("high"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
        countDistinct("user_id").as("n_users"))
      .orderBy("band")

  /** rate_limit: `output first|last every 1 min` + per-interval count
    * (`output all every ...` keeps everything — shown by cnt). One window
    * spec, three Siddhi output modes. */
  def rateLimit(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("w_start_ms",
        (expr("ts_ns div 60000000000") * 60000L).as("w_start_ms"))
      .groupBy("user_id", "w_start_ms")
      .agg(
        min_by(col("event_id"), struct(col("ts_ns"), col("event_id")))
          .as("first_id"),
        max_by(col("event_id"), struct(col("ts_ns"), col("event_id")))
          .as("last_id"),
        count(lit(1)).as("cnt"))
      .orderBy("user_id", "w_start_ms")

  /** rate_limit_snapshot: `output snapshot every 10 min` — the latest
    * value per key as of each interval end (gap intervals carry the
    * previous snapshot forward via a window fill). */
  def rateLimitSnapshot(s: SparkSession, d: String): DataFrame = {
    val iv = 600000000000L // 10 min in ns
    events(s, d)
      .withColumn("iv_end_ms", ((expr(s"ts_ns div $iv") + 1) * 600000L))
      .groupBy("user_id", "iv_end_ms")
      .agg(max(struct(col("ts_ns"), col("event_id"), col("value")))
        .as("last"))
      .select(col("user_id"), col("iv_end_ms"),
        round(col("last.value"), 2).as("snapshot_value"))
      .orderBy("user_id", "iv_end_ms")
  }

  /** fault_stream: `@OnError(action='STREAM')` — route events failing a
    * validation predicate to the fault stream with an _error tag; both
    * streams unioned with a stream_tag (the Siddhi `!stream` pattern). */
  def faultStream(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val classified = ev.withColumn("_error",
      when(col("value") > 190, "value_out_of_range")
        .when(get_json_object(col("props"), "$.k").isNull,
          "missing_required_prop")
        .otherwise(null))
    classified.filter(col("_error").isNull)
      .select(col("event_id"), lit("main").as("stream_tag"),
        lit(null).cast("string").as("_error"))
      .unionByName(
        classified.filter(col("_error").isNotNull)
          .select(col("event_id"), lit("fault").as("stream_tag"),
            col("_error")))
      .orderBy("event_id")
  }

  /** rate_limit_events: `output first every 3 events` — the COUNT-based
    * rate limiter (vs [[rateLimit]]'s time-based one): per key, emit the
    * first of every 3 consecutive events with its chunk's size. */
  def rateLimitEvents(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ns", "event_id")
    events(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("chunk", ((col("rn") - 1) / 3).cast("long"))
      .groupBy("user_id", "chunk")
      .agg(min_by(col("event_id"), col("rn")).as("first_id"),
        max_by(col("event_id"), col("rn")).as("last_id"),
        count(lit(1)).as("chunk_n"))
      .orderBy("user_id", "chunk")
  }

  /** trigger_gapfill: `define trigger T at every 10 min` joined against
    * the event stream — emits every interval in the data's time span,
    * zero-filled where no events arrived (the Siddhi trigger+join idiom;
    * batch analog of a rate source). */
  def triggerGapfill(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val iv = 600000000000L // 10 min in ns
    val bounds = ev.agg(
      (expr(s"min(ts_ns) div $iv") * 600000L).as("lo_ms"),
      (expr(s"max(ts_ns) div $iv") * 600000L).as("hi_ms"))
    val ticks = bounds.select(
      explode(expr("sequence(lo_ms, hi_ms, 600000)")).as("tick_ms"))
    val buckets = ev
      .groupBy((expr(s"ts_ns div $iv") * 600000L).as("tick_ms"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    ticks.join(buckets, Seq("tick_ms"), "left_outer")
      .select(col("tick_ms"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("tick_ms")
  }

  /** ondemand_store_query: the on-demand query path — materialize the
    * minute-grain aggregation table (the "store"), register it, and run a
    * SiddhiQL-on-demand-style SQL (`from AggTable within ... per ...`)
    * through spark.sql. */
  def onDemandStoreQuery(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(sum("value").as("sum_v"), count(lit(1)).as("cnt_v"))
      .select(unix_millis(col("w.start")).as("minute_start_ms"),
        col("sum_v"), col("cnt_v"))
      .createOrReplaceTempView("events_minute_grain")
    s.sql(
      """SELECT minute_start_ms div 3600000 * 3600000 AS hour_start_ms,
        |  round(sum(sum_v), 2) AS sum_value, sum(cnt_v) AS cnt
        |FROM events_minute_grain
        |WHERE minute_start_ms >= 1704153600000
        |  AND minute_start_ms < 1704240000000
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "partition_per_key"    -> (partitionPerKey _),
    "partition_range"      -> (partitionRange _),
    "rate_limit"           -> (rateLimit _),
    "rate_limit_events"    -> (rateLimitEvents _),
    "rate_limit_snapshot"  -> (rateLimitSnapshot _),
    "fault_stream"         -> (faultStream _),
    "trigger_gapfill"      -> (triggerGapfill _),
    "ondemand_store_query" -> (onDemandStoreQuery _)
  )

  val oracle: Map[String, String] = Map(
    "partition_per_key" ->
      """WITH runs AS (
        |  SELECT user_id, value,
        |    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS run_max
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  round(greatest(max(run_max - value), 0.0), 2) AS max_drawdown
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "partition_range" ->
      """SELECT CASE WHEN value < 50 THEN 'low'
        |  WHEN value < 150 THEN 'mid' ELSE 'high' END AS band,
        |  count(*) AS n, round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "rate_limit_events" ->
      """WITH seq AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events)
        |SELECT user_id, CAST((rn - 1) // 3 AS BIGINT) AS chunk,
        |  min_by(event_id, rn) AS first_id,
        |  max_by(event_id, rn) AS last_id, count(*) AS chunk_n
        |FROM seq GROUP BY user_id, 2
        |ORDER BY user_id, chunk""".stripMargin,
    "rate_limit" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id,
        |    epoch_ms(ts) // 60000 * 60000 AS w_start_ms,
        |    row_number() OVER (PARTITION BY user_id,
        |      epoch_ms(ts) // 60000 ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY user_id,
        |      epoch_ms(ts) // 60000 ORDER BY ts DESC, event_id DESC) AS rn_d,
        |    count(*) OVER (PARTITION BY user_id,
        |      epoch_ms(ts) // 60000) AS cnt
        |  FROM events)
        |SELECT user_id, w_start_ms,
        |  max(CASE WHEN rn_a = 1 THEN event_id END) AS first_id,
        |  max(CASE WHEN rn_d = 1 THEN event_id END) AS last_id,
        |  max(cnt) AS cnt
        |FROM ranked GROUP BY user_id, w_start_ms
        |ORDER BY user_id, w_start_ms""".stripMargin,
    "rate_limit_snapshot" ->
      """WITH ranked AS (
        |  SELECT user_id, value,
        |    (epoch_ms(ts) // 600000 + 1) * 600000 AS iv_end_ms,
        |    row_number() OVER (PARTITION BY user_id, epoch_ms(ts) // 600000
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, iv_end_ms, round(value, 2) AS snapshot_value
        |FROM ranked WHERE rn = 1
        |ORDER BY user_id, iv_end_ms""".stripMargin,
    "fault_stream" ->
      """SELECT event_id,
        |  CASE WHEN value > 190 OR json_extract_string(props, '$.k') IS NULL
        |    THEN 'fault' ELSE 'main' END AS stream_tag,
        |  CASE WHEN value > 190 THEN 'value_out_of_range'
        |    WHEN json_extract_string(props, '$.k') IS NULL
        |      THEN 'missing_required_prop' END AS _error
        |FROM events ORDER BY event_id""".stripMargin,
    "trigger_gapfill" ->
      """WITH bounds AS (
        |  SELECT min(epoch_ms(ts) // 600000) AS lo,
        |    max(epoch_ms(ts) // 600000) AS hi FROM events),
        |ticks AS (SELECT unnest(range(lo, hi + 1)) * 600000 AS tick_ms
        |  FROM bounds),
        |buckets AS (SELECT epoch_ms(ts) // 600000 * 600000 AS tick_ms,
        |    count(*) AS n, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1)
        |SELECT t.tick_ms, coalesce(b.n, 0) AS n,
        |  coalesce(b.sum_value, 0.0) AS sum_value
        |FROM ticks t LEFT JOIN buckets b ON b.tick_ms = t.tick_ms
        |ORDER BY t.tick_ms""".stripMargin,
    "ondemand_store_query" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_start_ms,
        |  round(sum(value), 2) AS sum_value, count(*) AS cnt
        |FROM events
        |WHERE epoch_ms(date_trunc('minute', ts)) >= 1704153600000
        |  AND epoch_ms(date_trunc('minute', ts)) < 1704240000000
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
