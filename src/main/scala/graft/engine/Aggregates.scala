package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregators + incremental aggregation (SURVEY.md §2.4).
  *
  * Siddhi analogs [unverified public-repo paths; /root/reference empty]:
  * siddhi-core `query/selector/attribute/aggregator/{Sum,Avg,Count,
  * DistinctCount,Min,Max,MinForever,MaxForever,StdDev,And,Or,UnionSet}
  * AttributeAggregatorExecutor.java`; incremental aggregation
  * `core/aggregation/{AggregationRuntime,IncrementalExecutor}.java`;
  * `percentile` from siddhi-execution-math; `groupConcat` from
  * siddhi-execution-string.
  *
  * All are single-shuffle hash aggregations with map-side partial
  * aggregation (Spark's default) — the 100 TB-safe shape. `minForever` /
  * `maxForever` are running (all-history) extrema: cumulative window
  * functions partitioned by key, no global sort.
  */
object Aggregates {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: the full basic-aggregator battery over one scan. */
  def aggBasic(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(min("l_quantity"), 2).as("min_qty"),
        round(max("l_quantity"), 2).as("max_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** `distinctCount` (exact) per day. */
  def distinctCount(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("day")

  /** `stdDev` — Siddhi stdDev is population stddev (Welford). */
  def stddevPop(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(round(stddev_pop(col("value")), 6).as("stddev_value"),
        round(avg("value"), 6).as("avg_value"))
      .orderBy("event_type")

  /** `minForever`/`maxForever` — never-evicting extrema: the running
    * all-history min/max per user as of each event. */
  def minMaxForever(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .select(col("event_id"), col("user_id"),
        round(min("value").over(w), 2).as("min_forever"),
        round(max("value").over(w), 2).as("max_forever"))
      .orderBy("event_id")
  }

  /** bool `and`/`or` aggregators. */
  def boolAggs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(bool_and(col("value") > 1).as("all_above_1"),
        bool_or(col("value") > 190).as("any_above_190"))
      .orderBy("user_id")

  /** `unionSet` + `str:groupConcat` — set-union / ordered concat per key,
    * emitted as a canonical comma-joined string. */
  def unionSetConcat(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(
        array_join(array_sort(collect_set(col("event_type"))), ",")
          .as("type_set"),
        size(collect_set(col("event_type"))).as("set_size"))
      .orderBy("user_id")

  /** `having` + `order by` + `limit` (post-agg pipeline). */
  def havingOrderLimit(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id")
      .agg(round(sum("value"), 2).as("total_value"),
        count(lit(1)).as("n"))
      .filter(col("n") > 10)
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)

  /** `math:percentile` — exact interpolated median/quantiles. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("event_type")
      .agg(
        round(percentile(col("value"), lit(0.5)), 6).as("p50"),
        round(percentile(col("value"), lit(0.9)), 6).as("p90"))
      .orderBy("event_type")

  /** Incremental aggregation (`aggregate by ts every min…hour` + `within`):
    * the hour grain is rolled up FROM the minute grain (cascaded partial
    * aggregation, the Siddhi IncrementalExecutor design re-expressed as a
    * two-level tree aggregation — at 100 TB the minute grain is the stored
    * table and coarser grains are cheap rollups of it), then queried
    * `within` a time range. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val minuteGrain = events(s, d)
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(sum("value").as("sum_v"), count(lit(1)).as("cnt_v"))
      .select(col("w.start").as("minute_start"), col("sum_v"), col("cnt_v"))
    minuteGrain
      .groupBy(window(col("minute_start"), "1 hour"))
      .agg(round(sum("sum_v"), 2).as("sum_value"), sum("cnt_v").as("cnt"))
      .select(unix_millis(col("window.start")).as("hour_start_ms"),
        col("sum_value"), col("cnt"))
      .filter(col("hour_start_ms") >= lit(1704067200000L) &&
        col("hour_start_ms") < lit(1704672000000L))
      .orderBy("hour_start_ms")
  }

  /** agg_incremental_cascade: the full Siddhi incremental-aggregation
    * grain CHAIN (`aggregate ... every min...day`): minute partials roll
    * into hours, hours into days — each grain computed FROM THE PREVIOUS
    * (never re-scanning raw events), exactly how the reference maintains
    * its grain tables. Day rows carry their contributing bucket counts
    * down the chain (n_minutes/n_hours), proving the rollup resolution.
    * At 100 TB each step aggregates the (much smaller) previous grain —
    * the classic cube-maintenance shape. */
  def incrementalCascade(s: SparkSession, d: String): DataFrame = {
    val minute = events(s, d)
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(sum("value").as("sum_v"), count(lit(1)).as("cnt"))
      .select(col("w.start").as("minute_start"), col("sum_v"), col("cnt"))
    val hour = minute
      .groupBy(window(col("minute_start"), "1 hour").as("w"))
      .agg(sum("sum_v").as("sum_v"), sum("cnt").as("cnt"),
        count(lit(1)).as("n_minutes"))
      .select(col("w.start").as("hour_start"), col("sum_v"), col("cnt"),
        col("n_minutes"))
    hour
      .groupBy(window(col("hour_start"), "1 day").as("w"))
      .agg(round(sum("sum_v"), 2).as("sum_value"), sum("cnt").as("cnt"),
        sum("n_minutes").as("n_minutes"), count(lit(1)).as("n_hours"))
      .select(unix_millis(col("w.start")).as("day_start_ms"),
        col("sum_value"), col("cnt"), col("n_minutes"), col("n_hours"))
      .orderBy("day_start_ms")
  }

  /** `timeseries:regress` (siddhi-execution-timeseries) — per-key OLS of
    * value against event time, expressed as closed-form moment aggregates
    * (covar/var): one hash aggregation, no iteration — the scalable way
    * to fit millions of tiny per-key models. */
  def timeseriesRegress(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("x", ((col("ts_ns") - lit(1704067200000000000L)) / lit(1e9)).cast("double"))
      .groupBy("user_id")
      .agg(
        round((covar_pop(col("x"), col("value")) / var_pop(col("x"))) * 3600,
          6).as("slope_per_hour"),
        round(avg("value"), 6).as("mean_value"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  /** `timeseries:outlier` (siddhi-execution-timeseries, the family's
    * other member next to [[timeseriesRegress]]) — flag events whose
    * residual from the per-key OLS fit exceeds 2 population standard
    * deviations of that key's residuals. Two window passes over the SAME
    * partitioning (user_id): Catalyst plans ONE exchange and chains both
    * Window operators on it — fit moments first, residual stddev second
    * — so millions of per-key models cost a single shuffle at 100 TB. */
  def timeseriesOutlier(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    events(s, d)
      .withColumn("x",
        ((col("ts_ns") - lit(1704067200000000000L)) / lit(1e9))
          .cast("double"))
      .withColumn("slope",
        covar_pop(col("x"), col("value")).over(w) /
          var_pop(col("x")).over(w))
      .withColumn("resid",
        col("value") -
          (avg("value").over(w) + col("slope") *
            (col("x") - avg("x").over(w))))
      .withColumn("sd", stddev_pop(col("resid")).over(w))
      .filter(round(abs(col("resid")), 6) > round(col("sd") * 2, 6))
      .select(col("event_id"), col("user_id"),
        round(col("resid"), 6).as("residual"),
        round(col("sd") * 2, 6).as("threshold"))
      .orderBy("event_id")
  }

  /** Grouping-sets upgrade (ABSENT in Siddhi — SURVEY §2.4 free upgrade):
    * CUBE over (event_type, value band) with grouping_id disambiguating
    * the NULL-as-ALL rows. One pass, partial-aggregated per grouping set. */
  def rollupCube(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("band", when(col("value") < 100, "lo").otherwise("hi"))
      .cube(col("event_type"), col("band"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("band"), lit("ALL")).as("band"),
        col("gid"), col("n"), col("sum_value"))
      .orderBy("gid", "etype", "band")

  val queries: Map[String, Q] = Map(
    "agg_rollup_cube"     -> (rollupCube _),
    "agg_timeseries_regress" -> (timeseriesRegress _),
    "agg_timeseries_outlier" -> (timeseriesOutlier _),
    "agg_basic"            -> (aggBasic _),
    "agg_distinctcount"    -> (distinctCount _),
    "agg_stddev"           -> (stddevPop _),
    "agg_minmax_forever"   -> (minMaxForever _),
    "agg_bool"             -> (boolAggs _),
    "agg_unionset_concat"  -> (unionSetConcat _),
    "agg_having_order_limit" -> (havingOrderLimit _),
    "agg_percentile"       -> (percentiles _),
    "agg_incremental"      -> (incrementalAgg _),
    "agg_incremental_cascade" -> (incrementalCascade _)
  )

  val oracle: Map[String, String] = Map(
    "agg_rollup_cube" ->
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |  coalesce(band, 'ALL') AS band,
        |  CAST(GROUPING(event_type, band) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM (SELECT event_type,
        |    CASE WHEN value < 100 THEN 'lo' ELSE 'hi' END AS band, value
        |  FROM events)
        |GROUP BY CUBE(event_type, band)
        |ORDER BY gid, etype, band""".stripMargin,
    // same per-key fit; residual recomputed pointwise; flag at 2 sigma
    // (round-6 on both comparison sides, matching the Spark filter)
    "agg_timeseries_outlier" ->
      """WITH b AS (SELECT event_id, user_id, value,
        |    (epoch_ns(ts) - 1704067200000000000) / 1e9 AS x
        |  FROM events),
        |f AS (SELECT *,
        |    covar_pop(x, value) OVER w / var_pop(x) OVER w AS slope,
        |    avg(value) OVER w AS my, avg(x) OVER w AS mx
        |  FROM b WINDOW w AS (PARTITION BY user_id)),
        |r AS (SELECT event_id, user_id,
        |    value - (my + slope * (x - mx)) AS resid
        |  FROM f),
        |z AS (SELECT event_id, user_id, resid,
        |    stddev_pop(resid) OVER (PARTITION BY user_id) AS sd
        |  FROM r)
        |SELECT event_id, user_id, round(resid, 6) AS residual,
        |  round(sd * 2, 6) AS threshold
        |FROM z WHERE round(abs(resid), 6) > round(sd * 2, 6)
        |ORDER BY event_id""".stripMargin,
    "agg_timeseries_regress" ->
      """SELECT user_id,
        |  round(covar_pop((epoch_ns(ts) - 1704067200000000000) / 1e9, value) /
        |    var_pop((epoch_ns(ts) - 1704067200000000000) / 1e9) * 3600, 6) AS slope_per_hour,
        |  round(avg(value), 6) AS mean_value, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(min(l_quantity), 2) AS min_qty,
        |  round(max(l_quantity), 2) AS max_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_distinctcount" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_stddev" ->
      """SELECT event_type, round(stddev_pop(value), 6) AS stddev_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_minmax_forever" ->
      """SELECT event_id, user_id,
        |  round(min(value) OVER w, 2) AS min_forever,
        |  round(max(value) OVER w, 2) AS max_forever
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING)
        |ORDER BY event_id""".stripMargin,
    "agg_bool" ->
      """SELECT user_id, bool_and(value > 1) AS all_above_1,
        |  bool_or(value > 190) AS any_above_190
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_unionset_concat" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_set,
        |  count(DISTINCT event_type) AS set_size
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_having_order_limit" ->
      """SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n
        |FROM events GROUP BY user_id HAVING count(*) > 10
        |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,
    "agg_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_incremental" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_start_ms,
        |  round(sum(value), 2) AS sum_value, count(*) AS cnt
        |FROM events
        |WHERE epoch_ms(date_trunc('hour', ts)) >= 1704067200000
        |  AND epoch_ms(date_trunc('hour', ts)) < 1704672000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_incremental_cascade" ->
      """SELECT epoch_ms(date_trunc('day', ts)) AS day_start_ms,
        |  round(sum(value), 2) AS sum_value, count(*) AS cnt,
        |  count(DISTINCT date_trunc('minute', ts)) AS n_minutes,
        |  count(DISTINCT date_trunc('hour', ts)) AS n_hours
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
